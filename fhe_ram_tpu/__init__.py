"""fhe_ram_tpu -- a TPU-native (JAX/XLA/Pallas) fully-homomorphic
encrypted RAM framework.

Brand-new implementation of the FHE-RAM scheme demonstrated by the
reference Rust crate (phantomzone-org/fhe-ram): an encrypted array
supporting read / read_prepare_write / write at an encrypted address.

Layering (TPU-first; see SURVEY.md for the reference layer map):
  ops/       exact int32 CRT-NTT polynomial arithmetic (the spqlios
             replacement), limb torus arithmetic, CRT reconstruction.
  core/      GLWE/GGSW ciphertexts, external products, automorphism
             key-switching, trace, log-depth packing, key generation.
  ram/       address encoding and the RAM read/write engine (jitted,
             functional state).
  parallel/  mesh sharding of RAM rows + batched reads.
  vm/        Phantom-VM helper components (encrypted ALU etc.).
"""

from .params import (
    Params,
    PARAMS_README_2_18,
    PARAMS_CODE_2_14,
    PARAMS_TEST_SMALL,
    PARAMS_TEST_FLAT,
    Base1D,
    Base2D,
    get_base_2d,
    reverse_bits_msb,
)

__version__ = "0.1.0"
