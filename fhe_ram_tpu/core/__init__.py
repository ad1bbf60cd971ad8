from . import rng, glwe, ggsw, keyswitch, packer, keys  # noqa: F401
