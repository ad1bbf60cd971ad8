"""ctypes bindings for the native golden-model / IO library
(native/fheram_native.cpp).  Built on demand with g++; all callers must
tolerate absence (`available()` false) -- the JAX path never depends on
it, it exists for cross-validation and fast host-side marshalling."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "fheram_native.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libfheram_native.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.negacyclic_conv_i64.argtypes = [i64p, i64p, i64p, ctypes.c_int,
                                            ctypes.c_int64]
        lib.negacyclic_ntt_ref.argtypes = [i64p, i64p, ctypes.c_int,
                                           ctypes.c_uint64, ctypes.c_uint64]
        lib.garner3_digits.argtypes = [i64p, i64p, i64p, ctypes.c_int,
                                       ctypes.c_int64, ctypes.c_int64,
                                       ctypes.c_int64, ctypes.c_int,
                                       ctypes.c_int, i64p]
        lib.deinterleave_i8.argtypes = [u8p, i32p, ctypes.c_int64, ctypes.c_int]
        lib.interleave_u8.argtypes = [i32p, u8p, ctypes.c_int64, ctypes.c_int]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def negacyclic_conv(a, b, modulus: int = 0):
    lib = _load()
    a = np.ascontiguousarray(a, dtype=np.int64)
    b = np.ascontiguousarray(b, dtype=np.int64)
    out = np.zeros_like(a)
    lib.negacyclic_conv_i64(a, b, out, len(a), modulus)
    return out


def negacyclic_ntt(a, p: int, psi: int):
    lib = _load()
    a = np.ascontiguousarray(a, dtype=np.int64)
    out = np.zeros_like(a)
    lib.negacyclic_ntt_ref(a, out, len(a), p, psi)
    return out


def garner3_digits(r1, r2, r3, primes, base_bits: int, ndig: int):
    lib = _load()
    r1 = np.ascontiguousarray(r1, dtype=np.int64)
    r2 = np.ascontiguousarray(r2, dtype=np.int64)
    r3 = np.ascontiguousarray(r3, dtype=np.int64)
    out = np.zeros((len(r1), ndig), dtype=np.int64)
    lib.garner3_digits(r1, r2, r3, len(r1), primes[0], primes[1], primes[2],
                       base_bits, ndig, out)
    return out


def deinterleave_i8(data, max_addr: int, word_size: int):
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    out = np.zeros((word_size, max_addr), dtype=np.int32)
    lib.deinterleave_i8(data, out, max_addr, word_size)
    return out


def interleave_u8(arr, max_addr: int, word_size: int):
    lib = _load()
    arr = np.ascontiguousarray(arr, dtype=np.int32)
    out = np.zeros(max_addr * word_size, dtype=np.uint8)
    lib.interleave_u8(arr, out, max_addr, word_size)
    return out
