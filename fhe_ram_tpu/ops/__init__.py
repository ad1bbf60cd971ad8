from . import modular, ntt, crt, limb, poly  # noqa: F401
