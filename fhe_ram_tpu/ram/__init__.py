from . import address, ram  # noqa: F401
