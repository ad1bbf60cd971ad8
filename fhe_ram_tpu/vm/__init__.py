from . import fheuint, circuits  # noqa: F401
