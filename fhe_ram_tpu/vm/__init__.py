from . import fheuint, circuits, arithmetic, store, conversion  # noqa: F401
