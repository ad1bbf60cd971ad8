from . import io, profiling  # noqa: F401
