from . import bitplane, dwt, metrics  # noqa: F401
