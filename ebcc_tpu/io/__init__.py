from . import pipeline  # noqa: F401
from .pipeline import compress_hdf5, compress_stream, decompress_stream  # noqa: F401
