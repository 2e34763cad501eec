from . import cli, filter_wrapper, hdf5, zarr_filter  # noqa: F401
from .filter_wrapper import EBCC_Filter, populate_config  # noqa: F401
from .zarr_filter import EBCCZarrFilter  # noqa: F401
