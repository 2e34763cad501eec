from . import mesh, sharded  # noqa: F401
from .mesh import batch_sharding, make_mesh  # noqa: F401
from .sharded import (  # noqa: F401
    decode_chunked_sharded,
    encode_chunked_sharded,
    global_range,
)
