from . import codec, entropy, kernels, stream  # noqa: F401
