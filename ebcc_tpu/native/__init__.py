"""Native (C++) ETPU codec bindings.

Role parity: the reference's Python layer discovers the built plugin lib
next to the package and exposes ``EBCC_FILTER_PATH``/``EBCC_FILTER_DIR``
for HDF5_PLUGIN_PATH consumers (reference ebcc/__init__.py:1-30), and
reaches the codec through ctypes for Zarr (zarr_filter.py).  This module
does the same for ``libh5z_etpu.so``: `build()` compiles it on demand with
CMake+Ninja, `load()` binds the C API with ctypes, and ``FILTER_PATH`` /
``FILTER_DIR`` point h5py/netCDF/CDO at the plugin.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

NATIVE_DIR = Path(__file__).resolve().parent
BUILD_DIR = NATIVE_DIR / "build"
LIB_NAME = "libh5z_etpu.so"

FILTER_DIR: Optional[str] = None
FILTER_PATH: Optional[str] = None


class _ConfigStruct(ctypes.Structure):
    """ctypes mirror of etpu_config_t (etpu_codec.h)."""

    _fields_ = [
        ("dims", ctypes.c_uint64 * 3),
        ("base_cr", ctypes.c_float),
        ("residual_mode", ctypes.c_int32),
        ("error", ctypes.c_float),
        ("chunk_dims", ctypes.c_uint64 * 3),
        ("zstd_level", ctypes.c_int32),
        ("entropy_backend", ctypes.c_int32),
        ("temporal", ctypes.c_int32),
        ("allow_nan", ctypes.c_int32),
    ]


def lib_path() -> Optional[Path]:
    """Locate the built library: EBCC_FILTER_PATH (a file), then
    EBCC_FILTER_DIR (a directory holding ``libh5z_etpu*``), then the
    in-tree build dir.  The env hooks are how a wheel user points at a
    prebuilt release plugin on machines without a native toolchain
    (reference parity: ebcc/__init__.py EBCC_FILTER_PATH/DIR)."""
    import os

    envp = os.environ.get("EBCC_FILTER_PATH")
    if envp and Path(envp).is_file():
        return Path(envp)
    envd = os.environ.get("EBCC_FILTER_DIR")
    if envd and Path(envd).is_dir():
        for cand in sorted(Path(envd).glob("libh5z_etpu*")):
            if cand.is_file():
                return cand
    p = BUILD_DIR / LIB_NAME
    return p if p.exists() else None


def build(force: bool = False) -> Path:
    """Compile the native library (CMake + Ninja).  Idempotent; an
    env-provided prebuilt library (see :func:`lib_path`) short-circuits.

    The CAB entropy coder is built with profile-guided optimization
    (measured ~10% on the bench payloads): configure+build with
    ``-fprofile-generate``, run the ``cab_train`` trainer, reconfigure
    with ``-fprofile-use``, rebuild.  Any failure in the PGO sequence
    falls back to a plain build (``EBCC_NO_PGO=1`` skips it outright —
    e.g. cross-compiling release wheels where the trainer can't run)."""
    import os

    found = lib_path()
    if not force and found:
        return found
    BUILD_DIR.mkdir(exist_ok=True)

    def _cmake(pgo: str):
        subprocess.run(
            ["cmake", "-G", "Ninja", "-DCMAKE_BUILD_TYPE=Release",
             f"-DETPU_PGO={pgo}", ".."],
            cwd=BUILD_DIR, check=True, capture_output=True)
        subprocess.run(["ninja"], cwd=BUILD_DIR, check=True,
                       capture_output=True)

    if os.environ.get("EBCC_NO_PGO"):
        _cmake("OFF")
    else:
        try:
            _cmake("generate")
            subprocess.run([str(BUILD_DIR / "cab_train")], cwd=BUILD_DIR,
                           check=True, capture_output=True, timeout=300)
            _cmake("use")
        except Exception:
            _cmake("OFF")
    p = BUILD_DIR / LIB_NAME
    if not p.exists():
        raise RuntimeError("native build produced no library")
    return p


_lib = None


def load(auto_build: bool = True):
    """Load (building if needed) and return the ctypes-bound library.

    A stale library (in-tree build from an older checkout, or an old
    prebuilt plugin via EBCC_FILTER_PATH/DIR) lacks newer symbols; the
    in-tree case rebuilds automatically, the env-provided case fails with
    a clear message instead of an AttributeError deep in a decode."""
    global _lib, FILTER_DIR, FILTER_PATH
    if _lib is not None:
        return _lib
    p = lib_path()
    if p is None:
        if not auto_build:
            raise FileNotFoundError(f"{LIB_NAME} not built")
        p = build()
    lib = ctypes.CDLL(str(p))
    if not hasattr(lib, "etpu_sparse_to_planes"):  # newest symbol
        if Path(p).parent == BUILD_DIR and auto_build:
            p = build(force=True)
            lib = ctypes.CDLL(str(p))
        if not hasattr(lib, "etpu_sparse_to_planes"):
            raise RuntimeError(
                f"native library at {p} is too old for this package "
                "version; rebuild it or point EBCC_FILTER_PATH/DIR at a "
                "matching build")
    lib.etpu_decode.restype = ctypes.c_size_t
    lib.etpu_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float))]
    lib.etpu_decode_chunked.restype = ctypes.c_size_t
    lib.etpu_decode_chunked.argtypes = lib.etpu_decode.argtypes
    lib.etpu_encode.restype = ctypes.c_size_t
    lib.etpu_encode.argtypes = [
        np.ctypeslib.ndpointer(ctypes.c_float, flags="C_CONTIGUOUS"),
        ctypes.POINTER(_ConfigStruct),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
    lib.etpu_encode_chunked.restype = ctypes.c_size_t
    lib.etpu_encode_chunked.argtypes = lib.etpu_encode.argtypes
    lib.etpu_free.argtypes = [ctypes.c_void_p]
    lib.etpu_version.restype = ctypes.c_char_p
    lib.etpu_cab_compress.restype = ctypes.c_size_t
    lib.etpu_cab_compress.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
    lib.etpu_rice_decode.restype = ctypes.c_size_t
    lib.etpu_rice_decode.argtypes = [
        np.ctypeslib.ndpointer(ctypes.c_uint32, flags="C_CONTIGUOUS"),
        ctypes.c_size_t, ctypes.c_size_t,
        np.ctypeslib.ndpointer(ctypes.c_int32, flags="C_CONTIGUOUS")]
    lib.etpu_rice_decode_gaps_classed.restype = ctypes.c_size_t
    lib.etpu_rice_decode_gaps_classed.argtypes = [
        np.ctypeslib.ndpointer(ctypes.c_uint32, flags="C_CONTIGUOUS"),
        ctypes.c_size_t, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(ctypes.c_uint8, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(ctypes.c_int32, flags="C_CONTIGUOUS")]
    lib.etpu_rice_decode_classed.restype = ctypes.c_size_t
    lib.etpu_rice_decode_classed.argtypes = [
        np.ctypeslib.ndpointer(ctypes.c_uint32, flags="C_CONTIGUOUS"),
        ctypes.c_size_t, ctypes.c_size_t,
        np.ctypeslib.ndpointer(ctypes.c_uint8, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(ctypes.c_uint8, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(ctypes.c_int32, flags="C_CONTIGUOUS")]
    lib.etpu_rice_block_pack.restype = ctypes.c_size_t
    lib.etpu_rice_block_pack.argtypes = [
        np.ctypeslib.ndpointer(ctypes.c_int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(ctypes.c_int32, flags="C_CONTIGUOUS"),
        ctypes.c_size_t, ctypes.c_int,
        np.ctypeslib.ndpointer(ctypes.c_uint32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(ctypes.c_uint16, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(ctypes.c_uint16, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(ctypes.c_uint8, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(ctypes.c_int32, flags="C_CONTIGUOUS")]
    lib.etpu_planes_to_sparse.restype = ctypes.c_size_t
    lib.etpu_planes_to_sparse.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_size_t,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(ctypes.c_int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(ctypes.c_int32, flags="C_CONTIGUOUS")]
    lib.etpu_sparse_to_planes.restype = ctypes.c_int
    lib.etpu_sparse_to_planes.argtypes = [
        np.ctypeslib.ndpointer(ctypes.c_int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(ctypes.c_int32, flags="C_CONTIGUOUS"),
        ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(ctypes.c_uint8, flags="C_CONTIGUOUS")]
    lib.etpu_cab_decompress.restype = ctypes.c_size_t
    lib.etpu_cab_decompress.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(ctypes.c_ubyte, flags="C_CONTIGUOUS"),
        ctypes.c_size_t]
    # Backend 4 ("cab2", relaxed-eligibility profile): same ABI shape.
    lib.etpu_cab2_compress.restype = ctypes.c_size_t
    lib.etpu_cab2_compress.argtypes = list(lib.etpu_cab_compress.argtypes)
    lib.etpu_cab2_decompress.restype = ctypes.c_size_t
    lib.etpu_cab2_decompress.argtypes = list(lib.etpu_cab_decompress.argtypes)
    lib.etpu_spiht_encode.restype = ctypes.c_size_t
    lib.etpu_spiht_encode.argtypes = [
        np.ctypeslib.ndpointer(ctypes.c_float, flags="C_CONTIGUOUS"),
        ctypes.c_size_t, ctypes.c_size_t, ctypes.c_size_t, ctypes.c_size_t,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
    lib.etpu_spiht_decode.restype = ctypes.c_int
    lib.etpu_spiht_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        np.ctypeslib.ndpointer(ctypes.c_float, flags="C_CONTIGUOUS"),
        ctypes.c_size_t, ctypes.c_size_t, ctypes.c_size_t]
    _lib = lib
    FILTER_DIR = str(Path(p).parent)
    FILTER_PATH = str(p)
    return lib


def _make_config(config) -> _ConfigStruct:
    c = _ConfigStruct()
    for i in range(3):
        c.dims[i] = config.dims[i]
        c.chunk_dims[i] = config.chunk_dims[i]
    c.base_cr = config.base_cr
    c.residual_mode = config.residual_mode
    c.error = config.error
    c.zstd_level = config.zstd_level
    c.entropy_backend = {"zstd": 1, "cab": 2, "auto": 3, "cab2": 4}.get(
        getattr(config, "entropy_backend", "zstd"), 1)
    c.temporal = 1 if getattr(config, "temporal", False) else 0
    c.allow_nan = 1 if getattr(config, "allow_nan", False) else 0
    return c


def native_encode(data: np.ndarray, config) -> bytes:
    """Encode through the native codec (single chunk)."""
    lib = load()
    data = np.ascontiguousarray(data, dtype=np.float32).ravel()
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = lib.etpu_encode(data, ctypes.byref(_make_config(config)),
                        ctypes.byref(out))
    if n == 0:
        raise RuntimeError("native encode failed")
    try:
        return bytes(ctypes.cast(out, ctypes.POINTER(ctypes.c_ubyte * n))
                     .contents)
    finally:
        lib.etpu_free(out)


def native_encode_chunked(data: np.ndarray, config) -> bytes:
    lib = load()
    data = np.ascontiguousarray(data, dtype=np.float32).ravel()
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = lib.etpu_encode_chunked(data, ctypes.byref(_make_config(config)),
                                ctypes.byref(out))
    if n == 0:
        raise RuntimeError("native chunked encode failed")
    try:
        return bytes(ctypes.cast(out, ctypes.POINTER(ctypes.c_ubyte * n))
                     .contents)
    finally:
        lib.etpu_free(out)


def native_decode(blob: bytes) -> np.ndarray:
    """Decode an ETPU or ETPK payload through the native codec."""
    lib = load()
    out = ctypes.POINTER(ctypes.c_float)()
    n = lib.etpu_decode(blob, len(blob), ctypes.byref(out))
    if n == 0:
        raise RuntimeError("native decode failed")
    try:
        arr = np.ctypeslib.as_array(out, shape=(n,)).copy()
    finally:
        lib.etpu_free(out)
    return arr


def cab_compress(payload: bytes, kept: int, d0: int, hp: int, wp: int,
                 levels: int) -> bytes:
    """Context-adaptive arithmetic compression of a raw layer payload
    (entropy backend id 2; see native/cab_coder.cc)."""
    lib = load()
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = lib.etpu_cab_compress(payload, len(payload), kept, d0, hp, wp,
                              levels, ctypes.byref(out))
    if n == 0:
        raise RuntimeError("CAB compress failed")
    try:
        return bytes(ctypes.cast(out, ctypes.POINTER(ctypes.c_ubyte * n))
                     .contents)
    finally:
        lib.etpu_free(out)


def cab_decompress(comp: bytes, kept: int, d0: int, hp: int, wp: int,
                   levels: int) -> bytes:
    lib = load()
    size = (kept + 1) * d0 * hp * (wp // 8)
    buf = np.zeros(size, np.uint8)
    n = lib.etpu_cab_decompress(comp, len(comp), kept, d0, hp, wp, levels,
                                buf, size)
    if n != size:
        raise ValueError("corrupt CAB payload")
    return buf.tobytes()


def cab2_compress(payload: bytes, kept: int, d0: int, hp: int, wp: int,
                  levels: int) -> bytes:
    """Relaxed-eligibility CAB profile (entropy backend id 4): ~2x fewer
    coder calls than backend 2 for ~1-2% stream growth (cab_coder.cc)."""
    lib = load()
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = lib.etpu_cab2_compress(payload, len(payload), kept, d0, hp, wp,
                               levels, ctypes.byref(out))
    if n == 0:
        raise RuntimeError("CAB2 compress failed")
    try:
        return bytes(ctypes.cast(out, ctypes.POINTER(ctypes.c_ubyte * n))
                     .contents)
    finally:
        lib.etpu_free(out)


def cab2_decompress(comp: bytes, kept: int, d0: int, hp: int, wp: int,
                    levels: int) -> bytes:
    lib = load()
    size = (kept + 1) * d0 * hp * (wp // 8)
    buf = np.zeros(size, np.uint8)
    n = lib.etpu_cab2_decompress(comp, len(comp), kept, d0, hp, wp, levels,
                                 buf, size)
    if n != size:
        raise ValueError("corrupt CAB2 payload")
    return buf.tobytes()


def rice_decode(words: np.ndarray, nnz: int) -> np.ndarray:
    """Decode the device-packed Rice value exchange (transfer.rice_pack)."""
    lib = load()
    words = np.ascontiguousarray(words, dtype=np.uint32)
    out = np.empty(nnz, np.int32)
    n = lib.etpu_rice_decode(words, words.size, nnz, out)
    if n != nnz:
        raise ValueError("corrupt rice exchange payload")
    return out


def rice_decode_gaps_classed(words: np.ndarray, nnz: int, hp: int, wp: int,
                             ks: np.ndarray) -> np.ndarray:
    """Decode the previous-position-classed gap stream directly to sorted
    POSITIONS (transfer.rice_pack_pair with a_cls)."""
    lib = load()
    words = np.ascontiguousarray(words, dtype=np.uint32)
    ks = np.ascontiguousarray(ks, dtype=np.uint8)
    out = np.empty(nnz, np.int32)
    n = lib.etpu_rice_decode_gaps_classed(words, words.size, nnz, hp, wp,
                                          ks, out)
    if n != nnz:
        raise ValueError("corrupt classed gap exchange payload")
    return out


def rice_decode_classed(words: np.ndarray, nnz: int, cls: np.ndarray,
                        ks: np.ndarray) -> np.ndarray:
    """Decode the subband-classed Rice value stream: element i uses Rice
    parameter ks[cls[i]] (transfer.rice_pack_pair with b_cls)."""
    lib = load()
    words = np.ascontiguousarray(words, dtype=np.uint32)
    cls = np.ascontiguousarray(cls, dtype=np.uint8)
    ks = np.ascontiguousarray(ks, dtype=np.uint8)
    out = np.empty(nnz, np.int32)
    n = lib.etpu_rice_decode_classed(words, words.size, nnz, cls, ks, out)
    if n != nnz:
        raise ValueError("corrupt classed rice exchange payload")
    return out


def rice_block_pack(idx: np.ndarray, vals: np.ndarray, block: int = 128):
    """C-speed blocked-Rice packer for the decode-direction upload; bit
    layout contract in native/rice_block_pack.cc, numpy reference in
    transfer.rice_block_pack_host (the GIL-free loop matters: the numpy
    version degrades ~17x under pipeline thread contention)."""
    lib = load()
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    vals = np.ascontiguousarray(vals, dtype=np.int32)
    n = int(idx.size)
    nb = max(1, -(-n // block))
    words = np.empty((104 * max(n, 1)) // 32 + 4, np.uint32)
    lens_g = np.empty(nb, np.uint16)
    lens_v = np.empty(nb, np.uint16)
    k_packed = np.empty(nb, np.uint8)
    base_pos = np.empty(nb, np.int32)
    used = lib.etpu_rice_block_pack(idx, vals, n, block, words, lens_g,
                                    lens_v, k_packed, base_pos)
    if used == 0:
        raise ValueError("rice_block_pack failed")
    # +3 zero pad words: the device unpacker reads a 3-word window at the
    # last code's offset (transfer.rice_block_unpack clips wi to nw-3).
    words[used:used + 3] = 0
    return words[:used + 3].copy(), lens_g, lens_v, k_packed, base_pos, nb


def planes_to_sparse(raw: bytes, kept: int, pb: int, d0: int, hp: int,
                     wp: int):
    """Dense bitplane payload -> (positions, signed magnitudes-at-cut).

    C-speed replacement for the numpy per-plane unpack in the decode
    direction of the sparse exchange (see native/sparse_unpack.cc); byte
    columns that are zero in every kept plane are skipped."""
    lib = load()
    n = d0 * hp * wp
    idx = np.empty(n, np.int32)
    vals = np.empty(n, np.int32)
    k = lib.etpu_planes_to_sparse(raw, len(raw), kept, pb, d0, hp, wp,
                                  idx, vals)
    if k == ctypes.c_size_t(-1).value:
        raise ValueError("malformed plane payload")
    return idx[:k], vals[:k]


def sparse_to_planes(pos: np.ndarray, vals: np.ndarray, shift: int,
                     msb: int, d0: int, hp: int, wp: int) -> bytes:
    """(positions, signed values) -> dense packed bitplane payload bytes
    (msb magnitude rows MSB-first + masked sign row) — the encode-direction
    inverse of :func:`planes_to_sparse`; element work scales with the
    significant count instead of the dense grid (see sparse_unpack.cc)."""
    lib = load()
    pos = np.ascontiguousarray(pos, dtype=np.int32)
    vals = np.ascontiguousarray(vals, dtype=np.int32)
    payload = np.empty((msb + 1) * (d0 * hp * (wp // 8)), np.uint8)
    rc = lib.etpu_sparse_to_planes(pos, vals, pos.size, shift, msb,
                                   d0, hp, wp, payload)
    if rc != 0:
        raise ValueError("sparse_to_planes: bad geometry")
    return payload.tobytes()


def spiht_encode(norm: np.ndarray, trunc_bits: int = 0,
                 num_stages: int = 3) -> bytes:
    """Encode a [0,1]-normalized 2-D residual into a legacy SPIHT "IMS"
    stream (reference-format interop; spiht_re.c:432-475 mirror in
    native/spiht_coder.cc)."""
    lib = load()
    norm = np.ascontiguousarray(norm, dtype=np.float32)
    if norm.ndim != 2:
        raise ValueError("spiht_encode expects a 2-D frame")
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = lib.etpu_spiht_encode(norm, norm.shape[0], norm.shape[1],
                              trunc_bits, num_stages, ctypes.byref(out))
    if n == 0:
        raise RuntimeError("SPIHT encode failed (bad dims or input range)")
    try:
        return bytes(ctypes.cast(out, ctypes.POINTER(ctypes.c_ubyte * n))
                     .contents)
    finally:
        lib.etpu_free(out)


def spiht_decode(blob: bytes, height: int, width: int,
                 num_bits: int) -> np.ndarray:
    """Decode a legacy SPIHT "IMS" stream (possibly truncated) back to the
    [0,1]-normalized residual frame (spiht_re.c:477-520 mirror)."""
    lib = load()
    out = np.zeros((height, width), np.float32)
    rc = lib.etpu_spiht_decode(blob, len(blob), out, height, width, num_bits)
    if rc != 0:
        raise ValueError(f"corrupt SPIHT stream (code {rc})")
    return out
