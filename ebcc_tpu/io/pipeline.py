"""Streaming storage pipeline: file-to-file compression with I/O overlapped
against codec compute.

Role parity + upgrade: the reference's I/O story is HDF5 calling the filter
once per chunk, serially, on one thread (SURVEY §3.1); large archives are
processed by looping files.  Here archives stream: a reader thread
prefetches the next slab of chunks from the source (HDF5 dataset, npy
memmap, or any array-like supporting basic slicing) while the batched codec
(device compute + link transfers + threaded zstd, themselves pipelined)
works on the current slab, and chunk records append to the output container
incrementally — peak memory is two slabs regardless of archive size.

Chunk record order matches ``encode_chunked`` exactly, so the streamed
container is byte-identical to an in-memory encode and decodes with any
ETPK consumer (including the native plugin).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import IO, Optional

import os

import numpy as np

from ..config import RESIDUAL_LOSSLESS, CodecConfig, EncodeOptions
from ..core import codec as _codec
from ..core import stream
from ..utils.logging import logger


def _slab_chunks(data, config: CodecConfig, chunk_dims, counts, i0: int):
    """Materialize slab i0 (all chunks with leading chunk-index i0) with
    edge-replicate padding, in chunk-linear order."""
    c0 = chunk_dims[0]
    d0, d1, d2 = config.dims
    lo = i0 * c0
    hi = min(lo + c0, d0)
    slab = np.asarray(data[lo:hi], dtype=np.float32)
    if hi - lo < c0:  # pad leading dim by edge replication
        pad = np.repeat(slab[-1:], c0 - (hi - lo), axis=0)
        slab = np.concatenate([slab, pad], axis=0)
    sub_counts = (1, counts[1], counts[2])
    return _codec._gather_chunks(slab, chunk_dims, sub_counts)


def compress_stream(data, config: CodecConfig, out: IO[bytes],
                    opts: Optional[EncodeOptions] = None,
                    max_batch: int = _codec.DEFAULT_MAX_BATCH) -> int:
    """Compress an array-like (h5py dataset, np.memmap, ndarray) of shape
    ``config.dims`` into ``out`` as an ETPK container.  Returns bytes
    written."""
    opts = opts or EncodeOptions.from_env()
    chunk_dims = tuple(config.chunk_dims)
    if all(c == 0 for c in chunk_dims):
        chunk_dims = tuple(config.dims)
    _codec._layout(chunk_dims)
    counts = _codec._chunk_grid(config.dims, chunk_dims)
    num_chunks = int(np.prod(counts))
    n_frames, h, w = _codec._layout(chunk_dims)

    chunk_cfg = config.per_chunk(chunk_dims)

    header = stream.ChunkedHeader(
        dims=tuple(config.dims), chunk_dims=chunk_dims,
        num_chunks=num_chunks, chunk_size=int(np.prod(chunk_dims)))
    written = out.write(header.pack())

    import struct

    with ThreadPoolExecutor(max_workers=1) as reader:
        fut = reader.submit(_slab_chunks, data, config, chunk_dims, counts, 0)
        for i0 in range(counts[0]):
            chunks = fut.result()
            if i0 + 1 < counts[0]:
                fut = reader.submit(_slab_chunks, data, config, chunk_dims,
                                    counts, i0 + 1)
            batch = chunks.reshape(-1, n_frames, h, w)
            if config.residual_mode == RESIDUAL_LOSSLESS:
                streams = _codec._lossless_encode_frames(batch, chunk_cfg)
            else:
                batch, nan_masks = _codec._mask_fill_check(
                    batch, config.allow_nan)
                batch, slab_cfg = _codec._log_transform_check(batch,
                                                              chunk_cfg)
                slices = [batch[s:s + max_batch]
                          for s in range(0, len(batch), max_batch)]
                counts_per = [s.shape[0] for s in slices]
                streams = _codec._pipeline_encode_slices(
                    slices, counts_per, slab_cfg, opts, n_frames, h, w)
                streams = _codec._set_log_flags(streams, slab_cfg,
                                                chunk_cfg)
                streams = _codec._append_mask_sections(
                    streams, nan_masks, config.zstd_level)
            for s in streams:
                written += out.write(struct.pack("<Q", len(s)))
                written += out.write(s)
    logger.info("streamed %d chunks, %d bytes", num_chunks, written)
    return written


def compress_hdf5(src_path: str, variable: str, dst_path: str,
                  config_kwargs: Optional[dict] = None,
                  opts: Optional[EncodeOptions] = None) -> int:
    """Compress one variable of an HDF5/netCDF4 file into an ETPK file.

    The dataset is read lazily slab-by-slab; leading dims beyond 3 are
    flattened.  ``config_kwargs`` feed CodecConfig (dims is inferred)."""
    import h5py

    with h5py.File(src_path, "r") as f:
        dset = f[variable]
        shape = dset.shape
        if len(shape) < 2:
            raise ValueError("need at least 2-D data")
        dims = (int(np.prod(shape[:-2], dtype=np.int64)) or 1,
                shape[-2], shape[-1])

        class _Lazy:
            def __getitem__(self, sl):
                return np.asarray(dset[sl] if len(shape) == 3
                                  else dset[...].reshape(dims)[sl],
                                  np.float32)

        kw = dict(config_kwargs or {})
        kw.setdefault("chunk_dims", (1, dims[1], dims[2]))
        config = CodecConfig(dims=dims, **kw)
        src = _Lazy() if len(shape) == 3 else dset[...].reshape(dims)
        with open(dst_path, "wb") as out:
            return compress_stream(src, config, out, opts)


def decompress_stream(inp: IO[bytes], max_batch: int =
                      _codec.DEFAULT_MAX_BATCH) -> np.ndarray:
    """Decode an ETPK container from a readable binary stream."""
    return _codec.decode_chunked(inp.read(), max_batch=max_batch)


def _append_precheck(header, data: np.ndarray):
    d0, d1, d2 = header.dims
    c0, c1, c2 = header.chunk_dims
    if data.ndim == 2:
        data = data[None]
    if data.ndim != 3 or data.shape[1:] != (d1, d2):
        raise ValueError(
            f"appended data must be (*, {d1}, {d2}); got {data.shape}")
    if d0 % c0 != 0:
        raise ValueError(
            "container's leading dim is not chunk-aligned (its last chunk "
            "group was edge-padded); cannot append without re-encoding")
    return data


def append_chunked(buf: bytes, data, config: CodecConfig,
                   opts: Optional[EncodeOptions] = None) -> bytes:
    """Append frames along the leading axis of an existing ETPK container
    (growing archives: hourly data arrives, the container grows).

    Chunk independence makes this exact: the new frames are encoded as
    fresh chunk groups with the container's own chunk dims and
    concatenated after the existing records; only the 80-byte header
    changes.  ``config`` supplies the codec knobs (bound, backends,
    temporal, allow_nan) — the container does not record them; dims and
    chunk_dims are taken from the container.  The container's leading dim
    must be a multiple of its leading chunk dim (true whenever it was
    written whole-chunks; otherwise its final chunk group was edge-padded
    and appending would duplicate those frames).
    """
    import dataclasses

    header, chunk_streams = stream.iter_chunked(buf)
    data = _append_precheck(header, np.asarray(data, np.float32))
    sub_cfg = dataclasses.replace(
        config, dims=(data.shape[0], *header.dims[1:]),
        chunk_dims=tuple(header.chunk_dims))
    from ..core.codec import encode_chunked

    _, new_streams = stream.iter_chunked(encode_chunked(data, sub_cfg, opts))
    new_header = stream.ChunkedHeader(
        dims=(header.dims[0] + data.shape[0], *header.dims[1:]),
        chunk_dims=tuple(header.chunk_dims),
        num_chunks=header.num_chunks + len(new_streams),
        chunk_size=header.chunk_size)
    return stream.pack_chunked(new_header,
                               list(chunk_streams) + list(new_streams))


def append_chunked_file(path: str, data, config: CodecConfig,
                        opts: Optional[EncodeOptions] = None) -> int:
    """In-place file append: new chunk records are written at the end and
    only the fixed 80-byte header is rewritten — O(new data), not
    O(container).  Same contract as :func:`append_chunked`.  Returns bytes
    appended.

    Crash posture: the header is rewritten LAST, so until that final
    80-byte write lands the file still reads as the OLD archive plus
    trailing bytes.  A write failure (disk full, I/O error) truncates
    back to the original size, restoring the old archive exactly; a hard
    kill between the record writes and the header write leaves trailing
    bytes that every reader rejects loudly — :func:`repair_chunked_file`
    truncates them away."""
    import dataclasses
    import struct

    # buffering=0: the failure handler must be able to discard partial
    # record bytes with os.ftruncate alone — a buffered truncate() first
    # flushes, which re-raises ENOSPC in exactly the disk-full case the
    # handler exists for.
    with open(path, "r+b", buffering=0) as f:
        header = stream.ChunkedHeader.unpack(f.read(stream.CHUNKED_HEADER_SIZE))
        data = _append_precheck(header, np.asarray(data, np.float32))
        sub_cfg = dataclasses.replace(
            config, dims=(data.shape[0], *header.dims[1:]),
            chunk_dims=tuple(header.chunk_dims))
        from ..core.codec import encode_chunked

        _, new_streams = stream.iter_chunked(
            encode_chunked(data, sub_cfg, opts))
        old_size = f.seek(0, 2)
        written = 0

        def write_all(buf):
            mv = memoryview(buf)
            while mv:  # raw FileIO writes can be partial
                mv = mv[f.write(mv):]
            return len(buf)

        try:
            for s in new_streams:
                written += write_all(struct.pack("<Q", len(s)))
                written += write_all(s)
            os.fsync(f.fileno())
        except Exception:
            # restore the old archive exactly (the header still says the
            # old chunk count, so only the trailing bytes must go)
            os.ftruncate(f.fileno(), old_size)
            raise
        new_header = stream.ChunkedHeader(
            dims=(header.dims[0] + data.shape[0], *header.dims[1:]),
            chunk_dims=tuple(header.chunk_dims),
            num_chunks=header.num_chunks + len(new_streams),
            chunk_size=header.chunk_size)
        f.seek(0)
        f.write(new_header.pack())
    return written


def repair_chunked_file(path: str) -> int:
    """Recover an archive whose append was killed mid-write: walk the
    records the HEADER declares and truncate anything after them.
    Returns bytes removed (0 when the file was already consistent)."""
    import struct

    with open(path, "r+b") as f:
        header = stream.ChunkedHeader.unpack(
            f.read(stream.CHUNKED_HEADER_SIZE))
        size = f.seek(0, 2)
        off = stream.CHUNKED_HEADER_SIZE
        for i in range(header.num_chunks):
            f.seek(off)
            raw = f.read(8)
            if len(raw) < 8:
                raise stream.StreamError(f"missing chunk {i} size")
            (csz,) = struct.unpack("<Q", raw)
            if off + 8 + csz > size:
                raise stream.StreamError(f"truncated chunk {i} payload")
            off += 8 + csz
        removed = size - off
        if removed:
            f.truncate(off)
    return removed
