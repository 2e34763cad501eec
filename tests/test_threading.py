"""Host-pipeline thread-safety stress (round-2 VERDICT #8).

The reference is single-threaded end to end; this build runs entropy
coding, stream assembly, exchange fetches and prefetch on worker threads
(core/codec.py pipelined paths) and keeps shared mutable state in
``routing._cache``, ``transfer.LINK_STATS``, ``codec._EXCH_HINTS`` and
``timing.STATS`` — all lock-guarded.  These tests hammer the public entry
points from many threads at once and assert (a) no exceptions, (b) the
error bound on every result, and (c) stream determinism: bytes produced
under contention are identical to bytes produced serially.
"""

import os
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

from ebcc_tpu import (CodecConfig, RESIDUAL_MAX_ERROR, decode_chunked,
                      encode_chunked)

N_THREADS = 6
N_ITERS = 3


def _dataset(base_test_data, seed):
    rng = np.random.default_rng(seed)
    crop = np.ascontiguousarray(base_test_data[:128, :192])
    return np.stack([
        crop + rng.normal(scale=0.05, size=crop.shape).astype(np.float32)
        for _ in range(3)
    ])


def _config(data):
    return CodecConfig(dims=data.shape, base_cr=25,
                       residual_mode=RESIDUAL_MAX_ERROR, error=0.1,
                       chunk_dims=(1, 64, 64))


def test_concurrent_device_roundtrips_deterministic(base_test_data):
    datasets = [_dataset(base_test_data, s) for s in range(N_THREADS)]
    serial = [encode_chunked(d, _config(d)) for d in datasets]

    errors = []
    barrier = threading.Barrier(N_THREADS)

    def worker(i):
        try:
            barrier.wait(timeout=120)
            for _ in range(N_ITERS):
                blob = encode_chunked(datasets[i], _config(datasets[i]))
                assert blob == serial[i], "stream bytes changed under contention"
                out = decode_chunked(blob)
                assert np.abs(out - datasets[i]).max() <= 0.1
        except Exception as e:  # noqa: BLE001 - collected for the assert
            errors.append((i, repr(e)))

    with ThreadPoolExecutor(max_workers=N_THREADS) as ex:
        list(ex.map(worker, range(N_THREADS)))
    assert not errors, errors


def test_concurrent_native_route(base_test_data, monkeypatch):
    from ebcc_tpu import native as native_mod
    try:
        native_mod.load()
    except Exception:
        pytest.skip("native toolchain unavailable")
    monkeypatch.setenv("EBCC_ENCODE_BACKEND", "native")
    monkeypatch.setenv("EBCC_DECODE_BACKEND", "native")
    datasets = [_dataset(base_test_data, 100 + s) for s in range(N_THREADS)]
    serial = [encode_chunked(d, _config(d)) for d in datasets]
    errors = []

    def worker(i):
        try:
            for _ in range(N_ITERS):
                blob = encode_chunked(datasets[i], _config(datasets[i]))
                assert blob == serial[i]
                out = decode_chunked(blob)
                assert np.abs(out - datasets[i]).max() <= 0.1
        except Exception as e:  # noqa: BLE001
            errors.append((i, repr(e)))

    with ThreadPoolExecutor(max_workers=N_THREADS) as ex:
        list(ex.map(worker, range(N_THREADS)))
    assert not errors, errors


def test_concurrent_mixed_routes_and_caches(base_test_data):
    """Mixed device/native calls racing the routing cache, the exchange
    hint table and the link-stat counters from a cold start.  Odd threads
    call the native codec DIRECTLY (no env mutation — os.environ is
    process-global, racing it would test the test, not the library)."""
    from ebcc_tpu import native as native_mod
    from ebcc_tpu.core import codec as codec_mod
    from ebcc_tpu.core import routing, transfer

    try:
        native_mod.load()
    except Exception:
        pytest.skip("native toolchain unavailable")
    routing.reset_cache()
    with codec_mod._EXCH_LOCK:
        codec_mod._EXCH_HINTS.clear()
    transfer.reset_link_stats()

    data = _dataset(base_test_data, 7)
    config = _config(data)
    ref = encode_chunked(data, config)
    errors = []

    def worker(i):
        try:
            if i % 2:
                blob = native_mod.native_encode_chunked(data, config)
            else:
                blob = encode_chunked(data, config)
                assert blob == ref
            out = decode_chunked(blob)
            assert np.abs(out - data).max() <= 0.1
        except Exception as e:  # noqa: BLE001
            errors.append((i, repr(e)))

    with ThreadPoolExecutor(max_workers=N_THREADS) as ex:
        list(ex.map(worker, range(N_THREADS)))
    assert not errors, errors
    up, down = transfer.LINK_STATS["up"], transfer.LINK_STATS["down"]
    assert up >= 0 and down >= 0
