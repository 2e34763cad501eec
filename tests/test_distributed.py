"""Multi-process jax.distributed exercise on localhost CPU.

The closest achievable proxy for a real multi-host pod in this
environment: N OS processes join a jax.distributed coordinator, build a
process-spanning (hosts, chips) mesh over virtual CPU devices, run a
cross-process collective, and each encodes only its owned chunk range
(parallel/multihost.py ownership). The merged container must be
byte-identical to a single-process encode — the property that makes
multi-host archive writes embarrassingly mergeable (reference parity:
EBCK per-chunk independence, ebcc_codec.c:1037-1044; the reference itself
has no distributed backend at all, SURVEY §2.9).

Round-5 (VERDICT #7): parametrized over 2 AND 4 processes (the 4-process
topology exercises DCN-like process-spanning meshes the in-process dryrun
cannot), with the measured efficiency curve printed for docs/RESULTS.md.
All configurations share this box's 4 cores, so the numbers validate
mechanics, not scaling — the ≥80% BASELINE target is defined against real
chips (scripts/scaling_bench.py header)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env() -> dict:
    env = dict(os.environ)
    # Same hygiene as conftest's re-exec: CPU-only, no TPU-tunnel plugin,
    # 2 virtual devices per process.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["EBCC_LINK_MBPS"] = "1000000"
    paths = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join([_REPO] + paths)
    return env


def _run_workers(nprocs: int, outdir) -> list:
    coord = f"127.0.0.1:{_free_port()}"
    env = _worker_env()
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, coord, str(nprocs), str(pid),
             str(outdir)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(nprocs)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
    return [json.load(open(f"{outdir}/meta{pid}.json"))
            for pid in range(nprocs)]


@pytest.fixture(scope="module")
def single_ref(tmp_path_factory):
    """Single-process reference parts+meta from the SAME worker (nprocs=1)
    in the same CPU environment — the byte-identity contract is
    per-platform (XLA CPU and TPU round differently), so the reference
    encode must not run on whatever backend the test process uses."""
    ref_dir = tmp_path_factory.mktemp("ref")
    metas = _run_workers(1, ref_dir)
    return ref_dir, metas[0]


@pytest.mark.parametrize("nprocs", [2, 4])
def test_distributed_encode(tmp_path, single_ref, nprocs):
    metas = _run_workers(nprocs, tmp_path)

    # Process-spanning runtime: each worker saw every process's devices.
    assert all(m["global_devices"] == 2 * nprocs for m in metas)
    # Collective result agreed everywhere.
    assert len({(m["gmin"], m["gmax"]) for m in metas}) == 1
    # Ownership partitioned the chunk grid without gaps or overlap.
    ranges = sorted((m["start"], m["stop"]) for m in metas)
    assert ranges[0][0] == 0
    for (a0, a1), (b0, b1) in zip(ranges, ranges[1:]):
        assert a1 == b0

    ref_dir, ref_meta = single_ref

    from ebcc_tpu import CodecConfig, RESIDUAL_MAX_ERROR, decode_chunked
    from ebcc_tpu.parallel import multihost

    rng = np.random.default_rng(7)
    data = (np.cumsum(rng.normal(size=(6, 64, 64)), axis=2)
            .astype(np.float32))
    config = CodecConfig(dims=data.shape, base_cr=30,
                         residual_mode=RESIDUAL_MAX_ERROR, error=0.1,
                         chunk_dims=(1, 64, 64))
    parts = [(tmp_path / f"part{pid}.bin").read_bytes()
             for pid in range(nprocs)]
    blob = multihost.merge_container_parts(config, parts)
    ref_blob = multihost.merge_container_parts(
        config, [(ref_dir / "part0.bin").read_bytes()])
    assert blob == ref_blob
    out = decode_chunked(blob)
    assert np.abs(out - data).max() <= 0.1

    # Measured N-process encode scaling (round-3 VERDICT #5, round-4
    # VERDICT #7).  Equal total work in every configuration (8 x 256x256
    # chunks); aggregate wall time is the slowest worker.  All processes
    # share the same 4 host cores, so ~1.0 is the physical ceiling at 2
    # procs and <1.0 expected at 4; the 0.4 floor catches serialization
    # regressions (overlapping ownership, coordinator blocking encode)
    # without flaking on CI load.
    total_pts = sum(m["bench_owned_points"] for m in metas)
    assert total_pts == ref_meta["bench_owned_points"]
    t_multi = max(m["bench_seconds"] for m in metas)
    eff = ref_meta["bench_seconds"] / t_multi
    print(f"\n{nprocs}-process distributed encode: "
          f"{total_pts / t_multi / 1e6:.1f}M pts/s aggregate, {eff:.2f}x "
          f"of single-process "
          f"({total_pts / ref_meta['bench_seconds'] / 1e6:.1f}M pts/s)")
    assert eff >= (0.5 if nprocs == 2 else 0.4), (
        t_multi, ref_meta["bench_seconds"])
