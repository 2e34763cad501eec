"""Opt-in stage timing (observability parity: the reference traces its
search loops per-trial via log_trace, ebcc_codec.c:554-803; here the stages
worth tracing are device dispatch / link transfers / host entropy work).

Enable with ``EBCC_TIMING=1``; stages log at INFO with millisecond wall
times.  Zero overhead when disabled.
"""

from __future__ import annotations

import contextlib
import os
import time

from .logging import logger

ENABLED = os.environ.get("EBCC_TIMING") == "1"


@contextlib.contextmanager
def stage(name: str):
    if not ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        logger.warning("[timing] %-28s %7.1f ms", name,
                       (time.perf_counter() - t0) * 1e3)
