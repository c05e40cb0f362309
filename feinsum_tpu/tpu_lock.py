"""Cross-process serialization of TPU access.

This deployment reaches one TPU chip through an RPC relay whose compile
helpers WEDGE (compiles that never return, or HTTP 500 storms) when two
processes touch the chip concurrently — and concurrent timing runs pollute
each other's device traces (measured r4: a tuner racing an orphaned
re-evaluation inflated champion runtimes enough that the retire pass
deleted honest archive rows).  The reference serializes access socially
(one opentuner process per study); on this relay that is not enough,
because orphaned ``timeout``-wrapped children outlive a killed parent.

:func:`device_lock` is the mechanical fix: an advisory ``flock`` held for
the duration of every compile-and-measure region.  The kernel releases the
lock when a process dies (SIGKILL included), so orphans can never leave it
stuck.  Locking engages only when the ambient JAX platform may be a real
device (``jax_platforms`` unset, or naming tpu/axon); CPU-pinned test and
analysis processes skip it entirely without touching the backend (checking
``jax.devices()`` would itself attach to the TPU, which is exactly the
collision this module exists to prevent).
"""

from __future__ import annotations

import fcntl
import logging
import os
import time
from contextlib import contextmanager

logger = logging.getLogger(__name__)

LOCK_PATH = "/tmp/feinsum_tpu.device.lock"

_lock_file = None
_depth = 0


def _needs_lock() -> bool:
    if os.environ.get("FEINSUM_TPU_LOCK", "1") == "0":
        return False
    try:
        import jax
        platforms = jax.config.jax_platforms
    except Exception:  # noqa: BLE001 — unknown config layout: be safe
        return True
    if not platforms:          # auto-selection may pick the TPU
        return True
    return any(p.strip().lower() not in ("cpu",)
               for p in str(platforms).split(","))


@contextmanager
def device_lock(force: bool = False, poll_seconds: float = 2.0,
                lock_path: str = LOCK_PATH):
    """Hold the cross-process device lock around a compile-and-measure
    region.  Re-entrant within a process; blocks (with a periodic log
    line) while another process holds it; no-op when the ambient platform
    is CPU-pinned or ``FEINSUM_TPU_LOCK=0``.  *force* engages the lock
    regardless of platform (tests)."""
    global _lock_file, _depth
    if not force and not _needs_lock():
        yield
        return
    if _depth == 0:
        f = open(lock_path, "a+")
        t0 = time.monotonic()
        warned = 0.0
        while True:
            try:
                fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)
                break
            except OSError:
                waited = time.monotonic() - t0
                if waited >= warned + 60.0:
                    warned = waited
                    logger.warning(
                        "waiting %.0f s for %s (another feinsum_tpu"
                        " process is using the device)", waited, lock_path)
                time.sleep(poll_seconds)
        _lock_file = f
    _depth += 1
    try:
        yield
    finally:
        _depth -= 1
        if _depth == 0 and _lock_file is not None:
            fcntl.flock(_lock_file, fcntl.LOCK_UN)
            _lock_file.close()
            _lock_file = None
