"""Cross-process device lock (tpu_lock): two feinsum_tpu processes must
never overlap on the relay-attached TPU (wedged compile helpers, polluted
device traces — observed live r4 when an orphaned re-evaluation raced a
tuner and the retire pass then deleted honest archive rows)."""

import os
import subprocess
import sys

from feinsum_tpu.tpu_lock import device_lock


def test_reentrant_within_process(tmp_path):
    lock = str(tmp_path / "l")
    with device_lock(force=True, lock_path=lock):
        with device_lock(force=True, lock_path=lock):
            pass
    # fully released: a fresh subprocess can take it immediately
    rc = subprocess.run(
        [sys.executable, "-c",
         f"import fcntl; f=open({lock!r},'a+');"
         "fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)"],
        ).returncode
    assert rc == 0


def test_cpu_pinned_process_skips_lock(tmp_path):
    # conftest pins jax_platforms=cpu for this process: no lock activity
    lock = str(tmp_path / "l")
    with device_lock(lock_path=lock):
        assert not os.path.exists(lock)


def test_two_processes_serialize(tmp_path):
    """Each worker appends (start, end) stamps while holding the lock;
    serialized workers produce non-overlapping intervals."""
    lock = str(tmp_path / "l")
    out = str(tmp_path / "stamps")
    worker = f"""
import time
from feinsum_tpu.tpu_lock import device_lock
with device_lock(force=True, poll_seconds=0.05, lock_path={lock!r}):
    t0 = time.monotonic()
    time.sleep(0.4)
    t1 = time.monotonic()
with open({out!r}, "a") as f:
    f.write(f"{{t0}} {{t1}}\\n")
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    procs = [subprocess.Popen([sys.executable, "-c", worker], env=env)
             for _ in range(3)]
    for p in procs:
        assert p.wait(timeout=120) == 0
    spans = sorted(tuple(map(float, ln.split()))
                   for ln in open(out).read().splitlines())
    assert len(spans) == 3
    for (_, end_prev), (start_next, _) in zip(spans, spans[1:]):
        assert start_next >= end_prev, f"overlap: {spans}"
