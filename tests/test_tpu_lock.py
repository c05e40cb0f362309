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


def test_backend_attach_happens_under_the_lock(tmp_path, monkeypatch):
    """VERDICT r4 #7: attaching to the backend during another process's
    in-flight compile froze it for 1400 s — attach must happen while the
    flock is already held.  Simulated: _ensure_attached is monkeypatched
    to PROVE the flock is taken (a second fd's non-blocking LOCK_EX must
    fail while we run)."""
    import fcntl

    from feinsum_tpu import tpu_lock

    lock = str(tmp_path / "l")
    monkeypatch.setattr(tpu_lock, "LOCK_PATH", lock)
    monkeypatch.setattr(tpu_lock, "_needs_lock", lambda: True)
    seen = {}

    def fake_attach():
        f2 = open(lock, "a+")
        try:
            fcntl.flock(f2, fcntl.LOCK_EX | fcntl.LOCK_NB)
            seen["held"] = False          # lock was NOT held: bug
            fcntl.flock(f2, fcntl.LOCK_UN)
        except OSError:
            seen["held"] = True           # attach ran under the lock
        finally:
            f2.close()

    monkeypatch.setattr(tpu_lock, "_ensure_attached", fake_attach)
    with tpu_lock.device_lock(lock_path=lock):
        pass
    assert seen == {"held": True}


def test_two_concurrent_locked_processes_serialize_attach(tmp_path):
    """Done-criterion from VERDICT r4 #7: two processes whose 'attach'
    (simulated by a sleep inside the locked region, entered via the
    attach hook) must serialize on the flock — no interval overlap."""
    lock = str(tmp_path / "l")
    out = str(tmp_path / "stamps")
    worker = f"""
import time
from feinsum_tpu import tpu_lock
tpu_lock.LOCK_PATH = {lock!r}
tpu_lock._needs_lock = lambda: True
def fake_attach():
    t0 = time.monotonic(); time.sleep(0.4); t1 = time.monotonic()
    with open({out!r}, "a") as f:
        f.write(f"{{t0}} {{t1}}\\n")
tpu_lock._ensure_attached = fake_attach
with tpu_lock.device_lock(poll_seconds=0.05, lock_path={lock!r}):
    pass
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    procs = [subprocess.Popen([sys.executable, "-c", worker], env=env)
             for _ in range(2)]
    for p in procs:
        assert p.wait(timeout=120) == 0
    spans = sorted(tuple(map(float, ln.split()))
                   for ln in open(out).read().splitlines())
    assert len(spans) == 2
    (_, end_prev), (start_next, _) = spans
    assert start_next >= end_prev, f"attach overlap: {spans}"


def test_nested_distinct_lock_paths_take_both_locks(tmp_path):
    """Advisor r4: the old global depth counter made a nested call with a
    DIFFERENT lock_path a silent no-op.  Both paths must now hold real
    flocks simultaneously."""
    import fcntl

    la, lb = str(tmp_path / "a"), str(tmp_path / "b")

    def assert_flocked(path):
        f2 = open(path, "a+")
        try:
            fcntl.flock(f2, fcntl.LOCK_EX | fcntl.LOCK_NB)
            return False
        except OSError:
            return True
        finally:
            f2.close()

    with device_lock(force=True, lock_path=la):
        with device_lock(force=True, lock_path=lb):
            assert assert_flocked(la) and assert_flocked(lb)
        assert assert_flocked(la) and not assert_flocked(lb)
