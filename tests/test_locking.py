"""File-lock manager: exclusivity, stale-lock breaking, release."""

import json
import time

from marmaray_spark.plans.locking import FileLockManager


def test_exclusive_acquire_and_release(tmp_path):
    a = FileLockManager(tmp_path)
    b = FileLockManager(tmp_path)
    assert a.acquire("job")
    assert "job" in a
    assert not b.acquire("job")
    a.release("job")
    assert b.acquire("job")
    b.release("job")


def test_reacquire_after_release_same_manager(tmp_path):
    m = FileLockManager(tmp_path)
    assert m.acquire("j")
    m.release("j")
    assert m.acquire("j")


def test_stale_lock_is_broken(tmp_path):
    dead = FileLockManager(tmp_path, stale_after_s=0.05)
    assert dead.acquire("job")
    time.sleep(0.1)  # heartbeat goes stale (simulated crashed owner)
    alive = FileLockManager(tmp_path, stale_after_s=0.05)
    assert alive.acquire("job")
    meta = json.loads((tmp_path / "job.lock").read_bytes())
    assert meta["owner"] == alive.owner


def test_heartbeat_keeps_lock_fresh(tmp_path):
    holder = FileLockManager(tmp_path, stale_after_s=0.3)
    assert holder.acquire("job")
    rival = FileLockManager(tmp_path, stale_after_s=0.3)
    for _ in range(3):
        time.sleep(0.15)
        holder.heartbeat("job")
        assert not rival.acquire("job")
    holder.release("job")


def test_unreadable_lock_grace_period(tmp_path):
    # A young garbled lock file is a writer mid-publish: HELD, not stolen.
    (tmp_path / "job.lock").write_bytes(b"not-json")
    m = FileLockManager(tmp_path, grace_s=60.0)
    assert not m.acquire("job")
    # Past the grace period the same garbage means a crashed owner: stale.
    m2 = FileLockManager(tmp_path, grace_s=0.05)
    time.sleep(0.1)
    assert m2.acquire("job")


def test_acquire_with_timeout_waits(tmp_path):
    a = FileLockManager(tmp_path)
    b = FileLockManager(tmp_path)
    assert a.acquire("job")
    t0 = time.time()
    assert not b.acquire("job", timeout_s=0.3)
    assert time.time() - t0 >= 0.3


def test_release_all(tmp_path):
    m = FileLockManager(tmp_path)
    m.acquire("x")
    m.acquire("y")
    m.release_all()
    other = FileLockManager(tmp_path)
    assert other.acquire("x") and other.acquire("y")


def test_contended_acquire_exactly_one_winner(tmp_path):
    """TestJobManager lock-contention parity: N managers race one key;
    exactly one acquires, and after release exactly one waiter wins."""
    import threading

    managers = [FileLockManager(tmp_path) for _ in range(8)]
    results = [None] * 8
    barrier = threading.Barrier(8)

    def racer(i):
        barrier.wait()
        results[i] = managers[i].acquire("contested")

    threads = [threading.Thread(target=racer, args=(i,)) for i in range(8)]
    for t in threads: t.start()
    for t in threads: t.join(10)
    assert sum(1 for r in results if r) == 1

    winner = results.index(True)
    managers[winner].release("contested")
    again = [m.acquire("contested") for m in managers]
    assert sum(1 for r in again if r) == 1


def test_stale_break_race_single_winner(tmp_path):
    """Two waiters observing the same stale lock: the rename-claim protocol
    admits exactly one."""
    import json
    import threading
    import time as _time

    # a crashed owner's lock, old enough to be stale
    (tmp_path / "job.lock").write_bytes(json.dumps(
        {"owner": "dead", "key": "job", "ts": _time.time() - 9999}).encode())

    managers = [FileLockManager(tmp_path, stale_after_s=1.0) for _ in range(6)]
    results = [None] * 6
    barrier = threading.Barrier(6)

    def breaker(i):
        barrier.wait()
        results[i] = managers[i].acquire("job")

    threads = [threading.Thread(target=breaker, args=(i,)) for i in range(6)]
    for t in threads: t.start()
    for t in threads: t.join(10)
    assert sum(1 for r in results if r) == 1
    # the winner's payload is intact (never observable empty/partial)
    meta = json.loads((tmp_path / "job.lock").read_bytes())
    assert meta["owner"] == managers[results.index(True)].owner


def test_heartbeat_and_release_after_stale_break_do_not_clobber(tmp_path):
    """An owner whose lock was broken as stale must not heartbeat or
    release over the new owner's lock (expired-session semantics)."""
    import json

    import pytest

    from marmaray_spark.plans.locking import LockError

    slow = FileLockManager(tmp_path, stale_after_s=0.05)
    assert slow.acquire("job")
    import time as _t
    _t.sleep(0.1)                      # let slow's lock go stale
    thief = FileLockManager(tmp_path, stale_after_s=0.05)
    assert thief.acquire("job")        # breaks + re-acquires

    with pytest.raises(LockError):
        slow.heartbeat("job")
    assert "job" not in slow           # hold voided
    slow.release("job")                # no-op, must not unlink thief's lock
    meta = json.loads((tmp_path / "job.lock").read_bytes())
    assert meta["owner"] == thief.owner
    thief.heartbeat("job")             # real owner still fine


# -- CQL/LWT distributed backend --------------------------------------------

def test_cql_lock_single_winner_and_release():
    from marmaray_spark.plans.locking import CqlLockManager, InMemoryLwtSession

    cluster = InMemoryLwtSession()
    a = CqlLockManager(cluster, stale_after_s=3600)
    b = CqlLockManager(cluster, stale_after_s=3600)
    assert a.acquire("job-1")
    assert not b.acquire("job-1")
    assert a.acquire("job-1")            # re-entrant for the same owner
    a.release("job-1")
    assert b.acquire("job-1")
    b.release_all()
    assert a.acquire("job-1")


def test_cql_lock_ttl_expiry_breaks_crashed_owner():
    from marmaray_spark.plans.locking import CqlLockManager, InMemoryLwtSession

    t = [1000.0]
    cluster = InMemoryLwtSession(clock=lambda: t[0])
    crashed = CqlLockManager(cluster, stale_after_s=60)
    assert crashed.acquire("job-1")
    # crashed owner never heartbeats; before TTL the lock holds
    other = CqlLockManager(cluster, stale_after_s=60)
    assert not other.acquire("job-1")
    t[0] += 61
    assert other.acquire("job-1")        # DB expired the row — no breaker code


def test_cql_lock_heartbeat_extends_and_detects_loss():
    import pytest

    from marmaray_spark.plans.locking import (CqlLockManager,
                                              InMemoryLwtSession, LockError)

    t = [0.0]
    cluster = InMemoryLwtSession(clock=lambda: t[0])
    a = CqlLockManager(cluster, stale_after_s=60)
    assert a.acquire("job-1")
    for _ in range(5):                   # heartbeats keep it alive past TTL
        t[0] += 50
        a.heartbeat("job-1")
    b = CqlLockManager(cluster, stale_after_s=60)
    assert not b.acquire("job-1")

    t[0] += 61                           # owner stalls past TTL; b takes it
    assert b.acquire("job-1")
    with pytest.raises(LockError, match="lost lock"):
        a.heartbeat("job-1")
    # a's conditional release must NOT delete b's lock
    a.release("job-1")
    assert not CqlLockManager(cluster, stale_after_s=60).acquire("job-1")


def test_cql_lock_concurrent_acquire_one_winner():
    import threading

    from marmaray_spark.plans.locking import CqlLockManager, InMemoryLwtSession

    cluster = InMemoryLwtSession()
    wins = []
    def contend():
        m = CqlLockManager(cluster, stale_after_s=3600)
        if m.acquire("job-1"):
            wins.append(m.owner)
    threads = [threading.Thread(target=contend) for _ in range(16)]
    [th.start() for th in threads]
    [th.join() for th in threads]
    assert len(wins) == 1


def test_cql_reentrant_acquire_refreshes_ttl():
    """A lost-ack retry (row already owned by self) must refresh the
    row's TTL on the spot — a 'just acquired' lock may not expire on the
    ORIGINAL insert's clock."""
    from marmaray_spark.plans.locking import CqlLockManager, InMemoryLwtSession

    t = [0.0]
    cluster = InMemoryLwtSession(clock=lambda: t[0])
    a = CqlLockManager(cluster, stale_after_s=60)
    assert a.acquire("job-1")

    t[0] += 50                            # 10s of original TTL left
    assert a.acquire("job-1")             # re-entrant path

    t[0] += 30                            # past the ORIGINAL expiry (80 > 60)
    b = CqlLockManager(cluster, stale_after_s=60)
    assert not b.acquire("job-1")         # ...but the refresh kept it alive

    t[0] += 31                            # past the refreshed expiry too
    assert b.acquire("job-1")
