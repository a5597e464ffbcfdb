"""Job-level locking: at most one runner per job name across processes.

Reference parity: M/utilities/LockManager.java (Zookeeper-based
distributed lock, 213 LoC) and JobManager.JobLockManager
(M/common/job/JobManager.java:324-387) — a manager-level lock taken
before any DAG runs plus one lock per JobDag; locks held for the run and
always released. This port uses atomic lock files (O_CREAT|O_EXCL) with
owner + heartbeat metadata — single-filesystem scope, the right tool for
one driver host; a Zookeeper/DB lock plugs in behind the same interface
for multi-driver deployments.

A lock file is stale when its heartbeat is older than ``stale_after_s``
(a crashed driver never unlocks); stale locks are broken and re-acquired
atomically via rename.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from pathlib import Path


class LockError(RuntimeError):
    pass


class FileLockManager:
    """Atomic lock-file manager keyed by job name.

    Usage::

        locks = FileLockManager("/tmp/locks")
        if locks.acquire("my-dag"):
            try: ...
            finally: locks.release("my-dag")
    """

    def __init__(self, lock_dir: str | os.PathLike,
                 stale_after_s: float = 2 * 3600.0,
                 grace_s: float = 10.0) -> None:
        self.dir = Path(lock_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.stale_after_s = stale_after_s
        # unparsable lock files younger than this are treated as HELD, not
        # stale — a writer may be mid-publish; only old garbage is breakable
        self.grace_s = grace_s
        self.owner = f"{os.getpid()}-{uuid.uuid4().hex[:8]}"
        self._held: set[str] = set()

    def _path(self, key: str) -> Path:
        safe = key.replace(os.sep, "_")
        return self.dir / f"{safe}.lock"

    def acquire(self, key: str, timeout_s: float = 0.0,
                poll_s: float = 0.2) -> bool:
        """Try to take the lock; optionally wait up to ``timeout_s``."""
        deadline = time.time() + timeout_s
        while True:
            if self._try_acquire(key):
                return True
            if time.time() >= deadline:
                return False
            time.sleep(poll_s)

    def _try_acquire(self, key: str) -> bool:
        """Publish the fully-written payload with os.link — the lock file is
        never observable empty/partial, and link fails atomically when the
        path already exists.

        Stale locks are broken under a breaker mutex (a ``.break`` file,
        itself acquired by single-winner os.link): only ONE process may
        break a given lock at a time, and it re-verifies staleness while
        holding the mutex — so a freshly-published lock can never be
        mistaken for the stale one and stolen (the check-then-rename race
        a mutex-less breaker has). A breaker that crashes mid-break leaves
        a ``.break`` file that is itself breakable after ``grace_s``."""
        path = self._path(key)
        payload = json.dumps({"owner": self.owner, "key": key,
                              "ts": time.time()}).encode()
        tmp = path.with_suffix(f".tmp-{self.owner}")
        tmp.write_bytes(payload)
        try:
            try:
                os.link(tmp, path)
                self._held.add(key)
                return True
            except FileExistsError:
                pass
            if not self._is_stale(path):
                return False
            return self._break_and_claim(key, path, tmp)
        finally:
            try:
                tmp.unlink()
            except FileNotFoundError:
                pass

    def _break_and_claim(self, key: str, path: Path, tmp: Path) -> bool:
        """Break a stale lock while holding the single-winner breaker
        mutex; returns True iff this owner ends up holding the lock."""
        bpath = path.with_suffix(".break")
        try:  # clear a crashed breaker's leftover mutex (held only for ms)
            if time.time() - bpath.stat().st_mtime > self.grace_s:
                bpath.unlink()
        except (FileNotFoundError, OSError):
            pass
        try:
            os.link(tmp, bpath)
        except FileExistsError:
            return False    # another breaker is mid-break; let it finish
        try:
            if not self._is_stale(path):
                return False        # someone re-published while we queued
            try:
                os.unlink(path)     # safe: no other breaker can be active
            except FileNotFoundError:
                pass
            try:
                os.link(tmp, path)  # still races fresh acquirers: one winner
            except FileExistsError:
                return False
            self._held.add(key)
            return True
        finally:
            try:
                bpath.unlink()
            except FileNotFoundError:
                pass

    def _is_stale(self, path: Path) -> bool:
        try:
            raw = path.read_bytes()
        except FileNotFoundError:
            return True   # already gone; the rename/link path handles the race
        except OSError:
            return False  # unreadable but present — treat as held, retry later
        try:
            meta = json.loads(raw)
            return time.time() - float(meta["ts"]) > self.stale_after_s
        except (ValueError, KeyError, TypeError):
            # garbled/legacy content: young ⇒ writer mid-publish (held);
            # only old garbage counts as a crashed owner
            try:
                return time.time() - path.stat().st_mtime > self.grace_s
            except OSError:
                return False

    def _still_owns(self, path: Path) -> bool:
        """True when the on-disk lock still carries this manager's owner id
        — false means the lock went stale and was broken + re-acquired by
        someone else (our hold is void, like an expired ZK session)."""
        try:
            return json.loads(path.read_bytes()).get("owner") == self.owner
        except (OSError, ValueError, AttributeError):
            return False

    def heartbeat(self, key: str) -> None:
        """Refresh the lock timestamp so long runs aren't broken as stale.
        Atomic replace — readers never observe a truncated file. Raises
        LockError if the lock was broken as stale and taken by another
        owner (never clobbers the new owner's lock)."""
        if key in self._held:
            path = self._path(key)
            if not self._still_owns(path):
                self._held.discard(key)
                raise LockError(f"lock {key!r} was broken as stale and is "
                                "no longer held by this owner")
            tmp = path.with_suffix(f".hb-{self.owner}")
            tmp.write_bytes(json.dumps(
                {"owner": self.owner, "key": key, "ts": time.time()}).encode())
            os.replace(tmp, path)

    def release(self, key: str) -> None:
        if key in self._held:
            self._held.discard(key)
            path = self._path(key)
            if not self._still_owns(path):
                return      # broken as stale + re-acquired: not ours to unlink
            try:
                path.unlink()
            except FileNotFoundError:
                pass

    def release_all(self) -> None:
        for key in list(self._held):
            self.release(key)

    def __contains__(self, key: str) -> bool:
        return key in self._held
