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
                 stale_after_s: float = 2 * 3600.0) -> None:
        self.dir = Path(lock_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.stale_after_s = stale_after_s
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
        path = self._path(key)
        payload = json.dumps({"owner": self.owner, "key": key,
                              "ts": time.time()}).encode()
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            if not self._is_stale(path):
                return False
            # break the stale lock atomically: write a claim file, rename over
            claim = path.with_suffix(f".claim-{self.owner}")
            claim.write_bytes(payload)
            os.replace(claim, path)
            self._held.add(key)
            return True
        with os.fdopen(fd, "wb") as f:
            f.write(payload)
        self._held.add(key)
        return True

    def _is_stale(self, path: Path) -> bool:
        try:
            meta = json.loads(path.read_bytes())
            return time.time() - float(meta["ts"]) > self.stale_after_s
        except (OSError, ValueError, KeyError):
            return True  # unreadable lock ⇒ treat as crashed owner

    def heartbeat(self, key: str) -> None:
        """Refresh the lock timestamp so long runs aren't broken as stale."""
        if key in self._held:
            self._path(key).write_bytes(json.dumps(
                {"owner": self.owner, "key": key, "ts": time.time()}).encode())

    def release(self, key: str) -> None:
        if key in self._held:
            self._held.discard(key)
            try:
                self._path(key).unlink()
            except FileNotFoundError:
                pass

    def release_all(self) -> None:
        for key in list(self._held):
            self.release(key)

    def __contains__(self, key: str) -> bool:
        return key in self._held
