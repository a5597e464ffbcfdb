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
        path already exists. Stale locks are claimed by os.rename of the
        stale inode to a per-owner name: exactly one breaker's rename
        succeeds; everyone then races a fresh link, which again admits one."""
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
            # claim the stale file before removing it: rename of one inode
            # succeeds for exactly one breaker; the losers see ENOENT and
            # fall through to the (single-winner) link race below.
            broken = path.with_suffix(f".broken-{self.owner}")
            try:
                if not self._is_stale(path):  # last-moment re-check: a fresh
                    return False              # lock may have replaced the stale one
                os.rename(path, broken)
            except FileNotFoundError:
                pass
            else:
                try:
                    os.unlink(broken)
                except FileNotFoundError:
                    pass
            try:
                os.link(tmp, path)
                self._held.add(key)
                return True
            except FileExistsError:
                return False
        finally:
            try:
                tmp.unlink()
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

    def heartbeat(self, key: str) -> None:
        """Refresh the lock timestamp so long runs aren't broken as stale.
        Atomic replace — readers never observe a truncated file."""
        if key in self._held:
            path = self._path(key)
            tmp = path.with_suffix(f".hb-{self.owner}")
            tmp.write_bytes(json.dumps(
                {"owner": self.owner, "key": key, "ts": time.time()}).encode())
            os.replace(tmp, path)

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
