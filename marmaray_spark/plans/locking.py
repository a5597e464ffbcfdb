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


# -- CQL / LWT distributed lock (multi-driver deployments) -------------------

LOCK_TABLE_DDL = ("CREATE TABLE IF NOT EXISTS {ks}.job_locks ("
                  "name text PRIMARY KEY, owner text, heartbeat_us bigint)")
_ACQUIRE_CQL = ("INSERT INTO {ks}.job_locks (name, owner, heartbeat_us) "
                "VALUES (?, ?, ?) IF NOT EXISTS USING TTL {ttl}")
_HEARTBEAT_CQL = ("UPDATE {ks}.job_locks USING TTL {ttl} "
                  "SET heartbeat_us = ? WHERE name = ? IF owner = ?")
_RELEASE_CQL = "DELETE FROM {ks}.job_locks WHERE name = ? IF owner = ?"


class CqlLockManager:
    """Distributed lock over Cassandra lightweight transactions — the
    multi-driver backend the reference gets from ZooKeeper
    (M/utilities/LockManager.java); same acquire/heartbeat/release/
    release_all surface as FileLockManager, so JobManager swaps backends
    by construction only.

    The protocol is the standard public LWT lock pattern:

    - acquire: ``INSERT ... IF NOT EXISTS USING TTL <stale_after>`` —
      Paxos gives one winner; the TTL IS the staleness bound (a crashed
      driver's row expires, no breaker logic needed — the DB does it).
    - heartbeat: conditional ``UPDATE ... USING TTL ... IF owner = ?``
      refreshes the TTL only while still the owner.
    - release: ``DELETE ... IF owner = ?`` — conditional, so a lock the
      TTL already expired (and someone else re-acquired) is never
      deleted out from under its new owner.

    ``session`` is anything with
    ``execute(cql, params) -> list[dict]`` returning LWT result rows
    (``[applied]`` + current values on failure) — the real driver
    session or the in-process ``InMemoryLwtSession`` double."""

    def __init__(self, session, keyspace: str = "marmaray",
                 stale_after_s: float = 2 * 3600.0) -> None:
        self.session = session
        self.ks = keyspace
        self.ttl = max(int(stale_after_s), 1)
        self.owner = f"{os.getpid()}-{uuid.uuid4().hex[:8]}"
        self._held: set[str] = set()
        session.execute(LOCK_TABLE_DDL.format(ks=keyspace), None)

    def acquire(self, key: str, timeout_s: float = 0.0,
                poll_s: float = 0.2) -> bool:
        deadline = time.time() + timeout_s
        cql = _ACQUIRE_CQL.format(ks=self.ks, ttl=self.ttl)
        while True:
            rows = self.session.execute(
                cql, (key, self.owner, int(time.time() * 1e6)))
            if rows and rows[0].get("[applied]"):
                self._held.add(key)
                return True
            # re-entrant: already ours (e.g. retry after a lost ack). The
            # row's TTL has been ticking since the lost INSERT, so refresh
            # it with the conditional heartbeat UPDATE before reporting
            # success — otherwise a "just acquired" lock could expire
            # mid-run; a failed refresh (owner changed between the read
            # and the UPDATE) is an acquisition failure, not a success
            if rows and rows[0].get("owner") == self.owner:
                hb = self.session.execute(
                    _HEARTBEAT_CQL.format(ks=self.ks, ttl=self.ttl),
                    (int(time.time() * 1e6), key, self.owner))
                if hb and hb[0].get("[applied]"):
                    self._held.add(key)
                    return True
            if time.time() >= deadline:
                return False
            time.sleep(poll_s)

    def heartbeat(self, key: str) -> None:
        if key not in self._held:
            raise LockError(f"not holding {key!r}")
        rows = self.session.execute(
            _HEARTBEAT_CQL.format(ks=self.ks, ttl=self.ttl),
            (int(time.time() * 1e6), key, self.owner))
        if not (rows and rows[0].get("[applied]")):
            self._held.discard(key)
            raise LockError(f"lost lock {key!r} (TTL expired and re-acquired)")

    def release(self, key: str) -> None:
        self.session.execute(_RELEASE_CQL.format(ks=self.ks),
                             (key, self.owner))
        self._held.discard(key)

    def release_all(self) -> None:
        for key in list(self._held):
            self.release(key)


class InMemoryLwtSession:
    """In-process double executing the LWT lock protocol with Cassandra's
    observable semantics (single-winner compare-and-set, TTL expiry,
    ``[applied]`` result rows) — one mutex stands in for Paxos. Share one
    instance across CqlLockManager instances to model one cluster."""

    def __init__(self, clock=time.time) -> None:
        import threading
        self._rows: dict[str, dict] = {}
        self._mu = threading.Lock()
        self._clock = clock

    def _expire(self) -> None:
        now = self._clock()
        for k in [k for k, v in self._rows.items() if v["expires"] <= now]:
            del self._rows[k]

    def execute(self, cql: str, params: tuple | None = None) -> list[dict]:
        with self._mu:
            self._expire()
            if cql.startswith("CREATE TABLE"):
                return []
            ttl = int(cql.split("USING TTL")[1].split()[0]) \
                if "USING TTL" in cql else None
            if cql.startswith("INSERT"):
                name, owner, hb = params
                row = self._rows.get(name)
                if row is not None:
                    return [{"[applied]": False, "name": name,
                             "owner": row["owner"]}]
                self._rows[name] = {"owner": owner, "heartbeat_us": hb,
                                    "expires": self._clock() + ttl}
                return [{"[applied]": True}]
            if cql.startswith("UPDATE"):
                hb, name, owner = params
                row = self._rows.get(name)
                if row is None or row["owner"] != owner:
                    return [{"[applied]": False,
                             "owner": row["owner"] if row else None}]
                row["heartbeat_us"] = hb
                row["expires"] = self._clock() + ttl
                return [{"[applied]": True}]
            if cql.startswith("DELETE"):
                name, owner = params
                row = self._rows.get(name)
                if row is None or row["owner"] != owner:
                    return [{"[applied]": False,
                             "owner": row["owner"] if row else None}]
                del self._rows[name]
                return [{"[applied]": True}]
            raise ValueError(f"unsupported statement: {cql[:40]}")

    def close(self) -> None:
        pass
