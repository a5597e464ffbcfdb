"""Job orchestration: JobDag (one source->converter->sinks pipeline with
checkpoint discipline), JobSubDag (n-ary sink tree), JobManager (multi-DAG
scheduling on one shared SparkSession).

Reference parity:
- JobDag.execute (M/common/job/JobDag.java:140-211): init previous run
  state -> compute work units -> save next state in memory -> if work:
  source.getData -> sink tree execute -> commit -> metadata
  saveChanges() persisted ONLY after success -> post-job actions.
- JobSubDag (M/common/job/JobSubDag.java:74-225): child sub-dags execute
  in parallel threads, commit in ascending priority order.
- JobManager (M/common/job/JobManager.java:134-255): shared SparkSession,
  per-DAG driver threads (ThreadPoolService: 6 job-dag + 2 action
  threads, ThreadPoolService.java:47-56), optional DAG ordering by last
  execution time — longest-running/stale first
  (ExecutionTimeJobExecutionStrategy.java:66-105), job-level locking,
  TimeoutManager watchdog (job 180 min default,
  M/utilities/listener/TimeoutManager.java:35-38).

Spark-first notes: each DAG thread sets a FAIR scheduler pool + job
group, so concurrent DAGs share executors fairly and a watchdog can
cancel exactly one DAG's Spark jobs (sc.cancelJobGroup) — the Python
equivalent of the reference's SparkListener-based stage-stall killer.
"""

from __future__ import annotations

import threading
import time
from concurrent.futures import ThreadPoolExecutor, as_completed
from concurrent.futures import TimeoutError as FuturesTimeoutError
from dataclasses import dataclass
from typing import Any, Callable, Protocol, Sequence

from pyspark.sql import DataFrame, SparkSession

from marmaray_spark.metadata.manager import MetadataManager
from marmaray_spark.metrics import DataFeedMetrics
from marmaray_spark.plans.locking import FileLockManager, LockError

DEFAULT_JOB_DAG_THREADS = 6   # ThreadPoolService.java:52-56
DEFAULT_ACTION_THREADS = 2
DEFAULT_JOB_TIMEOUT_MIN = 180  # TimeoutManager.java:35-38
LAST_RUNTIME_KEY = "jobdag.last_runtime_ms"
LAST_EXECUTED_KEY = "jobdag.last_executed_unixtime"


class WorkUnitCalculator(Protocol):
    def compute_work_units(self) -> list[Any]: ...
    def save_next_run_state(self, work_units: list[Any]) -> None: ...


class JobDagAction(Protocol):
    """Post-job hook (reference: IJobDagAction) — receives success flag."""

    def execute(self, success: bool) -> None: ...


class JobDagActions:
    """Parallel post-run action runner (JobDagActions.java:100-135 +
    ThreadPoolService timeout semantics): every action runs on its own
    thread with a per-action timeout; a failure or timeout marks the
    aggregate result False and is REPORTED (``action_result`` /
    ``action_execution_time`` metrics, tagged by action class) but never
    raised into the job — actions respond to the run, they don't change
    its outcome. ``execute`` returns only after every action finished or
    timed out (TestJobDagActions.testWaitForActionsToFinish)."""

    DEFAULT_TIMEOUT_S = 120.0

    def __init__(self, metrics: "DataFeedMetrics | None" = None,
                 target: str = "anonymous", max_threads: int = 4) -> None:
        self.metrics = metrics
        self.target = target
        self.max_threads = max_threads
        self._actions: list[tuple[JobDagAction, float]] = []

    def add(self, action: JobDagAction,
            timeout_s: float = DEFAULT_TIMEOUT_S) -> None:
        self._actions.append((action, timeout_s))

    def execute(self, success: bool) -> bool:
        """Run all actions in parallel; True iff every one succeeded
        within its timeout."""
        if not self._actions:
            return True
        all_ok = True
        pool = ThreadPoolExecutor(max_workers=self.max_threads,
                                  thread_name_prefix="jobdag-action")
        started = time.time()
        futures = [(pool.submit(self._timed, a, success), a, t)
                   for a, t in self._actions]
        for fut, action, timeout_s in futures:
            ok = True
            try:    # per-action deadline measured from submission
                fut.result(timeout=max(0.0, started + timeout_s - time.time()))
            except FuturesTimeoutError:
                fut.cancel()
                ok = False
            except Exception:   # noqa: BLE001 — never mask the job result
                ok = False
            all_ok &= ok
            if self.metrics is not None:
                self.metrics.create_long_metric(
                    "action_result", int(ok),
                    tags={"action": type(action).__name__,
                          "action_target": self.target})
        # don't join overrunning actions: a hung action must not block the
        # job's completion (its thread is abandoned, like the reference's
        # ThreadPoolService timeout)
        pool.shutdown(wait=False, cancel_futures=True)
        return all_ok

    def _timed(self, action: JobDagAction, success: bool) -> None:
        started = time.time()
        try:
            action.execute(success)
        finally:
            if self.metrics is not None:
                self.metrics.create_timer_metric(
                    "action_execution_time", time.time() - started,
                    tags={"action": type(action).__name__,
                          "action_target": self.target})


@dataclass
class SinkNode:
    """A sink stage in the sub-dag tree: writes a DataFrame, then commits.

    ``priority`` orders commit() calls ascending (JobSubDag semantics) —
    e.g. the error-table sink commits before the data sink so a failure
    between the two never loses error records.
    """

    name: str
    write: Callable[[DataFrame], Any]
    commit: Callable[[], None] = lambda: None
    priority: int = 100


class JobSubDag:
    """n-ary sink tree: execute children in parallel, commit by priority."""

    def __init__(self, nodes: Sequence[SinkNode],
                 max_threads: int = DEFAULT_JOB_DAG_THREADS) -> None:
        self.nodes = list(nodes)
        self.max_threads = max_threads

    def execute(self, payload: DataFrame) -> dict[str, Any]:
        results: dict[str, Any] = {}
        with ThreadPoolExecutor(max_workers=self.max_threads) as pool:
            futures = {pool.submit(n.write, payload): n for n in self.nodes}
            for fut in as_completed(futures):
                node = futures[fut]
                results[node.name] = fut.result()  # raises on node failure
        return results

    def commit(self) -> None:
        for node in sorted(self.nodes, key=lambda n: n.priority):
            node.commit()


class JobDag:
    """One pipeline: work-unit plan -> source -> transform -> sink tree.

    The checkpoint contract (IWorkUnitCalculator.java:36-90): next-run
    state is computed up front but ``metadata.save_changes()`` runs only
    after every sink has committed.
    """

    def __init__(self, name: str,
                 work_unit_calculator: WorkUnitCalculator,
                 get_data: Callable[[Any], DataFrame],
                 sub_dag: JobSubDag,
                 metadata: MetadataManager,
                 transform: Callable[[DataFrame], DataFrame] | None = None,
                 actions: Sequence[JobDagAction] = (),
                 metrics: DataFeedMetrics | None = None) -> None:
        self.name = name
        self.calc = work_unit_calculator
        self.get_data = get_data
        self.sub_dag = sub_dag
        self.metadata = metadata
        self.transform = transform or (lambda df: df)
        self.actions = list(actions)
        self.metrics = metrics if metrics is not None else DataFeedMetrics(name)
        self.last_error: BaseException | None = None

    def execute(self, spark: SparkSession | None = None, pool: str | None = None) -> bool:
        """Returns True when work was processed and committed (False = no
        work). Raises on failure after running post-actions."""
        sc = spark.sparkContext if spark is not None else None
        if sc is not None:
            sc.setLocalProperty("spark.scheduler.pool", pool or self.name)
            sc.setJobGroup(self.name, f"JobDag {self.name}", interruptOnCancel=True)
        started = time.time()
        success = False
        had_work = False
        try:
            work_units = self.calc.compute_work_units()
            self.metrics.create_long_metric("work_unit_count", len(work_units))
            # Unconditional, like JobDag.java:165 (saveNextRunState before
            # hasWorkUnits): a calculator may advance state on an EMPTY run
            # (Kafka first-run bootstrap) and that checkpoint must still be
            # persisted below, else the job re-bootstraps forever. The write
            # is in-memory; durability stays gated on save_changes().
            self.calc.save_next_run_state(work_units)
            if work_units:
                had_work = True
                for wu in work_units:
                    payload = self.transform(self.get_data(wu))
                    self.sub_dag.execute(payload)
                self.sub_dag.commit()
            # runtime stats feed ExecutionTimeJobExecutionStrategy ordering
            self.metadata.set(LAST_RUNTIME_KEY, str(int((time.time() - started) * 1000)))
            self.metadata.set(LAST_EXECUTED_KEY, str(int(time.time())))
            self.metadata.save_changes()   # the only persistence point
            success = True
            return had_work
        except BaseException as e:
            self.last_error = e
            raise
        finally:
            self.metrics.create_timer_metric("runtime", time.time() - started)
            self.metrics.create_long_metric("success", int(success))
            if sc is not None:
                sc.setLocalProperty("spark.scheduler.pool", None)
                sc.setLocalProperty("spark.jobGroup.id", None)
            runner = JobDagActions(self.metrics, target=self.name)
            for action in self.actions:
                runner.add(action, timeout_s=getattr(
                    action, "timeout_s", JobDagActions.DEFAULT_TIMEOUT_S))
            runner.execute(success)   # parallel, isolated, never raises


class ExecutionTimeOrdering:
    """Longest-running-or-stale-first DAG ordering
    (ExecutionTimeJobExecutionStrategy.java:66-105): DAGs never executed
    (or not within the lookback) go first, then by last runtime desc."""

    def __init__(self, lookback_hours: int = 6) -> None:
        self.lookback_s = lookback_hours * 3600

    def order(self, dags: Sequence[JobDag]) -> list[JobDag]:
        now = time.time()

        def key(dag: JobDag):
            last_exec = int(dag.metadata.get(LAST_EXECUTED_KEY) or 0)
            runtime = int(dag.metadata.get(LAST_RUNTIME_KEY) or 0)
            stale = last_exec < now - self.lookback_s
            return (0 if stale else 1, -runtime)

        return sorted(dags, key=key)


class TimeoutManager:
    """Wall-clock watchdog: cancels a DAG's Spark job group on timeout
    (reference kills stalled jobs via SparkListener,
    TimeoutManager.java:32-120; job default 180 min)."""

    def __init__(self, spark: SparkSession,
                 timeout_min: float = DEFAULT_JOB_TIMEOUT_MIN) -> None:
        self.spark = spark
        self.timeout_s = timeout_min * 60
        self._timers: dict[str, threading.Timer] = {}
        self.timed_out: set[str] = set()

    def watch(self, job_group: str) -> None:
        timer = threading.Timer(self.timeout_s, self._cancel, args=(job_group,))
        timer.daemon = True
        timer.start()
        self._timers[job_group] = timer

    def _cancel(self, job_group: str) -> None:
        self.timed_out.add(job_group)
        self.spark.sparkContext.cancelJobGroup(job_group)

    def done(self, job_group: str) -> None:
        t = self._timers.pop(job_group, None)
        if t is not None:
            t.cancel()


class StageStallWatchdog:
    """Stage-progress watchdog: cancels a job group when its Spark stages
    stop making task progress, on top of the wall-clock job timeout.

    Reference parity: TimeoutManager (utilities/listener/TimeoutManager.java:
    32-120) tracks last activity per stage via a SparkListener and kills
    stalled stages; the Python-side equivalent polls
    ``sc.statusTracker()`` (SparkStatusTracker over the same listener
    data): per active job of a watched group, the signature
    (stage, completedTasks, activeTasks, failedTasks) must change within
    ``stage_stall_min`` or the whole group is cancelled
    (``cancelJobGroup`` with interruptOnCancel, the analogue of the
    reference's sc.cancelStage + job kill). Poll frequency is 1/min in
    the reference (FREQUENCY_IN_MINS); tests pass a faster ``poll_s``.
    """

    def __init__(self, spark: SparkSession,
                 job_timeout_min: float = DEFAULT_JOB_TIMEOUT_MIN,
                 stage_stall_min: float = DEFAULT_JOB_TIMEOUT_MIN,
                 poll_s: float = 60.0) -> None:
        self.spark = spark
        self.job_timeout_s = job_timeout_min * 60
        self.stage_stall_s = stage_stall_min * 60
        self.poll_s = poll_s
        self._watched: dict[str, dict] = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.timed_out: set[str] = set()
        self.stalled: set[str] = set()

    def watch(self, job_group: str) -> None:
        now = time.time()
        with self._lock:
            self._watched[job_group] = {"start": now, "last_progress": now,
                                        "sig": None}
            if self._thread is None:
                self._thread = threading.Thread(target=self._loop, daemon=True)
                self._thread.start()

    def done(self, job_group: str) -> None:
        with self._lock:
            self._watched.pop(job_group, None)

    def stop(self) -> None:
        self._stop.set()

    def _signature(self, job_group: str) -> tuple[bool, tuple]:
        """(any job running, sorted per-stage task-progress tuple)."""
        tracker = self.spark.sparkContext.statusTracker()
        sig = []
        running = False
        for jid in tracker.getJobIdsForGroup(job_group):
            info = tracker.getJobInfo(jid)
            if info is None or info.status != "RUNNING":
                continue
            running = True
            for sid in info.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None:
                    sig.append((sid, si.numCompletedTasks, si.numActiveTasks,
                                si.numFailedTasks))
        return running, tuple(sorted(sig))

    def _loop(self) -> None:
        while not self._stop.wait(self.poll_s):
            now = time.time()
            with self._lock:
                items = list(self._watched.items())
            for group, state in items:
                if now - state["start"] > self.job_timeout_s:
                    self.timed_out.add(group)
                    self._cancel(group)
                    continue
                running, sig = self._signature(group)
                if not running or sig != state["sig"]:
                    # driver-side work between jobs is not a stage stall
                    state["sig"] = sig
                    state["last_progress"] = now
                elif now - state["last_progress"] > self.stage_stall_s:
                    self.stalled.add(group)
                    self._cancel(group)

    def _cancel(self, job_group: str) -> None:
        self.done(job_group)
        self.spark.sparkContext.cancelJobGroup(job_group)


class JobStatus:
    """BaseStatus.java twin: starts SUCCESS and can only be downgraded
    (SUCCESS < IN_PROGRESS < FAILURE — setStatus keeps the worse of the
    two); exceptions accumulate; merge folds another status in."""

    SUCCESS, IN_PROGRESS, FAILURE = "SUCCESS", "IN_PROGRESS", "FAILURE"
    _ORDER = {SUCCESS: 0, IN_PROGRESS: 1, FAILURE: 2}

    def __init__(self) -> None:
        self.status = self.SUCCESS
        self.exceptions: list[BaseException] = []

    def set_status(self, status: str) -> None:
        if self._ORDER[status] > self._ORDER[self.status]:
            self.status = status

    def add_exception(self, e: BaseException) -> None:
        self.exceptions.append(e)

    def merge(self, other: "JobStatus") -> None:
        self.set_status(other.status)
        self.exceptions.extend(other.exceptions)


def aggregate_status(results: dict[str, "bool | BaseException"]) -> JobStatus:
    """JobManagerStatus shape: fold per-dag outcomes into one status —
    any exception downgrades to FAILURE and is carried; bool outcomes
    (work/no-work) stay SUCCESS."""
    agg = JobStatus()
    for outcome in results.values():
        if isinstance(outcome, BaseException):
            agg.set_status(JobStatus.FAILURE)
            agg.add_exception(outcome)
    return agg


class JobManager:
    """Runs many JobDags concurrently on one shared SparkSession."""

    def __init__(self, spark: SparkSession,
                 max_threads: int = DEFAULT_JOB_DAG_THREADS,
                 timeout_min: float = DEFAULT_JOB_TIMEOUT_MIN,
                 order_by_execution_time: bool = True,
                 lock_manager: FileLockManager | None = None,
                 stage_stall_min: float | None = None,
                 stall_poll_s: float = 60.0) -> None:
        """``stage_stall_min`` switches the watchdog from wall-clock-only
        to stage-progress stall detection (TimeoutManager.java parity)."""
        self.spark = spark
        self.max_threads = max_threads
        if stage_stall_min is not None:
            self.timeouts: TimeoutManager | StageStallWatchdog = \
                StageStallWatchdog(spark, timeout_min, stage_stall_min,
                                   poll_s=stall_poll_s)
        else:
            self.timeouts = TimeoutManager(spark, timeout_min)
        self.ordering = ExecutionTimeOrdering() if order_by_execution_time else None
        self.locks = lock_manager
        self.dags: list[JobDag] = []

    def add_job_dag(self, dag: JobDag) -> None:
        self.dags.append(dag)

    def run(self) -> dict[str, bool | BaseException]:
        """Execute all DAGs; returns {name: True/False (work processed) or
        the exception that failed it}. One DAG failing does not stop the
        others (JobManager.java isolates per-dag failures). With a lock
        manager, a DAG whose lock another runner holds fails with
        LockError — JobManager.JobLockManager semantics
        (JobManager.java:324-387)."""
        ordered = self.ordering.order(self.dags) if self.ordering else list(self.dags)
        results: dict[str, bool | BaseException] = {}

        def run_one(dag: JobDag):
            if self.locks is not None and not self.locks.acquire(dag.name):
                raise LockError(f"job dag '{dag.name}' is locked by another runner")
            self.timeouts.watch(dag.name)
            try:
                return dag.execute(self.spark, pool=dag.name)
            finally:
                self.timeouts.done(dag.name)
                if self.locks is not None:
                    self.locks.release(dag.name)

        with ThreadPoolExecutor(max_workers=self.max_threads) as pool:
            futures = {pool.submit(run_one, d): d for d in ordered}
            for fut in as_completed(futures):
                dag = futures[fut]
                try:
                    results[dag.name] = fut.result()
                except BaseException as e:  # noqa: BLE001
                    results[dag.name] = e
        return results
