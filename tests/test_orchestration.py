"""Orchestration tests — modeled on T/common/job/TestJobManager.java,
TestJobDag.java, TestJobSubDag.java: checkpoint-only-on-success, commit
priority order, parallel DAGs on one session, retries, timeout."""

import time

import pytest
from pyspark.sql import functions as F

from marmaray_spark.metadata import InMemoryMetadataManager
from marmaray_spark.plans.dag import (
    ExecutionTimeOrdering,
    JobDag,
    JobManager,
    JobSubDag,
    SinkNode,
    TimeoutManager,
)
from marmaray_spark.plans.retry import SimpleRetryStrategy, retryable


class OneShotCalc:
    def __init__(self, units):
        self.units = units
        self.saved = None

    def compute_work_units(self):
        return self.units

    def save_next_run_state(self, wu):
        self.saved = wu


def test_jobdag_happy_path_commits_checkpoint(spark, customer):
    meta = InMemoryMetadataManager()
    written = {}
    calc = OneShotCalc(["u1"])
    dag = JobDag(
        "d1", calc,
        get_data=lambda wu: customer,
        sub_dag=JobSubDag([SinkNode("sink", lambda df: written.update(n=df.count()))]),
        metadata=meta,
        transform=lambda df: df.filter(F.col("c_acctbal") >= 0),
    )
    assert dag.execute(spark) is True
    assert written["n"] == customer.filter(F.col("c_acctbal") >= 0).count()
    assert calc.saved == ["u1"]
    assert meta.get("jobdag.last_runtime_ms") is not None


def test_jobdag_failure_skips_checkpoint(spark, customer):
    meta = InMemoryMetadataManager()
    calc = OneShotCalc(["u1"])

    def boom(df):
        raise RuntimeError("sink failed")

    dag = JobDag("d2", calc, lambda wu: customer,
                 JobSubDag([SinkNode("bad", boom)]), meta)
    with pytest.raises(RuntimeError, match="sink failed"):
        dag.execute(spark)
    # save_next_run_state DID run (JobDag.java:165 calls it unconditionally,
    # in-memory) — but nothing was PERSISTED: save_changes never fired.
    assert calc.saved == ["u1"]
    assert meta.get("jobdag.last_runtime_ms") is None
    assert meta.saved_count == 0


def test_jobdag_no_work(spark):
    meta = InMemoryMetadataManager()
    dag = JobDag("d3", OneShotCalc([]), lambda wu: None, JobSubDag([]), meta)
    assert dag.execute(spark) is False
    assert meta.get("jobdag.last_executed_unixtime") is not None


def test_subdag_commit_priority_order(spark, customer):
    order = []
    nodes = [
        SinkNode("data", lambda df: df.count(), commit=lambda: order.append("data"),
                 priority=50),
        SinkNode("errors", lambda df: df.count(), commit=lambda: order.append("errors"),
                 priority=1),
    ]
    sub = JobSubDag(nodes)
    sub.execute(customer)
    sub.commit()
    assert order == ["errors", "data"]  # ascending priority


def test_post_actions_run_on_failure(spark, customer):
    ran = []

    class Action:
        def execute(self, success):
            ran.append(success)

    dag = JobDag("d4", OneShotCalc(["u"]), lambda wu: customer,
                 JobSubDag([SinkNode("bad", lambda df: 1 / 0)]),
                 InMemoryMetadataManager(), actions=[Action()])
    with pytest.raises(ZeroDivisionError):
        dag.execute(spark)
    assert ran == [False]


def test_jobmanager_parallel_dags_isolated_failures(spark, customer, orders):
    mgr = JobManager(spark, max_threads=4, order_by_execution_time=False)
    counts = {}
    mgr.add_job_dag(JobDag(
        "ok", OneShotCalc(["u"]), lambda wu: customer,
        JobSubDag([SinkNode("s", lambda df: counts.update(ok=df.count()))]),
        InMemoryMetadataManager()))
    mgr.add_job_dag(JobDag(
        "bad", OneShotCalc(["u"]), lambda wu: orders,
        JobSubDag([SinkNode("s", lambda df: 1 / 0)]),
        InMemoryMetadataManager()))
    results = mgr.run()
    assert results["ok"] is True
    assert isinstance(results["bad"], ZeroDivisionError)
    assert counts["ok"] == customer.count()


def test_execution_time_ordering():
    def mk(name, last_exec, runtime):
        m = InMemoryMetadataManager()
        if last_exec:
            m.set("jobdag.last_executed_unixtime", str(int(time.time())))
            m.set("jobdag.last_runtime_ms", str(runtime))
        return JobDag(name, OneShotCalc([]), lambda wu: None, JobSubDag([]), m)

    never = mk("never", None, 0)
    slow = mk("slow", True, 90_000)
    fast = mk("fast", True, 1_000)
    ordered = ExecutionTimeOrdering().order([fast, slow, never])
    assert [d.name for d in ordered] == ["never", "slow", "fast"]


def test_timeout_manager_cancels_job_group(spark):
    tm = TimeoutManager(spark, timeout_min=0.002)  # 120 ms
    tm.watch("g1")
    time.sleep(0.4)
    assert "g1" in tm.timed_out
    tm2 = TimeoutManager(spark, timeout_min=10)
    tm2.watch("g2")
    tm2.done("g2")
    time.sleep(0.05)
    assert "g2" not in tm2.timed_out


def test_retry_strategy_counts():
    calls = []

    @retryable(num_retries=3, wait_ms=1)
    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise ValueError("transient")
        return "ok"

    assert flaky() == "ok"
    assert len(calls) == 3

    strategy = SimpleRetryStrategy(num_retries=1, wait_ms=1)
    attempts = []

    def always_fails():
        attempts.append(1)
        raise ValueError("nope")

    with pytest.raises(ValueError):
        strategy.call(always_fails)
    assert len(attempts) == 2  # 1 original + 1 retry


def test_jobdag_records_metrics(spark, customer):
    dag = JobDag("md", OneShotCalc(["u"]), lambda wu: customer,
                 JobSubDag([SinkNode("s", lambda df: df.count())]),
                 InMemoryMetadataManager())
    dag.execute(spark)
    by_name = {m.name: m for m in dag.metrics.metrics}
    assert by_name["work_unit_count"].value == 1
    assert by_name["success"].value == 1
    assert by_name["runtime"].unit == "sec"
    assert by_name["runtime"].tags["feed"] == "md"


def test_jobmanager_lock_prevents_concurrent_runner(spark, customer, tmp_path):
    from marmaray_spark.plans.locking import FileLockManager, LockError

    rival = FileLockManager(tmp_path)
    assert rival.acquire("locked-dag")

    mgr = JobManager(spark, order_by_execution_time=False,
                     lock_manager=FileLockManager(tmp_path))
    calc = OneShotCalc(["u"])
    mgr.add_job_dag(JobDag(
        "locked-dag", calc, lambda wu: customer,
        JobSubDag([SinkNode("s", lambda df: df.count())]),
        InMemoryMetadataManager()))
    results = mgr.run()
    assert isinstance(results["locked-dag"], LockError)
    assert calc.saved is None  # never ran, checkpoint untouched

    rival.release("locked-dag")
    results = mgr.run()
    assert results["locked-dag"] is True
    assert (tmp_path / "locked-dag.lock").exists() is False  # released after run


def test_stage_stall_watchdog_cancels_stalled_group(spark):
    """TimeoutManager.java stage-stall parity: a group whose stages make
    no task progress is cancelled; the sleeping collect raises."""
    import threading

    from marmaray_spark.plans.dag import StageStallWatchdog

    wd = StageStallWatchdog(spark, job_timeout_min=10,
                            stage_stall_min=4 / 60, poll_s=0.5)
    wd.watch("stall-group")
    err = {}

    def work():
        sc = spark.sparkContext
        sc.setJobGroup("stall-group", "deliberate stall", interruptOnCancel=True)
        try:
            spark.range(8).repartition(8).selectExpr(
                "java_method('java.lang.Thread','sleep',600000L)").collect()
        except Exception as e:  # noqa: BLE001
            err["e"] = e
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(90)
    wd.stop()
    assert not t.is_alive(), "stalled job was never cancelled"
    assert "stall-group" in wd.stalled
    assert "e" in err


def test_stage_stall_watchdog_leaves_progressing_jobs_alone(spark, lineitem):
    """A job that keeps completing tasks is NOT a stall, even with an
    aggressive stall threshold relative to total runtime."""
    import threading

    from marmaray_spark.plans.dag import StageStallWatchdog

    wd = StageStallWatchdog(spark, job_timeout_min=10,
                            stage_stall_min=30 / 60, poll_s=0.3)
    wd.watch("busy-group")
    out = {}

    def work():
        sc = spark.sparkContext
        sc.setJobGroup("busy-group", "healthy", interruptOnCancel=True)
        try:
            out["n"] = lineitem.groupBy("l_returnflag").count().count()
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(60)
    wd.stop()
    assert out.get("n", 0) > 0
    assert "busy-group" not in wd.stalled and "busy-group" not in wd.timed_out


# -- JobDagActions (parallel post-run actions, TestJobDagActions parity) -----

def test_actions_run_in_parallel_and_wait_for_finish():
    """testActionsRunInParallel + testWaitForActionsToFinish: N sleeping
    actions overlap (wall << sum) and all finished when execute returns."""
    import time as _t

    from marmaray_spark.plans.dag import JobDagActions

    done = []

    class Sleeper:
        def __init__(self, i): self.i = i
        def execute(self, success):
            _t.sleep(0.4)
            done.append(self.i)

    runner = JobDagActions(max_threads=4)
    for i in range(4):
        runner.add(Sleeper(i))
    t0 = _t.time()
    assert runner.execute(True) is True
    wall = _t.time() - t0
    assert wall < 1.2                  # 4 x 0.4s sequential would be 1.6s
    assert sorted(done) == [0, 1, 2, 3]


def test_action_exception_isolated_and_reported():
    """testExecuteHandlesException + testJobDagMetricsReporting: one
    failing action doesn't stop the others or raise; result/time metrics
    are emitted per action."""
    from marmaray_spark.metrics import DataFeedMetrics
    from marmaray_spark.plans.dag import JobDagActions

    ran = []

    class Boom:
        def execute(self, success): raise RuntimeError("boom")

    class Fine:
        def execute(self, success): ran.append(success)

    metrics = DataFeedMetrics("feed1")
    runner = JobDagActions(metrics, target="feed1")
    runner.add(Boom())
    runner.add(Fine())
    assert runner.execute(False) is False    # aggregate reflects the failure
    assert ran == [False]                    # the healthy action still ran

    by_name = {}
    for m in metrics._metrics:
        by_name.setdefault(m.name, []).append(m)
    results = {m.tags["action"]: m.value for m in by_name["action_result"]}
    assert results == {"Boom": 0.0, "Fine": 1.0}
    assert {m.tags["action"] for m in by_name["action_execution_time"]} == \
        {"Boom", "Fine"}


def test_action_timeout_counts_as_failure_without_blocking():
    """testTimeoutForLongRunningActions: an overrunning action fails the
    aggregate and execute() returns without waiting for it."""
    import time as _t

    from marmaray_spark.plans.dag import JobDagActions

    class Hang:
        timeout_s = 0.3
        def execute(self, success): _t.sleep(10)

    class Quick:
        def execute(self, success): pass

    runner = JobDagActions()
    runner.add(Hang(), timeout_s=0.3)
    runner.add(Quick())
    t0 = _t.time()
    assert runner.execute(True) is False
    assert _t.time() - t0 < 2.0        # did not join the 10s sleeper


def test_jobdag_runs_actions_in_parallel_runner(spark, customer):
    """JobDag wires its actions through the parallel runner: a raising
    action neither fails the dag nor blocks the success action."""
    from marmaray_spark.plans.dag import JobDag, JobSubDag, SinkNode
    from marmaray_spark.metadata import InMemoryMetadataManager

    calls = []

    class Raising:
        def execute(self, success): raise ValueError("x")

    class Recording:
        def execute(self, success): calls.append(success)

    sink = SinkNode("collect", lambda df: df.count())
    dag = JobDag("adag", OneShotCalc(["u"]),
                 lambda wu: customer.limit(5),
                 JobSubDag([sink]),
                 InMemoryMetadataManager(),
                 actions=[Raising(), Recording()])
    assert dag.execute(spark) is True
    assert calls == [True]


def test_job_status_downgrade_only_and_merge():
    """TestBaseStatus parity: status only moves toward worse; merge folds
    status + exceptions."""
    from marmaray_spark.plans.dag import JobStatus

    s = JobStatus()
    assert s.status == JobStatus.SUCCESS
    s.set_status(JobStatus.IN_PROGRESS)
    assert s.status == JobStatus.IN_PROGRESS
    s.set_status(JobStatus.SUCCESS)            # cannot upgrade
    assert s.status == JobStatus.IN_PROGRESS
    s.set_status(JobStatus.FAILURE)
    assert s.status == JobStatus.FAILURE

    other = JobStatus()
    other.add_exception(ValueError("x"))
    other.set_status(JobStatus.FAILURE)
    fresh = JobStatus()
    fresh.merge(other)
    assert fresh.status == JobStatus.FAILURE
    assert len(fresh.exceptions) == 1


def test_jobmanager_aggregate_status(spark, customer, orders):
    """TestJobManagerStatus shape: per-dag outcomes fold into one status;
    a failing dag downgrades the aggregate and carries its exception."""
    from marmaray_spark.metadata import InMemoryMetadataManager
    from marmaray_spark.plans.dag import (JobDag, JobStatus, JobSubDag,
                                          SinkNode, aggregate_status)

    ok = JobDag("ok2", OneShotCalc(["u"]), lambda wu: customer,
                JobSubDag([SinkNode("s", lambda df: df.count())]),
                InMemoryMetadataManager())

    def boom(df):
        raise RuntimeError("sink died")

    bad = JobDag("bad2", OneShotCalc(["u"]), lambda wu: orders,
                 JobSubDag([SinkNode("s", boom)]),
                 InMemoryMetadataManager())

    from marmaray_spark.plans.dag import JobManager
    mgr = JobManager(spark, max_threads=2, order_by_execution_time=False)
    mgr.add_job_dag(ok)
    mgr.add_job_dag(bad)
    results = mgr.run()
    agg = aggregate_status(results)
    assert agg.status == JobStatus.FAILURE
    assert len(agg.exceptions) == 1 and "sink died" in str(agg.exceptions[0])

    only_ok = aggregate_status({"ok2": True, "idle": False})
    assert only_ok.status == JobStatus.SUCCESS and only_ok.exceptions == []


def test_subdag_step_ordering_parent_split(spark, customer):
    """Port of the reference TestJobSubDag step contract
    (TestJobSubDag.java:148-160): payload splits into even/odd legs,
    both legs EXECUTE before any commit, commits run in priority order
    (even=0 before odd=1), and each leg sees only its parity."""
    import threading

    from pyspark.sql import functions as F

    from marmaray_spark.plans.dag import JobSubDag, SinkNode

    steps, lock = [], threading.Lock()

    def log(tag):
        with lock:
            steps.append(tag)

    def make_write(tag, parity):
        def write(df):
            rows = df.filter(F.col("c_custkey") % 2 == parity).count()
            bad = df.filter(F.col("c_custkey") % 2 != parity).filter(
                F.lit(tag) == tag).limit(0).count()   # leg filters its parity
            log(("write", tag, rows > 0 and bad == 0))
            return rows
        return write

    sub = JobSubDag([
        SinkNode("even", make_write("even", 0),
                 commit=lambda: log(("commit", "even")), priority=0),
        SinkNode("odd", make_write("odd", 1),
                 commit=lambda: log(("commit", "odd")), priority=1),
    ])
    results = sub.execute(customer)
    sub.commit()

    assert set(results) == {"even", "odd"} and all(v > 0 for v in results.values())
    writes = [s for s in steps if s[0] == "write"]
    commits = [s for s in steps if s[0] == "commit"]
    assert len(writes) == 2 and all(ok for (_, _, ok) in writes)
    # every write precedes every commit; commits ordered by priority
    assert steps.index(commits[0]) > max(steps.index(w) for w in writes)
    assert [c[1] for c in commits] == ["even", "odd"]


def test_subdag_child_failure_aborts_before_commit(spark, customer):
    """Failure-ordering edge: one leg failing must surface from execute()
    and no commit may run — the reference's no-partial-commit contract."""
    import pytest

    from marmaray_spark.plans.dag import JobSubDag, SinkNode

    committed = []
    sub = JobSubDag([
        SinkNode("good", lambda df: df.count(),
                 commit=lambda: committed.append("good"), priority=0),
        SinkNode("bad", lambda df: (_ for _ in ()).throw(RuntimeError("leg failed")),
                 commit=lambda: committed.append("bad"), priority=1),
    ])
    with pytest.raises(RuntimeError, match="leg failed"):
        sub.execute(customer)
    assert committed == []


def test_jobdag_metadata_save_failure_fails_job_and_runs_actions(spark, customer):
    """Port of TestJobDag.testMetadataManagerException: sinks commit, then
    metadata.save_changes raises -> execute raises, post-actions still run
    with success=False, and the checkpoint is NOT durable."""
    import pytest

    from marmaray_spark.metadata import InMemoryMetadataManager
    from marmaray_spark.plans.dag import JobDag, JobSubDag, SinkNode

    class ExplodingMetadata(InMemoryMetadataManager):
        def save_changes(self):
            raise IOError("mock metadataManager exception")

    class StaticCalc:
        def compute_work_units(self):
            return ["wu-1"]

        def save_next_run_state(self, work_units):
            pass

    seen = []

    class RecordingAction:
        def execute(self, success):
            seen.append(success)

    dag = JobDag(
        "meta_fail_job", StaticCalc(),
        get_data=lambda wu: customer,
        sub_dag=JobSubDag([SinkNode("sink", lambda df: df.count())]),
        metadata=ExplodingMetadata(),
        actions=[RecordingAction()],
    )
    with pytest.raises(IOError, match="mock metadataManager"):
        dag.execute(spark)
    assert seen == [False]
    assert isinstance(dag.last_error, IOError)
