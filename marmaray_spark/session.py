"""SparkSession factory tuned for the engine.

Reference parity: M/common/spark/SparkFactory.java:93-128 builds a
SparkContext with Kryo + pre-registered Avro schemas. On the DataFrame
path none of that is needed (Tungsten binary rows are the exchange
format), so this factory's job is reduced to: one shared session,
scale-appropriate SQL conf, FAIR scheduling so multiple job-DAGs can
share the session (JobManager semantics, M/common/job/JobManager.java).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the 100 TB posture:
# - AQE on: runtime partition coalescing + skew-join splitting replaces
#   the reference's hand-rolled repartition heuristics
#   (KafkaSource.java:117-127, FileSink.java:209-250).
# - shuffle.partitions is a *starting* value; AQE coalesces down. On a
#   real cluster this should be ~2-3x total cores; locally ~cores.
# - maxPartitionBytes 128m keeps scan tasks memory-bounded at any SF.
# - driver.memory MUST be pinned here: local-mode executors live inside the
#   driver JVM, and the 1 GiB JVM default makes hash-aggregate spills
#   (UnsafeKVExternalSorter) die under memory pressure with 32 concurrent
#   task threads. 16g is conservative for the 128 GiB sandbox; on a real
#   cluster this is a per-role submit-time setting. It only takes effect
#   when THIS factory starts the JVM (builder configs cannot resize a
#   running JVM) — which is the case for bench/driver/pytest entrypoints.
_DEFAULT_CONF: dict[str, str] = {
    "spark.driver.memory": "16g",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.scheduler.mode": "FAIR",
    "spark.ui.enabled": "false",
    # AQE's coalescing floor (default 1 MiB) decides parallelism by
    # shuffle BYTES, which starves stages whose work per byte is huge —
    # measured r12: a 3.4 MB candidate-pair shuffle coalesced to 3
    # tasks, putting a 472k-pair exact-dot verification on 3 of 32
    # cores (embedding_near_dup_pairs 1.96s -> 1.07s at 64k). At real
    # scale shuffles dwarf any floor, so this only ever binds on small
    # inputs, where parallelism matters more than per-partition size.
    # Env-overridable for deployments that prefer the 1m default.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize":
        os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION", "64k"),
}


class SparkFactory:
    """Builds/serves the shared SparkSession (one per process).

    Reference: M/common/spark/SparkFactory.java — single SparkContext
    shared by every JobDag in the JobManager.
    """

    def __init__(self, app_name: str = "marmaray_spark", conf: dict[str, str] | None = None,
                 master: str | None = None) -> None:
        self.app_name = app_name
        self.conf = dict(_DEFAULT_CONF)
        if conf:
            self.conf.update(conf)
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        self.master = master or f"local[{cpus}]"
        # shuffle.partitions scales WITH the core count instead of a
        # constant 32 (r12): the driver benches at lower core counts
        # too, where 32 reduce tasks on e.g. 8 cores is pure scheduling
        # overhead on tiny data; AQE still coalesces/splits from this
        # starting point, and an explicit conf (or env) wins. On a real
        # cluster this should be ~2-3x total executor cores.
        self.conf.setdefault(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS",
                           str(max(8, int(cpus) if cpus.isdigit() else 32))))

    def get_or_create(self) -> SparkSession:
        builder = SparkSession.builder.master(self.master).appName(self.app_name)
        for k, v in self.conf.items():
            builder = builder.config(k, v)
        spark = builder.getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
        return spark


def get_spark(app_name: str = "marmaray_spark", **conf: str) -> SparkSession:
    """Convenience: shared tuned session."""
    return SparkFactory(app_name, conf or None).get_or_create()
