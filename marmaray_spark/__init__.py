"""marmaray_spark — a PySpark-native data ingestion & dispersal engine.

A from-scratch re-implementation of the capabilities of uber/marmaray
(reference: /root/reference, a Java/RDD/Avro micro-batch ingestion
framework) re-architected for idiomatic Spark SQL:

- DataFrame is the one data currency (reference: JavaRDD<AvroPayload>,
  M/common/AvroPayload.java:45); StructType is the one schema currency
  (reference: Avro Schema).
- Source -> Converter (validate/transform with a first-class
  valid/error fork) -> Sink pipelines, driven by work-unit calculators
  with atomic checkpoint commits.
- Sink write semantics: INSERT / BULK_INSERT / DEDUP_INSERT / UPSERT
  (reference: M/common/sinks/hoodie/HoodieSink.java:533-546) on a
  plain-parquet table with a commit log.
- LLM-data-pipeline extensions: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard / embedding-cosine), similarity search, text analysis,
  multimodal binary columns — new surface designed for 100 TB scale.

Everything data-plane is declared via the DataFrame API so Catalyst
performs pushdown/pruning/join-selection; custom code is confined to the
control plane (planning, checkpointing, orchestration).
"""

from marmaray_spark.config import Configuration
from marmaray_spark.metrics import ChargebackCalculator, DataFeedMetrics
from marmaray_spark.plans.dag import JobDag, JobManager, JobSubDag, SinkNode
from marmaray_spark.plans.locking import FileLockManager
from marmaray_spark.session import SparkFactory, get_spark
from marmaray_spark.sinks.table import TableSink, WriteOp

__version__ = "0.1.0"

__all__ = [
    "ChargebackCalculator",
    "Configuration",
    "DataFeedMetrics",
    "FileLockManager",
    "JobDag",
    "JobManager",
    "JobSubDag",
    "SinkNode",
    "SparkFactory",
    "TableSink",
    "WriteOp",
    "get_spark",
    "__version__",
]
