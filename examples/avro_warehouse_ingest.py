"""Complete example: Avro container-file warehouse → clean managed table.

The OCF ingest flow, batch and streaming, assembled from this engine's
parts (each leg is pytest-covered in tests/test_avro_file_source.py):

  .avro files (object container format, null/deflate codecs)
    -> AvroFileSource.get_data_forked  (corrupt files -> error table)
    -> operators/pii.corpus_hygiene    (redact + flag, one projection)
    -> TableSink INSERT                (commit-log table, lang-partitioned)
    -> read_ocf_stream                 (same flow as AvailableNow stream:
                                        new files picked up exactly once)

Run:  python examples/avro_warehouse_ingest.py [work_dir]
First run ingests the seeded batch files (one of them corrupt on
purpose); the second run streams in a newly "arrived" file and the
checkpoint ensures only it is decoded.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from marmaray_spark.operators.pii import corpus_hygiene  # noqa: E402
from marmaray_spark.session import SparkFactory  # noqa: E402
from marmaray_spark.sinks.table import TableSink, WriteOp  # noqa: E402
from marmaray_spark.sources.avro_file import (  # noqa: E402
    AvroFileSource, read_ocf_stream, write_ocf)
from marmaray_spark.sources.file import FileWorkUnitCalculator  # noqa: E402
from marmaray_spark.streaming.incremental import run_available_now  # noqa: E402

AVSC = {"type": "record", "name": "Doc", "fields": [
    {"name": "doc_id", "type": "long"},
    {"name": "lang", "type": "string"},
    {"name": "text", "type": "string"}]}


def seed(in_dir: str) -> None:
    os.makedirs(in_dir, exist_ok=True)
    mk = lambda i: {"doc_id": i, "lang": "en" if i % 2 else "de",  # noqa: E731
                    "text": f"document {i} with some body text"
                            + (f" contact user{i}@example.com" if i % 3 == 0
                               else "")}
    write_ocf(f"{in_dir}/part-0.avro", AVSC, [mk(i) for i in range(50)])
    write_ocf(f"{in_dir}/part-1.avro", AVSC, [mk(i) for i in range(50, 100)],
              codec="deflate")
    with open(f"{in_dir}/broken.avro", "wb") as f:   # corrupt on purpose
        f.write(b"Obj\x01not really avro")


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/avro_ingest_demo"
    in_dir, table, errors = f"{work}/in", f"{work}/table", f"{work}/errors"
    spark = SparkFactory("avro_warehouse_ingest").get_or_create()
    sink = TableSink(spark, table, "doc_id", partition_field="lang")

    first_run = not os.path.isdir(in_dir)
    if first_run:
        seed(in_dir)
        [unit] = FileWorkUnitCalculator(in_dir, "avro").compute_work_units()
        valid, errs = AvroFileSource(spark, avsc=AVSC).get_data_forked(unit)
        errs.write.mode("append").parquet(errors)
        sink.write(corpus_hygiene(valid), WriteOp.INSERT)
        print(f"batch ingest: {sink.read().count()} rows, "
              f"{spark.read.parquet(errors).count()} quarantined file(s)")
    else:
        # a new file "arrives"; the stream checkpoint decodes ONLY it
        n0 = sink.read().count()
        write_ocf(f"{in_dir}/late-{n0}.avro", AVSC,
                  [{"doc_id": 1000 + n0 + i, "lang": "en",
                    "text": f"late document {i}"} for i in range(10)])
        stream = corpus_hygiene(
            read_ocf_stream(spark, in_dir, AVSC, strict=False))
        run_available_now(
            stream.writeStream.foreachBatch(
                lambda df, _: sink.write(df, WriteOp.DEDUP_INSERT) and None)
            .option("checkpointLocation", f"{work}/ckpt"))
        print(f"stream ingest: {n0} -> {sink.read().count()} rows")

    redacted = sink.read().filter(F.col("pii_found") > 0)
    assert sink.read().filter(F.col("text").contains("@")).count() == 0
    print(f"{redacted.count()} docs carried PII; all redacted in the table")


if __name__ == "__main__":
    main()
