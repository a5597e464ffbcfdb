"""Complete example: Hive/Parquet -> Cassandra-shaped dispersal.

The reference's second canonical flow (ParquetToCassandraJob,
M/examples/job/ParquetToCassandraJob.java): read a parquet table,
validate + project to the Cassandra schema, emit DDL, write loader-ready
sorted size-capped batches. Swap the sink's final write for the
spark-cassandra-connector when a real cluster is reachable — the DDL
strings and the sorted-batch layout are exactly what a bulk loader
streams.

Run:  python examples/parquet_to_cassandra_dispersal.py [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from marmaray_spark.session import SparkFactory  # noqa: E402
from marmaray_spark.sinks.cassandra import (  # noqa: E402
    CassandraBulkSink,
    CassandraSchema,
)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/marmaray_spark_dispersal"
    spark = SparkFactory("dispersal-example").get_or_create()

    customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    schema = CassandraSchema.from_struct(
        customer.schema, keyspace="crm", table="customer",
        partition_keys=["c_nationkey"], clustering_keys=["c_custkey"],
        filtered_fields=["c_comment"])

    print("-- DDL the sink would issue (CassandraSchemaManager parity):")
    print(schema.create_keyspace_cql(replication_factor=3))
    print(schema.create_table_cql())

    sink = CassandraBulkSink(schema, os.path.join(out_dir, "batches"),
                             batch_rows=500)
    n_batches = sink.write(customer)
    print(f"wrote {n_batches} sorted size-capped batches to {out_dir}/batches "
          f"(sorted by partition+clustering keys, SSTable-loader-ready)")


if __name__ == "__main__":
    main()
