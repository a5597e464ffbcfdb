"""SQL entry surface: register the warehouse tables as views and run SQL.

The engine is DataFrame-first, but a user coming from any batch warehouse
expects ``SELECT``s to just work. ``register_tables`` creates temp views
over the parquet warehouse (through ``queries.load`` so the events
timestamp normalization applies to SQL exactly as it does to the
DataFrame API), and ``run_sql`` is a thin, explicit entry point. Views
are lazy — registering costs one footer read per table, no data scan,
and Catalyst treats a view exactly like the underlying scan (pushdown,
pruning, AQE all apply).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from marmaray_spark import queries as Q

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def register_tables(spark: SparkSession, sf_dir: str,
                    tables: list[str] | None = None,
                    suffix: str = "") -> list[str]:
    """Create/replace a temp view per warehouse table; returns the view
    names. ``suffix`` namespaces concurrent registrations of different
    scale factors in one session."""
    names = []
    for t in (tables or TABLES):
        name = f"{t}{suffix}"
        Q.load(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Register the warehouse and run one SQL query against it."""
    register_tables(spark, sf_dir)
    return spark.sql(query)
