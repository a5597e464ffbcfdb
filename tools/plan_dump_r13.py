"""Dump `.explain("formatted")` for named declared queries into
plans/r13/<query>_<tag>.txt — the optimization round's before/after
plan evidence (judge-checkable without running Spark).

Usage: python tools/plan_dump_r13.py <tag> <query>[,<query>...] [sf_dir]

Note: e2e write queries (table_*) execute their writes when built; the
captured plan is the read-back surface, same convention as EXPLAIN.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from marmaray_spark import queries as Q  # noqa: E402
from marmaray_spark.session import SparkFactory  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = [n for n in sys.argv[2].split(",") if n]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    spark = SparkFactory("plan_dump").get_or_create()
    registry = Q.all_queries()
    jvm = spark._jvm
    fmt = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    for name in names:
        df = registry[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(fmt)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') at {sf_dir} "
                    f"[{tag}]\n\n")
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
