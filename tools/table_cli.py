"""Table-services CLI — the Hudi CLI analogue for TableSink tables.

The reference's operators drive Hudi maintenance through hudi-cli
(commits show / compaction run / cleans run); this is the same
operability surface for the commit-log tables this repo writes:

    python tools/table_cli.py commits  <table>           # timeline
    python tools/table_cli.py stats    <table> --key k   # range/col index
    python tools/table_cli.py compact  <table> --key k
    python tools/table_cli.py savepoint <table> --key k [--as-of CID | --drop CID]
    python tools/table_cli.py cluster  <table> --key k [--buckets N] [--zorder-by x,y]
    python tools/table_cli.py vacuum   <table> --key k [--retain N]
    python tools/table_cli.py restore  <table> --key k --as-of COMMIT
    python tools/table_cli.py orphans  <table> --key k    # clean staged

Read-only commands (commits, stats) never start Spark; maintenance
commands build one local session. Everything prints one JSON line so
cron/automation can parse the outcome.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sink(args):
    from marmaray_spark.session import SparkFactory
    from marmaray_spark.sinks.table import TableSink
    spark = SparkFactory(app_name="table_cli").get_or_create()
    return TableSink(spark, args.table, args.key)


def cmd_commits(args) -> int:
    # log-only: no Spark session, works on any box that sees the files
    from marmaray_spark.sinks.table import CommitLog
    log = CommitLog(args.table)
    out = [{"commit": c.commit_id, "op": c.op, "adds": len(c.adds),
            "removes": len(c.removes), "counts": c.counts,
            "delta": c.delta} for c in log.commits()]
    active, deltas = log.active_state()
    print(json.dumps({"commits": out, "active_slices": len(active),
                      "active_delta_slices": len(deltas)}))
    return 0


def cmd_stats(args) -> int:
    from marmaray_spark.sinks.table import CommitLog
    log = CommitLog(args.table)
    key_stats: dict = {}
    col_stats: dict = {}
    for c in log.commits():
        key_stats.update(c.key_stats or {})
        for s, cols in (c.col_stats or {}).items():
            col_stats.setdefault(s, {}).update(cols)
    active = set(log.active_slices())
    print(json.dumps({
        "key_ranges": {s: v for s, v in key_stats.items() if s in active},
        "col_ranges": {s: v for s, v in col_stats.items() if s in active},
        "unindexed_slices": sorted(active - set(key_stats))}))
    return 0


def cmd_compact(args) -> int:
    c = _sink(args).compact()
    print(json.dumps({"compacted": c.commit_id if c else None,
                      "written": c.counts.get("written") if c else 0}))
    return 0


def cmd_cluster(args) -> int:
    zb = [c.strip() for c in (args.zorder_by or "").split(",") if c.strip()]
    c = _sink(args).cluster(n_buckets=args.buckets,
                            zorder_by=zb or None,
                            zorder_bits=args.zorder_bits)
    print(json.dumps({"clustered": c.commit_id if c else None,
                      "buckets": len(c.adds) if c else 0,
                      "rewrote_slices": len(c.removes) if c else 0}))
    return 0


def cmd_vacuum(args) -> int:
    deleted = _sink(args).vacuum(retain_last_n_commits=args.retain)
    print(json.dumps({"deleted_slices": deleted}))
    return 0


def cmd_restore(args) -> int:
    c = _sink(args).restore(args.as_of)
    print(json.dumps({"restored_to": args.as_of,
                      "restore_commit": c.commit_id}))
    return 0


def cmd_savepoint(args) -> int:
    sink = _sink(args)
    if args.drop:
        print(json.dumps({"dropped": sink.delete_savepoint(args.drop),
                          "savepoints": sink.savepoints()}))
        return 0
    cid = sink.savepoint(as_of=args.as_of)
    print(json.dumps({"savepointed": cid,
                      "savepoints": sink.savepoints()}))
    return 0


def cmd_orphans(args) -> int:
    removed = _sink(args).clean_orphans()
    print(json.dumps({"removed_orphans": removed}))
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name, fn, needs_key in [
            ("commits", cmd_commits, False), ("stats", cmd_stats, False),
            ("compact", cmd_compact, True), ("cluster", cmd_cluster, True),
            ("vacuum", cmd_vacuum, True), ("restore", cmd_restore, True),
            ("orphans", cmd_orphans, True),
            ("savepoint", cmd_savepoint, True)]:
        p = sub.add_parser(name)
        p.add_argument("table")
        p.add_argument("--key", required=needs_key,
                       help="record key field")
        if name == "cluster":
            p.add_argument("--buckets", type=int, default=None)
            p.add_argument("--zorder-by", dest="zorder_by", default=None,
                           help="comma-separated columns for a "
                                "multi-dimensional Z-order layout "
                                "instead of the key sort")
            p.add_argument("--zorder-bits", dest="zorder_bits",
                           type=int, default=8)
        if name == "vacuum":
            p.add_argument("--retain", type=int, default=5)
        if name == "restore":
            p.add_argument("--as-of", dest="as_of", required=True)
        if name == "savepoint":
            p.add_argument("--as-of", dest="as_of", default=None)
            p.add_argument("--drop", default=None,
                           help="commit id to unpin instead of pinning")
        p.set_defaults(fn=fn)
    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
