"""Ops CLIs over the checkpoint metadata store: print and prune.

Reference parity (marmaray-tools):
- HDFSMetadataPrinter.java — dump every key/value of one metadata
  snapshot file (``-m FILE``), or of the latest snapshot when given the
  checkpoint DIRECTORY.
- HDFSMetadataPruner.java — retain only the newest N snapshot files of a
  checkpoint directory (``-p PATH -n NUM [-f fake-delete]``); files sort
  by their numeric names, and a fake run only logs what would go.

Usage:
    python tools/metadata_cli.py print  -m <snapshot.json | checkpoint_dir>
    python tools/metadata_cli.py prune  -p <checkpoint_dir> -n <retain> [-f]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def _snapshots(directory: Path) -> list[Path]:
    """Numeric-named snapshot files, ascending (name = sequence number,
    the pruner's byTimestampedNameAsc comparator)."""
    return sorted((p for p in directory.glob("*.json")
                   if p.stem.isdigit()), key=lambda p: int(p.stem))


def cmd_print(args: argparse.Namespace) -> int:
    target = Path(args.mfile)
    if target.is_dir():
        snaps = _snapshots(target)
        if not snaps:
            print(f"no metadata snapshots under {target}", file=sys.stderr)
            return 1
        target = snaps[-1]
    meta = json.loads(target.read_text())
    print(f"# {target}")
    for k in sorted(meta):
        print(f"Key: {k} Value: {meta[k]}")
    return 0


def cmd_prune(args: argparse.Namespace) -> int:
    directory = Path(args.path)
    if not directory.is_dir():
        print(f"not a directory: {directory}", file=sys.stderr)
        return 1
    if args.num_files < 1:
        print("numFiles must be >= 1", file=sys.stderr)
        return 1
    snaps = _snapshots(directory)
    doomed = snaps[:-args.num_files] if len(snaps) > args.num_files else []
    for p in doomed:
        if args.fake:
            print(f"fake-delete: would remove {p}")
        else:
            p.unlink()
            print(f"removed {p}")
    print(f"{len(snaps) - len(doomed)} snapshot(s) retained, "
          f"{len(doomed)} {'would be ' if args.fake else ''}removed")
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="metadata_cli",
                                 description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_print = sub.add_parser("print", help="dump a metadata snapshot")
    p_print.add_argument("-m", "--mfile", required=True,
                         help="snapshot file or checkpoint directory (latest)")
    p_print.set_defaults(fn=cmd_print)

    p_prune = sub.add_parser("prune", help="retain only the newest N snapshots")
    p_prune.add_argument("-p", "--path", required=True, help="checkpoint directory")
    p_prune.add_argument("-n", "--num-files", type=int, required=True,
                         help="number of snapshot files to retain")
    p_prune.add_argument("-f", "--fake", action="store_true",
                         help="log what would be deleted without deleting")
    p_prune.set_defaults(fn=cmd_prune)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
