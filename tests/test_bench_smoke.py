"""Bench-crash canary: the driver's per-round gate is ``python bench.py``
at sf0.1 in a fresh JVM. Rounds 3 and 4 shipped green tests but a red
bench artifact (an AnalysisException, then a hash-aggregate spill crash
under the default 1 GiB heap) — failures only reachable by running the
REAL entrypoint in a REAL fresh process with the production memory
config. This test does exactly that, so a bench crash is caught in
`pytest` before the driver records it.

Subprocess on purpose: `spark.driver.memory` only takes effect at JVM
start, so an in-process run through the shared pytest session would not
exercise the pinned-memory path at all.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@pytest.mark.skipif(not os.path.isdir(SF_DIR),
                    reason=f"bench data {SF_DIR} not present")
def test_bench_entrypoint_runs_clean_at_sf01():
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = SF_DIR
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=1200, env=env, cwd=REPO)
    assert proc.returncode == 0, (
        f"bench.py crashed (rc={proc.returncode}); stderr tail:\n"
        + "\n".join(proc.stderr.splitlines()[-30:]))
    # ONE parseable JSON line on stdout, with a warm time for every
    # HEADLINE query (the unknown-name guard makes a shrunken set
    # impossible, but assert the contract end-to-end anyway)
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip().startswith("{")]
    assert lines, f"no JSON line on stdout:\n{proc.stdout[-2000:]}"
    doc = json.loads(lines[-1])
    assert doc["unit"] == "sec" and doc["value"] > 0
    sys.path.insert(0, REPO)
    import bench
    assert set(doc["queries"]) == set(bench.HEADLINE)
    assert all(v >= 0 for v in doc["queries"].values())


def test_bench_headline_names_all_registered():
    """Cheap half of the canary: every HEADLINE name resolves in the
    registry (bench.py raises on unknown names — assert that wiring)."""
    sys.path.insert(0, REPO)
    import bench
    from marmaray_spark import queries as Q
    registry = Q.all_queries()
    missing = [n for n in bench.HEADLINE if n not in registry]
    assert missing == []
