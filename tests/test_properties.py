"""Property-based tests (hypothesis) for the pure-arithmetic operators.

The reference tests these with hand-picked cases
(T/common/sources/kafka/TestKafkaWorkUnitCalculator.java); properties
pin the INVARIANTS the arithmetic must hold at any input shape —
stronger coverage for the code most likely to silently drift.
No Spark session needed: driver-side planning math only.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from marmaray_spark.sinks.file import plan_num_files
from marmaray_spark.sources.kafka import fair_split

backlogs = st.dictionaries(
    keys=st.integers(min_value=0, max_value=64),
    values=st.integers(min_value=0, max_value=10_000_000),
    min_size=1, max_size=32,
)


def _starts(msgs):
    return {p: p * 1000 for p in msgs}


@settings(max_examples=300, deadline=None)
@given(msgs=backlogs, cap=st.integers(min_value=1, max_value=20_000_000))
def test_fair_split_never_exceeds_cap_or_backlog(msgs, cap):
    ranges = fair_split(msgs, _starts(msgs), cap)
    taken = {r.partition: r.until_offset - r.from_offset for r in ranges}
    # per-partition: takes no more than that partition's backlog
    assert all(0 < taken[p] <= msgs[p] for p in taken)
    # total: never exceeds the cap (KafkaSourceConfiguration max_messages)
    assert sum(taken.values()) <= cap


@settings(max_examples=300, deadline=None)
@given(msgs=backlogs, cap=st.integers(min_value=1, max_value=20_000_000))
def test_fair_split_drains_everything_when_under_cap(msgs, cap):
    total = sum(msgs.values())
    if total <= cap:
        ranges = fair_split(msgs, _starts(msgs), cap)
        assert sum(r.until_offset - r.from_offset for r in ranges) == total


@settings(max_examples=300, deadline=None)
@given(msgs=backlogs, cap=st.integers(min_value=1, max_value=20_000_000))
def test_fair_split_offsets_start_at_checkpoints(msgs, cap):
    starts = _starts(msgs)
    for r in fair_split(msgs, starts, cap):
        assert r.from_offset == starts[r.partition]
        assert r.until_offset > r.from_offset


@settings(max_examples=300, deadline=None)
@given(msgs=backlogs, cap=st.integers(min_value=1, max_value=20_000_000))
def test_fair_split_small_partitions_drain_first(msgs, cap):
    """The fair-split promise: when capped, a partition that got LESS than
    its backlog implies every smaller-backlog partition drained fully or
    received at least as fair a share (sorted-ascending allocation)."""
    ranges = {r.partition: r.until_offset - r.from_offset
              for r in fair_split(msgs, _starts(msgs), cap)}
    short = [p for p, m in msgs.items() if ranges.get(p, 0) < m]
    if short:
        starved_min = min(ranges.get(p, 0) for p in short)
        for p, m in msgs.items():
            if m <= starved_min:
                assert ranges.get(p, 0) == m  # fully drained


@settings(max_examples=300, deadline=None)
@given(msgs=backlogs, cap=st.integers(min_value=1, max_value=20_000_000))
def test_fair_split_deterministic(msgs, cap):
    a = fair_split(msgs, _starts(msgs), cap)
    b = fair_split(dict(reversed(list(msgs.items()))), _starts(msgs), cap)
    assert a == b


@settings(max_examples=200, deadline=None)
@given(size_mb=st.floats(min_value=0, max_value=1e7, allow_nan=False),
       target=st.one_of(st.just(-1.0),
                        st.floats(min_value=1e-3, max_value=1e5,
                                  allow_nan=False)))
def test_plan_num_files_bounds(size_mb, target):
    n = plan_num_files(size_mb, target)
    assert n >= 1
    if target > 0:
        # enough files that each stays under target (+1 file of slack)
        assert n * target >= size_mb


def test_plan_num_files_rejects_overflowing_target():
    import pytest

    with pytest.raises(ValueError):
        plan_num_files(1e7, 5e-324)  # denormal target -> infinite file count


# -- sequence packing (operators/packing.py) ---------------------------------

@given(sizes=st.lists(st.integers(min_value=1, max_value=900),
                      min_size=1, max_size=60),
       seq_len=st.sampled_from([128, 512]),
       n_buckets=st.sampled_from([1, 4]))
@settings(max_examples=8, deadline=None)
def test_pack_sequences_matches_python_model(spark, sizes, seq_len,
                                             n_buckets):
    """Spark packing == the obvious sequential Python model, for any doc
    mix: per bucket, docs concatenate in id order and each doc lands in
    the bin where it starts; every doc is assigned exactly once."""
    from marmaray_spark.operators.packing import pack_sequences

    rows = [(i, n) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    got = {r["doc_id"]: (r["bucket"], r["bin_id"])
           for r in pack_sequences(df, id_col="doc_id", tokens_col="n_tokens",
                                   seq_len=seq_len,
                                   n_buckets=n_buckets).collect()}
    assert len(got) == len(rows)                  # conservation
    cursors = {}
    for i, n in rows:                             # ids ascending = pack order
        b = i % n_buckets
        start = cursors.get(b, 0)
        assert got[i] == (b, start // seq_len), (i, n, got[i])
        cursors[b] = start + n


# -- UniMax allocation (operators/text.py) -----------------------------------

@given(toks=st.lists(st.integers(min_value=0, max_value=50_000),
                     min_size=1, max_size=12),
       budget_frac=st.integers(min_value=0, max_value=400),
       epoch_cap=st.sampled_from([1, 3, 4]))
@settings(max_examples=10, deadline=None)
def test_unimax_allocation_matches_sequential_loop(spark, toks, budget_frac,
                                                   epoch_cap):
    """The window-function closed form == UniMax Algorithm 1's sequential
    loop (ascending by cap: grant min(cap, remaining // groups_left),
    recompute) for any group mix, budget (0..4x total tokens) and epoch
    cap — including all-capped, none-capped and zero-token groups."""
    from marmaray_spark.operators.text import unimax_allocation

    groups = [(f"g{i:02d}", n) for i, n in enumerate(toks)]
    total = sum(toks)
    budget = total * budget_frac // 100

    def sequential():
        order = sorted(groups, key=lambda kv: (kv[1] * epoch_cap, kv[0]))
        left, rem, out = len(order), budget, {}
        for g, n in order:
            a = min(n * epoch_cap, rem // left)
            out[g] = a
            rem -= a
            left -= 1
        return out

    rows = [(g, i, n) for i, (g, n) in enumerate(groups)]
    df = spark.createDataFrame(rows, ["lang", "doc_id", "n_tok"])
    got = {r["lang"]: r for r in unimax_allocation(
        df, "lang", "n_tok", budget_tokens=budget,
        epoch_cap=epoch_cap).collect()}
    want = sequential()
    assert set(got) == set(want)
    for g, alloc in want.items():
        r = got[g]
        assert r["alloc_tokens"] == alloc, (g, dict(groups), budget)
        n = dict(groups)[g]
        assert r["full_epochs"] == alloc // max(n, 1)
        assert r["frac_bps"] == (alloc % max(n, 1)) * 10000 // max(n, 1)
        assert r["alloc_tokens"] <= r["cap_tokens"]


def test_unimax_null_token_group_allocates_zero(spark):
    """A group whose token counts are all NULL allocates 0 (cap 0,
    capped) instead of riding NULL through the water-fill."""
    from marmaray_spark.operators.text import unimax_allocation

    rows = [(1, "en", 100), (2, "en", 100), (3, "xx", None), (4, "xx", None)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tok int")
    got = {r["lang"]: r for r in unimax_allocation(
        df, "lang", "n_tok", budget_tokens=150, epoch_cap=2).collect()}
    assert got["xx"]["n_tokens"] == 0
    assert got["xx"]["alloc_tokens"] == 0
    assert got["xx"]["full_epochs"] == 0 and got["xx"]["frac_bps"] == 0
    assert got["en"]["alloc_tokens"] == 150


def test_unimax_fraction_sample_keeps_cutoff_subset(spark):
    """The fractional-epoch subset is exactly the md5-cutoff set at each
    group's frac_bps, and capped groups (frac 0) contribute no rows."""
    import hashlib

    from marmaray_spark.operators.text import (unimax_allocation,
                                               unimax_fraction_sample)

    rows = [(i, "en" if i % 3 else "de", 10 + i % 7) for i in range(120)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "n_tok"])
    alloc = unimax_allocation(df, "lang", "n_tok",
                              budget_tokens=1500, epoch_cap=2)
    fb = {r["lang"]: (r["frac_bps"], r["full_epochs"])
          for r in alloc.collect()}
    kept = {r["doc_id"] for r in
            unimax_fraction_sample(df, "doc_id", "lang", alloc,
                                   salt="um0").collect()}
    want = set()
    for doc_id, lang, _n in rows:
        frac, _fe = fb[lang]
        u16 = int(hashlib.md5(f"um0:{doc_id}".encode()).hexdigest()[:4], 16)
        if u16 < frac * 65536 // 10000:
            want.add(doc_id)
    assert kept == want and all(fb[l][0] < 10000 for l in fb)


def test_unimax_materialize_row_multiplicity(spark):
    """Materialized rows = full_epochs copies of every group row plus one
    copy of the md5-cutoff fractional subset, epoch numbered 1..fe(+1)."""
    import hashlib

    from marmaray_spark.operators.text import (unimax_allocation,
                                               unimax_materialize)

    rows = [(i, "en" if i % 3 else "de", 10 + i % 7) for i in range(90)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "n_tok"])
    alloc = unimax_allocation(df, "lang", "n_tok",
                              budget_tokens=2000, epoch_cap=3)
    fb = {r["lang"]: (r["full_epochs"], r["frac_bps"])
          for r in alloc.collect()}
    assert any(fe > 0 for fe, _ in fb.values())
    assert any(fr > 0 for _, fr in fb.values())
    got = {}
    for r in unimax_materialize(df, "doc_id", "lang", alloc,
                                salt="um0").collect():
        got.setdefault(r["doc_id"], []).append(r["epoch"])
    for doc_id, lang, _n in rows:
        fe, frac = fb[lang]
        u16 = int(hashlib.md5(f"um0:{doc_id}".encode()).hexdigest()[:4], 16)
        in_frac = u16 < frac * 65536 // 10000
        want = list(range(1, fe + 1)) + ([fe + 1] if in_frac else [])
        assert sorted(got.get(doc_id, [])) == want, (doc_id, lang, want)


def test_decontaminate_bounds_on_testdata(spark):
    """n-gram sections: overlap_bps in (0, 10000], n_overlap <= n_grams,
    eval docs never appear (they are not corpus rows). The r8 'semantic'
    section reuses the shared schema with n_grams := eval hits over
    threshold and n_overlap := max quantized dot, so its bounds differ:
    at least one hit, max dot at or above the declared 250k cut, no bps."""
    from pyspark.sql import functions as F

    import marmaray_spark.queries as Q

    out = Q.all_queries()["benchmark_decontamination"](
        spark, "/root/testdata/sf0.001").collect()
    sem = [r for r in out if r["eval_set"] == "semantic"]
    ngram = [r for r in out if r["eval_set"] != "semantic"]
    assert ngram, "n-gram check must not be vacuous at sf0.001"
    assert sem, "semantic check must not be vacuous at sf0.001"
    for r in ngram:
        assert 0 < r["n_overlap"] <= r["n_grams"]
        assert 0 < r["overlap_bps"] <= 10000
        assert r["doc_id"] % 97 != 0
        assert r["contaminated"] == (r["overlap_bps"] >= 500)
    for r in sem:
        assert r["n_grams"] >= 1                 # hits over threshold
        assert r["n_overlap"] >= 250_000         # max dot >= the cut
        assert r["overlap_bps"] is None
        assert r["doc_id"] % 101 != 0            # eval side excluded
        assert r["contaminated"] is True
