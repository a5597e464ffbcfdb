#!/usr/bin/env bash
# Curated two-half pytest runner — the reliable full-suite shape.
#
# A single `pytest tests/` run wedges 40+ minutes hot in the
# hypothesis-heavy codec suites on this box (observed rounds 6 AND 7,
# with and without a concurrent Spark session); splitting into two
# sequential halves with the codec/hypothesis files spread across both
# runs the whole suite in ~20 min. The halves are CURATED LISTS, not an
# alphabetical interleave — adding a test file must not be able to shift
# every heavy file into one half (the round-6 wedge pattern).
#
# Usage:
#   tools/run_tests.sh            # both halves, sequential
#   tools/run_tests.sh 1          # half 1 only
#   tools/run_tests.sh 2          # half 2 only
#
# Maintenance: append NEW test files to whichever half is lighter; keep
# the codec-heavy files (jpeg/flac/gif_avi/pcm/properties/
# pii_properties) split across both halves. The guard below fails if a
# tests/test_*.py file is missing from both lists, so a new file cannot
# silently go unrun.

set -u -o pipefail
cd "$(dirname "$0")/.."

HALF1=(
  tests/test_asof.py tests/test_avro.py tests/test_avro_logical.py
  tests/test_bucketing.py tests/test_classifier_shard.py
  tests/test_converters.py tests/test_dsir.py tests/test_file_source.py
  tests/test_fork.py tests/test_jpeg_codec.py tests/test_kafka_workunits.py
  tests/test_locking.py tests/test_metrics.py tests/test_orchestration.py
  tests/test_pii.py tests/test_plans.py tests/test_properties.py
  tests/test_schema_evolution.py tests/test_slice_e2e.py
  tests/test_streaming.py tests/test_web.py tests/test_zorder.py
  tests/test_fingerprint.py tests/test_live_wire.py tests/test_dhash.py
  tests/test_table_stream.py
)
HALF2=(
  tests/test_ann_index.py tests/test_assembly.py
  tests/test_avro_file_source.py tests/test_bench_smoke.py
  tests/test_cassandra_and_registry.py tests/test_config.py
  tests/test_decontam_maintained.py tests/test_example_pipeline.py
  tests/test_flac_codec.py tests/test_gif_avi_codec.py
  tests/test_incdedup.py tests/test_kafka_contract.py
  tests/test_langid.py
  tests/test_llm_ops.py tests/test_metadata.py
  tests/test_object_store_sink.py tests/test_pcm_codecs.py
  tests/test_pii_properties.py tests/test_pq.py
  tests/test_retrieval_bloom.py tests/test_skew.py
  tests/test_sql_surface.py tests/test_table_sink.py
  tests/test_webdataset.py tests/test_tfrecord.py
)

# coverage guard: every tests/test_*.py must appear in EXACTLY one half
# (a file in both halves runs twice — minutes of silent double work)
missing=0
for f in tests/test_*.py; do
  found=0
  for g in "${HALF1[@]}" "${HALF2[@]}"; do
    [[ "$f" == "$g" ]] && found=$((found + 1))
  done
  if [[ $found -eq 0 ]]; then
    echo "ERROR: $f is in neither half — add it to the lighter list" >&2
    missing=1
  elif [[ $found -gt 1 ]]; then
    echo "ERROR: $f is listed $found times — keep exactly one entry" >&2
    missing=1
  fi
done
for g in "${HALF1[@]}" "${HALF2[@]}"; do
  [[ -f "$g" ]] || { echo "ERROR: $g listed but does not exist" >&2; missing=1; }
done
[[ $missing -eq 0 ]] || exit 2

which="${1:-both}"
rc=0
if [[ "$which" == "1" || "$which" == "both" ]]; then
  echo "=== half 1 (${#HALF1[@]} files) ==="
  python -m pytest "${HALF1[@]}" -q || rc=$?
fi
if [[ "$which" == "2" || "$which" == "both" ]]; then
  echo "=== half 2 (${#HALF2[@]} files) ==="
  python -m pytest "${HALF2[@]}" -q || rc=$?
fi
exit $rc
