#!/bin/bash
# sf10 SPOT rehearsal for the manifest-maintenance family (r15, verdict
# item 3): the O(batch) claim of the incremental manifest / streaming
# admission / refresh-impact / incremental-report queries checked at 100x
# facts, where the r8-style extrapolation method applies —
# SPARK_GRAFT_BENCH_ONLY restricts the query set, SPARK_GRAFT_BENCH_ASSETS
# restricts the forced asset farm to exactly what the family serves from.
#
#   ROUND=r15 dev/run_spot.sh     # writes /tmp/${ROUND}_spot_sf{01,10}.log
# then: python3 dev/assemble_spot.py (SCALE_spot_${ROUND}.json)
#
# The sf10 fixture is 100 disjoint copies of sf0.1 (same construction as
# /tmp/sf1): key offsets are multiples of 20, so the fixture's
# source = 'src' || (doc_id % 20) pattern and the BLOCK arrival split
# (doc_id div 20) % 10 == 9 keep their per-copy alignment — every copy
# contributes full source cycles to both the stored and batch sides.
set -eu
ROUND="${ROUND:?set ROUND, e.g. ROUND=r15}"
cd /root/repo

SPOT_QUERIES="manifest_incremental,streams_manifest_admission_batch,manifest_refresh_impact,corpus_report_incremental"
SPOT_ASSETS="token_arrays,fp_store_old90,dedup_labels_old90,dedup_postings_old90,dedup_gram_df_old90,dedup_sizes_old90,bench_grams_old90,quality_thresholds_old90,manifest_old90,manifest_batch90"

if [ ! -f /tmp/sf10/documents.parquet ]; then
  echo "building /tmp/sf10 (100 copies of sf0.1)"
  python3 dev/make_sf1.py /root/testdata/sf0.1 /tmp/sf10 100
fi

for leg in sf01 sf10; do
  case "$leg" in
    sf01) dir=/root/testdata/sf0.1 ;;
    sf10) dir=/tmp/sf10 ;;
  esac
  echo "spot leg $leg ($dir)"
  SPARK_GRAFT_SF_DIR="$dir" \
    SPARK_GRAFT_BENCH_ONLY="$SPOT_QUERIES" \
    SPARK_GRAFT_BENCH_ASSETS="$SPOT_ASSETS" \
    sbt -batch "runMain graft.Bench" > "/tmp/${ROUND}_spot_${leg}.log" 2>&1
  cp target/bench.json "/tmp/${ROUND}_spot_${leg}.json"
done
echo "spot legs done: /tmp/${ROUND}_spot_sf01.json /tmp/${ROUND}_spot_sf10.json"
