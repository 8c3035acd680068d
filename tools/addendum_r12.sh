#!/bin/sh
# Round-12 chain addendum, run AFTER chain_r12.sh on the idle box:
# (a) the q32 slope point the chain subset missed (the bench key is
#     q32_summarize_pg, not q32_summarize), measured + verified + twinned
#     at sf1/sf4;
# (b) one idle-box bench rep per scale leg with the FIXED subset, to test
#     the mid-chain uniform inflation observed on untouched queries.
set -x
cd /root/repo
ST=/tmp/chain_r12.status
OUT=/tmp/chain_r12
SUBSET=$(sed -n 's/^SUBSET=//p' tools/chain_r12.sh | head -1 | sed 's/q32_summarize/q32_summarize_pg/')
steal() { awk '/^cpu /{print $9}' /proc/stat; }
echo "addendum start steal=$(steal) $(date +%H:%M:%S)" >> $ST

# q32 slope: verify dumps + oracle twin + compare at sf1/sf4
sbt -batch "runMain graft.Verify /tmp/sf1gen $OUT/vsf1 q32_summarize_pg" > $OUT/vsf1_q32.log 2>&1
sbt -batch "runMain graft.Verify /tmp/sf4gen $OUT/vsf4 q32_summarize_pg" > $OUT/vsf4_q32.log 2>&1
echo "addendum q32 verify done $(date +%H:%M:%S)" >> $ST

# idle-box scale reps (fixed subset, 3 fresh JVMs each -> own medians)
for i in 1 2 3; do
  SPARK_GRAFT_SF_DIR=/tmp/sf1gen SPARK_GRAFT_BENCH_ONLY=$SUBSET sbt -batch 'runMain graft.Bench' 2>&1 | grep -o '{"metric".*}' >> $OUT/bench_sf1_addendum.jsonl
  echo "addendum bench sf1 run $i done steal=$(steal) $(date +%H:%M:%S)" >> $ST
done
for i in 1 2 3; do
  SPARK_GRAFT_SF_DIR=/tmp/sf4gen SPARK_GRAFT_BENCH_ONLY=$SUBSET sbt -batch 'runMain graft.Bench' 2>&1 | grep -o '{"metric".*}' >> $OUT/bench_sf4_addendum.jsonl
  echo "addendum bench sf4 run $i done steal=$(steal) $(date +%H:%M:%S)" >> $ST
done

# q32 DuckDB twins at sf1/sf4 (3-rep medians, 600 s cap)
python3 tools/bench_duckdb_subset.py /tmp/sf1gen $OUT/vsf1 q32_summarize_pg 600 > $OUT/duck_sf1_q32.json 2> $OUT/duck_sf1_q32.err
python3 tools/bench_duckdb_subset.py /tmp/sf4gen $OUT/vsf4 q32_summarize_pg 600 > $OUT/duck_sf4_q32.json 2> $OUT/duck_sf4_q32.err
echo "addendum duck q32 done $(date +%H:%M:%S)" >> $ST

# q32 correctness at sf1/sf4
python3 tools/compare_oracle_subset.py /tmp/sf1gen $OUT/vsf1 q32_summarize_pg 600 > $OUT/cmpsf1_q32.txt 2>&1
python3 tools/compare_oracle_subset.py /tmp/sf4gen $OUT/vsf4 q32_summarize_pg 600 > $OUT/cmpsf4_q32.txt 2>&1
echo "addendum DONE $(date +%H:%M:%S)" >> $ST
