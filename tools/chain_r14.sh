#!/bin/sh
# Round-14 certification chain — one coherent chain at a single HEAD.
# Structural changes vs r13 (verdict items 1 and 8):
#  - the sf0.01/sf0.1 oracle compares run FIRST among untimed work;
#  - the sf1/sf4 twin legs DUMP each oracle result during the timed run
#    (bench_duckdb_subset.py dumpDir arg), so the scale hash gate is a
#    free parquet diff (compare_from_dump.py) immediately after each
#    twin leg — never again sequenced last as a second DuckDB burn;
#  - artifacts are assembled AND COMMITTED incrementally after every
#    timed leg, so a dying session loses at most one leg;
#  - the sf1 spark bench runs 5 reps (r13's three spread 128-316 s under
#    steal; medians-of-5 with the per-leg steal log make the spread
#    attributable).
# Status lines append to /tmp/chain_r14.status with cumulative
# /proc/stat steal so contention windows are attributable post hoc.
# Prereq: /tmp/sf1gen (gen_scale 10) and /tmp/sf4gen (gen_scale 40).
set -x
cd /root/repo
ST=/tmp/chain_r14.status
OUT=/tmp/chain_r14
mkdir -p $OUT
SUBSET=q100_asof_join,q101_range_join,q102_fuzzy_join,q106_asof_forward,q107_overlap_join,q108_token_ids,q109_sample_quantiles,q110_hll_by_group,q111_temporal_reachability,q112_ktruss,q113_link_prediction,q114_copurchase,q115_weighted_pagerank,q116_countmin_by_group,q117_weighted_lpa,q118_ivfpq_ann,q119_modularity,q120_exact_quantiles,q17_lcc,q18_dedup_exact,q19_dedup_jaccard,q1_agg,q20_dedup_minhash,q21_dedup_simhash,q22_text_stats,q27_sim_lsh,q32_summarize_pg,q35_user_bfs,q36_user_wcc,q3_window,q42_match_3hop_big,q43_tfidf,q44_ngram_freq,q55_user_kshortest,q56_ivf_ann,q62_sequence_pack,q71_repetition,q72_c4_filters,q73_decontaminate,q74_pii_redact,q75_mixture_sample,q78_corpus_profile,q79_line_dedup,q80_unigram_logprob,q83_triangles,q85_scc,q87_semdedup,q92_mixed_space_path,q93_cross_space_acyclic,q94_duplicated_spans,q95_bloom_decontaminate,q96_pq_ann
HEAD=$(git rev-parse --short HEAD)
steal() { awk '/^cpu /{print $9}' /proc/stat; }
echo "chain start head=$HEAD steal=$(steal) $(date +%H:%M:%S)" >> $ST

commit_arts() {
  git add BENCH_LOCAL_r14.json BENCH_SF1_r14.json BENCH_SF4_r14.json \
    BENCH_ANN_r14.json DUCKDB_BASELINE_r14.json DUCKDB_SF1_r14.json \
    DUCKDB_SF4_r14.json CORRECTNESS_SCALE_r14.json \
    CORRECTNESS_CHAIN_r14.json STEAL_r14.json 2>/dev/null
  git diff --cached --quiet || git commit -q -m "Round-14 artifacts: $1 (incremental)"
}

# 1. full suite — runs unless SKIP_SUITE=1 (set only when the identical
# working tree just ran the suite green in this session)
if [ "$SKIP_SUITE" != "1" ]; then
  sbt -batch test > $OUT/test.log 2>&1
  echo "suite exit=$? $(grep 'Total number of tests run' $OUT/test.log | tail -1) steal=$(steal) $(date +%H:%M:%S)" >> $ST
else
  echo "suite SKIPPED (pre-chain run at this tree green)" >> $ST
fi

# 2. verify + ORACLE COMPARES FIRST (untimed; the r13 lesson)
rm -rf $OUT/v001 $OUT/v01 $OUT/vsf1 $OUT/vsf4
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $OUT/v001" > $OUT/v001.log 2>&1
echo "verify sf0.01 exit=$? $(date +%H:%M:%S)" >> $ST
python3 tools/compare_oracle.py /root/testdata/sf0.01 $OUT/v001 > $OUT/cmp001.txt 2>&1
echo "compare sf0.01 exit=$? $(tail -1 $OUT/cmp001.txt) $(date +%H:%M:%S)" >> $ST
sbt -batch "runMain graft.Verify /root/testdata/sf0.1 $OUT/v01" > $OUT/v01.log 2>&1
echo "verify sf0.1 exit=$? $(date +%H:%M:%S)" >> $ST
python3 tools/compare_oracle.py /root/testdata/sf0.1 $OUT/v01 > $OUT/cmp01.txt 2>&1
echo "compare sf0.1 exit=$? $(tail -1 $OUT/cmp01.txt) $(date +%H:%M:%S)" >> $ST
sbt -batch "runMain graft.Verify /tmp/sf1gen $OUT/vsf1 $SUBSET" > $OUT/vsf1.log 2>&1
echo "verify sf1 subset exit=$? $(date +%H:%M:%S)" >> $ST
sbt -batch "runMain graft.Verify /tmp/sf4gen $OUT/vsf4 $SUBSET" > $OUT/vsf4.log 2>&1
echo "verify sf4 subset exit=$? steal=$(steal) $(date +%H:%M:%S)" >> $ST
python3 tools/assemble_r14.py $OUT && commit_arts "chain correctness sf0.01+sf0.1"

# 3. TIMED: spark benches (fresh JVM per run; sf1 gets 5 reps)
for i in 1 2 3; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch 'runMain graft.Bench' 2>&1 | grep -o '{"metric".*}' >> $OUT/bench_sf01.jsonl
  echo "bench sf0.1 run $i done steal=$(steal) $(date +%H:%M:%S)" >> $ST
done
python3 tools/assemble_r14.py $OUT && commit_arts "spark sf0.1 bench"
for i in 1 2 3 4 5; do
  SPARK_GRAFT_SF_DIR=/tmp/sf1gen SPARK_GRAFT_BENCH_ONLY=$SUBSET sbt -batch 'runMain graft.Bench' 2>&1 | grep -o '{"metric".*}' >> $OUT/bench_sf1.jsonl
  echo "bench sf1 run $i done steal=$(steal) $(date +%H:%M:%S)" >> $ST
done
python3 tools/assemble_r14.py $OUT && commit_arts "spark sf1 bench (5 reps)"
for i in 1 2 3; do
  SPARK_GRAFT_SF_DIR=/tmp/sf4gen SPARK_GRAFT_BENCH_ONLY=$SUBSET sbt -batch 'runMain graft.Bench' 2>&1 | grep -o '{"metric".*}' >> $OUT/bench_sf4.jsonl
  echo "bench sf4 run $i done steal=$(steal) $(date +%H:%M:%S)" >> $ST
done
python3 tools/assemble_r14.py $OUT && commit_arts "spark sf4 bench"

# 4. TIMED: BenchAnn, 3 runs per SF
for sf in /root/testdata/sf0.1 /tmp/sf1gen /tmp/sf4gen; do
  for i in 1 2 3; do
    SPARK_GRAFT_SF_DIR=$sf sbt -batch 'runMain graft.BenchAnn' 2>&1 | grep -o '{"metric".*}' >> $OUT/bench_ann.jsonl
    echo "benchann $sf run $i done steal=$(steal) $(date +%H:%M:%S)" >> $ST
  done
done
python3 tools/assemble_r14.py $OUT && commit_arts "ann bench"

# 5. TIMED: DuckDB twins (sf0.1: 3-rep medians, mover flag vs r13
# committed; sf1/sf4: dump oracle results for the free-diff hash gate)
python3 tools/bench_duckdb.py /root/testdata/sf0.1 $OUT/v01 3 DUCKDB_BASELINE_r13.json > $OUT/duck_sf01.json 2> $OUT/duck_sf01.err
echo "duck sf0.1 exit=$? steal=$(steal) $(date +%H:%M:%S)" >> $ST
python3 tools/assemble_r14.py $OUT && commit_arts "duck sf0.1 twins"

SUB_SF1=$(echo $SUBSET | tr ',' '\n' | grep -v -E '^q102_fuzzy_join$' | paste -sd,)
python3 tools/bench_duckdb_subset.py /tmp/sf1gen $OUT/vsf1 $SUB_SF1 600 $OUT/duckdump_sf1 > $OUT/duck_sf1.json 2> $OUT/duck_sf1.err
echo "duck sf1 exit=$? steal=$(steal) $(date +%H:%M:%S)" >> $ST
python3 tools/compare_from_dump.py $OUT/vsf1 $OUT/duckdump_sf1 $SUBSET $OUT/duck_sf1.json q102_fuzzy_join > $OUT/cmpsf1.txt 2>&1
echo "compare sf1 exit=$? $(tail -1 $OUT/cmpsf1.txt) $(date +%H:%M:%S)" >> $ST
python3 tools/assemble_r14.py $OUT && commit_arts "duck sf1 twins + scale hash gate sf1"

SUB_SF4=$(echo $SUBSET | tr ',' '\n' | grep -v -E '^q102_fuzzy_join$|^q36_user_wcc$' | paste -sd,)
python3 tools/bench_duckdb_subset.py /tmp/sf4gen $OUT/vsf4 $SUB_SF4 600 $OUT/duckdump_sf4 > $OUT/duck_sf4.json 2> $OUT/duck_sf4.err
echo "duck sf4 exit=$? steal=$(steal) $(date +%H:%M:%S)" >> $ST
python3 tools/compare_from_dump.py $OUT/vsf4 $OUT/duckdump_sf4 $SUBSET $OUT/duck_sf4.json q102_fuzzy_join,q36_user_wcc > $OUT/cmpsf4.txt 2>&1
echo "compare sf4 exit=$? $(tail -1 $OUT/cmpsf4.txt) $(date +%H:%M:%S)" >> $ST
python3 tools/assemble_r14.py $OUT && commit_arts "duck sf4 twins + scale hash gate sf4"

echo "chain DONE steal=$(steal) $(date +%H:%M:%S)" >> $ST
