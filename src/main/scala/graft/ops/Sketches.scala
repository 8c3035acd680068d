package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequency sketches for corpus-scale token statistics.
  *
  * CountMin is the classic sublinear answer to "how often does each of a
  * 10⁹-token vocabulary appear in 100 TB of text": the sketch table is
  * `depth × width` counters — kilobytes, not the vocabulary — built in ONE
  * explode + groupBy pass (map-side combinable), and estimates are an
  * upper bound on the true count (collisions only ever ADD). Bucket
  * hashing is the SQL-portable md5 low-32 scheme ([[Dedup.portableHash64]]
  * family), so an independent engine replays the ENTIRE sketch — buckets,
  * counters, estimates — exactly; the oracle gate is a full value check,
  * not a statistical one.
  */
object Sketches {

  /** CountMin bucket for hash row `d`: low 32 md5 bits of "d:key",
    * reduced mod `width`. Non-negative by construction (the 32-bit half
    * can never fill a long's sign bit). */
  def cmBucket(key: Column, d: Int, width: Int): Column =
    pmod(conv(substring(md5(concat_ws(":", lit(d), key)), 9, 8), 16, 10)
      .cast("long"), lit(width.toLong))

  /** Build the depth×width CountMin counter table over whitespace tokens
    * of `textCol` (lowercased; empty/null documents contribute nothing).
    *
    * One explode over tokens × `depth` bucket rows, then one shuffle on
    * (d, bucket) — at most `depth × width` output rows however large the
    * corpus, with map-side partial aggregation doing almost all the
    * counting before the exchange.
    *
    * @return (d, bucket, cnt) — sparse: buckets that receive nothing
    *         have no row (estimate readers must coalesce to 0)
    */
  def countMinSketch(df: DataFrame, textCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16,
      s"depth must be in [1, 16] (got $depth)")
    require(width >= 2 && width <= (1 << 30),
      s"width must be in [2, 2^30] (got $width)")
    // hash per DISTINCT token, weighted by its occurrence count — the
    // per-occurrence form computed depth md5s for EVERY token instance
    // (40M hashes at the 10x point); counters are Σ count × [bucket
    // match], identical values. Per-document tf comes from the fused
    // byte-scan expression, so the corpus shuffle moves vocab-sized
    // partials only.
    val tokCounts = df
      .filter(col(textCol).isNotNull &&
        length(TextAnalysis.wsTrim(col(textCol))) > 0)
      .select(explode(graft.functions.TextFunctions.tf_from_text(
        col(textCol))).as("__e"))
      .select(col("__e.t").as("token"), col("__e.tf").as("__tf"))
      .groupBy("token").agg(sum("__tf").as("__n"))
    tokCounts
      .select(col("__n"), posexplode(array((0 until depth).map(d =>
        cmBucket(col("token"), d, width)): _*)))
      .groupBy(col("pos").as("d"), col("col").as("bucket"))
      .agg(sum("__n").as("cnt"))
  }

  /** Per-GROUP CountMin counter tables ([[countMinSketch]] keyed by a
    * group column): token-frequency sketch per domain/stratum/shard —
    * the "heavy hitters per source over 100 TB" shape. Still ONE
    * map-side-combinable shuffle (per-(group, token) tf partials, then
    * (grp, d, bucket) sums); at most groups × depth × width counter
    * rows however large the corpus, and sketches for the same group
    * from different partitions/days merge by the same sum.
    *
    * @return (grp, d, bucket, cnt) — sparse per group
    */
  def countMinSketchByGroup(df: DataFrame, groupCol: String,
      textCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16,
      s"depth must be in [1, 16] (got $depth)")
    require(width >= 2 && width <= (1 << 30),
      s"width must be in [2, 2^30] (got $width)")
    val tokCounts = df
      .filter(col(textCol).isNotNull &&
        length(TextAnalysis.wsTrim(col(textCol))) > 0)
      .select(col(groupCol).as("grp"),
        explode(graft.functions.TextFunctions.tf_from_text(
          col(textCol))).as("__e"))
      .select(col("grp"), col("__e.t").as("token"), col("__e.tf").as("__tf"))
      .groupBy("grp", "token").agg(sum("__tf").as("__n"))
    tokCounts
      .select(col("grp"), col("__n"), posexplode(array((0 until depth).map(
        d => cmBucket(col("token"), d, width)): _*)))
      .groupBy(col("grp"), col("pos").as("d"), col("col").as("bucket"))
      .agg(sum("__n").as("cnt"))
  }

  /** Point-query a per-group sketch: the [[countMinEstimate]] min over
    * the `depth` counters of the QUERY ROW'S OWN group — a token's
    * estimate never reads another group's counters. `queries` must
    * carry (grp, tokenCol).
    *
    * BOUNDED-BROADCAST assumption: the sketch is ≤ groups × depth ×
    * width NON-ZERO counter rows — broadcastable while the group count
    * is bounded (the sketch design point: depth×width counters replace
    * per-token exact counts precisely because they are small). If the
    * group count grows to where groups × depth × width rows no longer
    * fit a broadcast (~10⁷+ groups at the 4×64 default), drop the
    * broadcast hint below and let the planner shuffle-join on
    * (grp, d, bucket) — the hint is the only thing that changes.
    *
    * @return (grp, tokenCol, est) — per-group upper bounds
    */
  def countMinEstimateByGroup(sketch: DataFrame, queries: DataFrame,
      depth: Int, width: Int, tokenCol: String = "token"): DataFrame = {
    val buckets = queries
      .select(col("grp"), col(tokenCol),
        posexplode(array((0 until depth).map(d =>
          cmBucket(col(tokenCol), d, width)): _*)))
      .select(col("grp"), col(tokenCol), col("pos").as("d"),
        col("col").as("bucket"))
    buckets
      .join(broadcast(sketch), Seq("grp", "d", "bucket"), "left_outer")
      .groupBy("grp", tokenCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Point-query the sketch: CountMin estimate (min over the `depth`
    * counters) for each row of `queries(tokenCol)`. The sketch is tiny by
    * construction, so it broadcasts; the query set stays distributed.
    *
    * @return queries + (est: long) — an upper bound on the true count
    */
  def countMinEstimate(sketch: DataFrame, queries: DataFrame,
      depth: Int, width: Int, tokenCol: String = "token"): DataFrame = {
    val buckets = queries
      .select(col(tokenCol),
        posexplode(array((0 until depth).map(d =>
          cmBucket(col(tokenCol), d, width)): _*)))
      .select(col(tokenCol), col("pos").as("d"), col("col").as("bucket"))
    buckets
      .join(broadcast(sketch), Seq("d", "bucket"), "left_outer")
      .groupBy(tokenCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  // ===========================================================================
  // Bloom filter membership sketch
  // ===========================================================================

  /** Bloom bit position `i` for a key: the md5 digest is 128 bits = four
    * independent 32-bit fields, so positions 0-3 slice ONE digest and
    * only every 4th hash function pays another md5 (a corpus-side probe
    * computes k positions per gram — at k=4 this is 1 hash, not 4; the
    * 4-cmBucket form benched 10.3 s vs 1.7 s for the bare gram pass at
    * the 10x point). SQL-portable: substring offsets into the hex text. */
  def bloomPos(key: Column, i: Int, m: Int): Column =
    bloomPosFromHex(bloomHex(key, i / 4), i % 4, m)

  /** The `j`-th md5 digest of a key (j = 0 is the bare digest; further
    * digests prefix the key). Hot paths should materialize this as its
    * own column and slice fields with [[bloomPosFromHex]] — Spark's
    * subexpression elimination does NOT collapse the duplicate md5
    * inside k inlined [[bloomPos]] expressions (measured 2x on the
    * corpus probe). */
  def bloomHex(key: Column, j: Int): Column =
    if (j == 0) md5(key.cast("string"))
    else md5(concat_ws(":", lit(j), key.cast("string")))

  /** Bit position from digest field `f` in 0..3: 32 hex-sliced bits
    * mod m. */
  def bloomPosFromHex(hex: Column, f: Int, m: Int): Column =
    pmod(conv(substring(hex, 1 + 8 * f, 8), 16, 10).cast("long"),
      lit(m.toLong))

  /** Bloom filter SET BITS over a key column — the set-membership sketch
    * completing the family (CountMin: frequency, HLL: cardinality,
    * Bloom: membership). The classic 100 TB use: materialize a compact
    * "seen" set (benchmark n-grams, known-bad URLs, previously ingested
    * document hashes) once, then probe petabytes against it with NO join
    * against the original set — false positives at the standard
    * (1 - e^(-kn/m))^k rate, never false negatives.
    *
    * Bit positions are the same SQL-portable md5 scheme as CountMin
    * ([[bloomPos]] fields 0..k-1 mod m), so an independent engine replays
    * every set bit — the oracle gate is exact, not statistical. Build is
    * one explode + distinct: at most `m` output rows however large the
    * input (sparse: only SET bits have rows), map-side combinable.
    *
    * @return (pos: long) — DISTINCT set bit positions in [0, m)
    */
  def bloomBits(df: DataFrame, keyCol: Column, m: Int, k: Int): DataFrame = {
    require(k >= 1 && k <= 16, s"k must be in [1, 16] (got $k)")
    require(m >= 64 && m <= (1 << 30), s"m must be in [64, 2^30] (got $m)")
    df.filter(keyCol.isNotNull)
      .select(explode(array((0 until k).map(i =>
        bloomPos(keyCol, i, m)): _*)).as("pos"))
      .distinct()
  }

  /** Probe membership: for each DISTINCT non-null key of
    * `queries(keyCol)`, true iff ALL `k` bit positions are set
    * (maybe-present semantics — false positives possible, false
    * negatives not). NULL keys are dropped, mirroring [[bloomBits]]'s
    * build side (a null was never insertable, and concat_ws would
    * otherwise hash it as the bare depth string). The bit set is ≤ m
    * rows and broadcasts; the query side stays distributed, so probing
    * a 100 TB corpus against a fixed set is an exchange-free map join.
    *
    * @return one row per distinct non-null key:
    *         keyCol + (maybe_present: boolean)
    */
  def bloomContains(bits: DataFrame, queries: DataFrame, keyCol: String,
      m: Int, k: Int): DataFrame =
    queries
      .where(col(keyCol).isNotNull)
      .select(col(keyCol), explode(array((0 until k).map(i =>
        bloomPos(col(keyCol), i, m)): _*)).as("pos"))
      .join(broadcast(bits.withColumn("__hit", lit(1))), Seq("pos"), "left")
      .groupBy(keyCol)
      .agg((min(coalesce(col("__hit"), lit(0))) === 1).as("maybe_present"))

  /** One-row Bloom summary: set-bit count, fill fraction, the implied
    * false-positive rate at the CURRENT fill ((n_set/m)^k — the
    * operational number a pipeline monitors), and an exact md5 checksum
    * of the sorted bit positions so a replaying engine is value-gated on
    * every bit. NULL checksum on an empty filter (string_agg-over-zero-
    * rows parity, like [[hllSummary]]). */
  def bloomSummary(bits: DataFrame, m: Int, k: Int): DataFrame =
    bits.agg(
      count(lit(1)).as("n_set"),
      when(count(lit(1)) > 0,
        md5(array_join(transform(array_sort(collect_list(col("pos"))),
          p => p.cast("string")), ",")))
        .as("bits_md5"))
      .withColumn("m", lit(m.toLong))
      .withColumn("fill_frac", round(col("n_set") / lit(m.toDouble), 6))
      .withColumn("fp_rate",
        round(pow(col("n_set") / lit(m.toDouble), k), 6))
      .select(col("m"), col("n_set"), col("fill_frac"), col("fp_rate"),
        col("bits_md5"))

  // ===========================================================================
  // HyperLogLog distinct-count sketch
  // ===========================================================================

  /** HyperLogLog registers over an arbitrary key column: `(idx, rho)`
    * with `idx` in `[0, 2^b)` and `rho` = max over keys hashing to the
    * register of (leading zeros in the remaining hash bits + 1) — the
    * Flajolet et al. 2007 construction.
    *
    * The hash is the SQL-portable md5 scheme ([[Dedup.portableHash64]]
    * family) kept as two 32-bit halves so neither engine ever assembles
    * a value that can overflow a signed 64-bit shift: the register index
    * is the low `b` bits of the LOW half, and the rank field is the
    * remaining `64-b` bits `(hi << (32-b)) | (lo >> b)` — at most 2^56
    * for the minimum b=8, comfortably inside BIGINT on both engines.
    * Leading zeros come from `length(bin(w))` (minimal binary string in
    * both Spark and DuckDB), so an independent engine replays every
    * register value exactly.
    *
    * Scale shape: ONE map-side-combinable shuffle on `idx` — at most
    * 2^b output rows however large the input, and duplicates never need
    * a distinct pass because `max(rho)` absorbs them. This is the
    * "count distinct tokens in 100 TB" answer: kilobytes of state, one
    * narrow exchange, mergeable across partitions/days by the same
    * `max` (union two register sets and re-aggregate).
    */
  def hllRegisters(df: DataFrame, keyCol: Column, b: Int): DataFrame =
    df.select(hllIdxRho(keyCol, b).as("__ir"))
      .select(col("__ir.idx").as("idx"), col("__ir.rho").as("rho"))
      .groupBy("idx").agg(max("rho").as("rho"))

  /** Per-GROUP HLL registers ([[hllRegisters]] keyed by a group column):
    * distinct cardinality per domain/stratum/shard — the "distinct users
    * per segment over 100 TB" shape. Still ONE map-side-combinable
    * shuffle; at most groups × 2^b output rows; mergeable across
    * partitions/days by the same per-(group, idx) max. */
  def hllRegistersByGroup(df: DataFrame, groupCol: String, keyCol: Column,
      b: Int): DataFrame =
    df.select(col(groupCol).as("grp"), hllIdxRho(keyCol, b).as("__ir"))
      .select(col("grp"), col("__ir.idx").as("idx"),
        col("__ir.rho").as("rho"))
      .groupBy("grp", "idx").agg(max("rho").as("rho"))

  /** Per-group bias-corrected estimates from [[hllRegistersByGroup]]
    * output — the [[hllSummary]] arithmetic applied per group (same
    * grouped-by-rho float discipline, same linear-counting correction).
    *
    * @return (grp, nonzero_regs, sum_inv, est) per group
    */
  def hllEstimateByGroup(registers: DataFrame, b: Int): DataFrame = {
    require(b >= 8 && b <= 16, s"b must be in [8, 16] (got $b)")
    val m = 1L << b
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    registers.groupBy("grp", "rho")
      .agg(count(lit(1)).cast("double").as("cnt"))
      .groupBy("grp")
      .agg(coalesce(sum(col("cnt")), lit(0.0)).as("nz"),
        coalesce(sum(col("cnt") * pow(lit(2.0), -col("rho"))), lit(0.0))
          .as("inv_nz"))
      .select(col("grp"),
        col("nz").cast("long").as("nonzero_regs"),
        ((lit(m.toDouble) - col("nz")) + col("inv_nz")).as("sum_inv"),
        (lit(m) - col("nz").cast("long")).as("__zero"))
      .withColumn("__est_raw", lit(alpha * m * m) / col("sum_inv"))
      .select(col("grp"), col("nonzero_regs"),
        round(col("sum_inv"), 6).as("sum_inv"),
        round(when(col("__est_raw") <= lit(2.5 * m) && col("__zero") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("__zero")))
          .otherwise(col("__est_raw")), 4).as("est"))
  }

  /** The per-key `struct(idx, rho)` column of [[hllRegisters]] — shared
    * with the streaming twin so both compute identical registers from the
    * identical expression. One fused digest + bit-arithmetic pass
    * ([[graft.functions.HllIdxRhoExpr]]) — bit-identical to the previous
    * declarative `pmod(conv(substr(md5 …)))` / `length(bin(…))` column
    * pair (spec-pinned), which allocated a hex string, two parsed slices,
    * and a binary string per row; every oracle still replays the values
    * from the md5 hex. Callers materialize the struct in its OWN
    * projection and extract the fields in a second one (the
    * [[graft.ops.TextAnalysis.redactPii]] precedent) so the digest runs
    * once per row. Both fields are long on both twins: the streaming
    * register table must be schema-identical to the batch one (they
    * union/merge downstream). */
  def hllIdxRho(keyCol: Column, b: Int): Column = {
    require(b >= 8 && b <= 16, s"b must be in [8, 16] (got $b)")
    graft.functions.VectorFunctions.hll_idx_rho(keyCol.cast("string"), b)
  }

  /** One-row HLL summary from [[hllRegisters]] output: the standard
    * bias-corrected estimate with the small-range (linear counting)
    * correction, plus an exact md5 checksum of the full register state
    * so a replaying engine is value-gated on every register, not just
    * the rounded estimate.
    *
    * `sum_inv` adds the 2^-rho terms grouped BY rho first (≤ 57 distinct
    * values, each `cnt * 2^-rho` with cnt ≤ 2^b): the float sum runs
    * over a tiny ordered set, keeping cross-engine sum-order divergence
    * orders of magnitude below the 6-decimal round.
    *
    * @return (m, nonzero_regs, zero_regs, sum_inv, est_raw, est, regs_md5)
    */
  def hllSummary(registers: DataFrame, b: Int): DataFrame = {
    val m = 1L << b
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val byRho = registers.groupBy("rho")
      .agg(count(lit(1)).cast("double").as("cnt"))
    val agg = byRho.agg(
      coalesce(sum(col("cnt")), lit(0.0)).as("nz"),
      coalesce(sum(col("cnt") * pow(lit(2.0), -col("rho"))), lit(0.0))
        .as("inv_nz"))
    val sums = agg.select(
      col("nz").cast("long").as("nonzero_regs"),
      ((lit(m.toDouble) - col("nz")) + col("inv_nz")).as("sum_inv"))
    // NULL (not md5("")) on zero registers: the DuckDB twin's string_agg
    // over zero rows is NULL, so md5(NULL) is NULL — match that edge case.
    val check = registers.agg(
      when(count(lit(1)) > 0,
        md5(array_join(transform(
          array_sort(collect_list(struct(col("idx"), col("rho")))),
          s => concat_ws(":", s.getField("idx"), s.getField("rho"))), ",")))
        .as("regs_md5"))
    sums.crossJoin(check)
      .withColumn("m", lit(m))
      .withColumn("zero_regs", lit(m) - col("nonzero_regs"))
      .withColumn("est_raw",
        lit(alpha * m * m) / col("sum_inv"))
      .withColumn("est",
        when(col("est_raw") <= lit(2.5 * m) && col("zero_regs") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("zero_regs")))
          .otherwise(col("est_raw")))
      .select(col("m"), col("nonzero_regs"), col("zero_regs"),
        round(col("sum_inv"), 6).as("sum_inv"),
        round(col("est_raw"), 4).as("est_raw"),
        round(col("est"), 4).as("est"),
        col("regs_md5"))
  }
}
