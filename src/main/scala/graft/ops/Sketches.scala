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
    val toks = df
      .filter(col(textCol).isNotNull &&
        length(TextAnalysis.wsTrim(col(textCol))) > 0)
      .select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("token"))
    toks
      .select(posexplode(array((0 until depth).map(d =>
        cmBucket(col("token"), d, width)): _*)))
      .groupBy(col("pos").as("d"), col("col").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
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
}
