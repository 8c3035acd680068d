package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-token-budget blocks — the
  * step that turns a curated corpus into training-shaped batches.
  *
  * Greedy first-fit packing is inherently sequential; the scalable form
  * packs WITHIN deterministic shards: each document hashes to a shard
  * ([[Sampling.hashBucket]] — stable across engines and reruns), and a
  * per-shard running token total assigns block numbers. The only window
  * runs per shard, so parallelism = shard count and no single task ever
  * sees more than 1/shards of the corpus — the global-cumsum form would
  * funnel 100 TB through one task. Start-offset assignment: a document
  * lands in the block its START offset falls in, so an oversized doc
  * overflows its block's budget (it is never dropped or split here —
  * chunk first via `TextAnalysis.chunkTokens` if hard caps matter) and
  * the following block numbers in that shard are skipped.
  */
object Packing {

  /** Assign each row a (shard, block) so each block's token sum stays near
    * `blockTokens`: block = floor(start_offset / blockTokens) with
    * start_offset = running sum of previous docs in the shard (ordered by
    * key).
    *
    * `keyCol` must hold UNIQUE values (it is the document key): the
    * running sum orders by it alone, so duplicate keys would make tie
    * order — and therefore block boundaries — nondeterministic across
    * reruns, which is exactly what this module must never be.
    *
    * @return input plus (shard, block) columns
    */
  def packBlocks(df: DataFrame, keyCol: String, tokenCol: String,
      blockTokens: Long, shards: Int = 32): DataFrame = {
    require(blockTokens > 0, "blockTokens must be positive")
    require(shards > 0, "shards must be positive")
    require(!df.columns.contains("shard") && !df.columns.contains("block"),
      "input already has a 'shard' or 'block' column — rename it first " +
        "(packBlocks would silently overwrite it)")
    val w = Window.partitionBy("shard").orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", Sampling.hashBucket(col(keyCol), shards))
      .withColumn("__start",
        sum(col(tokenCol)).over(w) - col(tokenCol))
      .withColumn("block",
        floor(col("__start") / lit(blockTokens.toDouble)).cast("long"))
      .drop("__start")
  }
}
