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
    * `keyCol` must hold UNIQUE values (it is the document key). The
    * running sum orders by (key, token) — duplicate keys with equal token
    * counts land in the same shard and are interchangeable for packing,
    * so the assigned BLOCK NUMBERS stay deterministic, but which physical
    * row gets which block is tie-broken arbitrarily; keep keys unique if
    * other columns ride along.
    *
    * `shards = 0` (the default) derives the shard count from the input's
    * partitioning (`max(32, input partitions)`): each shard is one window
    * task, so a fixed default would funnel 1/32 of a 100 TB corpus
    * through a single task no matter how wide the cluster is. Pass an
    * explicit count when block-boundary stability across differently
    * partitioned inputs matters (shard = hash(key) % shards, so the
    * count is part of the layout contract).
    *
    * @return input plus (shard, block) columns
    */
  def packBlocks(df: DataFrame, keyCol: String, tokenCol: String,
      blockTokens: Long, shards: Int = 0): DataFrame = {
    require(blockTokens > 0, "blockTokens must be positive")
    require(shards >= 0, "shards must be >= 0 (0 = derive from input)")
    require(!df.columns.contains("shard") && !df.columns.contains("block"),
      "input already has a 'shard' or 'block' column — rename it first " +
        "(packBlocks would silently overwrite it)")
    // df.rdd here is LAZY plan construction (no job runs): it is the one
    // API that answers "how parallel is this input" so the default shard
    // count scales with the data. executedPlan.outputPartitioning is
    // UnknownPartitioning(0) for unbucketed scans and a conf default
    // would not grow with the input, so both suggested alternatives
    // change the documented contract.
    val nShards =
      if (shards > 0) shards else math.max(32, df.rdd.getNumPartitions)
    val w = Window.partitionBy("shard").orderBy(col(keyCol), col(tokenCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", Sampling.hashBucket(col(keyCol), nShards))
      .withColumn("__start",
        sum(col(tokenCol)).over(w) - col(tokenCol))
      .withColumn("block",
        floor(col("__start") / lit(blockTokens.toDouble)).cast("long"))
      .drop("__start")
  }
}
