package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Throwaway perf probe (test scope): partition-starvation sweep for the
  * CPU-heavy per-row signature passes (NOTES round-11 lead 5) — q20
  * minhash-LSH, q21 simhash, q60 subword counts. Prints the planned
  * input splits of the documents scan, then times each query as-is vs
  * with a forced round-robin spread of the scan, at the given sf dir. */
object PerfProbe20b {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1gen")
    val s = SparkSession.builder().master("local[32]")
      .appName("probe20b")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val docs = s.read.parquet(s"$d/documents.parquet")
    println(s"documents scan splits: ${docs.queryExecution.toRdd.getNumPartitions}" +
      s" (defaultParallelism ${s.sparkContext.defaultParallelism})")
    docs.count() // first-touch
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $label%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$n")
    }
    for (q <- Seq("q20_dedup_minhash", "q21_dedup_simhash",
        "q60_subword_tokens")) {
      time(s"$q as-is")(
        SparkEntry.queries(q)(s, d).queryExecution.toRdd.count())
      OpCaches.releaseAll()
      time(s"$q rep2")(
        SparkEntry.queries(q)(s, d).queryExecution.toRdd.count())
      OpCaches.releaseAll()
    }
    // spread variants: register a spread view? cheapest: time the raw op
    // over a pre-spread input frame
    val spread = docs.repartition(s.sparkContext.defaultParallelism)
    time("q20 op over spread input")(
      graft.ops.Dedup.minHashLshPairs(spread, "doc_id", "text",
        shingleK = 3, numHashes = 16, bands = 4, threshold = 0.7)
        .queryExecution.toRdd.count())
    OpCaches.releaseAll()
    time("q21 op over spread input")(
      graft.ops.Dedup.simHashPairs(spread, "doc_id", "text", maxDist = 3)
        .queryExecution.toRdd.count())
    OpCaches.releaseAll()
    time("q60 op over spread input")(
      spread.select(col("doc_id"),
        graft.ops.TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        graft.ops.TextAnalysis.subwordCount(col("text")).as("n_subwords"))
        .queryExecution.toRdd.count())
    s.stop()
  }
}
