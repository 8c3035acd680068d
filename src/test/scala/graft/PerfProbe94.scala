package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway perf probe (test scope): q94 duplicated-spans — is the
  * 22 s sf4 wall the shuffle pipeline or a starved ngram-explode scan
  * stage? As-is vs pre-spread input at the given sf dir. */
object PerfProbe94 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1gen")
    val s = SparkSession.builder().master("local[32]")
      .appName("probe94")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val docs = s.read.parquet(s"$d/documents.parquet")
    docs.select(sum(length(col("text")))).collect()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $label%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$n")
    }
    val ta = graft.ops.TextAnalysis
    for (r <- 1 to 2)
      time(s"q94 as-is $r")(
        ta.duplicatedSpans(docs, "doc_id", "text", n = 5, minDocs = 2)
          .queryExecution.toRdd.count())
    val spread = docs.repartition(s.sparkContext.defaultParallelism)
    for (r <- 1 to 2)
      time(s"q94 spread $r")(
        ta.duplicatedSpans(spread, "doc_id", "text", n = 5, minDocs = 2)
          .queryExecution.toRdd.count())
    s.stop()
  }
}
