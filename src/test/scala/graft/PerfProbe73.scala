package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway perf probe (test scope): starvation sweep part 3 —
  * decontamination (q73/q95) and token-id encoding (q108), as-is vs
  * pre-spread inputs. */
object PerfProbe73 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1gen")
    val s = SparkSession.builder().master("local[32]")
      .appName("probe73")
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
    val bucket = graft.ops.Sampling.hashBucket(col("doc_id"))
    def run(in: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      for (r <- 1 to 2)
        time(s"q73 $tag $r")(ta.decontaminate(in.filter(bucket >= 5),
          in.filter(bucket < 5), "doc_id", "text", n = 4)
          .queryExecution.toRdd.count())
      for (r <- 1 to 2)
        time(s"q95 $tag $r")(ta.decontaminateBloom(in.filter(bucket >= 5),
          in.filter(bucket < 5), "doc_id", "text", n = 4)
          .queryExecution.toRdd.count())
      for (r <- 1 to 2)
        time(s"q108 $tag $r") {
          val vocab = ta.buildVocab(in, "text", size = 20)
          ta.encodeTokens(in, "doc_id", "text", vocab)
            .queryExecution.toRdd.count()
        }
    }
    run(docs, "as-is")
    run(docs.repartition(s.sparkContext.defaultParallelism), "spread")
    s.stop()
  }
}
