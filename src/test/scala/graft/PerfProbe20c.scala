package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway perf probe (test scope): starvation sweep part 2 — the
  * pure-projection text queries (q22 stats+langid, q23 fingerprint,
  * q63 chunking, q71 repetition) as-is vs over a pre-spread input. */
object PerfProbe20c {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1gen")
    val s = SparkSession.builder().master("local[32]")
      .appName("probe20c")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val docs = s.read.parquet(s"$d/documents.parquet")
    docs.select(length(col("text"))).agg(sum("length(text)")).collect()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $label%-20s ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$n")
    }
    val ta = graft.ops.TextAnalysis
    def q22(in: org.apache.spark.sql.DataFrame) =
      in.select(col("doc_id"), ta.tokenCount(col("text")).as("n_tokens"),
        round(ta.punctRatio(col("text")), 6).as("p"),
        round(ta.stopwordRatio(col("text")), 6).as("sw"),
        ta.langId(col("text")).as("lang"))
    def q23(in: org.apache.spark.sql.DataFrame) =
      in.select(col("doc_id"), ta.fingerprintMd5(col("text")).as("fp"))
    def q63(in: org.apache.spark.sql.DataFrame) =
      ta.chunkTokens(in, "text", chunkSize = 64, stride = 48)
        .select(col("doc_id"), col("chunk_idx"), md5(col("chunk_text")))
    def q71(in: org.apache.spark.sql.DataFrame) =
      ta.repetitionStats(in.withColumn("text",
        replace(col("text"), lit(" batch "), lit("\n"))), "doc_id", "text")
    val spread = docs.repartition(s.sparkContext.defaultParallelism)
    for ((name, f) <- Seq[(String,
        org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)](
        ("q22", q22 _), ("q23", q23 _), ("q63", q63 _), ("q71", q71 _))) {
      time(s"$name as-is")(f(docs).queryExecution.toRdd.count())
      time(s"$name as-is rep2")(f(docs).queryExecution.toRdd.count())
      time(s"$name spread")(f(spread).queryExecution.toRdd.count())
    }
    s.stop()
  }
}
