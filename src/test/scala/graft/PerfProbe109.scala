package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway perf probe: q109 residual — where does the 0.45 s go?
  * (scan+collect floor vs the md5 draw expression vs job count). */
object PerfProbe109 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .appName("probe109")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label%-34s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
      r
    }
    val docs = s.read.parquet(s"$d/documents.parquet")
    time("warm scan")(docs.select("doc_id", "n_chars")
      .queryExecution.toRdd.count())
    for (i <- 1 to 3) {
      time(s"q109 full $i")(SparkEntry.queries("q109_sample_quantiles")(s, d)
        .queryExecution.toRdd.count())
      OpCaches.releaseAll()
    }
    for (i <- 1 to 2)
      time(s"q120 full $i") {
        SparkEntry.queries("q120_exact_quantiles")(s, d)
          .queryExecution.toRdd.count()
        OpCaches.releaseAll()
      }
    time("probe: plain collect")(docs.filter(col("doc_id").isNotNull &&
      col("n_chars").isNotNull)
      .select(col("n_chars").cast("double")).limit(2000001).collect().length)
    time("probe: md5 filter collect")(docs.filter(col("doc_id").isNotNull &&
      col("n_chars").isNotNull &&
      graft.ops.Sampling.hashUnit(col("doc_id")) < lit(0.2))
      .select(col("n_chars").cast("double")).limit(2000001).collect().length)
    time("probe: md5 no-limit count")(docs.filter(col("doc_id").isNotNull &&
      col("n_chars").isNotNull &&
      graft.ops.Sampling.hashUnit(col("doc_id")) < lit(0.2))
      .select(col("n_chars").cast("double")).queryExecution.toRdd.count())
    s.stop()
  }
}
