package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Throwaway probe: q18 window-shape vs dup-map join shape (test scope). */
object PerfProbe18 {
  import PerfProbe.time
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1gen")
    val s = SparkSession.builder().master("local[32]")
      .appName("probe18")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L<<20).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val docs = s.read.parquet(s"$d/documents.parquet")
    time("scan warmup")(docs.select("text").queryExecution.toRdd.count())
    time("hash only")(docs.select(Dedup.exactKey(col("text"))).count())
    def windowShape() = {
      val w = Window.partitionBy("__key")
      docs.withColumn("__key", Dedup.exactKey(col("text")))
        .withColumn("canonical_id",
          when(col("__key").isNull, col("doc_id"))
            .otherwise(min(col("doc_id")).over(w)))
        .withColumn("is_duplicate", col("doc_id") =!= col("canonical_id"))
        .drop("__key")
        .select("doc_id", "canonical_id", "is_duplicate")
    }
    // duplicates-only map join: skinny (key,id) agg, dup rows only,
    // joined back on id (AQE broadcasts the dup map when small)
    def dupMapShape() = {
      val skinny = docs.select(col("doc_id"),
        Dedup.exactKey(col("text")).as("__key"))
        .filter(col("__key").isNotNull)
      val canon = skinny.groupBy("__key")
        .agg(min(col("doc_id")).as("__canon"))
      val dups = skinny.join(canon, Seq("__key"))
        .filter(col("doc_id") =!= col("__canon"))
        .select(col("doc_id"), col("__canon"))
      docs.join(dups, Seq("doc_id"), "left")
        .withColumn("canonical_id", coalesce(col("__canon"), col("doc_id")))
        .withColumn("is_duplicate", col("doc_id") =!= col("canonical_id"))
        .select("doc_id", "canonical_id", "is_duplicate")
    }
    for (r <- 1 to 3) {
      time(s"window shape $r")(windowShape().queryExecution.toRdd.count())
      time(s"dupmap shape $r")(dupMapShape().queryExecution.toRdd.count())
    }
  }
}
