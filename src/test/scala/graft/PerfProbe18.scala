package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Throwaway probe: q18 window-shape vs skinny-join shape (test scope). */
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
    time("scan warmup")(docs.count())
    time("hash only")(docs.select(Dedup.exactKey(col("text"))).count())
    def windowShape() = {
      val w = Window.partitionBy("__key")
      docs.withColumn("__key", Dedup.exactKey(col("text")))
        .withColumn("canonical_id",
          when(col("__key").isNull, col("doc_id"))
            .otherwise(min(col("doc_id")).over(w)))
        .withColumn("is_duplicate", col("doc_id") =!= col("canonical_id"))
        .drop("__key")
    }
    def skinnyShape() = Dedup.exactGroups(docs, "doc_id", "text")
    time("window shape 1")(windowShape().queryExecution.toRdd.count())
    time("window shape 2")(windowShape().queryExecution.toRdd.count())
    time("skinny shape 1")(skinnyShape().queryExecution.toRdd.count())
    time("skinny shape 2")(skinnyShape().queryExecution.toRdd.count())
  }
}
