package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object PerfProbe114b {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1gen")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val kept = spark.read.parquet(s"$d/orders.parquet")
      .join(spark.read.parquet(s"$d/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").cast("long").as("u"),
        col("l_partkey").cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull)
      .distinct().select(col("u").as("id"), col("v")).persist()
    println(s"rows=${kept.count()}")

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val out = df.queryExecution.toRdd.count()
      println(f"PROBE $name%-28s ${(System.nanoTime()-t0)/1e9}%7.2f s rows=$out")
    }
    def packedJoin = kept.as("x").hint("SHUFFLE_HASH")
      .join(kept.as("y").hint("SHUFFLE_HASH"),
        col("x.v") === col("y.v") && col("x.id") < col("y.id"))
      .select((shiftleft(col("x.id"), 32).bitwiseOR(col("y.id"))).as("pk"))

    time("repart-agg-aqe")(packedJoin.repartition(96, col("pk"))
      .groupBy("pk").agg(count(lit(1)).as("w")).filter(col("w") >= 5))
    time("repart-agg-aqe-2nd")(packedJoin.repartition(96, col("pk"))
      .groupBy("pk").agg(count(lit(1)).as("w")).filter(col("w") >= 5))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("repart-agg-noaqe")(packedJoin.repartition(96, col("pk"))
      .groupBy("pk").agg(count(lit(1)).as("w")).filter(col("w") >= 5))
    time("packed-agg-32-noaqe")(packedJoin.groupBy("pk")
      .agg(count(lit(1)).as("w")).filter(col("w") >= 5))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    time("packed-agg-32-aqe-again")(packedJoin.groupBy("pk")
      .agg(count(lit(1)).as("w")).filter(col("w") >= 5))
    spark.stop()
  }
}
