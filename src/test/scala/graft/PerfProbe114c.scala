package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Times the production q114 path end-to-end (cold per run, bench
  * shape) after the packed repartition-first aggregation change. */
object PerfProbe114c {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1gen")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup parity with Bench: touch tables
    spark.read.parquet(s"$d/orders.parquet").queryExecution.toRdd.count()
    spark.read.parquet(s"$d/lineitem.parquet").queryExecution.toRdd.count()
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries("q114_copurchase")(spark, d)
      val n = df.queryExecution.toRdd.count()
      OpCaches.releaseAll()
      println(f"PROBE114C run$i ${(System.nanoTime()-t0)/1e9}%7.2f s rows=$n")
    }
    spark.stop()
  }
}
