package graft

import org.apache.spark.sql.SparkSession

/** q32 SUMMARIZE end-to-end in the bench shape, 3 consecutive runs. */
object PerfProbe32c {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).foreach { f =>
        try spark.read.parquet(f.getPath).queryExecution.toRdd.count()
        catch { case _: Throwable => () }
      }
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries("q32_summarize_pg")(spark, d)
      val n = df.queryExecution.toRdd.count()
      OpCaches.releaseAll()
      println(f"PROBE32C run$i ${(System.nanoTime()-t0)/1e9}%7.2f s rows=$n")
    }
    spark.stop()
  }
}
