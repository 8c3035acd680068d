package graft

import org.apache.spark.sql.SparkSession

/** Paired A/B of q114's distributed branches on one box/session:
  * r14 blocked-join plan vs the r15 packed streaming kernel —
  * `Test/runMain graft.PerfProbe114d <sfDir> [reps]`. */
object PerfProbe114d {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf4gen")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$d/orders.parquet").queryExecution.toRdd.count()
    spark.read.parquet(s"$d/lineitem.parquet").queryExecution.toRdd.count()
    def steal(): Long = {
      val l = scala.io.Source.fromFile("/proc/stat").getLines().next()
      l.split("\\s+")(8).toLong
    }
    for (i <- 1 to reps; kernel <- Seq(true, false)) {
      spark.conf.set("spark.graft.copurchase.distKernel", kernel.toString)
      val s0 = steal()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("q114_copurchase")(spark, d)
        .queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      OpCaches.releaseAll()
      println(f"PROBE114D rep$i kernel=$kernel $dt%7.2f s rows=$n " +
        f"steal=${steal() - s0}")
    }
    spark.stop()
  }
}
