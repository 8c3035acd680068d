package graft

import org.apache.spark.sql.SparkSession

/** Throwaway perf probe (test scope): q55 bench-shape executed-plan dump —
  * is the per-level frontier×edges join broadcast (frontier small) or a
  * full sort-merge shuffle of the 4M-edge side? */
object PerfProbe55b {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf4gen")
    val s = SparkSession.builder().master("local[32]")
      .appName("probe55b")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    // warm the edge-index memo like the bench warmup does
    val df0 = SparkEntry.queries("q55_user_kshortest")(s, d)
    df0.queryExecution.toRdd.count()
    OpCaches.releaseAll()
    val df = SparkEntry.queries("q55_user_kshortest")(s, d)
    val t0 = System.nanoTime()
    df.queryExecution.toRdd.count()
    println(f"PROBE q55 bench-shape ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    println(df.queryExecution.executedPlan.toString.take(12000))
    s.stop()
  }
}
