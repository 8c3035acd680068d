package graft

import org.apache.spark.sql.SparkSession

/** Throwaway probe: warm-vs-cold for the round-7 third-session queries. */
object PerfProbeNew {
  import PerfProbe.time
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .appName("probeNew")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s.read.parquet(s"$d/lineitem.parquet").count()
    TradeGraph.graft(s, d)
    for (q <- Seq("q114_copurchase")) {
      time(s"$q cold")(
        SparkEntry.queries(q)(s, d).queryExecution.toRdd.count())
      time(s"$q warm")(
        SparkEntry.queries(q)(s, d).queryExecution.toRdd.count())
    }
    for (q <- Seq("q100_asof_join", "q101_range_join"))
      println(s"=== $q plan ===\n" +
        SparkEntry.queries(q)(s, d).queryExecution.executedPlan.toString
          .linesIterator.filter(l => l.contains("Exchange") ||
            l.contains("Join") || l.contains("Window") ||
            l.contains("Cartesian") || l.contains("Loop"))
          .mkString("\n"))
  }
}
