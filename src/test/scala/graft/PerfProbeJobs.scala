package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Job-ATTRIBUTION probe: prints every Spark job's call site while a
  * declared query runs, so a "N jobs per call" ladder can be broken
  * down job by job —
  * `Test/runMain graft.PerfProbeJobs <sfDir> <q1,q2,...> [reps]`. */
object PerfProbeJobs {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val qs = args.lift(1).getOrElse("q93_cross_space_acyclic").split(",")
      .map(_.trim).filter(_.nonEmpty)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val s = SparkSession.builder().master("local[32]")
      .appName("probeJobs")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    @volatile var log = false
    val sb = new java.lang.StringBuilder
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (log) sb.synchronized {
          val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
          val sql = Option(j.properties)
            .map(_.getProperty("spark.sql.execution.id", "-")).getOrElse("-")
          sb.append(f"  job ${j.jobId}%4d stages=${j.stageIds.length}%2d " +
            s"sql=$sql $site\n")
        }
    })
    // same warmup surface as Bench
    s.read.parquet(s"$d/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    TradeGraph.graft(s, d)
    for (q <- qs; i <- 1 to reps) {
      sb.setLength(0); log = true
      val t0 = System.nanoTime()
      try SparkEntry.queries(q)(s, d).queryExecution.toRdd.count()
      finally { log = false; OpCaches.releaseAll() }
      println(f"PROBE $q rep $i ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      println(sb.toString)
    }
    s.stop()
  }
}
