package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

/** Throwaway perf probe: q92/q93 end-to-end walls + JOB COUNTS at
  * sf0.1 — the r13 verdict's "enumeration job ladder" attribution. */
object PerfProbe92 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .appName("probe92")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    def time[A](label: String)(f: => A): A = {
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s " +
        f"jobs=${jobs.get() - j0}%3d")
      r
    }
    s.read.parquet(s"$d/nation.parquet").count()
    TradeGraph.graft(s, d)
    for (q <- Seq("q92_mixed_space_path", "q93_cross_space_acyclic");
         i <- 1 to 3) {
      time(s"$q $i")(SparkEntry.queries(q)(s, d)
        .queryExecution.toRdd.count())
      OpCaches.releaseAll()
    }
    s.stop()
  }
}
