package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

/** Throwaway perf probe (test scope): q35/q55 wall attribution at the
  * sf1 slope point — cold scan vs collect vs kernel vs result build. */
object PerfProbe55 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1gen")
    val s = SparkSession.builder().master("local[32]")
      .appName("probe55")
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
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s " +
        f"jobs=${jobs.get() - j0}%3d")
      r
    }
    time("events scan")(TradeGraph.events(s, d).count())
    time("userEdges count")(TradeGraph.userEdges(s, d).count())
    time("q35 first")(SparkEntry.queries("q35_user_bfs")(s, d)
      .queryExecution.toRdd.count())
    time("q35 second")(SparkEntry.queries("q35_user_bfs")(s, d)
      .queryExecution.toRdd.count())
    time("q55 first")(SparkEntry.queries("q55_user_kshortest")(s, d)
      .queryExecution.toRdd.count())
    time("q55 second")(SparkEntry.queries("q55_user_kshortest")(s, d)
      .queryExecution.toRdd.count())
    // bench shape: operator caches die with the query (Bench releaseAll)
    // but the session-scoped edge-index memo survives — this is the
    // number the BENCH reps actually see
    OpCaches.releaseAll()
    time("q55 bench-shape")(SparkEntry.queries("q55_user_kshortest")(s, d)
      .queryExecution.toRdd.count())
    OpCaches.releaseAll()
    time("q35 bench-shape")(SparkEntry.queries("q35_user_bfs")(s, d)
      .queryExecution.toRdd.count())
    time("q36 wcc")(SparkEntry.queries("q36_user_wcc")(s, d)
      .queryExecution.toRdd.count())
    time("q83 tri")(SparkEntry.queries("q83_triangles")(s, d)
      .queryExecution.toRdd.count())
    s.stop()
  }
}
