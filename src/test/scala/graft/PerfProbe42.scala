package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

/** Throwaway perf probe (test scope): q42 3-hop big-table MATCH at the
  * sf1 slope point — join order / broadcast audit (r13 verdict item 2). */
object PerfProbe42 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1gen")
    val s = SparkSession.builder().master("local[32]")
      .appName("probe42")
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
    val df = SparkEntry.queries("q42_match_3hop_big")(s, d)
    if (args.length > 1 && args(1) == "explain") {
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    time("q42 first")(df.queryExecution.toRdd.count())
    OpCaches.releaseAll()
    time("q42 second")(SparkEntry.queries("q42_match_3hop_big")(s, d)
      .queryExecution.toRdd.count())
    OpCaches.releaseAll()
    time("q42 third")(SparkEntry.queries("q42_match_3hop_big")(s, d)
      .queryExecution.toRdd.count())
    OpCaches.releaseAll()
    s.stop()
  }
}
