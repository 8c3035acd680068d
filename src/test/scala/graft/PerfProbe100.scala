package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

/** Throwaway perf probe: q100 self-asof wall attribution at sf1 —
  * scan vs shuffle+window vs job floor. */
object PerfProbe100 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1gen")
    val s = SparkSession.builder().master("local[32]")
      .appName("probe100")
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
    time("events scan count")(
      TradeGraph.events(s, d).queryExecution.toRdd.count())
    time("filtered scan count")(
      TradeGraph.events(s, d).withColumn("ms", expr("ts DIV 1000000"))
        .filter(col("event_type").isin("purchase", "click"))
        .select(col("user_id"), col("ms"), col("event_type"),
          col("event_id")).queryExecution.toRdd.count())
    for (i <- 1 to 3) {
      time(s"q100 run $i")(SparkEntry.queries("q100_asof_join")(s, d)
        .queryExecution.toRdd.count())
      OpCaches.releaseAll()
    }
    for (i <- 1 to 2) {
      time(s"q106 run $i")(SparkEntry.queries("q106_asof_forward")(s, d)
        .queryExecution.toRdd.count())
      OpCaches.releaseAll()
    }
    println(SparkEntry.queries("q100_asof_join")(s, d)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    s.stop()
  }
}
