package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

/** Generic perf probe: walls + JOB COUNTS for any declared queries —
  * `Test/runMain graft.PerfProbeAny <sfDir> <q1,q2,...> [reps]`.
  * Mirrors Bench's timing shape (toRdd.count, OpCaches released per
  * call) so rep 1 is the bench-comparable single-shot number and later
  * reps isolate the warm floor. */
object PerfProbeAny {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val qs = args.lift(1).getOrElse("q32_summarize_pg").split(",")
      .map(_.trim).filter(_.nonEmpty)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val s = SparkSession.builder().master("local[32]")
      .appName("probeAny")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
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
    // same warmup surface as Bench
    s.read.parquet(s"$d/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    TradeGraph.graft(s, d)
    for (q <- qs; i <- 1 to reps) {
      try time(s"$q $i")(SparkEntry.queries(q)(s, d)
        .queryExecution.toRdd.count())
      finally OpCaches.releaseAll()
    }
    s.stop()
  }
}
