package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

/** Throwaway perf probe (test scope, not shipped): job-count and wall
  * attribution for the composite-path family (q66-q77) — each runs ~2 s
  * on tiny fixture graphs, i.e. pure overhead, not data. */
object PerfProbe77 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .appName("probe77")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val sites = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        sites.add(j.stageInfos.map(si => si.name).mkString("|"))
      }
    })
    def probe(name: String): Unit = {
      // fresh-session compile each time, like the bench
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(s, d)
      val t1 = System.nanoTime()
      df.queryExecution.toRdd.count()
      val t2 = System.nanoTime()
      println(f"PROBE $name%-30s compile=${(t1 - t0) / 1e9}%6.2f s " +
        f"exec=${(t2 - t1) / 1e9}%6.2f s jobs=${jobs.get() - j0}%3d")
    }
    val names = Seq("q77_composite_mixed_acyclic", "q76_composite_mixed_path",
      "q68_composite_trail_enum", "q66_composite_path_vertices",
      "q69_prefix_trail_k", "q70_prefix_acyclic_all", "q11_varlen",
      "q17_lcc", "q48_persisted_pg")
    names.foreach(probe)
    println("---- second pass (warm) ----")
    sites.clear()
    probe("q77_composite_mixed_acyclic")
    import scala.jdk.CollectionConverters._
    sites.asScala.groupBy(identity).toSeq.sortBy(-_._2.size)
      .foreach { case (k, v) => println(f"  JOBSITE ${v.size}%3d  $k") }
    names.drop(1).foreach(probe)
    s.stop()
  }
}
