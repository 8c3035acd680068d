package graft

import org.apache.spark.sql.SparkSession

/** Throwaway probe: where does q93's 2.9 s go on a 25-row graph?
  * Poor-man's sampling profiler over the build phase. */
object PerfProbe93 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .appName("probe93")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s.read.parquet(s"$d/lineitem.parquet").count()
    TradeGraph.graft(s, d)
    // warm once
    SparkEntry.queries("q93_cross_space_acyclic")(s, d)
    OpCaches.releaseAll()
    val main = Thread.currentThread()
    val samples = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var run = true
    val sampler = new Thread(() => {
      while (run) {
        val st = main.getStackTrace
        // first graft frame + its caller chain (3 graft frames)
        val gs = st.filter(f => f.getClassName.startsWith("graft")).take(3)
          .map(f => f.getClassName.stripPrefix("graft.") + "." +
            f.getMethodName + ":" + f.getLineNumber).mkString(" <- ")
        val key = if (gs.isEmpty) "(no graft frame) " +
          st.take(2).map(_.toString).mkString(" <- ") else gs
        samples.merge(key, 1, (a, b) => a + b)
        Thread.sleep(20)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    val t0 = System.nanoTime()
    val df = SparkEntry.queries("q93_cross_space_acyclic")(s, d)
    val t1 = System.nanoTime()
    run = false
    println(f"PROBE93 build=${(t1-t0)/1e9}%.2f s")
    import scala.jdk.CollectionConverters._
    samples.asScala.toSeq.sortBy(-_._2).take(20).foreach { case (k, n) =>
      println(f"PROBE93 $n%4d  $k")
    }
  }
}
