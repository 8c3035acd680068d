package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Size-gated distributed-branch bench for the round-7 fourth-session
  * graph kernels (walks, label propagation, betweenness, temporal
  * earliest-arrival) on a user graph ABOVE the 2M-edge local gate —
  * the kernels route distributed by SIZE, no env override. Prints one
  * JSON line per the BENCH_DIST convention. */
object DistBenchProbe {
  import PerfProbe.time
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/events40")
    val s = SparkSession.builder().master("local[32]")
      .appName("distBench2")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import graft.graph.Algorithms

    val e = TradeGraph.userEdges(s, d)
    val te = TradeGraph.userTemporalEdges(s, d)
    val nEdges = e.count()
    val v = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val nV = v.count()
    println(s"""{"edges":$nEdges,"vertices":$nV}""")
    val starts = v.filter(col("id") % 120 === 0)
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    def bench(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      val sec = (System.nanoTime() - t0) / 1e9
      results(name) = math.round(sec * 1000) / 1000.0
      println(s"""{"q":"$name","sec":${results(name)},"rows":$n}""")
    }
    bench("walks_dist")(
      Algorithms.deterministicWalks(starts, e, walksPerStart = 2,
        steps = 8).count())
    bench("lpa_dist")(
      Algorithms.labelPropagation(v, e, rounds = 3).count())
    bench("betweenness_dist_8src")(
      Algorithms.betweennessCentrality(v, e,
        sources = Some(starts.limit(8))).count())
    bench("earliest_arrival_dist") {
      val minRow = te.agg(min("ts")).head()
      val t0v = if (minRow.isNullAt(0)) 0L else minRow.getLong(0)
      Algorithms.earliestArrival(te,
        starts.limit(20), t0v, maxHops = 4).count()
    }
    val qs = results.map { case (k, x) => s""""$k":$x""" }.mkString(",")
    println(s"""{"metric":"dist_kernels2","edges":$nEdges,"queries":{$qs}}""")
  }
}
