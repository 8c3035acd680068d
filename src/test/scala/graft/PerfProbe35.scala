package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.graph.PathFinder

/** Throwaway probe: q35 stage attribution (test scope). */
object PerfProbe35 {
  import PerfProbe.time
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1gen")
    val s = SparkSession.builder().master("local[32]")
      .appName("probe35")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    time("events scan")(TradeGraph.events(s, d).count())
    val edges = TradeGraph.userEdges(s, d)
    time("userEdges build")(println("edges=" + edges.count()))
    time("userEdges again")(edges.count())
    val seeds = TradeGraph.events(s, d).select(col("user_id").as("id"))
      .filter(col("id") < 50).distinct()
    time("seeds")(seeds.count())
    time("bfs 1")(PathFinder.bfsDistances(s, edges, seeds, Some(2L))
      .queryExecution.toRdd.count())
    time("bfs 2")(PathFinder.bfsDistances(s, edges, seeds, Some(2L))
      .queryExecution.toRdd.count())
    val seeds5 = TradeGraph.events(s, d).select(col("user_id").as("id"))
      .filter(col("id") < 5).distinct()
    time("kshortest 1")(PathFinder.kShortestPaths(s, edges, seeds5,
      1L, Some(2L), graft.pgq.PathMode.Walk, k = 2)
      .queryExecution.toRdd.count())
    time("kshortest 2")(PathFinder.kShortestPaths(s, edges, seeds5,
      1L, Some(2L), graft.pgq.PathMode.Walk, k = 2)
      .queryExecution.toRdd.count())
  }
}
