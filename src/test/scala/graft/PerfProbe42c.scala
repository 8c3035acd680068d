package graft

import org.apache.spark.sql.SparkSession

/** Paired A/B of q42 with and without the compiler's footprint-derived
  * broadcast-side choice — `Test/runMain graft.PerfProbe42c <sfDir> [reps]`. */
object PerfProbe42c {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1gen")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // bench-parity warmup: tables + one MATCH compile (uniqueness probes)
    Seq("customer", "orders", "lineitem", "part").foreach(t =>
      spark.read.parquet(s"$d/$t.parquet").queryExecution.toRdd.count())
    TradeGraph.graft(spark, d).graphTable(
      """trade MATCH (c:Customer)-[pl:Placed]->(o:Order)
         COLUMNS (c.c_custkey AS k)""").queryExecution.analyzed
    for (i <- 1 to reps; bmax <- Seq("67108864", "0")) {
      spark.conf.set("spark.graft.compiler.broadcastFootprintMaxBytes", bmax)
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("q42_match_3hop_big")(spark, d)
        .queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      OpCaches.releaseAll()
      println(f"PROBE42C rep$i bmax=$bmax%9s $dt%7.2f s rows=$n")
    }
    spark.stop()
  }
}
