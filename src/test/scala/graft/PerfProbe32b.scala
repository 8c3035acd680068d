package graft

import org.apache.spark.sql.SparkSession

/** Throwaway probe: q32 cold-first-call cost with vs without whole-stage
  * codegen (test scope). Run TWICE toggling args(1) to compare. */
object PerfProbe32b {
  import PerfProbe.time
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val wsc = if (args.length > 1) args(1) else "true"
    val s = SparkSession.builder().master("local[32]")
      .appName("probe32b")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.wholeStage", wsc)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    // bench-equivalent warmup
    s.read.parquet(s"$d/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).foreach { f =>
        s.read.parquet(f.getPath).queryExecution.toRdd.count()
      }
    val pg = TradeGraph.graph
    val res = TradeGraph.resolver(d)
    time(s"summarize cold wsc=$wsc")(
      graft.ddl.Introspect.summarize(s, pg, res)
        .queryExecution.toRdd.count())
    graft.OpCaches.releaseAll()
    time(s"summarize 2nd  wsc=$wsc")(
      graft.ddl.Introspect.summarize(s, pg, res)
        .queryExecution.toRdd.count())
    graft.OpCaches.releaseAll()
    time(s"summarize 3rd  wsc=$wsc")(
      graft.ddl.Introspect.summarize(s, pg, res)
        .queryExecution.toRdd.count())
  }
}
