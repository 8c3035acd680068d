package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway probe (test scope): userEdges stage attribution at sf1. */
object PerfProbeUE {
  import PerfProbe.time
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1gen")
    val s = SparkSession.builder().master("local[32]")
      .appName("probeUE")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val ev = TradeGraph.events(s, d)
    time("scan cold (3 cols)")(
      ev.select("user_id", "ts", "event_id").queryExecution.toRdd.count())
    time("scan warm (3 cols)")(
      ev.select("user_id", "ts", "event_id").queryExecution.toRdd.count())
    val proj = ev.select(col("user_id"), col("ts"), col("event_id"),
      expr("ts DIV 3600000000000").as("hr"))
    val w = Window.partitionBy("hr").orderBy("ts", "event_id")
    val lagged = proj.withColumn("prev", lag("user_id", 1).over(w))
      .filter(col("prev").isNotNull && col("prev") =!= col("user_id"))
      .select(col("prev").as("src"), col("user_id").as("dst"))
    time("window+filter 1")(lagged.queryExecution.toRdd.count())
    time("window+filter 2")(lagged.queryExecution.toRdd.count())
    time("distinct 1")(lagged.distinct().queryExecution.toRdd.count())
    time("distinct 2")(lagged.distinct().queryExecution.toRdd.count())
    // alternative: groupBy instead of distinct (same thing), and
    // repartition by hr before window to see exchange cost split
    val agg = lagged.groupBy("src", "dst").agg(count(lit(1)))
      .select("src", "dst")
    time("groupBy shape")(agg.queryExecution.toRdd.count())
  }
}
