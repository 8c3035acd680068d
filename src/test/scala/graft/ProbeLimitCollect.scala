package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway A/B: count-probe vs limit-collect vs plain collect on the
  * parse-heavy temporal edge view — attribution for the CollectLimitExec
  * incremental-ramp latency question. */
object ProbeLimitCollect {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"AB $label%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    val probe = 2000001
    def clean = TradeGraph.userTemporalEdges(s, d)
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"), col("ts").cast("long").as("ts"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("ts").isNotNull)
    println("partitions=" + clean.rdd.getNumPartitions)
    for (i <- 1 to 2) {
      time(s"limit.count $i")(clean.limit(probe).count())
      time(s"plain.collect $i")(clean.collect())
      time(s"limit.collect $i")(clean.limit(probe).collect())
      s.conf.set("spark.sql.limit.initialNumPartitions", "32")
      time(s"limit.collect initParts=32 $i")(clean.limit(probe).collect())
      s.conf.unset("spark.sql.limit.initialNumPartitions")
    }
    s.stop()
  }
}
