package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway perf probe: q42 floor — manual all-broadcast pipeline vs
  * the compiled MATCH plan at sf1. */
object PerfProbe42b {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1gen")
    val s = SparkSession.builder().master("local[32]")
      .appName("probe42b")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    def manual() = {
      val c = s.read.parquet(s"$d/customer.parquet")
      val o = s.read.parquet(s"$d/orders.parquet")
        .filter(col("o_totalprice") > 400000.0)
      val l = s.read.parquet(s"$d/lineitem.parquet")
      val p = s.read.parquet(s"$d/part.parquet")
        .filter((col("p_size").bitwiseAND(lit(1))) === 1)
      l.join(broadcast(o), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey").as("custkey"), col("o_orderkey")
          .as("orderkey"), col("p_partkey").as("partkey"),
          col("p_size").as("size"))
    }
    for (i <- 1 to 3)
      time(s"manual bcast $i")(manual().queryExecution.toRdd.count())
    for (i <- 1 to 3) {
      time(s"compiled $i")(SparkEntry.queries("q42_match_3hop_big")(s, d)
        .queryExecution.toRdd.count())
      OpCaches.releaseAll()
    }
    s.stop()
  }
}
