package graft

import org.apache.spark.sql.SparkSession

/** Throwaway: q91 plan shape check. */
object PerfProbe91 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries("q91_weighted_reservoir")(s, d)
    df.explain("formatted")
    println("rows=" + df.count())
  }
}
