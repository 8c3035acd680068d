package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Sketches, TextAnalysis}

/** Throwaway probe: q22/q86 warm timing (test scope). */
object PerfProbe22 {
  import PerfProbe.time
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1gen")
    val s = SparkSession.builder().master("local[32]")
      .appName("probe22").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val docs = s.read.parquet(s"$d/documents.parquet")
    time("scan warm")(docs.count())
    time("docstats 1")(TextAnalysis.documentStats(docs, "text")
      .queryExecution.toRdd.count())
    time("docstats 2")(TextAnalysis.documentStats(docs, "text")
      .queryExecution.toRdd.count())
    val ev = s.read.parquet(s"$d/events.parquet")
    time("events warm")(ev.count())
    time("hll regs")(Sketches.hllRegisters(ev, col("user_id"), 12)
      .queryExecution.toRdd.count())
    time("hll regs 2")(Sketches.hllRegisters(ev, col("user_id"), 12)
      .queryExecution.toRdd.count())
  }
}
