package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Prints formatted physical plans for the headline queries — the
  * shuffle/broadcast/pushdown audit. Run:
  * `sbt 'Test/runMain graft.examples.PlanAudit [sfDir] [q...]'`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val qs = if (args.length > 1) args.tail.toSeq
      else Seq("q1_agg", "q2_join_agg", "q6_match_1hop", "q7_match_2hop",
        "q19_dedup_jaccard", "q25_sim_topk", "q29_events_window")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    qs.foreach { q =>
      println(s"\n========== $q ==========")
      val df = graft.SparkEntry.queries(q)(spark, sf)
      println(df.queryExecution.explainString(
        ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
