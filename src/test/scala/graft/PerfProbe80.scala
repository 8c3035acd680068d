package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** Throwaway stage attribution for q80 (test scope, not shipped). */
object PerfProbe80 {
  import PerfProbe.time
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1gen")
    val s = SparkSession.builder().master("local[32]")
      .appName("probe80")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val docs = s.read.parquet(s"$d/documents.parquet")
    time("scan only")(docs.count())
    time("words explode count")(
      docs.select(explode(TextAnalysis.words(col("text"))).as("t")).count())
    time("token_counts explode count")(
      docs.select(explode(graft.functions.TextFunctions.token_counts(
        TextAnalysis.words(col("text")))).as("e")).count())
    val tf = docs.select(col("doc_id"),
        explode(graft.functions.TextFunctions.token_counts(
          TextAnalysis.words(col("text")))).as("__e"))
      .select(col("doc_id"), col("__e.t").as("__t"), col("__e.tf").as("__tf"))
    time("tf count")(tf.count())
    val counts = tf.groupBy("__t").agg(sum("__tf").as("__c"))
    time("counts (vocab)")(println("vocab=" + counts.count()))
    val total = counts.agg(sum("__c").cast("double").as("__n"))
    val joined = tf.join(counts, Seq("__t")).crossJoin(total)
    time("join count")(joined.count())
    val scored = joined.groupBy("doc_id")
      .agg(sum("__tf").as("n_tokens"),
        round(sum(col("__tf").cast("double") *
            log(col("__c").cast("double") / col("__n"))) /
          sum(col("__tf").cast("double")), 6).as("avg_logprob"))
    time("scored")(scored.count())
    time("full op")(TextAnalysis.unigramLogProb(docs, "doc_id", "text")
      .queryExecution.toRdd.count())
    time("full op again")(TextAnalysis.unigramLogProb(docs, "doc_id", "text")
      .queryExecution.toRdd.count())
  }
}
