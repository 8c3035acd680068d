package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Sampling, Sketches, TextAnalysis}

/** Throwaway probe: q95 bloom-decontaminate stage breakdown at 10x. */
object PerfProbe95 {
  import PerfProbe.time
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1gen")
    val s = SparkSession.builder().master("local[32]")
      .appName("probe95")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val docs = s.read.parquet(s"$d/documents.parquet")
    time("scan warmup")(docs.count())
    val bucket = Sampling.hashBucket(col("doc_id"))
    val bench = docs.filter(bucket < 5)
    val corpus = docs.filter(bucket >= 5)
    time("bench grams distinct")(bench
      .select(explode(TextAnalysis.wordNgrams(col("text"), 4)).as("__g"))
      .distinct().count())
    time("bloomBits+collect")(Sketches.bloomBits(
      bench.select(explode(TextAnalysis.wordNgrams(col("text"), 4))
        .as("__g")).distinct(), col("__g"), 1 << 16, 4).collect().length)
    time("corpus grams explode+count")(corpus
      .select(col("doc_id"), explode_outer(
        array_distinct(TextAnalysis.wordNgrams(col("text"), 4))).as("__g"))
      .groupBy("doc_id").agg(count(col("__g")))
      .queryExecution.toRdd.count())
    time("corpus grams + 1 bloomPos")(
      corpus.select(col("doc_id"), explode_outer(
          array_distinct(TextAnalysis.wordNgrams(col("text"), 4)))
          .as("__g"))
        .withColumn("__p0", Sketches.bloomPos(col("__g"), 0, 1 << 16))
        .groupBy("doc_id").agg(count("__g"), sum("__p0"))
        .queryExecution.toRdd.count())
    time("corpus grams + 4 bloomPos")(
      (0 until 4).foldLeft(corpus.select(col("doc_id"), explode_outer(
          array_distinct(TextAnalysis.wordNgrams(col("text"), 4)))
          .as("__g"))) {
        (df, dd) => df.withColumn(s"__p$dd",
          Sketches.bloomPos(col("__g"), dd, 1 << 16))
      }.groupBy("doc_id").agg(count("__g"), sum("__p0"), sum("__p1"),
        sum("__p2"), sum("__p3")).queryExecution.toRdd.count())
    time("corpus grams + 4 cmBuckets")(
      (0 until 4).foldLeft(corpus.select(col("doc_id"), explode_outer(
          array_distinct(TextAnalysis.wordNgrams(col("text"), 4)))
          .as("__g"))) {
        (df, dd) => df.withColumn(s"__p$dd",
          Sketches.cmBucket(col("__g"), dd, 1 << 16))
      }.groupBy("doc_id").agg(count("__g"), sum("__p0"), sum("__p1"),
        sum("__p2"), sum("__p3")).queryExecution.toRdd.count())
    time("full q95 pass 1")(TextAnalysis.decontaminateBloom(
      corpus, bench, "doc_id", "text", n = 4)
      .queryExecution.toRdd.count())
    time("full q95 pass 2")(TextAnalysis.decontaminateBloom(
      corpus, bench, "doc_id", "text", n = 4)
      .queryExecution.toRdd.count())
    time("q73 exact pass")(TextAnalysis.decontaminate(
      corpus, bench, "doc_id", "text", n = 4)
      .queryExecution.toRdd.count())
  }
}
