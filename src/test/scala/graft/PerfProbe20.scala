package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Throwaway probe: q20 minhash-LSH stage breakdown at the 10x point. */
object PerfProbe20 {
  import PerfProbe.time
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1gen")
    val s = SparkSession.builder().master("local[32]")
      .appName("probe20")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val docs = s.read.parquet(s"$d/documents.parquet")
    time("scan warmup")(docs.count())
    val base = docs.select(col("doc_id").as("id"), col("text"))
    time("shingles")(base
      .select(array_distinct(Dedup.shingles(col("text"), 3)).as("sh"))
      .queryExecution.toRdd.count())
    val hv = base.withColumn("sh",
        array_distinct(Dedup.shingles(col("text"), 3)))
      .withColumn("hv",
        graft.functions.VectorFunctions.md5_hash31_array(col("sh")))
    time("+md5 hash31")(hv.select("hv").queryExecution.toRdd.count())
    val sig = hv.withColumn("sig", Dedup.minHashesFromHashed(col("hv"), 16))
    time("+minhash sig")(sig.select("sig").queryExecution.toRdd.count())
    time("sig only (no hv out)")(sig.select("id", "sig")
      .queryExecution.toRdd.count())
    time("full q20 pass 1")(
      Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 16, 4, 0.7)
        .queryExecution.toRdd.count())
    time("full q20 pass 2")(
      Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 16, 4, 0.7)
        .queryExecution.toRdd.count())
    // cardinalities for context
    val banded = sig.select(col("id"), array_distinct(col("hv")).as("hv"),
        posexplode(transform(sequence(lit(0), lit(3)),
          b => hash(slice(col("sig"), b * 4 + 1, lit(4)), b))))
      .select(col("id"), col("hv"), col("pos").as("band"),
        col("col").as("bucket"))
    val sizes = banded.groupBy("band", "bucket").agg(count(lit(1)).as("n"))
    sizes.agg(count(lit(1)), sum("n"), max("n"),
      sum(col("n") * (col("n") - 1) / 2)).show(false)
    // avg shingles per doc
    hv.select(avg(size(col("hv"))), max(size(col("hv")))).show(false)
  }
}
