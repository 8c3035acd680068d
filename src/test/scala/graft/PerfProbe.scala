package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Throwaway perf probe (test scope, not shipped): decomposes hot bench
  * queries into stages to attribute wall time. */
object PerfProbe {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .appName("probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val docs = s.read.parquet(s"$d/documents.parquet")

    time("q21 sig agg cold")(
      Dedup.simHashSignatures(docs, "doc_id", "text").count())
    val pairs = Dedup.simHashPairs(docs, "doc_id", "text", maxDist = 3)
    time("q21 pairs only")(pairs.count())
    time("q21 pairs again")(pairs.count())
    val cp = time("q21 pairs checkpoint")(pairs.localCheckpoint())
    val ids = cp.select(col("id_a").as("doc_id"))
      .union(cp.select(col("id_b").as("doc_id"))).distinct()
    println(s"q21 distinct referenced docs=${time("q21 ids")(ids.count())}")
    val sigs = docs.join(ids, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), Dedup.simHash(col("text")).as("sig2"))
    time("q21 sigs once")(sigs.count())
    time("q21 sigs again")(sigs.count())
    val n = time("q21 full")(SparkEntry.queries("q21_dedup_simhash")(s, d).count())
    println(s"q21 rows=$n pairs=${pairs.count()}")

    val jp = Dedup.minHashLshPairs(docs, "doc_id", "text",
      shingleK = 3, numHashes = 16, bands = 4, threshold = 0.7)
    time("q20 pairs only")(jp.count())
    val n20 = time("q20 full")(SparkEntry.queries("q20_dedup_minhash")(s, d).count())
    println(s"q20 rows=$n20 pairs=${jp.count()}")
    s.stop()
  }
}
