package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Amortized ANN benchmark: build the index ONCE, search MANY times —
  * the real usage shape of a 100 TB embedding store, which the per-query
  * harness ([[Bench]]) cannot show because q56/q118 rebuild their index
  * inside every invocation by design (their DuckDB oracles replay the
  * whole build).
  *
  * Prints ONE JSON line:
  * {"metric":"ann_amortized","unit":"sec","sf":…,
  *  "ivf":{"build":B,"searches":[s1..sN],"search_median":M},
  *  "ivfpq":{…}}
  * Search batches are disjoint 20-query slices (q56's batch size); search
  * parameters match q56 (k=5, nprobe=4 of 16 coarse lists) and q118
  * (k=5, nprobe=3 of 8, m=2, ksub=8) so the search_median is directly
  * comparable to those queries' one-shot walls and DuckDB twins.
  */
object BenchAnn {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val batches = sys.env.getOrElse("SPARK_GRAFT_ANN_BATCHES", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // warmup: parquet listing + codegen + first-touch read
    e.select(col("vec_id")).queryExecution.toRdd.count()

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def run(df: org.apache.spark.sql.DataFrame): Double =
      time(df.queryExecution.toRdd.count())._2
    def batch(i: Int) =
      e.filter(col("vec_id") >= i * 20L && col("vec_id") < (i + 1) * 20L)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.isEmpty) -1.0
      else if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    def fmt(name: String, build: Double, searches: Seq[Double]): String =
      s""""$name":{"build":$build,"searches":[${searches.mkString(",")}],""" +
        s""""search_median":${median(searches)}}"""

    // ---- IVF (q56's parameters: 16 coarse lists, nprobe 4, k 5) ----
    val (ivfIdx, ivfBuild) = time(ops.Similarity.buildIvfIndex(e))
    val ivfSearches = (0 until batches).map(i =>
      run(ops.Similarity.searchIvf(ivfIdx, batch(i), k = 5, nprobe = 4)))
    ivfIdx.release()

    // ---- IVF-PQ (q118's parameters: 8 lists, nprobe 3, m 2, ksub 8) ----
    val (pqIdx, pqBuild) = time(ops.Similarity.buildIvfPqIndex(e,
      numCentroids = 8, m = 2, ksub = 8, coarseIters = 1, pqIters = 1))
    val pqSearches = (0 until batches).map(i =>
      run(ops.Similarity.searchIvfPq(pqIdx, batch(i), k = 5, nprobe = 3)))
    pqIdx.release()

    println(s"""{"metric":"ann_amortized","unit":"sec","sf":"$sfDir",""" +
      fmt("ivf", ivfBuild, ivfSearches) + "," +
      fmt("ivfpq", pqBuild, pqSearches) + "}")
    spark.stop()
  }
}
