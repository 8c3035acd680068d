package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway A/B probe (test scope): verdict r10 item 7 — is the
  * +0.1-0.3 s sf0.1 creep on the ANN family lifecycle churn from the
  * OpCaches.track change (tracked centroid frame re-persisted + released
  * per query) or box noise? Both variants run the same ivfTopK search
  * shape; A is the shipped tracked path with the bench's per-query
  * releaseAll, B replicates the pre-r10 shape — bare persist, never
  * released. */
object PerfProbeAnnAB {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .appName("probeAnnAB")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val sim = graft.ops.Similarity
    val e = s.read.parquet(s"$d/embeddings.parquet")
    e.queryExecution.toRdd.count()
    val queries = e.filter(col("vec_id") < 20)
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $label%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    for (rep <- 1 to 5)
      time(s"A tracked+release $rep") {
        sim.ivfTopK(queries, e, k = 5).queryExecution.toRdd.count()
        OpCaches.releaseAll()
      }
    for (rep <- 1 to 5)
      time(s"B bare persist $rep") {
        // pre-r10 ivfTopK: centroid frame bare-persisted, never released
        val cents = sim.coarseCentroids(e, 16)
          .select(col("centroid_id"), col("vec")).persist()
        sim.ivfTopK(queries, e, k = 5, centroids = Some(cents))
          .queryExecution.toRdd.count()
      }
    s.stop()
  }
}
