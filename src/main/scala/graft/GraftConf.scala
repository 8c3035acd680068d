package graft

import org.apache.spark.sql.SparkSession

/** Recommended session configuration for running graft at cluster scale.
  *
  * The engine itself is configuration-agnostic (plain DataFrame plans);
  * these are the knobs that matter when the same plans run against ~100 TB
  * on a real cluster rather than local[32]:
  *
  *  - AQE on (runtime re-planning, skew-join splitting, partition
  *    coalescing) — every iterative kernel emits fresh stats per level,
  *    which AQE exploits
  *  - shuffle partitions sized to cluster parallelism (driver sets this;
  *    AQE coalesces down, it can't split up beyond the initial number)
  *  - bounded file-split size so scans parallelize evenly
  *  - broadcast threshold generous enough to catch dimension tables
  *    (nation/region-shaped sides of pattern joins)
  */
object GraftConf {
  def recommended(parallelism: Int): Map[String, String] = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.shuffle.partitions" -> (parallelism * 2).toString,
    "spark.sql.files.maxPartitionBytes" -> (128L * 1024 * 1024).toString,
    "spark.sql.autoBroadcastJoinThreshold" -> (64L * 1024 * 1024).toString,
    "spark.sql.session.timeZone" -> "UTC")

  def apply(builder: SparkSession.Builder,
      parallelism: Int): SparkSession.Builder =
    recommended(parallelism).foldLeft(builder) {
      case (b, (k, v)) => b.config(k, v)
    }
}
