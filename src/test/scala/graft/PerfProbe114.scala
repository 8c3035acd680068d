package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Test-scope diagnostic probe for q114 (bipartite co-purchase
  * projection) at the generated scale points: times the candidate join
  * shapes against each other on the same cached memberships input and
  * prints the physical join node each one planned. Not part of the
  * suite — run by hand: `Test/runMain graft.PerfProbe114 /tmp/sf1gen`. */
object PerfProbe114 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1gen")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val kept = spark.read.parquet(s"$d/orders.parquet")
      .join(spark.read.parquet(s"$d/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").cast("long").as("u"),
        col("l_partkey").cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull)
      .distinct()
      .select(col("u").as("id"), col("v"))
      .persist()
    println(s"PROBE114 memberships rows=${kept.count()}")
    val maxBucket = kept.groupBy("v").agg(count(lit(1)).as("c"))
      .agg(max("c")).first().getLong(0)
    println(s"PROBE114 max bucket size=$maxBucket")

    def time(name: String)(df: DataFrame): Unit = {
      val t0 = System.nanoTime()
      val out = df.queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val joins = df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join")).map(_.trim.take(60)).toList
      println(f"PROBE114 $name%-24s $sec%7.2f s rows=$out")
      joins.take(3).foreach(j => println(s"  $j"))
    }

    time("direct-default") {
      kept.as("x").join(kept.as("y"),
          col("x.v") === col("y.v") && col("x.id") < col("y.id"))
        .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
        .agg(count(lit(1)).as("weight"))
        .filter(col("weight") >= 5)
    }

    time("direct-shuffle-hash") {
      kept.as("x").hint("SHUFFLE_HASH")
        .join(kept.as("y").hint("SHUFFLE_HASH"),
          col("x.v") === col("y.v") && col("x.id") < col("y.id"))
        .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
        .agg(count(lit(1)).as("weight"))
        .filter(col("weight") >= 5)
    }

    time("shuffle-hash-packed") {
      kept.as("x").hint("SHUFFLE_HASH")
        .join(kept.as("y").hint("SHUFFLE_HASH"),
          col("x.v") === col("y.v") && col("x.id") < col("y.id"))
        .select((shiftleft(col("x.id"), 32)
          .bitwiseOR(col("y.id"))).as("pk"))
        .groupBy("pk").agg(count(lit(1)).as("weight"))
        .filter(col("weight") >= 5)
        .select(shiftright(col("pk"), 32).as("id_a"),
          col("pk").bitwiseAND(lit(0xffffffffL)).as("id_b"),
          col("weight"))
    }

    time("blocked-1024") {
      val w = Window.partitionBy(col("v")).orderBy(col("id"))
      val base = kept
        .withColumn("__blk", ((row_number().over(w) - 1) / 1024).cast("long"))
        .withColumn("__nblk", ceil(count(lit(1))
          .over(Window.partitionBy(col("v"))) / lit(1024.0)).cast("long"))
      val left = base.withColumn("__bj",
        explode(sequence(col("__blk"), col("__nblk") - 1)))
      val right = base.withColumn("__bi",
        explode(sequence(lit(0L), col("__blk"))))
      left.as("x").join(right.as("y"),
          col("x.v") === col("y.v") && col("x.__bj") === col("y.__blk") &&
            col("x.__blk") === col("y.__bi") && col("x.id") < col("y.id"))
        .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
        .agg(count(lit(1)).as("weight"))
        .filter(col("weight") >= 5)
    }

    time("collect-explode-packed") {
      kept.groupBy("v").agg(sort_array(collect_list("id")).as("m"))
        .select(explode(expr(
          """flatten(transform(m, (a, i) ->
               transform(slice(m, i + 2, size(m) - i - 1), b ->
                 a * 4294967296L + b)))""")).as("pk"))
        .groupBy("pk").agg(count(lit(1)).as("weight"))
        .filter(col("weight") >= 5)
        .select(shiftright(col("pk"), 32).as("id_a"),
          col("pk").bitwiseAND(lit(0xffffffffL)).as("id_b"),
          col("weight"))
    }

    spark.stop()
  }
}
