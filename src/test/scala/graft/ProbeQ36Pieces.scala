package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway decomposition of q36's sf1 cost: which piece of the fused
  * gate/collect path is slow on the window+distinct userEdges view. */
object ProbeQ36Pieces {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1gen")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PIECE $label%-36s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    TradeGraph.events(s, d).count()
    val probe = 2000001
    for (i <- 1 to 2) {
      val ue = TradeGraph.userEdges(s, d)
      time(s"userEdges limit.count $i")(ue.limit(probe).count())
      time(s"userEdges plain.collect $i")(ue.collect())
      time(s"userEdges limit.collect $i")(ue.limit(probe).collect())
      val clean = ue.where(col("src").isNotNull && col("dst").isNotNull)
      time(s"clean limit.collect $i")(clean.limit(probe).collect())
      val users = TradeGraph.events(s, d)
        .select(col("user_id").as("id")).distinct()
      time(s"users distinct.limit.collect $i")(
        users.select(col("id").cast("long")).distinct()
          .limit(probe).collect())
      time(s"users count+collect $i") {
        users.limit(probe).count()
        users.select(col("id").cast("long")).distinct().collect()
      }
    }
    s.stop()
  }
}
