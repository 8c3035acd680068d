package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}
import scala.collection.mutable

/** q32 job-attribution probe: lists every Spark job the query fires
  * with wall time and description. */
object PerfProbe32d {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).foreach { f =>
        try spark.read.parquet(f.getPath).queryExecution.toRdd.count()
        catch { case _: Throwable => () }
      }
    // warm run first
    SparkEntry.queries("q32_summarize_pg")(spark, d)
      .queryExecution.toRdd.count()
    OpCaches.releaseAll()

    val starts = mutable.Map[Int, (Long, String)]()
    val rows = mutable.ArrayBuffer[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts(js.jobId) = (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description"))
            .getOrElse("?").take(70))
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.get(je.jobId).foreach { case (t0, desc) =>
          rows += ((je.jobId, (System.nanoTime() - t0) / 1e9, desc)) }
    })
    val t0 = System.nanoTime()
    SparkEntry.queries("q32_summarize_pg")(spark, d)
      .queryExecution.toRdd.count()
    OpCaches.releaseAll()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"PROBE32D total $total%6.2f s, jobs=${rows.size}")
    rows.foreach { case (id, sec, desc) =>
      println(f"PROBE32D job$id%-4d $sec%6.2f s  $desc") }
    spark.stop()
  }
}
