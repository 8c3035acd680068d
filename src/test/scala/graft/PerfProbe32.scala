package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe: q32 SUMMARIZE stage attribution (test scope). */
object PerfProbe32 {
  import PerfProbe.time
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .appName("probe32")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val pg = TradeGraph.graph
    val res = TradeGraph.resolver(d)
    time("warm lineitem")(TradeGraph.baseTable(s, d, "lineitem").count())
    // vertex count side only
    val vCounts = pg.vertexTables.zipWithIndex
      .map { case (v, i) => res(s, v.tableName).select(lit(i).as("i")) }
      .reduce(_ unionByName _)
      .groupBy("i").agg(count(lit(1)).as("cnt"))
    time("vCounts")(vCounts.queryExecution.toRdd.count())
    val allEdges = pg.edgeTables.zipWithIndex
      .map { case (e, i) => res(s, e.tableName).select(
        lit(i).as("i"),
        col(e.srcKeys.head).cast("string").as("src"),
        col(e.dstKeys.head).cast("string").as("dst")) }
      .reduce(_ unionByName _)
    time("allEdges count")(allEdges.queryExecution.toRdd.count())
    val sided = allEdges
      .select(col("i"), posexplode(array(col("src"), col("dst"))))
      .select(col("i"),
        when(col("pos") === 0, lit("src")).otherwise(lit("dst")).as("side"),
        col("col").as("vk"))
    val deg = sided.groupBy("i", "side", "vk").agg(count(lit(1)).as("d"))
    time("deg")(deg.queryExecution.toRdd.count())
    time("deg 2nd")(deg.queryExecution.toRdd.count())
    val hist = deg.groupBy("i", "side", "d").agg(count(lit(1)).as("c"))
    time("hist")(hist.queryExecution.toRdd.count())
    val cum = hist
      .withColumn("__n", sum("c").over(
        org.apache.spark.sql.expressions.Window.partitionBy("i", "side")))
      .withColumn("__cum", sum("c").over(
        org.apache.spark.sql.expressions.Window.partitionBy("i", "side")
          .orderBy("d")))
    time("cum")(cum.queryExecution.toRdd.count())
    val refKeys = pg.edgeTables.zipWithIndex.flatMap { case (e, i) =>
      Seq(("src", pg.vertexLabel(e.srcLabel)),
        ("dst", pg.vertexLabel(e.dstLabel))).map { case (side, vt) =>
        (vt.tableName, vt.keyCols.head) -> ((i, side))
      }
    }.groupBy(_._1).map { case ((tbl, key), refs) =>
      res(s, tbl).select(
        col(key).cast("string").as("vk"),
        explode(array(refs.map { case (_, (i, side)) =>
          struct(lit(i).as("i"), lit(side).as("side")) }: _*)).as("t"))
        .select(col("t.i").as("i"), col("t.side").as("side"), col("vk"))
    }.reduce(_ unionByName _)
    time("refKeys")(refKeys.queryExecution.toRdd.count())
    val isolated = refKeys
      .join(deg.select("i", "side", "vk"), Seq("i", "side", "vk"),
        "left_anti")
      .groupBy("i").agg(
        sum(when(col("side") === "src", 1L).otherwise(0L)).as("iso_src"),
        sum(when(col("side") === "dst", 1L).otherwise(0L)).as("iso_dst"))
    time("isolated")(isolated.queryExecution.toRdd.count())
    time("isolated 2nd")(isolated.queryExecution.toRdd.count())
    time("full summarize 1")(graft.ddl.Introspect.summarize(s, pg, res)
      .queryExecution.toRdd.count())
    graft.OpCaches.releaseAll()
    time("full summarize 2")(graft.ddl.Introspect.summarize(s, pg, res)
      .queryExecution.toRdd.count())
    graft.OpCaches.releaseAll()
    val df3 = graft.ddl.Introspect.summarize(s, pg, res)
    time("summarize 3 analyze")(df3.queryExecution.analyzed)
    time("summarize 3 optimize")(df3.queryExecution.optimizedPlan)
    time("summarize 3 physical")(df3.queryExecution.executedPlan)
    time("summarize 3 execute")(df3.queryExecution.toRdd.count())
    graft.OpCaches.releaseAll()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    time("summarize noAQE")(graft.ddl.Introspect.summarize(s, pg, res)
      .queryExecution.toRdd.count())
    graft.OpCaches.releaseAll()
    time("summarize noAQE 2")(graft.ddl.Introspect.summarize(s, pg, res)
      .queryExecution.toRdd.count())
    graft.OpCaches.releaseAll()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    time("summarize 8part")(graft.ddl.Introspect.summarize(s, pg, res)
      .queryExecution.toRdd.count())
    graft.OpCaches.releaseAll()
    s.conf.set("spark.sql.shuffle.partitions", "32")
    // job-level attribution for ONE summarize execution
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    val done = scala.collection.mutable.ArrayBuffer[(Int, Long, String)]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.put(j.jobId, (System.nanoTime(),
          Option(j.properties).map(_.getProperty(
            "spark.job.description", "")).getOrElse("")))
      override def onJobEnd(
          j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val st = jobs.get(j.jobId)
        if (st != null) done.synchronized {
          done += ((j.jobId, System.nanoTime() - st._1, st._2)) }
      }
    }
    s.sparkContext.addSparkListener(listener)
    time("summarize listened")(graft.ddl.Introspect.summarize(s, pg, res)
      .queryExecution.toRdd.count())
    Thread.sleep(500)
    s.sparkContext.removeSparkListener(listener)
    done.sortBy(-_._2).take(12).foreach { case (id, ns, desc) =>
      println(f"PROBE job $id: ${ns / 1e9}%.2f s ${desc.take(60)}") }
    println("PROBE njobs: " + done.size)
    graft.OpCaches.releaseAll()
    println("PROBE jobs total: " +
      s.sparkContext.statusTracker.getJobIdsForGroup(null).length)
  }
}
