package graft.ddl

import org.apache.spark.sql.{DataFrame, SparkSession}

import org.apache.spark.sql.functions._

import graft.model.{PropertyGraph, PropertyGraphRegistry, TableResolver}

/** DDL introspection — the Spark-native equivalents of the reference's
  * metadata table functions and pragmas:
  *
  *  - `DESCRIBE PROPERTY GRAPH` (reference
  *    `src/core/functions/table/describe_property_graph.cpp:13-160`)
  *  - `SUMMARIZE PROPERTY GRAPH` (`summarize_property_graph.cpp:54-283`)
  *  - `get_pg_vtablenames` / `get_pg_etablenames` / `get_pg_vcolnames` /
  *    `get_pg_ecolnames` scans (`pgq_scan.cpp:155-266`)
  *  - `PRAGMA show_property_graphs` (`show_property_graphs.cpp:6-19`)
  *  - `PRAGMA create_vertex_table` (`create_vertex_table.cpp:6-38`)
  */
object Introspect {

  /** One row per registered table: label, kind, keys, refs — the analogue
    * of the reference's 14-column describe output. */
  def describe(spark: SparkSession, pg: PropertyGraph): DataFrame = {
    import spark.implicits._
    val vrows = pg.vertexTables.map { v =>
      (pg.name, v.tableName, v.label, true, null.asInstanceOf[String],
        v.keyCols.mkString(","), null.asInstanceOf[String],
        null.asInstanceOf[String], v.discriminator.orNull,
        if (v.subLabels.isEmpty) null else v.subLabels.mkString(","),
        if (v.properties.isEmpty) "*" else v.properties.mkString(","))
    }
    val erows = pg.edgeTables.map { e =>
      (pg.name, e.tableName, e.label, false, e.srcLabel,
        e.srcKeys.mkString(","), e.dstLabel, e.dstKeys.mkString(","),
        e.discriminator.orNull,
        if (e.subLabels.isEmpty) null else e.subLabels.mkString(","),
        if (e.properties.isEmpty) "*" else e.properties.mkString(","))
    }
    (vrows ++ erows).toDF("property_graph", "table_name", "label",
      "is_vertex_table", "source_label", "source_key", "destination_label",
      "destination_key", "discriminator", "sub_labels", "properties")
  }

  /** Per-table statistics: vertex/edge counts, distinct endpoints, isolated
    * vertices, and degree stats — the reference's SUMMARIZE output shape
    * (vertex count, edge count, avg/min/max in/out degree, isolated nodes —
    * `summarize_property_graph.cpp:54-177`), computed as one DataFrame of
    * unioned aggregates. */
  def summarize(spark: SparkSession, pg: PropertyGraph,
      resolver: TableResolver): DataFrame = {
    val vparts = pg.vertexTables.map { v =>
      resolver(spark, v.tableName).agg(count(lit(1)).as("cnt"))
        .select(lit(pg.name).as("property_graph"),
          lit(v.label).as("label"), lit("vertex").as("kind"),
          col("cnt").as("n_rows"),
          lit(null).cast("long").as("n_distinct_src"),
          lit(null).cast("long").as("n_distinct_dst"),
          lit(null).cast("double").as("avg_out_degree"),
          lit(null).cast("double").as("med_out_degree"),
          lit(null).cast("long").as("max_out_degree"),
          lit(null).cast("long").as("n_isolated"))
    }
    val eparts = pg.edgeTables.map { e =>
      val edges = resolver(spark, e.tableName)
        .select(col(e.srcKeys.head).as("src"), col(e.dstKeys.head).as("dst"))
      val srcV = pg.vertexLabel(e.srcLabel)
      val vkeys = resolver(spark, srcV.tableName)
        .select(col(srcV.keyCols.head).as("vk"))
      // two edge scans total: a groupBy per endpoint (Catalyst reuses
      // each exchange across its consumers). The src groupBy yields edge
      // count (= Σ degree), distinct src (= group count) and all degree
      // stats; the dst groupBy yields distinct dst; their key sets union
      // into the touched-vertex set for the isolated anti-join — no third
      // scan of the edge table.
      val sdeg = edges.groupBy("src").agg(count(lit(1)).as("d"))
      val ddeg = edges.groupBy("dst").agg(count(lit(1)).as("d"))
      // Exact interpolated median WITHOUT a full sort (the reference uses
      // approx_quantile to dodge that sort, summarize_property_graph.cpp:54-98;
      // we can stay exact AND scale): degrees are integers, so reduce to
      // the degree HISTOGRAM (≤ max-degree distinct values — tiny even at
      // 100 TB) and take the frequency-weighted exact percentile of it,
      // identical to quantile_cont(0.5) over the raw degrees.
      val medd = sdeg.groupBy("d").agg(count(lit(1)).as("c"))
        .agg(round(percentile(col("d"), lit(0.5), col("c")), 4).as("medd"))
      val degStats = sdeg.agg(sum("d").as("cnt"),
        count(lit(1)).as("dsrc"),
        round(avg("d"), 4).as("avgd"),
        max("d").as("maxd"))
      val dstStats = ddeg.agg(count(lit(1)).as("ddst"))
      val isolated = vkeys.join(
        sdeg.select(col("src").as("vk"))
          .union(ddeg.select(col("dst").as("vk"))).distinct(),
        Seq("vk"), "left_anti").agg(count(lit(1)).as("iso"))
      degStats.crossJoin(medd).crossJoin(dstStats).crossJoin(isolated)
        .select(lit(pg.name).as("property_graph"),
          lit(e.label).as("label"), lit("edge").as("kind"),
          coalesce(col("cnt"), lit(0L)).as("n_rows"),
          col("dsrc").as("n_distinct_src"),
          col("ddst").as("n_distinct_dst"),
          col("avgd").as("avg_out_degree"),
          col("medd").as("med_out_degree"),
          col("maxd").as("max_out_degree"),
          col("iso").as("n_isolated"))
    }
    (vparts ++ eparts).reduce(_ unionByName _)
  }

  /** `PRAGMA show_property_graphs` analogue. */
  def showPropertyGraphs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    PropertyGraphRegistry.forSession(spark).list(spark)
      .toDF("property_graph")
  }

  /** `PRAGMA create_vertex_table` analogue: derive the distinct vertex set
    * of an edge list (reference generates
    * `CREATE TABLE AS SELECT DISTINCT src … UNION dst …`). */
  def deriveVertexTable(edges: DataFrame, srcCol: String, dstCol: String,
      idCol: String): DataFrame =
    edges.select(col(srcCol).as(idCol))
      .union(edges.select(col(dstCol).as(idCol)))
      .distinct()

  /** Registry scans (`get_pg_vtablenames` etc.). */
  def vertexTableNames(spark: SparkSession, pg: PropertyGraph): DataFrame = {
    import spark.implicits._
    pg.vertexTables.map(v => (v.tableName, v.label))
      .toDF("table_name", "label")
  }
  def edgeTableNames(spark: SparkSession, pg: PropertyGraph): DataFrame = {
    import spark.implicits._
    pg.edgeTables.map(e => (e.tableName, e.label)).toDF("table_name", "label")
  }
  def vertexColumnNames(spark: SparkSession, pg: PropertyGraph,
      resolver: TableResolver): DataFrame = {
    import spark.implicits._
    pg.vertexTables.flatMap(v =>
      (if (v.properties.isEmpty) resolver(spark, v.tableName).columns.toSeq
       else v.properties).map(c => (v.tableName, v.label, c)))
      .toDF("table_name", "label", "column_name")
  }
  def edgeColumnNames(spark: SparkSession, pg: PropertyGraph,
      resolver: TableResolver): DataFrame = {
    import spark.implicits._
    pg.edgeTables.flatMap(e =>
      (if (e.properties.isEmpty) resolver(spark, e.tableName).columns.toSeq
       else e.properties).map(c => (e.tableName, e.label, c)))
      .toDF("table_name", "label", "column_name")
  }
}
