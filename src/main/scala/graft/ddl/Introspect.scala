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
    * `summarize_property_graph.cpp:54-177`).
    *
    * All tables are folded into LABEL-KEYED unions before aggregating, so
    * the whole SUMMARIZE is a constant number of stages regardless of how
    * many tables the graph registers (a per-table plan would be ~4 exchanges
    * × N tables). Keys are cast to string for the union — injective, so
    * grouping/distinct/anti-join semantics are unchanged. */
  def summarize(spark: SparkSession, pg: PropertyGraph,
      resolver: TableResolver): DataFrame = {
    import spark.implicits._

    // ---- vertex side: one unioned scan, counts per label ----
    val vLabels = pg.vertexTables.map(_.label).toDF("label")
    val vCounts = pg.vertexTables
      .map(v => resolver(spark, v.tableName).select(lit(v.label).as("label")))
      .reduce(_ unionByName _)
      .groupBy("label").agg(count(lit(1)).as("cnt"))
    // left join from the label list so empty tables still get a 0-count row
    val vparts = vLabels.join(vCounts, Seq("label"), "left")
      .select(lit(pg.name).as("property_graph"),
        col("label"), lit("vertex").as("kind"),
        coalesce(col("cnt"), lit(0L)).as("n_rows"),
        lit(null).cast("long").as("n_distinct_src"),
        lit(null).cast("long").as("n_distinct_dst"),
        lit(null).cast("double").as("avg_out_degree"),
        lit(null).cast("double").as("med_out_degree"),
        lit(null).cast("long").as("max_out_degree"),
        lit(null).cast("long").as("n_isolated"))

    // ---- edge side: one unioned edge scan, per-label degree pipeline ----
    val eLabels = pg.edgeTables.map(_.label).toDF("label")
    val allEdges = pg.edgeTables
      .map(e => resolver(spark, e.tableName).select(
        lit(e.label).as("label"),
        col(e.srcKeys.head).cast("string").as("src"),
        col(e.dstKeys.head).cast("string").as("dst")))
      .reduce(_ unionByName _)
    // two passes over the union total: a groupBy per endpoint (Catalyst
    // reuses each exchange across its consumers). The src groupBy yields
    // edge count (= Σ degree), distinct src (= group count) and all degree
    // stats; the dst groupBy yields distinct dst; their key sets union
    // into the touched-vertex set for the isolated anti-join.
    val sdeg = allEdges.groupBy("label", "src").agg(count(lit(1)).as("d"))
    val ddeg = allEdges.groupBy("label", "dst").agg(count(lit(1)).as("d"))
    // Exact interpolated median WITHOUT a full sort (the reference uses
    // approx_quantile to dodge that sort, summarize_property_graph.cpp:54-98;
    // we can stay exact AND scale): degrees are integers, so reduce to
    // the degree HISTOGRAM (≤ max-degree distinct values per label — tiny
    // even at 100 TB) and take the frequency-weighted exact percentile,
    // identical to quantile_cont(0.5) over the raw degrees. Count, sum,
    // avg and max fold out of the same histogram — no separate stats pass.
    val stats = sdeg.groupBy("label", "d").agg(count(lit(1)).as("c"))
      .groupBy("label").agg(
        sum(col("d") * col("c")).as("cnt"),
        sum("c").as("dsrc"),
        round(sum(col("d") * col("c")) / sum("c"), 4).as("avgd"),
        round(percentile(col("d"), lit(0.5), col("c")), 4).as("medd"),
        max("d").as("maxd"))
    val dstStats = ddeg.groupBy("label").agg(count(lit(1)).as("ddst"))
    // per-label vertex key sets of each edge's SOURCE vertex table (a
    // vertex table referenced by k edge labels is scanned k times, as the
    // reference's per-table isolated-nodes CTEs do)
    val allVkeys = pg.edgeTables
      .map { e =>
        val srcV = pg.vertexLabel(e.srcLabel)
        resolver(spark, srcV.tableName).select(
          lit(e.label).as("label"),
          col(srcV.keyCols.head).cast("string").as("vk"))
      }
      .reduce(_ unionByName _)
    val touched = sdeg.select(col("label"), col("src").as("vk"))
      .union(ddeg.select(col("label"), col("dst").as("vk"))).distinct()
    val isolated = allVkeys.join(touched, Seq("label", "vk"), "left_anti")
      .groupBy("label").agg(count(lit(1)).as("iso"))
    val eparts = eLabels
      .join(stats, Seq("label"), "left")
      .join(dstStats, Seq("label"), "left")
      .join(isolated, Seq("label"), "left")
      .select(lit(pg.name).as("property_graph"),
        col("label"), lit("edge").as("kind"),
        coalesce(col("cnt"), lit(0L)).as("n_rows"),
        coalesce(col("dsrc"), lit(0L)).as("n_distinct_src"),
        coalesce(col("ddst"), lit(0L)).as("n_distinct_dst"),
        col("avgd").as("avg_out_degree"),
        col("medd").as("med_out_degree"),
        col("maxd").as("max_out_degree"),
        coalesce(col("iso"), lit(0L)).as("n_isolated"))
    vparts.unionByName(eparts)
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
