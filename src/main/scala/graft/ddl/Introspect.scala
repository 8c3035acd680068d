package graft.ddl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

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

  /** Per-table statistics in the reference's exact 22-column SUMMARIZE
    * shape (`summarize_property_graph.cpp:104-140`): table_name,
    * is_vertex_table, source/destination_table, vertex_count, edge_count,
    * unique source/destination counts, isolated sources/destinations, and
    * avg/min/max/q25/q50/q75 of the in- and out-degree DISTRIBUTIONS
    * (degree groups, not all vertices — matching the reference's CTEs).
    *
    * All tables are folded into ORDINAL-KEYED unions before aggregating,
    * so the whole SUMMARIZE is a constant number of stages regardless of
    * how many tables the graph registers (the reference emits ~6
    * correlated subqueries per table). Quantiles are EXACT discrete
    * quantiles (`sorted[ceil(p·n)−1]`, DuckDB `quantile_disc` semantics)
    * computed from the per-table degree HISTOGRAM — ≤ max-degree distinct
    * values per table, tiny at any corpus scale, no full sort (the
    * reference settles for `approx_quantile` to dodge that sort). Union
    * keys are LONG when every key column in play is integral, STRING
    * otherwise — injective either way, so grouping/distinct/anti-join
    * semantics are unchanged. Each physical vertex table is scanned
    * exactly ONCE (a sentinel-tagged explode serves row counts and key
    * sets from the same cached pass); each edge table exactly once. */
  def summarize(spark: SparkSession, pg: PropertyGraph,
      resolver: TableResolver): DataFrame = {
    import spark.implicits._

    // Key representation for the union/join identities: LONG when every
    // key column involved (vertex keys + edge endpoint keys) is integral
    // — long group-by/join keys hash and compare several times faster
    // than their string casts — STRING otherwise (injective either way).
    val keyColsInPlay: Seq[(String, String)] =
      pg.vertexTables.map(v => (v.tableName, v.keyCols.head)) ++
        pg.edgeTables.flatMap(e => Seq(
          (e.tableName, e.srcKeys.head), (e.tableName, e.dstKeys.head),
          (pg.vertexLabel(e.srcLabel).tableName,
            pg.vertexLabel(e.srcLabel).keyCols.head),
          (pg.vertexLabel(e.dstLabel).tableName,
            pg.vertexLabel(e.dstLabel).keyCols.head)))
    val integralTypes: Set[org.apache.spark.sql.types.DataType] = Set(
      org.apache.spark.sql.types.ByteType,
      org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.LongType)
    val allIntegral = keyColsInPlay.distinct.forall { case (tbl, k) =>
      resolver(spark, tbl).schema.find(_.name == k)
        .exists(f => integralTypes.contains(f.dataType))
    }
    val keyType = if (allIntegral) "long" else "string"
    def keyCast(c: Column): Column = c.cast(keyType)

    // ---- vertex side: ONE scan per distinct physical table serves BOTH
    // the per-table row counts and the key sets the isolated-vertex
    // anti-semantics need (previously two scans per table). Each row
    // explodes to a `__cnt` sentinel plus one entry per needed key
    // column; the sentinel leg counts rows, the rest are the key sets.
    val vMeta = pg.vertexTables.zipWithIndex
      .map { case (v, i) => (i, v.tableName) }.toDF("i", "table_name")
    val keysByTable: Map[String, Seq[String]] = pg.edgeTables
      .flatMap(e => Seq(pg.vertexLabel(e.srcLabel), pg.vertexLabel(e.dstLabel)))
      .map(vt => (vt.tableName, vt.keyCols.head)).distinct
      .groupBy(_._1).map { case (t, ks) => t -> ks.map(_._2) }
    val vScan = graft.OpCaches.track(
      pg.vertexTables.map(_.tableName).distinct.map { tbl =>
        val ks = keysByTable.getOrElse(tbl, Nil)
        resolver(spark, tbl).select(lit(tbl).as("tbl"),
          explode(array(
            struct(lit("__cnt").as("key"),
              lit(null).cast(keyType).as("vk")) +:
            ks.map(k => struct(lit(k).as("key"),
              keyCast(col(k)).as("vk"))): _*)).as("e"))
          .select(col("tbl"), col("e.key").as("key"), col("e.vk").as("vk"))
      }.reduce(_ unionByName _))
    val tblCnt0 = vScan.filter(col("key") === "__cnt")
      .groupBy("tbl").agg(count(lit(1)).as("vcnt"))
    val vCounts = vMeta
      .join(tblCnt0.withColumnRenamed("tbl", "table_name"),
        Seq("table_name"), "left")
      .select(col("i"), coalesce(col("vcnt"), lit(0L)).as("cnt"))
    val nullL = lit(null).cast("long")
    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")
    // left join from the table list so empty tables still get a 0-count row
    val vparts = vMeta.join(vCounts, Seq("i"), "left")
      .select(col("i"), col("table_name"), lit(true).as("is_vertex_table"),
        nullS.as("source_table"), nullS.as("destination_table"),
        coalesce(col("cnt"), lit(0L)).as("vertex_count"),
        nullL.as("edge_count"),
        nullL.as("unique_source_count"), nullL.as("unique_destination_count"),
        nullL.as("isolated_sources"), nullL.as("isolated_destinations"),
        nullD.as("avg_in_degree"), nullL.as("min_in_degree"),
        nullL.as("max_in_degree"), nullL.as("q25_in_degree"),
        nullL.as("q50_in_degree"), nullL.as("q75_in_degree"),
        nullD.as("avg_out_degree"), nullL.as("min_out_degree"),
        nullL.as("max_out_degree"), nullL.as("q25_out_degree"),
        nullL.as("q50_out_degree"), nullL.as("q75_out_degree"))

    // a graph may register no edge tables at all
    // (summarize_property_graph.test:50-63 `snb2`)
    if (pg.edgeTables.isEmpty)
      return vparts.coalesce(1).sortWithinPartitions(asc("i")).drop("i")

    // ---- edge side: one unioned edge scan keyed by table ordinal ----
    val eMeta = pg.edgeTables.zipWithIndex
      .map { case (e, i) =>
        val srcT = pg.vertexLabel(e.srcLabel).tableName
        val dstT = pg.vertexLabel(e.dstLabel).tableName
        (i, e.tableName, srcT, dstT)
      }.toDF("i", "table_name", "source_table", "destination_table")
    val allEdges = pg.edgeTables.zipWithIndex
      .map { case (e, i) => resolver(spark, e.tableName).select(
        lit(i).as("i"),
        keyCast(col(e.srcKeys.head)).as("src"),
        keyCast(col(e.dstKeys.head)).as("dst")) }
      .reduce(_ unionByName _)
    // ONE side-tagged degree pipeline serves both directions, and its
    // degree relation doubles as the distinct-foreign-key set for the
    // isolated anti-join — a per-direction pipeline re-evaluated every
    // derived edge view up to 4× (measured 2× wall on q32). Degree stats
    // are over the degree GROUPS (vertices with ≥1 edge on that side),
    // exactly the reference's degree_groups CTE.
    // posexplode, not a self-union: a union of two selects over allEdges
    // scans every edge table twice; exploding [src, dst] tags both sides
    // in a single pass over each table.
    val sided = allEdges
      .select(col("i"), posexplode(array(col("src"), col("dst"))))
      .select(col("i"),
        when(col("pos") === 0, lit("src")).otherwise(lit("dst")).as("side"),
        col("col").as("vk"))
    // the (edge table, side) → (vertex table, key column) reference map,
    // broadcast wherever a frame needs its side tags
    val sideTbl = pg.edgeTables.zipWithIndex.flatMap { case (e, i) =>
      Seq((i, "src", pg.vertexLabel(e.srcLabel)),
        (i, "dst", pg.vertexLabel(e.dstLabel)))
    }
    val sideTblDf = sideTbl
      .map { case (i, side, vt) => (i, side, vt.tableName, vt.keyCols.head) }
      .toDF("i", "side", "tbl", "key")
    // tracked cache: deg feeds BOTH the histogram/quantile stats and the
    // isolated match-count join — uncached, each consumer re-runs the
    // whole edge-scan + aggregate. One row per (table, side, endpoint
    // key), bounded by the distinct endpoint keys. Released by the
    // harness via [[graft.OpCaches.releaseAll]]. (A fused variant that
    // unions the replicated vertex keys INTO this shuffle and counts
    // matches alongside degrees measured ~35% SLOWER end-to-end — the
    // widened rows cost more in the hot aggregation than the second
    // skinny join stage they replace.)
    val deg = graft.OpCaches.track(
      sided.groupBy("i", "side", "vk").agg(count(lit(1)).as("d")))
    val hist = deg.groupBy("i", "side", "d").agg(count(lit(1)).as("c"))
    // FUSED stats: one groupBy(i) computes both sides' moments AND the
    // exact discrete quantiles — the previous window (cumulative sums) +
    // per-(i, side) aggregate + pivot chain was three serial exchanges
    // of the same tiny histogram. The per-table degree histogram is ≤
    // max-degree distinct rows, so collecting it into a sorted array and
    // scanning it with a fold expression is driver-free, sort-free and
    // one stage. quantile_disc semantics preserved: smallest d whose
    // cumulative count reaches ceil(p·n).
    def qArr(arr: Column, n: Column, p: Double): Column =
      aggregate(arr,
        struct(lit(0L).as("cum"), lit(null).cast("long").as("q")),
        (acc, x) => struct(
          (acc.getField("cum") + x.getField("c")).as("cum"),
          coalesce(acc.getField("q"),
            when(acc.getField("cum") + x.getField("c") >=
              ceil(lit(p) * n), x.getField("d"))).as("q")),
        acc => acc.getField("q"))
    def sideAggs(side: String): Seq[Column] = Seq(
      sum(when(col("side") === side, col("d") * col("c")))
        .as(s"${side}_edges"),
      sum(when(col("side") === side, col("c"))).as(s"${side}_groups"),
      min(when(col("side") === side, col("d"))).as(s"${side}_mn"),
      max(when(col("side") === side, col("d"))).as(s"${side}_mx"),
      sort_array(collect_list(when(col("side") === side,
        struct(col("d"), col("c"))))).as(s"${side}_arr"))
    val aggsAll = sideAggs("src") ++ sideAggs("dst")
    val statsWide = hist.groupBy("i")
      .agg(aggsAll.head, aggsAll.tail: _*)
      .withColumn("src_avg",
        col("src_edges").cast("double") / col("src_groups"))
      .withColumn("dst_avg",
        col("dst_edges").cast("double") / col("dst_groups"))
      .withColumn("src_q25", qArr(col("src_arr"), col("src_groups"), 0.25))
      .withColumn("src_q50", qArr(col("src_arr"), col("src_groups"), 0.5))
      .withColumn("src_q75", qArr(col("src_arr"), col("src_groups"), 0.75))
      .withColumn("dst_q25", qArr(col("dst_arr"), col("dst_groups"), 0.25))
      .withColumn("dst_q50", qArr(col("dst_arr"), col("dst_groups"), 0.5))
      .withColumn("dst_q75", qArr(col("dst_arr"), col("dst_groups"), 0.75))
      .drop("src_arr", "dst_arr")
    // isolated vertices per (edge table, side) WITHOUT fanning vertex
    // scans per reference: matched = |vertex rows whose key appears in
    // that side's foreign-key set (= the deg relation)|, so
    // isolated = vertex_count − matched. The vertex keys ride the SAME
    // cached scan as the row counts (vScan); the join identity is
    // (table, KEY COLUMN, value) — one table can be referenced through
    // different key columns (e.g. a composite-label head key) whose
    // value domains overlap, so tbl+vk alone would cross-match them.
    val vkeysAll = vScan.filter(col("key") =!= "__cnt")
    val degT = deg.join(
      broadcast(sideTblDf.select("i", "side", "tbl", "key")),
      Seq("i", "side"))
    val matched = vkeysAll.join(degT.select("tbl", "key", "vk", "i", "side"),
        Seq("tbl", "key", "vk"))
      .groupBy("i", "side").agg(count(lit(1)).as("matched"))
    // vertex-row counts per distinct table — the sentinel leg of vScan
    val tblCnt = tblCnt0
    val isolated = sideTblDf.select("i", "side", "tbl")
      .join(tblCnt, Seq("tbl"))
      .join(matched, Seq("i", "side"), "left")
      .withColumn("iso",
        col("vcnt") - coalesce(col("matched"), lit(0L)))
      .groupBy("i").agg(
        sum(when(col("side") === "src", col("iso")).otherwise(0L))
          .as("iso_src"),
        sum(when(col("side") === "dst", col("iso")).otherwise(0L))
          .as("iso_dst"))
    val eparts = eMeta
      .join(statsWide, Seq("i"), "left")
      .join(isolated, Seq("i"), "left")
      .select(col("i"), col("table_name"), lit(false).as("is_vertex_table"),
        col("source_table"), col("destination_table"),
        nullL.as("vertex_count"),
        coalesce(col("src_edges"), lit(0L)).as("edge_count"),
        coalesce(col("src_groups"), lit(0L)).as("unique_source_count"),
        coalesce(col("dst_groups"), lit(0L)).as("unique_destination_count"),
        coalesce(col("iso_src"), lit(0L)).as("isolated_sources"),
        coalesce(col("iso_dst"), lit(0L)).as("isolated_destinations"),
        col("dst_avg").as("avg_in_degree"), col("dst_mn").as("min_in_degree"),
        col("dst_mx").as("max_in_degree"), col("dst_q25").as("q25_in_degree"),
        col("dst_q50").as("q50_in_degree"), col("dst_q75").as("q75_in_degree"),
        col("src_avg").as("avg_out_degree"),
        col("src_mn").as("min_out_degree"),
        col("src_mx").as("max_out_degree"),
        col("src_q25").as("q25_out_degree"),
        col("src_q50").as("q50_out_degree"),
        col("src_q75").as("q75_out_degree"))
    // declaration order: vertex tables first, then edge tables (the
    // reference's UNION ALL of per-table CTEs)
    // output is one row per registered table — a single partition in
    // stable declaration order beats a range-exchange (sampling job) for
    // a global sort of ~dozens of rows
    vparts.unionByName(eparts).coalesce(1)
      .sortWithinPartitions(desc("is_vertex_table"), asc("i")).drop("i")
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
