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
    // anti-semantics need (previously two scans per table). NO sentinel
    // explode: a table referenced through one key column (the common
    // case) is a plain narrow select — one output row per input row —
    // and a k-key table explodes to exactly k rows per input row, so
    // the ROW COUNT is recoverable as the count of any one key leg;
    // only an edge-unreferenced table needs a count-only `__cnt` leg.
    val keysByTable: Map[String, Seq[String]] = pg.edgeTables
      .flatMap(e => Seq(pg.vertexLabel(e.srcLabel), pg.vertexLabel(e.dstLabel)))
      .map(vt => (vt.tableName, vt.keyCols.head)).distinct
      .groupBy(_._1).map { case (t, ks) => t -> ks.map(_._2) }
    val countKeyByTable: Map[String, String] = // the leg whose count = rows
      pg.vertexTables.map(_.tableName).distinct
        .map(t => t -> keysByTable.getOrElse(t, Nil).headOption
          .getOrElse("__cnt")).toMap
    val vScan = (
      pg.vertexTables.map(_.tableName).distinct.map { tbl =>
        keysByTable.getOrElse(tbl, Nil) match {
          case Seq() => resolver(spark, tbl).select(lit(tbl).as("tbl"),
            lit("__cnt").as("key"), lit(null).cast(keyType).as("vk"))
          case Seq(k) => resolver(spark, tbl).select(lit(tbl).as("tbl"),
            lit(k).as("key"), keyCast(col(k)).as("vk"))
          case ks => resolver(spark, tbl).select(lit(tbl).as("tbl"),
            explode(array(ks.map(k => struct(lit(k).as("key"),
              keyCast(col(k)).as("vk"))): _*)).as("e"))
            .select(col("tbl"), col("e.key").as("key"), col("e.vk").as("vk"))
        }
      }.reduce(_ unionByName _))
    val tblCnt0 = vScan.groupBy("tbl", "key").agg(count(lit(1)).as("vcnt"))

    // ---- driver assembly ----
    // Everything PAST the degree histogram is provably tiny — the
    // histogram has at most O(√E) distinct degree values per (table,
    // side) (Σ of distinct degrees ≤ E bounds their count), the matched/
    // row-count aggregates are one row per (table[, side]) — so the
    // moments, exact discrete quantiles, and the 17×22 final assembly
    // run as plain driver arithmetic on collected aggregates instead of
    // ~10 more tiny exchanges (windows + HOF folds + pivot joins + a
    // final sort), each of which was a scheduled AQE stage (~21 jobs →
    // ~8; measured 2× wall on q32). The DISTRIBUTED part — the edge and
    // vertex scans and the degree aggregation — is unchanged and scales
    // as before.
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      ("table_name", "string"), ("is_vertex_table", "boolean"),
      ("source_table", "string"), ("destination_table", "string"),
      ("vertex_count", "long"), ("edge_count", "long"),
      ("unique_source_count", "long"), ("unique_destination_count", "long"),
      ("isolated_sources", "long"), ("isolated_destinations", "long"),
      ("avg_in_degree", "double"), ("min_in_degree", "long"),
      ("max_in_degree", "long"), ("q25_in_degree", "long"),
      ("q50_in_degree", "long"), ("q75_in_degree", "long"),
      ("avg_out_degree", "double"), ("min_out_degree", "long"),
      ("max_out_degree", "long"), ("q25_out_degree", "long"),
      ("q50_out_degree", "long"), ("q75_out_degree", "long"))
      .map { case (n, t) => org.apache.spark.sql.types.StructField(n,
        org.apache.spark.sql.catalyst.parser.CatalystSqlParser
          .parseDataType(t)) })
    def rowsDf(rows: Seq[org.apache.spark.sql.Row]): DataFrame =
      spark.createDataFrame(
        new java.util.ArrayList(
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        outSchema)
    def vRow(tableName: String, vcnt: Long): org.apache.spark.sql.Row =
      org.apache.spark.sql.Row(tableName, true, null, null,
        vcnt, null, null, null, null, null,
        null, null, null, null, null, null,
        null, null, null, null, null, null)

    // a graph may register no edge tables at all
    // (summarize_property_graph.test:50-63 `snb2`)
    if (pg.edgeTables.isEmpty) {
      val vcntByTbl =
        tblCnt0.collect()
          .filter(r => r.getString(1) == countKeyByTable(r.getString(0)))
          .map(r => r.getString(0) -> r.getLong(2)).toMap
      return rowsDf(pg.vertexTables.map(v =>
        vRow(v.tableName, vcntByTbl.getOrElse(v.tableName, 0L))))
    }

    // tracked cache, registered AFTER the empty-edge early return (that
    // path consumes only the count leg, where a cache is pure overhead):
    // cache substitution happens at action-planning time, so tblCnt0 —
    // derived above — still reads the cached scan. This is what makes
    // the one-scan-per-table claim true: the count leg and the
    // vkeysAll/matched join leg are two subtrees of the single tagged
    // collect below, and uncached each would re-scan every vertex table.
    // Dropped in the collect's finally alongside deg.
    graft.OpCaches.track(vScan)

    // ---- edge side: one unioned edge scan keyed by table ordinal ----
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

    // collect the three tiny aggregates in ONE tagged union — one action,
    // one AQE planning round (deg/vScan caches are shared by the hist and
    // matched lineages) — and finish on the driver; the result is EAGER,
    // so the scratch caches can be dropped here instead of waiting for
    // the harness's post-query release
    val nullI = lit(null).cast("int")
    val nullS2 = lit(null).cast("string")
    val nullL2 = lit(null).cast("long")
    val tagged = hist.select(lit("h").as("kind"), col("i"), col("side"),
        nullS2.as("s2"), col("d").as("a"), col("c").as("b"))
      .unionByName(matched.select(lit("m").as("kind"), col("i"),
        col("side"), nullS2.as("s2"), col("matched").as("a"),
        nullL2.as("b")))
      .unionByName(tblCnt0.select(lit("c").as("kind"), nullI.as("i"),
        col("tbl").as("side"), col("key").as("s2"),
        col("vcnt").as("a"), nullL2.as("b")))
    val rows = try tagged.collect()
      finally { deg.unpersist(); vScan.unpersist() }
    val histBySide: Map[(Int, String), Array[(Long, Long)]] = rows
      .filter(_.getString(0) == "h")
      .map(r => ((r.getInt(1), r.getString(2)), (r.getLong(4), r.getLong(5))))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sortBy(_._1) }
    val matchedBy: Map[(Int, String), Long] = rows
      .filter(_.getString(0) == "m")
      .map(r => ((r.getInt(1), r.getString(2)), r.getLong(4))).toMap
    val vcntByTbl: Map[String, Long] = rows
      .filter(r => r.getString(0) == "c" &&
        r.getString(3) == countKeyByTable(r.getString(2)))
      .map(r => r.getString(2) -> r.getLong(4)).toMap

    // per-(table, side) moments + exact discrete quantiles from the
    // sorted degree histogram: smallest d whose cumulative count reaches
    // ceil(p·n) — DuckDB quantile_disc semantics, same math the fold
    // expression computed distributedly
    case class SideStats(edges: Long, groups: Long, mn: Any, mx: Any,
      avg: Any, q25: Any, q50: Any, q75: Any)
    def sideStats(i: Int, side: String): SideStats =
      histBySide.get((i, side)) match {
        case None | Some(Array()) =>
          SideStats(0L, 0L, null, null, null, null, null, null)
        case Some(h) =>
          val groups = h.map(_._2).sum
          val edges = h.map { case (d, c) => d * c }.sum
          def q(p: Double): Any = {
            val target = math.ceil(p * groups).toLong
            var cum = 0L
            var res: Any = null
            var j = 0
            while (res == null && j < h.length) {
              cum += h(j)._2
              if (cum >= target) res = Long.box(h(j)._1)
              j += 1
            }
            res
          }
          SideStats(edges, groups, h.head._1, h.last._1,
            edges.toDouble / groups, q(0.25), q(0.5), q(0.75))
      }
    val eRows = pg.edgeTables.zipWithIndex.map { case (e, i) =>
      val srcT = pg.vertexLabel(e.srcLabel).tableName
      val dstT = pg.vertexLabel(e.dstLabel).tableName
      val so = sideStats(i, "src")
      val si = sideStats(i, "dst")
      def iso(side: String, tbl: String): Long =
        vcntByTbl.getOrElse(tbl, 0L) - matchedBy.getOrElse((i, side), 0L)
      org.apache.spark.sql.Row(e.tableName, false, srcT, dstT,
        null, so.edges, so.groups, si.groups,
        iso("src", srcT), iso("dst", dstT),
        si.avg, si.mn, si.mx, si.q25, si.q50, si.q75,
        so.avg, so.mn, so.mx, so.q25, so.q50, so.q75)
    }
    // declaration order: vertex tables first, then edge tables (the
    // reference's UNION ALL of per-table CTEs)
    rowsDf(pg.vertexTables.map(v =>
      vRow(v.tableName, vcntByTbl.getOrElse(v.tableName, 0L))) ++ eRows)
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
