package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** Property-graph metadata model.
  *
  * Mirrors the reference's data model (DuckPGQ `CreatePropertyGraphInfo`,
  * reference `src/include/duckpgq/parser/parsed_data/create_property_graph_info.hpp:26-38`
  * and `property_graph_table.hpp:21-105`): a property graph is a *named
  * metadata object* over existing tables — no data is copied. Vertex tables
  * carry a label + property column subset (+ optional sub-label
  * discriminator); edge tables additionally carry source/destination key
  * references to vertex tables.
  *
  * Spark-first design: tables are resolved lazily to DataFrames through a
  * [[TableResolver]] (catalog table, temp view, or parquet path), so the
  * registry itself stays tiny driver-side metadata while all data stays
  * distributed.
  */
final case class VertexTable(
    tableName: String,
    label: String,
    keyCols: Seq[String],
    /** Declared property columns; empty ⇒ ALL COLUMNS (reference
      * `create_property_graph.cpp:75-96`). */
    properties: Seq[String] = Nil,
    /** Sub-label support: `LABEL x IN disc (a, b)` — bitmask column
      * (reference `property_graph_table.hpp:40-54`, filter generated at
      * `match.cpp:278-296`). */
    discriminator: Option[String] = None,
    subLabels: Seq[String] = Nil) {
  def allLabels: Seq[String] = label +: subLabels
}

final case class EdgeTable(
    tableName: String,
    label: String,
    srcKeys: Seq[String],
    srcRefKeys: Seq[String],
    srcLabel: String,
    dstKeys: Seq[String],
    dstRefKeys: Seq[String],
    dstLabel: String,
    properties: Seq[String] = Nil,
    /** Optional DOUBLE/LONG weight column for cheapest-path kernels
      * (reference `csr_creation.cpp:222-236`). */
    weightCol: Option[String] = None,
    /** Optional numeric edge-identity column: when set, path arrays carry
      * these ids at the odd positions (the analogue of the reference's
      * edge rowids in `[v,e,v,…]` lists, shortest_path.cpp:212-217);
      * otherwise a deterministic hash id is synthesized and parallel
      * edges collapse. */
    edgeIdCol: Option[String] = None,
    /** Edge sub-labels share the reference grammar/fields with vertex
      * tables (`pgq.gram:18-24`, `property_graph_table.hpp:40-54`):
      * `LABEL x IN disc (a, b)` — bitmask discriminator column. */
    discriminator: Option[String] = None,
    subLabels: Seq[String] = Nil) {
  def allLabels: Seq[String] = label +: subLabels
}

final case class PropertyGraph(
    name: String,
    vertexTables: Seq[VertexTable],
    edgeTables: Seq[EdgeTable]) {

  /** label (lowercased) → vertex table; sub-labels included
    * (reference label registration `transform_pgq.cpp:130-163`). */
  lazy val vertexByLabel: Map[String, VertexTable] =
    vertexTables.flatMap(v => v.allLabels.map(l => l.toLowerCase -> v)).toMap

  lazy val edgeByLabel: Map[String, EdgeTable] =
    edgeTables.flatMap(e => e.allLabels.map(l => l.toLowerCase -> e)).toMap

  def vertexLabel(label: String): VertexTable =
    vertexByLabel.getOrElse(label.toLowerCase,
      throw GraphAnalysisException(
        s"Label '$label' is not registered in property graph '$name'!" +
          suggestion(label, vertexByLabel.keys.toSeq)))

  def edgeLabel(label: String): EdgeTable =
    edgeByLabel.getOrElse(label.toLowerCase,
      throw GraphAnalysisException(
        s"Label '$label' is not registered in property graph '$name'!" +
          suggestion(label, edgeByLabel.keys.toSeq)))

  /** Levenshtein-based "did you mean" suggestion, mirroring the reference's
    * friendly errors (`create_property_graph_info.hpp:146-212`). */
  private def suggestion(given_ : String, candidates: Seq[String]): String = {
    val best = candidates
      .map(c => c -> Levenshtein(given_.toLowerCase, c))
      .filter(_._2 <= math.max(2, given_.length / 2))
      .sortBy(_._2).headOption
    best.map(b => s" Did you mean '${b._1}'?").getOrElse("")
  }
}

final case class GraphAnalysisException(msg: String)
    extends RuntimeException(msg)

object Levenshtein {
  def apply(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}

/** Resolves a registered table name to a DataFrame. Implementations:
  * parquet-per-table directory (testdata layout) or the Spark catalog. */
trait TableResolver extends Serializable {
  def apply(spark: SparkSession, tableName: String): DataFrame
}

object TableResolver {
  /** `dir/<table>.parquet` layout used by the driver testdata. */
  def parquetDir(dir: String): TableResolver = new TableResolver {
    def apply(spark: SparkSession, t: String): DataFrame =
      spark.read.parquet(s"$dir/$t.parquet")
  }
  /** Catalog / temp-view resolution. Names that don't parse as a bare
    * multi-part identifier (reserved words like `select`, names with
    * spaces — reference generated_sql_quoting.test registers table
    * `"select"`) are retried backtick-quoted as a single-part name. */
  val catalog: TableResolver = new TableResolver {
    def apply(spark: SparkSession, t: String): DataFrame =
      try spark.table(t)
      catch {
        case e: org.apache.spark.sql.catalyst.parser.ParseException =>
          // NonFatal only: an OOM/interrupt during the retry must
          // propagate, not be masked by the original parse error
          try spark.table(s"`${t.replace("`", "``")}`")
          catch { case scala.util.control.NonFatal(_) => throw e }
      }
  }
}

/** Persistent property-graph catalog — the analogue of the reference's
  * `__duckpgq_internal` table (DDL `src/duckpgq_state.cpp:5-32`, insert
  * `create_property_graph.cpp:346-449`, reload `duckpgq_state.cpp:34-160`):
  * one row per registered vertex/edge table, written as a tiny JSON table
  * under a user-configured location (`spark.graft.catalog`) and lazily
  * reloaded by fresh sessions, so CREATE PROPERTY GRAPH survives process
  * restarts just like the reference's cross-connection persistence.
  */
object GraftCatalog {
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  /** Spark conf key holding the catalog directory; unset ⇒ in-memory only. */
  val ConfKey = "spark.graft.catalog"

  private def arr = ArrayType(StringType)
  private val schema = StructType(Seq(
    StructField("property_graph", StringType),
    StructField("table_name", StringType),
    StructField("label", StringType),
    StructField("is_vertex_table", BooleanType),
    StructField("key_cols", arr),
    StructField("properties", arr),
    StructField("discriminator", StringType),
    StructField("sub_labels", arr),
    StructField("source_key", arr),
    StructField("source_ref_key", arr),
    StructField("source_label", StringType),
    StructField("destination_key", arr),
    StructField("destination_ref_key", arr),
    StructField("destination_label", StringType),
    StructField("weight_col", StringType),
    StructField("edge_id_col", StringType),
    StructField("table_index", IntegerType)))

  def save(spark: SparkSession, dir: String,
      graphs: Seq[PropertyGraph]): Unit = {
    val rows: Seq[Row] = graphs.flatMap { pg =>
      pg.vertexTables.zipWithIndex.map { case (v, i) =>
        Row(pg.name, v.tableName, v.label, true, v.keyCols, v.properties,
          v.discriminator.orNull, v.subLabels, null, null, null, null, null,
          null, null, null, i)
      } ++ pg.edgeTables.zipWithIndex.map { case (e, i) =>
        Row(pg.name, e.tableName, e.label, false, null, e.properties,
          e.discriminator.orNull, e.subLabels, e.srcKeys, e.srcRefKeys,
          e.srcLabel, e.dstKeys, e.dstRefKeys, e.dstLabel,
          e.weightCol.orNull, e.edgeIdCol.orNull, i)
      }
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
      .coalesce(1).write.mode("overwrite").json(dir)
  }

  def load(spark: SparkSession, dir: String): Seq[PropertyGraph] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Nil
    val rows = spark.read.schema(schema).json(dir).collect()
    def strs(r: Row, f: String): Seq[String] =
      Option(r.getAs[scala.collection.Seq[String]](f))
        .map(_.toSeq).getOrElse(Nil)
    rows.groupBy(_.getAs[String]("property_graph")).map { case (name, rs) =>
      val (vs, es) = rs.partition(_.getAs[Boolean]("is_vertex_table"))
      PropertyGraph(name,
        vs.sortBy(_.getAs[Int]("table_index")).toSeq.map(r =>
          VertexTable(r.getAs[String]("table_name"), r.getAs[String]("label"),
            strs(r, "key_cols"), strs(r, "properties"),
            Option(r.getAs[String]("discriminator")), strs(r, "sub_labels"))),
        es.sortBy(_.getAs[Int]("table_index")).toSeq.map(r =>
          EdgeTable(r.getAs[String]("table_name"), r.getAs[String]("label"),
            strs(r, "source_key"), strs(r, "source_ref_key"),
            r.getAs[String]("source_label"),
            strs(r, "destination_key"), strs(r, "destination_ref_key"),
            r.getAs[String]("destination_label"),
            strs(r, "properties"),
            Option(r.getAs[String]("weight_col")),
            Option(r.getAs[String]("edge_id_col")),
            Option(r.getAs[String]("discriminator")),
            strs(r, "sub_labels"))))
    }.toSeq
  }
}

/** Session-scoped property-graph registry — the analogue of
  * `DuckPGQState` (reference `src/include/duckpgq_state.hpp:12-39`) +
  * the `__duckpgq_internal` persistence table
  * (`src/duckpgq_state.cpp:5-32`). Thread-safe; one namespace per
  * SparkSession (keyed weakly by session hash). When
  * `spark.graft.catalog` is set, graphs persist to that directory and a
  * fresh registry lazily reloads them (reference
  * `RetrievePropertyGraphs`, duckpgq_state.cpp:34-160).
  */
final class PropertyGraphRegistry {
  private val graphs = new TrieMap[String, PropertyGraph]()
  @volatile private var loaded = false

  private def catalogDir(spark: SparkSession): Option[String] =
    spark.conf.getOption(GraftCatalog.ConfKey)

  /** Lazy reload from the persistent catalog, once per registry —
    * in-memory registrations take precedence on name collision. The
    * loaded latch is only set when a catalog dir was actually read:
    * latching with no dir configured would skip the load forever and a
    * later persist() would overwrite the catalog with only the in-memory
    * graphs, silently erasing previously saved ones. */
  private def ensureLoaded(spark: SparkSession): Unit =
    if (!loaded) synchronized {
      if (!loaded) {
        catalogDir(spark).foreach { dir =>
          GraftCatalog.load(spark, dir)
            .foreach(g => graphs.putIfAbsent(g.name.toLowerCase, g))
          loaded = true
        }
      }
    }

  private def persist(spark: SparkSession): Unit =
    catalogDir(spark).foreach(dir =>
      GraftCatalog.save(spark, dir, graphs.values.toSeq.sortBy(_.name)))

  /** CREATE [OR REPLACE] PROPERTY GRAPH [IF NOT EXISTS]
    * (reference `create_property_graph.cpp:193-305`, conflict handling
    * `:330-344`). Validates all referenced columns against live schemas. */
  def create(
      spark: SparkSession,
      pg: PropertyGraph,
      resolver: TableResolver,
      orReplace: Boolean = false,
      ifNotExists: Boolean = false): Unit = {
    ensureLoaded(spark)
    if (graphs.contains(pg.name.toLowerCase) && !orReplace) {
      if (ifNotExists) return
      // reference text, create_property_graph.cpp conflict handling
      throw GraphAnalysisException(
        s"Property graph table with name ${pg.name} already exists")
    }
    validate(spark, pg, resolver)
    graphs.put(pg.name.toLowerCase, pg)
    persist(spark)
  }

  /** DROP PROPERTY GRAPH [IF EXISTS]
    * (reference `drop_property_graph.cpp:11-58`). */
  def drop(spark: SparkSession, name: String, ifExists: Boolean): Unit = {
    ensureLoaded(spark)
    if (graphs.remove(name.toLowerCase).isEmpty && !ifExists)
      throw GraphAnalysisException(s"Property graph '$name' does not exist!")
    else persist(spark)
  }

  /** In-memory-only drop (no catalog interaction). */
  def drop(name: String, ifExists: Boolean = false): Unit = {
    if (graphs.remove(name.toLowerCase).isEmpty && !ifExists)
      throw GraphAnalysisException(s"Property graph '$name' does not exist!")
  }

  def get(spark: SparkSession, name: String): PropertyGraph = {
    ensureLoaded(spark)
    get(name)
  }

  def get(name: String): PropertyGraph =
    graphs.getOrElse(name.toLowerCase,
      throw GraphAnalysisException(
        s"Property graph '$name' does not exist!"))

  def list(spark: SparkSession): Seq[String] = {
    ensureLoaded(spark)
    list()
  }

  def list(): Seq[String] = graphs.keys.toSeq.sorted

  def clear(): Unit = { graphs.clear(); loaded = false }

  /** DDL-time schema validation, mirroring reference
    * `create_property_graph.cpp:57-191`: every key/property/discriminator
    * column must exist; labels must be unique. */
  private def validate(
      spark: SparkSession, pg: PropertyGraph, r: TableResolver): Unit = {
    val seen = scala.collection.mutable.Set[String]()
    def checkLabel(l: String): Unit = {
      if (!seen.add(l.toLowerCase))
        throw GraphAnalysisException(s"Label '$l' is not unique!")
    }
    def checkCols(t: String, schema: Seq[String], cols: Seq[String]): Unit = {
      val have = schema.map(_.toLowerCase).toSet
      cols.find(c => !have.contains(c.toLowerCase)).foreach { c =>
        throw GraphAnalysisException(s"Column '$c' not found in table '$t'!")
      }
    }
    // reference text for a missing base table
    // (create_property_graph.cpp table lookup)
    def resolve(t: String) =
      try r(spark, t)
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          throw GraphAnalysisException(
            s"Table with name $t does not exist")
      }
    pg.vertexTables.foreach { v =>
      v.allLabels.foreach(checkLabel)
      val cols = resolve(v.tableName).columns.toSeq
      checkCols(v.tableName, cols, v.keyCols ++ v.properties ++ v.discriminator)
    }
    pg.edgeTables.foreach { e =>
      e.allLabels.foreach(checkLabel)
      val cols = resolve(e.tableName).columns.toSeq
      checkCols(e.tableName, cols,
        e.srcKeys ++ e.dstKeys ++ e.properties ++ e.weightCol ++
          e.discriminator)
      val srcV = pg.vertexByLabel.getOrElse(e.srcLabel.toLowerCase,
        throw GraphAnalysisException(
          s"Referenced vertex label '${e.srcLabel}' of edge '${e.label}' is not registered!"))
      val dstV = pg.vertexByLabel.getOrElse(e.dstLabel.toLowerCase,
        throw GraphAnalysisException(
          s"Referenced vertex label '${e.dstLabel}' of edge '${e.label}' is not registered!"))
      checkCols(srcV.tableName, resolve(srcV.tableName).columns.toSeq, e.srcRefKeys)
      checkCols(dstV.tableName, resolve(dstV.tableName).columns.toSeq, e.dstRefKeys)
      if (e.srcKeys.length != e.srcRefKeys.length ||
          e.dstKeys.length != e.dstRefKeys.length)
        throw GraphAnalysisException(
          s"Key count mismatch in edge table '${e.tableName}'!")
    }
  }
}

object PropertyGraphRegistry {
  // weak keys: a stopped/abandoned SparkSession must not be pinned by its
  // registry (long-lived multi-tenant drivers create many sessions)
  private val bySession = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, PropertyGraphRegistry]())
  def forSession(spark: SparkSession): PropertyGraphRegistry =
    bySession.synchronized {
      val existing = bySession.get(spark)
      if (existing != null) existing
      else {
        val r = new PropertyGraphRegistry
        bySession.put(spark, r)
        r
      }
    }
}
