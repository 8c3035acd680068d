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
    edgeIdCol: Option[String] = None)

final case class PropertyGraph(
    name: String,
    vertexTables: Seq[VertexTable],
    edgeTables: Seq[EdgeTable]) {

  /** label (lowercased) → vertex table; sub-labels included
    * (reference label registration `transform_pgq.cpp:130-163`). */
  lazy val vertexByLabel: Map[String, VertexTable] =
    vertexTables.flatMap(v => v.allLabels.map(l => l.toLowerCase -> v)).toMap

  lazy val edgeByLabel: Map[String, EdgeTable] =
    edgeTables.map(e => e.label.toLowerCase -> e).toMap

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
  /** Catalog / temp-view resolution. */
  val catalog: TableResolver = new TableResolver {
    def apply(spark: SparkSession, t: String): DataFrame = spark.table(t)
  }
}

/** Session-scoped property-graph registry — the analogue of
  * `DuckPGQState` (reference `src/include/duckpgq_state.hpp:12-39`) +
  * the `__duckpgq_internal` persistence table
  * (`src/duckpgq_state.cpp:5-32`). Thread-safe; one namespace per
  * SparkSession (keyed weakly by session hash).
  */
final class PropertyGraphRegistry {
  private val graphs = new TrieMap[String, PropertyGraph]()

  /** CREATE [OR REPLACE] PROPERTY GRAPH [IF NOT EXISTS]
    * (reference `create_property_graph.cpp:193-305`, conflict handling
    * `:330-344`). Validates all referenced columns against live schemas. */
  def create(
      spark: SparkSession,
      pg: PropertyGraph,
      resolver: TableResolver,
      orReplace: Boolean = false,
      ifNotExists: Boolean = false): Unit = {
    if (graphs.contains(pg.name.toLowerCase) && !orReplace) {
      if (ifNotExists) return
      throw GraphAnalysisException(
        s"Property graph '${pg.name}' already exists!")
    }
    validate(spark, pg, resolver)
    graphs.put(pg.name.toLowerCase, pg)
  }

  /** DROP PROPERTY GRAPH [IF EXISTS]
    * (reference `drop_property_graph.cpp:11-58`). */
  def drop(name: String, ifExists: Boolean = false): Unit = {
    if (graphs.remove(name.toLowerCase).isEmpty && !ifExists)
      throw GraphAnalysisException(s"Property graph '$name' does not exist!")
  }

  def get(name: String): PropertyGraph =
    graphs.getOrElse(name.toLowerCase,
      throw GraphAnalysisException(
        s"Property graph '$name' does not exist!"))

  def list(): Seq[String] = graphs.keys.toSeq.sorted

  def clear(): Unit = graphs.clear()

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
    pg.vertexTables.foreach { v =>
      v.allLabels.foreach(checkLabel)
      val cols = r(spark, v.tableName).columns.toSeq
      checkCols(v.tableName, cols, v.keyCols ++ v.properties ++ v.discriminator)
    }
    pg.edgeTables.foreach { e =>
      checkLabel(e.label)
      val cols = r(spark, e.tableName).columns.toSeq
      checkCols(e.tableName, cols,
        e.srcKeys ++ e.dstKeys ++ e.properties ++ e.weightCol)
      val srcV = pg.vertexByLabel.getOrElse(e.srcLabel.toLowerCase,
        throw GraphAnalysisException(
          s"Referenced vertex label '${e.srcLabel}' of edge '${e.label}' is not registered!"))
      val dstV = pg.vertexByLabel.getOrElse(e.dstLabel.toLowerCase,
        throw GraphAnalysisException(
          s"Referenced vertex label '${e.dstLabel}' of edge '${e.label}' is not registered!"))
      checkCols(srcV.tableName, r(spark, srcV.tableName).columns.toSeq, e.srcRefKeys)
      checkCols(dstV.tableName, r(spark, dstV.tableName).columns.toSeq, e.dstRefKeys)
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
