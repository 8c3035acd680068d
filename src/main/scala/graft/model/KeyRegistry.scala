package graft.model

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

/** A declared foreign-key relationship: `fkCols` of the owning table
  * reference `pkCols` of `refTable`. */
final case class ForeignKeySpec(fkCols: Seq[String], refTable: String,
    pkCols: Seq[String])

/** Declared key constraints of one table — the metadata the reference
  * reads from DuckDB's real PRIMARY KEY / FOREIGN KEY catalog constraints
  * when `CREATE PROPERTY GRAPH … SOURCE <table>` omits the explicit KEY
  * clause (`create_property_graph.cpp:106-154`). Spark's catalog carries
  * no constraints, so graft keeps them in a session registry, populated
  * by [[KeyRegistry.register]] (e.g. from the sqllogictest runner's
  * CREATE TABLE handling, or directly by users declaring their lakehouse
  * keys). */
final case class TableKeys(pk: Seq[String] = Nil,
    fks: Seq[ForeignKeySpec] = Nil) {
  def hasAny: Boolean = pk.nonEmpty || fks.nonEmpty
}

/** Session-scoped registry of declared table keys — the stand-in for the
  * host catalog's constraint store during PK/FK key inference. */
final class KeyRegistry {
  private val keys = new TrieMap[String, TableKeys]()

  def register(table: String, tk: TableKeys): Unit =
    keys.put(table.toLowerCase, tk)

  def get(table: String): Option[TableKeys] = keys.get(table.toLowerCase)

  def drop(table: String): Unit = keys.remove(table.toLowerCase)

  def clear(): Unit = keys.clear()
}

object KeyRegistry {
  private val bySession = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, KeyRegistry]())
  def forSession(spark: SparkSession): KeyRegistry =
    bySession.synchronized {
      val existing = bySession.get(spark)
      if (existing != null) existing
      else {
        val r = new KeyRegistry
        bySession.put(spark, r)
        r
      }
    }
}
