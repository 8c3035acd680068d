package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.model.TableResolver
import graft.pgq.PgqParser
import graft.ddl.Introspect
import graft.graph.Algorithms

/** Quoted-identifier surface (reference `test/sql/generated_sql_quoting.test`):
  * backing tables and columns named with reserved words (`select`, `from`,
  * `group`) and embedded spaces (`Name Value`, `source key`) must survive
  * DDL, MATCH compilation, SUMMARIZE, and the algorithm table functions.
  * Plus the COLUMNS-clause ergonomics of `optional_columns.test` (trailing
  * comma, omitted clause) and the keyword-collision guard of
  * `pgq_keywords.test`. */
class QuotingSpec extends AnyFunSuite {

  private def mkGraft: Graft = {
    val s: SparkSession = Fixture.init()
    s.sql("""CREATE OR REPLACE TEMP VIEW `select` AS
             SELECT * FROM VALUES (1L,'Alice'),(2L,'Bob'),(3L,'Carol')
             AS t(`from`, `Name Value`)""")
    s.sql("""CREATE OR REPLACE TEMP VIEW `group` AS
             SELECT * FROM VALUES (1L,2L),(1L,3L),(2L,3L)
             AS t(`source key`, `destination key`)""")
    val g = Graft(s, TableResolver.catalog)
    g.sql("""CREATE OR REPLACE PROPERTY GRAPH pg_quoted
      VERTEX TABLES (
        "select" PROPERTIES ("from", "Name Value") LABEL person
      )
      EDGE TABLES (
        "group" SOURCE KEY ("source key") REFERENCES "select" ("from")
                DESTINATION KEY ("destination key") REFERENCES "select" ("from")
                LABEL knows
      )""")
    g
  }

  test("MATCH over quoted tables/columns — generated_sql_quoting.test:47-57") {
    val rows = mkGraft.graphTable(
      """pg_quoted MATCH (a:person)-[k:knows]->(b:person)
         COLUMNS (a."from" AS src_id, b."Name Value" AS dst_name)""")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(rows == Seq((1L, "Bob"), (1L, "Carol"), (2L, "Carol")))
  }

  test("quoted idents in WHERE and star expansion") {
    val g = mkGraft
    val df = g.graphTable(
      """pg_quoted MATCH (a:person)-[k:knows]->(b:person)
         WHERE b."Name Value" = 'Carol' AND a."from" < 2
         COLUMNS (a.*)""")
    assert(df.columns.toSeq == Seq("from", "Name Value"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("SUMMARIZE + pagerank over the quoted graph — generated_sql_quoting.test:36-46") {
    val g = mkGraft
    val pg = g.registry.get(g.spark, "pg_quoted")
    val sm = Introspect.summarize(g.spark, pg, TableResolver.catalog)
      .selectExpr("table_name", "is_vertex_table",
        "coalesce(vertex_count, edge_count)")
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getLong(2)))
      .toSeq
    assert(sm.contains(("select", true, 3L))) // 3 vertices
    assert(sm.contains(("group", false, 3L))) // 3 edges
    val pr = Algorithms.pagerank(g.spark, pg, TableResolver.catalog,
      "person", "knows")
    assert(pr.count() == 3L)
  }

  test("trailing comma in COLUMNS — optional_columns.test:49") {
    val spec = PgqParser.graphTable(
      "pg MATCH (p:Person) COLUMNS (p.id as p_id,)")
    assert(spec.columns.map(c => (c.expr, c.alias)) ==
      Seq(("p.id", Some("p_id"))))
    val ids = Fixture.matchDF(spec).collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("omitted COLUMNS clause = all vertex columns — optional_columns.test:31") {
    val df = Fixture.matchDF(PgqParser.graphTable("pg MATCH (p:Person)"))
    assert(df.columns.toSeq == Seq("id", "name"))
    assert(df.count() == 5L)
  }

  test("PGQ keywords stay usable in plain SQL — pgq_keywords.test") {
    val g = mkGraft
    // `path`/`group` as aliases must pass through the GRAPH_TABLE rewriter
    // untouched (no GRAPH_TABLE token → no rewrite)
    val q1 = "select 1 as path"
    val q2 = "select 1 as group"
    assert(g.rewriteGraphTables(q1) == q1)
    assert(g.sqlGraph(q1).collect().head.getInt(0) == 1)
    assert(g.sqlGraph(q2).collect().head.getInt(0) == 1)
  }

  test("quoted-ident normalization is string-literal aware") {
    val spec = PgqParser.graphTable(
      """pg MATCH (p:Person) WHERE p.name = 'say "hi"'
         COLUMNS (p.id AS "the id")""")
    assert(spec.where.contains("""p.name = 'say "hi"'"""))
    assert(spec.columns.head.alias.contains("the id"))
  }
}
