package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.pgq._
import graft.compiler.GraphTableCompiler

/** DDL validation error parity (reference `create_pg/` test family and
  * `create_property_graph.cpp:57-191`) + edge-property projection. */
class DdlErrorSpec extends AnyFunSuite {
  import Fixture.{init, pg}

  private def create(g: PropertyGraph): Unit = {
    val s = init()
    new PropertyGraphRegistry().create(s, g, TableResolver.catalog)
  }

  test("duplicate label rejected") {
    val e = intercept[GraphAnalysisException] {
      create(PropertyGraph("dup", Seq(
        VertexTable("student", "Person", Seq("id")),
        VertexTable("school", "person", Seq("id"))), Nil))
    }
    assert(e.msg.contains("not unique"))
  }

  test("unknown column rejected at DDL time") {
    val e = intercept[GraphAnalysisException] {
      create(PropertyGraph("bad", Seq(
        VertexTable("student", "Person", Seq("id"),
          properties = Seq("id", "nosuchcol"))), Nil))
    }
    assert(e.msg.contains("Column 'nosuchcol' not found"))
  }

  test("edge referencing unregistered vertex label rejected") {
    val e = intercept[GraphAnalysisException] {
      create(PropertyGraph("bad2",
        Seq(VertexTable("student", "Person", Seq("id"))),
        Seq(EdgeTable("know", "Knows", Seq("src"), Seq("id"), "Person",
          Seq("dst"), Seq("id"), "Ghost"))))
    }
    assert(e.msg.contains("'Ghost'") && e.msg.contains("not registered"))
  }

  test("key count mismatch rejected") {
    val e = intercept[GraphAnalysisException] {
      create(PropertyGraph("bad3",
        Seq(VertexTable("student", "Person", Seq("id"))),
        Seq(EdgeTable("know", "Knows", Seq("src", "dst"), Seq("id"), "Person",
          Seq("dst"), Seq("id"), "Person"))))
    }
    assert(e.msg.contains("Key count mismatch"))
  }

  test("CREATE without OR REPLACE on existing graph fails; IF NOT EXISTS ok") {
    val s = init()
    val reg = new PropertyGraphRegistry()
    reg.create(s, pg, TableResolver.catalog)
    intercept[GraphAnalysisException] {
      reg.create(s, pg, TableResolver.catalog)
    }
    reg.create(s, pg, TableResolver.catalog, ifNotExists = true) // no throw
    reg.create(s, pg, TableResolver.catalog, orReplace = true)   // no throw
    reg.drop("pg")
    intercept[GraphAnalysisException] { reg.drop("pg") }
    reg.drop("pg", ifExists = true) // no throw
  }

  test("schema-qualified table names — 211_using_other_schemas.test") {
    val s = init()
    import s.implicits._
    Seq((1L, "x"), (2L, "y")).toDF("id", "name")
      .createOrReplaceGlobalTempView("qual_pers")
    Seq((1L, 2L)).toDF("src", "dst")
      .createOrReplaceGlobalTempView("qual_know")
    val g = Graft(s, TableResolver.catalog)
    g.sql("""CREATE OR REPLACE PROPERTY GRAPH qualpg
      VERTEX TABLES ("global_temp.qual_pers" LABEL QPerson)
      EDGE TABLES ("global_temp.qual_know"
        SOURCE KEY (src) REFERENCES "global_temp.qual_pers" (id)
        DESTINATION KEY (dst) REFERENCES "global_temp.qual_pers" (id)
        LABEL QKnows)""")
    val rows = g.graphTable(
      """qualpg MATCH (a:QPerson)-[k:QKnows]->(b:QPerson)
         COLUMNS (a.name AS an, b.name AS bn)""").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("x", "y")))
  }

  test("altered table is picked up lazily — altering_table.test") {
    val s = init()
    import s.implicits._
    Seq((100L, "Before")).toDF("id", "name")
      .createOrReplaceTempView("alter_t")
    val g = Graft(s, TableResolver.catalog)
    g.sql("""CREATE OR REPLACE PROPERTY GRAPH alterpg
      VERTEX TABLES (alter_t LABEL AV)""")
    // replace the backing view: new rows (and an extra column) appear on
    // the next query — registration is metadata-only, like the reference
    Seq((200L, "After", 1.5)).toDF("id", "name", "score")
      .createOrReplaceTempView("alter_t")
    val rows = g.graphTable(
      "alterpg MATCH (v:AV) COLUMNS (v.id AS id, v.name AS name)").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((200L, "After")))
  }

  test("vertex-only graph (no EDGE TABLES) — optional_edge_table_clause.test") {
    val s = init()
    val g = Graft(s, TableResolver.catalog)
    g.sql("DROP PROPERTY GRAPH IF EXISTS vonly")
    g.sql("CREATE PROPERTY GRAPH vonly VERTEX TABLES (student LABEL Person)")
    assert(g.graphTable(
      "vonly MATCH (m:Person) COLUMNS (m.id AS id)").count() == 5)
    // edge labels are unresolvable, with the reference's error shape
    val e = intercept[GraphAnalysisException] {
      g.graphTable(
        """vonly MATCH (p:Person)-[k:Knows]->(p2:Person)
           COLUMNS (p.id AS id)""")
    }
    assert(e.msg.contains("not registered"))
  }

  test("edge properties project in COLUMNS — basic_match edge columns") {
    val df = GraphTableCompiler.compile(init(), MatchSpec("pg",
      Seq(PathPattern(None, None, PathMode.Walk, Seq(
        VertexPattern(Some("a"), Some("Person")),
        EdgePattern(Some("k"), Some("Knows"), EdgeDirection.Right),
        VertexPattern(Some("b"), Some("Person"))))),
      where = Some("a.name = 'Daniel'"),
      columns = Seq(ColumnSpec("b.name", Some("b_name")),
        ColumnSpec("k.createdate", Some("since")))),
      pg, TableResolver.catalog)
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1))).sorted
    assert(rows.toSeq == Seq(("Gabor", 11L), ("Peter", 12L), ("Tavneet", 10L)))
  }
}
