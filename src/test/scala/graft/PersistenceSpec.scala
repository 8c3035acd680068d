package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model._

/** Property-graph catalog persistence (reference `__duckpgq_internal`,
  * duckpgq_state.cpp:5-32 DDL, :34-160 reload, insert
  * create_property_graph.cpp:346-449) and edge-table sub-labels
  * (grammar pgq.gram:18-24 — discriminator fields shared with vertex
  * tables, property_graph_table.hpp:40-54).
  */
class PersistenceSpec extends AnyFunSuite {
  import Fixture.{init, pg}

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$tag")
    d.toFile.deleteOnExit()
    s"$d/catalog"
  }

  test("created graph survives a registry restart — multiple_connections.test shape") {
    val s = init()
    val dir = tmpDir("persist")
    s.conf.set(GraftCatalog.ConfKey, dir)
    try {
      val r1 = new PropertyGraphRegistry
      r1.create(s, pg, TableResolver.catalog)
      // fresh registry = new connection/process: lazy catalog reload
      val r2 = new PropertyGraphRegistry
      val got = r2.get(s, "pg")
      assert(got == pg)
      assert(r2.list(s) == Seq("pg"))
    } finally s.conf.unset(GraftCatalog.ConfKey)
  }

  test("DROP removes the graph from the persistent catalog") {
    val s = init()
    val dir = tmpDir("drop")
    s.conf.set(GraftCatalog.ConfKey, dir)
    try {
      val r1 = new PropertyGraphRegistry
      r1.create(s, pg, TableResolver.catalog)
      r1.drop(s, "pg", ifExists = false)
      val r2 = new PropertyGraphRegistry
      intercept[GraphAnalysisException] { r2.get(s, "pg") }
    } finally s.conf.unset(GraftCatalog.ConfKey)
  }

  test("every optional field round-trips through the catalog") {
    val s = init()
    val dir = tmpDir("fields")
    val full = PropertyGraph("full",
      Seq(VertexTable("student", "Person", Seq("id"), Seq("id", "name"),
        Some("id"), Seq("Sub1", "Sub2"))),
      Seq(EdgeTable("know", "Knows", Seq("src"), Seq("id"), "Person",
        Seq("dst"), Seq("id"), "Person", Seq("createdate"),
        weightCol = Some("createdate"), edgeIdCol = Some("createdate"),
        discriminator = Some("createdate"), subLabels = Seq("Old", "New"))))
    s.conf.set(GraftCatalog.ConfKey, dir)
    try {
      val r1 = new PropertyGraphRegistry
      r1.create(s, full, TableResolver.catalog)
      val got = new PropertyGraphRegistry().get(s, "full")
      assert(got == full)
    } finally s.conf.unset(GraftCatalog.ConfKey)
  }

  test("unset catalog conf keeps the registry in-memory only") {
    val s = init()
    val r1 = new PropertyGraphRegistry
    r1.create(s, pg, TableResolver.catalog)
    val r2 = new PropertyGraphRegistry
    intercept[GraphAnalysisException] { r2.get(s, "pg") }
  }

  test("edge sub-label DDL text round trip: typemask filters the edge scan") {
    val s = init()
    import s.implicits._
    // know edges with a bitmask discriminator column
    Seq((0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 3L), (1L, 2L, 1L))
      .toDF("src", "dst", "kind").createOrReplaceTempView("know_typed")
    val g = Graft(s, TableResolver.catalog)
    g.sql("DROP PROPERTY GRAPH IF EXISTS pgsub")
    g.sql("""CREATE PROPERTY GRAPH pgsub
      VERTEX TABLES (student PROPERTIES (id, name) LABEL Person)
      EDGE TABLES (know_typed
        SOURCE KEY (src) REFERENCES student (id)
        DESTINATION KEY (dst) REFERENCES student (id)
        LABEL Typed IN kind (FriendOf, ColleagueOf))""")
    // bit 0 (mask 1): rows with kind & 1 = 1 → (0,1,1),(0,3,3),(1,2,1)
    val friends = g.graphTable(
      """pgsub MATCH (a:Person)-[e:FriendOf]->(b:Person)
         COLUMNS (a.id AS aid, b.id AS bid)""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(friends == Set((0L, 1L), (0L, 3L), (1L, 2L)))
    // bit 1 (mask 2): rows with kind & 2 = 2 → (0,2,2),(0,3,3)
    val colleagues = g.graphTable(
      """pgsub MATCH (a:Person)-[e:ColleagueOf]->(b:Person)
         COLUMNS (a.id AS aid, b.id AS bid)""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(colleagues == Set((0L, 2L), (0L, 3L)))
    // main label still matches all rows
    assert(g.graphTable(
      """pgsub MATCH (a:Person)-[e:Typed]->(b:Person)
         COLUMNS (a.id AS aid)""").count() == 4)
  }

  test("edge sub-label on a quantified edge constrains the BFS edge set") {
    val s = init()
    import s.implicits._
    Seq((0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 2L))
      .toDF("src", "dst", "kind").createOrReplaceTempView("know_typed2")
    val g = Graft(s, TableResolver.catalog)
    g.sql("DROP PROPERTY GRAPH IF EXISTS pgsub2")
    g.sql("""CREATE PROPERTY GRAPH pgsub2
      VERTEX TABLES (student PROPERTIES (id, name) LABEL Person)
      EDGE TABLES (know_typed2
        SOURCE KEY (src) REFERENCES student (id)
        DESTINATION KEY (dst) REFERENCES student (id)
        LABEL Typed IN kind (FriendOf, ColleagueOf))""")
    // only kind&1 edges traversed: 0→1→2 reachable, 3 is not
    val got = g.graphTable(
      """pgsub2 MATCH ANY SHORTEST (a:Person)-[e:FriendOf]->+(b:Person)
         WHERE a.id = 0
         COLUMNS (b.id AS bid)""")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }
}
