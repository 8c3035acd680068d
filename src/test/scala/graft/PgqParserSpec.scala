package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pgq._

/** Parser tests over query text taken verbatim from the reference corpus
  * (`test/sql/pattern_matching/basic_match.test`,
  * `test/sql/path_finding/shortest_path.test`, `test/sql/snb/snb.test`). */
class PgqParserSpec extends AnyFunSuite {

  test("basic GRAPH_TABLE with WHERE and COLUMNS") {
    val m = PgqParser.graphTable(
      """pg
         MATCH (a:Person)-[k:Knows]->(b:Person)
         WHERE a.name = 'Daniel'
         COLUMNS (a.name as a_name, b.name as b_name)""")
    assert(m.graphName == "pg")
    val p = m.patterns.head
    assert(p.vertices.map(_.varName) == Seq(Some("a"), Some("b")))
    assert(p.edges.head.direction == EdgeDirection.Right)
    assert(m.where.contains("a.name = 'Daniel'"))
    assert(m.columns == Seq(ColumnSpec("a.name", Some("a_name")),
      ColumnSpec("b.name", Some("b_name"))))
  }

  test("wrapped GRAPH_TABLE(...) form with trailing paren") {
    val m = PgqParser.graphTable(
      "GRAPH_TABLE (pg MATCH (a:Person)-[k:Knows]->(b:Person) COLUMNS (a.id))")
    assert(m.columns == Seq(ColumnSpec("a.id")))
  }

  test("all four edge directions, bracketed and bare") {
    def dir(s: String) = PgqParser.graphTable(
      s"pg MATCH (a:P)${s}(b:P) COLUMNS (a.id)").patterns.head.edges.head.direction
    assert(dir("-[e:K]->") == EdgeDirection.Right)
    assert(dir("<-[e:K]-") == EdgeDirection.Left)
    assert(dir("-[e:K]-") == EdgeDirection.Undirected)
    assert(dir("<-[e:K]->") == EdgeDirection.Both)
    assert(dir("->") == EdgeDirection.Right)
    assert(dir("<-") == EdgeDirection.Left)
    assert(dir("<->") == EdgeDirection.Both)
  }

  test("quantifiers incl. kleene forms — transform_pgq.cpp:501-526 defaults") {
    def q(s: String) = PgqParser.graphTable(
      s"pg MATCH p = ANY SHORTEST (a:P)-[e:K]->$s(b:P) COLUMNS (a.id)")
      .patterns.head.edges.head.quantifier
    assert(q("{1,3}").contains(Quantifier(1, Some(3))))
    assert(q("{2}").contains(Quantifier(2, Some(2))))
    assert(q("{,4}").contains(Quantifier(0, Some(4))))
    assert(q("{2,}").contains(Quantifier(2, None)))
    assert(q("*").contains(Quantifier(0, None)))
    assert(q("+").contains(Quantifier(1, None)))
    assert(q("?").contains(Quantifier(0, Some(1))))
  }

  test("named path + ANY SHORTEST + path funcs — shortest_path.test:61-66") {
    val m = PgqParser.graphTable(
      """pg MATCH
         p = ANY SHORTEST (a:Person WHERE a.name = 'Daniel')-[k:knows]->{1,3}(b:Person)
         COLUMNS (element_id(p), a.name as name, b.name as b_name)""")
    val p = m.patterns.head
    assert(p.pathVar.contains("p"))
    assert(p.prefix.contains(SearchPrefix.AnyShortest))
    assert(p.vertices.head.where.contains("a.name = 'Daniel'"))
    assert(m.columns.head == ColumnSpec("element_id(p)"))
  }

  test("multiple comma-separated patterns — multiple_graph_table.test") {
    val m = PgqParser.graphTable(
      "pg MATCH (a:P)-[e1:K]->(b:P), (b:P)-[e2:K]->(c:P) COLUMNS (a.id, c.id)")
    assert(m.patterns.length == 2)
  }

  test("aggregate and function expressions in COLUMNS") {
    val m = PgqParser.graphTable(
      "pg MATCH (a:P)-[e:K]->(b:P) COLUMNS (count(*) as n, avg(a.id) as av, a.*)")
    assert(m.columns == Seq(ColumnSpec("count(*)", Some("n")),
      ColumnSpec("avg(a.id)", Some("av")), ColumnSpec("a.*")))
  }

  test("CREATE PROPERTY GRAPH DDL — snb.test:12-53 shape") {
    val s = PgqParser.statement(
      """CREATE PROPERTY GRAPH pg
         VERTEX TABLES (
           Student PROPERTIES (id, name) LABEL Person,
           School LABEL SCHOOL,
           Organisation LABEL Org IN typemask (company, university)
         )
         EDGE TABLES (
           know SOURCE KEY (src) REFERENCES Student (id)
                DESTINATION KEY (dst) REFERENCES Student (id) LABEL Knows,
           studyAt SOURCE KEY (personId) REFERENCES Student (id)
                DESTINATION KEY (SchoolId) REFERENCES School (id) LABEL StudyAt
         )""").asInstanceOf[CreatePropertyGraphSpec]
    assert(s.name == "pg")
    assert(s.vertexTables.map(_.effectiveLabel) == Seq("Person", "SCHOOL", "Org"))
    assert(s.vertexTables(0).props == Seq("id", "name"))
    assert(s.vertexTables(2).discriminator.contains("typemask"))
    assert(s.vertexTables(2).subLabels == Seq("company", "university"))
    assert(s.edgeTables.map(_.effectiveLabel) == Seq("Knows", "StudyAt"))
    assert(s.edgeTables.head.srcKeys == Seq("src"))
    assert(s.edgeTables.head.dstRefTable == "Student")
  }

  test("properties variants — create_pg tests") {
    val s = PgqParser.statement(
      """CREATE OR REPLACE PROPERTY GRAPH g
         VERTEX TABLES (
           t1 NO PROPERTIES,
           t2 PROPERTIES ARE ALL COLUMNS EXCEPT (secret),
           t3 PROPERTIES ARE ALL COLUMNS
         )""").asInstanceOf[CreatePropertyGraphSpec]
    assert(s.orReplace)
    assert(s.vertexTables(0).propsMode == PropsMode.None_)
    assert(s.vertexTables(1).propsMode == PropsMode.AllExcept)
    assert(s.vertexTables(1).props == Seq("secret"))
    assert(s.vertexTables(2).propsMode == PropsMode.All)
  }

  test("DROP PROPERTY GRAPH [IF EXISTS]") {
    assert(PgqParser.statement("DROP PROPERTY GRAPH pg") ==
      DropPropertyGraphSpec("pg", ifExists = false))
    assert(PgqParser.statement("DROP PROPERTY GRAPH IF EXISTS pg") ==
      DropPropertyGraphSpec("pg", ifExists = true))
  }

  test("end-to-end: parsed text query compiles and matches golden") {
    val s = Fixture.init()
    val g = Graft(s, graft.model.TableResolver.catalog)
    g.registry.create(s, Fixture.pg, graft.model.TableResolver.catalog,
      orReplace = true)
    val df = g.graphTable(
      """pg MATCH (a:Person)-[k:Knows]->(b:Person)
         WHERE a.name = 'Daniel'
         COLUMNS (a.name as a_name, b.name as b_name)""")
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(rows.toSeq == Seq(("Daniel", "Gabor"), ("Daniel", "Peter"),
      ("Daniel", "Tavneet")))
  }

  test("bare element columns through the text front-end") {
    val s = Fixture.init()
    val g = Graft(s, graft.model.TableResolver.catalog)
    g.registry.create(s, Fixture.pg, graft.model.TableResolver.catalog,
      orReplace = true)
    val df = g.graphTable(
      """pg MATCH (a:Person)-[k:Knows]->(b:Person)
         WHERE a.name = 'Daniel' COLUMNS (a, k, b)""")
    assert(df.columns.toSeq == Seq("a", "k", "b"))
    assert(df.schema.fields.forall(_.dataType
      .isInstanceOf[org.apache.spark.sql.types.StructType]))
    assert(df.count() == 3)
  }

  test("full DDL-to-query round trip through Graft.sql") {
    val s = Fixture.init()
    val g = Graft(s, graft.model.TableResolver.catalog)
    g.sql("DROP PROPERTY GRAPH IF EXISTS pg2")
    g.sql("""CREATE PROPERTY GRAPH pg2
         VERTEX TABLES (
           student PROPERTIES (id, name) LABEL Person,
           school LABEL School
         )
         EDGE TABLES (
           know SOURCE KEY (src) REFERENCES student (id)
                DESTINATION KEY (dst) REFERENCES student (id) LABEL Knows,
           studyat SOURCE KEY (personid) REFERENCES student (id)
                DESTINATION KEY (schoolid) REFERENCES school (id) LABEL StudyAt
         )""")
    val df = g.sql(
      """GRAPH_TABLE (pg2 MATCH (a:Person)-[s:StudyAt]->(b:School)
         WHERE b.name = 'VU' COLUMNS (a.name as who))""")
    assert(df.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("Daniel", "Tavneet"))
  }
}
