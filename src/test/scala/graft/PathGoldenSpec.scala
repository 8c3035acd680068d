package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model._

/** Replays `test/sql/path_finding/subpath_match.test` and
  * `undirected_paths.test` golden outputs through the text front end —
  * the 9-edge Student/know fixture (one extra 2→4 edge vs the
  * basic_match fixture). */
class PathGoldenSpec extends AnyFunSuite {

  private def graftWithFixture(): Graft = {
    val s = Fixture.init()
    import s.implicits._
    Seq((0L, "Daniel"), (1L, "Tavneet"), (2L, "Gabor"), (3L, "Peter"),
      (4L, "David")).toDF("id", "name")
      .createOrReplaceTempView("student9")
    Seq((0L, 1L, 10L), (0L, 2L, 11L), (0L, 3L, 12L), (3L, 0L, 13L),
      (1L, 2L, 14L), (1L, 3L, 15L), (2L, 3L, 16L), (4L, 3L, 17L),
      (2L, 4L, 18L)).toDF("src", "dst", "id")
      .createOrReplaceTempView("know9")
    val g = Graft(s, TableResolver.catalog)
    g.sql("DROP PROPERTY GRAPH IF EXISTS pg9")
    g.sql("""CREATE PROPERTY GRAPH pg9
      VERTEX TABLES (student9 PROPERTIES (id, name) LABEL Person)
      EDGE TABLES (know9
        SOURCE KEY (src) REFERENCES student9 (id)
        DESTINATION KEY (dst) REFERENCES student9 (id)
        PROPERTIES (id) LABEL Knows)""")
    g
  }

  test("edge property WHERE in a fixed hop — subpath_match.test:44-52") {
    val g = graftWithFixture()
    val got = g.graphTable(
      """pg9 MATCH (a:Person)-[k:Knows WHERE k.id = 10]->(b:Person)
         COLUMNS (a.id AS a_id, b.id AS b_id)""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 1L)))
  }

  test("unbounded * without prefix errors — subpath_match.test:88-96") {
    val g = graftWithFixture()
    val e = intercept[GraphAnalysisException] {
      g.graphTable(
        """pg9 MATCH (a:Person WHERE a.name = 'Peter')-[k:Knows]->*(b:Person)
           COLUMNS (a.name AS a_name, b.name AS b_name)""").collect()
    }
    assert(e.msg.contains("infinite results"))
    val e2 = intercept[GraphAnalysisException] {
      g.graphTable(
        """pg9 MATCH (a:Person)-[k:Knows]->+(b:Person)
           WHERE a.name = 'Peter'
           COLUMNS (a.name AS a_name, b.name AS b_name)""").collect()
    }
    assert(e2.msg.contains("infinite results"))
  }

  test("bounded {1,2} without prefix = min-dist between bounds — subpath_match.test:99-110") {
    val g = graftWithFixture()
    val got = g.graphTable(
      """pg9 MATCH (a:Person)-[k:Knows]->{1,2}(b:Person)
         WHERE a.name = 'Peter'
         COLUMNS (a.name AS a_name, b.name AS b_name)""")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // golden: Peter reaches Daniel (1), Tavneet (2), Gabor (2); NOT
    // himself (min dist 0 is outside [1,2])
    assert(got == Set(("Peter", "Daniel"), ("Peter", "Tavneet"),
      ("Peter", "Gabor")))
  }

  test("arrow token spacing variants — parser_arrow_kleene.test") {
    val g = graftWithFixture()
    // all legal spacings of `]-> *` parse to the same query
    for (arrow <- Seq("]->*", "]-> *", "]- > *", "] - > *", "] -> *")) {
      val got = g.graphTable(
        s"""pg9 MATCH ANY SHORTEST (a:Person WHERE a.id = 0)-[e:Knows$arrow(b:Person)
           COLUMNS (a.id AS a_id, b.id AS b_id)""")
      assert(got.count() == 5, s"arrow form '$arrow'")
    }
    // malformed forms are syntax errors, as in the reference
    for (bad <- Seq(
        "pg9 MATCH ANY SHORTEST (a:Person)-[e:Knows]< -> *(b:Person) COLUMNS (a.id)",
        "pg9 MATCH ANY SHORTEST (a:Person)-[e:Knows] /-> *(b:Person) COLUMNS (a.id)",
        "pg9 MATCH ANY SHORTEST (a:Person)-[e2:Knows] > *(b:Person) COLUMNS (a.id)",
        "pg9 MATCH ANY SHORTEST (a:Person)-[e:Knows]*(b:Person) COLUMNS (a.id)")) {
      intercept[Exception] { g.graphTable(bad) }
    }
  }

  test("undirected ANY SHORTEST * from 0 and 4 — undirected_paths.test:23-49") {
    val g = graftWithFixture()
    val from0 = g.graphTable(
      """pg9 MATCH o = ANY SHORTEST (a:Person WHERE a.id = 0)-[e:Knows]-*(b:Person)
         COLUMNS (a.id AS a_id, b.id AS b_id, path_length(o) AS len)""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(from0 == Seq((0L, 0L, 0L), (0L, 1L, 1L), (0L, 2L, 1L),
      (0L, 3L, 1L), (0L, 4L, 2L)))
    val from4 = g.graphTable(
      """pg9 MATCH o = ANY SHORTEST (a:Person WHERE a.id = 4)-[e:Knows]-*(b:Person)
         COLUMNS (a.id AS a_id, b.id AS b_id, path_length(o) AS len)""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(from4 == Seq((4L, 0L, 2L), (4L, 1L, 2L), (4L, 2L, 1L),
      (4L, 3L, 1L), (4L, 4L, 0L)))
  }
}
