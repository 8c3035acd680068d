package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.TableResolver

/** Replays the reference's `pattern_matching/inheritance_support.test`
  * (sub-label discrimination via a bitmask column, case-insensitive label
  * lookup, star expansion over sub-labeled tables) and
  * `path_finding/edgeless_graph.test` (unbounded `*` over an EMPTY edge
  * table → the three dist-0 self paths). */
class InheritanceSpec extends AnyFunSuite {

  private def mkGraft: Graft = {
    val s = Fixture.init()
    import s.implicits._
    // fixture from inheritance_support.test:10-39 (mask = typemask bits:
    // university = 1, company = 2)
    Seq((0L, "Daniel"), (1L, "Tavneet"), (2L, "Gabor"), (3L, "Peter"),
      (4L, "David")).toDF("id", "name").createOrReplaceTempView("iperson")
    Seq(("VU", 0L, 1L), ("UvA", 1L, 1L), ("EY", 2L, 2L), ("CWI", 3L, 2L))
      .toDF("name", "id", "mask").createOrReplaceTempView("iorganisation")
    Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (3L, 0L), (4L, 3L)).toDF("personid", "organisationid")
      .createOrReplaceTempView("iworksat")
    val g = Graft(s, TableResolver.catalog)
    g.sql("""CREATE OR REPLACE PROPERTY GRAPH ipg
      VERTEX TABLES (
        iperson LABEL Person,
        iorganisation LABEL Organisation IN mask(university, company)
      )
      EDGE TABLES (
        iworksat SOURCE KEY (personid) REFERENCES iperson (id)
                 DESTINATION KEY (organisationid) REFERENCES iorganisation (id)
                 LABEL worksAt
      )""")
    g
  }

  private def rows(g: Graft, label: String): Set[(Long, String, Long, String)] =
    g.graphTable(
      s"""ipg MATCH (p:Person)-[w:worksAt]->(u:$label)
          COLUMNS (p.id AS pid, p.name AS pname, u.id AS uid,
                   u.name AS uname)""")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .toSet

  test("parent label matches every sub-label row — inheritance_support.test:52-64") {
    val got = rows(mkGraft, "organisation")
    assert(got == Set(
      (0L, "Daniel", 1L, "UvA"), (0L, "Daniel", 2L, "EY"),
      (0L, "Daniel", 3L, "CWI"), (1L, "Tavneet", 2L, "EY"),
      (1L, "Tavneet", 3L, "CWI"), (2L, "Gabor", 3L, "CWI"),
      (3L, "Peter", 0L, "VU"), (4L, "David", 3L, "CWI")))
  }

  test("sub-labels filter by mask bit, case-insensitively — :103-137") {
    val g = mkGraft
    val uni = rows(g, "university")
    assert(uni == Set((0L, "Daniel", 1L, "UvA"), (3L, "Peter", 0L, "VU")))
    val co = rows(g, "company")
    assert(co == Set(
      (0L, "Daniel", 3L, "CWI"), (1L, "Tavneet", 3L, "CWI"),
      (2L, "Gabor", 3L, "CWI"), (4L, "David", 3L, "CWI"),
      (0L, "Daniel", 2L, "EY"), (1L, "Tavneet", 2L, "EY")))
    // different capitalization resolves to the same labels (:123-137)
    assert(rows(g, "COMPANY") == co && rows(g, "ORGANISATION").size == 8)
  }

  test("star expansion over a sub-labeled table carries the mask — :66-84") {
    val df = mkGraft.graphTable(
      """ipg MATCH (p:Person)-[w:worksAt]->(u:Organisation)
         COLUMNS (p.*, u.*)""")
    // bare column names, duplicates and all — the reference's own output
    // shape (p.id, p.name, u.name, u.id, u.mask)
    assert(df.columns.toSeq == Seq("id", "name", "name", "id", "mask"))
    val out = df.collect()
    assert(out.length == 8)
    assert(out.map(_.getLong(4)).toSet == Set(1L, 2L))
  }

  test("unbounded * over an EMPTY edge table: dist-0 self paths only — " +
      "edgeless_graph.test") {
    val s = Fixture.init()
    import s.implicits._
    Seq(1, 2, 3).toDF("id").createOrReplaceTempView("enodes")
    spark.emptyDataset[(Int, Int)].toDF("src", "dst")
      .createOrReplaceTempView("eedges")
    val g = Graft(s, TableResolver.catalog)
    g.sql("""CREATE OR REPLACE PROPERTY GRAPH etestgraph
      VERTEX TABLES (enodes LABEL N)
      EDGE TABLES (eedges SOURCE KEY (src) REFERENCES enodes (id)
                          DESTINATION KEY (dst) REFERENCES enodes (id)
                          LABEL E)""")
    val got = g.graphTable(
      """etestgraph MATCH p = ANY SHORTEST (n1:N)-[e:E]->*(n2:N)
         COLUMNS (n1.id AS a, n2.id AS b, edges(p) AS pe,
                  path_length(p) AS len)""")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2).toList,
        r.getLong(3))).toSet
    // reference golden: each vertex reaches only itself at distance 0
    // with an empty edge list (element ids here are vertex KEYS, not the
    // reference's internal rowids — documented divergence)
    assert(got == Set((1, 1, Nil, 0L), (2, 2, Nil, 0L), (3, 3, Nil, 0L)))
  }
  private def spark = Fixture.spark
}
