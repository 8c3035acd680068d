package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{GraphAnalysisException, TableResolver}
import graft.graph.Algorithms

/** Optional-label DDL surface + the undirected LCC golden of reference
  * `test/sql/label_optional.test`: an edge table with no LABEL clause
  * defaults its label to the table name, a vertex label can differ from
  * the table name (`VariedStudent label a`), and the 6-node graph's
  * clustering coefficients replay exactly. Plus the bare-label binding
  * form `(Person)` of `pattern_matching/graph_table_keyword.test`. */
class LabelOptionalSpec extends AnyFunSuite {

  private def mkGraft: Graft = {
    val s = Fixture.init()
    import s.implicits._
    Seq((0L, "Alice"), (1L, "Bob"), (2L, "Charlie"), (3L, "Dave"),
      (4L, "Eve"), (5L, "Frank")).toDF("id", "name")
      .createOrReplaceTempView("variedstudent")
    Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (2L, 3L), (3L, 4L),
      (4L, 5L)).toDF("src", "dst").createOrReplaceTempView("variedknow")
    val g = Graft(s, TableResolver.catalog)
    g.sql("""CREATE OR REPLACE PROPERTY GRAPH varied_pg_label_a
      VERTEX TABLES (variedstudent LABEL a)
      EDGE TABLES (
        variedknow SOURCE KEY (src) REFERENCES variedstudent (id)
                   DESTINATION KEY (dst) REFERENCES variedstudent (id)
      )""")
    g
  }

  test("LCC golden with defaulted edge label — label_optional.test:27-46") {
    val g = mkGraft
    val pg = g.registry.get(g.spark, "varied_pg_label_a")
    // edge label defaulted to the table name
    val got = Algorithms.lcc(g.spark, pg, TableResolver.catalog,
      "a", "variedknow")
      .collect().map(r => (r.getLong(0), BigDecimal(r.getDouble(1))
        .setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .sortBy(_._1).toSeq
    assert(got == Seq(0L -> 0.6666667, 1L -> 1.0, 2L -> 0.6666667,
      3L -> 0.3333333, 4L -> 0.0, 5L -> 0.0))
  }

  test("unknown label raises with registered alternatives — label_optional.test:50-53") {
    val g = mkGraft
    val pg = g.registry.get(g.spark, "varied_pg_label_a")
    val e = intercept[GraphAnalysisException] {
      Algorithms.lcc(g.spark, pg, TableResolver.catalog,
        "variedstudent", "variedknow")
    }
    assert(e.msg.toLowerCase.contains("variedstudent"))
  }

  test("bare-label vertex binding (Person) — graph_table_keyword.test:23-31") {
    val g = mkGraft
    val ids = g.graphTable(
      "varied_pg_label_a MATCH (a) COLUMNS (a.id as id)")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == (0L to 5L).toSeq)
  }
}
