package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.slt.SltRunner

/** Mechanical replay of the reference sqllogictest corpus (VERDICT r6
  * next-round #2): every listed file either replays green or is skipped
  * with an explicit reason. Fixture-based spot checks of the same
  * behavior live in StudentFixtureSpec / SnbSpec / PathGoldenSpec; this
  * is the line-by-line sweep over the reference's own test files. */
class SltReplaySpec extends AnyFunSuite {

  private val root = "/root/reference/test/sql"

  /** Files replayed record-by-record (statement ok / statement error /
    * query blocks all executed and compared). */
  private val replayFiles = Seq(
    "create_pg/create_property_graph.test",
    "create_pg/create_pg_with_pk_fk.test",
    "create_pg/no_properties.test",
    "create_pg/209_property_undefined.test",
    "create_pg/drop_property_graph.test",
    "create_pg/except_properties.test",
    "create_pg/create_or_replace_pg.test",
    "create_pg/create_if_not_exists.test",
    "create_pg/optional_edge_table_clause.test",
    "create_pg/all_properties.test",
    "create_pg/create_property_graph_syntax_error.test",
    "pattern_matching/basic_match.test",
    "pattern_matching/inheritance_support.test",
    "pattern_matching/graph_table_keyword.test",
    "pattern_matching/undirected_edges.test",
    "pattern_matching/path_modes.test",
    "path_finding/kleene_star.test")

  /** Files intentionally not replayed, with the reason a porting user
    * would need. */
  private val skippedFiles: Map[String, String] = Map(
    "create_pg/attach_pg.test" ->
      "ATTACH'd DuckDB database files — host-engine storage, N/A",
    "create_pg/create_pg_multiple_connections.test" ->
      "multi-connection visibility — Spark temp sessions differ by design",
    "create_pg/describe_pg.test" ->
      "multi-connection (con1) + DESCRIBE output shape is engine-specific",
    "create_pg/create_pg_on_view.test" ->
      ("covered: graft resolves any temp view; file uses host CREATE VIEW " +
        "syntax replayed in SqlIntegrationSpec"))

  /** Per-line documented divergences (the runner turns a failure at such
    * a line into an explicit skip carrying the reason). */
  private val divergences: Map[String, Map[Int, String]] = Map(
    "path_finding/kleene_star.test" -> Map(
      // element_id()/edges() carry the VERTEX KEYS / declared edge ids —
      // stable, joinable identifiers — where DuckDB emits physical
      // 0-based insertion rowids; the semantics (lengths, endpoints,
      // reachability) are identical
      26 -> "path arrays carry vertex keys, not physical rowids",
      50 -> "path arrays carry vertex keys, not physical rowids",
      57 -> "path arrays carry vertex keys, not physical rowids",
      64 -> "path arrays carry vertex keys, not physical rowids",
      71 -> "path arrays carry vertex keys, not physical rowids",
      78 -> "path arrays carry vertex keys, not physical rowids",
      85 -> "path arrays carry vertex keys, not physical rowids",
      92 -> "path arrays carry vertex keys, not physical rowids",
      99 -> "path arrays carry vertex keys, not physical rowids",
      106 -> "path arrays carry vertex keys, not physical rowids",
      113 -> "path arrays carry vertex keys, not physical rowids",
      60 -> "path arrays carry vertex keys, not physical rowids",
      95 -> "path arrays carry vertex keys, not physical rowids"),
    "pattern_matching/inheritance_support.test" -> Map(
      // `COLUMNS (p.*, u.*, w.*)`: graft expands a star in the table's
      // physical column order; DuckDB emits its internal catalog-map
      // order — same value set per row, different column order
      68 -> "star expansion order: physical schema vs catalog-map order"),
    "pattern_matching/path_modes.test" -> Map(
      // the reference raises NotImplemented for non-WALK modes and
      // ALL SHORTEST (match.cpp:80-108, :709-790); graft implements
      // them, so the statement succeeds where the reference errors
      65 -> "graft implements ALL SHORTEST (reference errors)",
      75 -> "graft implements non-WALK path modes (reference errors)",
      85 -> "graft implements non-WALK path modes (reference errors)",
      107 -> "graft implements non-WALK path modes (reference errors)",
      118 -> "graft implements non-WALK path modes (reference errors)"))

  for (f <- replayFiles) {
    test(s"replay $f") {
      val s = Fixture.init()
      val res = SltRunner.runFile(s, s"$root/$f",
        divergences.getOrElse(f, Map.empty))
      assert(res.skippedFile.isEmpty,
        s"file skipped: ${res.skippedFile.getOrElse("")}")
      val lines = res.records.map(r =>
        f"${r.record.line}%4d ${r.status}%-12s ${r.detail}")
      withClue(lines.mkString("\n", "\n", "\n")) {
        assert(res.failures.isEmpty,
          s"${res.failures.length} failures of ${res.records.length} records")
      }
      info(s"${res.passed} passed, ${res.skipped.length} skipped, " +
        s"${res.msgMismatches.length} message-mismatches " +
        s"of ${res.records.length} records")
      res.skipped.foreach(r =>
        info(s"  skip line ${r.record.line}: ${r.detail}"))
      res.msgMismatches.foreach(r =>
        info(s"  msg-mismatch line ${r.record.line}: ${r.detail}"))
    }
  }

  test("skipped files are consciously skipped, not forgotten") {
    val fs = new java.io.File(root)
    def all(dir: java.io.File): Seq[String] = {
      val kids = Option(dir.listFiles()).map(_.toSeq).getOrElse(Nil)
      kids.filter(_.isFile).map(_.getPath.stripPrefix(root + "/")) ++
        kids.filter(_.isDirectory).flatMap(all)
    }
    val considered = replayFiles.toSet ++ skippedFiles.keySet
    val inDirs = all(fs).filter(p => p.endsWith(".test") &&
      (p.startsWith("create_pg/") || p.startsWith("pattern_matching/")))
    val missing = inDirs.filterNot(considered.contains)
    assert(missing.isEmpty,
      s"files neither replayed nor skipped-with-reason: $missing")
  }
}
