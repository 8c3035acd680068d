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
    "path_finding/kleene_star.test",
    "path_finding/complex_matching.test",
    "path_finding/edgeless_graph.test",
    "path_finding/non-unique-vertices.test",
    "path_finding/parser_arrow_kleene.test",
    "path_finding/path-finding-cte.test",
    "path_finding/shortest_path.test",
    "path_finding/subpath_match.test",
    "path_finding/top_k.test",
    "path_finding/undirected_paths.test",
    "scalar/delete_csr.test",
    "scalar/get_csr_w_type.test",
    "scalar/getpgschema.test",
    "scalar/local_clustering_coefficient.test",
    "scalar/pagerank.test",
    "scalar/weakly_connected_component.test",
    "pragma/create_vertex_table.test",
    "pragma/show_property_graphs.test",
    "snb/snb.test",
    "snb/bi.test",
    "snb/snb_inheritance.test",
    "altering_table.test",
    "copy_to_duckpgq.test",
    "csr_segfault.test",
    "explain_duckpgq.test",
    "generated_sql_quoting.test",
    "label_optional.test",
    "multiple_graph_table.test",
    "nested_subquery.test",
    "non_existing_table.test",
    "optional_columns.test",
    "pgq_keywords.test",
    "source_keyword.test",
    "summarize_property_graph.test",
    "unnamed_subquery.test",
    "wcc_segfault.test",
    "with_clause.test",
    "with_statement_duckpgq.test")

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
        "syntax replayed in SqlIntegrationSpec"),
    "get_csr_ptr.test" ->
      "raw CSR pointer dump — no Spark analogue (SURVEY §2.D, skipped by design)",
    "duckdb_columns.test" ->
      "duckdb_columns() host-catalog introspection — engine-specific",
    "211_using_other_schemas.test" ->
      "CREATE SCHEMA + schema-qualified catalogs — host-engine namespaces",
    "snb/snb_projected.test_slow" ->
      "fully commented out in the reference itself")

  /** Per-line documented divergences (the runner turns a failure at such
    * a line into an explicit skip carrying the reason). */
  private val divergences: Map[String, Map[Int, String]] = Map(
    // path-array vertex rowids: the library default emits declared
    // vertex KEYS (stable, joinable); the replay sessions set
    // `spark.graft.pathArrayRowids` so element_id()/vertices() emit the
    // reference's physical 0-based rowids — the former kleene_star /
    // complex_matching / edgeless_graph divergence lines replay green.
    "pattern_matching/inheritance_support.test" -> Map(
      // `COLUMNS (p.*, u.*, w.*)`: graft expands a star in the table's
      // physical column order; DuckDB emits its internal catalog-map
      // order — same value set per row, different column order
      68 -> "star expansion order: physical schema vs catalog-map order"),
    "path_finding/complex_matching.test" -> Map(
      // rowid parity exposed the REAL residual on these two lines: among
      // equal-length shortest paths graft returns the deterministic
      // lexicographic-min path array, the reference returns its BFS
      // arrival-order winner (a different equal-cost path through
      // another intermediate vertex) — the documented ANY SHORTEST
      // tie-break divergence, one row of 11 (:55) / one of 26 (:329)
      55 -> "ANY SHORTEST tie-break: lexicographic-min vs arrival order",
      329 -> "ANY SHORTEST tie-break: lexicographic-min vs arrival order"),
    "path_finding/parser_arrow_kleene.test" -> Map(
      49 -> ("graft parses anonymous-edge quantifiers (reference parser " +
        "rejects: 'Not yet supported')"),
      54 -> "graft parses empty-bracket quantified edges (reference rejects)",
      59 -> "graft parses spaced arrow forms (reference lexer rejects)",
      82 -> ("graft parses (and implements) bidirectional anonymous " +
        "quantifiers (reference rejects)"),
      92 -> "graft parses spaced arrow forms (reference lexer rejects)"),
    "path_finding/undirected_paths.test" -> Map(
      51 -> ("graft implements reverse-direction shortest paths " +
        "(reference: 'Cannot do shortest path for edge type " +
        "MATCH_EDGE_LEFT')"),
      61 -> ("graft implements bidirectional shortest paths (reference " +
        "errors on MATCH_EDGE_LEFT_RIGHT)"),
      71 -> ("path_length over an UNDECLARED path variable: the reference " +
        "binds stale per-connection path state (quirk); graft raises " +
        "unresolved")),
    "scalar/weakly_connected_component.test" -> Map(
      // the PARTITION is identical in every case; only the representative
      // id differs (deterministic min-member vs union-find arrival roots)
      29 -> "component ids are min-member canonical, not union-find roots",
      84 -> "component ids are min-member canonical, not union-find roots",
      113 -> "component ids are min-member canonical, not union-find roots",
      140 -> "component ids are min-member canonical, not union-find roots"),
    "scalar/pagerank.test" -> Map(
      23 -> ("float64 accumulation order differs in the last 2 ulps " +
        "(values match to 1e-15)"),
      80 -> ("float64 accumulation order differs in the last 2 ulps " +
        "(values match to 1e-15)")),
    "scalar/getpgschema.test" -> Map(
      135 -> ("USING SAMPLE reservoir(…) REPEATABLE — DuckDB sampling " +
        "clause with engine-internal RNG; downstream expectations depend " +
        "on the host sample")),
    "summarize_property_graph.test" -> Map(
      46 -> ("reference uses approx_quantile (t-digest, approximate); " +
        "graft computes the exact discrete quantile — verified vs DuckDB " +
        "quantile_disc on the same degree distribution")),
    "unnamed_subquery.test" -> Map(
      23 -> "LIMIT without ORDER BY: engine-dependent row selection",
      41 -> "LIMIT without ORDER BY: engine-dependent row selection",
      60 -> "LIMIT without ORDER BY: engine-dependent row selection",
      81 -> "LIMIT without ORDER BY: engine-dependent row selection"),
    "multiple_graph_table.test" -> Map(
      140 -> ("DuckDB auto-names every unnamed derived table " +
        "(unnamed_subquery2); graft auto-aliases GRAPH_TABLE spans only — " +
        "plain subqueries need explicit aliases in Spark")),
    "optional_columns.test" -> Map(
      27 -> "star expansion order: physical schema vs catalog-map order"),
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
    val inDirs = all(fs).filter(p =>
      p.endsWith(".test") || p.endsWith(".test_slow"))
    val missing = inDirs.filterNot(considered.contains)
    assert(missing.isEmpty,
      s"files neither replayed nor skipped-with-reason: $missing")
  }
}
