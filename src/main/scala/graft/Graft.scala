package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model._
import graft.pgq._
import graft.compiler.GraphTableCompiler

/** User-facing facade — the Spark-native equivalent of loading the DuckPGQ
  * extension: DDL execution, `GRAPH_TABLE` queries from SQL/PGQ text or from
  * the Scala AST, and algorithm table-functions.
  *
  * {{{
  * val g = Graft(spark, TableResolver.parquetDir("/data/sf1"))
  * g.sql("CREATE PROPERTY GRAPH pg VERTEX TABLES (...) EDGE TABLES (...)")
  * val df = g.graphTable("pg MATCH (a:Person)-[k:Knows]->(b:Person) COLUMNS (a.name, b.name)")
  * }}}
  */
final case class Graft(spark: SparkSession, resolver: TableResolver) {
  val registry: PropertyGraphRegistry = PropertyGraphRegistry.forSession(spark)

  /** Executes a PGQ statement (CREATE/DROP PROPERTY GRAPH, or a
    * GRAPH_TABLE query — reference entry points
    * `duckpgq_parser.cpp:223-268`). Returns a DataFrame for queries,
    * empty DataFrame for DDL. */
  def sql(text: String): DataFrame = PgqParser.statement(text) match {
    case c: CreatePropertyGraphSpec =>
      registry.create(spark, materialize(c), resolver,
        orReplace = c.orReplace, ifNotExists = c.ifNotExists)
      spark.emptyDataFrame
    case d: DropPropertyGraphSpec =>
      registry.drop(spark, d.name, d.ifExists)
      spark.emptyDataFrame
    case GraphTableStatement(spec) => compile(spec)
  }

  /** `GRAPH_TABLE( … )` (or its bare body) → DataFrame. */
  def graphTable(text: String): DataFrame =
    compile(PgqParser.graphTable(text))

  private val gtCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Runs a full SQL query that may contain `GRAPH_TABLE(…)` table
    * references anywhere in its FROM trees — WITH/CTEs, nested subqueries,
    * joins (reference entry point 1: the parser override that scans FROM
    * trees recursively, `duckpgq_parser.cpp:132-221`; tests
    * `with_clause.test`, `nested_subquery.test`, `unnamed_subquery.test`).
    *
    * Each GRAPH_TABLE span is compiled to a DataFrame, registered as a
    * temp view, and substituted; the rewritten query then runs through
    * Spark SQL unchanged — the same SQL-to-SQL strategy as the reference.
    */
  def sqlGraph(query: String): DataFrame =
    spark.sql(rewriteGraphTables(query))

  /** The substitution pass behind [[sqlGraph]] (also used by the
    * [[graft.plans.GraftExtensions]] parser override): compiles each
    * GRAPH_TABLE span, registers it as a temp view, returns the rewritten
    * SQL text. */
  def rewriteGraphTables(query: String): String = {
    // negative lookbehind: don't fire inside identifiers like
    // my_graph_table(...)
    val pat = java.util.regex.Pattern.compile(
      "(?i)(?<![A-Za-z0-9_])(?:GRAPH_TABLE|GRAPH\\s+TABLE)\\s*\\(")
    val sb = new StringBuilder(query)
    var searchFrom = 0
    var m = pat.matcher(sb)
    while (m.find(searchFrom)) {
      if (insideStringLiteral(sb, m.start())) {
        // mention inside a SQL string literal — not a graph table
        searchFrom = m.end()
      } else {
        val open = m.end() - 1 // both pattern alternatives end with '('
        val close = matchParen(sb, open)
        val inner = sb.substring(open + 1, close)
        val name = s"__graft_gt_${gtCounter.incrementAndGet()}"
        graphTable(inner).createOrReplaceTempView(name)
        sb.replace(m.start(), close + 1, name)
        searchFrom = 0
        m = pat.matcher(sb)
      }
    }
    sb.toString
  }

  /** True when `pos` falls inside a single- or double-quoted SQL literal.
    * Tracks quote state with backslash escapes (an apostrophe inside a
    * double-quoted string must not flip single-quote state, and vice
    * versa). */
  private def insideStringLiteral(s: CharSequence, pos: Int): Boolean = {
    var state = 0 // 0 = outside, 1 = in single-quoted, 2 = in double-quoted
    var i = 0
    while (i < pos) {
      val c = s.charAt(i)
      state match {
        case 0 =>
          if (c == '\'') state = 1
          else if (c == '"') state = 2
        case 1 =>
          if (c == '\\') i += 1
          else if (c == '\'') state = 0
        case 2 =>
          if (c == '\\') i += 1
          else if (c == '"') state = 0
      }
      i += 1
    }
    state != 0
  }

  /** Index of the ')' balancing the '(' at `open` (quote-aware). */
  private def matchParen(s: CharSequence, open: Int): Int = {
    var depth = 0; var i = open; var inStr = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return i
        case _ => ()
      }
      i += 1
    }
    throw GraphAnalysisException("Unbalanced parentheses in GRAPH_TABLE")
  }

  /** `COPY (GRAPH_TABLE …) TO 'path'` analogue
    * (reference `duckpgq_parser.cpp:255-260`, `copy_to_duckpgq.test`). */
  def copyTo(text: String, path: String, format: String = "csv"): Unit = {
    val df = graphTable(text)
    format.toLowerCase match {
      case "csv" => df.write.mode("overwrite")
        .option("header", "true").csv(path)
      case "parquet" => df.write.mode("overwrite").parquet(path)
      case "json" => df.write.mode("overwrite").json(path)
      case other => throw GraphAnalysisException(
        s"Unsupported COPY format '$other'")
    }
  }

  /** `EXPLAIN GRAPH_TABLE …` analogue (reference `explain_duckpgq.test`):
    * the compiled plan, formatted. */
  def explain(text: String): String =
    graphTable(text).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  def compile(spec: MatchSpec): DataFrame =
    GraphTableCompiler.compile(spark, spec,
      registry.get(spark, spec.graphName), resolver)

  /** DDL spec → registered model; expands `PROPERTIES ARE ALL COLUMNS
    * EXCEPT (…)` against the live schema (reference
    * `create_property_graph.cpp:75-96` set difference at bind time). */
  private def materialize(c: CreatePropertyGraphSpec): PropertyGraph = {
    // `list` = declared property list for PROPERTIES(...), or the EXCEPT
    // list for ALL COLUMNS EXCEPT(...)
    def expandProps(table: String, mode: PropsMode,
        list: Seq[String]): Seq[String] = mode match {
      case PropsMode.All => Nil // empty = all columns
      case PropsMode.Some_ => list
      case PropsMode.None_ => Seq.empty
      case PropsMode.AllExcept =>
        val ex = list.map(_.toLowerCase).toSet
        resolver(spark, table).columns.toSeq
          .filterNot(col => ex.contains(col.toLowerCase))
    }
    // vertex key inference: single-column key named `id`-like or the
    // declared source-ref key of any edge referencing the table; the
    // reference infers PK/FK from real constraints
    // (create_property_graph.cpp:106-154) — parquet has none, so we take
    // the union of declared edge reference keys, falling back to the
    // first column.
    // first-declared reference wins (deterministic; conflicting key
    // declarations across edges can't all be the vertex key anyway)
    val refKeys: Map[String, Seq[String]] =
      (c.edgeTables.map(e => e.srcRefTable.toLowerCase -> e.srcRefKeys) ++
        c.edgeTables.map(e => e.dstRefTable.toLowerCase -> e.dstRefKeys))
        .foldLeft(Map.empty[String, Seq[String]]) {
          case (m, (t, ks)) => if (m.contains(t)) m else m + (t -> ks)
        }

    val labelByTable: Map[String, String] =
      c.vertexTables.map(v => v.table.toLowerCase -> v.effectiveLabel).toMap

    val vts = c.vertexTables.map { v =>
      val keys = refKeys.getOrElse(v.table.toLowerCase,
        Seq(resolver(spark, v.table).columns.head))
      VertexTable(v.table, v.effectiveLabel, keys,
        expandProps(v.table, v.propsMode, v.props),
        v.discriminator, v.subLabels)
    }
    val ets = c.edgeTables.map { e =>
      val srcLabel = labelByTable.getOrElse(e.srcRefTable.toLowerCase,
        throw GraphAnalysisException(
          s"Referenced vertex table '${e.srcRefTable}' of edge '${e.table}' is not registered!"))
      val dstLabel = labelByTable.getOrElse(e.dstRefTable.toLowerCase,
        throw GraphAnalysisException(
          s"Referenced vertex table '${e.dstRefTable}' of edge '${e.table}' is not registered!"))
      EdgeTable(e.table, e.effectiveLabel, e.srcKeys, e.srcRefKeys, srcLabel,
        e.dstKeys, e.dstRefKeys, dstLabel,
        expandProps(e.table, e.propsMode, e.props),
        discriminator = e.discriminator, subLabels = e.subLabels)
    }
    PropertyGraph(c.name, vts, ets)
  }
}
