package graft.pgq

import graft.model.GraphAnalysisException

/** Hand-rolled recursive-descent parser for the SQL/PGQ surface of the
  * reference (grammar: `third_party/duckdb_peg_parser/upstream/src/parser/
  * peg/grammar/statements/pgq.gram`):
  *
  *  - `GRAPH_TABLE (pg MATCH <patterns> [WHERE <expr>] [COLUMNS (<cols>)])`
  *    (pgq.gram:28-63) → [[MatchSpec]]
  *  - `CREATE [OR REPLACE] PROPERTY GRAPH [IF NOT EXISTS] <name>
  *     VERTEX TABLES (...) [EDGE TABLES (...)]` (pgq.gram:1-24) →
  *    [[CreatePropertyGraphSpec]]
  *  - `DROP PROPERTY GRAPH [IF EXISTS] <name>` (pgq.gram:26)
  *
  * Scalar expressions (WHERE bodies, COLUMNS entries) are captured as raw
  * SQL text at balanced paren depth and handed to Spark's own expression
  * parser downstream — the same division of labor as the reference, whose
  * PEG grammar captures expressions opaquely and re-binds them in the host.
  */
final class PgqParser(input: String) {
  private var pos = 0
  private val n = input.length

  private def err(msg: String): Nothing =
    throw GraphAnalysisException(
      s"PGQ parse error at position $pos ('${input.slice(pos, pos + 20)}…'): $msg")

  private def ws(): Unit = {
    while (pos < n && (input(pos).isWhitespace ||
        (pos + 1 < n && input(pos) == '-' && input(pos + 1) == '-'))) {
      if (input(pos) == '-') { // line comment
        if (pos + 1 < n && input(pos + 1) == '-') {
          while (pos < n && input(pos) != '\n') pos += 1
        } else return
      } else pos += 1
    }
  }

  private def peek(kw: String): Boolean = {
    ws()
    val e = pos + kw.length
    e <= n && input.substring(pos, e).equalsIgnoreCase(kw) &&
      (e == n || !isIdentChar(input(e)) || !isIdentChar(kw.last))
  }

  private def accept(kw: String): Boolean = {
    if (peek(kw)) { pos += kw.length; true } else false
  }

  private def expect(kw: String): Unit =
    if (!accept(kw)) err(s"expected '$kw'")

  private def isIdentChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '_'

  private def ident(): String = {
    ws()
    if (pos < n && input(pos) == '"') { // quoted identifier
      val start = pos + 1
      pos += 1
      while (pos < n && input(pos) != '"') pos += 1
      if (pos >= n) err("unterminated quoted identifier")
      pos += 1
      input.substring(start, pos - 1)
    } else {
      val start = pos
      while (pos < n && isIdentChar(input(pos))) pos += 1
      if (pos == start) err("expected identifier")
      input.substring(start, pos)
    }
  }

  private def number(): Long = {
    ws()
    val start = pos
    while (pos < n && input(pos).isDigit) pos += 1
    if (pos == start) err("expected number")
    input.substring(start, pos).toLong
  }

  /** Capture raw SQL text until one of `stops` appears at paren depth 0
    * (keywords matched case-insensitively at word boundaries), or until the
    * enclosing depth would go negative. `'…'` strings and `"…"` quoted
    * identifiers are opaque (stops/parens inside them don't count), and
    * double-quoted identifiers are normalized to Spark backticks on return
    * (ANSI `"from"` → `` `from` ``, reference generated_sql_quoting.test). */
  private def rawExprUntil(stops: Seq[String]): String = {
    ws()
    val start = pos
    var depth = 0
    var inStr = false
    var inQuotedId = false
    while (pos < n) {
      val c = input(pos)
      if (inStr) {
        if (c == '\'') inStr = false
        pos += 1
      } else if (inQuotedId) {
        if (c == '"') inQuotedId = false
        pos += 1
      } else c match {
        case '\'' => inStr = true; pos += 1
        case '"' => inQuotedId = true; pos += 1
        case '(' | '[' => depth += 1; pos += 1
        case ')' | ']' =>
          if (depth == 0) {
            return quotedIdentsToBackticks(input.substring(start, pos).trim)
          }
          depth -= 1; pos += 1
        case ',' if depth == 0 && stops.contains(",") =>
          return quotedIdentsToBackticks(input.substring(start, pos).trim)
        case _ =>
          if (depth == 0 && (c.isLetter || c == '_')) {
            val w = pos
            var e = pos
            while (e < n && isIdentChar(input(e))) e += 1
            val word = input.substring(w, e)
            if (stops.exists(_.equalsIgnoreCase(word))) {
              return quotedIdentsToBackticks(input.substring(start, pos).trim)
            }
            pos = e
          } else pos += 1
      }
    }
    quotedIdentsToBackticks(input.substring(start, pos).trim)
  }

  /** Rewrites ANSI double-quoted identifiers to the backtick form Spark's
    * expression parser understands, leaving `'…'` string literals intact.
    * `""` inside a quoted identifier is the SQL escape for one `"`; a
    * literal backtick in the name becomes Spark's ` `` ` escape. */
  private def quotedIdentsToBackticks(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c == '\'') { // copy string literal verbatim
        out += c; i += 1
        while (i < s.length && s(i) != '\'') { out += s(i); i += 1 }
        if (i < s.length) { out += '\''; i += 1 }
      } else if (c == '"') {
        i += 1
        val name = new StringBuilder
        var closed = false
        while (i < s.length && !closed) {
          if (s(i) == '"') {
            if (i + 1 < s.length && s(i + 1) == '"') { name += '"'; i += 2 }
            else { closed = true; i += 1 }
          } else { name += s(i); i += 1 }
        }
        out += '`'
        out ++= name.result().replace("`", "``")
        out += '`'
      } else { out += c; i += 1 }
    }
    out.result()
  }

  // ---------------- MATCH / GRAPH_TABLE ----------------

  /** Parses either `GRAPH_TABLE( body )` / `GRAPH TABLE ( body )` or a bare
    * body `pg MATCH … [WHERE …] [COLUMNS (…)]`. */
  def parseGraphTable(): MatchSpec = {
    ws()
    val wrapped = accept("GRAPH_TABLE") ||
      (accept("GRAPH") && { expect("TABLE"); true })
    if (wrapped) expect("(")
    val g = ident()
    expect("MATCH")
    val patterns = scala.collection.mutable.ArrayBuffer[PathPattern]()
    patterns += parsePathPattern()
    ws()
    while (pos < n && input(pos) == ',') { pos += 1; patterns += parsePathPattern() }
    val where =
      if (accept("WHERE")) Some(rawExprUntil(Seq("COLUMNS"))) else None
    val columns =
      if (accept("COLUMNS")) { expect("("); val c = parseColumns(); expect(")"); c }
      else Seq(ColumnSpec("*"))
    if (wrapped) expect(")")
    MatchSpec(g, patterns.toSeq, where.filter(_.nonEmpty), columns)
  }

  private def parseColumns(): Seq[ColumnSpec] = {
    val out = scala.collection.mutable.ArrayBuffer[ColumnSpec]()
    var done = false
    while (!done) {
      val raw = rawExprUntil(Seq(","))
      out += splitAlias(raw)
      ws()
      if (pos < n && input(pos) == ',') {
        pos += 1
        ws()
        // trailing comma before ')' is legal (reference
        // optional_columns.test:49 `COLUMNS (p.id as p_id,)`)
        if (pos < n && input(pos) == ')') done = true
      } else done = true
    }
    out.toSeq
  }

  /** `expr AS alias` / `expr alias` split at depth 0. The alias arrives
    * backtick-normalized (see [[quotedIdentsToBackticks]]); strip the
    * quoting so the stored alias is the bare column name. */
  private def splitAlias(raw: String): ColumnSpec = {
    val asIdx = findTopLevelAs(raw)
    asIdx match {
      case Some(i) =>
        val alias = raw.substring(i + 2).trim
        val bare =
          if (alias.length >= 2 && alias.head == '`' && alias.last == '`')
            alias.substring(1, alias.length - 1).replace("``", "`")
          else alias
        ColumnSpec(raw.substring(0, i).trim, Some(bare))
      case None => ColumnSpec(raw.trim)
    }
  }

  private def findTopLevelAs(s: String): Option[Int] = {
    var depth = 0; var inStr = false; var inBt = false; var i = 0
    while (i < s.length - 2) {
      val c = s(i)
      if (inStr) { if (c == '\'') inStr = false; i += 1 }
      else if (inBt) { if (c == '`') inBt = false; i += 1 }
      else c match {
        case '\'' => inStr = true; i += 1
        case '`' => inBt = true; i += 1
        case '(' | '[' => depth += 1; i += 1
        case ')' | ']' => depth -= 1; i += 1
        case 'a' | 'A' if depth == 0 &&
            (i == 0 || !isIdentChar(s(i - 1))) &&
            s.regionMatches(true, i, "as", 0, 2) &&
            i + 2 < s.length && s(i + 2).isWhitespace =>
          return Some(i)
        case _ => i += 1
      }
    }
    None
  }

  private def parsePathPattern(): PathPattern = {
    ws()
    // optional `p =` path variable
    val save = pos
    val pathVar: Option[String] =
      try {
        val id = ident(); ws()
        if (pos < n && input(pos) == '=') { pos += 1; Some(id) }
        else { pos = save; None }
      } catch { case _: GraphAnalysisException => pos = save; None }

    val prefix: Option[SearchPrefix] =
      if (accept("ANY")) {
        if (accept("SHORTEST")) Some(SearchPrefix.AnyShortest)
        else Some(SearchPrefix.AnyShortest) // ANY alone = ANY SHORTEST walk
      } else if (accept("ALL")) {
        expect("SHORTEST"); Some(SearchPrefix.AllShortest)
      } else if (accept("SHORTEST")) {
        Some(SearchPrefix.ShortestK(number().toInt))
      } else None

    val mode: PathMode =
      if (accept("WALK")) PathMode.Walk
      else if (accept("TRAIL")) PathMode.Trail
      else if (accept("SIMPLE")) PathMode.Simple
      else if (accept("ACYCLIC")) PathMode.Acyclic
      else PathMode.Walk

    val elems = scala.collection.mutable.ArrayBuffer[PatternElement]()
    elems += parseVertex()
    ws()
    while (pos < n && (input(pos) == '-' || input(pos) == '<')) {
      elems += parseEdge()
      elems += parseVertex()
      ws()
    }
    PathPattern(pathVar, prefix, mode, elems.toSeq)
  }

  private def parseVertex(): VertexPattern = {
    expect("(")
    ws()
    var name: Option[String] = None
    var label: Option[String] = None
    var where: Option[String] = None
    if (pos < n && input(pos) != ')' && input(pos) != ':') {
      if (!peek("WHERE")) name = Some(ident())
    }
    ws()
    if (pos < n && (input(pos) == ':' || peek("IS"))) {
      if (input(pos) == ':') pos += 1 else accept("IS")
      label = Some(ident())
    }
    if (accept("WHERE")) where = Some(rawExprUntil(Nil))
    expect(")")
    VertexPattern(name, label, where.filter(_.nonEmpty))
  }

  /** `-[...]->`, `<-[...]-`, `-[...]-`, `<-[...]->`, plus the bare arrow
    * forms `->`, `<-`, `<->`, `-` (pgq.gram:55-62). */
  private def parseEdge(): EdgePattern = {
    ws()
    val leftArrow = accept("<-") || { if (accept("-")) false else err("expected edge") }
    var name: Option[String] = None
    var label: Option[String] = None
    var where: Option[String] = None
    var hadBracket = false
    ws()
    if (pos < n && input(pos) == '[') {
      hadBracket = true
      pos += 1
      ws()
      if (pos < n && input(pos) != ']' && input(pos) != ':') {
        if (!peek("WHERE")) name = Some(ident())
      }
      ws()
      if (pos < n && (input(pos) == ':' || peek("IS"))) {
        if (input(pos) == ':') pos += 1 else accept("IS")
        label = Some(ident())
      }
      if (accept("WHERE")) where = Some(rawExprUntil(Nil))
      ws()
      if (pos >= n || input(pos) != ']') err("expected ']'")
      pos += 1
      ws()
    }
    // closing arrow. For the bare (bracket-less) forms the leading dash of
    // "->" was already consumed above, so a lone '>' completes it. A
    // bracketed body MUST be closed by '-' or '->' — `[e](b)` is a typo,
    // not an undirected edge, and `] >` without the dash is a syntax
    // error (reference parser_arrow_kleene.test). Whitespace may split
    // the dash and the head: `- >` ≡ `->` (the reference's PEG tokens
    // are independently skippable — parser_arrow_kleene.test:28-37).
    ws()
    val rightArrow =
      if (hadBracket) {
        if (accept("->")) true
        else if (accept("-")) {
          ws()
          if (pos < n && input(pos) == '>') { pos += 1; true } else false
        } else err("expected closing '-' or '->' after ']'")
      } else {
        if (pos < n && input(pos) == '>') { pos += 1; true }
        else false
      }
    val dir =
      if (leftArrow && rightArrow) EdgeDirection.Both
      else if (leftArrow) EdgeDirection.Left
      else if (rightArrow) EdgeDirection.Right
      else EdgeDirection.Undirected

    // quantifier (pgq.gram:47-53; defaults transform_pgq.cpp:501-526)
    ws()
    val quant: Option[Quantifier] =
      if (pos < n) input(pos) match {
        case '*' => pos += 1; Some(Quantifier(0, None))
        case '+' => pos += 1; Some(Quantifier(1, None))
        case '?' => pos += 1; Some(Quantifier(0, Some(1)))
        case '{' =>
          pos += 1; ws()
          if (pos >= n) err("unterminated quantifier")
          val lo = if (input(pos).isDigit) Some(number()) else None
          ws()
          val q = if (pos < n && input(pos) == ',') {
            pos += 1; ws()
            val hi = if (pos < n && input(pos).isDigit) Some(number()) else None
            Quantifier(lo.getOrElse(0L), hi)
          } else Quantifier(lo.getOrElse(err("bad quantifier")),
            Some(lo.get)) // {n} = exactly n
          ws(); expect("}")
          // reference: Constraint Error (kleene_star.test:50-56)
          if (q.upper.exists(_ < q.lower))
            throw GraphAnalysisException(
              "Lower bound greater than upper bound")
          Some(q)
        case _ => None
      } else None
    EdgePattern(name, label, dir, quant, where.filter(_.nonEmpty))
  }

  // ---------------- DDL ----------------

  def parseStatement(): PgqStatement = {
    ws()
    if (peek("CREATE")) parseCreate()
    else if (peek("DROP")) parseDrop()
    else GraphTableStatement(parseGraphTable())
  }

  private def parseCreate(): CreatePropertyGraphSpec = {
    expect("CREATE")
    val orReplace = accept("OR") && { expect("REPLACE"); true }
    expect("PROPERTY"); expect("GRAPH")
    val ifNotExists = accept("IF") && { expect("NOT"); expect("EXISTS"); true }
    val name = ident()
    expect("VERTEX"); expect("TABLES"); expect("(")
    val vts = scala.collection.mutable.ArrayBuffer[VertexTableSpec]()
    vts += parseVertexTable()
    while ({ ws(); pos < n && input(pos) == ',' }) { pos += 1; vts += parseVertexTable() }
    expect(")")
    val ets = scala.collection.mutable.ArrayBuffer[EdgeTableSpec]()
    if (accept("EDGE")) {
      expect("TABLES"); expect("(")
      ets += parseEdgeTable()
      while ({ ws(); pos < n && input(pos) == ',' }) { pos += 1; ets += parseEdgeTable() }
      expect(")")
    }
    CreatePropertyGraphSpec(name, vts.toSeq, ets.toSeq, orReplace, ifNotExists)
  }

  private def parseDrop(): DropPropertyGraphSpec = {
    expect("DROP"); expect("PROPERTY"); expect("GRAPH")
    val ifExists = accept("IF") && { expect("EXISTS"); true }
    DropPropertyGraphSpec(ident(), ifExists)
  }

  private def identList(): Seq[String] = {
    expect("(")
    val out = scala.collection.mutable.ArrayBuffer[String]()
    out += ident()
    while ({ ws(); pos < n && input(pos) == ',' }) { pos += 1; out += ident() }
    expect(")")
    out.toSeq
  }

  /** `PROPERTIES ( col [AS alias], … )` — the reference grammar allows a
    * per-property alias (pgq.gram properties list;
    * create_property_graph.test:87-107). Aliases are accepted and
    * normalized to the underlying column: the property stays exposed
    * under its column name (nothing in the reference corpus queries the
    * aliased name). */
  private def propList(): Seq[String] = {
    expect("(")
    val out = scala.collection.mutable.ArrayBuffer[String]()
    def one(): Unit = { out += ident(); if (accept("AS")) ident() }
    one()
    while ({ ws(); pos < n && input(pos) == ',' }) { pos += 1; one() }
    expect(")")
    out.toSeq
  }

  /** `PROPERTIES (…)` / `NO PROPERTIES` / `PROPERTIES ARE ALL COLUMNS
    * [EXCEPT (…)]` — pgq.gram:6-13. */
  private def parseProps(): (PropsMode, Seq[String]) = {
    if (accept("NO")) { expect("PROPERTIES"); (PropsMode.None_, Nil) }
    else if (accept("PROPERTIES")) {
      if (accept("ARE")) {
        expect("ALL"); expect("COLUMNS")
        if (accept("EXCEPT")) (PropsMode.AllExcept, identList())
        else (PropsMode.All, Nil)
      } else if (accept("ALL")) {
        expect("COLUMNS")
        if (accept("EXCEPT")) (PropsMode.AllExcept, identList())
        else (PropsMode.All, Nil)
      } else (PropsMode.Some_, propList())
    } else (PropsMode.All, Nil)
  }

  /** `[LABEL l] [IN disc (sub, …)]` — the discriminator clause may appear
    * without an explicit LABEL (`Organisation IN typemask(company,
    * university)`, reference with_clause.test:19). */
  private def parseLabel(): (Option[String], Option[String], Seq[String]) = {
    val l = if (accept("LABEL")) Some(ident()) else None
    if (accept("IN")) {
      val disc = ident()
      val subs = identList()
      (l, Some(disc), subs)
    } else (l, None, Nil)
  }

  private def parseVertexTable(): VertexTableSpec = {
    val t = ident()
    val alias = if (accept("AS")) Some(ident()) else None
    val (pm, props) = parseProps()
    val (label, disc, subs) = parseLabel()
    VertexTableSpec(t, alias, pm, props, label, disc, subs)
  }

  private def parseEdgeTable(): EdgeTableSpec = {
    val t = ident()
    val alias = if (accept("AS")) Some(ident()) else None
    // `SOURCE KEY (fk) REFERENCES v (pk)` or the `SOURCE v` shorthand,
    // whose keys are inferred from registered PK/FK metadata at
    // materialization (reference create_property_graph.cpp:106-154;
    // create_pg_with_pk_fk.test). Mixing is a syntax error exactly like
    // the reference's PEG grammar: `KEY (fk) REFERENCES v` without the
    // pk column list does not parse.
    expect("SOURCE")
    val (srcKeys, srcRef, srcRefKeys) =
      if (accept("KEY")) {
        val ks = identList()
        expect("REFERENCES")
        val ref = ident()
        (ks, ref, identList())
      } else (Seq.empty[String], ident(), Seq.empty[String])
    expect("DESTINATION")
    val (dstKeys, dstRef, dstRefKeys) =
      if (accept("KEY")) {
        val ks = identList()
        expect("REFERENCES")
        val ref = ident()
        (ks, ref, identList())
      } else (Seq.empty[String], ident(), Seq.empty[String])
    val (pm, props) = parseProps()
    val (label, disc, subs) = parseLabel()
    EdgeTableSpec(t, alias, srcKeys, srcRef, srcRefKeys,
      dstKeys, dstRef, dstRefKeys, pm, props, label, disc, subs)
  }
}

sealed trait PgqStatement
final case class GraphTableStatement(spec: MatchSpec) extends PgqStatement

sealed trait PropsMode
object PropsMode {
  case object All extends PropsMode
  case object AllExcept extends PropsMode
  case object Some_ extends PropsMode
  case object None_ extends PropsMode
}

final case class VertexTableSpec(table: String, alias: Option[String],
    propsMode: PropsMode, props: Seq[String], label: Option[String],
    discriminator: Option[String], subLabels: Seq[String]) {
  def effectiveLabel: String = label.getOrElse(alias.getOrElse(table))
}

final case class EdgeTableSpec(table: String, alias: Option[String],
    srcKeys: Seq[String], srcRefTable: String, srcRefKeys: Seq[String],
    dstKeys: Seq[String], dstRefTable: String, dstRefKeys: Seq[String],
    propsMode: PropsMode, props: Seq[String], label: Option[String],
    discriminator: Option[String], subLabels: Seq[String]) {
  def effectiveLabel: String = label.getOrElse(alias.getOrElse(table))
}

final case class CreatePropertyGraphSpec(name: String,
    vertexTables: Seq[VertexTableSpec], edgeTables: Seq[EdgeTableSpec],
    orReplace: Boolean, ifNotExists: Boolean) extends PgqStatement

final case class DropPropertyGraphSpec(name: String, ifExists: Boolean)
    extends PgqStatement

object PgqParser {
  def graphTable(s: String): MatchSpec = new PgqParser(s).parseGraphTable()
  def statement(s: String): PgqStatement = new PgqParser(s).parseStatement()
}
