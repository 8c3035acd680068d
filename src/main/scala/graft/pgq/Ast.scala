package graft.pgq

/** SQL/PGQ MATCH AST, mirroring the reference's parsed representation
  * (`src/include/duckpgq/parser/path_pattern.hpp:15-34`,
  * `subpath_element.hpp:11-42`, `matchref.hpp:10-36`) but reduced to the
  * shapes its compiler actually consumes.
  */
sealed trait EdgeDirection
object EdgeDirection {
  /** `(a)-[e]->(b)` — reference `EdgeTypeRight` match.cpp:405-414 */
  case object Right extends EdgeDirection
  /** `(a)<-[e]-(b)` — reference `EdgeTypeLeft` match.cpp:394-403 */
  case object Left extends EdgeDirection
  /** `(a)-[e]-(b)` undirected — reference `EdgeTypeAny` match.cpp:365-392 */
  case object Undirected extends EdgeDirection
  /** `(a)<-[e]->(b)` — reference `EdgeTypeLeftRight` match.cpp:416-444 */
  case object Both extends EdgeDirection
}

/** Path mode (reference grammar pgq.gram:40-44). Only WALK is supported —
  * same guard as `PGQCheckPathModeSupport` match.cpp:80-108. */
sealed trait PathMode
object PathMode {
  case object Walk extends PathMode
  case object Trail extends PathMode
  case object Simple extends PathMode
  case object Acyclic extends PathMode
}

/** Search prefix (reference grammar pgq.gram:36-39). */
sealed trait SearchPrefix
object SearchPrefix {
  case object AnyShortest extends SearchPrefix
  case object AllShortest extends SearchPrefix
  final case class ShortestK(k: Int) extends SearchPrefix
}

/** `{l,u}` / `*` / `+` / `?` quantifier on an edge pattern
  * (reference transform_pgq.cpp:488-528; defaults `*`→0..∞, `+`→1..∞,
  * `?`→0..1). `upper=None` = unbounded. */
final case class Quantifier(lower: Long, upper: Option[Long])

sealed trait PatternElement {
  def varName: Option[String]
  def label: Option[String]
  /** Inline element predicate `(a:L WHERE a.x=1)` — hoisted into the global
    * conjunction like reference match.cpp:799-846. SQL expression text. */
  def where: Option[String]
}

final case class VertexPattern(
    varName: Option[String],
    label: Option[String],
    where: Option[String] = None) extends PatternElement

final case class EdgePattern(
    varName: Option[String],
    label: Option[String],
    direction: EdgeDirection,
    quantifier: Option[Quantifier] = None,
    where: Option[String] = None) extends PatternElement

/** One comma-separated pattern: alternating vertex/edge elements, optionally
  * named (`p = ANY SHORTEST (a)-[e]->{1,3}(b)`). */
final case class PathPattern(
    pathVar: Option[String],
    prefix: Option[SearchPrefix],
    mode: PathMode,
    elements: Seq[PatternElement]) {
  def vertices: Seq[VertexPattern] =
    elements.collect { case v: VertexPattern => v }
  def edges: Seq[EdgePattern] =
    elements.collect { case e: EdgePattern => e }
}

/** One COLUMNS entry: SQL expression text + optional alias
  * (reference match.cpp:1011-1087). `expr="a.*"` / `"*"` are star
  * expansions (match.cpp:1054-1080). */
final case class ColumnSpec(expr: String, alias: Option[String] = None)

/** The full `GRAPH_TABLE(pg MATCH <patterns> [WHERE cond] [COLUMNS (...)])`
  * (reference `matchref.hpp:10-36`). */
final case class MatchSpec(
    graphName: String,
    patterns: Seq[PathPattern],
    where: Option[String] = None,
    columns: Seq[ColumnSpec] = Seq(ColumnSpec("*")))
