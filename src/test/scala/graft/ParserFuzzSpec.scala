package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.GraphAnalysisException
import graft.pgq.PgqParser

/** Seeded fuzz over the hand-rolled parser: any byte soup must either
  * parse or raise the parser's own `GraphAnalysisException` with a
  * message — never a `MatchError`, `StringIndexOutOfBounds`, NPE or
  * stack overflow. Three generators: random PGQ-token soup (hits the
  * grammar's backtracking paths), random mutations of VALID queries
  * (hits mid-production error handling), and random unicode noise. */
class ParserFuzzSpec extends AnyFunSuite {

  private val tokens = Array(
    "MATCH", "COLUMNS", "WHERE", "ANY", "SHORTEST", "ALL", "TRAIL",
    "SIMPLE", "ACYCLIC", "WALK", "AS", "IS", "(", ")", "[", "]", "{", "}",
    "-", "->", "<-", "<", ">", "*", "+", "?", ",", ":", ".", "=", "|",
    "a", "b", "pg", "Person", "Knows", "1", "2", "''", "\"q\"", "p", " ")

  private val valid = Seq(
    """pg MATCH (a:Person)-[k:Knows]->(b:Person)
       COLUMNS (a.name AS a_name)""",
    """pg MATCH p = ANY SHORTEST (a:Person)-[k:Knows]->{1,3}(b:Person)
       COLUMNS (path_length(p) AS d)""",
    """pg MATCH (a:Person WHERE a.x = 1)<-[k]->(b) WHERE b.y < 2
       COLUMNS (*)""")

  private def mustNotCrash(input: String, hint: String): Unit =
    try { PgqParser.graphTable(input); () }
    catch {
      case _: GraphAnalysisException => () // the parser's own error — fine
      case e: Throwable =>
        fail(s"parser crashed with ${e.getClass.getName}: " +
          s"${e.getMessage} on $hint input <<$input>>")
    }

  test("random token soup never escapes the parser's error type") {
    val rnd = new scala.util.Random(20260813L)
    for (i <- 1 to 400) {
      val n = 1 + rnd.nextInt(25)
      val q = Seq.fill(n)(tokens(rnd.nextInt(tokens.length))).mkString(" ")
      mustNotCrash(s"pg MATCH $q", s"soup #$i")
      mustNotCrash(q, s"bare soup #$i")
    }
  }

  test("mutations of valid queries fail cleanly or parse") {
    val rnd = new scala.util.Random(42L)
    for (base <- valid; i <- 1 to 120) {
      val b = new StringBuilder(base)
      rnd.nextInt(3) match {
        case 0 => // delete a random slice
          val at = rnd.nextInt(b.length)
          b.delete(at, math.min(b.length, at + 1 + rnd.nextInt(4)))
        case 1 => // insert a random token
          b.insert(rnd.nextInt(b.length),
            " " + tokens(rnd.nextInt(tokens.length)) + " ")
        case 2 => // swap two characters
          val (x, y) = (rnd.nextInt(b.length), rnd.nextInt(b.length))
          val t = b(x); b(x) = b(y); b(y) = t
      }
      mustNotCrash(b.toString, s"mutation #$i of valid query")
    }
  }

  test("unicode noise and pathological nesting fail cleanly") {
    val rnd = new scala.util.Random(7L)
    for (i <- 1 to 80) {
      val q = (1 to 1 + rnd.nextInt(30))
        .map(_ => rnd.nextPrintableChar()).mkString
      mustNotCrash(s"pg MATCH ($q)", s"noise #$i")
    }
    // deep nesting must not blow the stack or loop
    mustNotCrash("pg MATCH " + "(" * 2000, "deep open parens")
    mustNotCrash("pg MATCH (a)" + "-[e]->(b)" * 500 + " COLUMNS (*)",
      "500-hop chain")
    // DDL path too
    try { PgqParser.statement("CREATE PROPERTY GRAPH " + ")" * 50); () }
    catch {
      case _: GraphAnalysisException => ()
      case e: Throwable => fail(s"DDL parser crashed: ${e.getClass.getName}")
    }
  }
}
