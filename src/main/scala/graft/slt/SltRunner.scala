package graft.slt

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.{Graft, model}
import graft.model.{ForeignKeySpec, GraphAnalysisException, TableKeys,
  TableResolver}

/** Mechanical replay of the reference's sqllogictest corpus
  * (`test/sql` `.test` files of the reference) against the Spark engine — the
  * "tiny sqllogictest-style runner" SURVEY §5 budgeted. It parses the
  * classic sqllogictest record format (`statement ok`,
  * `statement error` + expected message, `query <types> [sort]` +
  * expected rows) and executes each record through [[graft.Graft]],
  * keeping per-file isolation with a fresh Spark sub-session.
  *
  * Documented divergences from a native DuckDB run:
  *  - `CREATE TABLE` / `INSERT INTO` are interpreted by a mini table
  *    store (Spark temp views): Spark SQL has no constraint DDL, so
  *    PRIMARY KEY / REFERENCES clauses are stripped into
  *    [[graft.model.KeyRegistry]] — which is exactly what makes the
  *    reference's PK/FK key-inference tests replayable.
  *  - Result comparison is a sorted multiset of rendered rows: a Spark
  *    plan has no deterministic row order without ORDER BY, so insertion-
  *    order-dependent expectations compare order-insensitively.
  *  - `statement error` asserts that the engine errors; the expected
  *    message is matched as a normalized substring when possible and
  *    reported (not failed) otherwise — cross-engine message parity is
  *    exact only where the compiler deliberately mirrors the reference's
  *    text.
  */
object SltRunner {

  sealed trait Record { def line: Int; def sql: String }
  final case class StatementOk(sql: String, line: Int) extends Record
  final case class StatementError(sql: String, expected: String, line: Int)
      extends Record
  final case class QueryRec(sql: String, expected: Seq[String],
      rowsort: Boolean, connection: Option[String], line: Int) extends Record

  final case class RecordResult(record: Record, status: String,
      detail: String = "") // status: pass | fail | skip | msg-mismatch
  final case class FileResult(file: String, skippedFile: Option[String],
      records: Seq[RecordResult]) {
    def passed: Int = records.count(_.status == "pass")
    def failures: Seq[RecordResult] = records.filter(_.status == "fail")
    def skipped: Seq[RecordResult] = records.filter(_.status == "skip")
    def msgMismatches: Seq[RecordResult] =
      records.filter(_.status == "msg-mismatch")
  }

  /** Extensions this engine satisfies for `require`. */
  private val knownRequires = Set("duckpgq", "parquet", "json")

  // ---------------------------------------------------------------- parse

  def parse(text: String): (Seq[Record], Option[String]) = {
    val lines = text.split("\n", -1)
    val records = mutable.ArrayBuffer.empty[Record]
    var skipFile: Option[String] = None
    var i = 0
    def collectUntil(stop: String => Boolean): Seq[String] = {
      val buf = mutable.ArrayBuffer.empty[String]
      while (i < lines.length && !stop(lines(i))) { buf += lines(i); i += 1 }
      buf.toSeq
    }
    while (i < lines.length && skipFile.isEmpty) {
      val raw = lines(i)
      val l = raw.trim
      if (l.isEmpty || l.startsWith("#")) { i += 1 }
      else if (l.toLowerCase.startsWith("require-env")) {
        skipFile = Some(s"require-env not provided: $l")
      } else if (l.toLowerCase.startsWith("require ")) {
        val ext = l.split("\\s+")(1).toLowerCase
        if (!knownRequires.contains(ext)) skipFile = Some(s"require $ext")
        i += 1
      } else if (l.toLowerCase.startsWith("mode ") ||
          l.toLowerCase.startsWith("load ") ||
          l.toLowerCase.startsWith("restart")) {
        skipFile = Some(s"unsupported directive: $l")
      } else if (l.toLowerCase.startsWith("loop") ||
          l.toLowerCase.startsWith("foreach")) {
        skipFile = Some(s"unsupported directive: $l")
      } else if (l.toLowerCase.startsWith("statement ok")) {
        val at = i; i += 1
        val sql = collectUntil(s => s.trim.isEmpty || s.trim == "----")
          .mkString("\n")
        if (i < lines.length && lines(i).trim == "----") {
          i += 1; collectUntil(_.trim.isEmpty) // tolerated stray block
        }
        records += StatementOk(sql, at + 1)
      } else if (l.toLowerCase.startsWith("statement error")) {
        val at = i; i += 1
        val sql = collectUntil(s => s.trim == "----" || s.trim.isEmpty)
          .mkString("\n")
        var expected = ""
        if (i < lines.length && lines(i).trim == "----") {
          i += 1
          expected = collectUntil(_.trim.isEmpty).mkString("\n")
        }
        records += StatementError(sql, expected, at + 1)
      } else if (l.toLowerCase.startsWith("query")) {
        val at = i
        val header = l.split("\\s+").toSeq
        val rowsort = header.exists(_.equalsIgnoreCase("rowsort"))
        val conn = header.drop(2)
          .find(h => !h.equalsIgnoreCase("rowsort") &&
            !h.equalsIgnoreCase("valuesort") && !h.equalsIgnoreCase("nosort"))
        i += 1
        val sql = collectUntil(s => s.trim == "----" || s.trim.isEmpty)
          .mkString("\n")
        var expected = Seq.empty[String]
        if (i < lines.length && lines(i).trim == "----") {
          i += 1
          expected = collectUntil(_.trim.isEmpty).map(_.stripLineEnd)
        }
        records += QueryRec(sql, expected, rowsort, conn, at + 1)
      } else {
        skipFile = Some(s"unrecognized directive at line ${i + 1}: $l")
      }
    }
    (records.toSeq, skipFile)
  }

  // ------------------------------------------------------------- execute

  /** @param divergences record line → documented-divergence reason: a
    *   record failing at such a line reports `skip` with the reason
    *   instead of failing the file (e.g. rowid-exact expectations, or
    *   reference NotImplemented errors for features graft supports). */
  def runFile(spark0: SparkSession, path: String,
      divergences: Map[Int, String] = Map.empty): FileResult = {
    val res = runFileRaw(spark0, path)
    res.copy(records = res.records.map { r =>
      divergences.get(r.record.line) match {
        case Some(reason) if r.status == "fail" =>
          r.copy(status = "skip",
            detail = s"documented divergence: $reason (was: ${r.detail})")
        case _ => r
      }
    })
  }

  private def runFileRaw(spark0: SparkSession, path: String): FileResult = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    val (records, skipFile) = parse(text)
    if (skipFile.isDefined) return FileResult(path, skipFile, Nil)
    if (records.exists {
        case q: QueryRec => q.connection.isDefined
        case _ => false
      })
      return FileResult(path,
        Some("multi-connection test (per-connection state is N/A for a " +
          "single-session Spark replay)"), Nil)
    val session = new SltSession(spark0)
    val out = records.map {
      case r @ StatementOk(sql, _) =>
        splitStatements(sql).foldLeft(RecordResult(r, "pass")) { (acc, s) =>
          if (acc.status != "pass") acc
          else try { session.execute(s).foreach(_.collect()); acc }
          catch {
            case SkipStatement(reason) => RecordResult(r, "skip", reason)
            case e: Throwable =>
              RecordResult(r, "fail", s"threw: ${trimMsg(e)}")
          }
        }
      case r @ StatementError(sql, expected, _) =>
        try {
          splitStatements(sql).foreach(s =>
            session.execute(s).foreach(_.collect()))
          RecordResult(r, "fail", "expected an error, statement succeeded")
        } catch {
          case SkipStatement(reason) => RecordResult(r, "skip", reason)
          case e: Throwable =>
            if (expected.isEmpty || messageMatches(expected, e))
              RecordResult(r, "pass")
            else RecordResult(r, "msg-mismatch",
              s"expected «${normalizeExpected(expected)}» got «${trimMsg(e)}»")
        }
      case r @ QueryRec(sql, expected, _, _, _) =>
        try {
          val dfOpt = session.execute(
            splitStatements(sql).headOption.getOrElse(sql))
          val got = dfOpt.map(renderRows).getOrElse(Nil)
          val want = normalizeExpectedRows(expected)
          if (got.sorted == want.sorted) RecordResult(r, "pass")
          else RecordResult(r, "fail",
            s"rows differ: got=${got.sorted.take(6).mkString("|")} " +
              s"want=${want.sorted.take(6).mkString("|")}")
        } catch {
          case SkipStatement(reason) => RecordResult(r, "skip", reason)
          case e: Throwable => RecordResult(r, "fail", s"threw: ${trimMsg(e)}")
        }
    }
    FileResult(path, None, out)
  }

  /** Quote-aware split on `;`. */
  def splitStatements(sql: String): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inStr = false
    for (c <- sql) {
      if (inStr) { cur += c; if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true; cur += c
        case ';' => if (cur.toString.trim.nonEmpty) out += cur.toString
          cur.clear()
        case _ => cur += c
      }
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString
    out.toSeq
  }

  private def trimMsg(e: Throwable): String =
    Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
      .linesIterator.take(2).mkString(" ").take(300)

  /** Reference messages carry an `Invalid Error:` / `Binder Error:` /
    * `Parser Error:` class prefix and may be a substring-with-wildcards;
    * match loosely: strip the prefix, then require the longest
    * non-wildcard chunk to appear in our message (case-insensitive). */
  private def normalizeExpected(expected: String): String =
    expected.linesIterator.mkString(" ")
      .replaceFirst("^(Invalid|Binder|Parser|Catalog|Constraint|IO|" +
        "Not implemented) Error:\\s*", "")
      .trim
  private def messageMatches(expected: String, e: Throwable): Boolean = {
    val norm = normalizeExpected(expected)
    val chunks = norm.split("<REGEX>:?|\\.\\*").filter(_.trim.nonEmpty)
    val longest = if (chunks.isEmpty) norm
      else chunks.maxBy(_.length).trim
    val ours = Option(e.getMessage).getOrElse("").linesIterator
      .mkString(" ").toLowerCase
    longest.nonEmpty && ours.contains(longest.toLowerCase)
  }

  /** sqllogictest renders one VALUE per line when a row has a single
    * column; multi-column rows are tab-separated on one line. Empty
    * string renders `(empty)`. */
  private def normalizeExpectedRows(expected: Seq[String]): Seq[String] =
    expected.map(_.replace("\t", ""))

  def renderRows(df: DataFrame): Seq[String] = {
    val rows = df.collect()
    rows.toSeq.map(r => (0 until r.length).map(i =>
      renderValue(r.get(i))).mkString(""))
  }

  private def renderValue(v: Any): String = v match {
    case null => "NULL"
    case s: String => if (s.isEmpty) "(empty)" else s
    case b: Boolean => if (b) "true" else "false"
    case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
    case f: Float => renderDouble(f.toDouble)
    case d: Double => renderDouble(d)
    case i: java.lang.Integer => i.toString
    case l: java.lang.Long => l.toString
    case a: scala.collection.Seq[_] =>
      a.map(renderListValue).mkString("[", ", ", "]")
    case a: Array[_] => a.map(renderListValue).mkString("[", ", ", "]")
    case r: Row =>
      // DuckDB struct rendering: {'field': value, …}
      r.schema.fieldNames.zipWithIndex.map { case (f, i) =>
        s"'$f': ${renderListValue(r.get(i))}"
      }.mkString("{", ", ", "}")
    case ts: java.sql.Timestamp => ts.toString
    case d: java.sql.Date => d.toString
    case other => other.toString
  }

  /** DuckDB prints integral doubles as `N.0`, everything else with
    * minimal digits. */
  private def renderDouble(d: Double): String =
    if (d.isNaN) "nan"
    else if (d.isInfinite) { if (d > 0) "inf" else "-inf" }
    else if (d == math.rint(d) && math.abs(d) < 1e15) s"${d.toLong}.0"
    else d.toString

  /** Inside DuckDB list/struct rendering, NULL spells NULL and strings
    * are bare (matching the reference expectations like `[0]`,
    * `{'id': 0, 'name': Daniel}`). */
  private def renderListValue(v: Any): String = v match {
    case null => "NULL"
    case s: String => s
    case other => renderValue(other)
  }

  final case class SkipStatement(reason: String) extends RuntimeException
}

/** Per-file execution state: an isolated Spark sub-session, a mini table
  * store for `CREATE TABLE` / `INSERT INTO`, and a [[Graft]] facade for
  * everything PGQ. */
final class SltSession(spark0: SparkSession) {
  import SltRunner.SkipStatement

  val spark: SparkSession = spark0.newSession()
  private val g = Graft(spark, TableResolver.catalog)
  private val keyReg = model.KeyRegistry.forSession(spark)
  private val tables = mutable.Map.empty[String, DataFrame]

  /** Executes one statement; Some(df) when it produces rows. */
  def execute(statement: String): Option[DataFrame] = {
    val stmt = statement.trim.stripSuffix(";").trim
    if (stmt.isEmpty) return None
    val u = stmt.toUpperCase.replaceAll("\\s+", " ")
    if (u.startsWith("CREATE TABLE") ||
        u.startsWith("CREATE OR REPLACE TABLE")) {
      createTable(stmt); None
    } else if (u.startsWith("INSERT INTO")) { insert(stmt); None }
    else if (u.startsWith("DROP TABLE")) { dropTable(stmt); None }
    else if (u.startsWith("CREATE PROPERTY GRAPH") ||
        u.startsWith("CREATE OR REPLACE PROPERTY GRAPH") ||
        u.startsWith("DROP PROPERTY GRAPH") ||
        u.startsWith("-CREATE PROPERTY GRAPH")) {
      g.sql(stmt); None
    } else if (u.startsWith("DESCRIBE PROPERTY GRAPH")) {
      val name = stmt.split("\\s+").last
      Some(_root_.graft.ddl.Introspect.describe(spark,
        g.registry.get(spark, name)))
    } else if (u.startsWith("IMPORT DATABASE")) {
      importDatabase(stmt); None
    } else if (u.startsWith("ATTACH") || u.startsWith("USE ") ||
        u.startsWith("PRAGMA") || u.startsWith("SET ") ||
        u.startsWith("CHECKPOINT") || u.startsWith("EXPORT") ||
        u.startsWith("CALL ")) {
      throw SkipStatement(s"host-engine statement: ${stmt.take(40)}")
    } else {
      // query (SELECT/FROM/WITH…): DuckDB's FROM-first shorthand becomes
      // SELECT *; GRAPH_TABLE spans are compiled and substituted
      if (u.contains("__DUCKPGQ_INTERNAL")) registerInternalView()
      val q = if (u.startsWith("FROM ") || u.startsWith("FROM(") ||
          u.startsWith("FROM\n")) s"SELECT * $stmt" else stmt
      Some(g.sqlGraph(q))
    }
  }

  /** `import database 'dir'` — the reference test corpus loads its LDBC
    * SNB sample this way (`load.sql` COPY per parquet). Spark analogue:
    * register every parquet in the directory as a temp view named by
    * file basename (case-insensitive resolution matches the COPY names). */
  private def importDatabase(stmt: String): Unit = {
    val m = "'([^']+)'".r.findFirstMatchIn(stmt).getOrElse(
      throw SkipStatement(s"unparsed import database: ${stmt.take(50)}"))
    val dir0 = new java.io.File(m.group(1))
    val dir = if (dir0.isAbsolute) dir0
      else new java.io.File("/root/reference", m.group(1))
    val files = Option(dir.listFiles()).map(_.toSeq).getOrElse(Nil)
      .filter(_.getName.endsWith(".parquet"))
    if (files.isEmpty)
      throw SkipStatement(s"import database: no parquet under $dir")
    files.foreach { f =>
      val name = f.getName.stripSuffix(".parquet")
      val df = spark.read.parquet(f.getPath)
      tables(name.toLowerCase) = df
      df.createOrReplaceTempView(name)
      keyReg.register(name, TableKeys())
    }
  }

  /** Compat view of the reference's `__duckpgq_internal` catalog table
    * (DDL `src/duckpgq_state.cpp:5-32`): one row per registered
    * vertex/edge table, with the source/destination key columns the
    * tests introspect. */
  private def registerInternalView(): Unit = {
    val names = g.registry.list(spark)
    val rows = names.flatMap { n =>
      val pg = g.registry.get(spark, n)
      val tableByLabel = pg.vertexTables.map(v =>
        v.label.toLowerCase -> v.tableName).toMap
      pg.vertexTables.map(v =>
        Row(n, v.tableName, v.label, true,
          null, null, null, null, null, null,
          v.discriminator.orNull, v.subLabels,
          "memory", "main", null, null, null, null,
          v.properties, v.properties)) ++
        pg.edgeTables.map(e =>
          Row(n, e.tableName, e.label, false,
            tableByLabel.getOrElse(e.srcLabel.toLowerCase, e.srcLabel),
            e.srcRefKeys, e.srcKeys,
            tableByLabel.getOrElse(e.dstLabel.toLowerCase, e.dstLabel),
            e.dstRefKeys, e.dstKeys,
            e.discriminator.orNull, e.subLabels,
            "memory", "main", "memory", "main", "memory", "main",
            e.properties, e.properties))
    }
    val arr = ArrayType(StringType)
    // the reference's 20-column layout, duckpgq_state.cpp:5-32
    val schema = StructType(Seq(
      StructField("property_graph", StringType),
      StructField("table_name", StringType),
      StructField("label", StringType),
      StructField("is_vertex_table", BooleanType),
      StructField("source_table", StringType),
      StructField("source_pk", arr),
      StructField("source_fk", arr),
      StructField("destination_table", StringType),
      StructField("destination_pk", arr),
      StructField("destination_fk", arr),
      StructField("discriminator", StringType),
      StructField("sub_labels", arr),
      StructField("catalog", StringType),
      StructField("schema", StringType),
      StructField("source_catalog", StringType),
      StructField("source_schema", StringType),
      StructField("destination_catalog", StringType),
      StructField("destination_schema", StringType),
      StructField("properties", arr),
      StructField("column_aliases", arr)))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
      .createOrReplaceTempView("__duckpgq_internal")
  }

  // ------------------------------------------------------- CREATE TABLE

  private val createRe =
    ("(?is)^CREATE\\s+(OR\\s+REPLACE\\s+)?TABLE\\s+(?:IF\\s+NOT\\s+EXISTS" +
      "\\s+)?([A-Za-z_][A-Za-z0-9_]*)\\s*\\((.*)\\)\\s*$").r

  private def createTable(stmt: String): Unit = stmt match {
    case createRe(orReplace, name, body) =>
      if (orReplace == null && tables.contains(name.toLowerCase))
        throw GraphAnalysisException(
          s"Table with name \"$name\" already exists!")
      val fields = mutable.ArrayBuffer.empty[StructField]
      var pk = Seq.empty[String]
      val fks = mutable.ArrayBuffer.empty[ForeignKeySpec]
      splitTopLevel(body, ',').map(_.trim).filter(_.nonEmpty).foreach { c =>
        val cu = c.toUpperCase
        if (cu.startsWith("PRIMARY KEY")) {
          pk = identsIn(c.substring(c.indexOf('(')))
        } else if (cu.startsWith("FOREIGN KEY")) {
          val m = ("(?is)FOREIGN\\s+KEY\\s*\\(([^)]*)\\)\\s*REFERENCES\\s+" +
            "([A-Za-z_][A-Za-z0-9_]*)\\s*\\(([^)]*)\\)").r
            .findFirstMatchIn(c).getOrElse(
              throw SkipStatement(s"unparsed constraint: $c"))
          fks += ForeignKeySpec(identsIn(m.group(1)), m.group(2),
            identsIn(m.group(3)))
        } else if (cu.startsWith("UNIQUE") || cu.startsWith("CHECK")) {
          () // no engine effect in replay
        } else {
          val toks = c.split("\\s+", 3)
          val colName = toks(0)
          val tpe = sparkType(if (toks.length > 1) toks(1) else "STRING")
          fields += StructField(colName, tpe)
          if (cu.contains("PRIMARY KEY")) pk = Seq(colName)
          val rm = ("(?is)REFERENCES\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*" +
            "\\(([^)]*)\\)").r.findFirstMatchIn(c)
          rm.foreach { m =>
            fks += ForeignKeySpec(Seq(colName), m.group(1),
              identsIn(m.group(2)))
          }
        }
      }
      // the reference's binder refuses an FK whose target has no PK
      // (create_pg_with_pk_fk.test: "Failed to create foreign key…")
      fks.foreach { fk =>
        val targetPk = keyReg.get(fk.refTable).map(_.pk).getOrElse(Nil)
        if (targetPk.isEmpty)
          throw GraphAnalysisException(
            "Failed to create foreign key: there is no primary key or " +
              s"unique constraint for referenced table \"${fk.refTable}\"")
      }
      val schema = StructType(fields.toSeq)
      val df = spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)
      tables(name.toLowerCase) = df
      df.createOrReplaceTempView(name)
      keyReg.register(name, TableKeys(pk, fks.toSeq))
    case _ =>
      // CREATE TABLE t AS SELECT … — evaluate the query and register
      val asRe = "(?is)^CREATE\\s+(?:OR\\s+REPLACE\\s+)?TABLE\\s+" +
        "([A-Za-z_][A-Za-z0-9_]*)\\s+AS\\s+(.*)$"
      asRe.r.findFirstMatchIn(stmt) match {
        case Some(m) =>
          val df = g.sqlGraph(m.group(2))
          tables(m.group(1).toLowerCase) = df
          df.createOrReplaceTempView(m.group(1))
          keyReg.register(m.group(1), TableKeys())
        case None => throw SkipStatement(
          s"unparsed CREATE TABLE: ${stmt.take(60)}")
      }
  }

  private def dropTable(stmt: String): Unit = {
    val name = stmt.split("\\s+").last
    tables.remove(name.toLowerCase)
    keyReg.drop(name)
    spark.catalog.dropTempView(name)
  }

  // -------------------------------------------------------- INSERT INTO

  private val insertRe =
    ("(?is)^INSERT\\s+INTO\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*" +
      "(\\([^)]*\\))?\\s*VALUES\\s*(.*)$").r

  private def insert(stmt: String): Unit = stmt match {
    case insertRe(name, colsOpt, valuesSql) =>
      val existing = tables.getOrElse(name.toLowerCase,
        throw GraphAnalysisException(s"Table $name does not exist"))
      val schema = existing.schema
      val cols: Seq[String] =
        if (colsOpt == null) schema.fieldNames.toSeq
        else identsIn(colsOpt)
      val incoming = spark.sql(s"SELECT * FROM VALUES $valuesSql")
      val renamed = incoming.toDF(cols: _*)
      import org.apache.spark.sql.functions.{col => fcol, lit}
      val aligned = renamed.select(schema.fields.map { f =>
        if (cols.exists(_.equalsIgnoreCase(f.name)))
          fcol(cols.find(_.equalsIgnoreCase(f.name)).get)
            .cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }.toIndexedSeq: _*)
      val updated = existing.unionByName(aligned).localCheckpoint()
      tables(name.toLowerCase) = updated
      updated.createOrReplaceTempView(name)
    case _ =>
      // query-form INSERT: `INSERT INTO t (SELECT …)` / `INSERT INTO t
      // SELECT …` — evaluated through the same graph-aware SQL path
      val qm = ("(?is)^INSERT\\s+INTO\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*" +
        "\\(?\\s*((?:SELECT|FROM|WITH)\\b.*?)\\)?\\s*$").r
        .findFirstMatchIn(stmt)
      qm match {
        case Some(m) =>
          val name = m.group(1)
          val existing = tables.getOrElse(name.toLowerCase,
            throw GraphAnalysisException(s"Table $name does not exist"))
          val incoming = g.sqlGraph(m.group(2))
          import org.apache.spark.sql.functions.{col => fcol}
          val aligned = incoming.toDF(existing.schema.fieldNames.toSeq: _*)
            .select(existing.schema.fields.map(f =>
              fcol(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
          val updated = existing.unionByName(aligned).localCheckpoint()
          tables(name.toLowerCase) = updated
          updated.createOrReplaceTempView(name)
        case None => throw SkipStatement(
          s"unparsed INSERT: ${stmt.take(60)}")
      }
  }

  // ------------------------------------------------------------ helpers

  private def identsIn(parens: String): Seq[String] =
    parens.replaceAll("[()]", " ").split(",").map(_.trim)
      .filter(_.nonEmpty).toSeq

  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    for (c <- s) c match {
      case '(' => depth += 1; cur += c
      case ')' => depth -= 1; cur += c
      case `sep` if depth == 0 => out += cur.toString; cur.clear()
      case _ => cur += c
    }
    out += cur.toString
    out.toSeq
  }

  private def sparkType(t: String): DataType = t.toUpperCase match {
    case "BIGINT" | "INT8" | "LONG" | "HUGEINT" => LongType
    case "INTEGER" | "INT" | "INT4" | "SIGNED" => IntegerType
    case "SMALLINT" | "INT2" => ShortType
    case "TINYINT" | "INT1" => ByteType
    case "VARCHAR" | "TEXT" | "STRING" | "CHAR" => StringType
    case "DOUBLE" | "FLOAT8" | "REAL" | "FLOAT" => DoubleType
    case "BOOLEAN" | "BOOL" => BooleanType
    case "DATE" => DateType
    case "TIMESTAMP" | "DATETIME" => TimestampType
    case "DECIMAL" | "NUMERIC" => DecimalType(38, 18)
    case other if other.startsWith("DECIMAL") => DecimalType(38, 18)
    case other if other.startsWith("VARCHAR") => StringType
    case _ => StringType
  }
}
