package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model._

/** The standard property graph over the driver testdata
  * (`TESTDATA.md` / FIXTURES.md F6), plus derived edge views used by the
  * path-finding and algorithm queries. Every derived view has an exact SQL
  * CTE equivalent (see [[SparkEntry.oracleSql]]) so results are
  * DuckDB-verifiable.
  *
  * Derived nation-level graphs (25 vertices, 5 per region):
  *  - `nation_next` — directed ring within each region (successor by key,
  *    wrapping): interesting BFS distances 1..4
  *  - `nation_adj`  — same-region complete digraph: dense algorithm input
  *  - `nation_near` — same-region pairs with |Δkey| ≤ 10: triangles for LCC
  */
object TradeGraph {

  val graph: PropertyGraph = PropertyGraph("trade",
    vertexTables = Seq(
      VertexTable("customer", "Customer", Seq("c_custkey")),
      VertexTable("supplier", "Supplier", Seq("s_suppkey")),
      VertexTable("nation", "Nation", Seq("n_nationkey")),
      VertexTable("region", "Region", Seq("r_regionkey")),
      VertexTable("orders", "Order", Seq("o_orderkey")),
      // sub-label demo: parts discriminated by the low bits of p_size
      // (reference inheritance semantics: (disc & 2^idx) != 0,
      // match.cpp:278-296)
      VertexTable("part", "Part", Seq("p_partkey"),
        discriminator = Some("p_size"),
        subLabels = Seq("OddSizePart", "Bit1Part")),
      // composite-key demo: nations keyed by (region, nation) tuples —
      // exercises the dense-rowid tuple mapping in the path kernels
      // (reference maps PK/FK tuples to rowids during CSR construction,
      // compressed_sparse_row.cpp:194-204,238-250)
      VertexTable("nation", "CNation", Seq("n_regionkey", "n_nationkey"))),
    edgeTables = Seq(
      EdgeTable("customer", "InNation", Seq("c_custkey"), Seq("c_custkey"),
        "Customer", Seq("c_nationkey"), Seq("n_nationkey"), "Nation"),
      EdgeTable("supplier", "SuppNation", Seq("s_suppkey"), Seq("s_suppkey"),
        "Supplier", Seq("s_nationkey"), Seq("n_nationkey"), "Nation"),
      EdgeTable("nation", "InRegion", Seq("n_nationkey"), Seq("n_nationkey"),
        "Nation", Seq("n_regionkey"), Seq("r_regionkey"), "Region"),
      EdgeTable("orders", "Placed", Seq("o_custkey"), Seq("c_custkey"),
        "Customer", Seq("o_orderkey"), Seq("o_orderkey"), "Order"),
      // edge sub-label demo (reference allows IN typemask on edge tables,
      // pgq.gram:18-24): line items discriminated by the low bits of
      // l_linenumber — `-[:OddLine]->` matches (l_linenumber & 1) = 1
      EdgeTable("lineitem", "Contains", Seq("l_orderkey"), Seq("o_orderkey"),
        "Order", Seq("l_partkey"), Seq("p_partkey"), "Part",
        discriminator = Some("l_linenumber"),
        subLabels = Seq("OddLine", "Bit2Line")),
      EdgeTable("nation_next", "NationNext", Seq("src"), Seq("n_nationkey"),
        "Nation", Seq("dst"), Seq("n_nationkey"), "Nation"),
      EdgeTable("nation_adj", "NationAdj", Seq("src"), Seq("n_nationkey"),
        "Nation", Seq("dst"), Seq("n_nationkey"), "Nation"),
      EdgeTable("nation_near", "NationNear", Seq("src"), Seq("n_nationkey"),
        "Nation", Seq("dst"), Seq("n_nationkey"), "Nation"),
      // composite-key ring: same edges as NationNext, endpoints declared
      // as (region, nation) tuples
      EdgeTable("nation_cnext", "CNext", Seq("src_r", "src_n"),
        Seq("n_regionkey", "n_nationkey"), "CNation", Seq("dst_r", "dst_n"),
        Seq("n_regionkey", "n_nationkey"), "CNation"),
      // BRIDGE between the two key spaces over the same physical table:
      // the same ring step, source declared through the NUMERIC Nation
      // key, destination through the COMPOSITE CNation tuple — the
      // fixture for named paths whose segments span different vertex-key
      // spaces (per-segment surrogate translation) and for cross-space
      // ACYCLIC/SIMPLE identity (key-space bijection through the shared
      // table rows)
      EdgeTable("nation_cnext", "NBridge", Seq("src_n"),
        Seq("n_nationkey"), "Nation", Seq("dst_r", "dst_n"),
        Seq("n_regionkey", "n_nationkey"), "CNation")))

  /** Resolver: parquet tables + the derived views above. */
  def resolver(sfDir: String): TableResolver = new TableResolver {
    def apply(spark: SparkSession, t: String): DataFrame = t match {
      case "nation_next" => nationNext(spark, sfDir)
      case "nation_adj"  => nationAdj(spark, sfDir)
      case "nation_near" => nationNear(spark, sfDir)
      case "nation_cnext" => nationCNext(spark, sfDir)
      case "events" => events(spark, sfDir)
      case other => baseTable(spark, sfDir, other)
    }
  }

  /** Memoized parquet loader: every `spark.read.parquet` call re-lists the
    * path and re-reads footers for schema — a driver job per call, paid by
    * EVERY query that touches the table (the bench fires hundreds). The
    * analyzed relation (with its resolved FileIndex) is parked once per
    * (session, path) as a temp view; `spark.table` reuses it job-free.
    * Data is NOT cached — at the 100 TB target only the plan is worth
    * pinning, and scans stay streaming parquet reads. */
  def baseTable(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cachedView(spark, s"base_$name:$sfDir", cache = false) {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }

  private def nation(spark: SparkSession, sfDir: String): DataFrame =
    baseTable(spark, sfDir, "nation")

  // derived views are rebuilt by every query that touches them (the
  // registry stores names, not plans) — cache one copy per
  // (session, sfDir) INSIDE the session's own catalog (temp view +
  // cacheTable), so the cache lives and dies with the session instead of
  // pinning it from a driver-global map (a map value holding a DataFrame
  // would strongly reference the session and defeat weak keys)
  private def cachedView(spark: SparkSession, key: String,
      cache: Boolean = true)(build: => DataFrame): DataFrame = {
    val name = "__graft_view_" + key.replaceAll("[^A-Za-z0-9_]", "_")
    this.synchronized {
      if (!spark.catalog.tableExists(name)) {
        build.createOrReplaceTempView(name)
        if (cache) spark.catalog.cacheTable(name)
      }
    }
    spark.table(name)
  }

  /** Ring within each region: successor by n_nationkey, wrapping to min. */
  def nationNext(spark: SparkSession, sfDir: String): DataFrame =
    cachedView(spark, s"nation_next:$sfDir") {
      val w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
      nation(spark, sfDir)
        .select(col("n_nationkey").as("src"),
          coalesce(lead("n_nationkey", 1).over(w),
            min("n_nationkey").over(Window.partitionBy("n_regionkey")))
            .as("dst"))
    }

  /** Same-region complete digraph (no self-loops). */
  def nationAdj(spark: SparkSession, sfDir: String): DataFrame =
    cachedView(spark, s"nation_adj:$sfDir") {
      val n = nation(spark, sfDir)
      n.as("a").join(n.as("b"),
          col("a.n_regionkey") === col("b.n_regionkey") &&
          col("a.n_nationkey") =!= col("b.n_nationkey"))
        .select(col("a.n_nationkey").as("src"),
          col("b.n_nationkey").as("dst"))
    }

  /** Same-region pairs with |Δ n_nationkey| ≤ 10. Region r holds nations
    * {r, r+5, …, r+20} (strided by 5), so the band admits the 1- and
    * 2-step neighbours: 14 directed edges and 3 triangles per region —
    * branching AND cycles, the fixture for LCC and the path-mode
    * enumeration queries. (A tighter band matches nothing: within a
    * region, key gaps are multiples of 5.) */
  def nationNear(spark: SparkSession, sfDir: String): DataFrame =
    cachedView(spark, s"nation_near:$sfDir") {
      val n = nation(spark, sfDir)
      n.as("a").join(n.as("b"),
          col("a.n_regionkey") === col("b.n_regionkey") &&
          col("a.n_nationkey") =!= col("b.n_nationkey") &&
          abs(col("a.n_nationkey") - col("b.n_nationkey")) <= 10)
        .select(col("a.n_nationkey").as("src"),
          col("b.n_nationkey").as("dst"))
    }

  /** The nation ring with COMPOSITE (region, nation) endpoint keys — the
    * ring stays within a region, so src/dst regions coincide. */
  def nationCNext(spark: SparkSession, sfDir: String): DataFrame =
    cachedView(spark, s"nation_cnext:$sfDir") {
      val n = nation(spark, sfDir)
      nationNext(spark, sfDir).as("nn")
        .join(n.as("n1"), col("nn.src") === col("n1.n_nationkey"))
        .join(n.as("n2"), col("nn.dst") === col("n2.n_nationkey"))
        .select(col("n1.n_regionkey").as("src_r"), col("nn.src").as("src_n"),
          col("n2.n_regionkey").as("dst_r"), col("nn.dst").as("dst_n"))
    }

  /** Loads `events` with `ts` normalized to NANOSECOND LONGS, whatever
    * the parquet encoding (see [[normalizeTs]]). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    cachedView(spark, s"events_norm:$sfDir", cache = false) {
      normalizeTs(spark.read.parquet(s"$sfDir/events.parquet"))
    }
  }

  /** `events.ts` has shipped as TIMESTAMP(NANOS) parquet (readable only as
    * raw ns longs via `nanosAsLong` — Spark's reader rejects nanos as a
    * timestamp), as TIMESTAMP(MICROS) (a `TIMESTAMP_NTZ` to Spark), or as
    * raw longs. Normalize every encoding to NANOSECOND LONGS at the
    * loader: all downstream hour/ms bucketing stays the exact integer
    * arithmetic it was written as (double math loses precision above
    * 2^53), and the DuckDB oracles replay it with `epoch_ms`/`date_trunc`
    * over the same parquet's naive timestamps. The NTZ branch measures
    * from an NTZ epoch literal via `timestampdiff`, which is
    * session-timezone-INDEPENDENT — a cast through TIMESTAMP would shift
    * the instant by the session zone and silently diverge from the naive
    * UTC reading the oracle engine uses. */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampNTZType => df.withColumn("ts",
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
          * lit(1000L))
      case TimestampType => df.withColumn("ts",
        unix_micros(col("ts")) * lit(1000L))
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported type $other — expected long or timestamp")
    }
  }

  /** User-interaction graph derived from the event stream: an edge
    * u→v whenever v's event directly follows u's within the same hour
    * (~1.5k vertices / ~100k edges at sf0.1 — a real, skewed graph for
    * the path kernels, unlike the 25-node nation views). */
  def userEdges(spark: SparkSession, sfDir: String): DataFrame =
    cachedView(spark, s"user_edges:$sfDir") {
      val w = Window.partitionBy("hr").orderBy("ts", "event_id")
      events(spark, sfDir)
        .select(col("user_id"), col("ts"), col("event_id"),
          expr("ts DIV 3600000000000").as("hr"))
        .withColumn("prev", lag("user_id", 1).over(w))
        .filter(col("prev").isNotNull && col("prev") =!= col("user_id"))
        .select(col("prev").as("src"), col("user_id").as("dst"))
        .distinct()
    }

  val sqlUserEdges: String =
    """user_edges AS (
         SELECT DISTINCT prev AS src, user_id AS dst FROM (
           SELECT user_id, ts, event_id,
                  lag(user_id) OVER (PARTITION BY date_trunc('hour', ts)
                    ORDER BY ts, event_id) AS prev
           FROM events)
         WHERE prev IS NOT NULL AND prev <> user_id)"""

  /** [[userEdges]] with the interaction TIME kept: each edge carries the
    * LATER event's ms timestamp — the temporal graph for
    * earliest-arrival reachability. */
  def userTemporalEdges(spark: SparkSession, sfDir: String): DataFrame =
    cachedView(spark, s"user_tedges:$sfDir") {
      val w = Window.partitionBy("hr").orderBy("ts", "event_id")
      events(spark, sfDir)
        .select(col("user_id"), col("ts"), col("event_id"),
          expr("ts DIV 3600000000000").as("hr"))
        .withColumn("prev", lag("user_id", 1).over(w))
        .filter(col("prev").isNotNull && col("prev") =!= col("user_id"))
        .select(col("prev").as("src"), col("user_id").as("dst"),
          expr("ts DIV 1000000").as("ts"))
        .distinct()
    }

  val sqlUserTemporalEdges: String =
    """user_tedges AS (
         SELECT DISTINCT prev AS src, user_id AS dst, epoch_ms(ts) AS ts
         FROM (
           SELECT user_id, ts, event_id,
                  lag(user_id) OVER (PARTITION BY date_trunc('hour', ts)
                    ORDER BY ts, event_id) AS prev
           FROM events)
         WHERE prev IS NOT NULL AND prev <> user_id)"""

  /** Registers `trade` for the session once (schema validation reads
    * every table's parquet footer, so doing it once per session instead
    * of once per query saves ~2 s/query) and returns a Graft facade
    * bound to the sfDir resolver. The "already registered" state is the
    * session registry itself — no driver-global map holding
    * session-referencing values (which would pin stopped sessions; the
    * registry map's values are plain metadata, so its weak keys work).
    * The graph metadata is sfDir-independent; the resolver carries the
    * data location. */
  def graft(spark: SparkSession, sfDir: String): Graft = {
    val g = Graft(spark, resolver(sfDir))
    if (!g.registry.list().contains("trade")) this.synchronized {
      if (!g.registry.list().contains("trade"))
        g.registry.create(spark, graph, resolver(sfDir), orReplace = true)
    }
    g
  }

  /** Matching SQL CTE texts for the derived views (same logic, ANSI SQL) —
    * prepended to oracle queries that need them. */
  val sqlNationNext: String =
    """nation_next AS (
         SELECT n_nationkey AS src,
                coalesce(lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey),
                         min(n_nationkey) OVER (PARTITION BY n_regionkey)) AS dst
         FROM nation)"""

  val sqlNationCNext: String =
    """nation_cnext AS (
         SELECT n1.n_regionkey AS src_r, nn.src AS src_n,
                n2.n_regionkey AS dst_r, nn.dst AS dst_n
         FROM nation_next nn
         JOIN nation n1 ON nn.src = n1.n_nationkey
         JOIN nation n2 ON nn.dst = n2.n_nationkey)"""

  val sqlNationAdj: String =
    """nation_adj AS (
         SELECT a.n_nationkey AS src, b.n_nationkey AS dst
         FROM nation a JOIN nation b
           ON a.n_regionkey = b.n_regionkey AND a.n_nationkey <> b.n_nationkey)"""

  val sqlNationNear: String =
    """nation_near AS (
         SELECT a.n_nationkey AS src, b.n_nationkey AS dst
         FROM nation a JOIN nation b
           ON a.n_regionkey = b.n_regionkey AND a.n_nationkey <> b.n_nationkey
          AND abs(a.n_nationkey - b.n_nationkey) <= 10)"""
}
