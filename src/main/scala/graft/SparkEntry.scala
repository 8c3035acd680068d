package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.graph.{Algorithms, PathFinder}
import graft.ops.{Dedup, Multimodal, OrderedJoins, Packing, Sampling, Similarity, Sketches, TextAnalysis}

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2 (+ the beyond-reference pipeline operators), each with an
  * equivalent DuckDB-ANSI-SQL oracle in `oracleSql` where expressible.
  * Column names/aliases match the oracle exactly (driver hash-compares
  * after sorting columns by name).
  */
object SparkEntry {

  /** Flagship: full SQL/PGQ text round trip (DDL registration happens in
    * TradeGraph.graft) — 2-hop MATCH compiled to DataFrame joins. */
  def entry(spark: SparkSession): DataFrame = {
    val g = TradeGraph.graft(spark, "/root/testdata/sf0.001")
    g.graphTable(
      """trade MATCH (c:Customer)-[e1:InNation]->(n:Nation)-[e2:InRegion]->(r:Region)
         WHERE r.r_name = 'ASIA'
         COLUMNS (c.c_custkey AS custkey, n.n_name AS nation, r.r_name AS region)""")
  }

  // ---------- helpers ----------
  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    TradeGraph.baseTable(spark, sfDir, name)

  /** `events` with `ts` normalized to nanosecond longs whatever the
    * parquet encoding (nanos-as-long, micros timestamp, raw long) — see
    * [[TradeGraph.normalizeTs]]; all time arithmetic below is exact
    * integer math on the normalized column. */
  private def events(spark: SparkSession, sfDir: String): DataFrame =
    TradeGraph.events(spark, sfDir)

  // =========================================================================
  // Relational core (reference generated-SQL operator coverage, SURVEY §2.F)
  // =========================================================================

  private def q1_agg(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("n"))

  private def q2_join_agg(s: SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer"); val o = t(s, d, "orders")
    val n = t(s, d, "nation")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy("n_name")
      .agg(round(sum("o_totalprice"), 2).as("total_price"),
        count(lit(1)).as("n_orders"))
  }

  private def q3_window(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("running_value",
        round(sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
      .select("event_id", "user_id", "rn", "running_value")
  }

  private def q4_setop(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").select(col("c_nationkey").as("key"))
      .unionByName(t(s, d, "supplier").select(col("s_nationkey").as("key")))
      .groupBy("key").agg(count(lit(1)).as("n"))

  private def q5_antijoin(s: SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer")
    val o = t(s, d, "orders").filter(col("o_totalprice") > 300000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_customers_no_orders"))
  }

  /** ROLLUP aggregation (beyond-reference relational breadth — windows,
    * grouping sets etc. come free from Spark SQL, SURVEY §2.F). */
  private def q40_rollup(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        round(sum("l_extendedprice"), 2).as("total"))
      .select(col("l_returnflag"), col("l_linestatus"), col("n"),
        col("total"))

  /** CTE + scalar subquery: nations whose average order value beats the
    * global average. The global average rides as a broadcast single-row
    * join (a literal scalar subquery) — one job, no driver-side action. */
  private def q41_scalar_subquery(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders"); val c = t(s, d, "customer")
    val n = t(s, d, "nation")
    val globalAvg = o.agg(avg("o_totalprice").as("__ga"))
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy("n_name")
      .agg(round(avg("o_totalprice"), 2).as("avg_price"))
      .crossJoin(broadcast(globalAvg))
      .filter(col("avg_price") > col("__ga"))
      .drop("__ga")
  }

  // =========================================================================
  // Pattern matching (SURVEY §2.A — MATCH compiler through the text parser)
  // =========================================================================

  private def q6_match_1hop(s: SparkSession, d: String): DataFrame =
    TradeGraph.graft(s, d).graphTable(
      """trade MATCH (c:Customer)-[e:InNation]->(n:Nation)
         COLUMNS (c.c_custkey AS custkey, n.n_name AS nation)""")

  private def q7_match_2hop(s: SparkSession, d: String): DataFrame =
    TradeGraph.graft(s, d).graphTable(
      """trade MATCH (c:Customer)-[e1:InNation]->(n:Nation)-[e2:InRegion]->(r:Region)
         WHERE r.r_name = 'ASIA'
         COLUMNS (c.c_custkey AS custkey, n.n_name AS nation)""")

  private def q8_match_reverse(s: SparkSession, d: String): DataFrame =
    TradeGraph.graft(s, d).graphTable(
      """trade MATCH (n:Nation)<-[e:SuppNation]-(sup:Supplier)
         COLUMNS (n.n_name AS nation, sup.s_name AS supplier)""")

  private def q9_match_undirected(s: SparkSession, d: String): DataFrame =
    TradeGraph.graft(s, d).graphTable(
      """trade MATCH (a:Nation)-[e:NationNext]-(b:Nation)
         COLUMNS (a.n_nationkey AS a_key, b.n_nationkey AS b_key)""")

  private def q10_match_sublabel(s: SparkSession, d: String): DataFrame =
    TradeGraph.graft(s, d).graphTable(
      """trade MATCH (p:OddSizePart)
         COLUMNS (p.p_partkey AS partkey, p.p_size AS size)""")

  /** Edge sub-label (`IN typemask` on an edge table): `-[ct:OddLine]->`
    * applies the discriminator bitmask to the edge scan, same semantics
    * as vertex inheritance (reference match.cpp:278-296). */
  private def q47_edge_sublabel(s: SparkSession, d: String): DataFrame =
    TradeGraph.graft(s, d).graphTable(
      """trade MATCH (o:Order)-[ct:OddLine]->(p:Part)
         WHERE o.o_totalprice > 400000.0
         COLUMNS (o.o_orderkey AS orderkey, p.p_partkey AS partkey)""")

  /** Variable-length path over a COMPOSITE-key edge table: (region,
    * nation) tuples are mapped to dense rowids for the BFS kernel and
    * mapped back before the plan join — the Spark analogue of the
    * reference's PK/FK-tuple → rowid mapping at CSR-build time
    * (compressed_sparse_row.cpp:194-204,238-250), which is what lets its
    * kernels take composite keys for free. */
  private def q50_composite_varlen(s: SparkSession, d: String): DataFrame =
    TradeGraph.graft(s, d).graphTable(
      """trade MATCH (a:CNation WHERE a.n_regionkey = 0)-[e:CNext]->{1,3}(b:CNation)
         COLUMNS (a.n_nationkey AS src, b.n_nationkey AS dst)""")

  /** TRAIL enumeration (no search prefix): one row PER no-repeated-edge
    * path — the reference raises NotImplemented for every non-WALK path
    * mode (match.cpp:80-108); here the visited-set kernel implements the
    * SQL/PGQ semantics directly. The vertex sequence identifies the trail
    * (nation_near has no parallel edges), so the stringified vertices
    * make each output row a distinct path for the oracle hash. */
  private def q51_trail_enum(s: SparkSession, d: String): DataFrame =
    TradeGraph.graft(s, d).graphTable(
      """trade MATCH p = TRAIL (a:Nation WHERE a.n_regionkey = 0)-[e:NationNear]->{1,3}(b:Nation)
         COLUMNS (a.n_nationkey AS src, b.n_nationkey AS dst,
                  path_length(p) AS dist, vertices(p) AS vpath)""")
      .withColumn("vpath",
        concat_ws(",", transform(col("vpath"), _.cast("string"))))

  /** ACYCLIC enumeration with an UNBOUNDED quantifier and no prefix —
    * rejected outright for WALK (infinite), finite for ACYCLIC because
    * the visited set strictly grows; this is exactly the escape hatch the
    * reference's own error message suggests ("path mode other than
    * WALK") but never implemented. */
  private def q52_acyclic_enum(s: SparkSession, d: String): DataFrame =
    TradeGraph.graft(s, d).graphTable(
      """trade MATCH p = ACYCLIC (a:Nation WHERE a.n_regionkey = 0)-[e:NationNear]->*(b:Nation)
         COLUMNS (a.n_nationkey AS src, b.n_nationkey AS dst,
                  path_length(p) AS dist, vertices(p) AS vpath)""")
      .withColumn("vpath",
        concat_ws(",", transform(col("vpath"), _.cast("string"))))

  /** ALL SHORTEST (reference: NotImplemented, match.cpp:709-790): every
    * shortest path per pair, one row each — the all-minimal-parents BFS
    * multiplied out by the backtrack. */
  private def q53_all_shortest(s: SparkSession, d: String): DataFrame =
    TradeGraph.graft(s, d).graphTable(
      """trade MATCH p = ALL SHORTEST (a:Nation)-[e:NationNear]->{1,2}(b:Nation)
         COLUMNS (a.n_nationkey AS src, b.n_nationkey AS dst,
                  path_length(p) AS dist, vertices(p) AS vpath)""")
      .withColumn("vpath",
        concat_ws(",", transform(col("vpath"), _.cast("string"))))

  /** SHORTEST k (reference: NotImplemented, match.cpp:709-790): the k
    * smallest walks per pair under (length, lexicographic-path) order,
    * one row each. The per-level per-vertex top-k prune keeps the
    * distributed frontier at k·|V| instead of the walk fan-out. The
    * oracle ranks by the vertex list — equivalent here because
    * nation_near has no parallel edges and dense edge ids are ranked by
    * (src, dst), so interleaved-path order equals vertex-list order. */
  private def q54_shortest_k(s: SparkSession, d: String): DataFrame =
    TradeGraph.graft(s, d).graphTable(
      """trade MATCH p = SHORTEST 3 (a:Nation WHERE a.n_regionkey = 0)-[e:NationNear]->{1,3}(b:Nation)
         COLUMNS (a.n_nationkey AS src, b.n_nationkey AS dst,
                  path_length(p) AS dist, vertices(p) AS vpath)""")
      .withColumn("vpath",
        concat_ws(",", transform(col("vpath"), _.cast("string"))))

  /** TRAIL under a prefix over an all-fixed pattern with a REPEATED edge
    * table and NO named path variable — §8's first loud-error
    * restriction, now routed through a HIDDEN path variable (r6 #5):
    * the joins keep per-hop edge identities for the TRAIL filter, and
    * ANY SHORTEST picks one lexicographically-least trail per endpoint
    * pair via the whole-path ranking. nation_near has no parallel edges
    * and dense edge ids rank by (src, dst), so interleaved-path order
    * equals vertex-sequence order — which is what the oracle ranks by. */
  private def q89_trail_prefix_fixed(s: SparkSession, d: String): DataFrame =
    TradeGraph.graft(s, d).graphTable(
      """trade MATCH ANY SHORTEST TRAIL
           (a:Nation WHERE a.n_regionkey = 0)-[e1:NationNear]->
           (b:Nation)-[e2:NationNear]->(c:Nation)-[e3:NationNear]->(d:Nation)
         COLUMNS (a.n_nationkey AS src, b.n_nationkey AS via1,
                  c.n_nationkey AS via2, d.n_nationkey AS dst)""")

  /** SHORTEST k over a MULTI-HOP all-fixed pattern without a path
    * variable — §8's second closed refusal: the hidden-path route ranks
    * whole paths with dense_rank (distinct paths share ranks), keeping
    * the k lexicographically-least walks per endpoint pair. */
  private def q90_topk_fixed_multihop(s: SparkSession, d: String): DataFrame =
    TradeGraph.graft(s, d).graphTable(
      """trade MATCH SHORTEST 2
           (a:Nation WHERE a.n_regionkey = 0)-[e1:NationNear]->
           (b:Nation)-[e2:NationNear]->(c:Nation)
         COLUMNS (a.n_nationkey AS src, b.n_nationkey AS via,
                  c.n_nationkey AS dst)""")

  /** IC13-shaped search prefix over a MIXED pattern (typed fixed first
    * hop + ALL SHORTEST quantified tail): the kernel is seeded from the
    * fixed-prefix join's endpoint set, per-segment shortest paths
    * concatenate with the A14 machinery — the reference's
    * CheckNamedSubpath composition (match.cpp:709-790), which it only
    * implements for ANY SHORTEST (and refuses under prefixes it can't
    * compile, match.cpp:80-108). Was the r5 top "missing" item. */
  private def q64_prefix_all_shortest(s: SparkSession, d: String): DataFrame =
    TradeGraph.graft(s, d).graphTable(
      """trade MATCH p = ALL SHORTEST (a:Nation WHERE a.n_regionkey = 0)-[f:NationNext]->(m:Nation)-[e:NationNear]->{1,2}(b:Nation)
         COLUMNS (a.n_nationkey AS src, m.n_nationkey AS mid,
                  b.n_nationkey AS dst, path_length(p) AS plen,
                  vertices(p) AS vpath)""")
      .withColumn("vpath",
        concat_ws(",", transform(col("vpath"), _.cast("string"))))

  /** SHORTEST k over the same mixed shape: the quantified segment
    * contributes its k smallest (length, lexicographic-path) subpaths per
    * endpoint pair; the fixed hop keeps join multiplicity. */
  private def q65_prefix_shortest_k(s: SparkSession, d: String): DataFrame =
    TradeGraph.graft(s, d).graphTable(
      """trade MATCH p = SHORTEST 2 (a:Nation WHERE a.n_regionkey = 0)-[f:NationNext]->(m:Nation)-[e:NationNear]->{1,2}(b:Nation)
         COLUMNS (a.n_nationkey AS src, m.n_nationkey AS mid,
                  b.n_nationkey AS dst, path_length(p) AS plen,
                  vertices(p) AS vpath)""")
      .withColumn("vpath",
        concat_ws(",", transform(col("vpath"), _.cast("string"))))

  /** TWO quantified segments under ALL SHORTEST (no fixed hop at all):
    * each segment contributes its own all-shortest set given the
    * junction bindings (the same per-segment composition as q64, and the
    * same min-dist-then-quantifier-range rule the reference's
    * iterativelength CTE applies), and the junction vertex carries its
    * own WHERE. Exercises two kernels of DIFFERENT edge tables feeding
    * one concatenated path. */
  private def q67_two_segment_all_shortest(s: SparkSession, d: String): DataFrame =
    TradeGraph.graft(s, d).graphTable(
      """trade MATCH p = ALL SHORTEST (a:Nation WHERE a.n_regionkey = 0)-[e1:NationNear]->{1,2}(m:Nation WHERE m.n_nationkey % 2 = 0)-[e2:NationNext]->{1,2}(b:Nation)
         COLUMNS (a.n_nationkey AS src, m.n_nationkey AS mid,
                  b.n_nationkey AS dst, path_length(p) AS plen,
                  vertices(p) AS vpath)""")
      .withColumn("vpath",
        concat_ws(",", transform(col("vpath"), _.cast("string"))))

  /** `vertices(p)` over a COMPOSITE-key graph: the kernel runs in dense
    * rowid space, and exposed path arrays are translated back to STABLE
    * SURROGATES — each vertex slot becomes the '|'-joined declared key
    * tuple. The reference leaks its physical rowids here
    * (match.cpp:731-788); a surrogate derived from declared keys survives
    * reloads and engine swaps, so the oracle can rebuild it exactly. The
    * CNext ring has out-degree 1, so ANY SHORTEST paths are unique and
    * fully value-checkable. */
  private def q66_composite_path_vertices(s: SparkSession, d: String): DataFrame =
    TradeGraph.graft(s, d).graphTable(
      """trade MATCH p = ANY SHORTEST (a:CNation WHERE a.n_regionkey = 0)-[e:CNext]->{1,3}(b:CNation)
         COLUMNS (a.n_nationkey AS src, b.n_nationkey AS dst,
                  path_length(p) AS plen, vertices(p) AS vpath)""")
      .withColumn("vpath", concat_ws(",", col("vpath")))

  /** TRAIL ENUMERATION over the composite-key ring with exposed
    * surrogates: the per-segment arrays stay long-typed through the
    * cross-element mode filters, and the CONCATENATED path column is
    * translated to declared-key surrogates afterwards (the deferred
    * branch of the q66 machinery). Out-degree 1 and dist ≤ 3 < ring
    * length mean every walk is a trail and each (src, dst) has exactly
    * one — fully value-checkable. */
  private def q68_composite_trail_enum(s: SparkSession, d: String): DataFrame =
    TradeGraph.graft(s, d).graphTable(
      """trade MATCH p = TRAIL (a:CNation WHERE a.n_regionkey = 0)-[e:CNext]->{1,3}(b:CNation)
         COLUMNS (a.n_nationkey AS src, b.n_nationkey AS dst,
                  path_length(p) AS plen, vertices(p) AS vpath)""")
      .withColumn("vpath", concat_ws(",", col("vpath")))

  /** Non-WALK path MODE *under* a search prefix over a MIXED pattern —
    * the last refused combination (reference: NotImplemented,
    * match.cpp:80-108). Compiles as mode-valid ENUMERATION, then the
    * prefix ranks WHOLE paths per (a, b) endpoint partition — standard
    * SQL/PGQ whole-path semantics, deliberately NOT the per-segment
    * composition of WALK-mode prefixes (q64/q65): the fixed hop and the
    * quantified tail run over the SAME edge table, so TRAIL must exclude
    * the fixed edge from the segment — a cross-segment constraint no
    * per-segment representative can express. SHORTEST 2 = the 2 smallest
    * (length, lex-path) distinct trails per pair. */
  private def q69_prefix_trail_k(s: SparkSession, d: String): DataFrame =
    TradeGraph.graft(s, d).graphTable(
      """trade MATCH p = SHORTEST 2 TRAIL (a:Nation WHERE a.n_regionkey = 0)-[f:NationNear]->(m:Nation)-[e:NationNear]->{1,2}(b:Nation)
         COLUMNS (a.n_nationkey AS src, m.n_nationkey AS mid,
                  b.n_nationkey AS dst, path_length(p) AS plen,
                  vertices(p) AS vpath)""")
      .withColumn("vpath",
        concat_ws(",", transform(col("vpath"), _.cast("string"))))

  /** ALL SHORTEST under ACYCLIC over a mixed pattern: every
    * minimum-length vertex-distinct full path per (a, b) pair. The
    * shortest WALK combination may revisit `a` or `m` across segments
    * and be invalid — whole-path ranking over the acyclic enumeration is
    * the only correct evaluation (and the set can pick LONGER paths than
    * WALK ALL SHORTEST would). */
  private def q70_prefix_acyclic_all(s: SparkSession, d: String): DataFrame =
    TradeGraph.graft(s, d).graphTable(
      """trade MATCH p = ALL SHORTEST ACYCLIC (a:Nation WHERE a.n_regionkey = 0)-[f:NationNext]->(m:Nation)-[e:NationNear]->{1,2}(b:Nation)
         COLUMNS (a.n_nationkey AS src, m.n_nationkey AS mid,
                  b.n_nationkey AS dst, path_length(p) AS plen,
                  vertices(p) AS vpath)""")
      .withColumn("vpath",
        concat_ws(",", transform(col("vpath"), _.cast("string"))))

  /** MIXED fixed+quantified named path over the COMPOSITE-key ring —
    * round-6 closure of the "fixed hops in a named path require numeric
    * vertex keys" restriction: the fixed hop's path segment rides the
    * SAME memoized dense-rowid space as the quantified kernel (one
    * comparable id space), and the combined array translates to
    * '|'-joined declared-key surrogates ONCE, after assembly. Out-degree
    * 1 makes every (src, dst) path unique — fully value-checkable. */
  private def q76_composite_mixed_path(s: SparkSession, d: String): DataFrame =
    TradeGraph.graft(s, d).graphTable(
      """trade MATCH p = ANY SHORTEST (a:CNation WHERE a.n_regionkey = 0)-[f:CNext]->(m:CNation)-[e:CNext]->{1,2}(b:CNation)
         COLUMNS (a.n_nationkey AS src, m.n_nationkey AS mid,
                  b.n_nationkey AS dst, path_length(p) AS plen,
                  vertices(p) AS vpath)""")
      .withColumn("vpath", concat_ws(",", col("vpath")))

  /** ACYCLIC over a composite mixed pattern — round-6 closure of the
    * "cross-element vertex identity requires a single-column numeric key
    * space" restriction: fixed-hop aliases compare against quantified
    * segment interiors through joined dense rowids from the shared
    * mapping. 1 fixed + {1,4} hops on the 5-rings: the length-5 closing
    * walk (b = a) is excluded by ACYCLIC, so each region-0 start yields
    * exactly lengths {2,3,4}. */
  private def q77_composite_mixed_acyclic(s: SparkSession, d: String): DataFrame =
    TradeGraph.graft(s, d).graphTable(
      """trade MATCH p = ACYCLIC (a:CNation WHERE a.n_regionkey = 0)-[f:CNext]->(m:CNation)-[e:CNext]->{1,4}(b:CNation)
         COLUMNS (a.n_nationkey AS src, m.n_nationkey AS mid,
                  b.n_nationkey AS dst, path_length(p) AS plen,
                  vertices(p) AS vpath)""")
      .withColumn("vpath", concat_ws(",", col("vpath")))

  /** Named path whose segments span TWO vertex-key spaces — round-7
    * closure of the "combined path array cannot carry two id spaces"
    * restriction (the reference errors on the whole feature,
    * match.cpp:80-108): the fixed NBridge hop starts at a NUMERIC-keyed
    * Nation and lands on a COMPOSITE-keyed CNation, then the quantified
    * CNext segment walks the composite ring. Each segment translates to
    * string surrogates through its OWN space (fixed hops inline from
    * their alias columns, composite segments through their dense-rowid
    * mapping) and the string arrays concatenate — so `vertices(p)` mixes
    * plain numeric text ("0") with '|'-joined tuples ("0|5") slot by
    * slot. Out-degree 1 keeps every (src, plen) path unique. */
  private def q92_mixed_space_path(s: SparkSession, d: String): DataFrame =
    TradeGraph.graft(s, d).graphTable(
      """trade MATCH p = ANY SHORTEST (a:Nation WHERE a.n_regionkey = 0)-[g:NBridge]->(c:CNation)-[h:CNext]->{1,3}(b:CNation)
         COLUMNS (a.n_nationkey AS src, c.n_nationkey AS cn,
                  b.n_nationkey AS dst, path_length(p) AS plen,
                  vertices(p) AS vpath)""")
      .withColumn("vpath", concat_ws(",", col("vpath")))

  /** ACYCLIC across segments bound through DIFFERENT key declarations of
    * ONE table — round-7 closure of the "different key declarations —
    * identity is ambiguous" restriction: the numeric NationNext segment
    * and the composite CNext segment both walk `nation` rows; vertex
    * identity across them is the PHYSICAL ROW, resolved through the
    * key-space bijection (raw numeric key ↔ dense composite rowid joined
    * through the table itself), and alias pairs over the two labels
    * compare on one declaration's key set. On the 5-ring with quantifiers
    * {1,3}+1+{1,3}, total hops of 5..7 revisit a vertex, so exactly the
    * 3-, and 4-hop splits survive: (1,1), (1,2), (2,1) per start. */
  private def q93_cross_space_acyclic(s: SparkSession, d: String): DataFrame =
    TradeGraph.graft(s, d).graphTable(
      """trade MATCH p = ACYCLIC (a:Nation WHERE a.n_regionkey = 0)-[e:NationNext]->{1,3}(m:Nation)-[g:NBridge]->(c:CNation)-[h:CNext]->{1,3}(b:CNation)
         COLUMNS (a.n_nationkey AS src, m.n_nationkey AS mid,
                  c.n_nationkey AS cn, b.n_nationkey AS dst,
                  path_length(p) AS plen)""")

  /** Property-graph persistence round trip: CREATE writes the `__graft_pg`
    * catalog table; a FRESH registry (a new session/process in production)
    * lazily reloads it — reference `__duckpgq_internal` semantics
    * (duckpgq_state.cpp:5-32, :34-160). The describe of the RELOADED model
    * must hash-match the model-generated oracle. */
  private def q48_persisted_pg(s: SparkSession, d: String): DataFrame = {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_catalog_q48"
    val prev = s.conf.getOption(graft.model.GraftCatalog.ConfKey)
    s.conf.set(graft.model.GraftCatalog.ConfKey, dir)
    try {
      val writer = new graft.model.PropertyGraphRegistry
      writer.create(s, TradeGraph.graph, TradeGraph.resolver(d),
        orReplace = true)
      val fresh = new graft.model.PropertyGraphRegistry // "restart"
      graft.ddl.Introspect.describe(s, fresh.get(s, "trade"))
    } finally {
      prev match {
        case Some(v) => s.conf.set(graft.model.GraftCatalog.ConfKey, v)
        case None => s.conf.unset(graft.model.GraftCatalog.ConfKey)
      }
    }
  }

  /** 3-hop MATCH through the two big edge tables (orders 150k, lineitem
    * 600k rows at sf0.1) — the pattern-join scale anchor. */
  private def q42_match_3hop_big(s: SparkSession, d: String): DataFrame =
    TradeGraph.graft(s, d).graphTable(
      """trade MATCH (c:Customer)-[pl:Placed]->(o:Order)-[ct:Contains]->(p:OddSizePart)
         WHERE o.o_totalprice > 400000.0
         COLUMNS (c.c_custkey AS custkey, o.o_orderkey AS orderkey,
                  p.p_partkey AS partkey, p.p_size AS size)""")

  // =========================================================================
  // Path finding (SURVEY §2.A13-A15, §2.B kernels)
  // =========================================================================

  private def q11_varlen(s: SparkSession, d: String): DataFrame =
    TradeGraph.graft(s, d).graphTable(
      """trade MATCH p = ANY SHORTEST (a:Nation)-[e:NationNext]->{1,3}(b:Nation)
         COLUMNS (a.n_nationkey AS src, b.n_nationkey AS dst,
                  path_length(p) AS dist)""")

  private def q12_shortest_path(s: SparkSession, d: String): DataFrame =
    TradeGraph.graft(s, d).graphTable(
      """trade MATCH p = ANY SHORTEST (a:Nation)-[e:NationNext]->{1,}(b:Nation)
         COLUMNS (a.n_nationkey AS src, b.n_nationkey AS dst,
                  path_length(p) AS dist, vertices(p) AS vpath)""")
      // driver's pandas compare can't sort array cells — emit a scalar
      .withColumn("vpath",
        concat_ws(",", transform(col("vpath"), _.cast("string"))))

  /** Multi-segment named path: fixed hop + quantified hop in ONE named path
    * — reference concatenation semantics (`list_concat`/`array_pop_front`,
    * match.cpp:573-616): the fixed hop contributes `[a, e, m]`, the
    * quantified hop its kernel path with the shared head vertex dropped. */
  private def q46_multiseg_path(s: SparkSession, d: String): DataFrame =
    TradeGraph.graft(s, d).graphTable(
      """trade MATCH p = ANY SHORTEST (a:Nation)-[e0:NationNext]->(m:Nation)-[e:NationNext]->{1,3}(b:Nation)
         COLUMNS (a.n_nationkey AS src, m.n_nationkey AS mid,
                  b.n_nationkey AS dst, path_length(p) AS plen,
                  vertices(p) AS vpath)""")
      .withColumn("vpath",
        concat_ws(",", transform(col("vpath"), _.cast("string"))))

  private def q13_reachability(s: SparkSession, d: String): DataFrame =
    // unbounded + requires a search prefix (reference match.cpp:100-104)
    TradeGraph.graft(s, d).graphTable(
      """trade MATCH ANY SHORTEST (a:Nation)-[e:NationNext]->+(b:Nation)
         WHERE a.n_regionkey = 0
         COLUMNS (a.n_nationkey AS src, b.n_nationkey AS dst)""")

  /** Undirected variable-length: shortest undirected distance ∈ {1,2} on
    * the ring (reference `path_finding/undirected.test` semantics — edge
    * set doubled before the BFS). */
  private def q37_varlen_undirected(s: SparkSession, d: String): DataFrame =
    TradeGraph.graft(s, d).graphTable(
      """trade MATCH p = ANY SHORTEST (a:Nation)-[e:NationNext]-{1,2}(b:Nation)
         COLUMNS (a.n_nationkey AS src, b.n_nationkey AS dst,
                  path_length(p) AS dist)""")

  /** Optional edge `?` quantifier: 0..1 hops (reference
    * transform_pgq.cpp:523-526 default). */
  private def q38_optional_edge(s: SparkSession, d: String): DataFrame =
    TradeGraph.graft(s, d).graphTable(
      """trade MATCH p = ANY SHORTEST (a:Nation)-[e:NationNext]->?(b:Nation)
         COLUMNS (a.n_nationkey AS src, b.n_nationkey AS dst,
                  path_length(p) AS dist)""")

  /** Weighted cheapest path (reference `cheapest_path_length` semantics) on
    * the region ring, weight = destination nation key. */
  private def q14_cheapest(s: SparkSession, d: String): DataFrame = {
    val edges = TradeGraph.nationNext(s, d)
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"),
        col("dst").cast("double").as("w"))
    val seeds = t(s, d, "nation")
      .select(col("n_nationkey").cast("long").as("id"))
    PathFinder.cheapestPaths(s, edges, seeds)
      .select(col("src"), col("dst"), round(col("cost"), 2).as("cost"))
  }

  /** Cheapest-path ROUTE reconstruction gate (beyond parity — the reference
    * stops at `cheapest_path_length`): rebuild each pair's cheapest route,
    * recompute its cost FROM THE PATH ITSELF (ring weight = the destination
    * nation key sitting at every even slot ≥ 2 of the `[v,e,…,v]` array)
    * and hash-match against q14's recursive-CTE min-cost oracle — a wrong
    * or inconsistent route sums to a wrong cost and trips the gate. */
  private def q58_cheapest_route(s: SparkSession, d: String): DataFrame = {
    val edges = TradeGraph.nationNext(s, d)
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"),
        col("dst").cast("double").as("w"))
    val seeds = t(s, d, "nation")
      .select(col("n_nationkey").cast("long").as("id"))
    PathFinder.cheapestRoutes(s, edges, seeds)
      .select(col("src"), col("dst"),
        round(when(size(col("path")) === 1, lit(0.0))
          .otherwise(expr("aggregate(transform(" +
            "sequence(2, size(path)-1, 2), i -> path[i]), 0D, " +
            "(acc, x) -> acc + x)")), 2).as("cost"))
  }

  // =========================================================================
  // Graph algorithms (SURVEY §2.B/§2.C)
  // =========================================================================

  private def q15_pagerank(s: SparkSession, d: String): DataFrame = {
    val v = t(s, d, "nation").select(col("n_nationkey").cast("long").as("id"))
    val e = TradeGraph.nationAdj(s, d)
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
    // fixed 30 iterations, no phantom padding: exactly SQL-expressible
    Algorithms.pageRank(v, e, fixedIter = Some(30), phantomNodes = 0)
      .select(col("id"), round(col("pagerank"), 6).as("pagerank"))
  }

  private def q16_wcc(s: SparkSession, d: String): DataFrame = {
    val v = t(s, d, "nation").select(col("n_nationkey").cast("long").as("id"))
    val e = TradeGraph.nationNext(s, d)
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
    Algorithms.weaklyConnectedComponents(v, e)
  }

  /** Harmonic + closeness centrality ([[Algorithms.harmonicCentrality]],
    * beyond the reference's algorithm set) over the branching cyclic
    * nation_near graph — all seeds exact through the shared MS-BFS
    * kernel, per-seed reachability/harmonic/closeness aggregates. */
  private def q97_harmonic_centrality(s: SparkSession, d: String): DataFrame = {
    val v = t(s, d, "nation").select(col("n_nationkey").cast("long").as("id"))
    val e = TradeGraph.nationNear(s, d)
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
    Algorithms.harmonicCentrality(v, e)
  }

  /** Fixed-k core membership ([[Algorithms.kCore]], beyond the
    * reference): region 0 is a complete K5 (every vertex degree 4 —
    * survives k=3), the other regions are the |Δ|≤10 band whose 3-core
    * peel CASCADES to empty in three waves (ends at degree 2 go first,
    * which drops their neighbors below 3, …) — a mixed true/false
    * output that a plain degree filter would get wrong. */
  private def q98_kcore(s: SparkSession, d: String): DataFrame = {
    val n = t(s, d, "nation")
    def regionOf(e: org.apache.spark.sql.DataFrame) = e
      .join(n.select(col("n_nationkey").as("src"), col("n_regionkey")),
        Seq("src"))
    val e = regionOf(TradeGraph.nationAdj(s, d))
      .filter(col("n_regionkey") === 0).select(col("src"), col("dst"))
      .unionAll(regionOf(TradeGraph.nationNear(s, d))
        .filter(col("n_regionkey") =!= 0).select(col("src"), col("dst")))
    Algorithms.kCore(
      n.select(col("n_nationkey").cast("long").as("id")),
      e.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")),
      k = 3)
  }

  private def q17_lcc(s: SparkSession, d: String): DataFrame = {
    val v = t(s, d, "nation").select(col("n_nationkey").cast("long").as("id"))
    val e = TradeGraph.nationNear(s, d)
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
    Algorithms.localClusteringCoefficient(v, e)
      .select(col("id"), round(col("lcc"), 6).as("lcc"))
  }

  /** Personalized PageRank ([[Algorithms.personalizedPageRank]], beyond
    * the reference): restart at the region-0 nations over the dense
    * same-region digraph — relevance concentrates in region 0 while
    * other regions keep exactly zero mass (no inter-region edges), a
    * sharp structural check the oracle replays iteration-exactly. */
  private def q99_personalized_pagerank(s: SparkSession, d: String): DataFrame = {
    val n = t(s, d, "nation")
    val v = n.select(col("n_nationkey").cast("long").as("id"))
    val e = TradeGraph.nationAdj(s, d)
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
    val seeds = n.filter(col("n_regionkey") === 0)
      .select(col("n_nationkey").cast("long").as("id"))
    Algorithms.personalizedPageRank(v, e, seeds)
      .select(col("id"), round(col("ppr"), 6).as("ppr"))
  }

  /** k-truss ([[Algorithms.kTruss]]): the q98 mixed graph at k=4 — the
    * K5 region's edges each close 3 triangles and survive; the band
    * regions' 2-supported edges lose their triangles once the
    * 1-supported fringe peels, and cascade to empty (a one-shot
    * support filter gets this wrong). Oracle = six generated peel
    * rounds. */
  private def q112_ktruss(s: SparkSession, d: String): DataFrame = {
    val n = t(s, d, "nation")
    val adj = TradeGraph.nationAdj(s, d).as("a")
      .join(n.as("na"), col("a.src") === col("na.n_nationkey"))
      .filter(col("n_regionkey") === 0)
      .select(col("a.src").as("src"), col("a.dst").as("dst"))
    val near = TradeGraph.nationNear(s, d).as("b")
      .join(n.as("nb"), col("b.src") === col("nb.n_nationkey"))
      .filter(col("n_regionkey") =!= 0)
      .select(col("b.src").as("src"), col("b.dst").as("dst"))
    Algorithms.kTruss(adj.union(near)
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")), k = 4)
  }

  /** Weighted PageRank ([[Algorithms.weightedPageRank]]): the nation
    * bands with weight = dst key + 1 — rank flows proportionally to
    * edge weight, so high-key nations accumulate more than under the
    * uniform split (q15). nation_near has no dangling vertices, so the
    * oracle's recursive replay never needs the dangling branch. */
  private def q115_weighted_pagerank(s: SparkSession, d: String): DataFrame = {
    val v = t(s, d, "nation").select(col("n_nationkey").cast("long").as("id"))
    val e = TradeGraph.nationNear(s, d)
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"),
        (col("dst").cast("double") + 1.0).as("w"))
    Algorithms.weightedPageRank(v, e)
      .select(col("id"), round(col("rank"), 6).as("rank"))
  }

  /** Bipartite co-purchase projection ([[Algorithms.bipartiteProjection]]):
    * customers connected by the number of distinct parts both bought
    * (orders ⋈ lineitem memberships), kept at weight ≥ 5 — the
    * recommendation-graph construction step, exercised on the real
    * fact tables rather than a toy fixture. */
  private def q114_copurchase(s: SparkSession, d: String): DataFrame = {
    val m = t(s, d, "orders").join(t(s, d, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("u"), col("l_partkey").as("v"))
    Algorithms.bipartiteProjection(m, minWeight = 5L)
  }

  /** Link-prediction scores ([[Algorithms.linkPredictionScores]]): every
    * pair sharing a neighbor on the nation bands, with common-neighbor
    * count, neighborhood Jaccard, and Adamic–Adar — one wedge join +
    * degree joins, fully replayed by the oracle. */
  private def q113_link_prediction(s: SparkSession, d: String): DataFrame =
    Algorithms.linkPredictionScores(
      TradeGraph.nationNear(s, d)
        .select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst")))

  /** Betweenness centrality ([[Algorithms.betweennessCentrality]], exact
    * Brandes): brokerage on the nation bands — band interiors carry the
    * shortest-path mass, band edges carry none. The oracle takes a fully
    * independent route: enumerate ALL shortest paths (recursive CTE),
    * unnest interiors, sum 1/σ_st per occurrence. */
  private def q105_betweenness(s: SparkSession, d: String): DataFrame = {
    val v = t(s, d, "nation").select(col("n_nationkey").cast("long").as("id"))
    val e = TradeGraph.nationNear(s, d)
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
    Algorithms.betweennessCentrality(v, e)
      .select(col("id"), round(col("betweenness"), 6).as("betweenness"))
  }

  /** Deterministic random walks ([[Algorithms.deterministicWalks]]): the
    * DeepWalk/node2vec sampling pass with hash-derived "randomness" so
    * the DuckDB oracle (recursive CTE + arg_min over the identical md5
    * strings) replays every step of every walk exactly. */
  private def q103_random_walks(s: SparkSession, d: String): DataFrame = {
    val starts = t(s, d, "nation")
      .select(col("n_nationkey").cast("long").as("id"))
    val e = TradeGraph.nationNear(s, d)
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
    Algorithms.deterministicWalks(starts, e, walksPerStart = 2, steps = 8)
      .select(col("start"), col("r"), col("cur").as("final_v"),
        concat_ws(",", transform(col("path"), _.cast("string"))).as("vpath"))
  }

  /** Label-propagation communities ([[Algorithms.labelPropagation]]):
    * the nation bands PLUS four cross-region bridge edges — communities
    * must hold the per-region majority label against single bridges,
    * exactly where WCC (q16/q36) would merge everything into one
    * component. Six synchronous rounds, min-label ties; the oracle
    * replays every round. */
  /** Weighted label propagation
    * ([[Algorithms.weightedLabelPropagation]]): the q104 community pass
    * with edge-strength votes — weights (src+dst) % 7 + 1 make some
    * bridges heavier than intra-band edges, so communities differ from
    * the unweighted run; integer-valued weights keep the round(sum, 9)
    * vote comparison exact on both engines. The oracle replays all six
    * rounds with the identical weighted argmax. */
  private def q117_weighted_lpa(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val v = t(s, d, "nation").select(col("n_nationkey").cast("long").as("id"))
    val bridges = Seq((1L, 2L), (7L, 8L), (13L, 14L), (19L, 20L))
      .toDF("src", "dst")
    val e = TradeGraph.nationNear(s, d)
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .union(bridges)
      .withColumn("w", ((col("src") + col("dst")) % 7 + 1).cast("double"))
    Algorithms.weightedLabelPropagation(v, e, rounds = 6)
  }

  /** Modularity ([[Algorithms.modularity]]) of the q117 weighted-LPA
    * communities on the same fixture — the community-quality score,
    * per community: intra-edges, degree mass, and the Newman–Girvan
    * contribution e_c/m − (d_c/2m)². The oracle replays the ENTIRE
    * chain: six weighted-argmax rounds, then the modularity formula
    * over the simple undirected graph. */
  private def q119_modularity(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val v = t(s, d, "nation").select(col("n_nationkey").cast("long").as("id"))
    val bridges = Seq((1L, 2L), (7L, 8L), (13L, 14L), (19L, 20L))
      .toDF("src", "dst")
    val e = TradeGraph.nationNear(s, d)
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .union(bridges)
    val ew = e.withColumn("w",
      ((col("src") + col("dst")) % 7 + 1).cast("double"))
    val comm = Algorithms.weightedLabelPropagation(v, ew, rounds = 6)
    Algorithms.modularity(e, comm)
  }

  private def q104_label_propagation(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val v = t(s, d, "nation").select(col("n_nationkey").cast("long").as("id"))
    val bridges = Seq((1L, 2L), (7L, 8L), (13L, 14L), (19L, 20L))
      .toDF("src", "dst")
    val e = TradeGraph.nationNear(s, d)
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .union(bridges)
    Algorithms.labelPropagation(v, e, rounds = 6)
  }

  // =========================================================================
  // Deduplication (beyond-reference pipeline ops)
  // =========================================================================

  private def q18_dedup_exact(s: SparkSession, d: String): DataFrame =
    Dedup.exactGroups(t(s, d, "documents"), "doc_id", "text")
      .select(col("doc_id"), col("canonical_id"), col("is_duplicate"))

  /** Exact unigram-Jaccard near-dup pairs on a bounded id range (the
    * O(n²)-verifiable slice; MinHash-LSH below is the scale path). */
  private def q19_dedup_jaccard(s: SparkSession, d: String): DataFrame =
    Dedup.ngramJaccardPairs(
      t(s, d, "documents").filter(col("doc_id") < 200),
      "doc_id", "text", k = 1, threshold = 0.8)

  /** Pair graph → duplicate groups (transitive closure via WCC): the
    * production dedup shape, oracle-checked on the exact-jaccard slice. */
  private def q39_dedup_groups(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents").filter(col("doc_id") < 200)
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      k = 1, threshold = 0.8)
    Dedup.duplicateGroups(docs.select("doc_id"), pairs)
  }

  /** MinHash-LSH near-duplicate pairs — FULL value oracle. Since the
    * shingle hash is the SQL-portable md5 prefix
    * ([[Dedup.portableHash31]]), the DuckDB oracle replays the ENTIRE
    * pipeline — shingling, hashed sets, the 16-slot signature with the
    * (2j+1, FNV-offset) permutation family, 4-band bucketing (murmur
    * bucket equality ⟺ band-slice equality), the >1/≤20000 bucket-size
    * guards, and the hashed-set Jaccard ≥ 0.7 verification — and must
    * produce the IDENTICAL pair list. Replaces the r5
    * precision-violation gate, whose empty oracle could not tell "no
    * violations" from "operator silently returned nothing". */
  private def q20_dedup_minhash(s: SparkSession, d: String): DataFrame =
    Dedup.minHashLshPairs(t(s, d, "documents"), "doc_id", "text",
      shingleK = 3, numHashes = 16, bands = 4, threshold = 0.7)
      .select(col("id_a").cast("long").as("id_a"),
        col("id_b").cast("long").as("id_b"), col("jaccard"))

  /** SimHash near-dup pairs — FULL value oracle. The token hash is the
    * SQL-portable md5 prefix ([[graft.functions.PortableHash]]), and the
    * 4×16-bit band blocking GUARANTEES every Hamming-≤3 pair shares a
    * band (pigeonhole) — so the operator's output equals the set of ALL
    * pairs at distance ≤ 3, which the DuckDB oracle recomputes
    * brute-force from independently derived signatures (per-bit majority
    * over the md5 token hashes, hi/lo 32-bit halves). A silently-empty
    * operator or a banding recall bug now hash-mismatches; the
    * codegen-vs-declarative consistency check lives in OpsSpec. */
  private def q21_dedup_simhash(s: SparkSession, d: String): DataFrame =
    Dedup.simHashPairs(t(s, d, "documents"), "doc_id", "text", maxDist = 3)
      .select(col("id_a").cast("long").as("id_a"),
        col("id_b").cast("long").as("id_b"),
        col("dist").cast("long").as("dist"))

  /** Exact edit-distance pair join ([[graft.ops.Dedup.editDistancePairs]]):
    * near-identical 40-char document heads within levenshtein ≤ 2 —
    * PassJoin segment blocking (zero false negatives), thresholded-DP
    * verify. The oracle brute-forces all n²/2 levenshteins; our plan
    * never materializes non-colliding pairs. Heads are projected to
    * printable ASCII on BOTH sides: Spark's levenshtein counts code
    * points, DuckDB's counts bytes — they only agree on ASCII. */
  private def q102_fuzzy_join(s: SparkSession, d: String): DataFrame = {
    val heads = t(s, d, "documents").filter(col("text").isNotNull)
      .select(col("doc_id"),
        substring(regexp_replace(
          regexp_replace(col("text"), "[^\\x20-\\x7E]", ""),
          "^ +", ""), 1, 40).as("head"))
    Dedup.editDistancePairs(heads, "doc_id", "head", maxDist = 2)
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
  }

  // =========================================================================
  // Text analysis
  // =========================================================================

  private def q22_text_stats(s: SparkSession, d: String): DataFrame = {
    val txt = col("text")
    // tokenizer+langid are CPU-bound per-row passes — spread a compact
    // scan (5x at sf1 on a 2-split corpus, NOTES round-11)
    TextAnalysis.spreadCompactScan(t(s, d, "documents")).select(col("doc_id"),
      TextAnalysis.tokenCount(txt).as("n_tokens"),
      round(TextAnalysis.punctRatio(txt), 6).as("punct_ratio"),
      round(TextAnalysis.stopwordRatio(txt), 6).as("stopword_ratio"),
      TextAnalysis.langId(txt).as("lang_guess"))
  }

  /** Token counting both ways a tokenizer-budget pipeline needs: plain
    * whitespace tokens and BPE-ish subword counts (letter/digit boundary
    * splits approximate byte-pair segmentation without a vocab). Pure
    * codegen'd column expressions — no UDF in the scan path. */
  private def q60_subword_tokens(s: SparkSession, d: String): DataFrame =
    // subword segmentation is the most CPU-bound per-row pass in the
    // text family — spread a compact scan (6x at sf1, NOTES round-11)
    TextAnalysis.spreadCompactScan(t(s, d, "documents")).select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"),
      TextAnalysis.subwordCount(col("text")).as("n_subwords"))

  /** Vocabulary build + token-id encoding ([[TextAnalysis.buildVocab]] /
    * [[TextAnalysis.encodeTokens]]): the text → ids step ahead of
    * packing. Vocab of 20 against a 31-token corpus so the OOV path and
    * the (count DESC, token) rank ties are both exercised; the full id
    * sequence is value-checked via an order-sensitive md5. */
  private def q108_token_ids(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val vocab = TextAnalysis.buildVocab(docs, "text", size = 20)
    TextAnalysis.encodeTokens(docs, "doc_id", "text", vocab)
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        md5(concat_ws(",", transform(col("ids"), _.cast("string"))))
          .as("ids_md5"))
  }

  /** Per-group HLL ([[graft.ops.Sketches.hllRegistersByGroup]]): distinct
    * users per event type — groups × 2^8 registers max, one shuffle; the
    * oracle replays every register and the bias-corrected estimate, and
    * carries the exact distinct count alongside. */
  private def q110_hll_by_group(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).filter(col("user_id").isNotNull)
    val regs = Sketches.hllRegistersByGroup(ev, "event_type",
      col("user_id"), b = 8)
    val est = Sketches.hllEstimateByGroup(regs, b = 8)
    val exact = ev.groupBy(col("event_type").as("grp"))
      .agg(countDistinct("user_id").as("exact_distinct"))
    est.join(exact, Seq("grp"))
      .select(col("grp").as("event_type"), col("nonzero_regs"),
        col("sum_inv"), col("est"), col("exact_distinct"))
  }

  /** Hash-sample quantiles ([[Sampling.sampleQuantiles]]): the bounded-
    * cost distribution profile — deterministic md5 draw, exact
    * quantile_disc ranks over the sample, fully replayed by the oracle. */
  private def q109_sample_quantiles(s: SparkSession, d: String): DataFrame =
    Sampling.sampleQuantiles(t(s, d, "documents"), "doc_id", "n_chars",
      rate = 0.2, probs = Seq(0.25, 0.5, 0.75, 0.9))

  /** Exact full-column quantiles ([[Sampling.exactQuantiles]]): the
    * no-sampling companion to q109 — distributed rank via one range
    * exchange + per-partition offsets, no single-partition window
    * anywhere in the plan. The oracle replays the rank arithmetic. */
  private def q120_exact_quantiles(s: SparkSession, d: String): DataFrame =
    Sampling.exactQuantiles(t(s, d, "documents"), "n_chars",
      probs = Seq(0.1, 0.5, 0.9, 0.99))

  private def q23_fingerprint(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").select(col("doc_id"),
      TextAnalysis.fingerprintMd5(col("text")).as("fp_md5"))

  /** Order-sensitive rolling-hash fingerprint — md5-derived token hashes
    * make the Horner fold exactly SQL-reproducible, so this is
    * value-checked against DuckDB (was rows-only when xxhash64-based). */
  private def q24_fingerprint_rolling(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").select(col("doc_id"),
      TextAnalysis.fingerprintRolling(col("text")).as("fp_roll"))

  /** Top TF-IDF term per document (bounded slice) — deterministic
    * tie-break by term. */
  private def q43_tfidf(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents").filter(col("doc_id") < 100)
    val scores = TextAnalysis.tfidf(docs, "doc_id", "text")
    val w = Window.partitionBy("id")
      .orderBy(col("tfidf").desc, col("term").asc)
    scores.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id").as("doc_id"), col("term").as("top_term"),
        col("tfidf"))
  }

  /** Corpus-wide bigram frequencies, top 20 (map-side-combined counts over
    * exploded shingles — the n-gram LM-stats shape). */
  private def q44_ngram_freq(s: SparkSession, d: String): DataFrame = {
    val grams = t(s, d, "documents")
      // shingles() degrades to the whole text below k tokens — exclude
      // sub-bigram docs to match the oracle's len >= 2 semantics
      .filter(TextAnalysis.tokenCount(col("text")) >= 2)
      .select(explode(Dedup.shingles(col("text"), 2)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("n"))
    // distributed top-k (sort+limit) first; the global rank window then
    // only sees 20 rows — no single-partition pass over the full vocab
    val top = grams.orderBy(col("n").desc, col("ngram").asc).limit(20)
    val w = Window.orderBy(col("n").desc, col("ngram").asc)
    top.withColumn("rank", row_number().over(w).cast("long"))
  }

  /** JSON property extraction + aggregation over the event payloads
    * (JSON functions are host-engine territory in the reference, §2.F). */
  private def q45_json(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(avg("k"), 4).as("avg_k"),
        max("k").as("max_k"))

  // =========================================================================
  // Similarity search
  // =========================================================================

  private def q25_sim_topk(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "embeddings")
    Similarity.bruteForceTopK(e.filter(col("vec_id") < 20), e, k = 5)
  }

  private def q26_sim_pairs(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "embeddings").filter(col("vec_id") < 300)
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v"))
    e.as("x").join(e.as("y"), col("x.id") < col("y.id"))
      .withColumn("cosine", Similarity.cosine(col("x.v"), col("y.v")))
      .filter(col("cosine") >= 0.35)
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Hyperplane-LSH near-pairs — FULL value oracle. The hyperplanes are
    * plan constants ([[Similarity.planeMatrix]]), so the DuckDB oracle
    * embeds the same 3×12×64 constants and replays the whole pipeline —
    * sign-bit signatures per table, bucket equality, the >1/≤20000
    * bucket-size guards, exact cosine ≥ 0.3 verification — and must
    * produce the IDENTICAL pair list. Replaces the r5
    * precision-violation gate, whose empty oracle could not tell "no
    * violations" from "operator silently returned nothing": recall of
    * the banding is now value-checked too. */
  private def q27_sim_lsh(s: SparkSession, d: String): DataFrame =
    Similarity.lshNearPairs(t(s, d, "embeddings"), threshold = 0.3)
      .select(col("id_a").cast("long").as("id_a"),
        col("id_b").cast("long").as("id_b"), col("cosine"))

  /** Interpreted-HOF cosine — q56's independent recompute path,
    * deliberately NOT the codegen'd DotProduct/L2Norm kernels under
    * test. */
  private def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
  private def hofNorm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** IVF coarse-quantized ANN: consistency violations + CARDINALITY +
    * recall floor. Which inverted lists get probed is structural (not
    * SQL-expressible), so the oracle cannot replay the pipeline — but
    * three families of evidence close the silently-empty hole the r5
    * violation-only gate left open:
    *  1. violations (expected none): every returned row's cosine
    *     re-derived via interpreted HOFs must match the codegen'd value,
    *     and ranks must be non-increasing per query;
    *  2. a cardinality row ('-1', n_result_rows, -1, null): the operator
    *     must return EXACTLY queries×k rows (every probed query finds ≥k
    *     candidates at these list sizes) — the oracle computes the
    *     nonzero expectation independently, so an empty result set reads
    *     red, not green;
    *  3. recall-floor violations (expected none): per query, ≥1 of the
    *     true brute-force top-k must appear in the IVF top-k (emitted as
    *     (query_id, -2, overlap, null) rows when violated — nprobe=4 of
    *     16 lists keeps worst-case observed overlap well above 1). */
  /** Product-quantization ANN ([[Similarity.pqTopK]]): 2 sub-codebooks
    * of 8 centroids (hash-mod init, one Lloyd iteration, L2 assignment),
    * codes instead of vectors on the scan side, asymmetric-distance
    * cosine from a per-query lookup table. The oracle replays the ENTIRE
    * pipeline — training, encoding, LUT, ranking — in SQL, so the
    * approximate results are value-exact, not statistically gated. */
  private def q96_pq_ann(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "embeddings")
    val queries = e.filter(col("vec_id") < 20)
    Similarity.pqTopK(queries, e, k = 5, m = 2, ksub = 8, iters = 1)
      .select(col("query_id").cast("long").as("query_id"),
        col("neighbor_id").cast("long").as("neighbor_id"),
        col("rank"), col("adc_cosine"))
  }

  /** IVF-PQ composite ANN ([[Similarity.ivfPqTopK]]): coarse spherical
    * k-means lists prune candidates (nprobe of numCentroids), PQ codes
    * + a per-query ADC LUT make the in-list scan cheap — the production
    * index shape. Everything is deterministic (rounded centroids,
    * deterministic PQ init, smallest-id ties), so the oracle replays the
    * ENTIRE build and search: coarse train, list assignment, probes,
    * PQ train/encode, candidate-restricted ADC scores, final ranks. */
  private def q118_ivfpq_ann(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "embeddings")
    val queries = e.filter(col("vec_id") < 20)
    Similarity.ivfPqTopK(queries, e, k = 5, numCentroids = 8, nprobe = 3,
        m = 2, ksub = 8, coarseIters = 1, pqIters = 1)
      .select(col("query_id").cast("long").as("query_id"),
        col("neighbor_id").cast("long").as("neighbor_id"),
        col("rank"), col("adc_cosine"))
  }

  private def q56_ivf_ann(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "embeddings")
    val queries = e.filter(col("vec_id") < 20)
    val res = Similarity.ivfTopK(queries, e, k = 5).localCheckpoint()
    val vecs = e.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val w = Window.partitionBy("query_id").orderBy("rank")
    val violations = res
      .join(vecs.select(col("vec_id").as("query_id"), col("v").as("qv")),
        "query_id")
      .join(vecs.select(col("vec_id").as("neighbor_id"), col("v").as("nv")),
        "neighbor_id")
      .withColumn("cos2", hofDot(col("qv"), col("nv")) /
        (hofNorm(col("qv")) * hofNorm(col("nv"))))
      .withColumn("prev", lag("cosine", 1).over(w))
      .filter(abs(col("cos2") - col("cosine")) > 2e-6 ||
        (col("prev").isNotNull && col("cosine") > col("prev") + 1e-9))
      .select(col("query_id").cast("long").as("query_id"),
        col("neighbor_id").cast("long").as("neighbor_id"),
        col("rank").cast("long").as("rank"), col("cosine"))
    val cardinality = res.groupBy()
      .agg(count(lit(1)).as("n"))
      .select(lit(-1L).as("query_id"), col("n").cast("long").as("neighbor_id"),
        lit(-1L).as("rank"), lit(null).cast("double").as("cosine"))
    val exact = Similarity.bruteForceTopK(queries, e, k = 5)
      .select(col("query_id"), col("neighbor_id"))
    val overlap = res.select(col("query_id"), col("neighbor_id"))
      .join(exact, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("overlap"))
    // outer-join back to the query list: a zero-overlap query has NO row
    // in `overlap` — a semi-join-only aggregate could never flag it
    val lowRecall = queries.select(col("vec_id").cast("long").as("query_id"))
      .join(overlap, Seq("query_id"), "left_outer")
      .withColumn("overlap", coalesce(col("overlap"), lit(0L)))
      .filter(col("overlap") < 1)
      .select(col("query_id"), lit(-2L).as("neighbor_id"),
        col("overlap").cast("long").as("rank"),
        lit(null).cast("double").as("cosine"))
    violations.unionAll(cardinality).unionAll(lowRecall)
  }

  /** Embedding-cosine near-duplicate GROUPS: exact cosine pairs on the
    * verifiable slice → transitive closure via distributed WCC — the
    * embedding-side analogue of q39's text dedup groups. */
  private def q49_embed_dedup_groups(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "embeddings").filter(col("vec_id") < 300)
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v"))
    val pairs = e.as("x").join(e.as("y"), col("x.id") < col("y.id"))
      .withColumn("cosine", Similarity.cosine(col("x.v"), col("y.v")))
      .filter(col("cosine") >= 0.35)
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
    Dedup.duplicateGroups(e.select("id"), pairs)
  }

  // =========================================================================
  // Multimodal plumbing
  // =========================================================================

  private def q28_multimodal(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
      .withColumn("media", Multimodal.packMedia(
        to_binary(col("text"), lit("utf-8")), lit("raw"),
        pmod(col("doc_id"), lit(100)) + 20,
        pmod(col("doc_id") * 7, lit(80)) + 20, lit(0L)))
    docs.withColumn("resized", Multimodal.resizeMeta(col("media"), 64))
      .select(col("doc_id"),
        length(col("media.content")).cast("long").as("byte_len"),
        col("resized.meta.width").as("width"),
        col("resized.meta.height").as("height"))
  }

  /** REAL multimodal decode ([[Multimodal.pngCodec]], VERDICT r6 #8):
    * deterministic PNGs are rendered executor-side (dims and fill
    * derived from doc_id), then ACTUALLY decoded back through
    * javax.imageio inside [[Multimodal.decodePartitions]] — the oracle
    * predicts width/height/mean from the generator arguments alone, so
    * a pass proves the bytestream really round-tripped through the
    * codec. Blobs never leave the executors. */
  private def q88_png_decode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val blobs = t(s, d, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        (id, graft.ops.Multimodal.pngBlob(
          (8 + id % 16).toInt, (8 + id % 12).toInt, (id % 256).toInt))
      }).toDF("doc_id", "blob")
    graft.ops.Multimodal.decodePartitions(blobs, "doc_id", "blob")(
        graft.ops.Multimodal.pngCodec)
      .toDF().select(col("id").as("doc_id"),
        col("width"), col("height"),
        round(col("meanByte"), 6).as("mean_gray"),
        (col("byteLen") > 0).as("decoded_ok"))
  }

  // =========================================================================
  // Events / time windows
  // =========================================================================

  private def q29_events_window(s: SparkSession, d: String): DataFrame =
    events(s, d)
      // ts is ns since epoch; hour bucket via exact integer division
      .groupBy((expr("ts DIV 3600000000000") * lit(3600000L)).as("hour_ms"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum("value"), 2).as("sum_value"),
        round(avg("value"), 4).as("avg_value"))

  private def q30_sessionize(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events(s, d)
      .withColumn("ts_ms", expr("ts DIV 1000000"))
      .withColumn("gap_ms", col("ts_ms") - lag("ts_ms", 1).over(w))
      .groupBy("user_id")
      .agg((lit(1L) + sum(when(col("gap_ms") > 1800000L, 1L).otherwise(0L)))
        .as("n_sessions"))
  }

  /** End-to-end training-corpus curation — the §2.H operators COMPOSED as
    * one plan, the shape a real data pipeline runs: exact-dedup (keep the
    * canonical copy), drop short docs, score quality, and report per-band
    * doc/token budgets. Two shuffles at any scale: the content-hash window
    * and the final band aggregation — everything between is a codegen'd
    * projection, so the plan is the same at 500 rows and 100 TB. */
  private def q59_corpus_curation(s: SparkSession, d: String): DataFrame = {
    val txt = col("text")
    Dedup.exactGroups(t(s, d, "documents"), "doc_id", "text")
      .filter(!col("is_duplicate"))
      .select(col("doc_id"),
        TextAnalysis.tokenCount(txt).as("n_tokens"),
        TextAnalysis.qualityScore(txt).as("quality"))
      .filter(col("n_tokens") >= 5)
      .groupBy(floor(col("quality") * 10).cast("long").as("q_band"))
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
  }

  /** Reproducible train/test corpus split (deterministic hash-mod buckets,
    * [[graft.ops.Sampling]]): per-split doc counts and token budgets. The
    * oracle reproduces the EXACT same split — membership is a pure
    * function of the key, portable across engines. */
  private def q61_train_test_split(s: SparkSession, d: String): DataFrame =
    // splitLabel projection, not trainTestSplit-and-union: both halves
    // feed one aggregation, so the label form reads the table ONCE
    t(s, d, "documents")
      .groupBy(Sampling.splitLabel(col("doc_id"), 20).as("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text"))).as("total_tokens"))

  /** Context-window chunking ([[TextAnalysis.chunkTokens]]): overlapping
    * 64-token windows every 48 tokens, one row per chunk — the step
    * before embedding/training. Chunk text is emitted as md5 so the
    * oracle hash-checks exact window CONTENT, not just counts. */
  private def q63_chunk_windows(s: SparkSession, d: String): DataFrame =
    TextAnalysis.chunkTokens(t(s, d, "documents"), "text",
        chunkSize = 64, stride = 48)
      .select(col("doc_id"), col("chunk_idx"),
        md5(col("chunk_text")).as("chunk_md5"))

  /** Gopher-style repetition stats ([[TextAnalysis.repetitionStats]]):
    * duplicate-line fractions, repeated 5-gram fraction, top-2-gram
    * character coverage — the standard pretraining repetition filters.
    * The synthetic corpus is single-line, so a frequent token is
    * deterministically remapped to a newline ON BOTH SIDES first, making
    * the line metrics non-vacuous (word soup repeats, so duplicate lines
    * genuinely occur). Per-row metrics are codegen'd Columns; only the
    * top-2-gram pass aggregates (one (doc, gram) shuffle + per-doc
    * window, group sizes bounded by document length). */
  private def q71_repetition(s: SparkSession, d: String): DataFrame =
    TextAnalysis.repetitionStats(
      t(s, d, "documents").withColumn("text",
        replace(col("text"), lit(" batch "), lit("\n"))),
      "doc_id", "text")

  /** C4-style filter signals ([[TextAnalysis.c4Flags]]): terminal-
    * punctuation line fraction, boilerplate/code markers, mean words per
    * line — pure per-row Columns, plan stays exchange-free. A frequent
    * token is remapped to `.\n` on both sides so sentence-final lines
    * actually occur in the synthetic corpus. */
  private def q72_c4_filters(s: SparkSession, d: String): DataFrame =
    TextAnalysis.c4Flags(
      t(s, d, "documents").withColumn("text",
        replace(col("text"), lit(" join "), lit(".\n"))),
      "text")
      .select(col("doc_id"), col("n_lines"),
        col("terminal_punct_line_frac"), col("has_lorem"),
        col("has_brace"), col("mean_words_per_line"))

  /** Benchmark decontamination ([[TextAnalysis.decontaminate]]): the
    * corpus is split deterministically into a "benchmark" slice (hash
    * bucket < 5, standing in for an eval suite) and a training corpus;
    * every corpus doc sharing any 4-gram with the benchmark is flagged.
    * The benchmark gram set broadcasts; the only corpus shuffle is the
    * per-doc hit count. */
  private def q73_decontaminate(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val bucket = Sampling.hashBucket(col("doc_id"))
    TextAnalysis.decontaminate(
      docs.filter(bucket >= 5), docs.filter(bucket < 5),
      "doc_id", "text", n = 4)
  }

  /** Cross-document duplicated spans ([[TextAnalysis.duplicatedSpans]]):
    * a 5-gram occurring in ≥2 distinct documents marks a duplicated
    * position; per doc the duplicated fraction and the LONGEST
    * consecutive duplicated run — the Lee-et-al exact-substring-dedup
    * signal, here over the synthetic corpus whose shared vocabulary
    * produces real cross-doc spans. */
  private def q94_duplicated_spans(s: SparkSession, d: String): DataFrame =
    TextAnalysis.duplicatedSpans(t(s, d, "documents"), "doc_id", "text",
      n = 5, minDocs = 2)

  /** Bloom-filter decontamination ([[TextAnalysis.decontaminateBloom]]):
    * the q73 split replayed through a 2^16-bit / 4-hash Bloom of the
    * benchmark grams — membership is maybe-semantics (false positives,
    * never false negatives), and the oracle replays every BIT, so the
    * per-doc maybe-counts are value-exact. */
  private def q95_bloom_decontaminate(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val bucket = Sampling.hashBucket(col("doc_id"))
    TextAnalysis.decontaminateBloom(
      docs.filter(bucket >= 5), docs.filter(bucket < 5),
      "doc_id", "text", n = 4)
  }

  /** PII scrubbing ([[TextAnalysis.redactPii]]): emails → `[EMAIL]`,
    * IPv4 → `[IP]`, with per-doc counts — pure per-row regex Columns,
    * exchange-free. Frequent tokens are remapped to a literal email /
    * address ON BOTH SIDES first so the scrub is non-vacuous on the
    * synthetic corpus; redacted text is emitted as md5 so the oracle
    * value-checks the exact replacement output. */
  private def q74_pii_redact(s: SparkSession, d: String): DataFrame =
    TextAnalysis.redactPii(
      t(s, d, "documents")
        .withColumn("text",
          replace(col("text"), lit(" data "), lit(" bob@example.com ")))
        .withColumn("text",
          replace(col("text"), lit(" scan "), lit(" 10.0.0.1 "))),
      "text")
      .select(col("doc_id"), col("n_emails"), col("n_ips"),
        md5(col("redacted_text")).as("redacted_md5"))

  /** Domain-mixture rebalancing ([[graft.ops.Sampling.mixtureSample]]):
    * the en-heavy corpus is downsampled by deterministic key hash to a
    * 50/12.5×4 language mix by token weight — the max-size mixture
    * achievable without upsampling (the binding stratum keeps rate 1).
    * One corpus aggregation derives the rates; the sample itself is a
    * broadcast join + filter above the scan. Output: per-language kept
    * doc/token totals the oracle recomputes from the same hash. */
  private def q75_mixture_sample(s: SparkSession, d: String): DataFrame = {
    val targets = Map("en" -> 0.5, "de" -> 0.125, "es" -> 0.125,
      "fr" -> 0.125, "zh" -> 0.125)
    Sampling.mixtureSample(t(s, d, "documents"), "doc_id", "lang",
        TextAnalysis.tokenCount(col("text")), targets)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text"))).as("kept_tokens"))
  }

  /** Corpus profiling ([[TextAnalysis.corpusProfile]]): per-source doc
    * counts, token totals and exact interpolated token-count quartiles —
    * one aggregation, partial-merged value→count maps bounded by the
    * distinct token-count domain. */
  private def q78_corpus_profile(s: SparkSession, d: String): DataFrame =
    TextAnalysis.corpusProfile(t(s, d, "documents"), "source", "text")

  /** C4-style global line dedup ([[TextAnalysis.dedupLines]]): every
    * distinct line keeps its first (doc_id, idx) occurrence corpus-wide
    * and documents are reassembled from survivors. The word-soup corpus
    * repeats heavily once a frequent token is remapped to a newline on
    * both sides, so the dedup genuinely bites. Rebuilt text emitted as
    * md5 — the oracle must reproduce the exact reassembly. */
  private def q79_line_dedup(s: SparkSession, d: String): DataFrame =
    TextAnalysis.dedupLines(
      t(s, d, "documents").withColumn("text",
        replace(col("text"), lit(" batch "), lit("\n"))),
      "doc_id", "text")
      .select(col("doc_id"), col("n_lines_kept"),
        md5(col("dedup_text")).as("dedup_md5"))

  /** CCNet-style unigram LM scoring ([[TextAnalysis.unigramLogProb]]):
    * mean token log-probability under the corpus's own unigram
    * distribution — token-count join shuffles on the vocabulary, never
    * the corpus. Value-checked to 6 decimals (ln on both sides; DuckDB's
    * bare log is base 10). */
  private def q80_unigram_logprob(s: SparkSession, d: String): DataFrame =
    TextAnalysis.unigramLogProb(t(s, d, "documents"), "doc_id", "text")

  /** Int8 embedding quantization ([[graft.ops.Similarity.quantizeInt8]]):
    * per-vector affine [min,max] → [-128,127] codes — the 4x storage
    * reduction step for an embedding store. Exchange-free per-row
    * Columns; codes value-checked exactly (md5 of the code array — the
    * affine map rounds non-negative values, where both engines'
    * round-half conventions agree). */
  private def q81_quantize_embeddings(s: SparkSession, d: String): DataFrame =
    Similarity.quantizeInt8(t(s, d, "embeddings"), "embedding")
      .select(col("vec_id"), round(col("q_min"), 6).as("q_min"),
        round(col("q_max"), 6).as("q_max"),
        md5(concat_ws(",", col("q_codes"))).as("codes_md5"))

  /** Trained-IVF k-means ([[graft.ops.Similarity.kMeans]]): 2 Lloyd
    * iterations (spherical — cosine assignment, mean recompute, k=8)
    * from the deterministic hash-mod init, then a final assignment
    * against the trained centroids. Centroids are rounded to 6 decimals
    * after every recompute, so the oracle replays BOTH iterations and
    * the final assignment from bit-identical constants — a full value
    * check of the trainer, its tie-break (highest cosine, then lowest
    * centroid id), and the per-dim mean recompute. The emitted
    * cos_to_centroid additionally pins the trained centroid VALUES, not
    * just the argmax. */
  private def q82_kmeans_train(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "embeddings")
    val cents = Similarity.kMeans(e, k = 8, iters = 2)
    Similarity.ivfAssign(e, cents)
      .select(col("vec_id"), col("centroid_id").cast("long").as("centroid_id"))
      .join(broadcast(cents.select(col("centroid_id").cast("long")
        .as("centroid_id"), col("vec"))), Seq("centroid_id"))
      .join(e.select(col("vec_id"),
        col("embedding").cast("array<double>").as("__v")), Seq("vec_id"))
      .select(col("vec_id"), col("centroid_id"),
        round(Similarity.cosine(col("__v"), col("vec")), 6)
          .as("cos_to_centroid"))
  }

  /** Per-vertex triangle counts ([[Algorithms.triangleCounts]]) on the
    * skewed user graph — the degree-ordered enumeration exposed directly
    * (beyond the reference, which stops at LCC). The oracle is the naive
    * 3-way SQL join; the operator's oriented wedges are Σ O(√m)² instead
    * of Σ d² — the shape that survives a celebrity vertex at 100 TB. */
  private def q83_triangles(s: SparkSession, d: String): DataFrame = {
    val users = TradeGraph.events(s, d).select(col("user_id").as("id"))
      .distinct()
    Algorithms.triangleCounts(users, TradeGraph.userEdges(s, d))
  }

  /** Strongly connected components
    * ([[Algorithms.stronglyConnectedComponents]], beyond the reference —
    * WCC is its only component kernel) on a condensation-shaped fixture:
    * the per-region nation rings (5 directed 5-cycles) plus a one-way
    * chain between consecutive regions' minimum nations. Weak
    * connectivity is ONE component; strong connectivity must recover the
    * 5 rings — a directed result no undirected kernel can produce. The
    * oracle computes mutual reachability from a recursive closure. */
  private def q85_scc(s: SparkSession, d: String): DataFrame = {
    val v = t(s, d, "nation")
      .select(col("n_nationkey").cast("long").as("id"))
    val ring = TradeGraph.nationNext(s, d)
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
    val mins = t(s, d, "nation").groupBy(col("n_regionkey"))
      .agg(min("n_nationkey").as("m"))
    val chain = mins.as("a").join(mins.as("b"),
        col("a.n_regionkey") + 1 === col("b.n_regionkey"))
      .select(col("a.m").cast("long").as("src"),
        col("b.m").cast("long").as("dst"))
    Algorithms.stronglyConnectedComponents(v, ring.unionAll(chain))
  }

  /** CountMin sketch ([[graft.ops.Sketches]]): depth 4 × width 32
    * counters over the corpus token stream, point-queried for the top-20
    * true tokens. The md5-low-32 bucket scheme lets the oracle replay the
    * WHOLE sketch — counters, collisions, min-estimates — value-exactly;
    * est ≥ true is structural (collisions only add), and width 32 is
    * deliberately small enough that several top tokens DO collide, so the
    * estimate column exercises the min logic rather than copying the
    * truth column. */
  private def q84_countmin(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val (depth, width) = (4, 32)
    val sketch = Sketches.countMinSketch(docs, "text", depth, width)
    val truth = docs.filter(col("text").isNotNull &&
        length(TextAnalysis.wsTrim(col("text"))) > 0)
      .select(explode(TextAnalysis.tokens(lower(col("text")))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("true_cnt"))
    val top = truth.orderBy(col("true_cnt").desc, col("token").asc).limit(20)
    Sketches.countMinEstimate(sketch, top.select("token"), depth, width)
      .join(top, Seq("token"))
      .select(col("token"), col("true_cnt"), col("est").as("est_cnt"))
  }

  /** Per-group CountMin ([[Sketches.countMinSketchByGroup]]): a
    * token-frequency sketch per document source — "heavy hitters per
    * domain" with groups × depth × width counters and one
    * map-side-combinable shuffle however large the corpus. The top-3
    * tokens per source (by exact count) are point-queried against their
    * OWN group's counters; the oracle replays every counter and
    * estimate from the md5 bucket scheme. */
  private def q116_countmin_by_group(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val (depth, width) = (4, 32)
    val sketch =
      Sketches.countMinSketchByGroup(docs, "source", "text", depth, width)
    val truth = docs.filter(col("text").isNotNull &&
        length(TextAnalysis.wsTrim(col("text"))) > 0)
      .select(col("source").as("grp"),
        explode(TextAnalysis.tokens(lower(col("text")))).as("token"))
      .groupBy("grp", "token").agg(count(lit(1)).as("true_cnt"))
    val top = truth.withColumn("__rk", row_number().over(
        Window.partitionBy("grp")
          .orderBy(col("true_cnt").desc, col("token").asc)))
      .filter(col("__rk") <= 3).drop("__rk")
    Sketches.countMinEstimateByGroup(sketch, top.select("grp", "token"),
        depth, width)
      .join(top, Seq("grp", "token"))
      .select(col("grp").as("source"), col("token"), col("true_cnt"),
        col("est").as("est_cnt"))
  }

  /** HyperLogLog distinct-token count ([[Sketches.hllRegisters]], b=8 →
    * 256 registers) over the corpus token stream, beside the exact
    * distinct count it approximates. The register state is
    * md5-checksummed into the output, so the oracle replays EVERY
    * register (hash, index, leading-zero rank) — the estimate columns
    * are then deterministic scalar functions of gated state, not a
    * statistical check. */
  private def q86_hll(s: SparkSession, d: String): DataFrame = {
    // HLL registers are idempotent under duplicates (max(rho) per idx), so
    // hash the DISTINCT token set — the per-occurrence form md5'd all 10M
    // occurrences at the 10x point; per-document tf comes from the fused
    // byte-scan expression, so the dedup shuffle moves vocab partials
    val toks = t(s, d, "documents")
      .filter(col("text").isNotNull &&
        length(TextAnalysis.wsTrim(col("text"))) > 0)
      .select(explode(graft.functions.TextFunctions.tf_from_text(
        col("text"))).as("__e"))
      .select(col("__e.t").as("token")).distinct()
    val regs = Sketches.hllRegisters(toks, col("token"), b = 8)
    Sketches.hllSummary(regs, b = 8)
      .crossJoin(toks.agg(count(col("token")).as("exact_distinct")))
  }

  /** SemDeDup over the embeddings table ([[Similarity.semanticDedup]])
    * at the scale-aware DERIVED k (k = ceil(n / targetBucket)): at
    * oracle scale n ≤ 1e4 that is k = 1 — one cluster, so the oracle
    * collapses to the exact pairwise rule (cosine ≥ 0.35 against any
    * smaller id, zero-norm guarded) with centroid_id ≡ 0, value-gating
    * the derived-default path end to end. The k-means replay itself is
    * q82's job; the multi-bucket pair search is spec-covered
    * (OpsSpec blocked-bucket + skewed-fixture tests). */
  private def q87_semdedup(s: SparkSession, d: String): DataFrame =
    Similarity.semanticDedup(t(s, d, "embeddings"), threshold = 0.35,
      iters = 1)

  /** Per-language weighted reservoir sample
    * ([[Sampling.weightedReservoir]], Efraimidis–Spirakis A-ES): the 10
    * highest u^(1/n_chars) scores per language are a without-replacement
    * sample with inclusion probability ∝ document length. u is the
    * engine-portable md5 hash unit, so the oracle replays the exact
    * member set; the shard pre-prune window is a provable superset of the
    * stratum top-k, so the oracle needs only the direct window. */
  private def q91_weighted_reservoir(s: SparkSession, d: String): DataFrame =
    Sampling.weightedReservoir(
        t(s, d, "documents").select(col("doc_id"), col("lang"),
          col("n_chars")),
        "doc_id", "lang", col("n_chars"), k = 10)
      .select(col("lang"), col("sample_rank"),
        col("doc_id").cast("long").as("doc_id"), col("sample_score"))

  /** Sequence packing ([[graft.ops.Packing]]): documents → fixed-token-
    * budget training blocks, 8 deterministic shards × per-shard running
    * totals. The window is per-shard, so no task ever sees more than
    * 1/shards of the corpus. Output: per-block doc counts and token sums. */
  private def q62_sequence_pack(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents").select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"))
    Packing.packBlocks(docs, "doc_id", "n_tokens",
        blockTokens = 2000L, shards = 8)
      .groupBy("shard", "block")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("block_tokens"))
  }

  /** Interval self-join: view→click funnel pairs within 30 minutes per
    * user — the batch twin of [[graft.streaming.EventStreams.eventFollowJoin]]
    * (same plan shape; the streaming parity spec runs both). Equi-key on
    * user_id with the time range as a residual — hash/sort-merge join, no
    * cross product, so the plan survives the 100× scale-up. Time arithmetic
    * is ms-TRUNCATED per side (ts DIV 1e6), matching the oracle's
    * epoch_ms() exactly. */
  private def q57_follow_join(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).withColumn("ts_ms", expr("ts DIV 1000000"))
    val a = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_event"),
        col("ts_ms").as("a_ms"))
    val b = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("b_user"), col("event_id").as("click_event"),
        col("ts_ms").as("b_ms"))
    a.join(b, col("user_id") === col("b_user") &&
        col("b_ms") >= col("a_ms") && col("b_ms") <= col("a_ms") + lit(1800000L))
      .select(col("user_id"), col("view_event"), col("click_event"),
        (col("b_ms") - col("a_ms")).as("gap_ms"))
  }

  /** As-of (point-in-time) join ([[graft.ops.OrderedJoins.asofJoinBackward]]):
    * each purchase picks the single most recent prior click of the same
    * user within 1 h — the union-window plan, ONE shuffle on user_id,
    * never a per-key cross product. Right side pre-deduplicated per
    * (user, ms) so the winner is deterministic on both engines; the
    * oracle is DuckDB's NATIVE `ASOF LEFT JOIN` — an independent
    * implementation of the semantics, not a replay of our plan. */
  /** Backward as-of over ONE event log
    * ([[graft.ops.OrderedJoins.asofSelfJoinBackward]]): purchases pick
    * the same user's latest preceding click-instant. One scan, one
    * shuffle, one sort — the two-sided operator on two filters of the
    * same table scans it twice and pre-shuffles the click side; the
    * self variant's max-payload tie-break also subsumes that
    * max(event_id)-per-click-instant pre-aggregation. (q106 keeps the
    * two-sided operator on the mirrored scan, so both API shapes stay
    * under the gates.) */
  private def q100_asof_join(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).withColumn("ms", expr("ts DIV 1000000"))
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("user_id"), col("ms"), col("event_type"), col("event_id"))
    OrderedJoins.asofSelfJoinBackward(ev, Seq("user_id"), "ms",
        isRight = col("event_type") === "click",
        rightPayload = Seq("ms" -> "c_ms", "event_id" -> "click_event"),
        tolerance = Some(3600000L))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_event"),
        col("click_event"), (col("ms") - col("c_ms")).as("gap_ms"))
  }

  /** Keyless range join ([[graft.ops.OrderedJoins.rangeJoinPoints]]):
    * events falling inside ±10 min incident windows around high-value
    * events — intervals explode to covered 10-min buckets, points
    * equi-join on their single bucket (a shuffle hash join, NOT the
    * broadcast-nested-loop Spark plans for a bare BETWEEN join). */
  private def q101_range_join(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).withColumn("ms", expr("ts DIV 1000000"))
    val incidents = ev.filter(col("value") > 150.0)
      .select(col("event_id").as("incident_event"),
        (col("ms") - 600000L).as("lo_ms"), (col("ms") + 600000L).as("hi_ms"))
    val pts = ev.select(col("event_id").as("obs_event"),
      col("ms").as("obs_ms"), col("value").as("obs_value"))
    OrderedJoins.rangeJoinPoints(pts, "obs_ms", incidents,
        "lo_ms", "hi_ms", bucketWidth = 600000L)
      .groupBy("incident_event")
      .agg(count(lit(1)).as("n_obs"), round(sum("obs_value"), 2).as("sum_value"))
  }

  /** Forward as-of join ([[graft.ops.OrderedJoins.asofJoinForward]]): each
    * click picks the EARLIEST following purchase within 2 h per user —
    * the mirrored scan of q100, against DuckDB's native forward ASOF. */
  private def q106_asof_forward(s: SparkSession, d: String): DataFrame = {
    // self-asof (q100's shape, mirrored): clicks and purchases are rows
    // of ONE events frame, so the two-sided operator's second scan and
    // the purchases-side groupBy dedup are pure overhead — the self
    // variant is one scan + one shuffle, and its payload-struct-max tie
    // rule IS the "max(event_id) per purchase instant" dedup
    val ev = events(s, d).withColumn("ms", expr("ts DIV 1000000"))
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ms"), col("event_type"), col("event_id"))
    OrderedJoins.asofSelfJoinForward(ev, Seq("user_id"), "ms",
        isRight = col("event_type") === "purchase",
        rightPayload = Seq("ms" -> "p_ms", "event_id" -> "purchase_event"),
        tolerance = Some(7200000L))
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_event"),
        col("purchase_event"), (col("p_ms") - col("ms")).as("lead_ms"))
  }

  /** Keyless interval-overlap join ([[graft.ops.OrderedJoins.overlapJoin]]):
    * ±10 min incident windows × ±5 min error windows — both sides explode
    * to covered buckets, pairs meet exactly once in the first shared
    * bucket (no distinct pass), residual overlap predicate. */
  private def q107_overlap_join(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).withColumn("ms", expr("ts DIV 1000000"))
    val inc = ev.filter(col("value") > 150.0)
      .select(col("event_id").as("incident_event"),
        (col("ms") - 600000L).as("ilo"), (col("ms") + 600000L).as("ihi"))
    val err = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_event"),
        (col("ms") - 300000L).as("elo"), (col("ms") + 300000L).as("ehi"))
    OrderedJoins.overlapJoin(inc, "ilo", "ihi", err, "elo", "ehi",
        bucketWidth = 600000L)
      .select(col("incident_event"), col("error_event"),
        (greatest(col("ilo"), col("elo"))).as("olap_from"),
        (least(col("ihi"), col("ehi"))).as("olap_to"))
  }

  // =========================================================================
  // Large derived graph (events → user-interaction graph)
  // =========================================================================

  /** Temporal earliest-arrival reachability ([[Algorithms
    * .earliestArrival]]) on the timestamped user-interaction graph:
    * which users could information from the seed users actually have
    * reached within 4 interaction hops, and when — edges fired before
    * the information arrived cannot carry it (static q13-style
    * reachability over-reports). The oracle is a state-deduped
    * recursive closure over the same temporal edges. */
  private def q111_temporal_reachability(s: SparkSession, d: String): DataFrame = {
    val e = TradeGraph.userTemporalEdges(s, d)
    val seeds = TradeGraph.events(s, d)
      .select(col("user_id").as("id")).filter(col("id") < 20).distinct()
    // start = min(ts) derived inside the kernel's own probe/collect —
    // the separate agg(min).head() was a third full evaluation of the
    // temporal view per call; result-identical (earliestArrivalFromMin
    // scaladoc: arrivals are edge timestamps, any start ≤ min(usable ts)
    // admits the same chains; empty graph → empty result either way)
    Algorithms.earliestArrivalFromMin(e, seeds, maxHops = 4)
  }

  /** Batched BFS over the skewed user graph: distances ≤ 2 from 50 seeds —
    * the kernels' bench anchor on a non-toy graph. */
  private def q35_user_bfs(s: SparkSession, d: String): DataFrame = {
    val seeds = TradeGraph.events(s, d).select(col("user_id").as("id"))
      .filter(col("id") < 50).distinct()
    PathFinder.bfsDistances(s, TradeGraph.userEdges(s, d), seeds, Some(2L))
  }

  /** SHORTEST k on the REAL skewed user graph (~1.5k vertices / ~100k
    * edges at sf0.1) — exercises the per-level per-vertex top-k prune at
    * data scale (the nation-graph mode queries are 25-node semantics
    * checks). No parallel edges and (src,dst)-ranked dense eids make
    * interleaved-path order equal vertex-list order, so the oracle ranks
    * by the vertex list. */
  private def q55_user_kshortest(s: SparkSession, d: String): DataFrame = {
    val seeds = TradeGraph.events(s, d).select(col("user_id").as("id"))
      .filter(col("id") < 5).distinct()
    PathFinder.kShortestPaths(s, TradeGraph.userEdges(s, d), seeds,
      1L, Some(2L), graft.pgq.PathMode.Walk, k = 2)
      .select(col("src"), col("dst"), col("dist"),
        concat_ws(",", transform(
          expr("filter(path, (x, i) -> i % 2 == 0)"),
          _.cast("string"))).as("vpath"))
  }

  private def q36_user_wcc(s: SparkSession, d: String): DataFrame = {
    val users = TradeGraph.events(s, d).select(col("user_id").as("id"))
      .distinct()
    Algorithms.weaklyConnectedComponents(users, TradeGraph.userEdges(s, d))
  }

  // =========================================================================
  // DDL introspection (SURVEY §2.C/D/E)
  // =========================================================================

  private def q31_describe_pg(s: SparkSession, d: String): DataFrame =
    graft.ddl.Introspect.describe(s, TradeGraph.graph)

  private def q32_summarize_pg(s: SparkSession, d: String): DataFrame =
    // full-precision degree averages are exact long/long divisions —
    // rounded to 6 here (and in the oracle) purely for stable float
    // hashing in the driver compare
    graft.ddl.Introspect.summarize(s, TradeGraph.graph,
      TradeGraph.resolver(d))
      .withColumn("avg_in_degree", round(col("avg_in_degree"), 6))
      .withColumn("avg_out_degree", round(col("avg_out_degree"), 6))

  private def q33_derive_vertex(s: SparkSession, d: String): DataFrame =
    graft.ddl.Introspect.deriveVertexTable(
      TradeGraph.nationNext(s, d), "src", "dst", "id")

  /** CSR-introspection analogue (`get_csr_v`, reference pgq_scan.cpp:15-42):
    * dense rowids + exclusive prefix-sum offsets of the ring graph. */
  private def q34_csr_offsets(s: SparkSession, d: String): DataFrame = {
    val snap = graft.graph.Snapshot.build(s, t(s, d, "nation"),
      "n_nationkey", TradeGraph.nationNext(s, d), "src", "dst")
    snap.vertices.join(snap.csrOffsets, Seq("rowid"))
      .select(col("rowid"), col("vkey"), col("offset"))
  }

  // =========================================================================

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q35_user_bfs" -> (q35_user_bfs _),
    "q55_user_kshortest" -> (q55_user_kshortest _),
    "q36_user_wcc" -> (q36_user_wcc _),
    "q37_varlen_undirected" -> (q37_varlen_undirected _),
    "q38_optional_edge" -> (q38_optional_edge _),
    "q39_dedup_groups" -> (q39_dedup_groups _),
    "q40_rollup" -> (q40_rollup _),
    "q41_scalar_subquery" -> (q41_scalar_subquery _),
    "q42_match_3hop_big" -> (q42_match_3hop_big _),
    "q43_tfidf" -> (q43_tfidf _),
    "q44_ngram_freq" -> (q44_ngram_freq _),
    "q45_json" -> (q45_json _),
    "q31_describe_pg" -> (q31_describe_pg _),
    "q32_summarize_pg" -> (q32_summarize_pg _),
    "q33_derive_vertex" -> (q33_derive_vertex _),
    "q34_csr_offsets" -> (q34_csr_offsets _),
    "q1_agg" -> (q1_agg _),
    "q2_join_agg" -> (q2_join_agg _),
    "q3_window" -> (q3_window _),
    "q4_setop" -> (q4_setop _),
    "q5_antijoin" -> (q5_antijoin _),
    "q6_match_1hop" -> (q6_match_1hop _),
    "q7_match_2hop" -> (q7_match_2hop _),
    "q8_match_reverse" -> (q8_match_reverse _),
    "q9_match_undirected" -> (q9_match_undirected _),
    "q10_match_sublabel" -> (q10_match_sublabel _),
    "q47_edge_sublabel" -> (q47_edge_sublabel _),
    "q48_persisted_pg" -> (q48_persisted_pg _),
    "q50_composite_varlen" -> (q50_composite_varlen _),
    "q51_trail_enum" -> (q51_trail_enum _),
    "q52_acyclic_enum" -> (q52_acyclic_enum _),
    "q53_all_shortest" -> (q53_all_shortest _),
    "q89_trail_prefix_fixed" -> (q89_trail_prefix_fixed _),
    "q90_topk_fixed_multihop" -> (q90_topk_fixed_multihop _),
    "q54_shortest_k" -> (q54_shortest_k _),
    "q64_prefix_all_shortest" -> (q64_prefix_all_shortest _),
    "q65_prefix_shortest_k" -> (q65_prefix_shortest_k _),
    "q66_composite_path_vertices" -> (q66_composite_path_vertices _),
    "q67_two_segment_all_shortest" -> (q67_two_segment_all_shortest _),
    "q68_composite_trail_enum" -> (q68_composite_trail_enum _),
    "q76_composite_mixed_path" -> (q76_composite_mixed_path _),
    "q77_composite_mixed_acyclic" -> (q77_composite_mixed_acyclic _),
    "q92_mixed_space_path" -> (q92_mixed_space_path _),
    "q93_cross_space_acyclic" -> (q93_cross_space_acyclic _),
    "q94_duplicated_spans" -> (q94_duplicated_spans _),
    "q95_bloom_decontaminate" -> (q95_bloom_decontaminate _),
    "q96_pq_ann" -> (q96_pq_ann _),
    "q97_harmonic_centrality" -> (q97_harmonic_centrality _),
    "q98_kcore" -> (q98_kcore _),
    "q99_personalized_pagerank" -> (q99_personalized_pagerank _),
    "q100_asof_join" -> (q100_asof_join _),
    "q101_range_join" -> (q101_range_join _),
    "q102_fuzzy_join" -> (q102_fuzzy_join _),
    "q103_random_walks" -> (q103_random_walks _),
    "q104_label_propagation" -> (q104_label_propagation _),
    "q105_betweenness" -> (q105_betweenness _),
    "q106_asof_forward" -> (q106_asof_forward _),
    "q107_overlap_join" -> (q107_overlap_join _),
    "q108_token_ids" -> (q108_token_ids _),
    "q109_sample_quantiles" -> (q109_sample_quantiles _),
    "q110_hll_by_group" -> (q110_hll_by_group _),
    "q111_temporal_reachability" -> (q111_temporal_reachability _),
    "q112_ktruss" -> (q112_ktruss _),
    "q113_link_prediction" -> (q113_link_prediction _),
    "q114_copurchase" -> (q114_copurchase _),
    "q115_weighted_pagerank" -> (q115_weighted_pagerank _),
    "q116_countmin_by_group" -> (q116_countmin_by_group _),
    "q117_weighted_lpa" -> (q117_weighted_lpa _),
    "q118_ivfpq_ann" -> (q118_ivfpq_ann _),
    "q119_modularity" -> (q119_modularity _),
    "q120_exact_quantiles" -> (q120_exact_quantiles _),
    "q69_prefix_trail_k" -> (q69_prefix_trail_k _),
    "q70_prefix_acyclic_all" -> (q70_prefix_acyclic_all _),
    "q11_varlen" -> (q11_varlen _),
    "q12_shortest_path" -> (q12_shortest_path _),
    "q46_multiseg_path" -> (q46_multiseg_path _),
    "q13_reachability" -> (q13_reachability _),
    "q14_cheapest" -> (q14_cheapest _),
    "q58_cheapest_route" -> (q58_cheapest_route _),
    "q15_pagerank" -> (q15_pagerank _),
    "q16_wcc" -> (q16_wcc _),
    "q17_lcc" -> (q17_lcc _),
    "q18_dedup_exact" -> (q18_dedup_exact _),
    "q19_dedup_jaccard" -> (q19_dedup_jaccard _),
    "q20_dedup_minhash" -> (q20_dedup_minhash _),
    "q21_dedup_simhash" -> (q21_dedup_simhash _),
    "q22_text_stats" -> (q22_text_stats _),
    "q23_fingerprint" -> (q23_fingerprint _),
    "q24_fingerprint_rolling" -> (q24_fingerprint_rolling _),
    "q25_sim_topk" -> (q25_sim_topk _),
    "q26_sim_pairs" -> (q26_sim_pairs _),
    "q27_sim_lsh" -> (q27_sim_lsh _),
    "q49_embed_dedup_groups" -> (q49_embed_dedup_groups _),
    "q56_ivf_ann" -> (q56_ivf_ann _),
    "q28_multimodal" -> (q28_multimodal _),
    "q88_png_decode" -> (q88_png_decode _),
    "q29_events_window" -> (q29_events_window _),
    "q30_sessionize" -> (q30_sessionize _),
    "q57_follow_join" -> (q57_follow_join _),
    "q59_corpus_curation" -> (q59_corpus_curation _),
    "q60_subword_tokens" -> (q60_subword_tokens _),
    "q61_train_test_split" -> (q61_train_test_split _),
    "q62_sequence_pack" -> (q62_sequence_pack _),
    "q63_chunk_windows" -> (q63_chunk_windows _),
    "q71_repetition" -> (q71_repetition _),
    "q72_c4_filters" -> (q72_c4_filters _),
    "q73_decontaminate" -> (q73_decontaminate _),
    "q74_pii_redact" -> (q74_pii_redact _),
    "q75_mixture_sample" -> (q75_mixture_sample _),
    "q78_corpus_profile" -> (q78_corpus_profile _),
    "q79_line_dedup" -> (q79_line_dedup _),
    "q80_unigram_logprob" -> (q80_unigram_logprob _),
    "q81_quantize_embeddings" -> (q81_quantize_embeddings _),
    "q82_kmeans_train" -> (q82_kmeans_train _),
    "q83_triangles" -> (q83_triangles _),
    "q84_countmin" -> (q84_countmin _),
    "q85_scc" -> (q85_scc _),
    "q86_hll" -> (q86_hll _),
    "q87_semdedup" -> (q87_semdedup _),
    "q91_weighted_reservoir" -> (q91_weighted_reservoir _))

  // =========================================================================
  // DuckDB oracles — same outputs, plain SQL over the same parquet tables.
  // =========================================================================

  import TradeGraph.{sqlNationAdj, sqlNationCNext, sqlNationNear, sqlNationNext}

  /** Oracle for q31 generated from the registered model (static metadata →
    * a VALUES table). */
  private def describeOracle: String = {
    def s(v: String) = s"'$v'"
    def opt(v: Option[String]) = v.map(s).getOrElse("NULL")
    val vrows = TradeGraph.graph.vertexTables.map { v =>
      Seq(s("trade"), s(v.tableName), s(v.label), "true", "NULL",
        s(v.keyCols.mkString(",")), "NULL", "NULL", opt(v.discriminator),
        if (v.subLabels.isEmpty) "NULL" else s(v.subLabels.mkString(",")),
        s(if (v.properties.isEmpty) "*" else v.properties.mkString(",")))
        .mkString("(", ", ", ")")
    }
    val erows = TradeGraph.graph.edgeTables.map { e =>
      Seq(s("trade"), s(e.tableName), s(e.label), "false", s(e.srcLabel),
        s(e.srcKeys.mkString(",")), s(e.dstLabel),
        s(e.dstKeys.mkString(",")), opt(e.discriminator),
        if (e.subLabels.isEmpty) "NULL" else s(e.subLabels.mkString(",")),
        s(if (e.properties.isEmpty) "*" else e.properties.mkString(",")))
        .mkString("(", ", ", ")")
    }
    s"""SELECT * FROM (VALUES ${(vrows ++ erows).mkString(",\n")})
        AS t(property_graph, table_name, label, is_vertex_table,
             source_label, source_key, destination_label, destination_key,
             discriminator, sub_labels, properties)"""
  }

  /** Oracle for q32 generated from the model: per-table aggregate SELECTs
    * UNION ALL'd, with the derived-view CTEs prepended — the reference's
    * exact 22-column SUMMARIZE shape (summarize_property_graph.cpp:104-140;
    * quantiles are `quantile_disc`, the exact form of the reference's
    * approx_quantile). */
  private def summarizeOracle: String = {
    val pg = TradeGraph.graph
    val nullL = "CAST(NULL AS BIGINT)"
    val nullD = "CAST(NULL AS DOUBLE)"
    val nullS = "CAST(NULL AS VARCHAR)"
    val vparts = pg.vertexTables.map { v =>
      s"""SELECT '${v.tableName}' AS table_name, TRUE AS is_vertex_table,
          $nullS AS source_table, $nullS AS destination_table,
          count(*) AS vertex_count, $nullL AS edge_count,
          $nullL AS unique_source_count, $nullL AS unique_destination_count,
          $nullL AS isolated_sources, $nullL AS isolated_destinations,
          $nullD AS avg_in_degree, $nullL AS min_in_degree,
          $nullL AS max_in_degree, $nullL AS q25_in_degree,
          $nullL AS q50_in_degree, $nullL AS q75_in_degree,
          $nullD AS avg_out_degree, $nullL AS min_out_degree,
          $nullL AS max_out_degree, $nullL AS q25_out_degree,
          $nullL AS q50_out_degree, $nullL AS q75_out_degree
          FROM ${v.tableName}"""
    }
    val eparts = pg.edgeTables.map { e =>
      val et = e.tableName
      val src = e.srcKeys.head
      val dst = e.dstKeys.head
      val svt = pg.vertexLabel(e.srcLabel)
      val dvt = pg.vertexLabel(e.dstLabel)
      def deg(keyCol: String, agg: String, alias: String): String =
        s"""(SELECT $agg FROM
           (SELECT count(*) AS d FROM $et GROUP BY $keyCol)) AS $alias"""
      s"""SELECT '$et' AS table_name, FALSE AS is_vertex_table,
          '${svt.tableName}' AS source_table,
          '${dvt.tableName}' AS destination_table,
          $nullL AS vertex_count,
          (SELECT count(*) FROM $et) AS edge_count,
          (SELECT count(DISTINCT $src) FROM $et) AS unique_source_count,
          (SELECT count(DISTINCT $dst) FROM $et) AS unique_destination_count,
          (SELECT count(*) FROM ${svt.tableName} v WHERE NOT EXISTS
             (SELECT 1 FROM $et WHERE $src = v.${svt.keyCols.head}))
            AS isolated_sources,
          (SELECT count(*) FROM ${dvt.tableName} v WHERE NOT EXISTS
             (SELECT 1 FROM $et WHERE $dst = v.${dvt.keyCols.head}))
            AS isolated_destinations,
          ${deg(dst, "round(avg(d), 6)", "avg_in_degree")},
          ${deg(dst, "CAST(min(d) AS BIGINT)", "min_in_degree")},
          ${deg(dst, "CAST(max(d) AS BIGINT)", "max_in_degree")},
          ${deg(dst, "CAST(quantile_disc(d, 0.25) AS BIGINT)",
        "q25_in_degree")},
          ${deg(dst, "CAST(quantile_disc(d, 0.5) AS BIGINT)",
        "q50_in_degree")},
          ${deg(dst, "CAST(quantile_disc(d, 0.75) AS BIGINT)",
        "q75_in_degree")},
          ${deg(src, "round(avg(d), 6)", "avg_out_degree")},
          ${deg(src, "CAST(min(d) AS BIGINT)", "min_out_degree")},
          ${deg(src, "CAST(max(d) AS BIGINT)", "max_out_degree")},
          ${deg(src, "CAST(quantile_disc(d, 0.25) AS BIGINT)",
        "q25_out_degree")},
          ${deg(src, "CAST(quantile_disc(d, 0.5) AS BIGINT)",
        "q50_out_degree")},
          ${deg(src, "CAST(quantile_disc(d, 0.75) AS BIGINT)",
        "q75_out_degree")}"""
    }
    s"""WITH $sqlNationNext, $sqlNationAdj, $sqlNationNear, $sqlNationCNext
        ${(vparts ++ eparts).mkString("\nUNION ALL\n")}"""
  }

  /** q27's oracle replays the hyperplane bucketing with the SAME plane
    * constants the operator compiles in (3 tables × 12 planes × 64 dims —
    * [[graft.ops.Similarity.planeMatrix]]), then the bucket-size guards
    * and the exact-cosine ≥ 0.3 verification: banding recall AND
    * precision are both value-checked. `list_reduce` folds left-to-right,
    * matching the codegen kernels' summation order bit-for-bit. */
  private def q27OracleSql: String = {
    val rows = (0 until 3).flatMap { t =>
      Similarity.planeMatrix(12, 64, planeOffset = t * 12)
        .zipWithIndex.map { case (pv, p) =>
          s"($t, $p, [${pv.mkString(", ")}])"
        }
    }
    s"""WITH pl(t, p, pv) AS (VALUES ${rows.mkString(",\n")}),
       dots AS (
         SELECT e.vec_id, pl.t, pl.p,
           list_reduce(list_transform(range(64),
             i -> CAST(e.embedding[i+1] AS DOUBLE) * pl.pv[i+1]),
             (a, b) -> a + b) AS dp
         FROM embeddings e CROSS JOIN pl),
       sigs AS (
         SELECT vec_id, t,
           CAST(sum(CASE WHEN dp >= 0 THEN CAST(1 AS BIGINT) << p
                         ELSE 0 END) AS BIGINT) AS sig
         FROM dots GROUP BY vec_id, t),
       keptb AS (
         SELECT t, sig FROM sigs GROUP BY t, sig
         HAVING count(*) > 1 AND count(*) <= 20000),
       bk AS (SELECT sigs.* FROM sigs JOIN keptb USING (t, sig)),
       cand AS (
         SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
         FROM bk x JOIN bk y
           ON x.t = y.t AND x.sig = y.sig AND x.vec_id < y.vec_id),
       v AS (SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             FROM embeddings),
       scored AS (
         SELECT id_a, id_b,
           list_reduce(list_transform(range(64), i -> a.v[i+1] * b.v[i+1]),
             (x, y) -> x + y) /
           (sqrt(list_reduce(list_transform(a.v, x -> x * x),
              (x, y) -> x + y)) *
            sqrt(list_reduce(list_transform(b.v, x -> x * x),
              (x, y) -> x + y))) AS cos
         FROM cand JOIN v a ON a.vec_id = cand.id_a
                   JOIN v b ON b.vec_id = cand.id_b)
       SELECT id_a, id_b, round(cos, 6) AS cosine
       FROM scored WHERE cos >= 0.3"""
  }

  def oracleSql: Map[String, String] = Map(
    // state-deduped temporal closure: UNION bounds states by
    // seeds x edges x hops, min arrival taken at the end
    "q111_temporal_reachability" ->
      s"""WITH RECURSIVE ${TradeGraph.sqlUserTemporalEdges},
         st AS (SELECT min(ts) AS t0 FROM user_tedges),
         b(s, v, arr, hop) AS (
           SELECT user_id, user_id, (SELECT t0 FROM st), 0
           FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 20)
           UNION
           SELECT b.s, e.dst, e.ts, b.hop + 1
           FROM b JOIN user_tedges e ON b.v = e.src AND e.ts >= b.arr
           WHERE b.hop < 4)
         SELECT s AS src, v AS dst, min(arr) AS arrival
         FROM b WHERE v <> s GROUP BY 1, 2""",
    "q35_user_bfs" ->
      s"""WITH RECURSIVE ${TradeGraph.sqlUserEdges},
         b(src, dst, dist) AS (
           SELECT DISTINCT user_id, user_id, 0 FROM events WHERE user_id < 50
           UNION
           SELECT b.src, e.dst, b.dist + 1
           FROM b JOIN user_edges e ON b.dst = e.src WHERE b.dist < 2)
         SELECT src, dst, CAST(min(dist) AS BIGINT) AS dist
         FROM b GROUP BY src, dst""",
    "q55_user_kshortest" ->
      s"""WITH RECURSIVE ${TradeGraph.sqlUserEdges},
         w(src, v, dist, vpath) AS (
           SELECT DISTINCT user_id, user_id, 0, [CAST(user_id AS BIGINT)]
           FROM events WHERE user_id < 5
           UNION ALL
           SELECT w.src, e.dst, w.dist + 1,
                  list_append(w.vpath, CAST(e.dst AS BIGINT))
           FROM w JOIN user_edges e ON w.v = e.src
           WHERE w.dist < 2)
         SELECT src, dst, dist, vpath FROM (
           SELECT src, v AS dst, CAST(dist AS BIGINT) AS dist,
                  array_to_string(vpath, ',') AS vpath,
                  row_number() OVER (PARTITION BY src, v
                    ORDER BY dist, vpath) AS rn
           FROM w WHERE dist >= 1)
         WHERE rn <= 2""",

    "q36_user_wcc" ->
      s"""WITH RECURSIVE ${TradeGraph.sqlUserEdges},
         und(src, dst) AS (
           SELECT src, dst FROM user_edges
           UNION SELECT dst, src FROM user_edges),
         r(a, b) AS (
           SELECT DISTINCT user_id, user_id FROM events
           UNION
           SELECT r.a, und.dst FROM r JOIN und ON r.b = und.src)
         SELECT a AS id, CAST(min(b) AS BIGINT) AS component
         FROM r GROUP BY a""",
    "q37_varlen_undirected" ->
      s"""WITH RECURSIVE $sqlNationNext,
         und(src, dst) AS (
           SELECT src, dst FROM nation_next
           UNION SELECT dst, src FROM nation_next),
         b(src, dst, dist) AS (
           SELECT n_nationkey, n_nationkey, 0 FROM nation
           UNION
           SELECT b.src, e.dst, b.dist + 1
           FROM b JOIN und e ON b.dst = e.src WHERE b.dist < 2)
         SELECT src, dst, CAST(dist AS BIGINT) AS dist FROM (
           SELECT src, dst, min(dist) AS dist FROM b GROUP BY src, dst)
         WHERE dist BETWEEN 1 AND 2""",

    "q38_optional_edge" ->
      s"""WITH $sqlNationNext
         SELECT n_nationkey AS src, n_nationkey AS dst,
                CAST(0 AS BIGINT) AS dist FROM nation
         UNION ALL
         SELECT src, dst, CAST(1 AS BIGINT) AS dist FROM nation_next
         WHERE src <> dst""",

    "q39_dedup_groups" ->
      """WITH RECURSIVE dd AS (
           SELECT doc_id,
             list_distinct(string_split_regex(regexp_replace(lower(text), '^\s+|\s+$', '', 'g'), '\s+')) AS sh
           FROM documents WHERE doc_id < 200),
         pr AS (
           SELECT a.doc_id AS ia, b.doc_id AS ib
           FROM dd a JOIN dd b ON a.doc_id < b.doc_id
           WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                 len(list_distinct(a.sh || b.sh)), 6) >= 0.8),
         und(x, y) AS (SELECT ia, ib FROM pr UNION SELECT ib, ia FROM pr),
         r(a, b) AS (
           SELECT doc_id, doc_id FROM documents WHERE doc_id < 200
           UNION
           SELECT r.a, und.y FROM r JOIN und ON r.b = und.x)
         SELECT a AS id, CAST(min(b) AS BIGINT) AS canonical_id,
                a <> min(b) AS is_duplicate
         FROM r GROUP BY a""",

    "q40_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
           round(sum(l_extendedprice), 2) AS total
         FROM lineitem
         GROUP BY ROLLUP (l_returnflag, l_linestatus)""",

    "q41_scalar_subquery" ->
      """WITH joined AS (
           SELECT n_name, o_totalprice FROM orders
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey)
         SELECT n_name, round(avg(o_totalprice), 2) AS avg_price
         FROM joined GROUP BY n_name
         HAVING round(avg(o_totalprice), 2) >
           (SELECT avg(o_totalprice) FROM orders)""",

    "q42_match_3hop_big" ->
      """SELECT c_custkey AS custkey, o_orderkey AS orderkey,
           p_partkey AS partkey, p_size AS size
         FROM customer
         JOIN orders ON o_custkey = c_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN part ON p_partkey = l_partkey
         WHERE o_totalprice > 400000.0 AND (p_size & 1) = 1""",

    "q43_tfidf" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
         toks AS (SELECT doc_id AS id,
             unnest(string_split_regex(regexp_replace(lower(text), '^\s+|\s+$', '', 'g'), '\s+')) AS term
           FROM d),
         tf AS (SELECT id, term, count(*) AS tf FROM toks GROUP BY id, term),
         dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         scored AS (
           SELECT tf.id, tf.term, tf.tf,
             round(tf.tf * ln((SELECT CAST(count(*) AS DOUBLE) FROM d) / dfreq.df), 6)
               AS tfidf
           FROM tf JOIN dfreq ON tf.term = dfreq.term),
         ranked AS (
           SELECT id AS doc_id, term AS top_term, tfidf,
             row_number() OVER (PARTITION BY id
               ORDER BY tfidf DESC, term ASC) AS rn
           FROM scored)
         SELECT doc_id, top_term, tfidf FROM ranked WHERE rn = 1""",

    "q44_ngram_freq" ->
      """WITH toks AS (
           SELECT string_split_regex(regexp_replace(lower(text), '^\s+|\s+$', '', 'g'), '\s+') AS t
           FROM documents),
         grams AS (
           SELECT unnest([t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))])
             AS ngram
           FROM toks WHERE len(t) >= 2),
         counted AS (SELECT ngram, count(*) AS n FROM grams GROUP BY ngram),
         ranked AS (SELECT ngram, n,
             row_number() OVER (ORDER BY n DESC, ngram ASC) AS rank
           FROM counted)
         SELECT ngram, n, rank FROM ranked WHERE rank <= 20""",

    "q45_json" ->
      """SELECT event_type, count(*) AS n,
           round(avg(k), 4) AS avg_k,
           CAST(max(k) AS BIGINT) AS max_k
         FROM (SELECT event_type,
                 CAST(json_extract(props, '$.k') AS BIGINT) AS k
               FROM events)
         GROUP BY event_type""",

    "q31_describe_pg" -> describeOracle,
    "q32_summarize_pg" -> summarizeOracle,
    "q33_derive_vertex" ->
      s"""WITH $sqlNationNext
         SELECT DISTINCT id FROM (
           SELECT src AS id FROM nation_next
           UNION ALL SELECT dst AS id FROM nation_next)""",
    "q34_csr_offsets" ->
      s"""WITH $sqlNationNext,
         v AS (SELECT row_number() OVER (ORDER BY n_nationkey) - 1 AS rowid,
                      CAST(n_nationkey AS BIGINT) AS vkey FROM nation),
         deg AS (SELECT v.rowid, v.vkey, count(e.src) AS d
                 FROM v LEFT JOIN nation_next e ON e.src = v.vkey
                 GROUP BY v.rowid, v.vkey)
         SELECT rowid, vkey,
           CAST(coalesce(sum(d) OVER (ORDER BY rowid
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             AS offset
         FROM deg""",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS n
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",

    "q2_join_agg" ->
      """SELECT n_name,
           round(sum(o_totalprice), 2) AS total_price,
           count(*) AS n_orders
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name""",

    "q3_window" ->
      """SELECT event_id, user_id,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_value
         FROM events""",

    "q4_setop" ->
      """SELECT key, count(*) AS n FROM (
           SELECT c_nationkey AS key FROM customer
           UNION ALL
           SELECT s_nationkey AS key FROM supplier) GROUP BY key""",

    "q5_antijoin" ->
      """SELECT c_nationkey AS nationkey, count(*) AS n_customers_no_orders
         FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_totalprice > 300000.0)
         GROUP BY c_nationkey""",

    "q6_match_1hop" ->
      """SELECT c_custkey AS custkey, n_name AS nation
         FROM customer JOIN nation ON c_nationkey = n_nationkey""",

    "q7_match_2hop" ->
      """SELECT c_custkey AS custkey, n_name AS nation
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'""",

    "q8_match_reverse" ->
      """SELECT n_name AS nation, s_name AS supplier
         FROM supplier JOIN nation ON s_nationkey = n_nationkey""",

    "q9_match_undirected" ->
      s"""WITH $sqlNationNext,
         und AS (SELECT src, dst FROM nation_next
                 UNION ALL SELECT dst AS src, src AS dst FROM nation_next)
         SELECT und.src AS a_key, und.dst AS b_key FROM und""",

    "q10_match_sublabel" ->
      """SELECT p_partkey AS partkey, p_size AS size
         FROM part WHERE (p_size & 1) = 1""",

    "q47_edge_sublabel" ->
      """SELECT o_orderkey AS orderkey, l_partkey AS partkey
         FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         WHERE o_totalprice > 400000.0 AND (l_linenumber & 1) = 1""",

    "q48_persisted_pg" -> describeOracle,

    "q50_composite_varlen" ->
      s"""WITH RECURSIVE $sqlNationNext, $sqlNationCNext,
         b(sr, sn, dr, dn, dist) AS (
           SELECT n_regionkey, n_nationkey, n_regionkey, n_nationkey, 0
           FROM nation WHERE n_regionkey = 0
           UNION
           SELECT b.sr, b.sn, e.dst_r, e.dst_n, b.dist + 1
           FROM b JOIN nation_cnext e
             ON b.dr = e.src_r AND b.dn = e.src_n
           WHERE b.dist < 3)
         SELECT sn AS src, dn AS dst FROM (
           SELECT sr, sn, dn, min(dist) AS d FROM b GROUP BY sr, sn, dn)
         WHERE d BETWEEN 1 AND 3""",

    // Path-mode enumeration oracles: UNION ALL (multiplicity — one row
    // per path) with explicit visited lists, the textbook SQL encoding of
    // the visited-set semantics the kernels implement. nation_near has no
    // parallel edges, so a visited-ARC list (src*100+dst) is exactly
    // TRAIL's visited-edge set.
    "q51_trail_enum" ->
      s"""WITH RECURSIVE $sqlNationNear,
         w(src, v, dist, vpath, ve) AS (
           SELECT n_nationkey, n_nationkey, 0,
                  [CAST(n_nationkey AS BIGINT)], CAST([] AS BIGINT[])
           FROM nation WHERE n_regionkey = 0
           UNION ALL
           SELECT w.src, e.dst, w.dist + 1,
                  list_append(w.vpath, CAST(e.dst AS BIGINT)),
                  list_append(w.ve, CAST(e.src * 100 + e.dst AS BIGINT))
           FROM w JOIN nation_near e ON w.v = e.src
           WHERE w.dist < 3
             AND NOT list_contains(w.ve, CAST(e.src * 100 + e.dst AS BIGINT)))
         SELECT src, v AS dst, CAST(dist AS BIGINT) AS dist,
                array_to_string(vpath, ',') AS vpath
         FROM w WHERE dist >= 1""",

    "q52_acyclic_enum" ->
      s"""WITH RECURSIVE $sqlNationNear,
         w(src, v, dist, vpath) AS (
           SELECT n_nationkey, n_nationkey, 0, [CAST(n_nationkey AS BIGINT)]
           FROM nation WHERE n_regionkey = 0
           UNION ALL
           SELECT w.src, e.dst, w.dist + 1,
                  list_append(w.vpath, CAST(e.dst AS BIGINT))
           FROM w JOIN nation_near e ON w.v = e.src
           WHERE NOT list_contains(w.vpath, CAST(e.dst AS BIGINT)))
         SELECT src, v AS dst, CAST(dist AS BIGINT) AS dist,
                array_to_string(vpath, ',') AS vpath
         FROM w""",

    // every walk of minimal length per pair IS a shortest path (and all
    // shortest walks are vertex-simple, so the bounded walk enumeration
    // reaches them all)
    "q53_all_shortest" ->
      s"""WITH RECURSIVE $sqlNationNear,
         w(src, v, dist, vpath) AS (
           SELECT n_nationkey, n_nationkey, 0, [CAST(n_nationkey AS BIGINT)]
           FROM nation
           UNION ALL
           SELECT w.src, e.dst, w.dist + 1,
                  list_append(w.vpath, CAST(e.dst AS BIGINT))
           FROM w JOIN nation_near e ON w.v = e.src
           WHERE w.dist < 2)
         SELECT src, dst, dist, vpath FROM (
           SELECT src, v AS dst, CAST(dist AS BIGINT) AS dist,
                  array_to_string(vpath, ',') AS vpath,
                  min(dist) OVER (PARTITION BY src, v) AS md
           FROM w)
         WHERE dist = md AND dist >= 1""",

    // 3-hop trails (no repeated edge; with no parallel edges edge
    // identity IS the (src, dst) pair), ANY SHORTEST = lexicographically
    // least per (src, dst) endpoint pair — ranked by vertex sequence,
    // which equals interleaved-path order for (src, dst)-ranked dense ids
    "q89_trail_prefix_fixed" ->
      s"""WITH RECURSIVE $sqlNationNear,
         p AS (
           SELECT a.src AS v0, a.dst AS v1, b.dst AS v2, c.dst AS v3
           FROM nation_near a
           JOIN nation n0 ON n0.n_nationkey = a.src AND n0.n_regionkey = 0
           JOIN nation_near b ON b.src = a.dst
           JOIN nation_near c ON c.src = b.dst
           WHERE NOT (a.src = b.src AND a.dst = b.dst)
             AND NOT (a.src = c.src AND a.dst = c.dst)
             AND NOT (b.src = c.src AND b.dst = c.dst))
         SELECT v0 AS src, v1 AS via1, v2 AS via2, v3 AS dst FROM (
           SELECT *, row_number() OVER (PARTITION BY v0, v3
             ORDER BY v1, v2) AS rn
           FROM p)
         WHERE rn = 1""",

    "q90_topk_fixed_multihop" ->
      s"""WITH RECURSIVE $sqlNationNear,
         p AS (
           SELECT a.src AS v0, a.dst AS v1, b.dst AS v2
           FROM nation_near a
           JOIN nation n0 ON n0.n_nationkey = a.src AND n0.n_regionkey = 0
           JOIN nation_near b ON b.src = a.dst)
         SELECT v0 AS src, v1 AS via, v2 AS dst FROM (
           SELECT *, dense_rank() OVER (PARTITION BY v0, v2
             ORDER BY v1) AS rn
           FROM p)
         WHERE rn <= 2""",

    "q54_shortest_k" ->
      s"""WITH RECURSIVE $sqlNationNear,
         w(src, v, dist, vpath) AS (
           SELECT n_nationkey, n_nationkey, 0, [CAST(n_nationkey AS BIGINT)]
           FROM nation WHERE n_regionkey = 0
           UNION ALL
           SELECT w.src, e.dst, w.dist + 1,
                  list_append(w.vpath, CAST(e.dst AS BIGINT))
           FROM w JOIN nation_near e ON w.v = e.src
           WHERE w.dist < 3)
         SELECT src, dst, dist, vpath FROM (
           SELECT src, v AS dst, CAST(dist AS BIGINT) AS dist,
                  array_to_string(vpath, ',') AS vpath,
                  row_number() OVER (PARTITION BY src, v
                    ORDER BY dist, vpath) AS rn
           FROM w WHERE dist >= 1)
         WHERE rn <= 3""",

    "q11_varlen" ->
      s"""WITH RECURSIVE $sqlNationNext,
         b(src, dst, dist) AS (
           SELECT n_nationkey, n_nationkey, 0 FROM nation
           UNION
           SELECT b.src, e.dst, b.dist + 1
           FROM b JOIN nation_next e ON b.dst = e.src WHERE b.dist < 6),
         sp AS (SELECT src, dst, min(dist) AS dist FROM b GROUP BY src, dst)
         SELECT src, dst, CAST(dist AS BIGINT) AS dist
         FROM sp WHERE dist BETWEEN 1 AND 3""",

    "q12_shortest_path" ->
      s"""WITH RECURSIVE $sqlNationNext,
         b(src, dst, dist, vpath) AS (
           SELECT n_nationkey, n_nationkey, 0, [CAST(n_nationkey AS BIGINT)]
           FROM nation
           UNION
           SELECT b.src, e.dst, b.dist + 1,
                  list_append(b.vpath, CAST(e.dst AS BIGINT))
           FROM b JOIN nation_next e ON b.dst = e.src WHERE b.dist < 6),
         sp AS (SELECT src, dst, min(dist) AS d,
                       arg_min(vpath, dist) AS vpath
                FROM b GROUP BY src, dst)
         SELECT src, dst, CAST(d AS BIGINT) AS dist,
                array_to_string(vpath, ',') AS vpath
         FROM sp WHERE d >= 1""",

    "q46_multiseg_path" ->
      s"""WITH RECURSIVE $sqlNationNext,
         b(src, dst, dist, vpath) AS (
           SELECT n_nationkey, n_nationkey, 0, [CAST(n_nationkey AS BIGINT)]
           FROM nation
           UNION
           SELECT b.src, e.dst, b.dist + 1,
                  list_append(b.vpath, CAST(e.dst AS BIGINT))
           FROM b JOIN nation_next e ON b.dst = e.src WHERE b.dist < 3),
         sp AS (SELECT src, dst, min(dist) AS d,
                       arg_min(vpath, dist) AS vpath
                FROM b GROUP BY src, dst)
         SELECT nn.src AS src, nn.dst AS mid, sp.dst AS dst,
                CAST(1 + sp.d AS BIGINT) AS plen,
                array_to_string(
                  list_prepend(CAST(nn.src AS BIGINT), sp.vpath), ',')
                  AS vpath
         FROM nation_next nn JOIN sp ON sp.src = nn.dst
         WHERE sp.d BETWEEN 1 AND 3""",

    // IC13-shaped prefix-over-mixed goldens: fixed NationNext hop, then
    // per-segment ALL SHORTEST / SHORTEST k over nation_near walks; the
    // segment CTE mirrors q53/q54 and the concatenation prepends the
    // fixed hop (match.cpp:709-790 composition).
    "q64_prefix_all_shortest" ->
      s"""WITH RECURSIVE $sqlNationNext, $sqlNationNear,
         w(src, v, dist, vpath) AS (
           SELECT n_nationkey, n_nationkey, 0, [CAST(n_nationkey AS BIGINT)]
           FROM nation
           UNION ALL
           SELECT w.src, e.dst, w.dist + 1,
                  list_append(w.vpath, CAST(e.dst AS BIGINT))
           FROM w JOIN nation_near e ON w.v = e.src
           WHERE w.dist < 2),
         seg AS (
           SELECT src, dst, dist, vpath FROM (
             SELECT src, v AS dst, CAST(dist AS BIGINT) AS dist, vpath,
                    min(dist) OVER (PARTITION BY src, v) AS md
             FROM w)
           WHERE dist = md AND dist >= 1)
         SELECT a.n_nationkey AS src, nn.dst AS mid, seg.dst AS dst,
                CAST(1 + seg.dist AS BIGINT) AS plen,
                array_to_string(
                  list_prepend(CAST(a.n_nationkey AS BIGINT), seg.vpath),
                  ',') AS vpath
         FROM nation a
         JOIN nation_next nn ON nn.src = a.n_nationkey
         JOIN seg ON seg.src = nn.dst
         WHERE a.n_regionkey = 0""",

    "q65_prefix_shortest_k" ->
      s"""WITH RECURSIVE $sqlNationNext, $sqlNationNear,
         w(src, v, dist, vpath) AS (
           SELECT n_nationkey, n_nationkey, 0, [CAST(n_nationkey AS BIGINT)]
           FROM nation
           UNION ALL
           SELECT w.src, e.dst, w.dist + 1,
                  list_append(w.vpath, CAST(e.dst AS BIGINT))
           FROM w JOIN nation_near e ON w.v = e.src
           WHERE w.dist < 2),
         seg AS (
           SELECT src, dst, dist, vpath FROM (
             SELECT src, v AS dst, CAST(dist AS BIGINT) AS dist, vpath,
                    row_number() OVER (PARTITION BY src, v
                      ORDER BY dist, vpath) AS rn
             FROM w WHERE dist >= 1)
           WHERE rn <= 2)
         SELECT a.n_nationkey AS src, nn.dst AS mid, seg.dst AS dst,
                CAST(1 + seg.dist AS BIGINT) AS plen,
                array_to_string(
                  list_prepend(CAST(a.n_nationkey AS BIGINT), seg.vpath),
                  ',') AS vpath
         FROM nation a
         JOIN nation_next nn ON nn.src = a.n_nationkey
         JOIN seg ON seg.src = nn.dst
         WHERE a.n_regionkey = 0""",

    // two independent per-segment all-shortest sets (different edge
    // tables) composed at the junction; min-dist window then dist >= 1
    // mirrors the kernels' min-dist-then-quantifier-range rule
    "q67_two_segment_all_shortest" ->
      s"""WITH RECURSIVE $sqlNationNext, $sqlNationNear,
         w1(src, v, dist, vpath) AS (
           SELECT n_nationkey, n_nationkey, 0, [CAST(n_nationkey AS BIGINT)]
           FROM nation
           UNION ALL
           SELECT w1.src, e.dst, w1.dist + 1,
                  list_append(w1.vpath, CAST(e.dst AS BIGINT))
           FROM w1 JOIN nation_near e ON w1.v = e.src
           WHERE w1.dist < 2),
         seg1 AS (
           SELECT src, dst, dist, vpath FROM (
             SELECT src, v AS dst, dist, vpath,
                    min(dist) OVER (PARTITION BY src, v) AS md
             FROM w1)
           WHERE dist = md AND dist >= 1),
         w2(src, v, dist, vpath) AS (
           SELECT n_nationkey, n_nationkey, 0, [CAST(n_nationkey AS BIGINT)]
           FROM nation
           UNION ALL
           SELECT w2.src, e.dst, w2.dist + 1,
                  list_append(w2.vpath, CAST(e.dst AS BIGINT))
           FROM w2 JOIN nation_next e ON w2.v = e.src
           WHERE w2.dist < 2),
         seg2 AS (
           SELECT src, dst, dist, vpath FROM (
             SELECT src, v AS dst, dist, vpath,
                    min(dist) OVER (PARTITION BY src, v) AS md
             FROM w2)
           WHERE dist = md AND dist >= 1)
         SELECT a.n_nationkey AS src, s1.dst AS mid, s2.dst AS dst,
                CAST(s1.dist + s2.dist AS BIGINT) AS plen,
                array_to_string(list_concat(s1.vpath, s2.vpath[2:]), ',')
                  AS vpath
         FROM nation a
         JOIN seg1 s1 ON s1.src = a.n_nationkey
         JOIN seg2 s2 ON s2.src = s1.dst
         WHERE a.n_regionkey = 0 AND s1.dst % 2 = 0""",

    // composite-key path surrogates: vertex slots are the '|'-joined
    // declared key tuple (n_regionkey|n_nationkey); the CNext ring has
    // out-degree 1, so each (src, dst) has exactly one walk of dist ≤ 3
    // and ANY SHORTEST is deterministic — vpath fully value-checked
    "q66_composite_path_vertices" ->
      s"""WITH RECURSIVE $sqlNationNext, $sqlNationCNext,
         b(sr, sn, dr, dn, dist, vpath) AS (
           SELECT n_regionkey, n_nationkey, n_regionkey, n_nationkey, 0,
                  [CAST(n_regionkey AS VARCHAR) || '|' ||
                   CAST(n_nationkey AS VARCHAR)]
           FROM nation WHERE n_regionkey = 0
           UNION ALL
           SELECT b.sr, b.sn, e.dst_r, e.dst_n, b.dist + 1,
                  list_append(b.vpath, CAST(e.dst_r AS VARCHAR) || '|' ||
                    CAST(e.dst_n AS VARCHAR))
           FROM b JOIN nation_cnext e
             ON b.dr = e.src_r AND b.dn = e.src_n
           WHERE b.dist < 3)
         SELECT sn AS src, dn AS dst, CAST(dist AS BIGINT) AS plen,
                array_to_string(vpath, ',') AS vpath
         FROM b WHERE dist BETWEEN 1 AND 3""",

    // enumeration multiplicity (UNION ALL): on the out-degree-1 ring
    // every walk of dist <= 3 < 5 is a trail and is unique per
    // (src, dst), so the surrogate path CTE is exact
    // Mode UNDER prefix over a mixed pattern (the last formerly-refused
    // combination): enumerate mode-valid full paths — fixed NationNear
    // hop seeds the walk with its arc already in the visited set, so the
    // whole-path TRAIL constraint spans segments — then rank per (src,
    // dst) endpoint partition. dense_rank over (dist, vpath-list) mirrors
    // the kernel's (length, lex-path) order (no parallel edges; dense
    // eids ranked by (src, dst), so interleaved order = vertex order).
    "q69_prefix_trail_k" ->
      s"""WITH RECURSIVE $sqlNationNear,
         w(src, mid, v, dist, vpath, ve) AS (
           SELECT f.src, f.dst, f.dst, 1,
                  [CAST(f.src AS BIGINT), CAST(f.dst AS BIGINT)],
                  [CAST(f.src * 100 + f.dst AS BIGINT)]
           FROM nation_near f JOIN nation a ON a.n_nationkey = f.src
           WHERE a.n_regionkey = 0
           UNION ALL
           SELECT w.src, w.mid, e.dst, w.dist + 1,
                  list_append(w.vpath, CAST(e.dst AS BIGINT)),
                  list_append(w.ve, CAST(e.src * 100 + e.dst AS BIGINT))
           FROM w JOIN nation_near e ON w.v = e.src
           WHERE w.dist < 3
             AND NOT list_contains(w.ve, CAST(e.src * 100 + e.dst AS BIGINT)))
         SELECT src, mid, dst, plen, vpath FROM (
           SELECT src, mid, v AS dst, CAST(dist AS BIGINT) AS plen,
                  array_to_string(vpath, ',') AS vpath,
                  dense_rank() OVER (PARTITION BY src, v
                    ORDER BY dist, vpath) AS rn
           FROM w WHERE dist >= 2)
         WHERE rn <= 2""",

    // whole-path ACYCLIC under ALL SHORTEST: seed is the fixed NationNext
    // hop (a <> m guaranteed by the seed filter), extension rejects ANY
    // repeated vertex, then the min-dist window keeps every shortest
    // acyclic path per (src, dst)
    "q70_prefix_acyclic_all" ->
      s"""WITH RECURSIVE $sqlNationNext, $sqlNationNear,
         w(src, mid, v, dist, vpath) AS (
           SELECT f.src, f.dst, f.dst, 1,
                  [CAST(f.src AS BIGINT), CAST(f.dst AS BIGINT)]
           FROM nation_next f JOIN nation a ON a.n_nationkey = f.src
           WHERE a.n_regionkey = 0 AND f.src <> f.dst
           UNION ALL
           SELECT w.src, w.mid, e.dst, w.dist + 1,
                  list_append(w.vpath, CAST(e.dst AS BIGINT))
           FROM w JOIN nation_near e ON w.v = e.src
           WHERE w.dist < 3
             AND NOT list_contains(w.vpath, CAST(e.dst AS BIGINT)))
         SELECT src, mid, dst, plen, vpath FROM (
           SELECT src, mid, v AS dst, CAST(dist AS BIGINT) AS plen,
                  array_to_string(vpath, ',') AS vpath,
                  min(dist) OVER (PARTITION BY src, v) AS md
           FROM w WHERE dist >= 2)
         WHERE plen = md""",

    // the fixed first hop seeds the walk; out-degree 1 makes every
    // (src, dst) pair's path unique, so ANY SHORTEST = the walk itself
    "q76_composite_mixed_path" ->
      s"""WITH RECURSIVE $sqlNationNext, $sqlNationCNext,
         w(sr, sn, mr, mn, dr, dn, dist, vpath) AS (
           SELECT f.src_r, f.src_n, f.dst_r, f.dst_n, f.dst_r, f.dst_n, 1,
                  [CAST(f.src_r AS VARCHAR) || '|' ||
                     CAST(f.src_n AS VARCHAR),
                   CAST(f.dst_r AS VARCHAR) || '|' ||
                     CAST(f.dst_n AS VARCHAR)]
           FROM nation_cnext f WHERE f.src_r = 0
           UNION ALL
           SELECT w.sr, w.sn, w.mr, w.mn, e.dst_r, e.dst_n, w.dist + 1,
                  list_append(w.vpath, CAST(e.dst_r AS VARCHAR) || '|' ||
                    CAST(e.dst_n AS VARCHAR))
           FROM w JOIN nation_cnext e
             ON w.dr = e.src_r AND w.dn = e.src_n
           WHERE w.dist < 3)
         SELECT sn AS src, mn AS mid, dn AS dst,
                CAST(dist AS BIGINT) AS plen,
                array_to_string(vpath, ',') AS vpath
         FROM w WHERE dist BETWEEN 2 AND 3""",

    // visited-list CTE: the ACYCLIC guard stops the ring's closing walk
    // (the next vertex is already on the path), leaving lengths 2..4
    "q77_composite_mixed_acyclic" ->
      s"""WITH RECURSIVE $sqlNationNext, $sqlNationCNext,
         w(sr, sn, mr, mn, dr, dn, dist, vpath) AS (
           SELECT f.src_r, f.src_n, f.dst_r, f.dst_n, f.dst_r, f.dst_n, 1,
                  [CAST(f.src_r AS VARCHAR) || '|' ||
                     CAST(f.src_n AS VARCHAR),
                   CAST(f.dst_r AS VARCHAR) || '|' ||
                     CAST(f.dst_n AS VARCHAR)]
           FROM nation_cnext f WHERE f.src_r = 0
           UNION ALL
           SELECT w.sr, w.sn, w.mr, w.mn, e.dst_r, e.dst_n, w.dist + 1,
                  list_append(w.vpath, CAST(e.dst_r AS VARCHAR) || '|' ||
                    CAST(e.dst_n AS VARCHAR))
           FROM w JOIN nation_cnext e
             ON w.dr = e.src_r AND w.dn = e.src_n
           WHERE w.dist < 5
             AND NOT list_contains(w.vpath, CAST(e.dst_r AS VARCHAR) ||
               '|' || CAST(e.dst_n AS VARCHAR)))
         SELECT sn AS src, mn AS mid, dn AS dst,
                CAST(dist AS BIGINT) AS plen,
                array_to_string(vpath, ',') AS vpath
         FROM w WHERE dist BETWEEN 2 AND 5""",

    "q68_composite_trail_enum" ->
      s"""WITH RECURSIVE $sqlNationNext, $sqlNationCNext,
         b(sr, sn, dr, dn, dist, vpath) AS (
           SELECT n_regionkey, n_nationkey, n_regionkey, n_nationkey, 0,
                  [CAST(n_regionkey AS VARCHAR) || '|' ||
                   CAST(n_nationkey AS VARCHAR)]
           FROM nation WHERE n_regionkey = 0
           UNION ALL
           SELECT b.sr, b.sn, e.dst_r, e.dst_n, b.dist + 1,
                  list_append(b.vpath, CAST(e.dst_r AS VARCHAR) || '|' ||
                    CAST(e.dst_n AS VARCHAR))
           FROM b JOIN nation_cnext e
             ON b.dr = e.src_r AND b.dn = e.src_n
           WHERE b.dist < 3)
         SELECT sn AS src, dn AS dst, CAST(dist AS BIGINT) AS plen,
                array_to_string(vpath, ',') AS vpath
         FROM b WHERE dist BETWEEN 1 AND 3""",

    // segments span two key spaces: slot 0 is the numeric Nation key as
    // plain text, every later slot the '|'-joined CNation tuple — the
    // per-segment surrogate forms the engine emits. Out-degree 1 makes
    // each (src, dist) walk unique, so ANY SHORTEST = the walk itself.
    "q92_mixed_space_path" ->
      s"""WITH RECURSIVE $sqlNationNext, $sqlNationCNext,
         w(src, cn, dr, dn, dist, vpath) AS (
           SELECT f.src_n, f.dst_n, f.dst_r, f.dst_n, 1,
                  [CAST(f.src_n AS VARCHAR),
                   CAST(f.dst_r AS VARCHAR) || '|' ||
                     CAST(f.dst_n AS VARCHAR)]
           FROM nation_cnext f WHERE f.src_r = 0
           UNION ALL
           SELECT w.src, w.cn, e.dst_r, e.dst_n, w.dist + 1,
                  list_append(w.vpath, CAST(e.dst_r AS VARCHAR) || '|' ||
                    CAST(e.dst_n AS VARCHAR))
           FROM w JOIN nation_cnext e
             ON w.dr = e.src_r AND w.dn = e.src_n
           WHERE w.dist < 4)
         SELECT src, cn, dn AS dst, CAST(dist AS BIGINT) AS plen,
                array_to_string(vpath, ',') AS vpath
         FROM w WHERE dist BETWEEN 2 AND 4""",

    // cross-space ACYCLIC: all three hops are the SAME ring step, so the
    // path is the start's p-th successors; all-distinct on the 5-ring
    // means total hops <= 4, i.e. splits (1,1), (1,2), (2,1). The
    // position table enumerates the ring walk once; the (h1, h2) grid
    // reads m, c, b off it.
    "q93_cross_space_acyclic" ->
      s"""WITH RECURSIVE $sqlNationNext,
         pos(start, p, k) AS (
           SELECT n_nationkey, 0, n_nationkey FROM nation
           WHERE n_regionkey = 0
           UNION ALL
           SELECT pos.start, pos.p + 1, e.dst
           FROM pos JOIN nation_next e ON pos.k = e.src
           WHERE pos.p < 4)
         SELECT p1.start AS src, p1.k AS mid, p2.k AS cn, p3.k AS dst,
                CAST(t1.h1 + 1 + t2.h2 AS BIGINT) AS plen
         FROM (VALUES (1), (2), (3)) t1(h1),
              (VALUES (1), (2), (3)) t2(h2),
              pos p1, pos p2, pos p3
         WHERE t1.h1 + 1 + t2.h2 <= 4
           AND p1.p = t1.h1
           AND p2.start = p1.start AND p2.p = t1.h1 + 1
           AND p3.start = p1.start AND p3.p = t1.h1 + 1 + t2.h2""",

    // min-dist closure over the branching near graph, then per-source
    // reachability / harmonic / closeness aggregates — the engine's BFS
    // returns exactly the min distances
    "q97_harmonic_centrality" ->
      s"""WITH RECURSIVE $sqlNationNear,
         b(src, dst, dist) AS (
           SELECT n_nationkey, n_nationkey, 0 FROM nation
           UNION
           SELECT b.src, e.dst, b.dist + 1
           FROM b JOIN nation_near e ON b.dst = e.src WHERE b.dist < 25),
         md AS (SELECT src, dst, min(dist) AS d FROM b GROUP BY 1, 2),
         agg AS (
           SELECT src AS id, count(*) AS n_reached, sum(d) AS sum_dist,
                  sum(1.0 / d) AS harmonic
           FROM md WHERE d >= 1 GROUP BY 1)
         SELECT CAST(n.n_nationkey AS BIGINT) AS id,
           CAST(coalesce(agg.n_reached, 0) AS BIGINT) AS n_reached,
           CAST(coalesce(agg.sum_dist, 0) AS BIGINT) AS sum_dist,
           round(coalesce(agg.harmonic, 0.0), 6) AS harmonic,
           round(CASE WHEN coalesce(agg.sum_dist, 0) = 0 THEN 0.0
                 ELSE CAST(agg.n_reached AS DOUBLE) / agg.sum_dist END, 6)
             AS closeness
         FROM nation n LEFT JOIN agg ON n.n_nationkey = agg.id""",

    // six generated peel rounds (the cascade converges in three; the
    // extra rounds prove the fixpoint): each round keeps vertices with
    // >= 3 distinct surviving neighbors in the undirected view
    "q98_kcore" ->
      s"""WITH $sqlNationAdj, $sqlNationNear,
         eu AS (
           SELECT src, dst FROM (
             SELECT a.src, a.dst FROM nation_adj a
               JOIN nation n ON a.src = n.n_nationkey WHERE n.n_regionkey = 0
             UNION
             SELECT a.dst, a.src FROM nation_adj a
               JOIN nation n ON a.src = n.n_nationkey WHERE n.n_regionkey = 0
             UNION
             SELECT b.src, b.dst FROM nation_near b
               JOIN nation n ON b.src = n.n_nationkey WHERE n.n_regionkey <> 0
             UNION
             SELECT b.dst, b.src FROM nation_near b
               JOIN nation n ON b.src = n.n_nationkey WHERE n.n_regionkey <> 0)
           WHERE src <> dst),
         r0 AS (SELECT n_nationkey AS id FROM nation),
         r1 AS (SELECT e.src AS id FROM eu e JOIN r0 a ON e.src = a.id
                JOIN r0 b ON e.dst = b.id GROUP BY 1 HAVING count(*) >= 3),
         r2 AS (SELECT e.src AS id FROM eu e JOIN r1 a ON e.src = a.id
                JOIN r1 b ON e.dst = b.id GROUP BY 1 HAVING count(*) >= 3),
         r3 AS (SELECT e.src AS id FROM eu e JOIN r2 a ON e.src = a.id
                JOIN r2 b ON e.dst = b.id GROUP BY 1 HAVING count(*) >= 3),
         r4 AS (SELECT e.src AS id FROM eu e JOIN r3 a ON e.src = a.id
                JOIN r3 b ON e.dst = b.id GROUP BY 1 HAVING count(*) >= 3),
         r5 AS (SELECT e.src AS id FROM eu e JOIN r4 a ON e.src = a.id
                JOIN r4 b ON e.dst = b.id GROUP BY 1 HAVING count(*) >= 3),
         r6 AS (SELECT e.src AS id FROM eu e JOIN r5 a ON e.src = a.id
                JOIN r5 b ON e.dst = b.id GROUP BY 1 HAVING count(*) >= 3)
         SELECT CAST(n.n_nationkey AS BIGINT) AS id,
                r6.id IS NOT NULL AS in_core
         FROM nation n LEFT JOIN r6 ON n.n_nationkey = r6.id""",

    "q114_copurchase" ->
      """WITH cp AS (
           SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS v
           FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey)
         SELECT CAST(a.u AS BIGINT) AS id_a, CAST(b.u AS BIGINT) AS id_b,
                count(*) AS weight
         FROM cp a JOIN cp b ON a.v = b.v AND a.u < b.u
         GROUP BY 1, 2 HAVING count(*) >= 5""",

    // wedge join + degree joins replayed; ln is natural on both engines
    "q113_link_prediction" ->
      s"""WITH $sqlNationNear,
         su AS (
           SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
           FROM nation_near WHERE src <> dst),
         nbr AS (SELECT a AS v, b AS n FROM su
                 UNION ALL SELECT b, a FROM su),
         deg AS (SELECT v, count(*) AS deg FROM nbr GROUP BY 1),
         p AS (
           SELECT x.v AS id_a, y.v AS id_b, count(*) AS cn,
             sum(1.0 / ln(CAST(d.deg AS DOUBLE))) AS aa
           FROM nbr x JOIN nbr y ON x.n = y.n AND x.v < y.v
           JOIN deg d ON d.v = x.n
           GROUP BY 1, 2)
         SELECT CAST(p.id_a AS BIGINT) AS id_a,
           CAST(p.id_b AS BIGINT) AS id_b,
           cn AS common_neighbors,
           round(CAST(cn AS DOUBLE) / (da.deg + db.deg - cn), 6) AS jaccard,
           round(aa, 6) AS adamic_adar,
           e.a IS NOT NULL AS is_edge
         FROM p
         JOIN deg da ON da.v = p.id_a
         JOIN deg db ON db.v = p.id_b
         LEFT JOIN su e ON e.a = p.id_a AND e.b = p.id_b""",

    // six generated truss-peel rounds over the q98 mixed graph:
    // per-edge support via the wedge join, keep support >= k-2 = 2
    "q112_ktruss" -> {
      // MATERIALIZED rounds: DuckDB inlines plain CTEs per reference, and
      // each round references its predecessor 5x — 5^6 inlined copies of
      // the base scan blow the open-file limit without materialization
      val rounds = (1 to 6).map { t =>
        s"""d$t AS MATERIALIZED (SELECT a AS u, b AS v FROM r${t - 1}
             UNION ALL SELECT b, a FROM r${t - 1}),
         s$t AS (SELECT e.a, e.b, count(*) AS sup FROM r${t - 1} e
             JOIN d$t x ON x.u = e.a
             JOIN d$t y ON y.u = e.b AND y.v = x.v
             GROUP BY 1, 2),
         r$t AS MATERIALIZED (SELECT a, b FROM s$t WHERE sup >= 2)"""
      }.mkString(",\n         ")
      s"""WITH $sqlNationAdj, $sqlNationNear,
         eu AS (
           SELECT src, dst FROM (
             SELECT a.src, a.dst FROM nation_adj a
               JOIN nation n ON a.src = n.n_nationkey WHERE n.n_regionkey = 0
             UNION
             SELECT b.src, b.dst FROM nation_near b
               JOIN nation n ON b.src = n.n_nationkey WHERE n.n_regionkey <> 0)
           WHERE src <> dst),
         r0 AS MATERIALIZED (
           SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
           FROM eu),
         $rounds
         SELECT CAST(a AS BIGINT) AS src, CAST(b AS BIGINT) AS dst
         FROM r6"""
    },
    "q13_reachability" ->
      s"""WITH RECURSIVE $sqlNationNext,
         b(src, dst, dist) AS (
           SELECT n_nationkey, n_nationkey, 0 FROM nation WHERE n_regionkey = 0
           UNION
           SELECT b.src, e.dst, b.dist + 1
           FROM b JOIN nation_next e ON b.dst = e.src WHERE b.dist < 6)
         -- shortest-distance semantics: self only reachable at dist 0
         SELECT src, dst FROM (
           SELECT src, dst, min(dist) AS d FROM b GROUP BY src, dst)
         WHERE d >= 1""",

    "q14_cheapest" ->
      s"""WITH RECURSIVE $sqlNationNext,
         b(src, dst, cost) AS (
           SELECT CAST(n_nationkey AS BIGINT), CAST(n_nationkey AS BIGINT),
                  CAST(0 AS DOUBLE) FROM nation
           UNION
           SELECT b.src, CAST(e.dst AS BIGINT), b.cost + CAST(e.dst AS DOUBLE)
           FROM b JOIN nation_next e ON b.dst = e.src WHERE b.cost < 200)
         SELECT src, dst, round(min(cost), 2) AS cost
         FROM b GROUP BY src, dst""",

    // route gate: recomputed-from-path costs must equal the min-cost CTE
    "q58_cheapest_route" ->
      s"""WITH RECURSIVE $sqlNationNext,
         b(src, dst, cost) AS (
           SELECT CAST(n_nationkey AS BIGINT), CAST(n_nationkey AS BIGINT),
                  CAST(0 AS DOUBLE) FROM nation
           UNION
           SELECT b.src, CAST(e.dst AS BIGINT), b.cost + CAST(e.dst AS DOUBLE)
           FROM b JOIN nation_next e ON b.dst = e.src WHERE b.cost < 200)
         SELECT src, dst, round(min(cost), 2) AS cost
         FROM b GROUP BY src, dst""",

    // independent-path oracle: enumerate ALL shortest simple paths,
    // unnest interiors, B(v) = sum of 1/sigma_st per occurrence — no
    // Brandes recurrence anywhere in the replay
    "q105_betweenness" ->
      s"""WITH RECURSIVE $sqlNationNear,
         e AS (SELECT DISTINCT src, dst FROM nation_near),
         p(src, cur, path, dist) AS (
           SELECT CAST(n_nationkey AS BIGINT), CAST(n_nationkey AS BIGINT),
                  [CAST(n_nationkey AS BIGINT)], 0 FROM nation
           UNION ALL
           SELECT p.src, CAST(e.dst AS BIGINT),
                  list_append(p.path, CAST(e.dst AS BIGINT)), p.dist + 1
           FROM p JOIN e ON p.cur = e.src
           WHERE NOT list_contains(p.path, e.dst) AND p.dist < 5),
         mind AS (SELECT src, cur AS dst, min(dist) AS d FROM p
                  WHERE dist > 0 GROUP BY 1, 2),
         sp AS (SELECT p.src, p.cur AS dst, p.path FROM p
                JOIN mind ON p.src = mind.src AND p.cur = mind.dst
                 AND p.dist = mind.d),
         tot AS (SELECT src, dst, count(*) AS total FROM sp GROUP BY 1, 2),
         thru AS (SELECT sp.src, sp.dst, u.v
                  FROM sp, unnest(sp.path[2:-2]) AS u(v)),
         bc AS (SELECT thru.v AS id, sum(1.0 / tot.total) AS b
                FROM thru JOIN tot ON thru.src = tot.src
                 AND thru.dst = tot.dst
                GROUP BY 1)
         SELECT CAST(n.n_nationkey AS BIGINT) AS id,
                round(coalesce(bc.b, 0.0), 6) AS betweenness
         FROM nation n LEFT JOIN bc ON n.n_nationkey = bc.id""",

    // six generated propagation rounds: per-(vertex, label) neighbor
    // counts, QUALIFY picks (count DESC, label ASC) — the exact
    // min-struct((-c, lab)) the engine minimizes
    "q104_label_propagation" -> {
      val rounds = (1 to 6).map { t =>
        s"""c$t AS (
           SELECT e.dst AS id, l${t - 1}.lab AS lab, count(*) AS c
           FROM und e JOIN l${t - 1} ON e.src = l${t - 1}.id GROUP BY 1, 2),
         p$t AS (
           SELECT id, lab FROM c$t
           QUALIFY row_number() OVER (
             PARTITION BY id ORDER BY c DESC, lab) = 1),
         l$t AS (
           SELECT l${t - 1}.id, coalesce(p$t.lab, l${t - 1}.lab) AS lab
           FROM l${t - 1} LEFT JOIN p$t ON l${t - 1}.id = p$t.id)"""
      }.mkString(",\n         ")
      s"""WITH $sqlNationNear,
         bridge(src, dst) AS (VALUES (1, 2), (7, 8), (13, 14), (19, 20)),
         alle AS (
           SELECT src, dst FROM nation_near
           UNION ALL SELECT src, dst FROM bridge),
         su AS (
           SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
           FROM alle WHERE src <> dst),
         und AS (
           SELECT a AS src, b AS dst FROM su
           UNION ALL SELECT b, a FROM su),
         l0 AS (
           SELECT CAST(n_nationkey AS BIGINT) AS id,
                  CAST(n_nationkey AS BIGINT) AS lab FROM nation),
         $rounds
         SELECT id, lab AS community FROM l6"""
    },

    // the q104 round replay with weighted argmax votes: round(sum(w), 9)
    // before ranking on both engines (integer-valued weights -> exact)
    "q117_weighted_lpa" -> {
      val rounds = (1 to 6).map { t =>
        s"""c$t AS (
           SELECT e.dst AS id, l${t - 1}.lab AS lab,
                  round(sum(e.w), 9) AS wv
           FROM und e JOIN l${t - 1} ON e.src = l${t - 1}.id GROUP BY 1, 2),
         p$t AS (
           SELECT id, lab FROM c$t
           QUALIFY row_number() OVER (
             PARTITION BY id ORDER BY wv DESC, lab) = 1),
         l$t AS (
           SELECT l${t - 1}.id, coalesce(p$t.lab, l${t - 1}.lab) AS lab
           FROM l${t - 1} LEFT JOIN p$t ON l${t - 1}.id = p$t.id)"""
      }.mkString(",\n         ")
      s"""WITH $sqlNationNear,
         bridge(src, dst) AS (VALUES (1, 2), (7, 8), (13, 14), (19, 20)),
         alle AS (
           SELECT src, dst,
                  CAST((src + dst) % 7 + 1 AS DOUBLE) AS w
           FROM (SELECT src, dst FROM nation_near
                 UNION ALL SELECT src, dst FROM bridge)),
         su AS (
           SELECT least(src, dst) AS a, greatest(src, dst) AS b,
                  sum(w) AS w
           FROM alle WHERE src <> dst GROUP BY 1, 2),
         und AS (
           SELECT a AS src, b AS dst, w FROM su
           UNION ALL SELECT b, a, w FROM su),
         l0 AS (
           SELECT CAST(n_nationkey AS BIGINT) AS id,
                  CAST(n_nationkey AS BIGINT) AS lab FROM nation),
         $rounds
         SELECT id, lab AS community FROM l6"""
    },

    // the q117 weighted-LPA replay extended with the Newman-Girvan
    // formula over the simple undirected graph
    "q119_modularity" -> {
      val rounds = (1 to 6).map { t =>
        s"""c$t AS (
           SELECT e.dst AS id, l${t - 1}.lab AS lab,
                  round(sum(e.w), 9) AS wv
           FROM und e JOIN l${t - 1} ON e.src = l${t - 1}.id GROUP BY 1, 2),
         p$t AS (
           SELECT id, lab FROM c$t
           QUALIFY row_number() OVER (
             PARTITION BY id ORDER BY wv DESC, lab) = 1),
         l$t AS (
           SELECT l${t - 1}.id, coalesce(p$t.lab, l${t - 1}.lab) AS lab
           FROM l${t - 1} LEFT JOIN p$t ON l${t - 1}.id = p$t.id)"""
      }.mkString(",\n         ")
      s"""WITH $sqlNationNear,
         bridge(src, dst) AS (VALUES (1, 2), (7, 8), (13, 14), (19, 20)),
         alle AS (
           SELECT src, dst,
                  CAST((src + dst) % 7 + 1 AS DOUBLE) AS w
           FROM (SELECT src, dst FROM nation_near
                 UNION ALL SELECT src, dst FROM bridge)),
         su AS (
           SELECT least(src, dst) AS a, greatest(src, dst) AS b,
                  sum(w) AS w
           FROM alle WHERE src <> dst GROUP BY 1, 2),
         und AS (
           SELECT a AS src, b AS dst, w FROM su
           UNION ALL SELECT b, a, w FROM su),
         l0 AS (
           SELECT CAST(n_nationkey AS BIGINT) AS id,
                  CAST(n_nationkey AS BIGINT) AS lab FROM nation),
         $rounds,
         mm AS (SELECT count(*) AS m FROM su),
         degs AS (
           SELECT id, count(*) AS deg FROM (
             SELECT a AS id FROM su UNION ALL SELECT b FROM su)
           GROUP BY 1),
         ec AS (
           SELECT la.lab AS community, count(*) AS internal_edges
           FROM su
           JOIN l6 la ON su.a = la.id
           JOIN l6 lb ON su.b = lb.id AND la.lab = lb.lab
           GROUP BY 1),
         dc AS (
           SELECT l6.lab AS community,
                  sum(coalesce(degs.deg, 0)) AS degree_sum
           FROM l6 LEFT JOIN degs ON l6.id = degs.id GROUP BY 1)
         SELECT dc.community,
                CAST(coalesce(ec.internal_edges, 0) AS BIGINT)
                  AS internal_edges,
                CAST(dc.degree_sum AS BIGINT) AS degree_sum,
                round(coalesce(ec.internal_edges, 0) / (1.0 * mm.m) -
                  pow(dc.degree_sum / (2.0 * mm.m), 2), 6) AS contribution
         FROM dc LEFT JOIN ec USING (community) CROSS JOIN mm"""
    },

    // every step of every walk replayed: arg_min over the identical
    // md5('start:r:t:dst') strings the Spark min-struct minimizes
    "q103_random_walks" ->
      s"""WITH RECURSIVE $sqlNationNear,
         w(t, start, r, cur, path) AS (
           SELECT 0, CAST(n_nationkey AS BIGINT), r.r,
                  CAST(n_nationkey AS BIGINT), CAST(n_nationkey AS VARCHAR)
           FROM nation, (SELECT unnest([0, 1]) AS r) r
           UNION ALL
           SELECT w.t + 1, w.start, w.r,
             coalesce(CAST(arg_min(e.dst, md5(concat_ws(':',
               w.start, w.r, w.t + 1, e.dst))) AS BIGINT), w.cur),
             CASE WHEN count(e.dst) = 0 THEN w.path
                  ELSE w.path || ',' || CAST(arg_min(e.dst, md5(concat_ws(':',
                    w.start, w.r, w.t + 1, e.dst))) AS VARCHAR) END
           FROM w LEFT JOIN nation_near e ON w.cur = e.src
           WHERE w.t < 8
           GROUP BY w.t, w.start, w.r, w.cur, w.path)
         SELECT start, r, cur AS final_v, path AS vpath FROM w WHERE t = 8""",

    // the q15 replay with weight-proportional contribution splitting
    // (w = dst + 1); nation_near has no dangling vertices
    "q115_weighted_pagerank" ->
      s"""WITH RECURSIVE $sqlNationNear,
         we AS (SELECT src, dst, CAST(dst AS DOUBLE) + 1.0 AS w
                FROM nation_near),
         wd AS (SELECT src, sum(w) AS wout FROM we GROUP BY src),
         pr(iter, id, rank) AS (
           SELECT 0, CAST(n_nationkey AS BIGINT),
                  CAST(1.0 AS DOUBLE) / 25 FROM nation
           UNION ALL
           SELECT p.iter + 1, CAST(e.dst AS BIGINT),
                  CAST(0.15 AS DOUBLE) / 25 +
                  0.85 * sum(p.rank * e.w / wd.wout)
           FROM pr p
           JOIN we e ON p.id = e.src
           JOIN wd ON wd.src = e.src
           WHERE p.iter < 30
           GROUP BY p.iter, e.dst
           )
         SELECT id, round(rank, 6) AS rank FROM pr WHERE iter = 30""",

    // the q15 replay with a seed-membership personalization vector:
    // teleport mass 0.15·s(v) where s = 1/5 on region-0 nations, 0
    // elsewhere (nation_adj has no dangling vertices, so the restart
    // of dangling mass never fires)
    "q99_personalized_pagerank" ->
      s"""WITH RECURSIVE $sqlNationAdj,
         deg AS (SELECT src, count(*) AS d FROM nation_adj GROUP BY src),
         sv AS (SELECT CAST(n_nationkey AS BIGINT) AS id,
                  CASE WHEN n_regionkey = 0
                       THEN CAST(1.0 AS DOUBLE) / 5 ELSE 0.0 END AS s
                FROM nation),
         pr(iter, id, rank) AS (
           SELECT 0, id, s FROM sv
           UNION ALL
           SELECT p.iter + 1, CAST(e.dst AS BIGINT),
                  0.15 * sv.s + 0.85 * sum(p.rank / deg.d)
           FROM pr p
           JOIN nation_adj e ON p.id = e.src
           JOIN deg ON deg.src = e.src
           JOIN sv ON sv.id = e.dst
           WHERE p.iter < 30
           GROUP BY p.iter, e.dst, sv.s)
         SELECT id, round(rank, 6) AS ppr FROM pr WHERE iter = 30""",

    "q15_pagerank" ->
      s"""WITH RECURSIVE $sqlNationAdj,
         deg AS (SELECT src, count(*) AS d FROM nation_adj GROUP BY src),
         pr(iter, id, rank) AS (
           SELECT 0, CAST(n_nationkey AS BIGINT),
                  CAST(1.0 AS DOUBLE) / 25 FROM nation
           UNION ALL
           SELECT p.iter + 1, CAST(e.dst AS BIGINT),
                  CAST(0.15 AS DOUBLE) / 25 +
                  0.85 * sum(p.rank / deg.d)
           FROM pr p
           JOIN nation_adj e ON p.id = e.src
           JOIN deg ON deg.src = e.src
           WHERE p.iter < 30
           GROUP BY p.iter, e.dst)
         SELECT id, round(rank, 6) AS pagerank FROM pr WHERE iter = 30""",

    "q16_wcc" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS id,
           CAST(min(n_nationkey) OVER (PARTITION BY n_regionkey) AS BIGINT)
             AS component
         FROM nation""",

    "q17_lcc" ->
      s"""WITH $sqlNationNear,
         und AS (SELECT DISTINCT src, dst FROM (
           SELECT src, dst FROM nation_near
           UNION ALL SELECT dst, src FROM nation_near)),
         deg AS (SELECT src AS id, count(*) AS d FROM und GROUP BY src),
         tri AS (SELECT x.src AS id, count(*) AS links
                 FROM und x JOIN und y ON x.src = y.src AND x.dst <> y.dst
                 JOIN und z ON z.src = x.dst AND z.dst = y.dst
                 GROUP BY x.src)
         SELECT CAST(n.n_nationkey AS BIGINT) AS id,
           round(CASE WHEN coalesce(deg.d, 0) < 2 THEN 0.0
                 ELSE CAST(coalesce(tri.links, 0) AS DOUBLE) /
                      (deg.d * (deg.d - 1)) END, 6) AS lcc
         FROM nation n
         LEFT JOIN deg ON deg.id = n.n_nationkey
         LEFT JOIN tri ON tri.id = n.n_nationkey""",

    // null text is its own canonical (unknown content ≠ equal content) —
    // mirrored here so the oracle can't lump all null-text docs into one
    // NULL partition and mark all but one as duplicates
    "q18_dedup_exact" ->
      """SELECT doc_id,
           CASE WHEN text IS NULL THEN doc_id
                ELSE min(doc_id) OVER (PARTITION BY md5(lower(regexp_replace(text, '^\s+|\s+$', '', 'g'))))
           END AS canonical_id,
           CASE WHEN text IS NULL THEN FALSE
                ELSE doc_id <>
                  min(doc_id) OVER (PARTITION BY md5(lower(regexp_replace(text, '^\s+|\s+$', '', 'g'))))
           END AS is_duplicate
         FROM documents""",

    "q19_dedup_jaccard" ->
      """WITH d AS (
           SELECT doc_id,
             list_distinct(string_split_regex(regexp_replace(lower(text), '^\s+|\s+$', '', 'g'), '\s+')) AS sh
           FROM documents WHERE doc_id < 200)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                 len(list_distinct(a.sh || b.sh)), 6) AS jaccard
         FROM d a JOIN d b ON a.doc_id < b.doc_id
         WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
               len(list_distinct(a.sh || b.sh)), 6) >= 0.8""",

    // Hash-family FULL-pipeline oracles (r6): the md5-prefix hashes made
    // every stage SQL-reproducible, so DuckDB replays shingling → hashed
    // sets → minhash signatures → banding → size guards → verification
    // and must emit the IDENTICAL pair list. This closes r5's
    // weakest-green hole: an operator that silently returned nothing now
    // hash-mismatches a nonempty expectation.
    "q20_dedup_minhash" ->
      """WITH d AS (
           SELECT doc_id, string_split_regex(regexp_replace(lower(text), '^\s+|\s+$', '', 'g'), '\s+') AS toks
           FROM documents WHERE text IS NOT NULL),
         shl AS (
           SELECT doc_id,
             CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                  ELSE [array_to_string(toks[i:i+2], ' ')
                        for i in range(1, len(toks) - 1)] END AS sh
           FROM d),
         hv AS (
           SELECT doc_id, list_distinct(list_transform(list_distinct(sh),
             s -> CAST('0x' || substr(md5(s), 1, 12) AS BIGINT)
                  % 2147483647)) AS hv
           FROM shl),
         sig AS (
           SELECT doc_id, hv,
             list_transform(range(16), j -> list_min(list_transform(hv,
               h -> (h * (2*j + 1) + (1099511628211 * (j + 1)) % 2147483647)
                    % 2147483647))) AS sig
           FROM hv),
         banded AS (
           SELECT doc_id, b,
                  array_to_string(sig[4*b + 1 : 4*b + 4], ',') AS bucket
           FROM sig, range(4) t(b)),
         kept AS (
           SELECT b, bucket FROM banded GROUP BY b, bucket
           HAVING count(*) > 1 AND count(*) <= 20000),
         bk AS (SELECT banded.* FROM banded JOIN kept USING (b, bucket)),
         cand AS (
           SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
           FROM bk x JOIN bk y
             ON x.b = y.b AND x.bucket = y.bucket AND x.doc_id < y.doc_id),
         scored AS (
           SELECT id_a, id_b,
             CAST(len(list_intersect(a.hv, b.hv)) AS DOUBLE) /
               len(list_distinct(a.hv || b.hv)) AS j
           FROM cand JOIN hv a ON a.doc_id = cand.id_a
                     JOIN hv b ON b.doc_id = cand.id_b)
         SELECT id_a, id_b, round(j, 6) AS jaccard
         FROM scored WHERE j >= 0.7""",

    // same base-31 Horner over md5-derived token hashes, SQL-exact
    "q24_fingerprint_rolling" ->
      """SELECT doc_id,
           CAST(list_reduce(
             list_prepend('0', string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')),
             (acc, t) -> CAST((CAST(acc AS BIGINT) * 31 +
                CAST('0x' || substr(md5(t), 1, 12) AS BIGINT) % 2147483647)
                % 2147483647 AS VARCHAR)) AS BIGINT) AS fp_roll
         FROM documents""",

    // Brute-force all-pairs Hamming ≤ 3 over independently recomputed
    // signatures (md5-prefix token hashes, per-bit majority, hi/lo
    // 32-bit halves so no 64-bit literal can overflow) — equals the
    // operator's banded output because 4×16-bit blocking GUARANTEES
    // recall at distance ≤ 3 (pigeonhole).
    "q21_dedup_simhash" ->
      """WITH d AS (
           SELECT doc_id,
             CASE WHEN text IS NULL THEN CAST([] AS VARCHAR[])
                  ELSE string_split_regex(regexp_replace(lower(text), '^\s+|\s+$', '', 'g'), '\s+') END
               AS toks
           FROM documents),
         h AS (
           SELECT doc_id,
             list_transform(toks,
               t -> CAST('0x' || substr(md5(t), 1, 8) AS BIGINT)) AS his,
             list_transform(toks,
               t -> CAST('0x' || substr(md5(t), 9, 8) AS BIGINT)) AS los
           FROM d),
         sig AS (
           SELECT doc_id,
             CAST(coalesce(list_sum(list_transform(range(32), b ->
               CASE WHEN 2 * list_sum(list_transform(his, x -> (x >> b) & 1))
                         > len(his)
                    THEN CAST(1 AS BIGINT) << b ELSE 0 END)), 0) AS BIGINT)
               AS hi_sig,
             CAST(coalesce(list_sum(list_transform(range(32), b ->
               CASE WHEN 2 * list_sum(list_transform(los, x -> (x >> b) & 1))
                         > len(los)
                    THEN CAST(1 AS BIGINT) << b ELSE 0 END)), 0) AS BIGINT)
               AS lo_sig
           FROM h)
         SELECT id_a, id_b, CAST(dist AS BIGINT) AS dist FROM (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             bit_count(xor(a.hi_sig, b.hi_sig)) +
             bit_count(xor(a.lo_sig, b.lo_sig)) AS dist
           FROM sig a JOIN sig b ON a.doc_id < b.doc_id)
         WHERE dist <= 3""",

    "q27_sim_lsh" -> q27OracleSql,

    // Cardinality identity: the operator must return EXACTLY queries×k
    // rows (plus zero violation rows and zero recall-floor rows). The
    // oracle derives that count by RUNNING the brute-force top-k scan
    // (each query has >= k non-self candidates, so the count is
    // queries×k) — a timed baseline, so bench_vs_baseline compares the
    // IVF pipeline against the exact scan it approximates instead of a
    // 2 ms constant row.
    "q56_ivf_ann" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
                    FROM embeddings WHERE vec_id < 20),
         c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS cv
               FROM embeddings),
         s AS (SELECT qid, nid, list_cosine_similarity(qv, cv) AS cos
               FROM q JOIN c ON qid <> nid),
         r AS (SELECT qid, nid, row_number() OVER (PARTITION BY qid
                 ORDER BY cos DESC, nid ASC) AS rank
               FROM s),
         topk AS (SELECT qid, nid FROM r WHERE rank <= 5)
         SELECT CAST(-1 AS BIGINT) AS query_id,
                CAST((SELECT count(*) FROM topk) AS BIGINT) AS neighbor_id,
                CAST(-1 AS BIGINT) AS rank,
                CAST(NULL AS DOUBLE) AS cosine""",

    "q22_text_stats" ->
      """SELECT doc_id,
           CASE WHEN len(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0 THEN 0
                ELSE len(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) END
             AS n_tokens,
           round(CASE WHEN len(text) = 0 THEN 0.0 ELSE
             CAST(len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g'))
               AS DOUBLE) / len(text) END, 6) AS punct_ratio,
           round(CASE WHEN len(string_split_regex(regexp_replace(lower(text), '^\s+|\s+$', '', 'g'), '\s+')) = 0
             THEN 0.0 ELSE
             CAST(len(list_filter(string_split_regex(regexp_replace(lower(text), '^\s+|\s+$', '', 'g'), '\s+'),
               x -> list_contains(['and','das','de5','der','des','die','ein',
                 'el','es','et','he2','is','ist','la','las','le','le5','les',
                 'los','of','shi4','the','to','un','una','und','with','y',
                 'you3','zai4'], x))) AS DOUBLE) /
             len(string_split_regex(regexp_replace(lower(text), '^\s+|\s+$', '', 'g'), '\s+')) END, 6)
             AS stopword_ratio,
           (SELECT CASE WHEN max(hits) = 0 THEN 'und'
                   ELSE first(lang ORDER BY hits DESC, lang DESC) END
            FROM (SELECT unnest(['de','en','es','fr','zh']) AS lang,
                         unnest([
             len(list_intersect(list_distinct(string_split_regex(regexp_replace(lower(documents.text), '^\s+|\s+$', '', 'g'), '\s+')),
                 ['der','die','das','und','ein','ist'])),
             len(list_intersect(list_distinct(string_split_regex(regexp_replace(lower(documents.text), '^\s+|\s+$', '', 'g'), '\s+')),
                 ['the','and','of','to','is','with'])),
             len(list_intersect(list_distinct(string_split_regex(regexp_replace(lower(documents.text), '^\s+|\s+$', '', 'g'), '\s+')),
                 ['el','los','las','una','es','y'])),
             len(list_intersect(list_distinct(string_split_regex(regexp_replace(lower(documents.text), '^\s+|\s+$', '', 'g'), '\s+')),
                 ['le','la','et','les','des','un'])),
             len(list_intersect(list_distinct(string_split_regex(regexp_replace(lower(documents.text), '^\s+|\s+$', '', 'g'), '\s+')),
                 ['de5','shi4','le5','zai4','he2','you3']))]) AS hits))
             AS lang_guess
         FROM documents""",

    "q23_fingerprint" ->
      """SELECT doc_id, md5(lower(regexp_replace(text, '^\s+|\s+$', '',
           'g'))) AS fp_md5 FROM documents""",

    "q25_sim_topk" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
                    FROM embeddings WHERE vec_id < 20),
         c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS cv
               FROM embeddings),
         s AS (SELECT qid, nid, list_cosine_similarity(qv, cv) AS cos
               FROM q JOIN c ON qid <> nid),
         r AS (SELECT qid AS query_id, nid AS neighbor_id,
                 row_number() OVER (PARTITION BY qid
                   ORDER BY cos DESC, nid ASC) AS rank,
                 round(cos, 6) AS cosine
               FROM s)
         SELECT query_id, neighbor_id, rank, cosine FROM r WHERE rank <= 5""",

    "q26_sim_pairs" ->
      """WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
                    FROM embeddings WHERE vec_id < 300)
         SELECT x.id AS id_a, y.id AS id_b,
           round(list_cosine_similarity(x.v, y.v), 6) AS cosine
         FROM e x JOIN e y ON x.id < y.id
         WHERE list_cosine_similarity(x.v, y.v) >= 0.35""",

    "q49_embed_dedup_groups" ->
      """WITH RECURSIVE e AS (
           SELECT vec_id AS id, embedding::DOUBLE[] AS v
           FROM embeddings WHERE vec_id < 300),
         pr AS (
           SELECT x.id AS ia, y.id AS ib
           FROM e x JOIN e y ON x.id < y.id
           WHERE list_cosine_similarity(x.v, y.v) >= 0.35),
         und(a, b) AS (SELECT ia, ib FROM pr UNION SELECT ib, ia FROM pr),
         r(a, b) AS (
           SELECT id, id FROM e
           UNION
           SELECT r.a, und.b FROM r JOIN und ON r.b = und.a)
         SELECT CAST(a AS BIGINT) AS id, CAST(min(b) AS BIGINT) AS canonical_id,
                a <> min(b) AS is_duplicate
         FROM r GROUP BY a""",

    "q28_multimodal" ->
      """SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS byte_len,
           CAST(CASE WHEN greatest((doc_id % 100) + 20, ((doc_id * 7) % 80) + 20) <= 64
             THEN (doc_id % 100) + 20
             ELSE round(((doc_id % 100) + 20) * 64.0 /
               greatest((doc_id % 100) + 20, ((doc_id * 7) % 80) + 20)) END
             AS INTEGER) AS width,
           CAST(CASE WHEN greatest((doc_id % 100) + 20, ((doc_id * 7) % 80) + 20) <= 64
             THEN ((doc_id * 7) % 80) + 20
             ELSE round((((doc_id * 7) % 80) + 20) * 64.0 /
               greatest((doc_id % 100) + 20, ((doc_id * 7) % 80) + 20)) END
             AS INTEGER) AS height
         FROM documents""",

    // the oracle predicts the decoded features from the PNG generator's
    // arguments — Spark must actually parse the PNG to agree
    "q88_png_decode" ->
      """SELECT doc_id,
           CAST(8 + doc_id % 16 AS INTEGER) AS width,
           CAST(8 + doc_id % 12 AS INTEGER) AS height,
           CAST(doc_id % 256 AS DOUBLE) AS mean_gray,
           true AS decoded_ok
         FROM documents""",

    "q29_events_window" ->
      """SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
           count(*) AS n,
           round(sum(value), 2) AS sum_value,
           round(avg(value), 4) AS avg_value
         FROM events GROUP BY 1, 2""",

    "q30_sessionize" ->
      """SELECT user_id,
           CAST(1 + sum(CASE WHEN gap_ms > 1800000 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_sessions
         FROM (SELECT user_id,
                 epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap_ms
               FROM events)
         GROUP BY user_id""",

    "q63_chunk_windows" ->
      """WITH toks AS (
           SELECT doc_id,
             -- null text = empty text (one empty chunk), mirroring
             -- chunkTokens' explicit isNull branch — without it NULL
             -- falls through to string_split_regex(NULL) and the chunk
             -- md5 becomes NULL instead of md5('')
             CASE WHEN text IS NULL OR len(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0 THEN []
                  ELSE string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') END AS arr
           FROM documents),
         chunks AS (
           SELECT doc_id, arr,
             unnest(range(0, CAST(greatest(1,
               ceil((len(arr) - 64) / 48.0) + 1) AS BIGINT))) AS chunk_idx
           FROM toks)
         SELECT doc_id, chunk_idx,
           md5(CASE WHEN len(arr) = 0 THEN ''
             ELSE array_to_string(
               list_slice(arr, chunk_idx*48 + 1, chunk_idx*48 + 64), ' ')
             END) AS chunk_md5
         FROM chunks""",

    "q62_sequence_pack" ->
      """WITH toks AS (
           SELECT doc_id,
             CASE WHEN len(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0 THEN 0
                  ELSE len(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) END
               AS n_tokens,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
               AS UBIGINT) % 8 AS shard
           FROM documents),
         packed AS (
           SELECT shard, n_tokens,
             sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) - n_tokens AS start_off
           FROM toks)
         SELECT CAST(shard AS BIGINT) AS shard,
           CAST(floor(start_off / 2000.0) AS BIGINT) AS block,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS block_tokens
         FROM packed GROUP BY 1, 2""",

    // the oracle recomputes the hash-mod split — same md5, same buckets
    "q61_train_test_split" ->
      """SELECT CASE WHEN doc_id IS NULL THEN NULL
             WHEN CAST(('0x' ||
             substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
             % 100 < 20 THEN 'test' ELSE 'train' END AS split,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN len(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0 THEN 0
                ELSE len(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) END)
             AS BIGINT) AS total_tokens
         FROM documents GROUP BY 1""",

    // RE2 (DuckDB) lacks the lookarounds the Spark splitter uses, so the
    // oracle inserts boundary spaces instead — same token count
    "q60_subword_tokens" ->
      """SELECT doc_id,
           CASE WHEN len(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0 THEN 0
                ELSE len(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) END
             AS n_tokens,
           CASE WHEN len(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0 THEN 0
                ELSE len(string_split_regex(regexp_replace(
                  regexp_replace(regexp_replace(text,
                    '([a-zA-Z])([0-9])', '\1 \2', 'g'),
                    '([0-9])([a-zA-Z])', '\1 \2', 'g'),
                  '^\s+|\s+$', '', 'g'), '\s+')) END
             AS n_subwords
         FROM documents""",

    // Gopher repetition rules replayed in SQL: the same token→newline
    // remap, then line lists / word n-gram lists via list lambdas and
    // the top-2-gram by (count desc, gram asc) per document
    "q71_repetition" ->
      """WITH docs AS (
           SELECT doc_id,
                  replace(coalesce(text, ''), ' batch ', chr(10)) AS text
           FROM documents),
         base AS (
           SELECT doc_id,
             list_filter(list_transform(string_split_regex(text, '\r?\n'),
               x -> trim(x)), x -> length(x) > 0) AS ls,
             CASE WHEN length(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0 THEN CAST([] AS VARCHAR[])
                  ELSE string_split_regex(regexp_replace(lower(text), '^\s+|\s+$', '', 'g'), '\s+') END AS ws
           FROM docs),
         m AS (
           SELECT doc_id, ls, ws,
             CASE WHEN len(ws) < 5 THEN CAST([] AS VARCHAR[])
                  ELSE list_transform(range(1, len(ws) - 3),
                    i -> array_to_string(ws[i:i+4], ' ')) END AS g5,
             CASE WHEN len(ws) < 2 THEN CAST([] AS VARCHAR[])
                  ELSE list_transform(range(1, len(ws)),
                    i -> array_to_string(ws[i:i+1], ' ')) END AS g2
           FROM base),
         cnts AS (
           SELECT doc_id, g, count(*) AS cnt
           FROM (SELECT doc_id, unnest(g2) AS g FROM m) GROUP BY 1, 2),
         top AS (
           SELECT doc_id, cnt * length(g) AS topchars FROM (
             SELECT doc_id, g, cnt, row_number() OVER (PARTITION BY doc_id
               ORDER BY cnt DESC, g) AS rn FROM cnts)
           WHERE rn = 1)
         SELECT m.doc_id AS doc_id,
           CAST(len(ls) AS BIGINT) AS n_lines,
           round(CASE WHEN len(ls) = 0 THEN 0.0
             ELSE 1.0 - CAST(len(list_distinct(ls)) AS DOUBLE) / len(ls)
             END, 6) AS dup_line_frac,
           round(CASE WHEN coalesce(list_sum(list_transform(ls,
               x -> length(x))), 0) = 0 THEN 0.0
             ELSE 1.0 - CAST(list_sum(list_transform(list_distinct(ls),
               x -> length(x))) AS DOUBLE)
               / list_sum(list_transform(ls, x -> length(x)))
             END, 6) AS dup_line_char_frac,
           round(CASE WHEN len(g5) = 0 THEN 0.0
             ELSE 1.0 - CAST(len(list_distinct(g5)) AS DOUBLE) / len(g5)
             END, 6) AS dup_5gram_frac,
           round(CASE WHEN length(array_to_string(ws, ' ')) = 0
               OR top.topchars IS NULL THEN 0.0
             ELSE CAST(top.topchars AS DOUBLE)
               / length(array_to_string(ws, ' '))
             END, 6) AS top_2gram_char_frac
         FROM m LEFT JOIN top ON m.doc_id = top.doc_id""",

    // C4 filter signals on the token→'.\n' remap (sentence-final lines
    // exist); booleans are vacuously false on this corpus but the
    // fractions value-check the line machinery
    "q72_c4_filters" ->
      """WITH docs AS (
           SELECT doc_id,
                  replace(coalesce(text, ''), ' join ',
                    '.' || chr(10)) AS text
           FROM documents),
         base AS (
           SELECT doc_id, text,
             list_filter(list_transform(string_split_regex(text, '\r?\n'),
               x -> trim(x)), x -> length(x) > 0) AS ls,
             CASE WHEN length(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0 THEN CAST([] AS VARCHAR[])
                  ELSE string_split_regex(regexp_replace(lower(text), '^\s+|\s+$', '', 'g'), '\s+') END AS ws
           FROM docs)
         SELECT doc_id,
           CAST(len(ls) AS BIGINT) AS n_lines,
           round(CASE WHEN len(ls) = 0 THEN 0.0
             ELSE CAST(len(list_filter(ls,
               l -> regexp_matches(l, '[.!?"'']$'))) AS DOUBLE) / len(ls)
             END, 6) AS terminal_punct_line_frac,
           contains(lower(text), 'lorem ipsum') AS has_lorem,
           contains(text, '{') AS has_brace,
           round(CASE WHEN len(ls) = 0 THEN 0.0
             ELSE CAST(len(ws) AS DOUBLE) / len(ls) END, 6)
             AS mean_words_per_line
         FROM base""",

    // the oracle rebuilds both gram sets from the same hash-bucket split
    // and replays the broadcast-semi-join count as a plain left join
    "q73_decontaminate" ->
      """WITH b AS (
           SELECT doc_id, text,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
               AS UBIGINT) % 100 AS bk
           FROM documents),
         w AS (
           SELECT doc_id, bk,
             CASE WHEN length(regexp_replace(coalesce(text, ''), '^\s+|\s+$', '', 'g')) = 0
                  THEN CAST([] AS VARCHAR[])
                  ELSE string_split_regex(regexp_replace(lower(text), '^\s+|\s+$', '', 'g'), '\s+') END AS ws
           FROM b),
         g AS (
           SELECT doc_id, bk,
             CASE WHEN len(ws) < 4 THEN CAST([] AS VARCHAR[])
                  ELSE list_distinct(list_transform(range(1, len(ws) - 2),
                    i -> array_to_string(ws[i:i+3], ' '))) END AS gs
           FROM w),
         bench AS (SELECT DISTINCT unnest(gs) AS gram FROM g WHERE bk < 5),
         corp AS (SELECT doc_id, gs FROM g WHERE bk >= 5),
         cg AS (SELECT doc_id, unnest(gs) AS gram FROM corp),
         hits AS (
           SELECT cg.doc_id AS doc_id, count(*) AS n_grams,
             sum(CASE WHEN bench.gram IS NOT NULL THEN 1 ELSE 0 END)
               AS n_contaminated
           FROM cg LEFT JOIN bench USING (gram) GROUP BY 1)
         SELECT corp.doc_id AS doc_id,
           CAST(coalesce(hits.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(coalesce(hits.n_contaminated, 0) AS BIGINT)
             AS n_contaminated,
           coalesce(hits.n_contaminated, 0) > 0 AS contaminated
         FROM corp LEFT JOIN hits USING (doc_id)""",

    // cross-document duplicated spans: same tokenize/5-gram build as the
    // engine, doc-frequency >= 2 marks a position, runs via the classic
    // pos - row_number() grouping — the whole pipeline replays in SQL
    "q94_duplicated_spans" ->
      """WITH w AS (
           SELECT doc_id,
             CASE WHEN length(regexp_replace(coalesce(text, ''), '^\s+|\s+$', '', 'g')) = 0
                  THEN CAST([] AS VARCHAR[])
                  ELSE string_split_regex(regexp_replace(lower(text), '^\s+|\s+$', '', 'g'), '\s+') END AS ws
           FROM documents),
         g AS (
           SELECT doc_id,
             CASE WHEN len(ws) < 5 THEN CAST([] AS VARCHAR[])
                  ELSE list_transform(range(1, len(ws) - 3),
                    i -> array_to_string(ws[i:i+4], ' ')) END AS gs
           FROM w),
         gp AS (
           SELECT doc_id, unnest(range(1, len(gs) + 1)) AS pos,
                  unnest(gs) AS gram
           FROM g WHERE len(gs) > 0),
         pd AS (SELECT DISTINCT doc_id, gram FROM gp),
         dup AS (SELECT gram FROM pd GROUP BY gram HAVING count(*) >= 2),
         fl AS (
           SELECT gp.doc_id AS doc_id, gp.pos AS pos,
                  dup.gram IS NOT NULL AS d
           FROM gp LEFT JOIN dup USING (gram)),
         dp AS (
           SELECT doc_id, pos - row_number()
                    OVER (PARTITION BY doc_id ORDER BY pos) AS grp
           FROM fl WHERE d),
         mx AS (
           SELECT doc_id, max(r) AS max_dup_run FROM
             (SELECT doc_id, grp, count(*) AS r FROM dp GROUP BY 1, 2)
           GROUP BY 1),
         agg AS (
           SELECT doc_id, count(*) AS n_grams,
                  sum(CASE WHEN d THEN 1 ELSE 0 END) AS dup_grams
           FROM fl GROUP BY 1)
         SELECT d.doc_id AS doc_id,
           CAST(coalesce(agg.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(coalesce(agg.dup_grams, 0) AS BIGINT) AS dup_grams,
           CAST(coalesce(mx.max_dup_run, 0) AS BIGINT) AS max_dup_run,
           CASE WHEN coalesce(agg.n_grams, 0) = 0 THEN 0.0
                ELSE round(CAST(agg.dup_grams AS DOUBLE) / agg.n_grams, 6)
           END AS dup_frac
         FROM documents d
         LEFT JOIN agg USING (doc_id) LEFT JOIN mx USING (doc_id)""",

    // q73's split replayed through the Bloom bit set: every bit position
    // is the same md5 scheme as CountMin, so the filter — and therefore
    // every per-doc maybe-count, false positives included — replays
    // exactly
    "q95_bloom_decontaminate" ->
      """WITH b AS (
           SELECT doc_id, text,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
               AS UBIGINT) % 100 AS bk
           FROM documents),
         w AS (
           SELECT doc_id, bk,
             CASE WHEN length(regexp_replace(coalesce(text, ''), '^\s+|\s+$', '', 'g')) = 0
                  THEN CAST([] AS VARCHAR[])
                  ELSE string_split_regex(regexp_replace(lower(text), '^\s+|\s+$', '', 'g'), '\s+') END AS ws
           FROM b),
         g AS (
           SELECT doc_id, bk,
             CASE WHEN len(ws) < 4 THEN CAST([] AS VARCHAR[])
                  ELSE list_distinct(list_transform(range(1, len(ws) - 2),
                    i -> array_to_string(ws[i:i+3], ' '))) END AS gs
           FROM w),
         bench AS (SELECT DISTINCT unnest(gs) AS gram FROM g WHERE bk < 5),
         -- bloom positions: the four 32-bit fields of ONE md5 digest
         -- (hex offsets 1/9/17/25), mod m — the engine's bloomPos scheme
         bits AS (
           SELECT DISTINCT CAST('0x' || substr(md5(gram), 1 + 8 * t.i, 8)
             AS BIGINT) % 65536 AS pos
           FROM bench, range(4) t(i)),
         corp AS (SELECT doc_id, gs FROM g WHERE bk >= 5),
         cg AS (SELECT doc_id, unnest(gs) AS gram FROM corp),
         qp AS (
           SELECT doc_id, gram, CAST('0x' || substr(md5(gram), 1 + 8 * t.i,
             8) AS BIGINT) % 65536 AS pos
           FROM cg, range(4) t(i)),
         hit AS (
           SELECT qp.doc_id AS doc_id, qp.gram AS gram,
             min(CASE WHEN bits.pos IS NOT NULL THEN 1 ELSE 0 END) AS allhit
           FROM qp LEFT JOIN bits USING (pos) GROUP BY 1, 2),
         agg AS (
           SELECT doc_id, count(*) AS n_grams, sum(allhit) AS n_maybe
           FROM hit GROUP BY 1)
         SELECT corp.doc_id AS doc_id,
           CAST(coalesce(agg.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(coalesce(agg.n_maybe, 0) AS BIGINT)
             AS n_maybe_contaminated,
           coalesce(agg.n_maybe, 0) > 0 AS contaminated
         FROM corp LEFT JOIN agg USING (doc_id)""",

    // same token remap, same RE2-and-Java-compatible patterns, 'g' flag
    // to match Spark's replace-all regexp_replace
    "q74_pii_redact" ->
      """WITH remap AS (
           SELECT doc_id,
             replace(replace(text, ' data ', ' bob@example.com '),
               ' scan ', ' 10.0.0.1 ') AS text
           FROM documents)
         SELECT doc_id,
           CASE WHEN text IS NULL THEN 0 ELSE CAST(len(regexp_extract_all(
             text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
             AS BIGINT) END AS n_emails,
           CASE WHEN text IS NULL THEN 0 ELSE CAST(len(regexp_extract_all(
             text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
             AS BIGINT) END AS n_ips,
           md5(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]',
             'g'), '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'))
             AS redacted_md5
         FROM remap""",

    // rates derived exactly as mixtureRates does: W per stratum,
    // T = min(W/frac), rate = least(1, frac*T/W); every float literal
    // cast to DOUBLE (DuckDB parses bare decimals as DECIMAL)
    "q75_mixture_sample" ->
      """WITH toks AS (
           SELECT doc_id, lang,
             CASE WHEN len(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0 THEN 0
                  ELSE len(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) END
               AS n_tokens,
             CASE lang WHEN 'en' THEN CAST(0.5 AS DOUBLE)
                  WHEN 'de' THEN CAST(0.125 AS DOUBLE)
                  WHEN 'es' THEN CAST(0.125 AS DOUBLE)
                  WHEN 'fr' THEN CAST(0.125 AS DOUBLE)
                  WHEN 'zh' THEN CAST(0.125 AS DOUBLE) END AS frac
           FROM documents),
         totals AS (
           SELECT lang, frac, sum(CAST(n_tokens AS DOUBLE)) AS w
           FROM toks WHERE frac IS NOT NULL GROUP BY 1, 2
           HAVING sum(CAST(n_tokens AS DOUBLE)) > 0),
         cap AS (SELECT min(w / frac) AS t FROM totals),
         rates AS (
           SELECT lang, least(CAST(1.0 AS DOUBLE), frac * t / w) AS rate
           FROM totals, cap),
         kept AS (
           SELECT tk.doc_id, tk.lang, tk.n_tokens
           FROM toks tk JOIN rates r ON tk.lang = r.lang
           WHERE CAST(CAST(('0x' ||
               substring(md5(CAST(tk.doc_id AS VARCHAR)), 1, 8))
               AS UBIGINT) AS DOUBLE) / CAST(4294967296.0 AS DOUBLE)
             < r.rate)
         SELECT lang, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS kept_tokens
         FROM kept GROUP BY 1""",

    // first occurrence = min (doc, idx) struct per line; reassembly =
    // string_agg ordered by idx — byte-identical to the Spark rebuild
    "q79_line_dedup" ->
      """WITH docs AS (
           SELECT doc_id,
                  replace(coalesce(text, ''), ' batch ', chr(10)) AS text
           FROM documents),
         base AS (
           SELECT doc_id,
             list_filter(list_transform(string_split_regex(text, '\r?\n'),
               x -> trim(x)), x -> length(x) > 0) AS ls
           FROM docs),
         lines AS (
           SELECT doc_id, u.i AS idx, u.l AS l
           FROM (SELECT doc_id,
                   unnest(list_transform(range(1, len(ls) + 1),
                     i -> {'i': i, 'l': ls[i]})) AS u
                 FROM base)),
         firsts AS (
           SELECT l, min(struct_pack(d := doc_id, i := idx)) AS f
           FROM lines GROUP BY l),
         kept AS (
           SELECT lines.doc_id, lines.idx, lines.l
           FROM lines JOIN firsts ON lines.l = firsts.l
           WHERE lines.doc_id = firsts.f.d AND lines.idx = firsts.f.i),
         rebuilt AS (
           SELECT doc_id, count(*) AS n_lines_kept,
                  string_agg(l, chr(10) ORDER BY idx) AS dedup_text
           FROM kept GROUP BY doc_id)
         SELECT d.doc_id AS doc_id,
           CAST(coalesce(r.n_lines_kept, 0) AS BIGINT) AS n_lines_kept,
           md5(coalesce(r.dedup_text, '')) AS dedup_md5
         FROM docs d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id""",

    // ln on both sides (DuckDB's bare log is base 10)
    "q80_unigram_logprob" ->
      """WITH toks AS (
           SELECT doc_id, unnest(
             CASE WHEN length(regexp_replace(coalesce(text, ''), '^\s+|\s+$', '', 'g')) = 0
                  THEN CAST([] AS VARCHAR[])
                  ELSE string_split_regex(regexp_replace(lower(text), '^\s+|\s+$', '', 'g'), '\s+') END)
             AS t
           FROM documents),
         tf AS (SELECT doc_id, t, count(*) AS tf FROM toks GROUP BY 1, 2),
         counts AS (SELECT t, sum(tf) AS c FROM tf GROUP BY t),
         total AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM counts),
         scored AS (
           SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
                  round(sum(CAST(tf AS DOUBLE) *
                      ln(CAST(c AS DOUBLE) / n)) /
                    sum(CAST(tf AS DOUBLE)), 6) AS avg_logprob
           FROM tf JOIN counts USING (t), total GROUP BY doc_id)
         SELECT d.doc_id AS doc_id,
           CAST(coalesce(s.n_tokens, 0) AS BIGINT) AS n_tokens,
           s.avg_logprob AS avg_logprob
         FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id""",

    // same affine map, same operation order; round() is HALF-away-from-
    // zero in both engines on the non-negative scaled values
    "q81_quantize_embeddings" ->
      """WITH e AS (
           SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         r AS (
           SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx FROM e)
         SELECT vec_id,
           round(mn, 6) AS q_min, round(mx, 6) AS q_max,
           md5(array_to_string(
             CASE WHEN mx = mn THEN list_transform(v, x -> 0)
                  ELSE list_transform(v, x -> CAST(round(
                    (x - mn) * 255.0 / (mx - mn)) - 128 AS INTEGER)) END,
             ',')) AS codes_md5
         FROM r""",

    // full replay of the 2-iteration spherical k-means: init = vec_id % 8
    // per-dim means, each recompute rounded to 6 decimals (so both engines
    // assign against bit-identical centroid constants), assignment =
    // highest cosine then lowest centroid id — same tie order as
    // ivfAssign's window
    // full PQ replay: per-subspace kmeans (the q82 pattern with `sub` as
    // an extra grouping column), L2 argmin encode, per-query LUT dots,
    // ADC cosine, rank <= 5. dims=64, m=2 => sub = pos // 32
    "q96_pq_ann" ->
      """WITH emb AS (
           SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         dp AS (
           SELECT vec_id,
                  CAST(unnest(range(len(v))) // 32 AS BIGINT) AS sub,
                  CAST(unnest(range(len(v))) % 32 AS BIGINT) AS pos,
                  unnest(v) AS comp
           FROM emb),
         c0 AS (
           SELECT sub, vec_id % 8 AS cid, pos, round(avg(comp), 6) AS c
           FROM dp GROUP BY 1, 2, 3),
         s1 AS (
           SELECT dp.vec_id, dp.sub, c0.cid,
                  sum((dp.comp - c0.c) * (dp.comp - c0.c)) AS d2
           FROM dp JOIN c0 ON dp.sub = c0.sub AND dp.pos = c0.pos
           GROUP BY 1, 2, 3),
         a1 AS (
           SELECT vec_id, sub, cid FROM (
             SELECT vec_id, sub, cid, row_number() OVER (
               PARTITION BY vec_id, sub ORDER BY d2 ASC, cid ASC) AS rn
             FROM s1) WHERE rn = 1),
         c1 AS (
           SELECT a1.sub, a1.cid, dp.pos, round(avg(dp.comp), 6) AS c
           FROM dp JOIN a1 ON dp.vec_id = a1.vec_id AND dp.sub = a1.sub
           GROUP BY 1, 2, 3),
         s2 AS (
           SELECT dp.vec_id, dp.sub, c1.cid,
                  sum((dp.comp - c1.c) * (dp.comp - c1.c)) AS d2
           FROM dp JOIN c1 ON dp.sub = c1.sub AND dp.pos = c1.pos
           GROUP BY 1, 2, 3),
         code AS (
           SELECT vec_id, sub, cid FROM (
             SELECT vec_id, sub, cid, row_number() OVER (
               PARTITION BY vec_id, sub ORDER BY d2 ASC, cid ASC) AS rn
             FROM s2) WHERE rn = 1),
         cn2 AS (SELECT sub, cid, sum(c * c) AS cn2 FROM c1 GROUP BY 1, 2),
         lut AS (
           SELECT dp.vec_id AS query_id, c1.sub, c1.cid,
                  sum(dp.comp * c1.c) AS d
           FROM dp JOIN c1 ON dp.sub = c1.sub AND dp.pos = c1.pos
           WHERE dp.vec_id < 20 GROUP BY 1, 2, 3),
         qn AS (
           SELECT vec_id AS query_id, sqrt(sum(comp * comp)) AS qn
           FROM dp WHERE vec_id < 20 GROUP BY 1),
         sc AS (
           SELECT lut.query_id, code.vec_id AS neighbor_id,
                  sum(lut.d) AS dot, sum(cn2.cn2) AS rn2
           FROM code
           JOIN lut ON code.sub = lut.sub AND code.cid = lut.cid
           JOIN cn2 ON code.sub = cn2.sub AND code.cid = cn2.cid
           WHERE lut.query_id <> code.vec_id
           GROUP BY 1, 2),
         adc AS (
           SELECT sc.query_id, sc.neighbor_id,
                  CASE WHEN qn.qn * sqrt(sc.rn2) = 0 THEN 0
                       ELSE sc.dot / (qn.qn * sqrt(sc.rn2)) END AS a
           FROM sc JOIN qn ON sc.query_id = qn.query_id)
         SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank,
                round(a, 6) AS adc_cosine
         FROM (
           SELECT query_id, neighbor_id, a, row_number() OVER (
             PARTITION BY query_id ORDER BY a DESC, neighbor_id ASC) AS rn
           FROM adc)
         WHERE rn <= 5""",

    // the q82 coarse chain + the q96 PQ chain, composed: lists prune,
    // codes score. MATERIALIZED where a CTE is referenced down a
    // multiplicative inlining chain (the q112 lesson — DuckDB inlines
    // plain CTEs per reference).
    "q118_ivfpq_ann" ->
      """WITH emb AS MATERIALIZED (
           SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         fd AS MATERIALIZED (
           SELECT vec_id, unnest(range(len(v))) AS pos, unnest(v) AS comp
           FROM emb),
         k0 AS (
           SELECT vec_id % 8 AS cid, pos, round(avg(comp), 6) AS c
           FROM fd GROUP BY 1, 2),
         ks AS (
           SELECT fd.vec_id, k0.cid, sum(fd.comp * k0.c) AS dot,
                  sqrt(sum(fd.comp * fd.comp)) AS nv,
                  sqrt(sum(k0.c * k0.c)) AS nc
           FROM fd JOIN k0 USING (pos) GROUP BY 1, 2),
         ka AS (
           SELECT vec_id, cid FROM (
             SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
               ORDER BY CASE WHEN nv * nc = 0 THEN 0
                             ELSE dot / (nv * nc) END DESC, cid ASC) AS rn
             FROM ks) WHERE rn = 1),
         k1 AS MATERIALIZED (
           SELECT ka.cid, fd.pos, round(avg(fd.comp), 6) AS c
           FROM fd JOIN ka USING (vec_id) GROUP BY 1, 2),
         ls AS MATERIALIZED (
           SELECT fd.vec_id, k1.cid, sum(fd.comp * k1.c) AS dot,
                  sqrt(sum(fd.comp * fd.comp)) AS nv,
                  sqrt(sum(k1.c * k1.c)) AS nc
           FROM fd JOIN k1 USING (pos) GROUP BY 1, 2),
         la AS (
           SELECT vec_id AS neighbor_id, cid FROM (
             SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
               ORDER BY CASE WHEN nv * nc = 0 THEN 0
                             ELSE dot / (nv * nc) END DESC, cid ASC) AS rn
             FROM ls) WHERE rn = 1),
         pr AS (
           SELECT vec_id AS query_id, cid FROM (
             SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
               ORDER BY CASE WHEN nv * nc = 0 THEN 0
                             ELSE dot / (nv * nc) END DESC, cid ASC) AS rn
             FROM ls WHERE vec_id < 20) WHERE rn <= 3),
         cand AS MATERIALIZED (
           SELECT pr.query_id, la.neighbor_id FROM la JOIN pr USING (cid)),
         dp AS MATERIALIZED (
           SELECT vec_id,
                  CAST(unnest(range(len(v))) // 32 AS BIGINT) AS sub,
                  CAST(unnest(range(len(v))) % 32 AS BIGINT) AS pos,
                  unnest(v) AS comp
           FROM emb),
         pc0 AS (
           SELECT sub, vec_id % 8 AS cid, pos, round(avg(comp), 6) AS c
           FROM dp GROUP BY 1, 2, 3),
         ps1 AS (
           SELECT dp.vec_id, dp.sub, pc0.cid,
                  sum((dp.comp - pc0.c) * (dp.comp - pc0.c)) AS d2
           FROM dp JOIN pc0 ON dp.sub = pc0.sub AND dp.pos = pc0.pos
           GROUP BY 1, 2, 3),
         pa1 AS (
           SELECT vec_id, sub, cid FROM (
             SELECT vec_id, sub, cid, row_number() OVER (
               PARTITION BY vec_id, sub ORDER BY d2 ASC, cid ASC) AS rn
             FROM ps1) WHERE rn = 1),
         pc1 AS MATERIALIZED (
           SELECT pa1.sub, pa1.cid, dp.pos, round(avg(dp.comp), 6) AS c
           FROM dp JOIN pa1 ON dp.vec_id = pa1.vec_id AND dp.sub = pa1.sub
           GROUP BY 1, 2, 3),
         ps2 AS (
           SELECT dp.vec_id, dp.sub, pc1.cid,
                  sum((dp.comp - pc1.c) * (dp.comp - pc1.c)) AS d2
           FROM dp JOIN pc1 ON dp.sub = pc1.sub AND dp.pos = pc1.pos
           GROUP BY 1, 2, 3),
         code AS MATERIALIZED (
           SELECT vec_id, sub, cid FROM (
             SELECT vec_id, sub, cid, row_number() OVER (
               PARTITION BY vec_id, sub ORDER BY d2 ASC, cid ASC) AS rn
             FROM ps2) WHERE rn = 1),
         cn2 AS (SELECT sub, cid, sum(c * c) AS cn2 FROM pc1 GROUP BY 1, 2),
         lut AS (
           SELECT dp.vec_id AS query_id, pc1.sub, pc1.cid,
                  sum(dp.comp * pc1.c) AS d
           FROM dp JOIN pc1 ON dp.sub = pc1.sub AND dp.pos = pc1.pos
           WHERE dp.vec_id < 20 GROUP BY 1, 2, 3),
         qn AS (
           SELECT vec_id AS query_id, sqrt(sum(comp * comp)) AS qn
           FROM dp WHERE vec_id < 20 GROUP BY 1),
         sc AS (
           SELECT cand.query_id, code.vec_id AS neighbor_id,
                  sum(lut.d) AS dot, sum(cn2.cn2) AS rn2
           FROM code
           JOIN cand ON cand.neighbor_id = code.vec_id
           JOIN lut ON lut.query_id = cand.query_id
             AND code.sub = lut.sub AND code.cid = lut.cid
           JOIN cn2 ON code.sub = cn2.sub AND code.cid = cn2.cid
           WHERE cand.query_id <> code.vec_id
           GROUP BY 1, 2),
         adc AS (
           SELECT sc.query_id, sc.neighbor_id,
                  CASE WHEN qn.qn * sqrt(sc.rn2) = 0 THEN 0
                       ELSE sc.dot / (qn.qn * sqrt(sc.rn2)) END AS a
           FROM sc JOIN qn ON sc.query_id = qn.query_id)
         SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank,
                round(a, 6) AS adc_cosine
         FROM (
           SELECT query_id, neighbor_id, a, row_number() OVER (
             PARTITION BY query_id ORDER BY a DESC, neighbor_id ASC) AS rn
           FROM adc)
         WHERE rn <= 5""",

    "q82_kmeans_train" ->
      """WITH emb AS (
           SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         dp AS (
           SELECT vec_id, unnest(range(len(v))) AS pos, unnest(v) AS comp
           FROM emb),
         c0 AS (
           SELECT vec_id % 8 AS cid, pos, round(avg(comp), 6) AS c
           FROM dp GROUP BY 1, 2),
         s1 AS (
           SELECT dp.vec_id, c0.cid, sum(dp.comp * c0.c) AS dot,
                  sqrt(sum(dp.comp * dp.comp)) AS nv,
                  sqrt(sum(c0.c * c0.c)) AS nc
           FROM dp JOIN c0 USING (pos) GROUP BY 1, 2),
         a1 AS (
           SELECT vec_id, cid FROM (
             SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
               ORDER BY CASE WHEN nv * nc = 0 THEN 0
                             ELSE dot / (nv * nc) END DESC, cid ASC) AS rn
             FROM s1) WHERE rn = 1),
         c1 AS (
           SELECT a1.cid, dp.pos, round(avg(dp.comp), 6) AS c
           FROM dp JOIN a1 USING (vec_id) GROUP BY 1, 2),
         s2 AS (
           SELECT dp.vec_id, c1.cid, sum(dp.comp * c1.c) AS dot,
                  sqrt(sum(dp.comp * dp.comp)) AS nv,
                  sqrt(sum(c1.c * c1.c)) AS nc
           FROM dp JOIN c1 USING (pos) GROUP BY 1, 2),
         a2 AS (
           SELECT vec_id, cid FROM (
             SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
               ORDER BY CASE WHEN nv * nc = 0 THEN 0
                             ELSE dot / (nv * nc) END DESC, cid ASC) AS rn
             FROM s2) WHERE rn = 1),
         c2 AS (
           SELECT a2.cid, dp.pos, round(avg(dp.comp), 6) AS c
           FROM dp JOIN a2 USING (vec_id) GROUP BY 1, 2),
         s3 AS (
           SELECT dp.vec_id, c2.cid, sum(dp.comp * c2.c) AS dot,
                  sqrt(sum(dp.comp * dp.comp)) AS nv,
                  sqrt(sum(c2.c * c2.c)) AS nc
           FROM dp JOIN c2 USING (pos) GROUP BY 1, 2),
         a3 AS (
           SELECT vec_id, cid,
                  CASE WHEN nv * nc = 0 THEN 0
                       ELSE dot / (nv * nc) END AS cos FROM (
             SELECT vec_id, cid, dot, nv, nc,
                    row_number() OVER (PARTITION BY vec_id
               ORDER BY CASE WHEN nv * nc = 0 THEN 0
                             ELSE dot / (nv * nc) END DESC, cid ASC) AS rn
             FROM s3) WHERE rn = 1)
         SELECT vec_id, CAST(cid AS BIGINT) AS centroid_id,
                round(cos, 6) AS cos_to_centroid
         FROM a3""",

    // naive 3-way-join triangle enumeration over the deduplicated
    // undirected user graph — each triangle (u, a, b) with a < b found
    // once, credited to all three corners
    "q83_triangles" ->
      s"""WITH ${TradeGraph.sqlUserEdges},
         und AS (SELECT DISTINCT src, dst FROM (
           SELECT src, dst FROM user_edges
           UNION ALL SELECT dst, src FROM user_edges)
           WHERE src <> dst),
         tris AS (
           SELECT x.src AS u, x.dst AS a, y.dst AS b
           FROM und x JOIN und y ON x.src = y.src AND x.dst < y.dst
           JOIN und z ON z.src = x.dst AND z.dst = y.dst
           WHERE x.src < x.dst),
         corners AS (SELECT u AS id FROM tris
           UNION ALL SELECT a FROM tris
           UNION ALL SELECT b FROM tris),
         per AS (SELECT id, count(*) AS triangles FROM corners GROUP BY 1)
         SELECT CAST(u.id AS BIGINT) AS id,
                CAST(coalesce(per.triangles, 0) AS BIGINT) AS triangles
         FROM (SELECT DISTINCT user_id AS id FROM events) u
         LEFT JOIN per USING (id)""",

    // mutual reachability from a recursive closure: component(v) = min
    // over v and every u with u→*v and v→*u
    "q85_scc" ->
      s"""WITH RECURSIVE $sqlNationNext,
         mins AS (SELECT n_regionkey, min(n_nationkey) AS m
                  FROM nation GROUP BY 1),
         chain AS (SELECT a.m AS src, b.m AS dst FROM mins a
                   JOIN mins b ON a.n_regionkey + 1 = b.n_regionkey),
         e AS (SELECT src, dst FROM nation_next WHERE src <> dst
               UNION SELECT src, dst FROM chain),
         reach(a, b) AS (
           SELECT src, dst FROM e
           UNION
           SELECT r.a, e.dst FROM reach r JOIN e ON r.b = e.src),
         mutual AS (
           SELECT r1.a AS u, r1.b AS v
           FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a)
         SELECT CAST(n.n_nationkey AS BIGINT) AS id,
           CAST(least(n.n_nationkey, coalesce(min(m.v), n.n_nationkey))
                AS BIGINT) AS component
         FROM nation n LEFT JOIN mutual m ON m.u = n.n_nationkey
         GROUP BY n.n_nationkey""",

    // full sketch replay: same md5-low-32 buckets, same depth×width
    // counters, same min-estimate — collisions and all
    "q84_countmin" ->
      """WITH toks AS (
           SELECT unnest(string_split_regex(
             regexp_replace(lower(text), '^\s+|\s+$', '', 'g'), '\s+'))
             AS token
           FROM documents
           WHERE text IS NOT NULL
             AND len(regexp_replace(text, '^\s+|\s+$', '', 'g')) > 0),
         truth AS (SELECT token, count(*) AS true_cnt FROM toks GROUP BY 1),
         top AS (SELECT token, true_cnt FROM truth
                 ORDER BY true_cnt DESC, token ASC LIMIT 20),
         sk AS (
           SELECT d, CAST('0x' || substr(md5(CAST(d AS VARCHAR) || ':' ||
             token), 9, 8) AS BIGINT) % 32 AS bucket, count(*) AS cnt
           FROM toks, range(4) t(d) GROUP BY 1, 2),
         qb AS (
           SELECT token, d, CAST('0x' || substr(md5(CAST(d AS VARCHAR) ||
             ':' || token), 9, 8) AS BIGINT) % 32 AS bucket
           FROM top, range(4) t(d)),
         est AS (
           SELECT qb.token, min(coalesce(sk.cnt, 0)) AS est
           FROM qb LEFT JOIN sk USING (d, bucket) GROUP BY 1)
         SELECT top.token AS token, CAST(top.true_cnt AS BIGINT) AS true_cnt,
                CAST(est.est AS BIGINT) AS est_cnt
         FROM top JOIN est USING (token)""",

    "q116_countmin_by_group" ->
      """WITH toks AS (
           SELECT source, unnest(string_split_regex(
             regexp_replace(lower(text), '^\s+|\s+$', '', 'g'), '\s+'))
             AS token
           FROM documents
           WHERE text IS NOT NULL
             AND len(regexp_replace(text, '^\s+|\s+$', '', 'g')) > 0),
         truth AS (
           SELECT source, token, count(*) AS true_cnt
           FROM toks GROUP BY 1, 2),
         top AS (
           SELECT source, token, true_cnt FROM truth
           QUALIFY row_number() OVER (
             PARTITION BY source ORDER BY true_cnt DESC, token ASC) <= 3),
         sk AS (
           SELECT source, d, CAST('0x' || substr(md5(CAST(d AS VARCHAR) ||
             ':' || token), 9, 8) AS BIGINT) % 32 AS bucket,
             count(*) AS cnt
           FROM toks, range(4) t(d) GROUP BY 1, 2, 3),
         qb AS (
           SELECT source, token, d, CAST('0x' || substr(md5(CAST(d AS
             VARCHAR) || ':' || token), 9, 8) AS BIGINT) % 32 AS bucket
           FROM top, range(4) t(d)),
         est AS (
           SELECT qb.source, qb.token, min(coalesce(sk.cnt, 0)) AS est
           FROM qb LEFT JOIN sk ON qb.source = sk.source AND qb.d = sk.d
             AND qb.bucket = sk.bucket
           GROUP BY 1, 2)
         SELECT top.source AS source, top.token AS token,
                CAST(top.true_cnt AS BIGINT) AS true_cnt,
                CAST(est.est AS BIGINT) AS est_cnt
         FROM top JOIN est ON top.source = est.source
           AND top.token = est.token""",

    // quantile_cont uses the same (n-1)*p interpolated rank as Spark's
    // exact percentile
    "q78_corpus_profile" ->
      """WITH toks AS (
           SELECT source,
             CASE WHEN len(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0 THEN 0
                  ELSE len(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) END
               AS nt
           FROM documents)
         SELECT source, count(*) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS total_tokens,
           round(quantile_cont(nt, 0.25), 6) AS p25,
           round(quantile_cont(nt, 0.5), 6) AS p50,
           round(quantile_cont(nt, 0.75), 6) AS p75
         FROM toks GROUP BY 1""",

    "q59_corpus_curation" ->
      """WITH canon AS (
           SELECT doc_id, text,
             min(doc_id) OVER (PARTITION BY md5(lower(regexp_replace(text, '^\s+|\s+$', '', 'g'))))
               AS canonical_id
           FROM documents),
         scored AS (
           SELECT doc_id,
             CASE WHEN len(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0 THEN 0
                  ELSE len(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) END
               AS n_tokens,
             round((
               least(CAST(len(text) AS DOUBLE) / 200.0, 1.0)
               + (1.0 - least(5.0 * CASE WHEN len(text) = 0 THEN 0.0 ELSE
                   CAST(len(text) - len(regexp_replace(text,
                     '[[:punct:]]', '', 'g')) AS DOUBLE) / len(text) END,
                   1.0))
               + least(4.0 * CASE
                   WHEN len(string_split_regex(regexp_replace(lower(text), '^\s+|\s+$', '', 'g'), '\s+')) = 0
                   THEN 0.0 ELSE
                   CAST(len(list_filter(
                     string_split_regex(regexp_replace(lower(text), '^\s+|\s+$', '', 'g'), '\s+'),
                     x -> list_contains(['and','das','de5','der','des','die',
                       'ein','el','es','et','he2','is','ist','la','las','le',
                       'le5','les','los','of','shi4','the','to','un','una',
                       'und','with','y','you3','zai4'], x))) AS DOUBLE) /
                   len(string_split_regex(regexp_replace(lower(text), '^\s+|\s+$', '', 'g'), '\s+')) END,
                   1.0)
             ) / 3.0, 6) AS quality
           FROM canon WHERE doc_id = canonical_id)
         SELECT CAST(floor(quality * 10) AS BIGINT) AS q_band,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
         FROM scored WHERE n_tokens >= 5
         GROUP BY 1""",

    "q57_follow_join" ->
      """SELECT a.user_id AS user_id, a.event_id AS view_event,
           b.event_id AS click_event,
           epoch_ms(b.ts) - epoch_ms(a.ts) AS gap_ms
         FROM events a JOIN events b ON a.user_id = b.user_id
           AND a.event_type = 'view' AND b.event_type = 'click'
           AND epoch_ms(b.ts) >= epoch_ms(a.ts)
           AND epoch_ms(b.ts) <= epoch_ms(a.ts) + 1800000""",

    // native ASOF LEFT JOIN — an independent implementation of the
    // as-of semantics (greatest right ts <= left ts per key), with the
    // 1 h tolerance applied as a post-CASE so an out-of-tolerance match
    // nulls out instead of falling back to an older row
    "q100_asof_join" ->
      """WITH p AS (
           SELECT user_id, event_id AS purchase_event, epoch_ms(ts) AS p_ms
           FROM events WHERE event_type = 'purchase'),
         c AS (
           SELECT user_id, epoch_ms(ts) AS c_ms, max(event_id) AS click_event
           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
         j AS (
           SELECT p.user_id, p.purchase_event, p.p_ms, c.click_event, c.c_ms
           FROM p ASOF LEFT JOIN c
             ON p.user_id = c.user_id AND p.p_ms >= c.c_ms)
         SELECT user_id, purchase_event,
           CASE WHEN p_ms - c_ms <= 3600000 THEN click_event END AS click_event,
           CASE WHEN p_ms - c_ms <= 3600000 THEN p_ms - c_ms END AS gap_ms
         FROM j""",

    "q101_range_join" ->
      """WITH ev AS (
           SELECT event_id, epoch_ms(ts) AS ms, value FROM events),
         inc AS (
           SELECT event_id AS incident_event, ms - 600000 AS lo_ms,
                  ms + 600000 AS hi_ms
           FROM ev WHERE value > 150.0)
         SELECT incident_event, count(*) AS n_obs,
                round(sum(p.value), 2) AS sum_value
         FROM inc JOIN ev p ON p.ms BETWEEN lo_ms AND hi_ms
         GROUP BY 1""",

    // full id-sequence replay: same tokenization, same (count DESC,
    // token) vocab ranks, order-sensitive md5 over the id list
    "q108_token_ids" ->
      """WITH base AS (
           SELECT doc_id, regexp_replace(lower(text), '^\s+|\s+$', '', 'g')
             AS lt
           FROM documents WHERE text IS NOT NULL),
         toks AS (
           SELECT doc_id, unnest(string_split_regex(lt, '\s+')) AS token,
                  generate_subscripts(string_split_regex(lt, '\s+'), 1) AS pos
           FROM base WHERE len(lt) > 0),
         cnt AS (SELECT token, count(*) AS n FROM toks GROUP BY 1),
         voc AS (
           SELECT token, row_number() OVER (ORDER BY n DESC, token) - 1
             AS token_id
           FROM cnt QUALIFY row_number() OVER (ORDER BY n DESC, token) <= 20),
         enc AS (
           SELECT toks.doc_id, toks.pos, coalesce(voc.token_id, -1) AS tid
           FROM toks LEFT JOIN voc ON toks.token = voc.token),
         agg AS (
           SELECT doc_id, count(*) AS n_tokens,
             CAST(sum(CASE WHEN tid = -1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
             md5(string_agg(CAST(tid AS VARCHAR), ',' ORDER BY pos))
               AS ids_md5
           FROM enc GROUP BY 1)
         SELECT d.doc_id, coalesce(a.n_tokens, 0) AS n_tokens,
                coalesce(a.n_oov, 0) AS n_oov,
                coalesce(a.ids_md5, md5('')) AS ids_md5
         FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id""",

    // the q86 register replay grouped by event_type: every register,
    // the grouped-by-rho float discipline, and the linear-counting branch
    "q110_hll_by_group" ->
      """WITH h AS (
           SELECT event_type AS grp,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
               AS BIGINT) AS hi,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 9, 8)
               AS BIGINT) AS lo,
             user_id
           FROM events WHERE user_id IS NOT NULL),
         regs AS (
           SELECT grp, lo % 256 AS idx,
             max(CASE WHEN (hi << 24) + (lo >> 8) = 0 THEN 57
                      ELSE 57 - len(bin((hi << 24) + (lo >> 8))) END) AS rho
           FROM h GROUP BY 1, 2),
         byrho AS (
           SELECT grp, rho, CAST(count(*) AS DOUBLE) AS cnt
           FROM regs GROUP BY 1, 2),
         sums AS (
           SELECT grp, CAST(coalesce(sum(cnt), 0) AS BIGINT) AS nonzero_regs,
             (256.0 - coalesce(sum(cnt), 0))
               + coalesce(sum(cnt * pow(2.0, -rho)), 0) AS sum_inv
           FROM byrho GROUP BY 1),
         est0 AS (
           SELECT grp, nonzero_regs, sum_inv,
             256 - nonzero_regs AS zero_regs,
             (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 / sum_inv AS est_raw
           FROM sums),
         ex AS (
           SELECT grp, count(DISTINCT user_id) AS exact_distinct
           FROM h GROUP BY 1)
         SELECT est0.grp AS event_type, nonzero_regs,
           round(sum_inv, 6) AS sum_inv,
           round(CASE WHEN est_raw <= 640.0 AND zero_regs > 0
                 THEN 256.0 * ln(256.0 / zero_regs) ELSE est_raw END, 4)
             AS est,
           ex.exact_distinct
         FROM est0 JOIN ex ON est0.grp = ex.grp""",

    // exact full-column quantile_disc ranks (no sample draw)
    "q120_exact_quantiles" ->
      """WITH r AS (
           SELECT CAST(n_chars AS DOUBLE) AS v,
                  row_number() OVER (ORDER BY CAST(n_chars AS DOUBLE)) AS rn,
                  count(*) OVER () AS n
           FROM documents WHERE n_chars IS NOT NULL)
         SELECT p.prob, r.v AS value, r.n AS n_total
         FROM (VALUES (CAST(0.1 AS DOUBLE)), (CAST(0.5 AS DOUBLE)),
                      (CAST(0.9 AS DOUBLE)), (CAST(0.99 AS DOUBLE)))
           p(prob)
         JOIN r ON CAST(ceil(p.prob * r.n) AS BIGINT) = r.rn""",

    // the deterministic md5 draw + quantile_disc ranks, replayed
    "q109_sample_quantiles" ->
      """WITH s AS (
           SELECT CAST(n_chars AS DOUBLE) AS v FROM documents
           WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
             AND CAST(CAST(('0x' ||
                 substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
               AS UBIGINT) AS DOUBLE) / CAST(4294967296.0 AS DOUBLE) < 0.2),
         r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn,
                      count(*) OVER () AS n FROM s)
         SELECT p.prob, r.v AS value, r.n AS n_sample
         FROM (VALUES (CAST(0.25 AS DOUBLE)), (CAST(0.5 AS DOUBLE)),
                      (CAST(0.75 AS DOUBLE)), (CAST(0.9 AS DOUBLE)))
           p(prob)
         JOIN r ON CAST(ceil(p.prob * r.n) AS BIGINT) = r.rn""",

    // the mirrored native ASOF: earliest right >= left per key
    "q106_asof_forward" ->
      """WITH c AS (
           SELECT user_id, event_id AS click_event, epoch_ms(ts) AS c_ms
           FROM events WHERE event_type = 'click'),
         p AS (
           SELECT user_id, epoch_ms(ts) AS p_ms, max(event_id) AS purchase_event
           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
         j AS (
           SELECT c.user_id, c.click_event, c.c_ms, p.purchase_event, p.p_ms
           FROM c ASOF LEFT JOIN p
             ON c.user_id = p.user_id AND c.c_ms <= p.p_ms)
         SELECT user_id, click_event,
           CASE WHEN p_ms - c_ms <= 7200000 THEN purchase_event END
             AS purchase_event,
           CASE WHEN p_ms - c_ms <= 7200000 THEN p_ms - c_ms END AS lead_ms
         FROM j""",

    "q107_overlap_join" ->
      """WITH ev AS (
           SELECT event_id, epoch_ms(ts) AS ms, value, event_type FROM events),
         inc AS (
           SELECT event_id AS incident_event, ms - 600000 AS ilo,
                  ms + 600000 AS ihi
           FROM ev WHERE value > 150.0),
         err AS (
           SELECT event_id AS error_event, ms - 300000 AS elo,
                  ms + 300000 AS ehi
           FROM ev WHERE event_type = 'error')
         SELECT incident_event, error_event,
                greatest(ilo, elo) AS olap_from, least(ihi, ehi) AS olap_to
         FROM inc JOIN err ON ilo <= ehi AND elo <= ihi""",

    // brute-force all-pairs levenshtein — the quadratic formulation our
    // PassJoin blocking must reproduce exactly (zero false negatives).
    // ASCII projection on both sides: DuckDB levenshtein is byte-based,
    // Spark's is code-point-based — they agree only on ASCII
    "q102_fuzzy_join" ->
      """WITH h AS (
           SELECT doc_id,
                  substr(regexp_replace(
                    regexp_replace(text, '[^\x20-\x7E]', '', 'g'),
                    '^ +', ''), 1, 40) AS head
           FROM documents WHERE text IS NOT NULL)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                levenshtein(a.head, b.head) AS dist
         FROM h a JOIN h b
           ON a.doc_id < b.doc_id AND levenshtein(a.head, b.head) <= 2""",

    // full HLL replay: same md5 halves, same register index / rank-field
    // split, same max-rho registers (checksummed), same bias-corrected
    // estimate from literal-identical IEEE arithmetic
    "q86_hll" ->
      """WITH toks AS (
           SELECT unnest(string_split_regex(
             regexp_replace(lower(text), '^\s+|\s+$', '', 'g'), '\s+'))
             AS token
           FROM documents
           WHERE text IS NOT NULL
             AND len(regexp_replace(text, '^\s+|\s+$', '', 'g')) > 0),
         h AS (
           SELECT CAST('0x' || substr(md5(token), 1, 8) AS BIGINT) AS hi,
                  CAST('0x' || substr(md5(token), 9, 8) AS BIGINT) AS lo
           FROM toks),
         regs AS (
           SELECT lo % 256 AS idx,
             max(CASE WHEN (hi << 24) + (lo >> 8) = 0 THEN 57
                      ELSE 57 - len(bin((hi << 24) + (lo >> 8))) END) AS rho
           FROM h GROUP BY 1),
         byrho AS (
           SELECT rho, CAST(count(*) AS DOUBLE) AS cnt FROM regs GROUP BY 1),
         sums AS (
           SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) AS nonzero_regs,
             (256.0 - coalesce(sum(cnt), 0))
               + coalesce(sum(cnt * pow(2.0, -rho)), 0) AS sum_inv
           FROM byrho),
         chk AS (
           SELECT md5(string_agg(idx || ':' || rho, ',' ORDER BY idx))
             AS regs_md5 FROM regs),
         est0 AS (
           SELECT nonzero_regs, sum_inv, regs_md5,
             256 - nonzero_regs AS zero_regs,
             (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 / sum_inv AS est_raw
           FROM sums, chk)
         SELECT CAST(256 AS BIGINT) AS m, nonzero_regs,
           CAST(zero_regs AS BIGINT) AS zero_regs,
           round(sum_inv, 6) AS sum_inv,
           round(est_raw, 4) AS est_raw,
           round(CASE WHEN est_raw <= 640.0 AND zero_regs > 0
                 THEN 256.0 * ln(256.0 / zero_regs) ELSE est_raw END, 4)
             AS est,
           regs_md5,
           (SELECT count(DISTINCT token) FROM toks) AS exact_distinct
         FROM est0""",

    // SemDeDup at the derived k (ceil(n / 1e4) = 1 at oracle scale):
    // one cluster ⇒ centroid_id ≡ 0 and the dedup rule is the exact
    // pairwise search, zero-norm guarded like Spark's cosinePre
    // Replays semanticDedup EXACTLY at any scale: k derived as
    // ceil(n / 10000) (the operator's targetBucket rule), the 1-iter
    // spherical k-means in the q82 oracle's style (id-mod init, rounded
    // centroids, cosine-argmax assignment with smallest-cid ties), then
    // the min-id duplicate rule WITHIN each cluster — the SemDeDup
    // contract, which deliberately diverges from all-pairs once k > 1.
    // Pair-search shape (round 11): the assignment pre-attaches a
    // pre-NORMALIZED fixed-size DOUBLE[64] vector (anv) and the pair
    // scan is ONE self-join on cid whose matches stream straight into
    // a single SIMD array_inner_product — five list walks per pair
    // became one, and DuckDB can no longer misplace the 6.7e7-row pair
    // relation as a hash-join BUILD side (the 4-relation form built a
    // ~40 GB payload hash table off a 20100-row cardinality estimate
    // and ran >900 s at sf1; this form runs ~55 s sf1 / ~150 s sf4).
    // Semantics unchanged: cosine(a,b) = dot(a/|a|, b/|b|) in double,
    // and a zero-norm side makes the guarded cosine 0 < threshold, so
    // dropping zero-norm rows from anv (NOT from a2/the output) is the
    // same rule. Verified identical to the list_cosine_similarity form
    // at sf0.01 and sf0.1.
    "q87_semdedup" ->
      """WITH emb AS (
           SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         params AS (
           SELECT CAST(ceil(count(*) / 10000.0) AS BIGINT) AS k FROM emb),
         dp AS (
           SELECT vec_id, unnest(range(len(v))) AS pos, unnest(v) AS comp
           FROM emb),
         c0 AS (
           SELECT vec_id % (SELECT k FROM params) AS cid, pos,
                  round(avg(comp), 6) AS c
           FROM dp GROUP BY 1, 2),
         s1 AS (
           SELECT dp.vec_id, c0.cid, sum(dp.comp * c0.c) AS dot,
                  sqrt(sum(dp.comp * dp.comp)) AS nv,
                  sqrt(sum(c0.c * c0.c)) AS nc
           FROM dp JOIN c0 USING (pos) GROUP BY 1, 2),
         a1 AS (
           SELECT vec_id, cid FROM (
             SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
               ORDER BY CASE WHEN nv * nc = 0 THEN 0
                             ELSE dot / (nv * nc) END DESC, cid ASC) AS rn
             FROM s1) WHERE rn = 1),
         c1 AS (
           SELECT a1.cid, dp.pos, round(avg(dp.comp), 6) AS c
           FROM dp JOIN a1 USING (vec_id) GROUP BY 1, 2),
         s2 AS (
           SELECT dp.vec_id, c1.cid, sum(dp.comp * c1.c) AS dot,
                  sqrt(sum(dp.comp * dp.comp)) AS nv,
                  sqrt(sum(c1.c * c1.c)) AS nc
           FROM dp JOIN c1 USING (pos) GROUP BY 1, 2),
         a2 AS (
           SELECT vec_id, cid FROM (
             SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
               ORDER BY CASE WHEN nv * nc = 0 THEN 0
                             ELSE dot / (nv * nc) END DESC, cid ASC) AS rn
             FROM s2) WHERE rn = 1),
         anv AS (
           SELECT a2.vec_id, a2.cid,
                  CAST(list_transform(e.v, x ->
                    x / sqrt(list_dot_product(e.v, e.v)))
                    AS DOUBLE[64]) AS nv
           FROM a2 JOIN emb e ON a2.vec_id = e.vec_id
           WHERE list_dot_product(e.v, e.v) > 0),
         dups AS (
           SELECT DISTINCT cb.vec_id AS vec_id
           FROM anv ca JOIN anv cb
             ON ca.cid = cb.cid AND ca.vec_id < cb.vec_id
           WHERE array_inner_product(ca.nv, cb.nv) >= 0.35)
         SELECT e.vec_id,
           CAST(a2.cid AS BIGINT) AS centroid_id,
           (d.vec_id IS NOT NULL) AS is_duplicate
         FROM emb e JOIN a2 ON e.vec_id = a2.vec_id
         LEFT JOIN dups d ON e.vec_id = d.vec_id""",

    // A-ES weighted reservoir: the exact per-language top-10 of
    // round(u^(1/n_chars), 9) with u = the shared md5 hash unit — the
    // shard pre-prune in the engine is a superset, so the direct window
    // is the whole oracle
    "q91_weighted_reservoir" ->
      """WITH scored AS (
           SELECT lang, CAST(doc_id AS BIGINT) AS doc_id,
             round(pow(
               CAST(CAST(('0x' ||
                 substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                 AS UBIGINT) AS DOUBLE) / CAST(4294967296.0 AS DOUBLE),
               1.0 / CAST(n_chars AS DOUBLE)), 9) AS sample_score
           FROM documents
           WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
             AND CAST(n_chars AS DOUBLE) > 0),
         ranked AS (
           SELECT lang, doc_id, sample_score,
             row_number() OVER (PARTITION BY lang
               ORDER BY sample_score DESC, doc_id ASC) AS sample_rank
           FROM scored)
         SELECT lang, sample_rank, doc_id, sample_score
         FROM ranked WHERE sample_rank <= 10""")
}
