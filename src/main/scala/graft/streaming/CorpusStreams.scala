package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.{Sampling, Similarity, Sketches}

/** Streaming corpus-curation operators — the incremental twins of the
  * batch ops in [[graft.ops]]. Like [[EventStreams]], every operator is a
  * plain `DataFrame → DataFrame` over a streaming source, so the same
  * call sites compose under `readStream`/`writeStream`.
  */
object CorpusStreams {

  /** Streaming per-stratum weighted reservoir — the incremental twin of
    * [[Sampling.weightedReservoir]] (Efraimidis–Spirakis A-ES). Scores
    * are the same deterministic hash draws as the batch operator
    * (u = hashUnit(key), s = round(u^(1/w), 9)), computed with the SAME
    * column expressions before the rows reach keyed state; the state per
    * stratum is just the current k best (score, key) pairs. Because
    * top-k-by-a-pure-score is an associative, commutative, idempotent
    * merge, the reservoir after any sequence of micro-batches equals the
    * batch operator over the union of rows seen — arrival order,
    * batching, retries and duplicate deliveries cannot change it.
    *
    * State is bounded at k entries per stratum BY CONSTRUCTION (that is
    * what a reservoir is), so no watermark/timeout is needed for state
    * growth; strata live as long as the query. Emits the stratum's full
    * refreshed reservoir whenever a batch changes it (Update mode): one
    * (stratum, sample_rank, key, sample_score) row per kept element.
    *
    * @param rows streaming frame carrying `keyCol` (castable to long),
    *             `stratumCol`, `weightCol` (castable to double)
    */
  def weightedReservoir(rows: DataFrame, k: Int,
      keyCol: String = "doc_id", stratumCol: String = "stratum",
      weightCol: String = "weight"): DataFrame = {
    require(k >= 1, s"k must be positive (got $k)")
    val spark = rows.sparkSession
    import spark.implicits._
    val scored = rows
      .where(col(keyCol).isNotNull && col(weightCol).isNotNull &&
        col(weightCol).cast("double") > 0)
      // keyed state needs a non-null group key; a null stratum folds into
      // "" (the batch twin keeps nulls as their own window partition —
      // callers with both null and empty-string strata should normalize)
      .select(coalesce(col(stratumCol).cast("string"), lit("")).as("stratum"),
        col(keyCol).cast("long").as("key"),
        round(pow(Sampling.hashUnit(col(keyCol)),
          lit(1.0) / col(weightCol).cast("double")), 9).as("score"))
      .as[(String, Long, Double)]
    scored.groupByKey(_._1)
      .flatMapGroupsWithState[List[(Double, Long)],
          (String, Long, Long, Double)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (stratum: String, rows: Iterator[(String, Long, Double)],
            state: GroupState[List[(Double, Long)]]) =>
          val prev = state.getOption.getOrElse(Nil)
          // same ordering contract as the batch window: score desc, key
          // asc; a key re-delivered in a later batch carries the same
          // deterministic score, so distinct-by-pair dedups it
          val merged = (prev ++ rows.map(r => (r._3, r._2)))
            .distinct
            .sortBy { case (score, key) => (-score, key) }
            .take(k)
          if (merged == prev) Iterator.empty
          else {
            state.update(merged)
            merged.iterator.zipWithIndex.map { case ((score, key), i) =>
              (stratum, (i + 1).toLong, key, score)
            }
          }
      }
      .toDF("stratum", "sample_rank", "key", "sample_score")
  }

  /** Streaming HyperLogLog registers — the incremental twin of
    * [[Sketches.hllRegisters]]. The per-key (idx, rho) pair comes from
    * the SAME column expressions as the batch operator
    * ([[Sketches.hllIdxRho]]); keyed state per register holds the
    * current max rank. `max` is associative, commutative and IDEMPOTENT,
    * so the register table after any sequence of micro-batches equals
    * the batch operator over the union of keys seen — reordering,
    * rebatching and duplicate delivery cannot change it, and a row is
    * emitted only when a register actually rises (Update mode). State is
    * bounded at 2^b registers by construction.
    *
    * The distinct-count-over-an-unbounded-stream answer: kilobytes of
    * state however many keys arrive, and the emitted registers feed the
    * same [[Sketches.hllSummary]] as a batch build.
    */
  def hllRegisters(rows: DataFrame, keyCol: String, b: Int): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.where(col(keyCol).isNotNull)
      .select(Sketches.hllIdxRho(col(keyCol), b).as("__ir"))
      .select(col("__ir.idx").as("idx"), col("__ir.rho").as("rho"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (idx: Long, rs: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val prev = state.getOption.getOrElse(0L)
          val mx = rs.foldLeft(prev)((a, r) => math.max(a, r._2))
          if (state.exists && mx == prev) Iterator.empty
          else { state.update(mx); Iterator((idx, mx)) }
      }
      .toDF("idx", "rho")
  }

  /** Streaming Bloom filter bits — the incremental twin of
    * [[Sketches.bloomBits]]: each arriving key sets its k md5 positions;
    * state per position is a seen-marker, and a position is emitted
    * exactly ONCE, when first set (Append-compatible: downstream can
    * accumulate the bit set without reconciliation). Set-union is
    * idempotent, so order/batching/redelivery never change the final bit
    * set, which equals the batch build over the union of keys. State
    * bounded at m markers.
    */
  /** Streaming CountMin counters — the incremental twin of
    * [[Sketches.countMinSketch]]: per-document token frequencies come
    * from the SAME fused expression as the batch operator, fan out to
    * the same `depth` md5 buckets, and keyed state per (d, bucket) holds
    * the running count. Emits a counter's refreshed value whenever a
    * batch raises it (Update mode); state is bounded at depth × width
    * longs by construction.
    *
    * UNLIKE max (HLL) and set-union (Bloom), addition is NOT idempotent:
    * the counters equal the batch sketch over the union of documents
    * seen exactly once — which is precisely what Structured Streaming's
    * transactional state guarantees per source row. If the SOURCE itself
    * can re-deliver a document (an at-least-once upstream), compose a
    * keyed dedup in front (`dropDuplicates(docId)` or
    * [[EventStreams]]' watermarked dedup) — the parity spec exercises
    * exactly that composition.
    */
  /** Per-GROUP streaming HLL registers — the incremental twin of
    * [[Sketches.hllRegistersByGroup]] (the q110 batch shape: distinct
    * cardinality per domain/stratum). Same idempotent per-(group,
    * register) max merge as [[hllRegisters]], so parity holds under any
    * reordering, rebatching and redelivery; state is bounded at
    * groups × 2^b rows. The group key is carried AS A STRING in keyed
    * state (cast here and in the parity comparison); null groups form
    * their own register set exactly like the batch groupBy. */
  def hllRegistersByGroup(rows: DataFrame, groupCol: String,
      keyCol: String, b: Int): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.where(col(keyCol).isNotNull)
      .select(col(groupCol).cast("string").as("grp"),
        Sketches.hllIdxRho(col(keyCol), b).as("__ir"))
      .select(col("grp"), col("__ir.idx").as("idx"),
        col("__ir.rho").as("rho"))
      .as[(String, Long, Long)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[Long, (String, Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case ((grp, idx), rs, state) =>
          val prev = state.getOption.getOrElse(0L)
          val mx = rs.foldLeft(prev)((a, r) => math.max(a, r._3))
          if (state.exists && mx == prev) Iterator.empty
          else { state.update(mx); Iterator((grp, idx, mx)) }
      }
      .toDF("grp", "idx", "rho")
  }

  /** Per-GROUP streaming CountMin counters — the incremental twin of
    * [[Sketches.countMinSketchByGroup]] (the q116 batch shape: heavy
    * hitters per domain). Same additive per-(group, d, bucket) state as
    * [[cmCounters]] and the SAME exactly-once-source contract (addition
    * is not idempotent — compose a keyed dedup in front of an
    * at-least-once upstream); state bounded at groups × depth × width.
    * The group key is carried as a string, like
    * [[hllRegistersByGroup]]. */
  def cmCountersByGroup(rows: DataFrame, groupCol: String,
      textCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16,
      s"depth must be in [1, 16] (got $depth)")
    require(width >= 2 && width <= (1 << 30),
      s"width must be in [2, 2^30] (got $width)")
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .where(col(textCol).isNotNull &&
        length(graft.ops.TextAnalysis.wsTrim(col(textCol))) > 0)
      .select(col(groupCol).cast("string").as("grp"),
        explode(graft.functions.TextFunctions.tf_from_text(
          col(textCol))).as("__e"))
      .select(col("grp"), col("__e.tf").cast("long").as("tf"),
        posexplode(array((0 until depth).map(d =>
          Sketches.cmBucket(col("__e.t"), d, width)): _*)))
      .select(col("grp"), col("pos").cast("int").as("d"),
        col("col").as("bucket"), col("tf"))
      .as[(String, Int, Long, Long)]
      .groupByKey(r => (r._1, r._2, r._3))
      .flatMapGroupsWithState[Long, (String, Int, Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case ((grp, d, bucket), rs, state) =>
          val add = rs.map(_._4).sum
          if (add == 0L && state.exists) Iterator.empty
          else {
            val next = state.getOption.getOrElse(0L) + add
            state.update(next)
            Iterator((grp, d, bucket, next))
          }
      }
      .toDF("grp", "d", "bucket", "cnt")
  }

  def cmCounters(rows: DataFrame, textCol: String, depth: Int,
      width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16,
      s"depth must be in [1, 16] (got $depth)")
    require(width >= 2 && width <= (1 << 30),
      s"width must be in [2, 2^30] (got $width)")
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .where(col(textCol).isNotNull &&
        length(graft.ops.TextAnalysis.wsTrim(col(textCol))) > 0)
      .select(explode(graft.functions.TextFunctions.tf_from_text(
        col(textCol))).as("__e"))
      .select(col("__e.tf").cast("long").as("tf"),
        posexplode(array((0 until depth).map(d =>
          Sketches.cmBucket(col("__e.t"), d, width)): _*)))
      .select(col("pos").cast("int").as("d"), col("col").as("bucket"),
        col("tf"))
      .as[(Int, Long, Long)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[Long, (Int, Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case ((d, bucket), rs, state) =>
          val add = rs.map(_._3).sum
          if (add == 0L && state.exists) Iterator.empty
          else {
            val next = state.getOption.getOrElse(0L) + add
            state.update(next)
            Iterator((d, bucket, next))
          }
      }
      .toDF("d", "bucket", "cnt")
  }

  def bloomBits(rows: DataFrame, keyCol: String, m: Int,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 16, s"k must be in [1, 16] (got $k)")
    require(m >= 64 && m <= (1 << 30), s"m must be in [64, 2^30] (got $m)")
    val spark = rows.sparkSession
    import spark.implicits._
    rows.where(col(keyCol).isNotNull)
      .select(explode(array((0 until k).map(d =>
        Sketches.bloomPos(col(keyCol), d, m)): _*)).as("pos"))
      .as[Long]
      .groupByKey(identity)
      .flatMapGroupsWithState[Boolean, Long](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (pos: Long, _: Iterator[Long], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else { state.update(true); Iterator(pos) }
      }
      .toDF("pos")
  }

  /** Streaming ANN search over a prebuilt [[Similarity.IvfIndex]] — the
    * stream-of-queries twin of [[Similarity.searchIvf]]. The batch path
    * ranks probes and results with windows, which don't stream; this
    * reformulation is stateless until the final per-query top-k:
    *
    *  1. probe selection is PER-ROW — the coarse centroid table is tiny
    *     and already materialized (one bounded collect, the broadcast-
    *     gram doctrine), so each query row sorts a literal centroid
    *     array by (cosine desc, centroid_id asc) and keeps `nprobe`;
    *  2. candidates come from a stateless stream-static equi-join on
    *     `centroid_id` against the index's corpus frame, scored with the
    *     same [[Similarity.cosinePre]] arithmetic as the batch path;
    *  3. the per-query top-k is keyed state (flatMapGroupsWithState,
    *     Update mode): state = current k best (cosine, neighbor_id)
    *     pairs, merged idempotently — re-delivered rows carry identical
    *     deterministic scores, so retries and batching can't change the
    *     result (the [[weightedReservoir]] contract).
    *
    * Emits a query's full refreshed top-k whenever a batch changes it:
    * (query_id, neighbor_id, rank, cosine) — same columns, rounding and
    * tie-break as the batch operator.
    *
    * @param queries streaming frame carrying `idCol` (castable to long)
    *                and `vecCol` (castable to array&lt;double&gt;)
    */
  def searchIvf(index: Similarity.IvfIndex, queries: DataFrame, k: Int,
      nprobe: Int = 4, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be positive (got $k)")
    require(nprobe >= 1, s"nprobe must be positive (got $nprobe)")
    val spark = queries.sparkSession
    import spark.implicits._
    // bounded collect: numCentroids rows (the index's coarse table)
    val centArr = index.centroids
      .select(col("centroid_id").cast("long"),
        col("vec").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .toSeq
    val cents = typedLit(centArr)
    val probed = queries
      .select(col(idCol).cast("long").as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .where(col("query_id").isNotNull && col("qv").isNotNull)
      // per-row probe rank: sort struct(-sim, cid) ascending = sim desc,
      // centroid_id asc — the batch window's exact ordering
      .withColumn("__probes", slice(array_sort(transform(cents, c =>
        struct((-Similarity.cosine(col("qv"), c.getField("_2")))
          .as("negsim"), c.getField("_1").as("cid")))), 1, nprobe))
      .select(col("query_id"), col("qv"),
        explode(col("__probes").getField("cid")).as("centroid_id"))
      .withColumn("qn", Similarity.norm(col("qv")))
    val scored = probed
      .join(index.corpus, Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"),
        Similarity.cosinePre(col("qv"), col("cv"), col("qn"), col("cn"))
          .as("cosine"),
        col("neighbor_id").cast("long").as("neighbor_id"))
      .as[(Long, Double, Long)]
    scored.groupByKey(_._1)
      .flatMapGroupsWithState[List[(Double, Long)],
          (Long, Long, Long, Double)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (qid: Long, rows: Iterator[(Long, Double, Long)],
            state: GroupState[List[(Double, Long)]]) =>
          val prev = state.getOption.getOrElse(Nil)
          val merged = (prev ++ rows.map(r => (r._2, r._3)))
            .distinct
            .sortBy { case (cos, nid) => (-cos, nid) }
            .take(k)
          if (merged == prev) Iterator.empty
          else {
            state.update(merged)
            merged.iterator.zipWithIndex.map { case ((cos, nid), i) =>
              (qid, nid, (i + 1).toLong,
                BigDecimal(cos).setScale(6,
                  BigDecimal.RoundingMode.HALF_UP).toDouble)
            }
          }
      }
      .toDF("query_id", "neighbor_id", "rank", "cosine")
  }

  /** Streaming ANN search over a prebuilt [[Similarity.IvfPqIndex]] —
    * the IVF-PQ companion of [[searchIvf]]. The probe ranking and the
    * keyed top-k state are the same shapes; the ADC score is computed
    * per candidate row from bounded driver-side literals (the coarse
    * centroids and the m×ksub codebook — index metadata, never the
    * corpus): d_j = dot(q_j, book[j][code_j]) and the reconstruction
    * norm Σ|book[j][code_j]|², exactly [[Similarity.searchIvfPq]]'s
    * LUT decomposition. A query row's candidate rows are generated
    * atomically within its micro-batch (stream-static joins against the
    * index's persisted lists/codes frames), so every (query, neighbor)
    * group arrives with all m sub-scores and redelivery merges
    * idempotently — the [[searchIvf]] contract.
    *
    * Emits a query's full refreshed top-k whenever a batch changes it:
    * (query_id, neighbor_id, rank, adc_cosine) — same columns, rounding
    * and tie-break as the batch operator.
    */
  def searchIvfPq(index: Similarity.IvfPqIndex, queries: DataFrame, k: Int,
      nprobe: Int = 4, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be positive (got $k)")
    require(nprobe >= 1, s"nprobe must be positive (got $nprobe)")
    val spark = queries.sparkSession
    import spark.implicits._
    // bounded collects: numCentroids rows + m×ksub codebook rows
    val centArr = index.centroids
      .select(col("centroid_id").cast("long"),
        col("vec").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .toSeq
    val bookArr = index.codebooks
      .select(col("sub").cast("long"), col("centroid_id").cast("long"),
        col("vec").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2),
        r.getSeq[Double](2).map(x => x * x).sum))
      .toSeq
    val dsubs = bookArr.map(_._3.length).distinct
    require(dsubs.length == 1,
      s"codebook subspace widths differ: $dsubs")
    val dsub = dsubs.head
    val m = index.m
    val cents = typedLit(centArr)
    val books = typedLit(bookArr)
    val probed = queries
      .select(col(idCol).cast("long").as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .where(col("query_id").isNotNull && col("qv").isNotNull)
      // the batch pqComponents contract: dims must split into m equal
      // subspaces (checked at execution — lengths live in the data)
      .withColumn("qv", when(coalesce(assert_true(
          size(col("qv")) === lit(m * dsub),
          concat(lit(s"PQ requires vector dims = m*dsub = ${m * dsub}, " +
            "got "), size(col("qv")))).cast("int"), lit(0)) === 0,
        col("qv")))
      .withColumn("__probes", slice(array_sort(transform(cents, c =>
        struct((-Similarity.cosine(col("qv"), c.getField("_2")))
          .as("negsim"), c.getField("_1").as("cid")))), 1, nprobe))
      .select(col("query_id"), col("qv"),
        explode(col("__probes").getField("cid")).as("centroid_id"))
      .withColumn("qn", Similarity.norm(col("qv")))
    // candidate rows: probed lists, then the per-sub PQ codes — one row
    // per (query, neighbor, sub), complete within the query's batch
    val candidates = probed
      .join(index.lists, Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .join(index.codes, Seq("neighbor_id"))
    // per-row LUT terms from the codebook literal: the entry whose
    // (sub, cid) matches this code row
    val entry = element_at(filter(books, b =>
      b.getField("_1") === col("sub") && b.getField("_2") === col("cid")), 1)
    val scored = candidates
      .withColumn("__d", Similarity.dot(
        slice(col("qv"), (col("sub") * dsub + 1).cast("int"), lit(dsub)),
        entry.getField("_3")))
      .withColumn("__cn2", entry.getField("_4"))
      .select(col("query_id"), col("neighbor_id").cast("long"),
        col("sub").cast("long"), col("__d"), col("__cn2"), col("qn"))
      .as[(Long, Long, Long, Double, Double, Double)]
    scored.groupByKey(_._1)
      .flatMapGroupsWithState[List[(Double, Long)],
          (Long, Long, Long, Double)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (qid: Long, rows: Iterator[(Long, Long, Long, Double, Double,
            Double)], state: GroupState[List[(Double, Long)]]) =>
          // assemble per-neighbor ADC from the m sub rows; duplicates
          // from redelivery collapse in the (sub -> term) map.
          // iterator, NOT Map.map: equal ADC scores are common under
          // coarse codebooks and must not collapse by key
          val byNeighbor = rows.toSeq.groupBy(_._2).iterator.map {
            case (nid, rs) =>
              val terms = rs.map(r => r._3 -> (r._4, r._5)).toMap
              val dot = terms.valuesIterator.map(_._1).sum
              val rn2 = terms.valuesIterator.map(_._2).sum
              val qn = rs.head._6
              val denom = qn * math.sqrt(rn2)
              (if (denom == 0.0) 0.0 else dot / denom, nid)
          }.toList
          val prev = state.getOption.getOrElse(Nil)
          val merged = (prev ++ byNeighbor)
            .distinct
            .sortBy { case (adc, nid) => (-adc, nid) }
            .take(k)
          if (merged == prev) Iterator.empty
          else {
            state.update(merged)
            merged.iterator.zipWithIndex.map { case ((adc, nid), i) =>
              (qid, nid, (i + 1).toLong,
                BigDecimal(adc).setScale(6,
                  BigDecimal.RoundingMode.HALF_UP).toDouble)
            }
          }
      }
      .toDF("query_id", "neighbor_id", "rank", "adc_cosine")
  }
}
