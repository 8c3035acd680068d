package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

import graft.model.GraphAnalysisException

/** Per-query graph snapshot — the Spark analogue of the reference's CSR
  * (`src/include/duckpgq/core/utils/compressed_sparse_row.hpp:25-47`,
  * built by `csr_creation.cpp`): dense vertex ids, an edge list in dense-id
  * space, optional weights, plus the CSR-shaped introspection views the
  * reference exposes as table functions (`get_csr_v/e/w`,
  * `pgq_scan.cpp:15-153`).
  *
  * Unlike the reference's in-memory arrays, the snapshot is a pair of
  * (cached) DataFrames — it scales to any size and the kernels choose
  * local vs distributed execution by statistics ([[LocalKernels]]).
  */
final case class GraphSnapshot(
    /** (rowid: long, vkey: long) — dense ids 0..V-1 ordered by key. */
    vertices: DataFrame,
    /** (src: long, dst: long, eid: long[, w]) in dense-id space. */
    edges: DataFrame,
    /** 0 = unweighted, 1 = integer, 2 = double —
      * `csr_get_w_type.cpp:9-14`. */
    weightType: Int) {
  def unpersist(): Unit = { vertices.unpersist(); edges.unpersist() }

  /** `get_csr_v` analogue: the CSR offsets array as (rowid, offset) —
    * exclusive prefix sums of out-degrees in rowid order.
    *
    * Distributed two-pass prefix sum (the classic scan decomposition), so
    * no single task ever sees more than one CHUNK of the vertex set:
    * rowids are dense 0..V-1, so a row's chunk is a PURE FUNCTION of its
    * rowid — both passes agree by construction, with nothing cached or
    * pinned (an earlier form persisted a range-partitioned RDD to freeze
    * sampled partition boundaries, leaking the cache). Pass 1 collects
    * one degree total per chunk (a few bytes each); pass 2 seeds each
    * chunk with the exclusive sum of the preceding chunks' totals
    * (broadcast join) and cumsums INSIDE the chunk with a per-chunk
    * window — partitioned, never an `Exchange SinglePartition`. */
  def csrOffsets: DataFrame = {
    val spark = vertices.sparkSession
    import spark.implicits._
    val deg = vertices.join(edges, vertices("rowid") === edges("src"),
        "left_outer")
      .groupBy(vertices("rowid").as("rowid"))
      .agg(sum(when(edges("src").isNotNull, 1L).otherwise(0L)).as("deg"))
    val nOpt = Option(vertices.agg(max(col("rowid"))).head.get(0))
    if (nOpt.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("rowid", LongType, nullable = false),
          StructField("offset", LongType, nullable = false))))
    val n = nOpt.get.asInstanceOf[Long] + 1
    val parts = math.max(vertices.rdd.getNumPartitions, 1)
    val chunkSize = math.max(1L, (n + parts - 1) / parts)
    val withChunk = deg.withColumn("__chunk",
      (col("rowid") / chunkSize).cast("long"))
    val totals = withChunk.groupBy("__chunk").agg(sum("deg").as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val nChunks = ((n + chunkSize - 1) / chunkSize).toInt
    val starts = new Array[Long](nChunks)
    for (c <- 1 until nChunks)
      starts(c) = starts(c - 1) + totals.getOrElse((c - 1).toLong, 0L)
    val startDF = starts.zipWithIndex
      .map { case (s, c) => (c.toLong, s) }.toSeq
      .toDF("__chunk", "__start")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__chunk").orderBy("rowid")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    withChunk.join(broadcast(startDF), Seq("__chunk"))
      .select(col("rowid"),
        (col("__start") + coalesce(sum("deg").over(w), lit(0L)))
          .as("offset"))
  }

  /** `get_csr_e` analogue: neighbor rowids ordered by (src, dst). */
  def csrEdges: DataFrame =
    edges.select(col("src"), col("dst")).orderBy("src", "dst")

  /** `get_csr_w` analogue (`pgq_scan.cpp:113-153`): the weight array in
    * the same (src, dst) order as [[csrEdges]]; raises like the reference
    * when the snapshot is unweighted. */
  def csrWeights: DataFrame = {
    if (weightType == 0)
      throw GraphAnalysisException(
        "CSR weights were not requested for this snapshot")
    edges.select(col("src"), col("dst"), col("w")).orderBy("src", "dst")
  }
}

object Snapshot {

  /** Builds a snapshot from a vertex table and an edge table, with the
    * reference's integrity check: every edge endpoint must match exactly
    * one vertex — otherwise `Non-existent/non-unique vertices detected`
    * (`csr_creation.cpp:121-125`,
    * `test/sql/path_finding/non-unique-vertices.test:36-45`).
    *
    * Dense rowids are assigned by key order via a distributed sort +
    * `zipWithIndex` (two passes, no single-partition window).
    */
  def build(spark: SparkSession, vdf: DataFrame, keyCol: String,
      edf: DataFrame, srcCol: String, dstCol: String,
      weightCol: Option[String] = None): GraphSnapshot = {
    val keys = vdf.select(col(keyCol).cast("long").as("vkey"))
    val rowids = spark.createDataFrame(
      keys.sort("vkey").rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row(i, r.getLong(0))
      },
      StructType(Seq(StructField("rowid", LongType, nullable = false),
        StructField("vkey", LongType, nullable = true))))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val weightType = weightCol.map { w =>
      edf.schema(w).dataType match {
        case org.apache.spark.sql.types.DoubleType |
             org.apache.spark.sql.types.FloatType => 2
        case _ => 1
      }
    }.getOrElse(0)

    val eCols = Seq(col(srcCol).cast("long").as("skey"),
      col(dstCol).cast("long").as("dkey")) ++
      weightCol.map(w => col(w).as("w"))
    val e = edf.select(eCols: _*)
    val eCount = e.count()
    val joined = e
      .join(rowids.select(col("vkey").as("skey"), col("rowid").as("src")),
        Seq("skey"))
      .join(rowids.select(col("vkey").as("dkey"), col("rowid").as("dst")),
        Seq("dkey"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // reference semantics: a mismatch between resolved and raw edge counts
    // means a dangling endpoint (no vertex) or a duplicated key (several)
    if (joined.count() != eCount)
      throw GraphAnalysisException(
        "Non-existent/non-unique vertices detected. Make sure all " +
          "vertices referred by edge tables exist and are unique")

    // materialize the dense-id edge list, then release the intermediate
    // join cache — GraphSnapshot.unpersist() must free what is actually
    // cached, not an unpersisted derived projection
    val edges = denseEdgeIds(spark,
      joined.select(Seq(col("src"), col("dst")) ++
        weightCol.map(_ => col("w")): _*),
      Seq("src", "dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()
    joined.unpersist()
    GraphSnapshot(rowids, edges, weightType)
  }

  /** Dense edge ids: a global rank over `sortCols` (distributed range-sort
    * + `zipWithIndex` — no single-partition window). The reference's path
    * kernels carry physical edge rowids (`shortest_path.cpp:212-217`), so
    * multigraph parallel edges stay distinct; this is the Spark analogue —
    * parallel edges (identical sort keys, or even fully identical rows)
    * receive DISTINCT consecutive ids. Deterministic up to permutation
    * among fully-tied rows (which are interchangeable by definition). */
  def denseEdgeIds(spark: SparkSession, edges: DataFrame,
      sortCols: Seq[String], eidCol: String = "eid"): DataFrame = {
    require(sortCols.nonEmpty, "denseEdgeIds needs at least one sort column")
    val sorted = edges
      .repartitionByRange(sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
    val schema = StructType(sorted.schema.fields :+
      StructField(eidCol, LongType, nullable = false))
    spark.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
      }, schema)
  }
}
