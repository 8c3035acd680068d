package graft.graph

import org.apache.spark.graphx.{Edge, EdgeTriplet, Graph, Pregel, VertexId}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** GraphX/Pregel backend for the path kernels — the partition-aware
  * alternative to the DataFrame loops for *deep* traversals: Pregel keeps
  * the edge RDD partitioned once and ships only frontier messages per
  * superstep, where the DataFrame loop re-shuffles the frontier against
  * the edge relation every level.
  *
  * Seeds are batched `laneLimit` at a time — the direct distributed
  * descendant of the reference's 512-lane MS-BFS (`LANE_LIMIT`,
  * `duckpgq_utils.hpp:10`; kernel `iterativelength.cpp:34-143`): each
  * vertex carries one distance slot per active seed lane.
  */
object GraphXKernels {

  val LaneLimit = 512 // reference LANE_LIMIT

  private val Inf = Long.MaxValue

  /** Multi-source BFS distances, semantics identical to
    * [[PathFinder.bfsDistances]] / [[LocalKernels.bfsDistances]].
    * @return (src, dst, dist) DataFrame
    */
  def bfsDistances(spark: SparkSession, edges: DataFrame, seeds: DataFrame,
      maxDepth: Option[Long], laneLimit: Int = LaneLimit): DataFrame = {
    val edgeRdd = edges.select(col("src").cast("long"),
        col("dst").cast("long")).rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), ()))
    val seedArr = seeds.select(col("id").cast("long")).distinct()
      .collect().map(_.getLong(0))
    val depth = maxDepth.getOrElse(Long.MaxValue)
    val maxIter = math.min(depth, Int.MaxValue - 1L).toInt

    val batches = seedArr.grouped(laneLimit).map { lanes =>
      val laneIdx = lanes.zipWithIndex.toMap
      val s = lanes.length
      val graph = Graph.fromEdges(edgeRdd, Array.empty[Long])
        .mapVertices { (vid, _) =>
          val a = Array.fill(s)(Inf)
          laneIdx.get(vid).foreach(a(_) = 0L)
          a
        }

      def vprog(vid: VertexId, attr: Array[Long],
          msg: Array[Long]): Array[Long] =
        if (msg.isEmpty) attr
        else Array.tabulate(s)(i => math.min(attr(i), msg(i)))

      def sendMsg(t: EdgeTriplet[Array[Long], Unit])
          : Iterator[(VertexId, Array[Long])] = {
        var improves = false
        val cand = Array.tabulate(s) { i =>
          val d = t.srcAttr(i)
          if (d != Inf && d + 1 < t.dstAttr(i)) { improves = true; d + 1 }
          else Inf
        }
        if (improves) Iterator((t.dstId, cand)) else Iterator.empty
      }

      def merge(a: Array[Long], b: Array[Long]): Array[Long] =
        Array.tabulate(s)(i => math.min(a(i), b(i)))

      val res = Pregel(graph, initialMsg = Array.empty[Long],
        maxIterations = maxIter)(vprog, sendMsg, merge)
      // one row per reached (seed, vertex) pair — stays distributed
      res.vertices.flatMap { case (vid, dists) =>
        dists.iterator.zipWithIndex.collect {
          case (d, i) if d != Inf => (lanes(i), vid, d)
        }
      }
    }.reduceOption(_ union _)

    // seeds with no outgoing edges never enter the graph: add their
    // self-distance rows explicitly (semantics: dist(s,s)=0 always)
    val selfRows = spark.sparkContext.parallelize(
      seedArr.toSeq.map(sd => (sd, sd, 0L)))
    val all = batches.map(_ union selfRows).getOrElse(selfRows).distinct()
    import spark.implicits._
    all.toDF("src", "dst", "dist")
  }
}
