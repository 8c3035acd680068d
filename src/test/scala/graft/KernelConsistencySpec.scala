package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.PathFinder
import graft.pgq.PathMode

/** Cross-kernel consistency on seeded random graphs: independent kernels
  * must agree wherever their semantics overlap. Each invariant pits two
  * DIFFERENT implementations against each other (distance BFS vs
  * parent-pointer reconstruction vs visited-set enumeration vs weighted
  * relaxation), so a bug in any one of them breaks an equation instead of
  * hiding in a hand-picked fixture. Graphs are small enough that every
  * call takes the driver-local strategy — the distributed twins are
  * covered by the forced-parity specs in DistributedKernelsSpec.
  */
class KernelConsistencySpec extends AnyFunSuite {
  import Fixture.spark

  private def randomGraph(seed: Long): (Seq[(Long, Long)], Seq[Long]) = {
    val rnd = new scala.util.Random(seed)
    val n = 6 + rnd.nextInt(8)
    val edges = for {
      s <- 0L until n.toLong; d <- 0L until n.toLong
      if s != d && rnd.nextDouble() < 0.25
    } yield (s, d)
    (edges, 0L until n.toLong)
  }

  test("random graphs: distance, path, enumeration and weighted kernels agree") {
    val s = Fixture.init()
    import s.implicits._
    for (seed <- 1L to 8L) {
      val (edgeSeq, vs) = randomGraph(seed)
      if (edgeSeq.nonEmpty) {
        val e = edgeSeq.toDF("src", "dst")
        val seeds = vs.toDF("id")
        val hint = s"(seed $seed, ${vs.length} vertices, ${edgeSeq.length} edges)"

        val bfs = PathFinder.bfsDistances(s, e, seeds, None)
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
          .toMap
        val sp = PathFinder.shortestPaths(s, e, seeds, 0L, None)
          .collect().map(r => (r.getLong(0), r.getLong(1)) ->
            (r.getLong(2), r.getSeq[Long](3).toList)).toMap

        // 1. parent-pointer reconstruction reaches exactly the BFS pairs,
        //    at the same distances, with structurally consistent paths
        assert(sp.keySet == bfs.keySet, hint)
        sp.foreach { case ((src, dst), (d, path)) =>
          assert(d == bfs((src, dst)), hint)
          assert(path.head == src && path.last == dst &&
            path.length == 2 * d.toInt + 1, hint)
        }

        // 2. ACYCLIC enumeration: its minimum length per pair equals the
        //    BFS distance (every shortest walk is vertex-simple)
        val acyc = PathFinder.enumerateModePaths(s, e, seeds, 0L, None,
          PathMode.Acyclic)
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
          .groupBy(_._1).map { case (k, a) => k -> a.map(_._2).min }
        assert(acyc == bfs, hint)

        // 3. SHORTEST 1 over bounded walks reproduces ANY-shortest exactly,
        //    tie-break included (both rank by (length, lexicographic path))
        val bound = Some(vs.length.toLong)
        val k1 = PathFinder.kShortestPaths(s, e, seeds, 0L, bound,
          PathMode.Walk, 1)
          .collect().map(r => (r.getLong(0), r.getLong(1)) ->
            (r.getLong(2), r.getSeq[Long](3).toList)).toMap
        assert(k1 == sp, hint)

        // 4. ALL SHORTEST: every path has the BFS distance, the pair set
        //    matches, and the ANY-shortest pick is among them
        val all = PathFinder.allShortestPaths(s, e, seeds, 0L, None)
          .collect().map(r => ((r.getLong(0), r.getLong(1)),
            r.getLong(2), r.getSeq[Long](3).toList))
        assert(all.map(_._1).toSet == bfs.keySet, hint)
        all.foreach { case (pair, d, _) => assert(d == bfs(pair), hint) }
        val allByPair = all.groupBy(_._1)
        sp.foreach { case (pair, (_, path)) =>
          assert(allByPair(pair).exists(_._3 == path), hint)
        }

        // 5. unit weights turn cheapest routes into BFS: same pairs, cost
        //    = distance, and the route length matches its cost
        val routes = PathFinder.cheapestRoutes(s,
          e.withColumn("w", lit(1.0)), seeds)
          .collect().map(r => (r.getLong(0), r.getLong(1)) ->
            (r.getDouble(2), r.getSeq[Long](3).toList)).toMap
        assert(routes.keySet == bfs.keySet, hint)
        routes.foreach { case (pair, (c, path)) =>
          assert(c == bfs(pair).toDouble, hint)
          assert(path.length == 2 * c.toInt + 1, hint)
        }

        // 6. reachability is exactly the BFS pair set
        val reach = PathFinder.reachablePairs(s, e, seeds)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(reach == bfs.keySet, hint)

        // 7. mode set theory over 4-hop-bounded enumerations (unbounded
        //    TRAIL/ACYCLIC counts explode combinatorially on the denser
        //    random graphs): every ACYCLIC path is a TRAIL (vertex-simple
        //    ⇒ edge-simple); SIMPLE = ACYCLIC ∪ closed cycles; a bounded
        //    WALK covers every TRAIL within its horizon
        def enum(mode: PathMode, upper: Long) =
          PathFinder.enumerateModePaths(s, e, seeds, 0L, Some(upper), mode)
            .collect().map(r => ((r.getLong(0), r.getLong(1)),
              r.getSeq[Long](3).toList)).toSet
        val acycP = enum(PathMode.Acyclic, 4L)
        val trailP = enum(PathMode.Trail, 4L)
        val simpleP = enum(PathMode.Simple, 4L)
        assert(acycP.subsetOf(trailP), hint)
        val cycles = simpleP.filter { case ((src, dst), p) =>
          src == dst && p.length > 1 }
        assert(simpleP == acycP ++ cycles, hint)
        val walk3 = enum(PathMode.Walk, 3L)
        assert(trailP.filter(_._2.length <= 7).subsetOf(walk3), hint)
      }
    }
  }
}
