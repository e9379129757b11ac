package graft.graph

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col

/** GraphX/Pregel variants of the DataFrame algorithms — the dense-analytics
  * path (vertex state in memory, no per-iteration shuffle of the full edge
  * relation). Used to cross-validate the DataFrame implementations in tests
  * and available to callers whose workload is traversal-heavy.
  *
  * This is the one RDD enclave in the engine (SURVEY §4): GraphX's
  * vertex-cut partitioning and Pregel aggregation are genuinely
  * per-partition imperative logic that the DataFrame API cannot express.
  */
object GraphXBridge {

  /** `numParts > 0` coalesces the vertex/edge RDDs first: a Pregel
    * superstep schedules a task per partition, so a small graph spread
    * over local[32]'s default parallelism pays ~30×32 empty tasks for a
    * 30-superstep run. Size partitions to the graph, not the cluster. */
  def toGraphX(g: PropertyGraph, numParts: Int = 0): Graph[Long, Long] = {
    val v0 = g.nodes.select(col("id")).rdd.map(r => (r.getLong(0), r.getLong(0)))
    val e0 = g.edges.select(col("src"), col("dst")).rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), 1L))
    val vertices: RDD[(VertexId, Long)] = if (numParts > 0) v0.coalesce(numParts) else v0
    val edges: RDD[Edge[Long]] = if (numParts > 0) e0.coalesce(numParts) else e0
    Graph(vertices, edges)
  }

  /** Materialize a (VertexId, Long) vertex view as a DataFrame and drop
    * the backing graph's cached RDDs: GraphX's iterative operators leave
    * their final graph cached, and those raw RDD persists are invisible
    * to SQL-side cache clearing — without this, every bench pass leaks a
    * graph's worth of storage memory. localCheckpoint is eager, so
    * unpersisting afterwards cannot trigger recompute. */
  private def drain(spark: SparkSession, gx: Graph[_, _],
                    vs: RDD[(VertexId, Long)], names: (String, String)): DataFrame = {
    import spark.implicits._
    val out = vs.map { case (v, d) => (v, d) }.toDF(names._1, names._2).localCheckpoint()
    gx.unpersistVertices(blocking = false)
    gx.edges.unpersist(blocking = false)
    out
  }

  /** Connected components (undirected semantics, GraphX native). */
  def connectedComponents(spark: SparkSession, g: PropertyGraph,
                          numParts: Int = 0): DataFrame = {
    val cc = toGraphX(g, numParts).connectedComponents()
    drain(spark, cc, cc.vertices, ("node", "comp"))
  }

  /** Single-source shortest path lengths via Pregel. */
  def distances(spark: SparkSession, g: PropertyGraph, source: Long,
                numParts: Int = 0): DataFrame = {
    import spark.implicits._
    val gx = toGraphX(g, numParts).mapVertices((id, _) =>
      if (id == source) 0L else Long.MaxValue)
    val res = gx.pregel(Long.MaxValue)(
      (_, d, msg) => math.min(d, msg),
      t => if (t.srcAttr != Long.MaxValue && t.srcAttr + 1 < t.dstAttr)
        Iterator((t.dstId, t.srcAttr + 1)) else Iterator.empty,
      (a, b) => math.min(a, b))
    drain(spark, res, res.vertices.filter(_._2 != Long.MaxValue), ("node", "dist"))
  }

  /** Point-to-point shortest-path LENGTH (the reference's src→dst `ssp`,
    * databases.py:46); -1 if unreachable. Pregel's built-in loop cannot
    * stop on a predicate, so the superstep loop is explicit: one
    * aggregateMessages per BFS level, with a single probe job per level
    * that reads both the frontier size and the target's message — the
    * loop exits the level the target is reached, doing depth(target)
    * supersteps instead of the graph's full eccentricity. Per-level cost
    * is the RDD superstep floor (no SQL planning), which is what makes a
    * deep traversal affordable on a small graph and shuffle-bounded on a
    * large one. */
  def shortestPathLength(spark: SparkSession, g: PropertyGraph, source: Long,
                         target: Long, numParts: Int = 0): Long = {
    var cur = toGraphX(g, numParts).mapVertices((id, _) =>
      if (id == source) 0L else Long.MaxValue).cache()
    var result = if (source == target) 0L else -1L
    var done = result == 0L
    while (!done) {
      // messages only to UNVISITED vertices: the frontier is exactly the
      // newly reached level, so counting it doubles as the termination test
      val msgs = cur.aggregateMessages[Long](
        t => if (t.srcAttr != Long.MaxValue && t.dstAttr == Long.MaxValue)
          t.sendToDst(t.srcAttr + 1L),
        math.min).cache()
      val (n, tHit) = msgs.aggregate((0L, -1L))(
        { case ((c, t0), (v, d)) => (c + 1, if (v == target) d else t0) },
        { case ((c1, t1), (c2, t2)) => (c1 + c2, math.max(t1, t2)) })
      if (tHit >= 0L) { result = tHit; done = true }
      else if (n == 0L) done = true
      else {
        // same materialize-then-unpersist discipline as pageRank — BOTH
        // edges and vertices, in that order: the new graph's edge view
        // ships vertex attributes lazily, so unpersisting the previous
        // round before the edges materialize chains every round's
        // recompute into one deeply nested lineage (observed: a single
        // task stuck for minutes re-zipping 30 rounds of joins)
        val next = cur.outerJoinVertices(msgs)((_, old, m) =>
          m.map(math.min(old, _)).getOrElse(old)).cache()
        next.edges.foreachPartition(_ => ())
        next.vertices.foreachPartition(_ => ())
        cur.unpersistVertices(blocking = false)
        cur.edges.unpersist(blocking = false)
        msgs.unpersist(blocking = false)
        cur = next
      }
    }
    cur.unpersistVertices(blocking = false)
    cur.edges.unpersist(blocking = false)
    result
  }

  /** Weighted single-source shortest paths via Pregel (non-negative
    * integer weights; edges must carry a `w` column). Same vertex-resident
    * relaxation loop as `distances`, with the edge weight as the message
    * increment — distributed Bellman-Ford that converges in
    * O(longest-shortest-path-hops) supersteps. */
  def weightedDistances(spark: SparkSession, nodes: DataFrame, edges: DataFrame,
                        source: Long, numParts: Int = 0): DataFrame = {
    import spark.implicits._
    val v0 = nodes.select(col("id")).rdd.map(r => (r.getLong(0), r.getLong(0)))
    val e0 = edges.select(col("src"), col("dst"), col("w")).rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), r.getLong(2)))
    val vertices: RDD[(VertexId, Long)] = if (numParts > 0) v0.coalesce(numParts) else v0
    val es: RDD[Edge[Long]] = if (numParts > 0) e0.coalesce(numParts) else e0
    val gx = Graph(vertices, es).mapVertices((id, _) =>
      if (id == source) 0L else Long.MaxValue)
    val res = gx.pregel(Long.MaxValue)(
      (_, d, msg) => math.min(d, msg),
      t => if (t.srcAttr != Long.MaxValue && t.srcAttr + t.attr < t.dstAttr)
        Iterator((t.dstId, t.srcAttr + t.attr)) else Iterator.empty,
      (a, b) => math.min(a, b))
    drain(spark, res, res.vertices.filter(_._2 != Long.MaxValue), ("node", "dist"))
  }

  /** PageRank with the same semantics as Algorithms.pageRank (fixed
    * iterations, uniform 1/N init, no dangling redistribution).
    *
    * @param snap if > 0, every iteration's rank (and the uniform initial
    *   rank) is rounded HALF_UP to `snap` decimals. On graphs with hub
    *   in-degrees in the hundreds the contribution sum is an
    *   order-dependent double reduction — engines summing in different
    *   orders drift in the last ulp and the drift compounds across
    *   iterations. Snapping well above ulp granularity (9 dp vs ~1e-16
    *   relative error) makes each iteration's ranks bit-identical on
    *   both engines, so divergence cannot accumulate; the DuckDB oracle
    *   mirrors the same per-round rounding. 0 keeps raw doubles (safe on
    *   small regular graphs like the 25-node nation adjacency). */
  def pageRank(spark: SparkSession, g: PropertyGraph, iters: Int, d: Double = 0.85,
               numParts: Int = 0, snap: Int = 0): DataFrame = {
    import spark.implicits._
    def snapped(r: Double): Double =
      if (snap > 0) BigDecimal(r).setScale(snap, BigDecimal.RoundingMode.HALF_UP).toDouble
      else r
    val n = g.nodes.count().toDouble
    val base = toGraphX(g, numParts)
    val gx = base.outerJoinVertices(base.outDegrees) {
      (_, _, deg) => deg.getOrElse(0)
    }.mapVertices((_, deg) => (snapped(1.0 / n), deg))
    // Cache + materialize each iteration's graph, then unpersist the
    // previous one (GraphX's own PageRank pattern): without this every
    // outerJoinVertices extends one long uncached lineage and the final
    // action replays all iterations' joins — a recompute/stack blowup at
    // high iteration counts.
    var cur = gx.cache()
    for (_ <- 1 to iters) {
      val contribs = cur.aggregateMessages[Double](
        t => t.sendToDst(t.srcAttr._1 / t.srcAttr._2),
        _ + _)
      val next = cur.outerJoinVertices(contribs) { (_, attr, c) =>
        (snapped((1 - d) / n + d * c.getOrElse(0.0)), attr._2)
      }.cache()
      next.edges.foreachPartition(_ => ()) // materialize before dropping prev
      next.vertices.foreachPartition(_ => ())
      cur.unpersistVertices(blocking = false)
      cur.edges.unpersist(blocking = false)
      cur = next
    }
    // materialize the result, then release the final iteration's cache
    // (same reason as drain(): raw RDD persists outlive the query)
    val out = cur.vertices.map { case (v, (r, _)) => (v, r) }
      .toDF("node", "rank").localCheckpoint()
    cur.unpersistVertices(blocking = false)
    cur.edges.unpersist(blocking = false)
    out
  }
}
