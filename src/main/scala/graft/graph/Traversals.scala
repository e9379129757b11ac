package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative DataFrame BFS — the Spark re-expression of the reference's
  * `get_nodes_hops` (databases.py:38,121-123: DISTINCT nodes within 1..k
  * directed hops) and `ssp` (databases.py:46,125-127: unweighted shortest
  * path).
  *
  * Scale design (SURVEY §5): the frontier-expansion join shuffles on the
  * edge key only; edges are cached once per traversal; the visited set and
  * frontier are `localCheckpoint`ed each round so lineage (and thus plan
  * size) stays O(1) instead of O(iterations); empty-frontier early exit.
  * At cluster scale AQE skew-splits the frontier join on hot hubs.
  */
object Traversals {

  /** All nodes reachable from `source` in 1..maxHops hops, with their BFS
    * distance. `edges` must have columns (src, dst). Excludes the source
    * itself (reference semantics: nodes *reached*, hop ≥ 1).
    */
  def kHop(edges: DataFrame, source: Long, maxHops: Int): DataFrame =
    bfs(edges, source, Some(maxHops)).filter(col("dist") >= 1)

  /** BFS distances from `source` to every reachable node (dist 0 = source).
    * Unbounded — runs until the frontier empties. */
  def distances(edges: DataFrame, source: Long): DataFrame =
    bfs(edges, source, None)

  /** Unweighted shortest-path length from src to dst (reference `ssp`);
    * -1 if unreachable. Early-exits as soon as dst enters the frontier. */
  def shortestPathLength(edges: DataFrame, source: Long, target: Long): Long = {
    val spark = edges.sparkSession
    val e = edges.select(col("src"), col("dst")).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var frontier = spark.range(1).select(lit(source).as("node")).localCheckpoint()
      var visited = frontier
      var d = 0L
      while (frontier.limit(1).count() > 0) {
        if (frontier.filter(col("node") === target).limit(1).count() > 0) return d
        val next = frontier.join(e, col("node") === col("src"))
          .select(col("dst").as("node")).distinct()
          .join(visited, Seq("node"), "left_anti")
          .localCheckpoint()
        visited = visited.union(next).localCheckpoint()
        frontier = next
        d += 1
      }
      -1L
    } finally e.unpersist()
  }

  private def bfs(edges: DataFrame, source: Long, maxHops: Option[Int]): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col("src"), col("dst")).persist(StorageLevel.MEMORY_AND_DISK)
    var frontier = spark.range(1).select(lit(source).as("node")).localCheckpoint()
    var visited = frontier.withColumn("dist", lit(0)).localCheckpoint()
    var hop = 1
    var done = maxHops.exists(_ < 1)
    while (!done) {
      val next = frontier.join(e, col("node") === col("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .localCheckpoint()
      if (next.limit(1).count() == 0) done = true
      else {
        visited = visited.union(next.withColumn("dist", lit(hop))).localCheckpoint()
        frontier = next
        hop += 1
        if (maxHops.exists(hop > _)) done = true
      }
    }
    e.unpersist()
    visited
  }
}
