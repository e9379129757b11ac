package graft.tools

import org.apache.spark.sql.SparkSession

/** Breakdown probe for the warm interactive path: times each component of
  * a warm-hit lookup/traversal pass so the remaining floor is attributed
  * (plan analysis? canonicalization? result build? collect?). */
object WarmProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def time(name: String, reps: Int)(f: => Unit): Unit = {
      f
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      println(f"$name%-46s min ${times.min}%8.2f ms  med ${times.sorted.apply(reps / 2)}%8.2f ms")
    }

    // warm everything once
    graft.operators.GraphOps.nodeLookupFast(spark, dir).collect()
    graft.operators.GraphOps.khopGrid(spark, dir).collect()
    graft.operators.GraphOps.sspPair(spark, dir).collect()

    time("nodeLookupFast full (build+collect)", 20) {
      graft.operators.GraphOps.nodeLookupFast(spark, dir).collect()
    }
    time("khopGrid full (build+collect)", 20) {
      graft.operators.GraphOps.khopGrid(spark, dir).collect()
    }
    time("sspPair full (build+collect)", 20) {
      graft.operators.GraphOps.sspPair(spark, dir).collect()
    }
    val edges = graft.graph.PropertyGraph.grid(spark, 16).edges
    time("grid(16).edges df build only", 20) {
      graft.graph.PropertyGraph.grid(spark, 16).edges
    }
    time("grid edges optimizedPlan+stats (fresh df)", 20) {
      val df = graft.graph.PropertyGraph.grid(spark, 16).edges
        .select(org.apache.spark.sql.functions.col("src"),
          org.apache.spark.sql.functions.col("dst"))
      df.queryExecution.optimizedPlan.stats.sizeInBytes
    }
    time("grid edges canonicalized (fresh df)", 20) {
      val df = graft.graph.PropertyGraph.grid(spark, 16).edges
      df.queryExecution.optimizedPlan.canonicalized
    }
    time("prebuilt edges canonicalized (cached qe)", 20) {
      edges.queryExecution.optimizedPlan.canonicalized
    }
    spark.stop()
  }
}
