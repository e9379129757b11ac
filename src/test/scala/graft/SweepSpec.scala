package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

/** The sweep-only overlay queries (SF-scaled grids, the hops axis, the
  * ssp target-depth axis) are not in SparkEntry.queries, so EntrySpec's
  * execute-everything net does not cover them; a broken overlay would
  * surface only as silent error rows in BENCH_SWEEP.csv. This spec runs
  * every overlay at the smallest SF and checks the axis semantics the
  * sweep exists to measure. */
class SweepSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("graft-sweep-test")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  val dir = "/root/testdata/sf0.001"

  test("every sweep overlay executes at sf0.001") {
    GraphOps.sweepQueries.foreach { case (name, fn) =>
      // limit(1).collect() forces real execution, same net as EntrySpec
      try fn(spark, dir).limit(1).collect()
      catch { case t: Throwable => fail(s"$name failed: ${t.getMessage}", t) }
    }
  }

  test("hops axis: reached-node counts grow monotonically with maxHops") {
    val counts = (1 to 8).map { h =>
      GraphOps.sweepQueries(s"g_khop_grid@h$h")(spark, dir).count()
    }
    assert(counts == counts.sorted, s"non-monotone hop coverage: $counts")
    assert(counts.head < counts.last, "deeper traversals must reach more nodes")
  }

  test("depth axis: ssp targets sit at increasing distances, all reachable") {
    val n = GraphOps.gridNFor(spark, dir)
    val dists = Seq(25, 50, 75, 100).map { pct =>
      val r = GraphOps.sweepQueries(s"g_ssp_pair@d$pct")(spark, dir).collect().head
      val k = math.max(1, (n - 1) * pct / 100)
      assert(r.getLong(2) == 2L * k, s"diagonal ($k,$k) must be 2k=${2 * k} hops, got $r")
      r.getLong(2)
    }
    assert(dists == dists.sorted && dists.distinct == dists,
      s"target depths must strictly increase: $dists")
  }
}
