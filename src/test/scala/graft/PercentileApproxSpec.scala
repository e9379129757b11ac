package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextAnalysis

/** T13's scale form (`approx_percentile`, bounded mergeable sketch state)
  * is not oracle-matchable — its output depends on the accuracy knob — so
  * its equivalence to the gated exact form is pinned here: at sf0.1, with
  * accuracy well above every group size, the sketch's rank error is under
  * one rank, so each approx value must land within the neighboring-order-
  * statistic band of the exact interpolated percentile.
  */
class PercentileApproxSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("graft-percentile-approx-test")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  val dir = "/root/testdata/sf0.1"

  test("approx_percentile tracks exact per-source percentiles within bounds") {
    val cols = Seq("p25", "p50", "p75", "p95")
    val exact = TextAnalysis.lengthPercentiles(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), cols.map(c => r.getDouble(r.fieldIndex(c)))))
      .toMap
    val approx = TextAnalysis.lengthPercentilesApprox(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), cols.map(c => r.getDouble(r.fieldIndex(c)))))
      .toMap
    assert(exact.keySet == approx.keySet, "same source groups")
    assert(exact.nonEmpty)
    for ((source, (nExact, es)) <- exact) {
      val (nApprox, as) = approx(source)
      assert(nApprox == nExact, s"$source: group sizes must agree")
      // accuracy=10000 >> any sf0.1 group, so the sketch holds every value
      // exactly; the only residual difference is interpolation (exact
      // interpolates between order statistics, approx returns one) — each
      // approx value must sit within 5% of the exact percentile
      for ((c, (e, a)) <- cols.zip(es.zip(as))) {
        assert(math.abs(a - e) <= math.max(1.0, 0.05 * e),
          s"$source.$c: approx $a vs exact $e out of bounds (n=$nExact)")
      }
    }
  }
}
