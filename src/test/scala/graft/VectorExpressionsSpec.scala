package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** ArrayDotProduct (graft_dot): codegen + interpreted paths against the
  * higher-order-function reference fold, on float and double arrays. */
class VectorExpressionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .appName("vector-expressions-spec")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** The pre-graft_dot reference implementation: interpreted HOF fold. */
  private val hofDot =
    """aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
      |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin

  test("graft_dot matches the HOF fold bit-exactly on random float arrays") {
    val df = spark.range(200).selectExpr(
      "transform(sequence(1, 64), i -> CAST(sin(id * 31 + i) AS FLOAT)) AS a",
      "transform(sequence(1, 64), i -> CAST(cos(id * 17 + i) AS FLOAT)) AS b")
    val diff = df.selectExpr(s"graft_dot(a, b) AS d1", s"$hofDot AS d2")
      .filter("d1 <> d2") // bit-exact: same left-fold order
      .count()
    assert(diff === 0)
  }

  test("graft_dot handles double literals against float columns") {
    val df = spark.range(50).selectExpr("id",
      "transform(sequence(1, 4), i -> CAST(i * (id + 1) AS FLOAT)) AS a")
    // carry id alongside the result: pairing expected values by collect()
    // position would silently depend on partition collection order
    val rows = df.selectExpr("id", "graft_dot(array(1.0D, 0.5D, -1.0D, 2.0D), a) AS d")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // 1*(id+1) + 0.5*2(id+1) - 3(id+1) + 2*4(id+1) = 7(id+1)
    rows.foreach { case (id, d) => assert(d === 7.0 * (id + 1)) }
  }

  test("graft_dot is null-safe on null arrays and mismatched lengths") {
    // mismatched lengths → null (not a silent min-length truncation):
    // ragged embedding data must surface the same way the oracle's
    // fixed-range indexing does (NULL), never as a plausible number
    val r = spark.sql(
      """SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS n,
        |  graft_dot(array(1.0D, 2.0D, 3.0D), array(10.0D)) AS ragged,
        |  graft_dot(array(2.0D, 3.0D), array(10.0D, 100.0D)) AS ok""".stripMargin)
      .collect().head
    assert(r.isNullAt(0))
    assert(r.isNullAt(1))
    assert(r.getDouble(2) === 320.0)
  }

  test("interpreted path (codegen off) agrees with codegen path") {
    val df = spark.range(100).selectExpr(
      "transform(sequence(1, 32), i -> CAST(sin(id + i) AS FLOAT)) AS a",
      "transform(sequence(1, 32), i -> CAST(cos(id - i) AS FLOAT)) AS b")
      .localCheckpoint()
    val withCodegen = df.selectExpr("sum(graft_dot(a, b)) AS s").collect().head.getDouble(0)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = df.selectExpr("sum(graft_dot(a, b)) AS s").collect().head.getDouble(0)
      assert(withCodegen === interpreted)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
