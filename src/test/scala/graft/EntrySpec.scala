package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() must return rows on sf0.001, and every
  * declared oracle key must have a matching query (and vice versa where
  * required). */
class EntrySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("graft-entry-test")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("entry() returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  /** The only queries allowed to ship without a DuckDB oracle: the S7
    * per-op insert benches, whose timed path is a streaming append (not
    * SQL-expressible — the driver records a rows-only check, and
    * StreamingSpec pins the exact admitted/appended row sets). Any OTHER
    * query missing an oracle is a gate regression and must fail here.
    * Empty since round 9: the insert family's row sets are deterministic
    * functions of the op id, so even those carry range()-based oracles. */
  private val rowsOnly = Set.empty[String]

  test("every oracle key has a query and every query has an oracle") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without queries: ${o -- q}")
    assert((q -- o -- rowsOnly).isEmpty,
      s"queries without oracles (driver downgrades to rows-only): ${q -- o -- rowsOnly}")
    assert((rowsOnly -- q).isEmpty, s"rows-only allowlist names unknown queries: ${rowsOnly -- q}")
    assert((rowsOnly & o).isEmpty,
      s"rows-only queries grew oracles — drop them from the allowlist: ${rowsOnly & o}")
  }

  test("all queries EXECUTE on sf0.001 (not just analyze)") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, dir)
      assert(df.schema.fields.nonEmpty, s"$name has empty schema")
      // limit(1).collect() forces real execution: analysis-clean queries
      // that fail at runtime (ANSI overflow, bad element_at, unreadable
      // column) must be caught here, not first by the external gate
      try df.limit(1).collect()
      catch { case t: Throwable => fail(s"$name failed at runtime: ${t.getMessage}", t) }
    }
  }
}
