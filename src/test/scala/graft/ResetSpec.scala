package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Reset.clear — the reference's `clear()` surface (databases.py:149):
  * drops temp views, cached blocks, and (opt-in) scratch paths. */
class ResetSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .appName("graft-reset-test")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("clear drops temp views and cached data") {
    val df = spark.range(10).toDF("id")
    df.createOrReplaceTempView("graft_tmp_view")
    df.cache().count()
    assert(spark.catalog.tableExists("graft_tmp_view"))
    Reset.clear(spark)
    assert(!spark.catalog.tableExists("graft_tmp_view"))
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("clear(scratch = true) removes this JVM's scratch dirs and resets write-once markers") {
    val p = Paths.get(s"/tmp/${Reset.ScratchPrefix}reset_spec_scratch")
    Files.createDirectories(p)
    Files.writeString(p.resolve("part-0"), "1\t2\n")
    // claim a write-once marker; after clear the same path must fire again
    var fired = 0
    Reset.writeOnce(p.toString) { fired += 1 }
    Reset.writeOnce(p.toString) { fired += 1 }
    assert(fired == 1, "second writeOnce on a claimed path must not fire")
    Reset.clear(spark, scratch = true)
    assert(!Files.exists(p))
    Reset.writeOnce(p.toString) { fired += 1 }
    assert(fired == 2, "clear(scratch = true) must reset write-once markers")
    Reset.clear(spark, scratch = true) // leave no marker for other suites
  }
}
