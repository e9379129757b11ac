package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Bench harness contract: failures surface in the "errors" object and are
  * excluded from the total instead of being silently timed as ~0 s
  * successes; resource metrics ride along per query. */
class BenchSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .appName("graft-bench-test")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("a throwing query lands in errors, not in queries/total") {
    val listener = new QueryMetricsListener
    spark.sparkContext.addSparkListener(listener)
    val qs = Map[String, (SparkSession, String) => DataFrame](
      "ok_count" -> ((s, _) => s.range(1000).toDF("id")),
      "boom" -> ((_, _) => throw new RuntimeException("forced failure")))
    val line = Bench.benchLine(spark, listener, "/unused", qs)
    assert(line.contains(""""errors":{"boom":"forced failure"}"""))
    assert(line.contains(""""ok_count":"""))
    assert(!line.contains(""""boom":0"""), "failed query must not be timed as a success")
    // total must equal the ok query's time alone (single entry in queries)
    val queriesObj = line.split("\"queries\":")(1).split("}")(0)
    assert(!queriesObj.contains("boom"))
    // cpu/mem metrics present for the successful query
    assert(line.contains(""""cpu_s":{"ok_count":"""))
    assert(line.contains(""""peak_task_mem_mb":{"ok_count":"""))
  }
}
