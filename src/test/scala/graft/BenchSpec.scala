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
  }

  test("detail JSON carries the cpu/mem metrics the stdout line no longer does") {
    val results = Seq(
      QueryBench("ok_count", 1.5, 3.0, 64.0, None, Seq(1.6, 1.5, 1.55)),
      QueryBench("boom", 0.1, 0.0, 0.0, Some("forced failure")))
    val detail = Bench.detailJson(results, """{"heap_used_mb":1.0,"heap_max_mb":2.0}""", "/unused")
    assert(detail.contains(""""cpu_s":{"ok_count":3.0000}"""))
    assert(detail.contains(""""peak_task_mem_mb":{"ok_count":64.0000}"""))
    assert(detail.contains(""""errors":{"boom":"forced failure"}"""))
    assert(detail.contains(""""idle":{"heap_used_mb":1.0"""))
    org.json4s.jackson.JsonMethods.parse(detail) // must be valid JSON
  }

  test("detail JSON is self-auditing: every pass published, unstable queries flagged") {
    val results = Seq(
      QueryBench("steady", 1.0, 0.0, 0.0, None, Seq(1.05, 1.0, 1.02)),
      // one contaminated pass, outvoted by three clean re-runs: the
      // fastest-three window is stable, so the query is NOT flagged
      QueryBench("recovered", 1.0, 0.0, 0.0, None, Seq(4.0, 1.0, 1.05, 1.02)),
      // still dirty after MaxPasses: must be flagged
      QueryBench("dirty", 1.0, 0.0, 0.0, None, Seq(1.0, 2.5, 3.0, 2.8, 2.9, 2.7)))
    val detail = Bench.detailJson(results, "{}", "/unused")
    assert(detail.contains(""""passes":{"steady":[1.0500,1.0000,1.0200]"""))
    assert(detail.contains(""""unstable":["dirty"]"""))
    org.json4s.jackson.JsonMethods.parse(detail)
  }

  test("detail JSON carries the r21 driver-stall attribution for the published pass") {
    // gc_ms / compile_n / drain_ms belong to the min pass (QueryBench) —
    // the r20 driver-window inflation (+12 s wall, executor CPU flat)
    // had to be inferred; these fields make it attributable from the
    // artifact itself
    val results = Seq(
      QueryBench("q", 1.0, 0.5, 8.0, None, Seq(1.0, 1.1),
        gcMs = 42L, compileN = 3L, drainMs = 7.25))
    val detail = Bench.detailJson(results, "{}", "/unused")
    assert(detail.contains(""""gc_ms":{"q":42}"""), detail)
    assert(detail.contains(""""compile_n":{"q":3}"""), detail)
    assert(detail.contains(""""drain_ms":{"q":7.2500}"""), detail)
    // the stall maps must not collide with SweepSpec's passes regex
    // ("the only numeric-ARRAY entries in the detail JSON are the
    // passes"): they are JSON objects, not arrays
    assert(!detail.contains(""""gc_ms":["""))
    org.json4s.jackson.JsonMethods.parse(detail)
  }

  test("passSpread judges the fastest three passes so re-runs age out a dirty pass") {
    assert(Bench.passSpread(Seq(1.0, 1.1, 1.05)) < Bench.SpreadBar)
    assert(Bench.passSpread(Seq(8.0, 1.0, 1.1)) > Bench.SpreadBar)
    // sub-floor ABSOLUTE spread is noise whatever the ratio: 0.12 vs 0.20
    // differs by less than one ~100 ms scheduling floor
    assert(Bench.passSpread(Seq(0.12, 0.16, 0.20)) < Bench.SpreadBar)
    // but past one floor of absolute spread the ratio judges as before
    assert(Bench.passSpread(Seq(0.12, 0.2, 0.4)) > Bench.SpreadBar)
    // a re-run pass restores stability: fastest three exclude the stall
    assert(Bench.passSpread(Seq(8.0, 1.0, 1.1, 1.05)) < Bench.SpreadBar)
    assert(Bench.passSpread(Nil) == 1.0 && Bench.passSpread(Seq(3.0)) == 1.0)
  }

  test("stdout line never exceeds the driver's 2000-char tail window") {
    // The driver keeps only the last 2000 chars of combined output; a line
    // longer than that is truncated mid-JSON and parses as null (this
    // voided BENCH_r02/r03). Simulate a far larger suite than the real one
    // (200 queries, 23-char names — no name-carrying shape can fit) and
    // require: under budget, valid JSON, and NO query dropped — the
    // values-array stage carries every entry at full diff fidelity where
    // the pre-r17 ladder trimmed the fastest rows.
    val results = (1 to 200).map { i =>
      QueryBench(f"synthetic_query_name_$i%03d", i * 0.01, 0.0, 0.0, None)
    }
    val line = Bench.benchLine(results, "/root/testdata/sf0.1")
    assert(line.length <= Bench.LineBudget, s"line is ${line.length} chars")
    assert(!line.contains("queries_omitted"),
      "the values-array stage must carry every query — trimming is the last resort\n" + line)
    val entries = Bench.decodeQueries(line, results.map(_.name))
    assert(entries.size === 200)
    results.foreach { r =>
      assert(math.abs(entries(r.name) - r.secs) <= 0.0501,
        s"${r.name}: line says ${entries(r.name)}, truth is ${r.secs}")
    }
    val parsed = org.json4s.jackson.JsonMethods.parse(line)
    val total = (parsed \ "value") match {
      case org.json4s.JDouble(d) => d
      case org.json4s.JInt(i) => i.toDouble
      case org.json4s.JDecimal(d) => d.toDouble
      case other => fail(s"unexpected value type: $other")
    }
    assert(math.abs(total - results.map(_.secs).sum) < 0.05)
  }

  test("the real suite's line fits the budget with every query listed") {
    // worst realistic per-query widths: 9.49 s (renders "9.5" at the
    // 1-decimal stage, "9" once the ladder reaches whole-second
    // resolution — a 10 s+ query is itself a red flag), with every 10th
    // query at 0.04 s (widened to
    // "0.04" by the never-render-zero rule, 4 chars; the r8 run had ~8
    // such sub-50 ms queries out of 82). All entries must fit UNTRIMMED —
    // the ladder may drop precision and the informational detail pointer,
    // but never a query. 999.999-per-query is covered by the pathological
    // test below, where trimming is required behavior.
    val results = SparkEntry.queries.keys.toSeq.zipWithIndex.map { case (n, i) =>
      QueryBench(n, if (i % 10 == 9) 0.04 else 9.49, 0.0, 0.0, None)
    }
    val line = Bench.benchLine(results, "/root/testdata/sf0.1")
    assert(line.length <= Bench.LineBudget, s"line is ${line.length} chars")
    assert(!line.contains("queries_omitted"),
      "the real suite must fit untrimmed — shorten query names or raise precision policy if this fires")
    assert(!line.contains("\":0,") && !line.contains("\":0}"),
      "a successful 0.04 s timing must never render as bare 0\n" + line)
    org.json4s.jackson.JsonMethods.parse(line)
  }

  test("N+2 gated queries still fit untrimmed — headroom for the next operators") {
    // the pre-commit gate for adding another gated query: prove the line
    // fits with every query listed BEFORE the operator lands, instead of
    // discovering the drop-fastest fallback in a round artifact. The
    // value model matches the REAL suite's distribution — mostly
    // sub-second rows, which re-widen to 3-5 chars at ANY precision
    // stage via the never-render-zero rule (the r14 overflow that 9.49 s
    // synthetic values failed to predict: "9" is 1 char at whole-second
    // precision, "0.2" is 3) — plus two longer-than-average names.
    val extras = Seq(
      QueryBench("t_next_operator_name", 0.31, 0.0, 0.0, None),
      QueryBench("d_another_new_operator", 0.04, 0.0, 0.0, None))
    val results = SparkEntry.queries.keys.toSeq.zipWithIndex.map { case (n, i) =>
      // 60% "0.x" (3 chars), 20% multi-second ints, 10% "0.0x", 10% "0.005"
      val secs = (i % 10) match {
        case 9           => 0.042
        case 8           => 0.0047
        case 6 | 7       => 1.0 + i % 3
        case _           => 0.1 + (i % 5) * 0.2
      }
      QueryBench(n, secs, 0.0, 0.0, None)
    } ++ extras
    val line = Bench.benchLine(results, "/root/testdata/sf0.1")
    assert(line.length <= Bench.LineBudget, s"line is ${line.length} chars")
    assert(!line.contains("queries_omitted"),
      s"${results.size} queries no longer fit untrimmed — rework the encoding " +
        "before landing another gated operator")
    // EVERY query must be on the line (whatever shape fit), with a
    // parseable nonzero value within the 0.05 s fidelity contract
    val entries = Bench.decodeQueries(line, results.map(_.name))
    assert(entries.size === results.size)
    results.foreach { r =>
      assert(entries(r.name) > 0, s"${r.name} rendered zero")
      assert(math.abs(entries(r.name) - r.secs) <= 0.0501,
        s"${r.name}: line says ${entries(r.name)}, truth is ${r.secs}")
    }
  }

  test("compact-string stage keeps sub-10 s entries within 0.05 s of detail fidelity") {
    // r14's one-line JSON rendered 1.71 s as "2" — a phantom ≥1.5×
    // regression for anyone diffing the line against BENCH_DETAIL. The
    // adaptive tiers must keep every sub-10 s entry within the 1-decimal
    // quantization step (0.05 s) on a realistic full-suite distribution
    // (r14 detail shape: ~85% sub-second, the rest 1-3 s).
    val results = SparkEntry.queries.keys.toSeq.zipWithIndex.map { case (n, i) =>
      val secs = (i % 20) match {
        case 17      => 1.71 // the r14 poster child
        case 18      => 2.44
        case 19      => 2.81
        case j       => 0.07 + j * 0.05
      }
      QueryBench(n, secs, 0.0, 0.0, None)
    }
    val line = Bench.benchLine(results, "/root/testdata/sf0.1")
    assert(line.length <= Bench.LineBudget, s"line is ${line.length} chars")
    assert(!line.contains("queries_omitted"), "must fit untrimmed\n" + line)
    val entries = Bench.decodeQueries(line, results.map(_.name))
    assert(entries.size === results.size)
    results.filter(_.secs < 10).foreach { r =>
      assert(math.abs(entries(r.name) - r.secs) <= 0.0501,
        s"${r.name}: line says ${entries(r.name)}, detail says ${r.secs}")
    }
  }

  test("pathological timings (999.999 s every query) degrade compactly, never truncation") {
    // pre-r14 this case trimmed queries; the fitting stages now keep
    // every row — trimming remains only as the truly-final fallback
    val results = SparkEntry.queries.keys.toSeq.sorted
      .map(n => QueryBench(n, 999.999, 0.0, 0.0, None))
    val line = Bench.benchLine(results, "/root/testdata/sf0.1")
    assert(line.length <= Bench.LineBudget, s"line is ${line.length} chars")
    val entries = Bench.decodeQueries(line, results.map(_.name))
    assert(entries.size === results.size, "every query must survive degradation")
  }

  test("decodeQueries round-trips every line shape and fails loud on registry drift") {
    // dict shape (small suite)
    val small = Seq(QueryBench("alpha", 1.234, 0.0, 0.0, None),
      QueryBench("beta", 0.042, 0.0, 0.0, None))
    val dictLine = Bench.benchLine(small, "/sf")
    assert(Bench.decodeQueries(dictLine)("alpha") === 1.234)
    // values-array shape: long names force names off the line; an
    // errored query's name must ride along so the decoder can resolve
    // which registry rows the values belong to
    val big = (1 to 300).map(i =>
      QueryBench(f"very_long_synthetic_name_$i%03d", 0.37, 0.0, 0.0, None)) :+
      QueryBench("very_long_synthetic_name_boom", 0.0, 0.0, 0.0, Some("kaboom"))
    val arrLine = Bench.benchLine(big, "/sf")
    assert(arrLine.length <= Bench.LineBudget)
    assert(arrLine.contains("\"qh\":"), "expected the values-array shape\n" + arrLine)
    val decoded = Bench.decodeQueries(arrLine, big.map(_.name))
    assert(decoded.size === 300 && !decoded.contains("very_long_synthetic_name_boom"))
    assert(math.abs(decoded("very_long_synthetic_name_007") - 0.37) <= 0.0051)
    // a WRONG registry (one renamed query) must throw, not mis-label
    val drifted = big.map(_.name).updated(5, "very_long_synthetic_renamed")
    intercept[IllegalArgumentException] { Bench.decodeQueries(arrLine, drifted) }
  }

  test("mass failure still yields a parseable line under budget") {
    // every query failing with a maximal 200-char sanitized message: the
    // budget loop must shrink the ERRORS object too (shrinking queries
    // alone can never fit), degrading to 40-char messages and finally to
    // an errors_omitted count — never a mid-JSON truncation by the driver
    val longMsg = "e" * 200
    val results = SparkEntry.queries.keys.toSeq.map(n =>
      QueryBench(n, 0.0, 0.0, 0.0, Some(longMsg)))
    val line = Bench.benchLine(results, "/root/testdata/sf0.1")
    assert(line.length <= Bench.LineBudget, s"line is ${line.length} chars")
    val parsed = org.json4s.jackson.JsonMethods.parse(line)
    val omitted = (parsed \ "errors_omitted")
    val errs = (parsed \ "errors").asInstanceOf[org.json4s.JObject].obj
    assert(errs.nonEmpty || omitted != org.json4s.JNothing,
      "errors must surface as truncated messages or an omitted count")
  }

  test("idle footprint: Reset.clear releases every cached block; heap stays under ceiling") {
    // B6 exists to measure the cost of keeping the engine up with no query
    // running; Reset.clear exists so that cost never includes leaked
    // caches. Pin both halves: (1) the semantic leak check — after running
    // a query that persists blocks (dedupClusters caches its CC edge
    // closure and checkpoints frontiers), clear() must leave ZERO
    // persistent RDDs; (2) a post-GC heap ceiling, so a future leak that
    // slips past (1) (driver-side references, accumulated broadcast
    // blocks) fails a test instead of silently inflating the bench's idle
    // number (362 MB in the round-7 run — the ceiling leaves ~3x headroom
    // for test-JVM overhead, not for leaks that grow with queries run).
    graft.operators.Dedup.dedupClusters(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").format("noop").save()
    val idle = Bench.idleUsage(spark) // calls Reset.clear + System.gc
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"clear() leaked persistent RDDs: ${spark.sparkContext.getPersistentRDDs.keys}")
    // the heap number is logged, not asserted: post-GC heap in a shared
    // test JVM depends on GC choice, flags, and which suites ran first —
    // an absolute ceiling flakes on environments the round driver never
    // sees. The hard gate is (1); a reference-leak regression that grows
    // with queries run shows up there or in the bench's idle trend.
    val used = (org.json4s.jackson.JsonMethods.parse(idle) \ "heap_used_mb")
      .asInstanceOf[org.json4s.JDouble].num
    info(s"post-GC idle heap: $used MB")
  }

  test("detail path on the line follows SPARK_GRAFT_DETAIL_OUT") {
    val results = Seq(QueryBench("q", 1.0, 0.0, 0.0, None))
    val line = Bench.benchLine(results, "/sf", "/tmp/elsewhere.json")
    assert(line.contains(""""detail":"/tmp/elsewhere.json""""))
  }
}
