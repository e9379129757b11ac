package graft

import org.scalatest.funsuite.AnyFunSuite

/** BenchPlot (B7, the visualizer.py equivalent) — CSV parsing and SVG
  * structure; no Spark session needed. */
class BenchPlotSpec extends AnyFunSuite {

  val csv: String =
    """query,sf,seconds,cpu_seconds,peak_task_mem_mb,error
      |q1_pricing_summary,sf0.001,0.1000,0.2000,64.0,
      |q1_pricing_summary,sf0.01,0.3000,0.5000,64.0,
      |q1_pricing_summary,sf0.1,1.2000,2.5000,128.0,
      |g_pagerank,sf0.001,0.0500,0.0400,0.0,
      |g_pagerank,sf0.01,0.2000,0.3000,1.0,
      |g_broken,sf0.01,0.0000,0.0000,0.0,java.lang.RuntimeException
      |""".stripMargin

  test("parseCsv keeps clean rows and drops errored ones") {
    val rows = BenchPlot.parseCsv(csv)
    assert(rows.length == 5)
    assert(!rows.exists(_.query == "g_broken"))
    assert(rows.count(_.query == "q1_pricing_summary") == 3)
    assert(rows.find(r => r.query == "g_pagerank" && r.sf == 0.01)
      .exists(r => r.seconds == 0.2 && r.cpuS == 0.3))
  }

  test("svg renders one panel per family with a polyline and label per query") {
    val out = BenchPlot.svg(BenchPlot.parseCsv(csv), "seconds", _.seconds)
    assert(out.startsWith("<svg"))
    assert(out.contains("q (seconds)") && out.contains("g (seconds)"))
    assert("<polyline".r.findAllIn(out).length == 2)
    assert(out.contains(">q1_pricing_summary</text>") && out.contains(">g_pagerank</text>"))
    // well-formed enough for a browser: every opened tag closes
    Seq("svg", "text", "polyline", "circle", "line", "rect").foreach { t =>
      val opens = s"<$t".r.findAllIn(out).length
      val closes = s"</$t>".r.findAllIn(out).length + s"<$t[^>]*/>".r.findAllIn(out).length
      assert(opens == closes, s"tag $t: $opens opened, $closes closed")
    }
  }

  test("@-suffixed overlay rows get their own axis panels, one series per SF") {
    val axCsv = csv +
      """g_khop_grid@h1,sf0.1,0.1,0.1,0,
        |g_khop_grid@h2,sf0.1,0.2,0.2,0,
        |g_khop_grid@h4,sf0.1,0.4,0.4,0,
        |g_khop_grid@h1,sf0.01,0.05,0.05,0,
        |g_khop_grid@h2,sf0.01,0.1,0.1,0,
        |g_ssp_pair@d50,sf0.1,0.5,0.5,0,
        |g_ssp_pair@d100,sf0.1,0.9,0.9,0,
        |""".stripMargin
    val out = BenchPlot.svg(BenchPlot.parseCsv(axCsv), "seconds", _.seconds)
    assert(out.contains("g_khop_grid by h") && out.contains("g_ssp_pair by d"))
    // one polyline per SF series in the hops panel, one in the depth panel,
    // plus the two family-panel series from the base csv
    assert("<polyline".r.findAllIn(out).length == 5)
    assert(out.contains(">sf=0.1</text>") && out.contains(">sf=0.01</text>"))
    // overlay rows must not leak into the family panels as SF series
    assert(!out.contains(">g_khop_grid@h1</text>"))
  }

  test("malformed @-names degrade into the family panels, never vanish") {
    // "x@foo" (non-numeric suffix), "x@h" (letter only) and "a@b@c"
    // (double @) fail the axis parse; they must still render SOMEWHERE —
    // as full-name series in their family panel — so a typo'd overlay
    // name shows up as a visibly odd label instead of silently missing
    val badCsv = csv +
      """g_khop_grid@foo,sf0.1,0.1,0.1,0,
        |g_khop_grid@h,sf0.01,0.1,0.1,0,
        |g_a@b@c,sf0.01,0.1,0.1,0,
        |""".stripMargin
    val out = BenchPlot.svg(BenchPlot.parseCsv(badCsv), "seconds", _.seconds)
    assert(out.contains(">g_khop_grid@foo</text>"), "non-numeric suffix must fall back")
    assert(out.contains(">g_khop_grid@h</text>"), "letter-only suffix must fall back")
    assert(out.contains(">g_a@b@c</text>"), "double-@ name must fall back")
    assert(!out.contains("g_khop_grid by "), "malformed rows must not create axis panels")
  }

  test("zero metric values are clamped, not dropped or log-exploded") {
    val rows = BenchPlot.parseCsv(csv)
    val out = BenchPlot.svg(rows, "cpu_seconds", _.cpuS)
    assert(out.contains("g_pagerank")) // has a 0.04 min; still plotted
    assert(!out.contains("NaN") && !out.contains("Infinity"))
  }
}
