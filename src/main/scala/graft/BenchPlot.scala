package graft

import java.nio.file.{Files, Paths}

import scala.math.{log10, pow}

/** B7: bench-sweep visualizer — the reference's `visualizer.py`
  * (visualizer.py:1-114, plots per-op wall-time over increasing sizes from
  * the `.bench` CSVs) re-expressed as a dependency-free SVG writer over
  * `BenchSweep`'s CSV (no plotting libraries exist in this environment; any
  * browser renders the output).
  *
  * Chart design: one small-multiple panel per query family (the prefix
  * before the first `_`), each a log-log line chart of metric vs scale
  * factor. All lines share ONE hue and every line is direct-labeled at its
  * right end — with up to ~20 series per panel, identity by color is
  * unreadable, so color is not asked to carry it (labels do). Static
  * artifact: no hover layer.
  */
object BenchPlot {

  final case class Row(query: String, sf: Double, seconds: Double,
                       cpuS: Double, peakMb: Double)

  /** Parse BenchSweep CSV (query,sf,seconds,cpu_seconds,peak_task_mem_mb,
    * error); rows with a non-empty error column — or malformed numeric
    * fields (hand-edited/truncated files) — are dropped, not fatal. */
  def parseCsv(csv: String): Seq[Row] =
    csv.linesIterator.drop(1).filter(_.nonEmpty).flatMap { line =>
      val f = line.split(",", -1)
      if (f.length < 5 || (f.length >= 6 && f(5).nonEmpty)) None
      else scala.util.Try(Row(f(0), f(1).stripPrefix("sf").toDouble,
        f(2).toDouble, f(3).toDouble, f(4).toDouble)).toOption
    }.toSeq

  // validated placeholder palette (dataviz reference instance)
  private val Surface = "#fcfcfb"
  private val Ink = "#0b0b0b"
  private val InkSecondary = "#52514e"
  private val Grid = "#e7e6e3"
  private val Series = "#2a78d6"

  private val PanelW = 380
  private val PanelH = 230
  private val M = (48, 14, 30, 120) // left, top, bottom, right (label gutter)

  private def fmt(d: Double): String =
    String.format(java.util.Locale.ROOT, if (d == d.floor && d.abs < 1e6) "%.0f" else "%.4g", Double.box(d))

  private def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")

  /** One panel: log-log polylines for every query in `rows` (one family). */
  private def panel(family: String, rows: Seq[Row], value: Row => Double,
                    ox: Int, oy: Int): String = {
    val pts = rows.map(r => (r.query, r.sf, math.max(value(r), 1e-4)))
    val (xs, ys) = (pts.map(_._2), pts.map(_._3))
    val (lx0, lx1) = (log10(xs.min), log10(xs.max))
    val (ly0, ly1) = (log10(ys.min).floor, log10(ys.max).ceil.max(log10(ys.min).floor + 1))
    val (w, h) = (PanelW - M._1 - M._4, PanelH - M._2 - M._3)
    def px(x: Double) = ox + M._1 + (if (lx1 > lx0) (log10(x) - lx0) / (lx1 - lx0) * w else w / 2.0)
    def py(y: Double) = oy + M._2 + h - (log10(y) - ly0) / (ly1 - ly0) * h

    val sb = new StringBuilder
    sb ++= s"""<text x="${ox + M._1}" y="${oy + 11}" fill="$Ink" font-size="11" font-weight="600">${esc(family)}</text>\n"""
    // recessive grid + tick labels at decade lines
    (ly0.toInt to ly1.toInt).foreach { e =>
      val y = py(pow(10, e))
      sb ++= s"""<line x1="${ox + M._1}" y1="$y" x2="${ox + M._1 + w}" y2="$y" stroke="$Grid" stroke-width="1"/>\n"""
      sb ++= s"""<text x="${ox + M._1 - 4}" y="${y + 3}" fill="$InkSecondary" font-size="8" text-anchor="end">${fmt(pow(10, e))}</text>\n"""
    }
    xs.distinct.sorted.foreach { x =>
      sb ++= s"""<text x="${px(x)}" y="${oy + PanelH - M._3 + 12}" fill="$InkSecondary" font-size="8" text-anchor="middle">${fmt(x)}</text>\n"""
    }
    // one polyline + markers per query, all in the single series hue
    val byQuery = pts.groupBy(_._1).toSeq.sortBy(_._1)
    val ends = byQuery.map { case (q, qp) =>
      val sorted = qp.sortBy(_._2)
      val path = sorted.map(p => s"${px(p._2)},${py(p._3)}").mkString(" ")
      sb ++= s"""<polyline points="$path" fill="none" stroke="$Series" stroke-width="2" stroke-opacity="0.55"/>\n"""
      sorted.foreach(p =>
        sb ++= s"""<circle cx="${px(p._2)}" cy="${py(p._3)}" r="2.5" fill="$Series"/>\n""")
      (q, py(sorted.last._3))
    }
    // direct labels, nudged apart so they never collide (identity lives
    // here, not in color). Downward nudging alone lets a cluster near the
    // panel bottom spill into the next panel's area, so the finished stack
    // is shifted back up to fit inside this panel's height.
    var prev = Double.NegativeInfinity
    val placed = ends.sortBy(_._2).map { case (q, yRaw) =>
      val y = math.max(yRaw, prev + 9.5)
      prev = y
      (q, y)
    }
    val bottom = oy + PanelH - 6
    val top = oy + 16
    val overflow = if (placed.nonEmpty) math.max(0.0, placed.last._2 - bottom) else 0.0
    val shift = if (placed.nonEmpty) math.min(overflow, math.max(0.0, placed.head._2 - top)) else 0.0
    // a stack taller than the panel can still overshoot after the uniform
    // shift; per-label clamp to [top, bottom] keeps every label inside this
    // panel (labels may then overlap — containment beats cross-panel spill)
    placed.foreach { case (q, y) =>
      val yc = math.min(bottom, math.max(top, y - shift))
      sb ++= s"""<text x="${ox + M._1 + w + 6}" y="${yc + 3}" fill="$InkSecondary" font-size="8">${esc(q)}</text>\n"""
    }
    sb.toString
  }

  /** `name@<axis-letter><int>` parse for overlay rows; None for anything
    * that does not match EXACTLY that shape ("@foo", "@h", "a@b@c"), so
    * the caller can route malformed names somewhere visible instead of
    * this function guessing at them. */
  private def parseAxis(q: String): Option[(String, Char, Int)] =
    q.split("@") match {
      case Array(base, suf) if suf.length > 1 && suf.tail.forall(_.isDigit) =>
        Some((base, suf.head, suf.tail.toInt))
      case _ => None
    }

  /** `@`-suffixed overlay rows (g_khop_grid@h3, g_ssp_pair@d50) carry
    * their own axis — the reference's bench_traversal/bench_spp iterate
    * hop count / target depth, not just graph size. Regrouped here: one
    * panel per (base query, sf), x = the numeric suffix. Callers must
    * pre-filter with [[parseAxis]]. */
  private def axisPanels(rows: Seq[Row], value: Row => Double,
                         startY: Int): (String, Int) = {
    val ax = rows.flatMap(r => parseAxis(r.query).map { case (b, a, v) => (b, a, v, r) })
    val panels = ax.groupBy(t => (t._1, t._2)).toSeq
      .sortBy { case ((b, a), _) => (b, a) }
      .map { case ((base, axis), ts) =>
        // reuse the log-log panel machinery with the suffix as the x axis
        // (hops/depths are small positive ints, log-x keeps spacing sane);
        // one series per SF so the axis cost curve is read per graph size
        val rr = ts.map(t => Row(s"sf=${t._4.sf}", t._3.toDouble,
          t._4.seconds, t._4.cpuS, t._4.peakMb))
        (s"$base by $axis", rr)
      }
    val cols = 2
    val body = panels.zipWithIndex.map { case ((title, rr), i) =>
      panel(title, rr, value, 10 + (i % cols) * PanelW,
        startY + (i / cols) * PanelH)
    }.mkString
    (body, (panels.size + cols - 1) / cols * PanelH)
  }

  /** Full SVG: small multiples by query family (x = scale factor), plus
    * one panel per overlay axis (x = hops / target depth). */
  def svg(rows: Seq[Row], metricName: String, value: Row => Double): String = {
    // only rows whose name parses as a real axis overlay go to the axis
    // panels; a malformed '@' name ("x@foo", "x@h", double '@') falls back
    // into its family panel and renders under its full name — a bad
    // overlay name must degrade visibly, never vanish from the plot
    val (axisRows, sfRows) = rows.partition(r => parseAxis(r.query).isDefined)
    // family = leading letters ("q1_pricing_summary" → "q", "g_pagerank" → "g")
    val fams = sfRows.groupBy(_.query.takeWhile(_.isLetter)).toSeq.sortBy(_._1)
    val cols = 2
    val nRows = (fams.size + cols - 1) / cols
    val famH = nRows * PanelH
    val body = fams.zipWithIndex.map { case ((fam, fr), i) =>
      panel(s"$fam ($metricName)", fr, value,
        10 + (i % cols) * PanelW, 30 + (i / cols) * PanelH)
    }.mkString
    val (axBody, axH) = axisPanels(axisRows, value, 30 + famH)
    val (totalW, totalH) = (cols * PanelW + 20, famH + axH + 40)
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$totalW" height="$totalH" font-family="sans-serif">
       |<rect width="$totalW" height="$totalH" fill="$Surface"/>
       |<text x="10" y="18" fill="$Ink" font-size="13" font-weight="600">graft bench sweep — $metricName vs scale factor (log-log)</text>
       |$body$axBody</svg>""".stripMargin
  }

  /** Reads BENCH_SWEEP.csv (or argv(0)) and writes one SVG per metric. */
  def main(args: Array[String]): Unit = {
    val in = args.headOption.getOrElse("BENCH_SWEEP.csv")
    val rows = parseCsv(Files.readString(Paths.get(in)))
    Seq[(String, Row => Double)](
      ("seconds", _.seconds), ("cpu_seconds", _.cpuS)).foreach { case (name, f) =>
      val out = s"BENCH_PLOT_$name.svg"
      Files.writeString(Paths.get(out), svg(rows, name, f))
      println(s"wrote $out")
    }
  }
}
