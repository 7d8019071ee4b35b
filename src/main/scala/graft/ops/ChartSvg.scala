package graft.ops

/** Zero-dependency SVG chart renderer — the engine-side analog of the
  * reference's matplotlib rendering in `export_dynamic_report`
  * (SQL_DATA_INTEGRATION_TOOL.py:1268-1361, which embeds the drawn
  * bar/line/pie graph into the exported PDF/PNG). SVG instead of a raster:
  * it needs no codec at all (plain XML the JDK writes as text), any
  * browser/office tool opens it, and the output is byte-deterministic —
  * same data, same bytes, which keeps report exports diffable and
  * testable. Chart data is the already-aggregated (label, value) table —
  * small by construction (see [[Reports]]) — so rendering is driver-side
  * string building over at most a few hundred rows.
  */
object ChartSvg {

  private val W = 640
  private val H = 400
  private val MarginL = 60
  private val MarginB = 70
  private val MarginT = 40
  private val MarginR = 20
  // categorical palette (matplotlib "tab10" — public, ubiquitous defaults)
  private val Palette = Seq("#1f77b4", "#ff7f0e", "#2ca02c", "#d62728",
    "#9467bd", "#8c564b", "#e377c2", "#7f7f7f", "#bcbd22", "#17becf")

  private def esc(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    .replace("\"", "&quot;")

  private def fmt(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
    else f"$d%.2f"

  private def header(title: String): String =
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$W" height="$H" viewBox="0 0 $W $H">
       |<rect width="$W" height="$H" fill="white"/>
       |<text x="${W / 2}" y="24" text-anchor="middle" font-family="sans-serif" font-size="16" font-weight="bold">${esc(title)}</text>
       |""".stripMargin

  private def axes(maxY: Double): String = {
    val plotH = H - MarginT - MarginB
    val ticks = (0 to 4).map { i =>
      val v = maxY * i / 4
      val y = H - MarginB - plotH * i / 4
      s"""<line x1="${MarginL - 4}" y1="$y" x2="${W - MarginR}" y2="$y" stroke="#dddddd"/>
         |<text x="${MarginL - 8}" y="${y + 4}" text-anchor="end" font-family="sans-serif" font-size="10">${fmt(v)}</text>
         |""".stripMargin
    }.mkString
    ticks +
      s"""<line x1="$MarginL" y1="$MarginT" x2="$MarginL" y2="${H - MarginB}" stroke="black"/>
         |<line x1="$MarginL" y1="${H - MarginB}" x2="${W - MarginR}" y2="${H - MarginB}" stroke="black"/>
         |""".stripMargin
  }

  private def xLabel(x: Double, label: String): String =
    s"""<text x="$x" y="${H - MarginB + 14}" text-anchor="end" font-family="sans-serif" font-size="10" transform="rotate(-35 $x ${H - MarginB + 14})">${esc(label)}</text>
       |""".stripMargin

  /** Vertical bar chart over (label, value); values may be negative-free
    * aggregates (bars clamp at 0). */
  def bar(data: Seq[(String, Double)], title: String): String = {
    require(data.nonEmpty, "bar chart needs at least one row")
    val maxY = math.max(data.map(_._2).max, 1e-9)
    val plotW = W - MarginL - MarginR
    val plotH = H - MarginT - MarginB
    val bw = plotW.toDouble / data.size
    val bars = data.zipWithIndex.map { case ((label, v), i) =>
      val h = math.max(0.0, v / maxY) * plotH
      val x = MarginL + i * bw
      s"""<rect x="${fmt(x + bw * 0.1)}" y="${fmt(H - MarginB - h)}" width="${fmt(bw * 0.8)}" height="${fmt(h)}" fill="${Palette(i % Palette.size)}"/>
         |""".stripMargin + xLabel(x + bw / 2, label)
    }.mkString
    header(title) + axes(maxY) + bars + "</svg>\n"
  }

  /** Line chart over (label, value) in the given order. */
  def line(data: Seq[(String, Double)], title: String): String = {
    require(data.nonEmpty, "line chart needs at least one row")
    val maxY = math.max(data.map(_._2).max, 1e-9)
    val plotW = W - MarginL - MarginR
    val plotH = H - MarginT - MarginB
    val step = if (data.size == 1) 0.0 else plotW.toDouble / (data.size - 1)
    val pts = data.zipWithIndex.map { case ((_, v), i) =>
      (MarginL + i * step, H - MarginB - math.max(0.0, v / maxY) * plotH)
    }
    val path = pts.map { case (x, y) => s"${fmt(x)},${fmt(y)}" }.mkString(" ")
    val labels = data.zipWithIndex.map { case ((label, _), i) =>
      xLabel(MarginL + i * step, label)
    }.mkString
    val dots = pts.map { case (x, y) =>
      s"""<circle cx="${fmt(x)}" cy="${fmt(y)}" r="3" fill="${Palette.head}"/>
         |""".stripMargin
    }.mkString
    header(title) + axes(maxY) +
      s"""<polyline points="$path" fill="none" stroke="${Palette.head}" stroke-width="2"/>
         |""".stripMargin + dots + labels + "</svg>\n"
  }

  /** Pie chart over (label, value); non-positive slices are dropped (a
    * share of nothing), mirroring matplotlib's behavior on pie input. */
  def pie(data: Seq[(String, Double)], title: String): String = {
    val pos = data.filter(_._2 > 0)
    require(pos.nonEmpty, "pie chart needs at least one positive value")
    val total = pos.map(_._2).sum
    val cx = W / 2.0
    val cy = (H + MarginT) / 2.0
    val r = math.min(W, H - MarginT - 20) / 2.0 - 40
    var angle = -math.Pi / 2 // noon start, clockwise — matplotlib-like
    val slices = pos.zipWithIndex.map { case ((label, v), i) =>
      val sweep = v / total * 2 * math.Pi
      val (x1, y1) = (cx + r * math.cos(angle), cy + r * math.sin(angle))
      val end = angle + sweep
      val (x2, y2) = (cx + r * math.cos(end), cy + r * math.sin(end))
      val largeArc = if (sweep > math.Pi) 1 else 0
      val mid = angle + sweep / 2
      val (lx, ly) = (cx + (r + 22) * math.cos(mid), cy + (r + 22) * math.sin(mid))
      angle = end
      // a single full-circle slice degenerates to a circle element
      val shape =
        if (pos.size == 1)
          s"""<circle cx="${fmt(cx)}" cy="${fmt(cy)}" r="${fmt(r)}" fill="${Palette(i % Palette.size)}"/>"""
        else
          s"""<path d="M ${fmt(cx)} ${fmt(cy)} L ${fmt(x1)} ${fmt(y1)} A ${fmt(r)} ${fmt(r)} 0 $largeArc 1 ${fmt(x2)} ${fmt(y2)} Z" fill="${Palette(i % Palette.size)}" stroke="white"/>"""
      shape +
        s"""
           |<text x="${fmt(lx)}" y="${fmt(ly)}" text-anchor="middle" font-family="sans-serif" font-size="10">${esc(label)} (${fmt(v / total * 100)}%)</text>
           |""".stripMargin
    }.mkString
    header(title) + slices + "</svg>\n"
  }

  /** Dispatch by chart type name (the reference's graph-type combo box). */
  def render(chartType: String, data: Seq[(String, Double)], title: String): String =
    chartType.toLowerCase match {
      case "bar"  => bar(data, title)
      case "line" => line(data, title)
      case "pie"  => pie(data, title)
      case other  => throw new IllegalArgumentException(
        s"unknown chart type '$other' (expected bar|line|pie)")
    }
}
