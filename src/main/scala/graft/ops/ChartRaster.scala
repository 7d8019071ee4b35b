package graft.ops

import java.awt.{BasicStroke, Color, Font, RenderingHints}
import java.awt.image.BufferedImage
import graft.multimodal.ImageCodec

/** Raster (PNG) chart renderer — closes the binary half of the reference's
  * report export (SQL_DATA_INTEGRATION_TOOL.py:1318-1348 embeds the drawn
  * matplotlib figure into a PdfPages/PNG artifact). Zero new dependencies:
  * the same JDK AWT + ImageIO stack as [[graft.multimodal.ImageCodec]]
  * draws the identical bar/line/pie geometry as [[ChartSvg]] onto a
  * BufferedImage and encodes PNG. Driver-side over the already-aggregated
  * (label, value) chart rows — small by construction (see [[Reports]]). */
object ChartRaster {

  private val W = 640
  private val H = 400
  private val MarginL = 60
  private val MarginB = 70
  private val MarginT = 40
  private val MarginR = 20
  // same tab10 palette as ChartSvg
  private val Palette = Seq("#1f77b4", "#ff7f0e", "#2ca02c", "#d62728",
    "#9467bd", "#8c564b", "#e377c2", "#7f7f7f", "#bcbd22", "#17becf")
    .map(Color.decode)

  private def fmt(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
    else f"$d%.2f"

  /** Render `chartType` ("bar" | "line" | "pie") to PNG bytes. */
  def render(chartType: String, data: Seq[(String, Double)], title: String): Array[Byte] = {
    val img = new BufferedImage(W, H, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_ANTIALIASING,
        RenderingHints.VALUE_ANTIALIAS_ON)
      g.setColor(Color.WHITE)
      g.fillRect(0, 0, W, H)
      g.setColor(Color.BLACK)
      g.setFont(new Font(Font.SANS_SERIF, Font.BOLD, 16))
      drawCentered(g, title, W / 2, 24)
      g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 10))
      chartType.toLowerCase match {
        case "bar"  => bar(g, data)
        case "line" => line(g, data)
        case "pie"  => pie(g, data)
        case other  => throw new IllegalArgumentException(
          s"unknown chart type '$other' (expected bar|line|pie)")
      }
    } finally g.dispose()
    ImageCodec.encode(img, "png")
  }

  private def drawCentered(g: java.awt.Graphics2D, s: String, x: Int, y: Int): Unit = {
    val w = g.getFontMetrics.stringWidth(s)
    g.drawString(s, x - w / 2, y)
  }

  private def axes(g: java.awt.Graphics2D, maxY: Double): Unit = {
    val plotH = H - MarginT - MarginB
    (0 to 4).foreach { i =>
      val y = H - MarginB - plotH * i / 4
      g.setColor(new Color(0xDD, 0xDD, 0xDD))
      g.drawLine(MarginL - 4, y, W - MarginR, y)
      g.setColor(Color.BLACK)
      val label = fmt(maxY * i / 4)
      g.drawString(label, MarginL - 8 - g.getFontMetrics.stringWidth(label), y + 4)
    }
    g.drawLine(MarginL, MarginT, MarginL, H - MarginB)
    g.drawLine(MarginL, H - MarginB, W - MarginR, H - MarginB)
  }

  private def xLabel(g: java.awt.Graphics2D, x: Double, label: String): Unit = {
    val g2 = g.create().asInstanceOf[java.awt.Graphics2D]
    try {
      g2.rotate(math.toRadians(-35), x, H - MarginB + 14)
      val w = g2.getFontMetrics.stringWidth(label)
      g2.drawString(label, (x - w).toFloat, (H - MarginB + 14).toFloat)
    } finally g2.dispose()
  }

  private def bar(g: java.awt.Graphics2D, data: Seq[(String, Double)]): Unit = {
    require(data.nonEmpty, "bar chart needs at least one row")
    val maxY = math.max(data.map(_._2).max, 1e-9)
    val plotW = W - MarginL - MarginR
    val plotH = H - MarginT - MarginB
    val bw = plotW.toDouble / data.size
    axes(g, maxY)
    data.zipWithIndex.foreach { case ((label, v), i) =>
      val h = math.max(0.0, v / maxY) * plotH
      val x = MarginL + i * bw
      g.setColor(Palette(i % Palette.size))
      g.fillRect((x + bw * 0.1).round.toInt, (H - MarginB - h).round.toInt,
        (bw * 0.8).round.toInt, h.round.toInt)
      g.setColor(Color.BLACK)
      xLabel(g, x + bw / 2, label)
    }
  }

  private def line(g: java.awt.Graphics2D, data: Seq[(String, Double)]): Unit = {
    require(data.nonEmpty, "line chart needs at least one row")
    val maxY = math.max(data.map(_._2).max, 1e-9)
    val plotW = W - MarginL - MarginR
    val plotH = H - MarginT - MarginB
    val step = if (data.size == 1) 0.0 else plotW.toDouble / (data.size - 1)
    axes(g, maxY)
    val pts = data.zipWithIndex.map { case ((_, v), i) =>
      (MarginL + i * step, H - MarginB - math.max(0.0, v / maxY) * plotH)
    }
    g.setColor(Palette.head)
    g.setStroke(new BasicStroke(2f))
    pts.sliding(2).foreach {
      case Seq((x1, y1), (x2, y2)) =>
        g.drawLine(x1.round.toInt, y1.round.toInt, x2.round.toInt, y2.round.toInt)
      case _ => ()
    }
    pts.foreach { case (x, y) =>
      g.fillOval(x.round.toInt - 3, y.round.toInt - 3, 6, 6)
    }
    g.setColor(Color.BLACK)
    data.zipWithIndex.foreach { case ((label, _), i) =>
      xLabel(g, MarginL + i * step, label)
    }
  }

  private def pie(g: java.awt.Graphics2D, data: Seq[(String, Double)]): Unit = {
    val pos = data.filter(_._2 > 0)
    require(pos.nonEmpty, "pie chart needs at least one positive value")
    val total = pos.map(_._2).sum
    val cx = W / 2.0
    val cy = (H + MarginT) / 2.0
    val r = math.min(W, H - MarginT - 20) / 2.0 - 40
    // noon start, clockwise — same convention as ChartSvg / matplotlib
    var startDeg = 90.0
    pos.zipWithIndex.foreach { case ((label, v), i) =>
      val sweepDeg = v / total * 360.0
      g.setColor(Palette(i % Palette.size))
      g.fillArc((cx - r).round.toInt, (cy - r).round.toInt,
        (2 * r).round.toInt, (2 * r).round.toInt,
        // AWT arcs are counter-clockwise from 3 o'clock ⇒ negative sweep
        math.round(startDeg - sweepDeg).toInt, math.round(sweepDeg).toInt)
      val midRad = math.toRadians(startDeg - sweepDeg / 2)
      val lx = cx + (r + 22) * math.cos(midRad)
      val ly = cy - (r + 22) * math.sin(midRad)
      g.setColor(Color.BLACK)
      drawCentered(g, s"$label (${fmt(v / total * 100)}%)",
        lx.round.toInt, ly.round.toInt)
      startDeg -= sweepDeg
    }
  }
}
