package graft.ops

import java.io.ByteArrayOutputStream

/** Minimal single-page PDF writer — the last piece of the reference's
  * report export (SQL_DATA_INTEGRATION_TOOL.py:1318-1348 hands the user a
  * PdfPages file with the drawn graph). Zero dependencies: a PDF is plain
  * text objects + a cross-reference table (ISO 32000); the chart raster
  * ([[ChartRaster]]) is embedded as a JPEG image XObject (DCTDecode — the
  * one raster codec PDF borrows that the JDK also writes natively).
  * Deterministic: same chart data → same bytes. */
object ChartPdf {

  /** One-page PDF (letter-ish page sized to the chart) containing the
    * rendered chart. */
  def render(chartType: String, data: Seq[(String, Double)], title: String): Array[Byte] = {
    val img = ChartRaster.render(chartType, data, title)
    val decoded = graft.multimodal.ImageCodec.decode(img)
      .getOrElse(throw new IllegalStateException("chart raster must decode"))
    wrapJpeg(graft.multimodal.ImageCodec.encode(decoded, "jpeg"),
      decoded.getWidth, decoded.getHeight)
  }

  /** Wrap raw JPEG bytes as a single-page PDF showing the image 1:1
    * (1 px = 1 pt). Public for reuse/testing. */
  def wrapJpeg(jpeg: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    def bytes(s: String): Array[Byte] =
      s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    def obj(body: Array[Byte]): Unit = { offsets += out.size(); out.write(body) }

    out.write(bytes("%PDF-1.4\n"))
    obj(bytes("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"))
    obj(bytes("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"))
    obj(bytes(s"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 $w $h] " +
      "/Resources << /XObject << /Im0 4 0 R >> >> /Contents 5 0 R >>\nendobj\n"))
    val imgHead = s"4 0 obj\n<< /Type /XObject /Subtype /Image /Width $w /Height $h " +
      s"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode " +
      s"/Length ${jpeg.length} >>\nstream\n"
    offsets += out.size()
    out.write(bytes(imgHead)); out.write(jpeg); out.write(bytes("\nendstream\nendobj\n"))
    val content = s"q $w 0 0 $h 0 0 cm /Im0 Do Q\n"
    obj(bytes(s"5 0 obj\n<< /Length ${content.length} >>\nstream\n$content" +
      "endstream\nendobj\n"))

    val xref = out.size()
    val sb = new StringBuilder(s"xref\n0 ${offsets.size + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size ${offsets.size + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xref\n%%EOF\n")
    out.write(bytes(sb.toString))
    out.toByteArray
  }
}
