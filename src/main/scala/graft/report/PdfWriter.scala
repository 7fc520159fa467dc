package graft.report

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Minimal hand-rolled PDF 1.4 writer — closes the S8 gap (the reference
  * renders its weekly report with reportlab, Health_Jim.py:1044-1136)
  * without any PDF library: base-14 Courier (no font embedding needed),
  * one content stream per page, correct xref byte offsets. Output opens
  * in any conforming viewer.
  *
  * Deliberately tiny: monospaced text lines only — exactly what the
  * report sections need. Latin-1 is the PDF string encoding for the
  * standard fonts; characters outside it are replaced with '?'.
  */
/** A vector chart page: drawn with raw PDF path/fill operators (re/f
  * for bars, m/l/S for polylines and axes) — the reference embeds
  * matplotlib PNGs in its reportlab document (Health_Jim.py:1044-1136);
  * vector primitives give the same visual without any raster encoder.
  */
sealed trait PdfChart { def title: String }

/** Horizontal-category bar chart (the "top diseases" shape). */
final case class BarChart(title: String,
                          bars: Seq[(String, Double)]) extends PdfChart

/** X-Y polyline (the "metric trend over years" shape). */
final case class LineChart(title: String,
                           points: Seq[(Double, Double)]) extends PdfChart

/** X-Y point cloud (the "access vs mortality" shape —
  * Health_Jim.py:474-483 scatters the two columns raw). */
final case class ScatterChart(title: String,
                              points: Seq[(Double, Double)]) extends PdfChart

object PdfWriter {

  private val PageW = 612 // US Letter, points
  private val PageH = 792
  private val FontSize = 9
  private val Leading = 12
  private val MarginX = 40
  private val MarginY = 40
  val LinesPerPage: Int = (PageH - 2 * MarginY) / Leading // 59

  private def escape(s: String): String =
    s.flatMap {
      case '(' => "\\("
      case ')' => "\\)"
      case '\\' => "\\\\"
      case c if c.toInt >= 32 && c.toInt <= 255 => c.toString
      case _ => "?"
    }

  private def text(x: Double, y: Double, size: Int, s: String): String =
    f"BT /F1 $size Tf $x%.1f $y%.1f Td (${escape(s)}) Tj ET\n"

  /** One chart = one page's content stream of vector drawing ops. */
  private def chartContent(c: PdfChart): String = {
    val sb = new StringBuilder
    val (x0, y0) = (90.0, 140.0)                 // plot-area origin
    val (w, h) = (PageW - 180.0, PageH - 320.0)  // plot-area extent
    sb.append(text(MarginX, PageH - MarginY - 20, 14, c.title))
    // axes
    sb.append(f"0.8 w 0 0 0 RG $x0%.1f ${y0 + h}%.1f m $x0%.1f $y0%.1f l ${x0 + w}%.1f $y0%.1f l S\n")
    c match {
      case BarChart(_, bars) if bars.nonEmpty =>
        val maxV = math.max(bars.map(_._2).max, 1e-12)
        val bw = w / bars.size
        sb.append(text(x0 - 10 - 8.0 * f"$maxV%.2f".length, y0 + h - 3, 8, f"$maxV%.2f"))
        sb.append(text(x0 - 18, y0 - 3, 8, "0"))
        bars.zipWithIndex.foreach { case ((label, v), i) =>
          val bh = math.max(v / maxV * h, 0.0)
          val bx = x0 + i * bw + bw * 0.15
          sb.append(f"0.27 0.45 0.77 rg $bx%.1f $y0%.1f ${bw * 0.7}%.1f $bh%.1f re f\n")
          sb.append(text(bx, y0 + bh + 4, 7, f"$v%.2f"))
          // category label: truncated to the bar slot, small font
          val keep = math.max((bw / 5.0).toInt, 4)
          sb.append(text(x0 + i * bw + 2, y0 - 14, 7, label.take(keep)))
        }
      case LineChart(_, pts) if pts.nonEmpty =>
        val sorted = pts.sortBy(_._1)
        val (xs, ys) = (sorted.map(_._1), sorted.map(_._2))
        val (xMin, xMax) = (xs.min, xs.max)
        val (yMin, yMax) = (ys.min, ys.max)
        val xSpan = math.max(xMax - xMin, 1e-12)
        val ySpan = math.max(yMax - yMin, 1e-12)
        def px(x: Double) = x0 + (x - xMin) / xSpan * w
        def py(y: Double) = y0 + (y - yMin) / ySpan * h
        sb.append(f"1.2 w 0.27 0.45 0.77 RG ${px(xs.head)}%.1f ${py(ys.head)}%.1f m\n")
        sorted.tail.foreach { case (x, y) => sb.append(f"${px(x)}%.1f ${py(y)}%.1f l\n") }
        sb.append("S\n")
        // corner tick labels: x extremes below the axis, y extremes left
        sb.append(text(x0, y0 - 14, 8, f"$xMin%.0f"))
        sb.append(text(x0 + w - 24, y0 - 14, 8, f"$xMax%.0f"))
        sb.append(text(x0 - 10 - 8.0 * f"$yMax%.3f".length, y0 + h - 3, 8, f"$yMax%.3f"))
        sb.append(text(x0 - 10 - 8.0 * f"$yMin%.3f".length, y0 - 3, 8, f"$yMin%.3f"))
      case ScatterChart(_, pts) if pts.nonEmpty =>
        val (xs, ys) = (pts.map(_._1), pts.map(_._2))
        val (xMin, xMax) = (xs.min, xs.max)
        val (yMin, yMax) = (ys.min, ys.max)
        val xSpan = math.max(xMax - xMin, 1e-12)
        val ySpan = math.max(yMax - yMin, 1e-12)
        def px(x: Double) = x0 + (x - xMin) / xSpan * w
        def py(y: Double) = y0 + (y - yMin) / ySpan * h
        // one small filled square per point, centered on (px, py)
        sb.append("0.27 0.45 0.77 rg\n")
        pts.foreach { case (x, y) =>
          sb.append(f"${px(x) - 1.4}%.1f ${py(y) - 1.4}%.1f 2.8 2.8 re f\n")
        }
        sb.append(text(x0, y0 - 14, 8, f"$xMin%.2f"))
        sb.append(text(x0 + w - 30, y0 - 14, 8, f"$xMax%.2f"))
        sb.append(text(x0 - 10 - 8.0 * f"$yMax%.3f".length, y0 + h - 3, 8, f"$yMax%.3f"))
        sb.append(text(x0 - 10 - 8.0 * f"$yMin%.3f".length, y0 - 3, 8, f"$yMin%.3f"))
      case _ =>
        sb.append(text(x0, y0 + h / 2, 10, "(no data)"))
    }
    sb.toString
  }

  /** Render text lines (plus optional vector chart pages) into a
    * complete PDF byte stream. */
  def render(lines: Seq[String], charts: Seq[PdfChart] = Nil): Array[Byte] = {
    val textPages = if (lines.isEmpty) Seq(Seq("")) else lines.grouped(LinesPerPage).toSeq
    val nPages = textPages.size + charts.size
    // object ids: 1 catalog, 2 pages, 3 font, then per page i:
    //   4+2i page object, 5+2i content stream
    val objects = scala.collection.mutable.ArrayBuffer[String]()
    objects += "<< /Type /Catalog /Pages 2 0 R >>"
    val kids = (0 until nPages).map(i => s"${4 + 2 * i} 0 R").mkString(" ")
    objects += s"<< /Type /Pages /Kids [$kids] /Count $nPages >>"
    objects += "<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>"
    val contents = textPages.map { pageLines =>
      val sb = new StringBuilder
      sb.append(s"BT /F1 $FontSize Tf $MarginX ${PageH - MarginY} Td $Leading TL\n")
      pageLines.foreach { l => sb.append("T*\n(").append(escape(l)).append(") Tj\n") }
      sb.append("ET")
      sb.toString
    } ++ charts.map(chartContent)
    contents.foreach { content =>
      objects += s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 $PageW $PageH] " +
        s"/Resources << /Font << /F1 3 0 R >> >> /Contents ${objects.size + 2} 0 R >>"
      objects += s"<< /Length ${content.getBytes(StandardCharsets.ISO_8859_1).length} >>\n" +
        s"stream\n$content\nendstream"
    }

    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n")
    val offsets = objects.zipWithIndex.map { case (body, i) =>
      val off = out.size()
      w(s"${i + 1} 0 obj\n$body\nendobj\n")
      off
    }
    val xrefOff = out.size()
    w(s"xref\n0 ${objects.size + 1}\n")
    w("0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${objects.size + 1} /Root 1 0 R >>\nstartxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }
}

/** S8 — PDF report sink: same section inventory as the reference's
  * reportlab document, rendered by [[PdfWriter]]; charts become vector
  * pages (the reference embeds its matplotlib figures,
  * Health_Jim.py:1095-1116). */
final class PdfReportSink(outPath: String) extends ReportSink {
  def write(reportName: String, sections: Seq[(String, String)]): String =
    write(reportName, sections, Nil)
  override def write(reportName: String, sections: Seq[(String, String)],
                     charts: Seq[PdfChart]): String = {
    val lines = Seq("=" * 80, reportName, "=" * 80) ++
      sections.flatMap { case (title, body) =>
        Seq("", title, "-" * title.length) ++ body.linesIterator.toSeq
      }
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      PdfWriter.render(lines, charts))
    outPath
  }
}
