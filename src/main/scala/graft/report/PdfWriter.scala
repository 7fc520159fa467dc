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

  /** Render text lines into a complete PDF byte stream. */
  def render(lines: Seq[String]): Array[Byte] = {
    val pages = if (lines.isEmpty) Seq(Seq("")) else lines.grouped(LinesPerPage).toSeq
    val nPages = pages.size
    // object ids: 1 catalog, 2 pages, 3 font, then per page i:
    //   4+2i page object, 5+2i content stream
    val objects = scala.collection.mutable.ArrayBuffer[String]()
    objects += "<< /Type /Catalog /Pages 2 0 R >>"
    val kids = (0 until nPages).map(i => s"${4 + 2 * i} 0 R").mkString(" ")
    objects += s"<< /Type /Pages /Kids [$kids] /Count $nPages >>"
    objects += "<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>"
    pages.foreach { pageLines =>
      val content = {
        val sb = new StringBuilder
        sb.append(s"BT /F1 $FontSize Tf $MarginX ${PageH - MarginY} Td $Leading TL\n")
        pageLines.foreach { l => sb.append("T*\n(").append(escape(l)).append(") Tj\n") }
        sb.append("ET")
        sb.toString
      }
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
  * reportlab document, rendered by [[PdfWriter]]. */
final class PdfReportSink(outPath: String) extends ReportSink {
  def write(reportName: String, sections: Seq[(String, String)]): String = {
    val lines = Seq("=" * 80, reportName, "=" * 80) ++
      sections.flatMap { case (title, body) =>
        Seq("", title, "-" * title.length) ++ body.linesIterator.toSeq
      }
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      PdfWriter.render(lines))
    outPath
  }
}
