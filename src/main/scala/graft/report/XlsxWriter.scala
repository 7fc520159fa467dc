package graft.report

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Minimal hand-rolled XLSX writer — closes the S9 gap (the reference
  * exports its report tables as a multi-sheet Excel workbook via
  * pandas.ExcelWriter, nb:cell28:213-238) without any spreadsheet
  * library: an .xlsx file is a ZIP of SpreadsheetML parts, and
  * `java.util.zip` + string templates cover everything a tabular report
  * needs. Numeric-looking cells are written as numbers, everything else
  * as inline strings (no shared-string table — simpler, and fine at
  * report scale). Output opens in Excel/LibreOffice.
  */
object XlsxWriter {

  /** Excel sheet names: ≤31 chars, none of []:*?/\ — and unique. */
  private[graft] def sheetName(raw: String, used: Set[String]): String = {
    val base = raw.replaceAll("[\\[\\]:*?/\\\\]", " ").trim.take(31)
    val name = if (base.isEmpty) "Sheet" else base
    if (!used(name)) name
    else Iterator.from(2).map(i => name.take(31 - (i.toString.length + 1)) + s" $i")
      .find(!used(_)).get
  }

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c if c.toInt < 32 && c != '\t' => "" // control chars are invalid in XML 1.0
      case c => c.toString
    }

  private val NumberRe = """-?\d+(\.\d+)?([eE][+-]?\d+)?""".r

  /** A1-style column ref for 0-based column index. */
  private[graft] def colRef(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private def sheetXml(rows: Seq[Seq[String]]): String = {
    val body = rows.zipWithIndex.map { case (cells, r) =>
      val cs = cells.zipWithIndex.map { case (v, c) =>
        val ref = s"${colRef(c)}${r + 1}"
        if (NumberRe.matches(v))
          s"""<c r="$ref"><v>$v</v></c>"""
        else
          s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${xmlEscape(v)}</t></is></c>"""
      }.mkString
      s"""<row r="${r + 1}">$cs</row>"""
    }.mkString
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$body</sheetData></worksheet>""".stripMargin
  }

  /** Render (sheetName, rows-of-cells) pairs into a complete XLSX. */
  def render(sheets: Seq[(String, Seq[Seq[String]])]): Array[Byte] = {
    val named = sheets.foldLeft(Vector.empty[(String, Seq[Seq[String]])]) {
      case (acc, (raw, rows)) => acc :+ (sheetName(raw, acc.map(_._1).toSet) -> rows)
    }
    val n = named.size.max(1)
    val contentTypes =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
         |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
         |<Default Extension="xml" ContentType="application/xml"/>
         |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
         |${(1 to n).map(i => s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString("\n")}
         |</Types>""".stripMargin
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin
    val workbook =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<sheets>${named.zipWithIndex.map { case ((nm, _), i) =>
            s"""<sheet name="${xmlEscape(nm)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
          }.mkString}</sheets>
         |</workbook>""".stripMargin
    val wbRels =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
         |${named.indices.map(i => s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>""").mkString("\n")}
         |</Relationships>""".stripMargin

    val out = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(out, StandardCharsets.UTF_8)
    def entry(path: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(path))
      zip.write(content.getBytes(StandardCharsets.UTF_8))
      zip.closeEntry()
    }
    entry("[Content_Types].xml", contentTypes)
    entry("_rels/.rels", rootRels)
    entry("xl/workbook.xml", workbook)
    entry("xl/_rels/workbook.xml.rels", wbRels)
    named.zipWithIndex.foreach { case ((_, rows), i) =>
      entry(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(rows))
    }
    zip.close()
    out.toByteArray
  }
}

/** S9 — Excel report sink: one sheet per report section, cells split
  * from the section's ` | `-delimited table rendering (the same table
  * text every other sink shows; single-paragraph sections become a
  * one-cell sheet). */
final class ExcelReportSink(outPath: String) extends ReportSink {
  def write(reportName: String, sections: Seq[(String, String)]): String = {
    val sheets = (reportName -> Seq(Seq(reportName))) +:
      sections.map { case (title, body) =>
        title -> body.linesIterator.map(_.split(" \\| ", -1).toSeq).toSeq
      }
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      XlsxWriter.render(sheets))
    outPath
  }
}
