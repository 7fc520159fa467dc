package graft

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.report.XlsxWriter

/** S9 — the hand-rolled XLSX must be a well-formed SpreadsheetML
  * package: correct zip part inventory, XML that actually parses, sheet
  * relationships that line up, and faithful cell values.
  */
class XlsxSpec extends AnyFunSuite {

  private def unzip(bytes: Array[Byte]): Map[String, String] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    Iterator.continually(zin.getNextEntry).takeWhile(_ != null).map { e =>
      e.getName -> new String(zin.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    }.toMap
  }

  private def parseXml(s: String): org.w3c.dom.Document = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    f.newDocumentBuilder().parse(new ByteArrayInputStream(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
  }

  test("package inventory + every part parses as XML") {
    val bytes = XlsxWriter.render(Seq(
      "Overview" -> Seq(Seq("metric", "value"), Seq("rows", "10006")),
      "Costs" -> Seq(Seq("disease", "avg"), Seq("Cancer", "11800.97"))))
    val parts = unzip(bytes)
    Seq("[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
        "xl/_rels/workbook.xml.rels", "xl/worksheets/sheet1.xml",
        "xl/worksheets/sheet2.xml").foreach(p =>
      assert(parts.contains(p), s"missing part $p"))
    parts.values.foreach(parseXml) // throws on malformed XML
    // workbook sheet entries reference rIds that the rels part defines
    val wb = parts("xl/workbook.xml")
    val rels = parts("xl/_rels/workbook.xml.rels")
    Seq("rId1", "rId2").foreach { id =>
      assert(wb.contains(s"""r:id="$id""""), s"workbook missing $id")
      assert(rels.contains(s"""Id="$id""""), s"rels missing $id")
    }
  }

  test("cells: numeric values are numbers, text is inline, XML is escaped") {
    val parts = unzip(XlsxWriter.render(Seq("S" -> Seq(
      Seq("12.5", "-3", "1e-4", "Tom & Jerry <html>", "")))))
    val sheet = parts("xl/worksheets/sheet1.xml")
    assert(sheet.contains("""<c r="A1"><v>12.5</v></c>"""))
    assert(sheet.contains("""<c r="B1"><v>-3</v></c>"""))
    assert(sheet.contains("""<c r="C1"><v>1e-4</v></c>"""))
    assert(sheet.contains("Tom &amp; Jerry &lt;html&gt;"))
    parseXml(sheet)
  }

  test("column refs pass Z/AA/AZ boundaries; sheet names sanitize + dedupe") {
    assert(XlsxWriter.colRef(0) == "A" && XlsxWriter.colRef(25) == "Z")
    assert(XlsxWriter.colRef(26) == "AA" && XlsxWriter.colRef(51) == "AZ")
    assert(XlsxWriter.colRef(701) == "ZZ" && XlsxWriter.colRef(702) == "AAA")
    // 30 columns forces two-letter refs in a real sheet
    val wide = (0 until 30).map(_.toString)
    val sheet = unzip(XlsxWriter.render(Seq("W" -> Seq(wide))))("xl/worksheets/sheet1.xml")
    assert(sheet.contains("""<c r="AD1"><v>29</v></c>"""))
    // name rules: ≤31 chars, illegal chars stripped, duplicates suffixed
    assert(XlsxWriter.sheetName("a" * 40, Set.empty).length == 31)
    assert(XlsxWriter.sheetName("bad[name]:*?", Set.empty) == "bad name")
    assert(XlsxWriter.sheetName("Dup", Set("Dup")) == "Dup 2")
  }
}
