package graft

import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Minimal xlsx writer for tests: full OOXML part set, shared strings
  * for text cells, plain `<v>` for numeric cells, so the reader's
  * shared-string and raw-value paths are both exercised.
  */
object TestXlsx {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def colRef(i: Int): String = {
    var n = i + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private def isNum(s: String): Boolean =
    s != null && s.nonEmpty && s.matches("-?\\d+(\\.\\d+)?")

  /** Write `header :: rows` as sheet1. A null cell is skipped entirely
    * (no `<c>` element) — the reader must realign by cell reference.
    */
  def write(path: String, header: Seq[String], rows: Seq[Seq[String]]): String = {
    val allRows = header +: rows
    val strings = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def sid(s: String): Int = strings.getOrElseUpdate(s, strings.size)

    val sheetRows = allRows.zipWithIndex.map { case (cells, ri) =>
      val cs = cells.zipWithIndex.collect {
        case (v, ci) if v != null =>
          val ref = s"${colRef(ci)}${ri + 1}"
          if (isNum(v)) s"""<c r="$ref"><v>$v</v></c>"""
          else s"""<c r="$ref" t="s"><v>${sid(v)}</v></c>"""
      }
      s"""<row r="${ri + 1}">${cs.mkString}</row>"""
    }
    val sheetXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |<sheetData>${sheetRows.mkString}</sheetData></worksheet>""".stripMargin
    val ssXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${strings.size}" uniqueCount="${strings.size}">
         |${strings.keys.map(s => s"<si><t>${esc(s)}</t></si>").mkString}</sst>""".stripMargin
    val parts = Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
          |</Types>""".stripMargin,
      "_rels/.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin,
      "xl/workbook.xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin,
      "xl/_rels/workbook.xml.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>
          |</Relationships>""".stripMargin,
      "xl/sharedStrings.xml" -> ssXml,
      "xl/worksheets/sheet1.xml" -> sheetXml)

    val out = new ZipOutputStream(Files.newOutputStream(Paths.get(path)))
    try parts.foreach { case (name, content) =>
      out.putNextEntry(new ZipEntry(name))
      out.write(content.getBytes("UTF-8"))
      out.closeEntry()
    } finally out.close()
    path
  }
}
