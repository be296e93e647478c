package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.time.{LocalDate, LocalDateTime}
import java.time.temporal.ChronoUnit
import java.util.zip.{ZipEntry, ZipOutputStream}

import scala.collection.mutable

/** Typed cell values for [[XlsxWriter]]. */
sealed trait XlsxCell
object XlsxCell {
  case object Blank extends XlsxCell
  case class Str(v: String) extends XlsxCell
  case class Num(v: Double) extends XlsxCell
  case class Bool(v: Boolean) extends XlsxCell
  case class Date(v: LocalDate) extends XlsxCell
  case class DateTime(v: LocalDateTime) extends XlsxCell
}

/** One sheet to write: rows of typed cells + merged ranges ("A2:H2"). */
case class XlsxSheet(name: String, rows: Seq[Seq[XlsxCell]],
    merges: Seq[String] = Nil)

/** Minimal dependency-free XLSX writer (ECMA-376): shared strings, numeric
  * cells, date/datetime cells (1900-system serials, numFmt 14 / custom
  * `yyyy-mm-dd hh:mm:ss`), booleans, merged ranges, multiple sheets.
  * The binary-sink counterpart of [[XlsxReader]] (S-family), and the
  * generator for the committed WASDE golden fixture. */
object XlsxWriter {

  private def esc(s: String): String = {
    val sb = new java.lang.StringBuilder()
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case c   => sb.append(c)
    }
    sb.toString
  }

  def write(sheets: Seq[XlsxSheet]): Array[Byte] = {
    val shared = mutable.LinkedHashMap.empty[String, Int]
    def sharedIdx(s: String): Int =
      shared.getOrElseUpdate(s, shared.size)

    // serialize sheets first so the shared-string table fills up
    val sheetXmls = sheets.map { sheet =>
      val sb = new java.lang.StringBuilder()
      sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      sb.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      sheet.rows.zipWithIndex.foreach { case (row, r0) =>
        if (row.nonEmpty) {
          sb.append(s"""<row r="${r0 + 1}">""")
          row.zipWithIndex.foreach { case (cell, c0) =>
            val ref = XlsxReader.colLetters(c0) + (r0 + 1)
            cell match {
              case XlsxCell.Blank =>
              case XlsxCell.Str(v) =>
                sb.append(s"""<c r="$ref" t="s"><v>${sharedIdx(v)}</v></c>""")
              case XlsxCell.Num(v) =>
                val lit = if (v == Math.rint(v) && math.abs(v) < 1e15)
                  Math.round(v).toString else v.toString
                sb.append(s"""<c r="$ref"><v>$lit</v></c>""")
              case XlsxCell.Bool(v) =>
                sb.append(s"""<c r="$ref" t="b"><v>${if (v) 1 else 0}</v></c>""")
              case XlsxCell.Date(v) =>
                val serial = ChronoUnit.DAYS.between(XlDates.Epoch1900, v)
                sb.append(s"""<c r="$ref" s="1"><v>$serial</v></c>""")
              case XlsxCell.DateTime(v) =>
                val days = ChronoUnit.DAYS.between(XlDates.Epoch1900, v.toLocalDate)
                val serial = days + v.toLocalTime.toSecondOfDay / 86400.0
                sb.append(s"""<c r="$ref" s="2"><v>$serial</v></c>""")
            }
          }
          sb.append("</row>")
        }
      }
      sb.append("</sheetData>")
      if (sheet.merges.nonEmpty) {
        sb.append(s"""<mergeCells count="${sheet.merges.size}">""")
        sheet.merges.foreach(m => sb.append(s"""<mergeCell ref="$m"/>"""))
        sb.append("</mergeCells>")
      }
      sb.append("</worksheet>")
      sb.toString
    }

    val ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    val rNs = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    val relNs = "http://schemas.openxmlformats.org/package/2006/relationships"

    val workbook = {
      val entries = sheets.zipWithIndex.map { case (s, i) =>
        s"""<sheet name="${esc(s.name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        s"""<workbook xmlns="$ns" xmlns:r="$rNs"><sheets>$entries</sheets></workbook>"""
    }

    val wbRels = {
      val n = sheets.size
      val sheetRels = sheets.indices.map { i =>
        s"""<Relationship Id="rId${i + 1}" Type="$rNs/worksheet" Target="worksheets/sheet${i + 1}.xml"/>"""
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        s"""<Relationships xmlns="$relNs">$sheetRels""" +
        s"""<Relationship Id="rId${n + 1}" Type="$rNs/styles" Target="styles.xml"/>""" +
        s"""<Relationship Id="rId${n + 2}" Type="$rNs/sharedStrings" Target="sharedStrings.xml"/>""" +
        "</Relationships>"
    }

    val rootRels =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        s"""<Relationships xmlns="$relNs">""" +
        s"""<Relationship Id="rId1" Type="$rNs/officeDocument" Target="xl/workbook.xml"/>""" +
        "</Relationships>"

    // cellXfs: 0 = general, 1 = builtin date (14), 2 = custom datetime (164)
    val styles =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        s"""<styleSheet xmlns="$ns">""" +
        """<numFmts count="1"><numFmt numFmtId="164" formatCode="yyyy\-mm\-dd\ hh:mm:ss"/></numFmts>""" +
        """<fonts count="1"><font/></fonts><fills count="1"><fill/></fills>""" +
        """<borders count="1"><border/></borders>""" +
        """<cellStyleXfs count="1"><xf/></cellStyleXfs>""" +
        """<cellXfs count="3"><xf numFmtId="0"/>""" +
        """<xf numFmtId="14" applyNumberFormat="1"/>""" +
        """<xf numFmtId="164" applyNumberFormat="1"/></cellXfs>""" +
        "</styleSheet>"

    val sst = {
      val items = shared.keys.map(s =>
        s"""<si><t xml:space="preserve">${esc(s)}</t></si>""").mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        s"""<sst xmlns="$ns" count="${shared.size}" uniqueCount="${shared.size}">$items</sst>"""
    }

    val contentTypes = {
      val sheetOverrides = sheets.indices.map { i =>
        s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>"""
      }.mkString
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        """<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>""" +
        """<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>""" +
        sheetOverrides + "</Types>"
    }

    val bout = new ByteArrayOutputStream()
    val zout = new ZipOutputStream(bout)
    def entry(name: String, content: String): Unit = {
      zout.putNextEntry(new ZipEntry(name))
      zout.write(content.getBytes(StandardCharsets.UTF_8))
      zout.closeEntry()
    }
    entry("[Content_Types].xml", contentTypes)
    entry("_rels/.rels", rootRels)
    entry("xl/workbook.xml", workbook)
    entry("xl/_rels/workbook.xml.rels", wbRels)
    entry("xl/styles.xml", styles)
    entry("xl/sharedStrings.xml", sst)
    sheetXmls.zipWithIndex.foreach { case (xml, i) =>
      entry(s"xl/worksheets/sheet${i + 1}.xml", xml)
    }
    zout.close()
    bout.toByteArray
  }
}
