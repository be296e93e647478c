package graft.sources

import java.time.LocalDate
import java.time.temporal.ChronoUnit

import scala.collection.mutable

/** Minimal legacy `.xls` (BIFF8 in a CFB container) writer over the same
  * [[XlsxSheet]]/[[XlsxCell]] model as [[XlsxWriter]] — the binary-sink
  * twin for consumers still on the 1997 format, and the generator for the
  * committed `.xls` golden fixture that locks [[XlsReader]]'s decode.
  *
  * Deliberately exercises the record variety a real workbook shows:
  * integral numbers that fit 30 bits become RK cells, runs of two or more
  * in one row become a single MULRK, everything else NUMBER; strings go
  * through a shared-string table (LABELSST); dates/datetimes are serials
  * under XF styles with numfmt 14 / a custom FORMAT. Single-record SST
  * only (no CONTINUE spill) — enforced, fine for fixtures and report-
  * sized exports. */
object XlsWriter {

  private final class Buf {
    val out = new java.io.ByteArrayOutputStream()
    def len: Int = out.size()
    def w8(v: Int): Unit = out.write(v & 0xFF)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    def w32(v: Int): Unit = { w16(v); w16(v >> 16) }
    def w64(v: Long): Unit = { w32(v.toInt); w32((v >>> 32).toInt) }
    def bytes(b: Array[Byte]): Unit = out.write(b)
    def rec(id: Int, body: Buf): Unit = {
      require(body.len <= 8224, f"record 0x$id%04x exceeds 8224 bytes")
      w16(id); w16(body.len); out.write(body.out.toByteArray)
    }
  }

  private def body(f: Buf => Unit): Buf = { val b = new Buf; f(b); b }

  /** 16-bit-length BIFF8 string: compressed when latin-1-safe. */
  private def str16(b: Buf, s: String): Unit = {
    val wide = s.exists(_ > 0xFF)
    b.w16(s.length); b.w8(if (wide) 1 else 0)
    if (wide) b.bytes(s.getBytes("UTF-16LE"))
    else s.foreach(c => b.w8(c))
  }

  private def str8(b: Buf, s: String): Unit = {
    val wide = s.exists(_ > 0xFF)
    b.w8(s.length); b.w8(if (wide) 1 else 0)
    if (wide) b.bytes(s.getBytes("UTF-16LE"))
    else s.foreach(c => b.w8(c))
  }

  private def serial(d: LocalDate): Double =
    ChronoUnit.DAYS.between(XlDates.Epoch1900, d).toDouble

  // cell XF indices (0-14 style XFs by convention, cells from 15)
  private val XfGeneral = 15
  private val XfDate = 16
  private val XfDateTime = 17

  private def rkEncodable(v: Double): Boolean =
    v == Math.rint(v) && math.abs(v) < (1 << 29)

  def write(sheets: Seq[XlsxSheet]): Array[Byte] = {
    // shared strings, first-use order
    val shared = mutable.LinkedHashMap.empty[String, Int]
    var totalRefs = 0
    sheets.foreach(_.rows.foreach(_.foreach {
      case XlsxCell.Str(v) =>
        totalRefs += 1; shared.getOrElseUpdate(v, shared.size)
      case _ =>
    }))

    val sheetStreams = sheets.map(sheetStream(_, shared))

    // globals, with BOUNDSHEET offsets backpatched after sizing
    def globals(offsets: Seq[Int]): Array[Byte] = {
      val g = new Buf
      g.rec(0x0809, body { b => // BOF: BIFF8, workbook globals
        b.w16(0x0600); b.w16(0x0005); b.w16(0x3515); b.w16(0x07CD)
        b.w32(0xC1); b.w32(0x0606)
      })
      g.rec(0x0042, body(_.w16(0x04B0))) // CODEPAGE: UTF-16
      g.rec(0x0022, body(_.w16(0)))      // DATEMODE: 1900 system
      g.rec(0x0031, body { b =>          // FONT (readers expect at least one)
        b.w16(200); b.w16(0); b.w16(0x7FFF); b.w16(400)
        b.w16(0); b.w8(0); b.w8(0); b.w8(0); b.w8(0)
        str8(b, "Arial")
      })
      g.rec(0x041E, body { b =>          // FORMAT 164: datetime
        b.w16(164); str16(b, "yyyy-mm-dd hh:mm:ss")
      })
      def xf(b: Buf, ifmt: Int, style: Boolean): Unit = {
        b.w16(0); b.w16(ifmt)
        b.w16(if (style) 0xFFF5 else 0x0001)
        b.w16(0x0020); b.w16(0); b.w16(0); b.w16(0); b.w16(0); b.w16(0); b.w16(0)
      }
      (0 until 15).foreach(_ => g.rec(0x00E0, body(xf(_, 0, style = true))))
      g.rec(0x00E0, body(xf(_, 0, style = false)))   // 15: general
      g.rec(0x00E0, body(xf(_, 14, style = false)))  // 16: date (built-in)
      g.rec(0x00E0, body(xf(_, 164, style = false))) // 17: datetime (custom)
      g.rec(0x00FC, body { b =>          // SST, single record
        b.w32(totalRefs); b.w32(shared.size)
        shared.keys.foreach(str16(b, _))
      })
      sheets.zip(offsets).foreach { case (sheet, off) =>
        g.rec(0x0085, body { b => // BOUNDSHEET
          b.w32(off); b.w16(0); str8(b, sheet.name)
        })
      }
      g.rec(0x000A, new Buf) // EOF
      g.out.toByteArray
    }

    // two passes: sizes don't depend on the offsets (w32 fixed width)
    val probe = globals(sheets.map(_ => 0))
    val offsets = sheetStreams.scanLeft(probe.length)(_ + _.length).init
    val head = globals(offsets)
    require(head.length == probe.length, "globals sizing drifted")
    Cfb.write("Workbook", head ++ sheetStreams.flatten)
  }

  private def sheetStream(sheet: XlsxSheet,
      shared: mutable.LinkedHashMap[String, Int]): Array[Byte] = {
    val s = new Buf
    s.rec(0x0809, body { b => // BOF: worksheet
      b.w16(0x0600); b.w16(0x0010); b.w16(0x3515); b.w16(0x07CD)
      b.w32(0xC1); b.w32(0x0606)
    })
    val nRows = sheet.rows.length
    val maxCols = (0 +: sheet.rows.map(_.length)).max
    s.rec(0x0200, body { b => // DIMENSIONS
      b.w32(0); b.w32(nRows); b.w16(0); b.w16(maxCols); b.w16(0)
    })

    sheet.rows.zipWithIndex.foreach { case (row, r) =>
      // split the row into RK-encodable runs (→ RK / MULRK) and singles
      val enc: Seq[(Int, XlsxCell)] = row.zipWithIndex.collect {
        case (c, i) if c != XlsxCell.Blank => (i, c)
      }
      var i = 0
      while (i < enc.length) {
        val (col, cell) = enc(i)
        cell match {
          case XlsxCell.Num(v) if rkEncodable(v) =>
            // extend the run of adjacent RK-encodable numbers
            var j = i
            def runExtends(k: Int): Boolean = k < enc.length && {
              val (ck, cellk) = enc(k)
              ck == enc(k - 1)._1 + 1 && (cellk match {
                case XlsxCell.Num(x) => rkEncodable(x)
                case _               => false
              })
            }
            while (runExtends(j + 1)) j += 1
            def rkBits(x: Double): Int = (x.toInt << 2) | 2
            if (j > i) {
              s.rec(0x00BD, body { b => // MULRK
                b.w16(r); b.w16(col)
                (i to j).foreach { k =>
                  enc(k)._2 match {
                    case XlsxCell.Num(x) => b.w16(XfGeneral); b.w32(rkBits(x))
                    case _ => throw new IllegalStateException("non-Num in RK run")
                  }
                }
                b.w16(enc(j)._1)
              })
            } else {
              s.rec(0x027E, body { b => // RK
                b.w16(r); b.w16(col); b.w16(XfGeneral); b.w32(rkBits(v))
              })
            }
            i = j + 1
          case XlsxCell.Num(v) =>
            s.rec(0x0203, body { b => // NUMBER
              b.w16(r); b.w16(col); b.w16(XfGeneral)
              b.w64(java.lang.Double.doubleToLongBits(v))
            })
            i += 1
          case XlsxCell.Str(v) =>
            s.rec(0x00FD, body { b => // LABELSST
              b.w16(r); b.w16(col); b.w16(XfGeneral); b.w32(shared(v))
            })
            i += 1
          case XlsxCell.Bool(v) =>
            s.rec(0x0205, body { b => // BOOLERR
              b.w16(r); b.w16(col); b.w16(XfGeneral)
              b.w8(if (v) 1 else 0); b.w8(0)
            })
            i += 1
          case XlsxCell.Date(d) =>
            s.rec(0x0203, body { b =>
              b.w16(r); b.w16(col); b.w16(XfDate)
              b.w64(java.lang.Double.doubleToLongBits(serial(d)))
            })
            i += 1
          case XlsxCell.DateTime(dt) =>
            s.rec(0x0203, body { b =>
              b.w16(r); b.w16(col); b.w16(XfDateTime)
              val v = serial(dt.toLocalDate) +
                dt.toLocalTime.toSecondOfDay.toDouble / 86400.0
              b.w64(java.lang.Double.doubleToLongBits(v))
            })
            i += 1
          case XlsxCell.Blank =>
            i += 1
        }
      }
    }

    if (sheet.merges.nonEmpty) {
      s.rec(0x00E5, body { b => // MERGEDCELLS
        b.w16(sheet.merges.length)
        sheet.merges.foreach { ref =>
          val Array(a, z) = ref.split(":")
          def rowOf(cr: String): Int =
            cr.dropWhile(Character.isLetter).toInt - 1
          b.w16(rowOf(a)); b.w16(rowOf(z))
          b.w16(XlsxReader.colIndex(a)); b.w16(XlsxReader.colIndex(z))
        }
      })
    }
    s.rec(0x000A, new Buf) // EOF
    s.out.toByteArray
  }
}
