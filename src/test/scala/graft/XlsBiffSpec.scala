package graft

import java.time.{LocalDate, LocalDateTime}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Cfb, XlsReader, XlsWriter, XlsxCell, XlsxSheet}

/** BIFF8 `.xls` codec: CFB container round-trips (FAT and ministream
  * paths), record-level decode (RK/MULRK/NUMBER/LABELSST/BOOLERR,
  * merged cells, date styles), SST CONTINUE spills, and writer/reader
  * round-trip parity with the xlsx pipeline's row contract. */
class XlsBiffSpec extends AnyFunSuite {

  private def cell(s: String): XlsxCell =
    if (s.isEmpty) XlsxCell.Blank
    else if (s.matches("-?\\d+")) XlsxCell.Num(s.toDouble)
    else XlsxCell.Str(s)

  private def row(cells: String*): Seq[XlsxCell] = cells.map(cell)

  test("CFB round-trip: ministream (<4096B) and FAT (>=4096B) streams") {
    val small = Array.tabulate[Byte](1000)(i => (i * 7).toByte)
    val smallCfb = Cfb.write("Workbook", small)
    assert(Cfb.readStreams(smallCfb)("Workbook").toSeq == small.toSeq)
    val big = Array.tabulate[Byte](10000)(i => (i * 13 + 5).toByte)
    val bigCfb = Cfb.write("Workbook", big)
    assert(Cfb.readStreams(bigCfb)("Workbook").toSeq == big.toSeq)
    // an exact sector multiple (boundary padding math)
    val exact = Array.tabulate[Byte](4096)(i => i.toByte)
    assert(Cfb.readStreams(Cfb.write("S", exact))("S").toSeq == exact.toSeq)
  }

  test("writer->reader round-trip: types, ragged rows, merges, multi-sheet") {
    val s1 = XlsxSheet("data", Seq(
      row("name", "a", "b", "c"),
      // run of RK-encodable ints -> one MULRK record
      Seq(XlsxCell.Str("x"), XlsxCell.Num(1), XlsxCell.Num(2), XlsxCell.Num(3)),
      // single RK, a float NUMBER, a bool
      Seq(XlsxCell.Str("y"), XlsxCell.Num(42), XlsxCell.Num(2.5),
        XlsxCell.Bool(true)),
      // ragged + gap: blank mid-row renders "", trailing absent
      Seq(XlsxCell.Str("z"), XlsxCell.Blank, XlsxCell.Num(-7)),
      // big/negative values that do NOT fit RK 30-bit -> NUMBER
      Seq(XlsxCell.Num(1e15), XlsxCell.Num(-536870913))),
      merges = Seq("A1:D1"))
    val s2 = XlsxSheet("dates", Seq(
      Seq(XlsxCell.Date(LocalDate.of(2026, 5, 12)),
        XlsxCell.DateTime(LocalDateTime.of(2026, 5, 12, 13, 45, 30)))))
    val bytes = XlsWriter.write(Seq(s1, s2))

    assert(XlsReader.sheetNames(bytes) == Seq("data", "dates"))
    val data = XlsReader.readSheet(bytes, "data")
    assert(data.map(_.cells) == Seq(
      Seq("name", "a", "b", "c"),
      Seq("x", "1", "2", "3"),
      Seq("y", "42", "2.5", "true"),
      Seq("z", "", "-7"),
      Seq("1.0E15", "-536870913")))
    val dates = XlsReader.readSheet(bytes, "dates")
    assert(dates.map(_.cells) == Seq(Seq("2026-05-12", "2026-05-12 13:45:30")))
    // fillMerged propagates the anchor across the merged header
    val filled = XlsReader.readSheet(bytes, "data", fillMerged = true)
    assert(filled.head.cells == Seq("name", "name", "name", "name"))
    // unknown sheet fails loudly
    val e = intercept[IllegalArgumentException](XlsReader.readSheet(bytes, "nope"))
    assert(e.getMessage.contains("data"))
  }

  test("record-level assertions: MULRK and RK actually written") {
    val bytes = XlsWriter.write(Seq(XlsxSheet("s", Seq(
      Seq(XlsxCell.Num(1), XlsxCell.Num(2), XlsxCell.Num(3)),
      Seq(XlsxCell.Num(9))))))
    val stream = Cfb.readStreams(bytes)("Workbook")
    def countRecords(id: Int): Int = {
      var off = 0; var n = 0
      while (off + 4 <= stream.length) {
        if (Cfb.u16(stream, off) == id) n += 1
        off += 4 + Cfb.u16(stream, off + 2)
      }
      n
    }
    assert(countRecords(0x00BD) == 1) // one MULRK for the 3-run
    assert(countRecords(0x027E) == 1) // one RK for the single
    assert(countRecords(0x0203) == 0) // no plain NUMBER needed
  }

  test("SST CONTINUE spill: strings split mid-characters with per-fragment flag") {
    // hand-build a globals+sheet stream whose SST splits inside a string's
    // character data, with the continuation re-stating the encoding flag
    // (compressed first fragment, wide continuation) — the rule xlrd
    // handles and naive record walks get wrong.
    val out = new java.io.ByteArrayOutputStream()
    var cur: java.io.ByteArrayOutputStream = out
    def w8c(v: Int): Unit = cur.write(v & 0xFF)
    def w16c(v: Int): Unit = { w8c(v); w8c(v >> 8) }
    def w32c(v: Int): Unit = { w16c(v); w16c(v >> 16) }
    def rec(id: Int)(body: => Unit): Unit = {
      val mark = new java.io.ByteArrayOutputStream()
      val save = cur; cur = mark; body; cur = save
      out.write(id & 0xFF); out.write((id >> 8) & 0xFF)
      out.write(mark.size() & 0xFF); out.write((mark.size() >> 8) & 0xFF)
      mark.writeTo(out)
    }

    // globals BOF
    rec(0x0809) { w16c(0x0600); w16c(0x0005); w16c(0); w16c(0); w32c(0); w32c(0) }
    // minimal XFs: 15 style + 1 general cell
    (0 to 15).foreach { _ =>
      rec(0x00E0) { w16c(0); w16c(0); w16c(0x0001); (0 until 14).foreach(_ => w8c(0)) }
    }
    // SST: 2 strings; "hello_world" splits after "hello" into a WIDE tail
    rec(0x00FC) {
      w32c(2); w32c(2)
      w16c(11); w8c(0) // cch=11, compressed
      "hello".foreach(c => w8c(c))
    }
    rec(0x003C) { // CONTINUE: flag byte then wide chars "_world"
      w8c(1)
      "_world".foreach { c => w8c(c); w8c(0) }
      w16c(3); w8c(0); "abc".foreach(c => w8c(c)) // second string, intact
    }
    val boundsheetPos = out.size()
    rec(0x0085) { w32c(0); w16c(0); w8c(1); w8c(0); w8c('s') } // patched below
    rec(0x000A) {}
    val sheetStart = out.size()
    rec(0x0809) { w16c(0x0600); w16c(0x0010); w16c(0); w16c(0); w32c(0); w32c(0) }
    rec(0x00FD) { w16c(0); w16c(0); w16c(15); w32c(0) } // A1 = sst[0]
    rec(0x00FD) { w16c(0); w16c(1); w16c(15); w32c(1) } // B1 = sst[1]
    rec(0x000A) {}

    val stream = out.toByteArray
    // backpatch the BOUNDSHEET offset (little-endian at data start)
    stream(boundsheetPos + 4) = (sheetStart & 0xFF).toByte
    stream(boundsheetPos + 5) = ((sheetStart >> 8) & 0xFF).toByte
    stream(boundsheetPos + 6) = ((sheetStart >> 16) & 0xFF).toByte
    stream(boundsheetPos + 7) = ((sheetStart >> 24) & 0xFF).toByte

    val rows = XlsReader.readSheet(Cfb.write("Workbook", stream), "s")
    assert(rows.map(_.cells) == Seq(Seq("hello_world", "abc")))
  }

  test("golden fixture: committed wasde.xls decodes to the q37 table") {
    val in = getClass.getResourceAsStream("/graft/fixtures/wasde.xls")
    assume(in != null, "fixture not yet generated")
    val bytes = try in.readAllBytes() finally in.close()
    val p18 = XlsReader.readSheet(bytes, "p18")
    assert(p18.length == 10)
    assert(p18(3).cells == Seq("Brazil", "1", "2", "3", "4", "5", "6", "7"))
    assert(p18(4).cells == Seq("", "9", "9", "NA", "", "2", "1", "4"))
    val p19 = XlsReader.readSheet(bytes, "p19")
    assert(p19(2).cells ==
      Seq("United States", "10", "80", "1", "40", "55", "20", "16"))
    // same rows the xlsx fixture yields — byte format differs, content equal
    val xin = getClass.getResourceAsStream("/graft/fixtures/wasde.xlsx")
    val xbytes = try xin.readAllBytes() finally xin.close()
    assert(graft.sources.XlsxReader.readSheet(xbytes, "p18").map(_.cells) ==
      p18.map(_.cells))
  }

  test("unicode strings survive the wide path") {
    val bytes = XlsWriter.write(Seq(XlsxSheet("u", Seq(
      Seq(XlsxCell.Str("café"), XlsxCell.Str("naïve — ünïcode"), XlsxCell.Str("ascii"))))))
    assert(XlsReader.readSheet(bytes, "u").head.cells ==
      Seq("café", "naïve — ünïcode", "ascii"))
  }

  test("corrupt workbook bytes fail loudly — no hang, no silent rows") {
    // both codecs are hand-written parsers: random garbage, truncation at
    // any depth, and a flipped header byte must all raise (any throwable
    // class — the contract is LOUD), bounded-time, never rows
    val rnd = new scala.util.Random(42)
    val sheet = XlsxSheet("s",
      (1 to 40).map(i => Seq(XlsxCell.Str(s"r$i"), XlsxCell.Num(i))))
    val goodXlsx = graft.sources.XlsxWriter.write(Seq(sheet))
    val goodXls = XlsWriter.write(Seq(sheet))
    def boom(label: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = try { Some(body) } catch { case _: Throwable => None }
      assert(r.isEmpty, s"$label parsed corrupt bytes: $r")
      assert((System.nanoTime() - t0) / 1e9 < 30.0, s"$label too slow")
    }
    val junk = Array.fill(4096)(rnd.nextInt().toByte)
    boom("xlsx-junk")(graft.sources.XlsxReader.readSheet(junk, "s"))
    boom("xls-junk")(XlsReader.readSheet(junk, "s"))
    for (frac <- Seq(0.1, 0.5, 0.9)) {
      boom(s"xlsx-trunc-$frac")(graft.sources.XlsxReader.readSheet(
        goodXlsx.take((goodXlsx.length * frac).toInt), "s"))
      boom(s"xls-trunc-$frac")(XlsReader.readSheet(
        goodXls.take((goodXls.length * frac).toInt), "s"))
    }
    // CFB header byte 30 is the sector-shift — a flipped value must not
    // turn into a giant or negative sector size that wanders off silently
    val flipped = goodXls.clone()
    flipped(30) = (flipped(30) ^ 0x7f).toByte
    boom("xls-bad-sector-shift")(XlsReader.readSheet(flipped, "s"))
  }
}
