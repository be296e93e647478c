package graft.tools

import java.nio.file.{Files, Paths}
import java.time.{LocalDate, LocalDateTime}

import graft.sources.{XlsxCell, XlsxSheet, XlsxWriter}

/** Regenerates the committed WASDE golden-fixture workbook
  * (`src/main/resources/graft/fixtures/wasde.xlsx`). Sheets p18/p19 decode
  * to exactly the q37 `wasdeFixture` string table (numbers as numeric
  * cells, NA as a shared string, blanks absent, two merged group-header
  * ranges); a third `notes` sheet carries date/datetime/bool/float cells
  * for the reader's type coverage (not consumed by q73). Run manually:
  * `sbt "runMain graft.tools.MakeFixtures"`, then commit the binary. */
object MakeFixtures {

  private def cell(s: String): XlsxCell =
    if (s.isEmpty) XlsxCell.Blank
    else if (s.matches("-?\\d+")) XlsxCell.Num(s.toDouble)
    else XlsxCell.Str(s)

  private def row(cells: String*): Seq[XlsxCell] = cells.map(cell)

  def main(args: Array[String]): Unit = {
    val p18 = XlsxSheet("p18", Seq(
      row("2025/26 (Est.) 2/", "", "", "", "", "", "", ""),
      row("World 3/", "", "", "", "", "", "", ""),
      row("Major Exporters", "", "", "", "", "", "", ""),
      row("Brazil", "1", "2", "3", "4", "5", "6", "7"),
      row("", "9", "9", "NA", "", "2", "1", "4"),
      row("Selected Other", "0", "0", "0", "0", "0", "0", "0"),
      row("2025/26 (Proj.)", "", "", "", "", "", "", ""),
      row("Argentina", "2", "4", "0", "1", "2", "2", "8"),
      row("Major Importers", "", "", "", "", "", "", ""),
      row("China 10/", "5", "0", "98", "", "101", "0", "30")),
      // group-header rows span the table width in the real sheets
      merges = Seq("A2:H2", "A3:H3"))
    val p19 = XlsxSheet("p19", Seq(
      row("2025/26 (Proj.)", "", "", "", "", "", "", ""),
      row("World", "", "", "", "", "", "", ""),
      row("United States", "10", "80", "1", "40", "55", "20", "16")))
    val notes = XlsxSheet("notes", Seq(
      Seq(XlsxCell.Str("released"), XlsxCell.Date(LocalDate.of(2026, 5, 12))),
      Seq(XlsxCell.Str("run at"),
        XlsxCell.DateTime(LocalDateTime.of(2026, 5, 12, 13, 45, 30))),
      Seq(XlsxCell.Str("revision"), XlsxCell.Num(3.25), XlsxCell.Bool(true))))

    val bytes = XlsxWriter.write(Seq(p18, p19, notes))
    val out = Paths.get("src/main/resources/graft/fixtures/wasde.xlsx")
    Files.createDirectories(out.getParent)
    Files.write(out, bytes)
    println(s"wrote ${bytes.length} bytes to $out")

    // the same workbook in legacy BIFF8 — locks XlsReader's byte-level
    // decode (CFB ministream, SST, RK/MULRK runs, merges, date styles)
    val xls = graft.sources.XlsWriter.write(Seq(p18, p19, notes))
    val outXls = Paths.get("src/main/resources/graft/fixtures/wasde.xls")
    Files.write(outXls, xls)
    println(s"wrote ${xls.length} bytes to $outXls")
  }
}
