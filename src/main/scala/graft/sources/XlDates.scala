package graft.sources

import java.time.LocalDate

/** The XL 1900 date system's effective epoch, shared by the xlsx/xls
  * readers and writers so the serial convention cannot drift between
  * them. Serial N = this date + N days: 1899-12-30 rather than
  * 1899-12-31 absorbs the format's phantom 1900-02-29 (correct for
  * serials ≥ 61, which is every date this engine reads or writes). */
private[sources] object XlDates {
  val Epoch1900: LocalDate = LocalDate.of(1899, 12, 30)
}
