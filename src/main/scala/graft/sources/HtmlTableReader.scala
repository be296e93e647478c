package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S3 — HTML-table scan (`pd.read_html(url, header=1)[0]`,
  * `HTGPIINFLATUS/__init__.py:82`).
  *
  * Driver-side parse (the page is one small document — SURVEY §2.1 S3:
  * "not a distributed scan") with a dependency-free tag scanner: extracts
  * the first `<table>`, one row per `<tr>`, cells from `<td>`/`<th>`, strips
  * nested tags, unescapes the common entities. `headerRow` picks which row
  * supplies column names (pandas `header=1` ≙ `headerRow = 1`).
  */
object HtmlTableReader {

  private val TableRe = "(?is)<table[^>]*>(.*?)</table>".r
  private val RowRe = "(?is)<tr[^>]*>(.*?)</tr>".r
  private val CellRe = "(?is)<t[dh][^>]*>(.*?)</t[dh]>".r
  private val TagRe = "(?s)<[^>]+>".r

  // &amp; is decoded LAST: decoding it first would turn the encoded
  // literal "&amp;lt;" into "&lt;" and then a second pass into "<" —
  // double-unescaping (r14 review). With &amp; last, each entity is
  // decoded exactly once.
  private def unescape(s: String): String = s
    .replace("&nbsp;", " ").replace("&lt;", "<")
    .replace("&gt;", ">").replace("&quot;", "\"").replace("&#39;", "'")
    .replace("&amp;", "&")

  /** Parse the first table of an HTML document into rows of trimmed cells. */
  def parseRows(html: String): Seq[Seq[String]] =
    TableRe.findFirstMatchIn(html).toSeq.flatMap { t =>
      RowRe.findAllMatchIn(t.group(1)).map { r =>
        CellRe.findAllMatchIn(r.group(1))
          .map(c => unescape(TagRe.replaceAllIn(c.group(1), "")).trim)
          .toSeq
      }.toSeq.filter(_.nonEmpty)
    }

  /** S4 — HTML link discovery (`html.find_all('tr', class_=...)` scraping
    * the latest `.xls` href, `HTGPIWASDE/__init__.py:54-68`): all hrefs
    * whose target matches `pattern`, in document order. */
  def discoverLinks(html: String, pattern: String): Seq[String] = {
    val HrefRe = "(?is)<a[^>]*href\\s*=\\s*[\"']([^\"']+)[\"'][^>]*>".r
    val p = pattern.r
    HrefRe.findAllMatchIn(html).map(_.group(1))
      .filter(h => p.findFirstIn(h).isDefined).toSeq
  }

  /** First table → DataFrame, all-string columns, ragged rows padded. */
  def read(spark: SparkSession, html: String, headerRow: Int = 0): DataFrame = {
    val rows = parseRows(html)
    require(rows.size > headerRow, s"no table row at header index $headerRow")
    val header = rows(headerRow)
    val width = header.size
    val data = rows.drop(headerRow + 1)
      .map(r => r.padTo(width, "").take(width))
      .map(org.apache.spark.sql.Row.fromSeq(_))
    // de-duplicate column names: two blank headers (or two identical
    // non-blank ones) would otherwise both resolve to the same name —
    // the DataFrame builds, but any select on it throws
    // AMBIGUOUS_REFERENCE and parquet writers reject it outright
    // (r14 review). First occurrence keeps the bare name; repeats get a
    // positional suffix, the pandas mangle_dupe_cols convention.
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val names = header.map { h0 =>
      val h = if (h0.isEmpty) "col" else h0
      val n = seen.getOrElse(h, 0)
      seen(h) = n + 1
      if (n == 0) h else s"${h}_$n"
    }
    val schema = org.apache.spark.sql.types.StructType(
      names.map(h => org.apache.spark.sql.types.StructField(
        h, org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 1), schema)
  }
}
