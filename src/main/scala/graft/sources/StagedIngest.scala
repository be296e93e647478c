package graft.sources

import java.time.LocalDate
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Transforms

/** Ingestion-adapter framework (SURVEY §4): the reference pushes its
  * watermark into every upstream fetch (`StartDate`/`EndDate`/`period1/2`
  * API params — `HTGPIPROPHEDEX/__init__.py:201-212`,
  * `HTGPIYAHOO/__init__.py:44`) and coalesces per-day symbol lists into
  * contiguous ranges to minimize calls (`:174-194`). The engine keeps the
  * same contract: watermarks bound the fetch plan (predicate pushdown into
  * the source), fetched bytes land in a staging path, and the relational
  * side reads staging — so Catalyst sees plain files and the network is
  * quarantined in the adapter.
  *
  * `Fetcher` is the transport seam: production backs it with HTTP (+ rate
  * limiting, the reference's `time.sleep(2)` as a token bucket); tests back
  * it with local fixture files. Zero-egress environments exercise the whole
  * plan/stage/read cycle with [[LocalFileFetcher]].
  */
object StagedIngest {

  /** One bounded fetch: entity + inclusive date range (the pushed predicate). */
  case class FetchSpec(entity: String, from: LocalDate, to: LocalDate)

  trait Fetcher {
    /** Land the bytes for a spec; return the staged file path. */
    def fetch(spec: FetchSpec, stagingDir: String): String
  }

  /** Test/offline transport: copies `sourceFor(spec)` into staging. */
  class LocalFileFetcher(sourceFor: FetchSpec => java.nio.file.Path) extends Fetcher {
    override def fetch(spec: FetchSpec, stagingDir: String): String = {
      val dst = java.nio.file.Paths.get(stagingDir,
        s"${spec.entity}_${spec.from}_${spec.to}.csv")
      java.nio.file.Files.createDirectories(dst.getParent)
      java.nio.file.Files.copy(sourceFor(spec), dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dst.toString
    }
  }

  /** Watermarks → fetch plan: one spec per entity, from the day after its
    * watermark to `today` (entities at or past today are skipped — the
    * empty-guard P7). `watermarks` must have (entity, max_date) rows;
    * collected driver-side like the reference (it is tiny by construction). */
  def planFetches(watermarks: DataFrame, today: LocalDate): Seq[FetchSpec] =
    watermarks.select(col("entity"), col("max_date").cast("date"))
      .collect()
      .toSeq
      .map { r =>
        // a NULL watermark (outer join, MAX over an empty slice) must fail
        // with the entity named, not an opaque driver NPE mid-plan
        // (r14 review); a bootstrap belongs in the watermark table itself,
        // since only the caller knows each entity's history start
        require(!r.isNullAt(1), s"null max_date watermark for entity " +
          s"'${r.getString(0)}' — seed the watermark table with the " +
          "entity's bootstrap date before planning fetches")
        (r.getString(0), r.getDate(1).toLocalDate.plusDays(1))
      }
      .filter { case (_, from) => !from.isAfter(today) }
      .map { case (e, from) => FetchSpec(e, from, today) }
      .sortBy(_.entity)

  /** Execute the plan: land every spec, read staging as one DataFrame with
    * the supplied schema, and re-apply the watermark relationally (belt and
    * braces — upstreams are allowed to over-deliver, exactly like the
    * reference's 60-day overlap re-fetch, `HTGPISNP500/__init__.py:96-98`). */
  def ingest(spark: SparkSession, fetcher: Fetcher, specs: Seq[FetchSpec],
      stagingDir: String, schema: String, watermarks: DataFrame,
      entityCol: String, eventCol: String): DataFrame = {
    val staged = specs.map(s => fetcher.fetch(s, stagingDir))
    if (staged.isEmpty) return spark.emptyDataFrame
    val raw = spark.read.option("header", "true").schema(schema).csv(staged: _*)
    Transforms.watermarkFilter(raw,
      watermarks.withColumnRenamed("entity", entityCol)
        .withColumnRenamed("max_date", "wm_date"),
      Seq(entityCol), eventCol, "wm_date")
  }
}
