package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming form of the engine's incremental pipelines.
  *
  * The reference is batch-incremental (per-run watermark read + fetch delta +
  * append, SURVEY §2.8); the Spark-native equivalent is a transform that is
  * IDENTICAL for batch and streaming inputs, run under `Trigger.AvailableNow`
  * with an event-time watermark standing in for the reference's 60-day
  * re-fetch overlap (`HTGPISNP500/__init__.py:96-98`).
  *
  * At scale: tumbling-window aggregation with a watermark bounds state size;
  * `dropDuplicates` within the watermark gives the exactly-once-ish append
  * the reference approximates by re-fetching a 60-day overlap.
  */
object StreamingOps {

  /** Watermarked tumbling-window aggregation; same code path works for both
    * batch DataFrames and streaming DataFrames. */
  def windowedEventAgg(events: DataFrame, windowDur: String,
      watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"))

  /** Late-data-safe dedup on an id within the watermark horizon — streaming
    * analogue of the reference's idempotent re-load guard
    * (`HTGPIWASDE/__init__.py:124-134` delete-then-insert). */
  def dedupWithinWatermark(events: DataFrame, watermarkDelay: String,
      idCols: Seq[String]): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicates(idCols :+ "ts")

  /** Checkpointed incremental run — the streaming form of the reference's
    * watermark table (SURVEY §7.4 north star 5): each invocation processes
    * only files not yet recorded in the checkpoint's file-source log and
    * appends to a parquet sink exactly-once. Re-running with the same
    * checkpoint after new files land processes just the delta — the
    * `MAX(date)`-watermark pattern with the state moved into the stream
    * checkpoint. */
  def runIncremental(spark: SparkSession, inputDir: String, schema: org.apache.spark.sql.types.StructType,
      checkpointDir: String, outDir: String)(
      transform: DataFrame => DataFrame): Unit = {
    val q = transform(spark.readStream.schema(schema).parquet(inputDir))
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Checkpointed incremental UPSERT — [[runIncremental]]'s append sink
    * replaced by last-writer-wins key merge via `foreachBatch`: each
    * micro-batch is reduced to one row per key (`seqCol` max, within-batch),
    * then merged into the target parquet by rewriting it WITHOUT the
    * incoming keys and appending the new versions — the streaming form of
    * the reference's delete-then-insert idempotent re-load
    * (`HTGPIWASDE/__init__.py:124-134`) and the batch
    * `writeMonthOverwrite`. Re-running with the same checkpoint after new
    * files land merges just the delta; replaying an already-seen key
    * replaces, never duplicates.
    *
    * Scale: the rewrite is target ∖ batch-keys (one anti-join) + append —
    * at lake scale the same merge keys to PARTITIONS via dynamic partition
    * overwrite ([[graft.pipelines.WasdeTransforms.writeMonthOverwrite]]);
    * this key-level variant is for unpartitioned targets. The atomic-swap
    * caveat of Maintenance.compact applies to the rewrite step. */
  def runUpsert(spark: SparkSession, inputDir: String,
      schema: org.apache.spark.sql.types.StructType, checkpointDir: String,
      targetDir: String, keyCols: Seq[String], seqCol: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val q = spark.readStream.schema(schema).parquet(inputDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val keyed = batch.withColumn("_rn", row_number().over(
            Window.partitionBy(keyCols.map(col): _*)
              .orderBy(col(seqCol).desc)))
          .filter(col("_rn") === 1).drop("_rn")
        val tgt = new java.io.File(targetDir)
        // seqCol ordering must hold ACROSS batches, not just within one:
        // a late-landing file carrying an OLDER version of a key would
        // otherwise anti-join away the target's newer row and install the
        // stale one (r14 review). The winner is picked over target ∪ batch
        // per key; at equal seq the batch row wins (idempotent replay
        // replaces). Same one-exchange cost class as the old anti-join —
        // both passes are keyed on the full target.
        val merged =
          if (!tgt.exists()) keyed
          else spark.read.parquet(targetDir).withColumn("_src", lit(0))
            .unionByName(keyed.withColumn("_src", lit(1)))
            .withColumn("_rn", row_number().over(
              Window.partitionBy(keyCols.map(col): _*)
                .orderBy(col(seqCol).desc, col("_src").desc)))
            .filter(col("_rn") === 1).drop("_rn", "_src")
        // rewrite via a temp dir then swap — reading and overwriting the
        // same path in one job would race the scan. Renames are CHECKED
        // (r10, ADVICE): an unchecked renameTo that fails (leftover _old
        // from a crashed run, cross-device move, file lock) would silently
        // drop the batch merge and leave the stale target in place. A
        // failure between the two renames rolls _old back so a target
        // always exists.
        val tmp = targetDir + "_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        def mv(src: java.io.File, dst: java.io.File): Unit =
          if (!src.renameTo(dst))
            throw new java.io.IOException(s"upsert swap: rename $src -> $dst failed")
        if (tgt.exists()) {
          val old = new java.io.File(targetDir + "_old")
          if (old.exists()) rm(old) // crashed-run leftover would block the swap
          mv(tgt, old)
          try mv(new java.io.File(tmp), tgt)
          catch { case e: Throwable =>
            // half-completed swap: restore the previous target before failing
            old.renameTo(tgt); throw e
          }
          rm(old)
        } else mv(new java.io.File(tmp), tgt)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Stream the events parquet directory with `Trigger.AvailableNow` through
    * `transform` into an in-memory table; returns the collected result.
    * Normalizes a `ts` column across all three corpus timestamp encodings
    * (NANOS-as-long, MICROS-NTZ, plain TIMESTAMP) via
    * [[graft.Tables.normalizeEventTime]]. */
  def runAvailableNow(spark: SparkSession, path: String, queryName: String,
      outputMode: String = "append")(
      transform: DataFrame => DataFrame): DataFrame =
    runAvailableNowProgress(spark, path, queryName, outputMode)(transform)._1

  /** [[runAvailableNow]] that ALSO returns the run's
    * `StreamingQueryProgress` records, so callers can surface the
    * state-store metrics (rows held / updated / evicted, bytes) that back
    * the bounded-state claims — numbers per run, not code comments
    * (r16 VERDICT item 7). */
  def runAvailableNowProgress(spark: SparkSession, path: String,
      queryName: String, outputMode: String = "append")(
      transform: DataFrame => DataFrame)
      : (DataFrame, Seq[org.apache.spark.sql.streaming.StreamingQueryProgress]) = {
    // FileStreamSource needs a directory; single-file corpora get a
    // symlinked temp dir.
    val f = new java.io.File(path)
    val streamPath =
      if (f.isFile) {
        val dir = java.nio.file.Files.createTempDirectory("graft-stream")
        // unique per call, so unregistered dirs accumulate across
        // bench/verify invocations — remove at JVM exit (the symlink and
        // dir are empty weight once the run's micro-batches finish)
        val link = dir.resolve(f.getName)
        java.nio.file.Files.createSymbolicLink(link, f.toPath.toAbsolutePath)
        // deleteOnExit runs in REVERSE registration order: register the dir
        // FIRST so the link inside it is removed first and the then-empty
        // dir second (the r14 order deleted the non-empty dir first, which
        // failed silently and leaked the dir every call).
        dir.toFile.deleteOnExit()
        link.toFile.deleteOnExit()
        dir.toString
      } else path
    val batchSchema = spark.read.parquet(path).schema
    val raw = spark.readStream.schema(batchSchema).parquet(streamPath)
    // Same three-encoding normalization as the batch path — `withWatermark`
    // is the strictest consumer (rejects NTZ outright), so the stream must
    // see session-TZ TIMESTAMP regardless of how the corpus was written.
    val events =
      if (batchSchema.fieldNames.contains("ts")) graft.Tables.normalizeEventTime(raw)
      else raw
    val q = transform(events).writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    (spark.table(queryName), q.recentProgress.toSeq)
  }

  /** TWO-batch AvailableNow runner (r18 VERDICT item 2): the corpus at
    * `path` is split at the midpoint of its event-time range into two
    * phase files inside a fresh stream dir, and the file source reads
    * them with `maxFilesPerTrigger = 1`, so each phase is its own
    * micro-batch in phase order — pinned twice, by lexical file name AND
    * strictly increasing modification times (FileStreamSource orders
    * pending files by modTime). The event-time watermark then PROVABLY
    * advances between batches, so per-batch state-eviction counts become
    * computable corpus functions — the one state transition the
    * single-batch runner above can never exercise (its watermark is 0
    * for its only data batch).
    *
    * The split point is `(min + max) / 2` of the epoch-microsecond event
    * time (integer division) — a pure corpus function a SQL oracle
    * recomputes exactly. NULL event times go to the FIRST phase (they
    * never move a watermark; keeping them early makes phase B strictly
    * later-dated, so the watermark advance is guaranteed whenever the
    * corpus spans more than the watermark delay).
    *
    * Returns the sink table and ALL progress records (including the
    * trailing no-data micro-batch Spark runs to let the final watermark
    * evict — that batch is where the last eviction counts land). */
  def runAvailableNowDateSplitProgress(spark: SparkSession, path: String,
      queryName: String, outputMode: String = "append",
      timeCol: String = "ts")(
      transform: DataFrame => DataFrame)
      : (DataFrame, Seq[org.apache.spark.sql.streaming.StreamingQueryProgress]) = {
    val batch0 = spark.read.parquet(path)
    val batch =
      if (batch0.schema.fieldNames.contains("ts"))
        graft.Tables.normalizeEventTime(batch0)
      else batch0
    val row = batch
      .agg(min(unix_micros(col(timeCol))), max(unix_micros(col(timeCol))))
      .head()
    require(!row.isNullAt(0) && !row.isNullAt(1),
      s"runAvailableNowDateSplit($path): no non-null $timeCol rows")
    // the two-phase split assumes each phase is NON-EMPTY: phase 0 takes
    // [min, split) and phase 1 takes [split, max]. Guard on the computed
    // SPLIT, not on min < max (r20 review): with max == min + 1 µs the
    // integer midpoint collapses to min and phase 0 would be empty even
    // though min < max holds — and an empty phase writes a 0-row part
    // file, so the headOption error below would never fire either.
    val splitUs = (row.getLong(0) + row.getLong(1)) / 2
    require(splitUs > row.getLong(0),
      s"runAvailableNowDateSplit($path): $timeCol range " +
        s"[${row.getLong(0)}, ${row.getLong(1)}] µs is too narrow — the " +
        "integer midpoint equals the minimum, which would leave the " +
        "first phase empty; a two-batch split needs max ≥ min + 2")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-2b")
    def writePhase(i: Int, df: DataFrame): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-phase$i")
      // repartition(1), NOT coalesce(1) (r21, guide §2.4): coalesce
      // propagates the 1-partition constraint UP the plan, so the whole
      // scan + normalize + phase filter ran as ONE task; repartition
      // keeps the scan parallel and funnels only the surviving phase
      // rows through one exchange into the single part file the
      // maxFilesPerTrigger=1 contract needs. Within-file row order is
      // not load-bearing (each phase is consumed as one whole
      // micro-batch; every consumer aggregates).
      df.repartition(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.toFile.listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .headOption
        .getOrElse(sys.error(s"runAvailableNowDateSplit($path): phase $i " +
          "produced no parquet part file — the phase filter matched zero " +
          "rows despite the min<max split guard"))
      val dest = dir.resolve(f"phase-$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dest)
      // modTimes 60 s apart: phase order must never depend on how fast
      // the two writes happened to land on the local FS clock. Checked:
      // a filesystem that refuses setLastModified would silently drop
      // the ordering pin (r19 ADVICE).
      require(dest.toFile.setLastModified(1700000000000L + i * 60000L),
        s"runAvailableNowDateSplit: setLastModified refused on $dest — " +
          "phase ordering would depend on the local FS clock")
      tmp.toFile.listFiles().foreach(_.delete()); tmp.toFile.delete()
      // reverse-registration order (see runAvailableNowProgress): file
      // first, enclosing dir after the run's JVM exits
      dest.toFile.deleteOnExit()
    }
    dir.toFile.deleteOnExit()
    // The two phase writes are independent jobs over the same scan —
    // overlap them (guide §2.6) so phase B's scan back-fills the cores
    // phase A's single write task leaves idle. Phase ORDER is pinned by
    // file name + modTime inside writePhase, not by write completion
    // order, so concurrency cannot reorder the stream.
    graft.operators.Overlap.runAll(Seq[() => Unit](
      () => writePhase(0, batch.filter(col(timeCol).isNull ||
        unix_micros(col(timeCol)) < lit(splitUs))),
      () => writePhase(1, batch.filter(
        unix_micros(col(timeCol)) >= lit(splitUs)))))
    // phase files are written POST-normalization, so the stream schema is
    // plain session-TZ TIMESTAMP — no second normalization pass
    val sch = spark.read.parquet(dir.toString).schema
    val raw = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", 1).parquet(dir.toString)
    val q = transform(raw).writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    (spark.table(queryName), q.recentProgress.toSeq)
  }

  /** Flatten labeled progress sequences into one state-metrics DataFrame:
    * one row per (stream, micro-batch, stateful operator) with the
    * state-store row counts and byte footprint. This is the artifact
    * that turns "state is one long per signature" / "join state is
    * watermark-bounded" from Scaladoc claims into recorded numbers. */
  def stateMetrics(spark: SparkSession,
      labeled: Seq[(String, Seq[org.apache.spark.sql.streaming.StreamingQueryProgress])])
      : DataFrame = {
    import spark.implicits._
    labeled.flatMap { case (label, progs) =>
      progs.flatMap { p =>
        p.stateOperators.zipWithIndex.map { case (so, i) =>
          (label, p.batchId, i.toLong, so.operatorName,
            so.numRowsTotal, so.numRowsUpdated, so.numRowsRemoved,
            so.memoryUsedBytes, so.numShufflePartitions)
        }
      }
    }.toDF("stream", "batch_id", "op_idx", "operator_name", "rows_total",
      "rows_updated", "rows_removed", "mem_bytes", "n_store_partitions")
  }

  /** The DETERMINISTIC core of [[stateMetrics]] (r17 VERDICT item 1):
    * per labeled stream, the state-row counts of the FIRST micro-batch
    * that processed input rows. Under single-batch `AvailableNow` the
    * whole corpus is that batch and the watermark is still 0 when it
    * runs, so nothing evicts within it — rows_total / rows_updated /
    * rows_removed are then plain functions of the corpus (distinct
    * dedup keys; per-side insert counts for a stream-stream join) and a
    * SQL oracle can check them. One row per (stream, stateful operator);
    * op_idx orders multi-operator queries. Impl-dependent metrics
    * (mem_bytes, operator names, the eviction batch) belong in
    * [[stateMetrics]] / [[writeStateSidecar]], not here. */
  def firstBatchStateCounts(spark: SparkSession,
      labeled: Seq[(String, Seq[org.apache.spark.sql.streaming.StreamingQueryProgress])])
      : DataFrame = {
    import spark.implicits._
    labeled.flatMap { case (label, progs) =>
      val dataBatches = progs.filter(_.numInputRows > 0).sortBy(_.batchId)
      dataBatches.headOption.toSeq
        .flatMap { p =>
          // The oracle-checkability of these counts rests on the WHOLE
          // corpus landing in that first data batch (r18 ADVICE): if
          // maxFilesPerTrigger sneaks into the session conf (or
          // file-source batching changes), the first batch holds a
          // subset and the DuckDB mirror mismatches with no hint why —
          // fail loudly here, naming the assumption, instead.
          val total = dataBatches.map(_.numInputRows).sum
          require(p.numInputRows == total,
            s"firstBatchStateCounts($label): first data batch processed " +
              s"${p.numInputRows} of $total input rows — the single-batch " +
              "AvailableNow assumption is broken (maxFilesPerTrigger set, " +
              "or file-source batching changed); the first-batch state " +
              "counts are NOT corpus functions on a partial batch")
          p.stateOperators.zipWithIndex.map { case (so, i) =>
            (label, i.toLong, so.numRowsTotal, so.numRowsUpdated,
              so.numRowsRemoved)
          }
        }
    }.toDF("stream", "op_idx", "rows_total", "rows_updated", "rows_removed")
  }

  /** Verify-artifact sidecar for the store-impl-dependent streaming
    * observability (r17 VERDICT items 1+7): every batch's state metrics
    * (incl. mem_bytes and operator names) PLUS the run's rate/timing
    * numbers from the same StreamingQueryProgress objects —
    * inputRowsPerSecond, processedRowsPerSecond, batchDuration. One
    * JSON document, rewritten per run; a missing target dir never fails
    * the query. */
  def writeStateSidecar(path: String,
      labeled: Seq[(String, Seq[org.apache.spark.sql.streaming.StreamingQueryProgress])])
      : Unit = {
    // Locale.ROOT, not the default-locale f-interpolator: a comma
    // decimal separator would corrupt the JSON (review r18)
    def jn(d: Double): String =
      if (d.isNaN || d.isInfinite) "null"
      else String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val body = labeled.map { case (label, progs) =>
      val batches = progs.sortBy(_.batchId).map { p =>
        val ops = p.stateOperators.map { so =>
          s"""{"operator_name":"${so.operatorName}",""" +
            s""""rows_total":${so.numRowsTotal},""" +
            s""""rows_updated":${so.numRowsUpdated},""" +
            s""""rows_removed":${so.numRowsRemoved},""" +
            s""""mem_bytes":${so.memoryUsedBytes},""" +
            s""""n_store_partitions":${so.numShufflePartitions}}"""
        }.mkString("[", ",", "]")
        s"""{"batch_id":${p.batchId},"num_input_rows":${p.numInputRows},""" +
          s""""input_rows_per_sec":${jn(p.inputRowsPerSecond)},""" +
          s""""processed_rows_per_sec":${jn(p.processedRowsPerSecond)},""" +
          s""""batch_duration_ms":${p.batchDuration},"state_ops":$ops}"""
      }.mkString("[", ",", "]")
      s"""{"stream":"$label","batches":$batches}"""
    }.mkString("""{"streams":[""", ",", "]}")
    try {
      val p = java.nio.file.Paths.get(path)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.writeString(p, body)
    } catch { case _: java.io.IOException => }
  }
}
