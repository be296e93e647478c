package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** r22 optimization-round probe (dev-only): per-stage timing and shape
  * variants for the q121/q245/q253 PrefixMinK chain — the largest real
  * cost left on the board (VERDICT r21 item 1). Interleaved A/B in ONE
  * JVM, min-of-N; variants differ ONLY in exchange/join shape, never in
  * the computed rows.
  *
  * Args: probe names (default all): stages, shapes, full
  */
object R22Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val which = if (args.isEmpty) Set("*") else args.toSet
    def on(n: String) = which("*") || which(n)

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def clean(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    def time(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      clean()
      println(f"[r22] $name: $s%.3f s")
      s
    }
    def interleave(reps: Int, arms: (String, () => Unit)*): Unit = {
      val acc = arms.map(a => a._1 ->
        collection.mutable.ArrayBuffer[Double]()).toMap
      (1 to reps).foreach { i =>
        arms.foreach { case (n, f) => acc(n) += time(s"$n/$i")(f()) }
      }
      arms.foreach { case (n, _) =>
        val v = acc(n)
        println(f"[r22] $n SUMMARY min=${v.min}%.3f " +
          f"med=${v.sorted.apply(v.size / 2)}%.3f")
      }
    }

    val docs = graft.Tables.documents(spark, sfDir)
    val (idCol, textCol) = ("doc_id", "text")
    val (shingleK, numT, denT) = (8, 3, 5)

    // the shipped prefixToks front: spread + filter + shingle explode,
    // checkpointed (as in Dedup.prefixToks at sf0.1 input sizes)
    def mkToks(): DataFrame = {
      val par = spark.sparkContext.defaultParallelism
      val spread =
        if (docs.rdd.getNumPartitions < par) docs.repartition(par) else docs
      val base = spread.filter(length(trim(col(textCol))) > 0)
      val shingleExpr = TextFunctions.charShingles(
        TextFunctions.normalize(col(textCol)), shingleK)
      base
        .select(col(idCol).as("doc_id"), size(shingleExpr).as("n"),
          col(textCol))
        .select(col("doc_id"), col("n"), explode(shingleExpr).as("tok"))
        .localCheckpoint()
    }

    def aggOver(joined: DataFrame): DataFrame = joined
      .groupBy(col("doc_id"))
      .agg(graft.functions.PrefixMinK.column(numT, denT)(
        col("n"), col("dfreq"), col("tok")).as("pk"))
      .select(col("doc_id"), col("pk.n").as("n"),
        explode(col("pk.items")).as("x"))
      .select(col("doc_id"), col("n"), col("x.tok").as("tok"))

    // ---------- per-stage split of the shipped shape ----------
    // (each arm rebuilds toks inside the timed region — clean() unpersists
    // checkpoints between runs; the toks cost is a constant across arms,
    // so the DELTAS are the stage costs)
    if (on("stages")) {
      def dfreqOf(t: DataFrame) =
        t.groupBy(col("tok")).agg(count(lit(1)).as("dfreq"))
      interleave(3,
        "st-toks" -> (() => noop(mkToks())),
        "st-dfreq" -> (() => { val t = mkToks(); noop(dfreqOf(t)) }),
        "st-join" -> (() => { val t = mkToks(); noop(t.join(dfreqOf(t), "tok")) }),
        "st-join-agg" -> (() =>
          { val t = mkToks(); noop(aggOver(t.join(dfreqOf(t), "tok"))) })
      )
    }

    // ---------- exchange/join shape variants, same computed rows ----------
    if (on("shapes")) {
      def shipped(): Unit = {
        val toks = mkToks()
        val dfreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("dfreq"))
        noop(aggOver(toks.join(dfreq, "tok")))
      }
      def shj(): Unit = {
        val toks = mkToks()
        val dfreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("dfreq"))
        noop(aggOver(toks.join(dfreq.hint("shuffle_hash"), "tok")))
      }
      def repartShared(): Unit = {
        val toks = mkToks().repartition(col("tok"))
        val dfreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("dfreq"))
        noop(aggOver(toks.join(dfreq, "tok")))
      }
      def bhj(): Unit = {
        val toks = mkToks()
        val dfreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("dfreq"))
        noop(aggOver(toks.join(broadcast(dfreq), "tok")))
      }
      interleave(3,
        "sh-shipped" -> (() => shipped()),
        "sh-shj" -> (() => shj()),
        "sh-repart" -> (() => repartShared()),
        "sh-bhj" -> (() => bhj())
      )
    }

    // ---------- AQE adaptive broadcast threshold (runtime-size gated) ----
    if (on("aqebc")) {
      def withConf(k: String, v: String)(f: => Unit): Unit = {
        val old = spark.conf.getOption(k)
        spark.conf.set(k, v)
        try f finally old match {
          case Some(o) => spark.conf.set(k, o)
          case None => spark.conf.unset(k)
        }
      }
      def stage(): Unit = {
        val toks = mkToks()
        val dfreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("dfreq"))
        noop(aggOver(toks.join(dfreq, "tok")))
      }
      interleave(4,
        "bc-def" -> (() => stage()),
        "bc-64m" -> (() => withConf(
          "spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")(stage())),
        "bc-128m" -> (() => withConf(
          "spark.sql.adaptive.autoBroadcastJoinThreshold", "128m")(stage()))
      )
      // dict size for the threshold choice
      val toks = mkToks()
      val dfreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("dfreq"))
      println(s"[r22] dict rows = ${dfreq.count()}")
      // plan evidence: which join strategy did AQE pick at each threshold?
      def joinOf(label: String): Unit = {
        val df = aggOver(toks.join(dfreq, "tok"))
        noop(df)
        val p = df.queryExecution.executedPlan.toString
        val strat = Seq("BroadcastHashJoin", "SortMergeJoin",
          "ShuffledHashJoin").filter(p.contains).mkString(",")
        val nEx = "Exchange".r.findAllIn(p).size
        println(s"[r22] plan[$label]: join=$strat exchanges=$nEx")
      }
      joinOf("default")
      withConf("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")(
        joinOf("64m"))
      withConf("spark.sql.adaptive.autoBroadcastJoinThreshold", "128m")(
        joinOf("128m"))
      toks.unpersist()
    }

    // ---------- per-job timeline of a full query (driver gaps = planning /
    // checkpoint sync; job spans = cluster compute) ----------
    if (on("jobs")) {
      val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      @volatile var t0 = System.nanoTime()
      def rel(t: Long = System.nanoTime()): Double = (t - t0) / 1e9
      val listener = new org.apache.spark.scheduler.SparkListener {
        val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          starts.put(js.jobId, System.nanoTime())
          events.add(f"[r22] job ${js.jobId}%3d START ${rel()}%7.3f " +
            s"stages=${js.stageInfos.size} " +
            js.stageInfos.map(_.name.takeWhile(_ != '\n')).mkString("|"))
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val st = Option(starts.get(je.jobId)).getOrElse(0L)
          events.add(f"[r22] job ${je.jobId}%3d END   ${rel()}%7.3f " +
            f"dur=${(System.nanoTime() - st) / 1e9}%6.3f")
        }
      }
      spark.sparkContext.addSparkListener(listener)
      args.filter(_.startsWith("q")).headOption.orElse(Some("q121")).foreach {
        q =>
        val full = graft.SparkEntry.queries.keys.find(_.startsWith(q + "_"))
          .getOrElse(q)
        (1 to 2).foreach { rep =>
          events.clear()
          t0 = System.nanoTime()
          val s = time(s"$full/jobs$rep")(
            noop(graft.SparkEntry.queries(full)(spark, sfDir)))
          Thread.sleep(300)
          events.forEach(e => println(e))
        }
      }
      spark.sparkContext.removeSparkListener(listener)
    }

    // ---------- full operators A/A (reference floor) ----------
    if (on("full")) {
      interleave(3,
        "q121-full" -> (() =>
          noop(graft.operators.Dedup.prefixJaccardPairs(
            docs, idCol, textCol))),
        "q245-full" -> (() =>
          noop(graft.operators.Dedup.prefixHotness(docs, idCol, textCol)))
      )
    }

    spark.stop()
  }
}
