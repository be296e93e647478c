package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{Corpus, Dedup}

/** r21 optimization-round A/B probe (dev-only, not part of the contract):
  * times the SHIPPED shape of a hot query against a candidate rewrite in
  * ONE JVM, interleaved A/B/A/B so JIT and page-cache drift cancel.
  * Args: probe names (default: all). Timings via noop-equivalent actions.
  */
object R21Probe {
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
      println(f"[r21] $name: $s%.3f s")
      s
    }
    def ab(name: String, reps: Int = 3)(a: => Unit)(b: => Unit): Unit = {
      val as = collection.mutable.ArrayBuffer[Double]()
      val bs = collection.mutable.ArrayBuffer[Double]()
      (1 to reps).foreach { i =>
        as += time(s"$name/A$i")(a)
        bs += time(s"$name/B$i")(b)
      }
      println(f"[r21] $name SUMMARY A_min=${as.min}%.3f B_min=${bs.min}%.3f " +
        f"A_med=${as.sorted.apply(as.size / 2)}%.3f " +
        f"B_med=${bs.sorted.apply(bs.size / 2)}%.3f")
    }

    val docs = graft.Tables.documents(spark, sfDir)
    val lineitem = graft.Tables.lineitem(spark, sfDir)

    // ---------- q208: sequential vs parallel format writes ----------
    if (on("q208")) {
      val base = lineitem.select(col("l_orderkey"), col("l_partkey"),
        col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast("long").as("qty"))
      val sch = base.schema
      def writes(tmp: String, par: Boolean): Unit = {
        val jobs: Seq[() => Unit] = Seq(
          () => base.write.mode("overwrite").parquet(s"$tmp/p"),
          () => base.write.mode("overwrite").option("header", "true").csv(s"$tmp/c"),
          () => base.write.mode("overwrite").json(s"$tmp/j"),
          () => base.write.mode("overwrite").orc(s"$tmp/o"))
        if (par) {
          val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
          try jobs.map(j => pool.submit(new Runnable { def run(): Unit = j() }))
            .foreach(_.get())
          finally pool.shutdown()
        } else jobs.foreach(_())
        def fp(df: DataFrame, label: String) =
          graft.operators.Maintenance.tableFingerprint(df, df.columns.toSeq)
            .select(lit(label).as("format"), col("n_rows"), col("lane_a"),
              col("lane_b"))
        noop(fp(spark.read.parquet(s"$tmp/p"), "parquet")
          .unionByName(fp(spark.read.schema(sch)
            .option("header", "true").csv(s"$tmp/c"), "csv"))
          .unionByName(fp(spark.read.schema(sch).json(s"$tmp/j"), "json"))
          .unionByName(fp(spark.read.orc(s"$tmp/o"), "orc")))
      }
      ab("q208-writes")(
        writes("/tmp/r21probe/q208a", par = false))(
        writes("/tmp/r21probe/q208b", par = true))
    }

    // ---------- q107/q112 shape: recomputed vs checkpointed shd ----------
    if (on("shd")) {
      val d0 = docs.filter(length(trim(col("text"))) > 0)
      def q107body(ckpt: Boolean): Unit = {
        val numHashes = 16
        val sig = Dedup.md5MinhashSignatures(d0, "doc_id", "text",
          numHashes = numHashes).localCheckpoint()
        val pairs = Dedup.candidatesFromSignatures(sig, numHashes = numHashes)
        val agree = pairs
          .join(sig.as("sa"), col("id_a") === col("sa.doc_id"))
          .join(sig.as("sb"), col("id_b") === col("sb.doc_id"))
          .select(col("id_a"), col("id_b"),
            aggregate(zip_with(col("sa.ls"), col("sb.ls"),
                (x, y) => when(x === y, 1L).otherwise(0L)),
              lit(0L), (acc, v) => acc + v).as("n_agree"))
        val shd0 = d0.select(col("doc_id"),
          explode(graft.functions.ShingleOps.wordShinglesCol(col("text"), 3))
            .as("sh")).distinct()
        val shd = if (ckpt) shd0.localCheckpoint() else shd0
        val sizes = shd.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        val inter = broadcast(pairs)
          .join(shd.as("ha"), col("id_a") === col("ha.doc_id"))
          .join(shd.as("hb"),
            col("id_b") === col("hb.doc_id") && col("ha.sh") === col("hb.sh"))
          .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_inter"))
        noop(agree
          .join(inter, Seq("id_a", "id_b"), "left")
          .join(sizes.as("za"), col("id_a") === col("za.doc_id"))
          .join(sizes.as("zb"), col("id_b") === col("zb.doc_id"))
          .select(col("id_a"), col("id_b"), col("n_agree"), col("n_inter")))
      }
      ab("q107-shd")(q107body(ckpt = false))(q107body(ckpt = true))
    }

    // ---------- q210: shipped union-of-lineages vs one-pass + ckpt ----
    if (on("q210")) {
      def shipped(): Unit = {
        val raw = docs.select(col("doc_id"), col("text"),
          Corpus.wordsCount(col("text")).as("n_tok"))
        val s1 = raw.filter(length(trim(col("text"))) > 0)
        val s2 = s1.filter(col("n_tok") >= 10)
        val s3 = s2.withColumn("_rn", row_number().over(
            Window.partitionBy(TextFunctions.fingerprint(col("text")))
              .orderBy(col("doc_id"))))
          .filter(col("_rn") === 1).drop("_rn")
        val s4 = Dedup.duplicatedSpanRemoval(s3, "doc_id", "text",
            gramN = 5, minDocs = 2)
          .select(col("doc_id"),
            (col("n_tokens") - col("n_dropped")).as("n_tok"))
          .filter(col("n_tok") >= 10)
        def stage(i: Int, name: String, df: DataFrame) =
          df.agg(count(lit(1)).cast("long").as("n_docs"),
              coalesce(sum(col("n_tok")), lit(0L)).cast("long").as("n_tokens"))
            .select(lit(i.toLong).as("stage"), lit(name).as("name"),
              col("n_docs"), col("n_tokens"))
        noop(stage(0, "raw", raw)
          .unionByName(stage(1, "non_empty", s1))
          .unionByName(stage(2, "min_tokens", s2))
          .unionByName(stage(3, "exact_keeper", s3))
          .unionByName(stage(4, "span_clean", s4)))
      }
      def candidate(): Unit = {
        val raw = docs.select(col("doc_id"), col("text"),
          Corpus.wordsCount(col("text")).as("n_tok"))
        // stages 0-2 in ONE conditional-aggregation pass
        val nonEmpty = length(trim(col("text"))) > 0
        val minTok = nonEmpty && col("n_tok") >= 10
        val s012 = raw.agg(
          count(lit(1)).cast("long").as("n0"),
          sum(col("n_tok")).cast("long").as("t0"),
          sum(when(nonEmpty, 1L).otherwise(0L)).cast("long").as("n1"),
          sum(when(nonEmpty, col("n_tok")).otherwise(0L)).cast("long").as("t1"),
          sum(when(minTok, 1L).otherwise(0L)).cast("long").as("n2"),
          sum(when(minTok, col("n_tok")).otherwise(0L)).cast("long").as("t2"))
        val s2 = raw.filter(length(trim(col("text"))) > 0)
          .filter(col("n_tok") >= 10)
        val s3 = s2.withColumn("_rn", row_number().over(
            Window.partitionBy(TextFunctions.fingerprint(col("text")))
              .orderBy(col("doc_id"))))
          .filter(col("_rn") === 1).drop("_rn")
          .localCheckpoint()
        val s4 = Dedup.duplicatedSpanRemoval(s3, "doc_id", "text",
            gramN = 5, minDocs = 2)
          .select(col("doc_id"),
            (col("n_tokens") - col("n_dropped")).as("n_tok"))
          .filter(col("n_tok") >= 10)
        def stage(i: Int, name: String, df: DataFrame) =
          df.agg(count(lit(1)).cast("long").as("n_docs"),
              coalesce(sum(col("n_tok")), lit(0L)).cast("long").as("n_tokens"))
            .select(lit(i.toLong).as("stage"), lit(name).as("name"),
              col("n_docs"), col("n_tokens"))
        def stageLit(i: Int, name: String, n: Column, t: Column) =
          s012.select(lit(i.toLong).as("stage"), lit(name).as("name"),
            n.as("n_docs"), t.as("n_tokens"))
        noop(stageLit(0, "raw", col("n0"), col("t0"))
          .unionByName(stageLit(1, "non_empty", col("n1"), col("t1")))
          .unionByName(stageLit(2, "min_tokens", col("n2"), col("t2")))
          .unionByName(stage(3, "exact_keeper", s3))
          .unionByName(stage(4, "span_clean", s4)))
      }
      ab("q210")(shipped())(candidate())
    }

    // ---------- spanRemoval: recomputed grams vs checkpointed ----------
    if (on("span")) {
      def body(ckpt: Boolean): Unit = {
        val base = docs.filter(length(trim(col("text"))) > 0)
          .select(col("doc_id"),
            split(trim(lower(col("text"))), "\\s+").as("toks"))
        val grams0 = base.filter(size(col("toks")) >= 5)
          .select(col("doc_id"), posexplode(
            graft.functions.TextFunctions.wordShinglesRaw(col("toks"), 5)))
          .toDF("doc_id", "s", "g")
        val grams = if (ckpt) grams0.localCheckpoint() else grams0
        val hot = grams.groupBy(col("g"))
          .agg(countDistinct(col("doc_id")).as("nd"))
          .filter(col("nd") >= 2)
          .select(col("g"))
        val starts = grams.join(hot, Seq("g"))
          .groupBy(col("doc_id"))
          .agg(sort_array(collect_set(col("s"))).as("starts"))
        noop(base.join(starts, Seq("doc_id"), "left")
          .withColumn("st",
            coalesce(col("starts"), typedLit(Array.empty[Int])))
          .withColumn("kept",
            graft.functions.TextFunctions.tokenSpanFilter(
              col("toks"), col("st"), 5))
          .select(col("doc_id"),
            size(col("toks")).cast("long").as("n_tokens"),
            (size(col("toks")) - size(col("kept"))).cast("long").as("n_dropped"),
            concat_ws(" ", col("kept")).as("text_clean")))
      }
      ab("span-grams")(body(ckpt = false))(body(ckpt = true))
    }

    // ---------- q154: dfreq recompute vs checkpoint ----------
    if (on("q154")) {
      def body(): Unit =
        noop(Dedup.containmentPairs(docs, "doc_id", "text",
          shingleK = 8, numT = 3, denT = 4, maxDocsPerTok = 20))
      ab("q154-shipped", reps = 3)(body())(body())
    }

    // ---------- q202 stage timing ----------
    if (on("q202")) {
      val customer = graft.Tables.customer(spark, sfDir)
      ab("q202-shipped", reps = 3)(
        noop(Dedup.editDistanceJoin(customer, "c_custkey", "c_name")))(
        noop(Dedup.editDistanceJoin(customer, "c_custkey", "c_name")))
    }

    spark.stop()
  }
}
