package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: sfDir outDir [queryName ...] — the optional tail restricts the
    // dump to named queries (local iteration; the driver passes only two).
    val sfDir = args(0); val outDir = args(1)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Environment-drift guard: stamp a content fingerprint of every input
    // table into the artifact dir, so a regenerated corpus (the round-8
    // post-close surprise) is self-evident in the record.
    try {
      val (full, combined) = CorpusCheck.stamp(spark, sfDir)
      Files.writeString(Paths.get(s"$outDir/corpus_fingerprint.json"),
        s"""{"corpus_md5":"$combined","sf":"$sfDir","tables":$full}""")
      System.err.println(s"[verify] corpus_md5=$combined")
    } catch { case e: Throwable =>
      System.err.println(s"[verify] corpus fingerprint failed: ${e.getMessage}")
    }
    // Fail-loud: a query that throws must not silently vanish from the
    // compare (r4 shipped a broken query with no oracle evidence that way).
    // Record every failure in a manifest AND write a poison one-row parquet
    // whose schema can never match any oracle — so a per-oracle-entry
    // compare reports FAIL instead of skipping the query.
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getSimpleName}: ${e.getMessage}"
        failures(name) = msg
        System.err.println(s"[verify] $name FAILED: $msg")
        try {
          import spark.implicits._
          Seq(msg).toDF("_verify_failed").coalesce(1)
            .write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case _: Throwable => }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val failJson = failures
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_failures.json"), failJson)
    if (failures.nonEmpty)
      System.err.println(
        s"[verify] ${failures.size} QUERY FAILURE(S): ${failures.keys.mkString(", ")}")
    spark.stop()
  }
}
