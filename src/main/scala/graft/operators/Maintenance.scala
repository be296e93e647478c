package graft.operators

import org.apache.spark.sql.SparkSession

/** Lakehouse table maintenance. The reference never needs this (it
  * INSERTs into Azure SQL), but any 100 TB parquet deployment of these
  * pipelines does: incremental loads (S13 dynamic partition overwrite,
  * streaming sinks) accrete small files until scan task scheduling and
  * footer reads dominate query time. */
object Maintenance {

  /** Rewrite a parquet directory into ~`targetBytes`-sized files.
    *
    * Sizing is derived from the CURRENT on-disk bytes (post-compression),
    * so the rewrite hits the target without sampling row widths. The
    * rewrite lands in `dir + ".compact.tmp"` and swaps in atomically at
    * the directory level (rename), keeping readers consistent on POSIX
    * filesystems; object stores should point this at a staging prefix and
    * flip a catalog/manifest instead.
    *
    * Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetFiles(p: org.apache.hadoop.fs.Path) =
      fs.listStatus(p).filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val before = parquetFiles(path)
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

    val tmp = new org.apache.hadoop.fs.Path(dir + ".compact.tmp")
    fs.delete(tmp, true)
    spark.read.parquet(dir).repartition(nOut)
      .write.mode("overwrite").parquet(tmp.toString)

    val old = new org.apache.hadoop.fs.Path(dir + ".compact.old")
    fs.delete(old, true)
    require(fs.rename(path, old), s"could not move $dir aside")
    require(fs.rename(tmp, path), s"could not swap compacted dir into $dir")
    fs.delete(old, true)
    (before.length, parquetFiles(path).length)
  }
}
