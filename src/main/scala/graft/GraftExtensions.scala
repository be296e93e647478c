package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DoubleType, IntegerType}

import graft.functions.{HaversineDistance, SimHash64, WordShingles}

/** Spark-native extension point: `--conf
  * spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`) registers
  * the engine's native functions for pure-SQL users — the Catalyst-level
  * equivalent of the reference exposing its helpers to every pipeline:
  *
  *  - `haversine_m(lat1, lon1, lat2, lon2)` → meters (F17)
  *  - `simhash64(array<string>)` → 64-bit signature (dedup north star)
  *  - `word_shingles(text, n)` → array<string> n-gram shingles
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name)

  override def apply(e: SparkSessionExtensions): Unit = {
    // SURVEY §4 custom piece 3: cross-join + haversine filter → banded join
    e.injectOptimizerRule(_ => graft.plans.BandedDistanceJoinRule)
    e.injectFunction((FunctionIdentifier("haversine_m"),
      info("haversine_m", "haversine_m(lat1, lon1, lat2, lon2) - great-circle meters"),
      (exprs: Seq[Expression]) => HaversineDistance(
        Cast(exprs(0), DoubleType), Cast(exprs(1), DoubleType),
        Cast(exprs(2), DoubleType), Cast(exprs(3), DoubleType))))
    e.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(array<string>) - 64-bit simhash"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    e.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(text, n) - word n-gram shingles"),
      (exprs: Seq[Expression]) => WordShingles(exprs(0),
        exprs(1).eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => Cast(exprs(1), IntegerType).eval(null).asInstanceOf[Int]
        })))
  }
}
