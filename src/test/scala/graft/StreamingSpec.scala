package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingOps

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.session

  val sfDir = "/root/testdata/sf0.001"

  test("AvailableNow streaming windowed agg matches batch result") {
    val streamed = StreamingOps.runAvailableNow(spark,
      s"$sfDir/events.parquet", "stream_agg", outputMode = "complete")(
      df => StreamingOps.windowedEventAgg(df, "1 hour", "10 minutes"))

    val batch = StreamingOps.windowedEventAgg(
      Tables.events(spark, sfDir), "1 hour", "10 minutes")

    val s = streamed.orderBy("window_start", "event_type").collect().toSeq
    val b = batch.orderBy("window_start", "event_type").collect().toSeq
    assert(s.size == b.size && s.size > 0)
    assert(s.toString == b.toString)
  }

  test("streaming dedup within watermark drops exact repeats") {
    val dedup = StreamingOps.runAvailableNow(spark,
      s"$sfDir/events.parquet", "stream_dedup")(
      df => StreamingOps.dedupWithinWatermark(
        df.select(col("ts"), col("event_id")).unionAll(
          df.select(col("ts"), col("event_id"))), // duplicate the feed
        "1 hour", Seq("event_id")))
    val n = dedup.count()
    val expected = Tables.events(spark, sfDir).count()
    assert(n == expected, s"got $n expected $expected")
  }
}
