package graft.tools

/** Dev smoke for the Graft facade's dedup-family delegations (incl. the
  * r14 auto-cap passthroughs) — every call must run end-to-end. */
object FacadeSmoke {
  def main(args: Array[String]): Unit = {
    val s = graft.Graft.session("local[4]", 4)
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val d = Seq((1L, "aaaa bbbb cccc dddd"), (2L, "aaaa bbbb cccc dddd"),
      (3L, "eeee ffff gggg hhhh")).toDF("doc_id", "text")
    println("SMOKE hotness=" + graft.Graft.prefixHotness(d, "doc_id", "text").count())
    println("SMOKE contain=" + graft.Graft.containmentPairs(d, "doc_id", "text",
      maxDocsPerTok = 0).count())
    println("SMOKE jacc=" + graft.Graft.prefixJaccardPairs(d, "doc_id", "text",
      maxDocsPerTok = 0).count())
    println("SMOKE edj=" + graft.Graft.editDistanceJoin(
      d.selectExpr("doc_id as id", "substring(text, 1, 4) as s"), "id", "s").count())
    println("SMOKE readability=" +
      graft.Graft.readability(d, "doc_id", "text").count())
    println("SMOKE invidx=" +
      graft.Graft.invertedIndex(d, "doc_id", "text").count())
    val prep = Seq(("S1", "BANCO", 50.0), ("S1", "PARQUE", 350.0))
      .toDF("rst_cd", "poi_category", "distance_mtrs")
    val nex = graft.Graft.siteVariants("NEX")
    println("SMOKE fv=" + graft.Graft.featureVectorFor(prep, nex).columns.length)
    println("SMOKE gc=" + graft.Graft.globalCountsFor(prep, nex)
      .head().getAs[Long]("GEO_POI_300M_CANT")) // 350 m row excluded: 1
    // batch mode runs the same streaming code paths (stream/batch parity)
    val ev = Seq((1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00")),
      (1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
      .toDF("id", "ts")
    println("SMOKE wmdedup=" +
      graft.Graft.dedupWithinWatermark(ev, "1 minute", Seq("id")).count())
    import graft.streaming.StatefulSessionize.Event
    println("SMOKE sessions=" + graft.Graft.sessionize(
      Seq(Event(1L, 1L, 0L, 1.0), Event(1L, 2L, 900000000L, 1.0)).toDS(),
      gapSeconds = 300L).count())
    s.stop()
  }
}
