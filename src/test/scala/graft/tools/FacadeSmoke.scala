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
    s.stop()
  }
}
