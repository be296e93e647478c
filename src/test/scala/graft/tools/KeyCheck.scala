package graft.tools
/** Dev probe: every query must have an oracle and vice versa. */
object KeyCheck {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"queries=${q.size} oracles=${o.size}")
    println(s"missing_oracle=${(q -- o).toSeq.sorted.mkString(",")}")
    println(s"orphan_oracle=${(o -- q).toSeq.sorted.mkString(",")}")
  }
}
