package graft

/** Dev utility: report queries-without-oracle (rows-only keys). */
object KeyAudit {
  def main(args: Array[String]): Unit = {
    val qk = SparkEntry.queries.keySet
    val ok = SparkEntry.oracleSql.keySet
    println(s"AUDIT queries=${qk.size} oracles=${ok.size}")
    println("AUDIT rows-only: " + (qk -- ok).toSeq.sorted.mkString(", "))
    println("AUDIT orphan-oracles: " + (ok -- qk).toSeq.sorted.mkString(", "))
  }
}
