package graft.tools
object KeyParity {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println("PARITY counts q=" + q.size + " o=" + o.size)
    println("PARITY missing_oracle=" + (q -- o).toSeq.sorted.mkString(","))
    println("PARITY orphan_oracle=" + (o -- q).toSeq.sorted.mkString(","))
  }
}
