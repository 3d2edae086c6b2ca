package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-of-run tabulation: per-table (source rows, dest rows, ratio) —
  * /root/reference/result_tabulator.py:6-22. `df.count()` on Parquet reads
  * footer row counts, so this stays cheap even at scale.
  */
object Report {

  final case class TableReport(table: String, sourceRows: Long, destRows: Long) {
    def ratio: Double = if (sourceRows == 0) 0.0 else destRows.toDouble / sourceRows
  }

  def tabulate(
      source: Map[String, DataFrame],
      dest: Map[String, DataFrame]): Seq[TableReport] =
    source.keys.toSeq.sorted.map { t =>
      TableReport(t, source(t).count(), dest.get(t).map(_.count()).getOrElse(0L))
    }

  /** The same report as a DataFrame, for programmatic/SQL consumption. */
  def tabulateDf(
      spark: SparkSession,
      source: Map[String, DataFrame],
      dest: Map[String, DataFrame]): DataFrame = {
    import spark.implicits._
    tabulate(source, dest)
      .map(r => (r.table, r.sourceRows, r.destRows, r.ratio))
      .toDF("table_name", "source_rows", "dest_rows", "ratio")
  }

  def render(reports: Seq[TableReport]): String = {
    val header = f"${"table"}%-30s ${"source"}%12s ${"dest"}%12s ${"ratio"}%8s"
    val lines = reports.map(r =>
      f"${r.table}%-30s ${r.sourceRows}%12d ${r.destRows}%12d ${r.ratio}%8.4f")
    (header +: lines).mkString("\n")
  }
}
