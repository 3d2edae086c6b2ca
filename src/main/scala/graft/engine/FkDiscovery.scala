package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-driven foreign-key discovery: inclusion-dependency scan over a
  * declared candidate list (the bounded-verification half of IND-mining
  * systems like SPIDER / BINDER, De Marchi et al.'s unary INDs). The
  * reference's subsetter takes FKs from CONFIG
  * (`/root/reference/config_reader.py:24-44`); this operator measures,
  * per candidate (child.col → parent.col), how much of the child's value
  * set the parent actually covers — the evidence a user needs before
  * declaring the edge, and the audit that catches a mis-declared one.
  *
  * Each candidate costs one distinct + one left-semi join keyed on the
  * value (broadcast when the parent key set is dimension-sized) and two
  * one-row aggregates; candidates are config-sized, so the unioned plan
  * stays bounded. Containment is integer basis points; `is_fk_candidate`
  * flags full containment.
  */
object FkDiscovery {

  /** One (childTable, childDf, childCol, parentTable, parentDf, parentCol)
    * per candidate edge.
    */
  def inclusionReport(
      cands: Seq[(String, DataFrame, String, String, DataFrame, String)])
      : DataFrame = {
    require(cands.nonEmpty, "inclusionReport: no candidates")
    cands.map { case (cn, cdf, cc, pn, pdf, pc) =>
      val cd = cdf.select(col(cc).as("v")).filter(col("v").isNotNull).distinct()
      val pd = pdf.select(col(pc).as("v")).filter(col("v").isNotNull).distinct()
      val matched = cd.join(pd, Seq("v"), "left_semi")
        .agg(count(lit(1)).as("n_matched"))
      cd.agg(count(lit(1)).as("n_child_distinct"))
        .crossJoin(broadcast(matched))
        .select(
          lit(s"$cn.$cc").as("child"),
          lit(s"$pn.$pc").as("parent"),
          col("n_child_distinct"), col("n_matched"),
          // an all-NULL child column has 0 distinct values: report 0
          // containment and do NOT flag it (0 = 0 would vacuously claim
          // full containment, and the div would emit NULL)
          expr("CASE WHEN n_child_distinct = 0 THEN 0L " +
            "ELSE (n_matched * 10000L) div n_child_distinct END")
            .as("containment_bp"),
          expr("CAST(CASE WHEN n_child_distinct = 0 THEN 0 " +
            "WHEN n_matched = n_child_distinct THEN 1 ELSE 0 END AS INT)")
            .as("is_fk_candidate"))
    }.reduce(_ unionByName _)
  }
}
