package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.Decimal

/** Frozen-literal parity lint (VERDICT r16 #5): the statistics keys ship
  * FROZEN critical constants — chi-square / z² milli-criticals, the SPRT
  * log-likelihood boundaries, BH step-up criticals, Benford expectations,
  * DP thresholds — duplicated by design between the Scala plan and the
  * DuckDB oracle SQL. A one-sided edit (loosening a critical in Scala but
  * not the oracle, or vice versa) would ship a silently weaker test that
  * still hash-matches whenever the fixture never lands in the changed
  * band. This spec extracts every integer literal >= 1000 from the key's
  * ANALYZED Spark plan (including scalar subqueries) and every integer
  * token >= 1000 from its oracle SQL, and requires set equality — so the
  * frozen constants must move in lockstep. Reviewed structural one-siders
  * (a scale factor one engine gets from a builtin the other spells out)
  * live in per-key exclusion sets below, each with its reason.
  */
class FrozenLiteralParitySpec extends SparkSpecBase {

  /** The frozen-constant statistics keys under lint. */
  private val statKeys = Seq(
    "orders_mann_whitney", "orders_kruskal_wallis", "orders_dunn_posthoc",
    "orders_brown_forsythe", "orders_welch_effect",
    "events_mcnemar_conversion", "events_cochran_q",
    "events_sprt_monitor", "events_mk_fdr", "events_ab_srm_check",
    "events_benford", "events_runs_test", "events_durbin_watson",
    "events_pettitt_changepoint", "orders_ks_segments",
    "rank_corr_spearman", "privacy_dp_geometric_counts",
    "part_demand_intermittency", "events_bootstrap_ci")

  /** Reviewed one-siders: constant -> present only on the named side for a
    * structural reason (never a frozen critical). Populated from the first
    * lint run and re-reviewed whenever a key's test fails.
    */
  private val exclusions: Map[String, Set[BigInt]] = Map(
    // 1000 = the us->ns scale inside EventTime.toNanos on the Spark side;
    // the oracle gets nanoseconds free from DuckDB's epoch_ns() builtin
    "events_sprt_monitor" -> Set(BigInt(1000)),
    "events_mk_fdr" -> Set(BigInt(1000)),
    "events_benford" -> Set(BigInt(1000)),
    "events_pettitt_changepoint" -> Set(BigInt(1000)),
    "events_bootstrap_ci" -> Set(BigInt(1000)),
    // the oracle derives the day via epoch_ns // 86400000000000; the Spark
    // side uses the typed date path (no ns-per-day literal in its plan)
    "rank_corr_spearman" -> Set(BigInt("86400000000000")),
    // the SAME anchor date in two encodings: Spark's analyzed plan folds
    // DATE '1992-01-01' to its internal days-since-epoch int (8035), the
    // oracle SQL carries the '1992' text token
    "part_demand_intermittency" -> Set(BigInt(8035), BigInt(1992))
  ).withDefaultValue(Set.empty)

  private def fromLiteral(v: Any): Option[BigInt] = v match {
    case i: java.lang.Integer => Some(BigInt(i.intValue))
    case l: java.lang.Long => Some(BigInt(l.longValue))
    case s: java.lang.Short => Some(BigInt(s.intValue))
    case d: Decimal if d.scale == 0 =>
      Some(BigInt(d.toJavaBigDecimal.toBigIntegerExact))
    case _ => None
  }

  private def planLiterals(df: DataFrame): Set[BigInt] = {
    val out = scala.collection.mutable.Set.empty[BigInt]
    def fromExpr(e: Expression): Unit = e.foreach {
      case Literal(v, _) => fromLiteral(v).foreach(out += _)
      case s: SubqueryExpression => walk(s.plan)
      case _ => ()
    }
    def walk(p: LogicalPlan): Unit =
      p.foreach(n => n.expressions.foreach(fromExpr))
    walk(df.queryExecution.analyzed)
    out.toSet
  }

  private val intToken = "(?<![\\w.])(\\d+)(?![\\w.])".r

  private def sqlLiterals(sql: String): Set[BigInt] =
    intToken.findAllMatchIn(sql).map(m => BigInt(m.group(1))).toSet

  for (key <- statKeys) test(s"frozen literal parity: $key") {
    val df = SparkEntry.queries(key)(spark, sfDir)
    val excl = exclusions(key)
    val p = planLiterals(df).filter(_ >= 1000) -- excl
    val o = sqlLiterals(SparkEntry.oracleSql(key)).filter(_ >= 1000) -- excl
    val sparkOnly = p -- o
    val oracleOnly = o -- p
    assert(sparkOnly.isEmpty && oracleOnly.isEmpty,
      s"\n$key frozen-literal drift:" +
        s"\n  in Spark plan only: ${sparkOnly.toSeq.sorted.mkString(", ")}" +
        s"\n  in oracle SQL only: ${oracleOnly.toSeq.sorted.mkString(", ")}")
  }
}
