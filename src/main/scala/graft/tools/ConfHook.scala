package graft.tools

import org.apache.spark.sql.SparkSession

/** Shared A/B experiment hook for the dev tools (Solo, SfSweep):
  * `SPARK_GRAFT_CONF="key=value;key=value"` applies extra Spark confs on
  * top of a builder's defaults, so two runs of the same tool can compare
  * settings (e.g. the AQE coalesce floor) with everything else identical.
  * Malformed segments (no '=', empty from a trailing ';') are skipped with
  * a warning instead of throwing MatchError.
  */
object ConfHook {
  def apply(builder: SparkSession.Builder): SparkSession.Builder = {
    sys.env.get("SPARK_GRAFT_CONF").foreach {
      _.split(";").iterator.map(_.trim).filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) if k.nonEmpty =>
            System.err.println(s"[conf-hook] $k=$v")
            builder.config(k, v)
          case _ =>
            System.err.println(s"[conf-hook] skipping malformed entry '$kv'")
        }
      }
    }
    builder
  }
}
