package graft.config

import graft.graph.{DependencyBreak, Fk}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** One initial subsetting target: a table plus either a SQL `where` predicate
  * or a Bernoulli `percent` (/root/reference/subset.py:105-117). Exactly one
  * of `where`/`percent` must be set — enforced at run time like the
  * reference's error (/root/reference/subset.py:116).
  */
final case class InitialTarget(
    table: String,
    where: Option[String] = None,
    percent: Option[Double] = None)

/** Extra filter ANDed into upstream subsetting: applies when the processed
  * table matches `table`, or when the table has column `column`
  * (/root/reference/subset_utils.py:23-31).
  */
final case class UpstreamFilter(
    condition: String,
    table: Option[String] = None,
    column: Option[String] = None)

/** A dependency break, optionally preserving FK values instead of NULLing
  * them ("perserve_fk_opportunistically" [sic] —
  * /root/reference/config_reader.py:23-24).
  */
final case class BreakSpec(
    fkTable: String,
    targetTable: String,
    preserveFkOpportunistically: Boolean = false) {
  def toBreak: DependencyBreak = DependencyBreak(fkTable, targetTable)
}

/** The engine's "query language": a JSON config, not SQL
  * (/root/reference/config_reader.py:5-77,
  * /root/reference/config.json.example_all). Connection info is replaced by
  * the Parquet catalog directory; FK metadata comes exclusively from
  * `fkAugmentation` because Parquet stores no constraints (the reference
  * already supports config-declared FKs via the same key,
  * /root/reference/psql_database_helper.py:148-156).
  */
final case class SubsetConfig(
    initialTargets: Seq[InitialTarget],
    passthroughTables: Seq[String] = Nil,
    excludedTables: Seq[String] = Nil,
    dependencyBreaks: Seq[BreakSpec] = Nil,
    fkAugmentation: Seq[Fk] = Nil,
    upstreamFilters: Seq[UpstreamFilter] = Nil,
    maxRowsPerTable: Option[Long] = None,
    keepDisconnectedTables: Boolean = false,
    preConstraintSql: Seq[String] = Nil,
    postSubsetSql: Seq[String] = Nil,
    sampleSeed: Long = 42L) {

  def targetTables: Seq[String] = initialTargets.map(_.table)

  def breaks: Set[DependencyBreak] = dependencyBreaks.map(_.toBreak).toSet

  /** Breaks whose FK columns should keep their values (orphan rows accepted)
    * instead of being NULLed (/root/reference/config_reader.py:23-24).
    */
  def opportunisticBreaks: Set[DependencyBreak] =
    dependencyBreaks.filter(_.preserveFkOpportunistically).map(_.toBreak).toSet
}

object SubsetConfig {

  /** Parse the reference's JSON config shape
    * (/root/reference/config.json.example_all:1-57), including the
    * `fk_schema`/`target_schema` variant of FK records
    * (/root/reference/config_reader.py:65-74) and the rejection of the v1
    * `desired_result` key (/root/reference/config_reader.py:16-17).
    */
  def fromJson(json: String): SubsetConfig = {
    val root = JsonMethods.parse(json)
    if ((root \ "desired_result") != JNothing)
      throw new IllegalArgumentException(
        "desired_result is a key in the old config spec. Check the README " +
          "for the latest configuration parameters.")

    def strings(field: String): Seq[String] =
      (root \ field) match {
        case JArray(xs) => xs.collect { case JString(s) => s }
        case _ => Nil
      }
    def optStr(v: JValue): Option[String] =
      v match { case JString(s) => Some(s); case _ => None }
    def optNum(v: JValue): Option[Double] =
      v match {
        case JInt(i) => Some(i.toDouble)
        case JDouble(d) => Some(d)
        case JDecimal(d) => Some(d.toDouble)
        case JString(s) => s.toDoubleOption
        case _ => None
      }

    val targets = (root \ "initial_targets") match {
      case JArray(xs) =>
        xs.map { t =>
          InitialTarget(
            table = optStr(t \ "table").getOrElse(
              throw new IllegalArgumentException("initial_targets entry missing 'table'")),
            where = optStr(t \ "where"),
            percent = optNum(t \ "percent"))
        }
      case _ => Nil
    }

    val breaks = (root \ "dependency_breaks") match {
      case JArray(xs) =>
        xs.map { b =>
          BreakSpec(
            fkTable = optStr(b \ "fk_table").getOrElse(""),
            targetTable = optStr(b \ "target_table").getOrElse(""),
            preserveFkOpportunistically = (b \ "perserve_fk_opportunistically") match {
              case JBool(v) => v
              case _ => false
            })
        }
      case _ => Nil
    }

    def fkRecord(o: JValue): Fk = {
      def cols(v: JValue): Seq[String] =
        v match {
          case JArray(xs) => xs.collect { case JString(s) => s }
          case JString(s) => Seq(s)
          case _ => Nil
        }
      optStr(o \ "fk_schema") match {
        // Tonic format: schema carried separately (config_reader.py:65-74)
        case Some(schema) =>
          Fk(
            schema + "." + optStr(o \ "fk_table").getOrElse(""),
            cols(o \ "fk_columns"),
            optStr(o \ "target_schema").getOrElse("") + "." +
              optStr(o \ "target_table").getOrElse(""),
            cols(o \ "target_columns"))
        case None =>
          Fk(
            optStr(o \ "fk_table").getOrElse(""),
            cols(o \ "fk_columns"),
            optStr(o \ "target_table").getOrElse(""),
            cols(o \ "target_columns"))
      }
    }

    val fks = (root \ "fk_augmentation") match {
      case JArray(xs) => xs.map(fkRecord)
      case _ => Nil
    }

    val filters = (root \ "upstream_filters") match {
      case JArray(xs) =>
        xs.map { f =>
          UpstreamFilter(
            condition = optStr(f \ "condition").getOrElse(""),
            table = optStr(f \ "table"),
            column = optStr(f \ "column"))
        }
      case _ => Nil
    }

    val maxRows = (root \ "max_rows_per_table") match {
      case JInt(i) => Some(i.toLong)
      case JLong(l) => Some(l)
      case _ => None
    }

    SubsetConfig(
      initialTargets = targets,
      passthroughTables = strings("passthrough_tables"),
      excludedTables = strings("excluded_tables"),
      dependencyBreaks = breaks,
      fkAugmentation = fks,
      upstreamFilters = filters,
      maxRowsPerTable = maxRows,
      keepDisconnectedTables = (root \ "keep_disconnected_tables") match {
        case JBool(v) => v
        case _ => false
      },
      preConstraintSql = strings("pre_constraint_sql"),
      postSubsetSql = strings("post_subset_sql"))
  }
}
