package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local SparkSession across all suites (object-level lazy val —
  * ScalaTest instantiates suites in one JVM under sbt fork).
  */
object SparkSpecBase {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

abstract class SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpecBase.spark
  val sfDir = "/root/testdata/sf0.001"
}
