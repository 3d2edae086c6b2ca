package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gate for dev-harness key-name drift (VERDICT r17 #6): every key name a
  * sweep/audit tool carries as a default must exist in
  * [[SparkEntry.queries]], so a key rename fails here in CI instead of
  * erroring mid-sweep (r17's `SfSweep` carried two stale names that only
  * surfaced when a scale run died on them). Pure map-membership — no Spark
  * session needed.
  */
class SfSweepKeysSpec extends AnyFunSuite {

  test("every SfSweep default key is a declared SparkEntry query") {
    val stale = graft.tools.SfSweep.defaultKeys.filterNot(SparkEntry.queries.contains)
    assert(stale.isEmpty,
      s"SfSweep.defaultKeys carries stale key names: ${stale.mkString(", ")}")
  }
}
