package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the pin → consumer-key map that drives selective pin prebuild
  * (ExtensionQueries.pinConsumers): every listed consumer must be a real
  * query key, so a key rename can't silently turn a pin build into dead
  * setup cost — or worse, skip a pin a renamed key still needs.
  */
class PinConsumersSpec extends AnyFunSuite {
  test("every pin consumer key exists in SparkEntry.queries") {
    val known = SparkEntry.queries.keySet
    val missing = graft.queries.ExtensionQueries.pinConsumers.flatMap {
      case (pin, ks) => (ks -- known).map(k => s"$pin -> $k")
    }
    assert(missing.isEmpty, s"unknown consumer keys: ${missing.mkString(", ")}")
  }

  test("selective prebuild skips pins with no requested consumer") {
    val pc = graft.queries.ExtensionQueries.pinConsumers
    // a key set touching only lshPairs must not select the entity pins
    val wanted = pc.filter { case (_, ks) =>
      (ks & Set("neardup_components")).nonEmpty }.keySet
    assert(wanted == Set("lshPairs"))
    // entity keys pull both entity pins (clusters builds from matches)
    val entity = pc.filter { case (_, ks) =>
      (ks & Set("entity_match_clusters")).nonEmpty }.keySet
    assert(entity == Set("entityMatches", "entityClusters"))
  }
}
