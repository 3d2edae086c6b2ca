package graft

import graft.config._
import graft.graph.Fk
import org.scalatest.funsuite.AnyFunSuite

class SubsetConfigSpec extends AnyFunSuite {

  test("parses the fixture config shape") {
    val json =
      """{
        |  "initial_targets": [
        |    { "table": "orders", "percent": 10 },
        |    { "table": "customer", "where": "c_acctbal > 0" }
        |  ],
        |  "passthrough_tables": ["region"],
        |  "excluded_tables": [],
        |  "dependency_breaks": [
        |    { "fk_table": "a", "target_table": "b",
        |      "perserve_fk_opportunistically": true }
        |  ],
        |  "fk_augmentation": [
        |    { "fk_table": "lineitem", "fk_columns": ["l_orderkey"],
        |      "target_table": "orders", "target_columns": ["o_orderkey"] },
        |    { "fk_schema": "public", "fk_table": "nation",
        |      "fk_columns": ["n_regionkey"], "target_schema": "public",
        |      "target_table": "region", "target_columns": ["r_regionkey"] }
        |  ],
        |  "upstream_filters": [
        |    { "column": "l_quantity", "condition": "l_quantity > 0" },
        |    { "table": "lineitem", "condition": "l_tax >= 0" }
        |  ],
        |  "max_rows_per_table": 100000,
        |  "keep_disconnected_tables": true,
        |  "post_subset_sql": ["SELECT 1"]
        |}""".stripMargin
    val c = SubsetConfig.fromJson(json)
    assert(c.initialTargets == Seq(
      InitialTarget("orders", None, Some(10.0)),
      InitialTarget("customer", Some("c_acctbal > 0"), None)))
    assert(c.passthroughTables == Seq("region"))
    assert(c.dependencyBreaks ==
      Seq(BreakSpec("a", "b", preserveFkOpportunistically = true)))
    assert(c.opportunisticBreaks.nonEmpty)
    assert(c.fkAugmentation == Seq(
      Fk("lineitem", Seq("l_orderkey"), "orders", Seq("o_orderkey")),
      Fk("public.nation", Seq("n_regionkey"), "public.region", Seq("r_regionkey"))))
    assert(c.upstreamFilters.length == 2)
    assert(c.maxRowsPerTable.contains(100000L))
    assert(c.keepDisconnectedTables)
    assert(c.postSubsetSql == Seq("SELECT 1"))
  }

  test("rejects v1 desired_result key") {
    val e = intercept[IllegalArgumentException] {
      SubsetConfig.fromJson("""{"desired_result": {}, "initial_targets": []}""")
    }
    assert(e.getMessage.contains("old config spec"))
  }

  test("missing sections default to empty") {
    val c = SubsetConfig.fromJson("""{"initial_targets": [{"table":"t","percent":5}]}""")
    assert(c.passthroughTables.isEmpty && c.fkAugmentation.isEmpty &&
      c.maxRowsPerTable.isEmpty && !c.keepDisconnectedTables)
  }
}
