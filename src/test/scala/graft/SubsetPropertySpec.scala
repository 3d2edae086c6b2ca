package graft

import graft.config._
import graft.engine.{Ops, Subsetter}
import graft.graph.Fk
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Property-style tests (SURVEY.md §5 item 3): on randomly generated FK DAGs
  * with random synthetic data (deterministic seeds), the subsetter must
  * always produce a referentially closed subset of the source.
  */
class SubsetPropertySpec extends SparkSpecBase {

  /** Random layered DAG of `nTables` tables; each table i>0 gets FKs to 1-2
    * random earlier tables. Rows have ids 0..rows-1; FK values are sampled
    * from the target id range with ~10% NULLs.
    */
  private def genCatalog(nTables: Int, rows: Int, seed: Long)
      : (Map[String, DataFrame], Seq[Fk]) = {
    val rnd = new scala.util.Random(seed)
    val fks = (1 until nTables).flatMap { i =>
      val nRefs = 1 + rnd.nextInt(math.min(i, 2))
      (0 until nRefs).map { _ =>
        val target = rnd.nextInt(i)
        Fk(s"t$i", Seq(s"fk_t$target"), s"t$target", Seq("id"))
      }.distinct
    }
    val catalog = (0 until nTables).map { i =>
      val n = s"t$i"
      val myFkCols = fks.filter(_.fkTable == n).map(_.fkCols.head).distinct
      val rowsSeq = (0 until rows).map { id =>
        Row.fromSeq(id.toLong +: myFkCols.map { _ =>
          if (rnd.nextInt(10) == 0) null else Long.box(rnd.nextInt(rows).toLong)
        })
      }
      val schema = StructType(
        StructField("id", LongType, nullable = false) +:
          myFkCols.map(f => StructField(f, LongType, nullable = true)))
      n -> spark.createDataFrame(spark.sparkContext.parallelize(rowsSeq, 2), schema)
    }.toMap
    (catalog, fks)
  }

  private def orphans(dest: Map[String, DataFrame], fks: Seq[Fk]): Long =
    fks.map { fk =>
      Ops.antiJoin(
        dest(fk.fkTable).na.drop("any", fk.fkCols),
        fk.fkCols, dest(fk.targetTable), fk.targetCols).count()
    }.sum

  test("random DAGs: closure + subset properties always hold") {
    for (seed <- 1L to 8L) {
      val nTables = 2 + (seed % 4).toInt
      val (catalog, fks) = genCatalog(nTables, rows = 40, seed)
      val cfg = SubsetConfig(
        initialTargets = Seq(InitialTarget("t0", where = Some("id % 3 = 0"))),
        fkAugmentation = fks)
      val dest = new Subsetter(cfg, catalog).run()
      assert(orphans(dest, fks) == 0, s"seed=$seed not closed")
      catalog.keys.foreach { t =>
        assert(Ops.antiJoin(dest(t), Seq("id"), catalog(t), Seq("id")).count() == 0,
          s"seed=$seed table $t not a subset")
      }
    }
  }

  test("composite-key FKs: closure holds end to end") {
    import spark.implicits._
    val parent = Seq((1L, "a", 10.0), (1L, "b", 11.0), (2L, "a", 12.0), (3L, "c", 13.0))
      .toDF("pk1", "pk2", "pv")
    val child = Seq(
      (100L, 1L, "a"), (101L, 1L, "b"), (102L, 2L, "a"),
      (103L, 3L, "c"), (104L, 9L, "z"))
      .toDF("id", "fk1", "fk2")
    val fks = Seq(Fk("child", Seq("fk1", "fk2"), "parent", Seq("pk1", "pk2")))
    val cfg = SubsetConfig(
      initialTargets = Seq(InitialTarget("child", where = Some("id <= 102"))),
      fkAugmentation = fks)
    val dest = new Subsetter(cfg, Map("parent" -> parent, "child" -> child)).run()
    assert(dest("child").count() == 3)
    // downstream pulls exactly the referenced composite parents
    val parents = dest("parent").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(parents == Set((1L, "a"), (1L, "b"), (2L, "a")))
    assert(orphans(dest, fks) == 0)
  }

  test("entry() smoke: flagship query returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("multi-target overlap: direct ∪ downstream has no duplicates") {
    import graft.queries.SubsetQueries
    val source = graft.engine.Catalog.load(spark, sfDir, SubsetQueries.starTables)
    val dest = new Subsetter(SubsetQueries.multiTargetConfig, source).run()
    val cust = dest("customer")
    assert(cust.count() == cust.dropDuplicates("c_custkey").count())
    // contains both the direct sample and the orders-referenced customers
    assert(cust.filter("c_custkey % 7 = 0").count() ==
      source("customer").filter("c_custkey % 7 = 0").count())
  }
}
