package graft

import graft.analytics.Dedup
import graft.engine.{Materialize, Subsetter}
import graft.queries.SubsetQueries
import java.nio.file.Files
import org.apache.spark.sql.DataFrame

/** The pluggable materialization hook: on a real cluster `localCheckpoint()`
  * blocks die with their executor, so every lineage-cutting call site must
  * accept a reliable strategy. These specs run the same operators through
  * [[Materialize.parquet]] (write/read a snapshot — the durable path) and
  * assert bit-identical results vs the localCheckpoint default.
  */
class MaterializeSpec extends SparkSpecBase {

  private def rows(df: DataFrame): Set[Seq[Any]] = {
    val cols = df.columns.sorted
    df.select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
  }

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("ngram jaccard pairs: parquet materializer matches localCheckpoint") {
    val dir = Files.createTempDirectory("graft_mat").toString
    val viaParquet = Dedup.ngramJaccardPairs(docs, materialize = Materialize.parquet(dir))
    val viaLocal = Dedup.ngramJaccardPairs(docs)
    assert(rows(viaParquet) == rows(viaLocal))
  }

  test("simhash near-dup pairs: parquet materializer matches localCheckpoint") {
    val dir = Files.createTempDirectory("graft_mat2").toString
    val sub = docs.filter(org.apache.spark.sql.functions.col("doc_id") < 120)
    assert(rows(Dedup.simhashNearDupPairs(sub, 3, Materialize.parquet(dir))) ==
      rows(Dedup.simhashNearDupPairs(sub, 3)))
  }

  test("IVF-PQ index build: parquet materializer matches localCheckpoint") {
    val dir = Files.createTempDirectory("graft_mat4").toString
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    assert(rows(graft.analytics.Similarity.ivfPqTopK(emb, 0L, 10, trainMod = 4,
        materialize = Materialize.parquet(dir))) ==
      rows(graft.analytics.Similarity.ivfPqTopK(emb, 0L, 10, trainMod = 4)))
  }

  test("fixture subset through the parquet materializer is identical") {
    val dir = Files.createTempDirectory("graft_mat3").toString
    val source = graft.engine.Catalog.load(spark, sfDir, SubsetQueries.starTables)
    // threshold 0 forces EVERY phase mutation through the hook, so the
    // reliable path is exercised on each table, not just big ones
    val reliable = new Subsetter(SubsetQueries.fixtureConfig, source,
      materialize = Materialize.parquet(dir), materializeThreshold = 0L).run()
    val default = new Subsetter(SubsetQueries.fixtureConfig, source).run()
    for (t <- SubsetQueries.starTables)
      assert(rows(reliable(t)) == rows(default(t)), s"table $t differs")
  }
}
