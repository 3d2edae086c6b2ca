package graft

import org.apache.spark.sql.functions._
import graft.analytics.{Curation, Dedup, Similarity}

/** Invariants of the round-11 evaluation/diff operators (their values are
  * oracle-checked end-to-end; these pin the structural contracts).
  */
class EvalOpsSpec extends SparkSpecBase {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("lshRecallEval: found is a subset of truth, recall bounded") {
    val r = Dedup.lshRecallEval(docs).collect()
    assert(r.length === 1)
    val row = r.head
    val (cand, truth, found, ppm) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3))
    assert(found <= truth, "verified LSH pairs must be a subset of truth")
    assert(found <= cand, "verify can only keep candidates")
    assert(ppm >= 0L && ppm <= 1000000L)
    assert(truth > 0L, "fixture corpus must contain near-dup pairs")
  }

  test("annRecallCurveIvf: recall is monotone in nprobe") {
    val byProbe = Similarity.annRecallCurveIvf(emb, queryMod = 50)
      .groupBy("nprobe").agg(sum("n_hits").as("hits"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byProbe.keySet === Set(1L, 2L, 4L))
    // probing more cells can only add candidates, never remove them
    assert(byProbe(1L) <= byProbe(2L))
    assert(byProbe(2L) <= byProbe(4L))
  }

  test("jaccardThresholdCurve: counts monotone nonincreasing in tau") {
    val pts = Dedup.jaccardThresholdCurve(docs)
      .collect()
      .map(r => (r.getLong(0).toDouble / r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(pts.map(_._1).toSeq === Seq(0.2, 0.5, 0.8))
    // raising the threshold can only disqualify pairs
    assert(pts.sliding(2).forall { case Array(lo, hi) => lo._2 >= hi._2 })
    // the loosest point must agree with the reference key's pair count
    assert(pts.head._2 === Dedup.ngramJaccardPairs(docs, dfCap = 20).count())
  }

  test("snapshotDiff: identical snapshots diff empty; disjoint all-flagged") {
    assert(Curation.snapshotDiff(docs, docs).count() === 0L)
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    val d = Curation.snapshotDiff(a, b)
    assert(d.filter(col("change") === "added").count() === b.count())
    assert(d.filter(col("change") === "removed").count() === a.count())
    assert(d.filter(col("change") === "changed").count() === 0L)
    // in-place edit shows as changed, not added+removed
    val edited = docs.withColumn("text",
      when(col("doc_id") === 0, lit("EDITED")).otherwise(col("text")))
    val d2 = Curation.snapshotDiff(docs, edited)
    assert(d2.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((0L, "changed")))
  }

  test("pqReconstructionError: m rows covering the corpus, zero error at ksub = n") {
    val r = Similarity.pqReconstructionError(emb, trainMod = 2).collect()
    assert(r.length === 4)
    val n = emb.count()
    r.foreach { row =>
      assert(row.getAs[Long]("n_vectors") === n)
      assert(row.getAs[Double]("sse") >= 0.0)
      assert(row.getAs[Double]("mse") === row.getAs[Double]("sse") / n)
    }
    // degenerate exactness: every vector its own centroid → SSE 0 per sub
    val tiny = emb.filter(col("vec_id") < 16)
    val z = Similarity.pqReconstructionError(tiny, m = 2, subDim = 32,
      ksub = 16, iters = 1, trainMod = 1).collect()
    assert(z.forall(_.getAs[Double]("sse") == 0.0))
  }
}
