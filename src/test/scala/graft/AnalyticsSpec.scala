package graft

import graft.analytics._
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpecBase {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("winnowing guarantee: docs sharing a run >= window+k-1 chars share a fingerprint") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // k=8, window=16 → any common substring of 23+ chars must yield a
    // common fingerprint (the MOSS winnowing theorem)
    val shared = "the quick brown fox jumps!!"  // 27 chars
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    import scala.jdk.CollectionConverters._
    val two = spark.createDataFrame(Seq(
      Row(1L, s"aaaa $shared bbbb"),
      Row(2L, s"cccccc $shared dddd zz")).asJava, schema)
    val fps = Dedup.winnowFingerprints(two)
    val common = fps.filter(col("doc_id") === 1).select("fp")
      .intersect(fps.filter(col("doc_id") === 2).select("fp"))
    assert(common.count() > 0)
    // and two disjoint-alphabet docs share nothing
    val disjoint = spark.createDataFrame(Seq(
      Row(1L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),
      Row(2L, "bbbbbbbbbbbbbbbbbbbbbbbbbbbbbb")).asJava, schema)
    val dfps = Dedup.winnowFingerprints(disjoint)
    assert(dfps.filter(col("doc_id") === 1).select("fp")
      .intersect(dfps.filter(col("doc_id") === 2).select("fp")).count() == 0)
  }

  test("exact dedup groups cover all docs") {
    val g = Dedup.exactGroups(docs)
    assert(g.agg(sum("n_dups")).head.getLong(0) == docs.count())
  }

  test("identical texts share every LSH band; self-similarity is 1") {
    // duplicate doc 0 under a new id → must appear as a candidate pair
    val dup = docs.limit(1).withColumn("doc_id", lit(999999L))
    val pairs = Dedup.lshCandidatePairs(docs.limit(50).union(dup))
    val hit = pairs.filter(col("id_a") === 0 && col("id_b") === 999999)
    assert(hit.head.getLong(2) == 2) // shares both bands
  }

  test("simhash of identical texts is identical, different texts differ") {
    val sigs = Dedup.simhashSignatures(docs.limit(20))
    assert(sigs.count() == 20)
    val dup = docs.limit(1).withColumn("doc_id", lit(999999L))
    val sigs2 = Dedup.simhashSignatures(docs.limit(1).union(dup))
    val two = sigs2.collect().map(_.getString(1)).toSet
    assert(two.size == 1) // identical text → identical signature
    assert(sigs2.head.getString(1).length == 64)
  }

  test("cosine of a vector with itself rounds to 1") {
    val self = emb.limit(5)
      .select(VectorFunctions.cosineRounded(col("embedding"), col("embedding")).as("c"))
    assert(self.collect().forall(_.getDouble(0) == 1.0))
  }

  test("brute-force top-k is ordered and excludes the query") {
    val top = Similarity.bruteForceTopK(emb, 0L, 5).collect()
    assert(top.length == 5)
    assert(!top.map(_.getLong(0)).contains(0L))
    val sims = top.map(_.getDouble(1))
    assert(sims.sameElements(sims.sorted.reverse))
  }

  test("LSH bucket results are a subset of brute-force ranking semantics") {
    val bucketTop = Similarity.lshBucketTopK(emb, 0L, 5).collect()
    assert(bucketTop.forall(_.getLong(0) != 0L))
  }

  test("multimodal stub decoder emits metadata per asset") {
    val assets = Multimodal.assetsFromText(docs.limit(10), "doc_id", "text")
    val meta = Multimodal.fakeDecodeMeta(assets).collect()
    assert(meta.length == 10)
    assert(meta.forall(_.getLong(2) > 0)) // n_bytes
    assert(meta.forall(r => r.getInt(3) >= 1 && r.getInt(3) <= 256))
    val frames = Multimodal.sampleFrameOffsets(assets, 4)
    assert(frames.count() == 40)
  }

  test("events sessions are non-overlapping per user") {
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val s = EventsAnalytics.sessions(events)
    val total = s.agg(sum("n_events")).head.getLong(0)
    assert(total == events.count())
  }
}
