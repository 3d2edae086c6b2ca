package graft

import org.apache.spark.sql.functions._
import graft.analytics.Multimodal

/** Unit coverage for the image-codec tier (the oracle keys verify it
  * end-to-end at sf scale; these pin the per-row codec semantics on a tiny
  * frame so a codec-handle refactor can't silently change pixels).
  */
class MultimodalSpec extends SparkSpecBase {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private lazy val tiny = docs.orderBy("doc_id").limit(40)

  test("lossless round trip returns generator-predicted dims and pixel") {
    // png/gif/bmp must all survive encode->decode bit-exactly; the decoded
    // width/height/red0 are fully predicted by the generator formula
    for (fmt <- Seq("png", "gif", "bmp")) {
      val out = Multimodal.losslessRoundTripMeta(tiny, fmt)
      val bad = out.join(
          tiny.select(col("doc_id").as("asset_id"), col("n_chars")),
          "asset_id")
        .filter(col("width") =!= (col("n_chars") % 31 + 1).cast("int") ||
          col("height") =!= (col("asset_id") % 17 + 1).cast("int") ||
          col("red0") =!= (col("asset_id") % 256).cast("int"))
        .count()
      assert(bad === 0L, s"format $fmt")
      assert(out.count() === 40L, s"format $fmt")
    }
  }

  test("real resize: dims cap at maxSide and gray sum matches a direct recompute") {
    val out = Multimodal.resizeRealMeta(tiny).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    val src = tiny.select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == src.keySet)
    for ((id, nChars) <- src) {
      val w = (nChars % 31).toInt + 1; val h = (id % 17).toInt + 1
      val g0 = ((id % 8) * 4).toInt
      val sx = (id % 3).toInt; val sy = ((id / 3) % 3).toInt
      val m = math.max(w, h)
      val ow = if (m <= 8) w else math.max(1, w * 8 / m)
      val oh = if (m <= 8) h else math.max(1, h * 8 / m)
      // independent recompute of the NN raster sum from the generator
      var sum = 0L
      for (j <- 0 until oh; i <- 0 until ow)
        sum += g0 + sx * (i * w / ow) + sy * (j * h / oh)
      assert(out(id) == ((ow, oh, sum)), s"doc $id ($w x $h)")
      assert(ow <= 8 && oh <= 8 || m <= 8)
    }
    // at least one fixture image is small enough to pass through unscaled
    assert(src.exists { case (id, n) =>
      math.max((n % 31).toInt + 1, (id % 17).toInt + 1) <= 8 })
  }

  test("png header expression parse reads signature and IHDR without decoding") {
    val out = Multimodal.pngHeaderMeta(tiny)
    val bad = out.join(
        tiny.select(col("doc_id").as("asset_id"), col("n_chars")), "asset_id")
      .filter(col("sig_ok") =!= 1 ||
        col("width_hdr") =!= (col("n_chars") % 31 + 1) ||
        col("height_hdr") =!= (col("asset_id") % 17 + 1) ||
        col("bit_depth") =!= 8 || col("color_type") =!= 2)
      .count()
    assert(bad === 0L)
    assert(out.count() === 40L)
  }

  test("audio decimation matches a direct generator recompute") {
    val out = Multimodal.wavDecimateMeta(tiny).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    for (id <- out.keys) {
      val n = (id % 50).toInt + 20
      val v = (0 until n).map(i => (((id * 31 + i * 17) % 65536) - 32768).toInt)
      val w = (0 until n / 2).map(k => (v(2 * k) + v(2 * k + 1)) / 2)
      assert(out(id) ==
        (((n / 2).toLong, w.map(_.toLong).sum, w.map(x => x.toLong * x).sum)),
        s"doc $id")
    }
  }

  test("jpeg round trip parses exact dims; solid gray within tolerance") {
    val out = Multimodal.jpegRoundTripMeta(tiny)
    assert(out.count() === 40L)
    assert(out.filter(col("gray_err_le3") =!= 1).count() === 0L)
  }

  test("perceptual hash is brightness-invariant and gradient-sensitive") {
    val hs = Multimodal.imagePerceptualHashes(docs.limit(200))
    // every signature is 64 bits of 0/1
    assert(hs.filter(length(col("phash")) =!= 64 ||
      translate(col("phash"), "01", "") =!= "").count() === 0L)
    // dedup groups are consistent: rep carries the min doc_id of its phash
    val dd = Multimodal.imagePhashDedup(docs.limit(200))
    val badRep = dd.groupBy("phash")
      .agg(min("doc_id").as("lo"), min("rep_id").as("rep"),
        countDistinct("rep_id").as("nrep"))
      .filter(col("nrep") =!= 1 || col("lo") =!= col("rep")).count()
    assert(badRep === 0L)
    // is_dup marks exactly the non-representatives
    assert(dd.filter((col("doc_id") === col("rep_id")) === (col("is_dup") === 1))
      .count() === 0L)
  }

  test("sobelEnergyMeta: ramp response is exactly 8*sx/8*sy on the interior") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType)))
    // id=4: sx=1, sy=1, h=5; n_chars=12 -> w=13 -> interior 11x3=33
    // id=9: sx=0, sy=0 (flat image) -> all-zero response
    val d = spark.createDataFrame(Seq(Row(4L, 12L), Row(9L, 12L)).asJava,
      schema)
    val got = Multimodal.sobelEnergyMeta(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got(4L) == ((33L, 33L * 8, 33L * 8, 33L * 64 * 2, 33L)))
    // id=9 is flat (sx=sy=0): h=10 -> interior 11x8=88, zero response
    assert(got(9L) == ((88L, 0L, 0L, 0L, 0L)))
  }

  test("gifFramesMeta: animated GIF round-trips frame count and per-frame gray") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType)))
    // id=5: k=3 frames, grays 5, 42, 79; id=252: grays wrap mod 256
    val d = spark.createDataFrame(Seq(Row(5L, 7L), Row(252L, 3L)).asJava,
      schema)
    val got = Multimodal.gifFramesMeta(d).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getInt(5)))).toMap
    assert(got(5L) == ((3, 8, 6, 5L + 42L + 79L, 79)))
    // id=252: k = 252%4+2 = 2 frames, grays 252, (252+37)%256 = 33
    assert(got(252L) == ((2, 4, 1, 285L, 33)))
  }

  test("wavHaarBands: bands match a driver-side replica of the generator") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(StructField("doc_id", LongType)))
    val ids = Seq(0L, 1L, 7L, 13L)
    val d = spark.createDataFrame(ids.map(Row(_)).asJava, schema)
    val got = Multimodal.wavHaarBands(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    ids.foreach { id =>
      val n = (id % 50).toInt + 20
      val v = (0 until n).map(i => (((id * 31 + i * 17) % 65536) - 32768).toInt)
      val m1 = n / 2
      val a1 = (0 until m1).map(k => (v(2 * k) + v(2 * k + 1)) / 2)
      val d1 = (0 until m1).map(k => (v(2 * k) - v(2 * k + 1)) / 2)
      val m2 = m1 / 2
      val a2 = (0 until m2).map(k => (a1(2 * k) + a1(2 * k + 1)) / 2)
      val d2 = (0 until m2).map(k => (a1(2 * k) - a1(2 * k + 1)) / 2)
      def e(xs: Seq[Int]): Long = xs.map(x => x.toLong * x).sum
      assert(got(id) == ((m1.toLong, e(d1), m2.toLong, e(d2), e(a2))),
        s"id=$id")
    }
  }

  test("RIFF chunk walk: parsed container sizes match the WAVE spec formulas") {
    import spark.implicits._
    val docs = Seq(1L, 7L, 120L).toDF("doc_id")
    val got = Multimodal.wavRiffChunks(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4)))).toMap
    for (id <- Seq(1L, 7L, 120L)) {
      val n = (id % 50) + 20
      assert(got(id) == ((36L + 2 * n, 2, 16L, 2 * n)), s"id=$id")
    }
  }

  test("zero-crossing rate: decoded-PCM count replays the generator formula") {
    import spark.implicits._
    // 1041*31 = 32271: the sample ramp crosses the sign boundary mid-run
    val docs = Seq((0L, "x"), (7L, "y"), (1041L, "z")).toDF("doc_id", "text")
    val got = analytics.Multimodal.audioZeroCrossingRate(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    def expect(id: Long): (Long, Long, Long) = {
      val n = (id % 50).toInt + 20
      val v = (0 until n).map(i => ((id * 31 + i * 17) % 65536 - 32768).toInt)
      val cross = (1 until n).count(j => (v(j - 1) < 0) != (v(j) < 0)).toLong
      (n.toLong, cross, cross * 1000000L / (n - 1))
    }
    assert(got == Map(0L -> expect(0L), 7L -> expect(7L), 1041L -> expect(1041L)))
    // small-id ramps stay negative (0 crossings); 1041's straddles the
    // sign boundary once
    assert(got(0L)._2 == 0L && got(1041L)._2 > 0L)
  }
}
