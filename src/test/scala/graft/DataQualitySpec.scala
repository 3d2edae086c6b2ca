package graft

import graft.analytics.DataQuality
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

class DataQualitySpec extends SparkSpecBase {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  test("value drift bins: shares and deltas match a hand-built split") {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("value", DoubleType)))
    // even ids: 3 rows at 1.0 + 1 at 2.0; odd ids: 4 rows all at 2.0
    val e = spark.createDataFrame(Seq(
      Row(0L, 1.0), Row(2L, 1.0), Row(4L, 1.0), Row(6L, 2.0),
      Row(1L, 2.0), Row(3L, 2.0), Row(5L, 2.0), Row(7L, 2.0)).asJava, schema)
    val got = graft.analytics.DataQuality.valueDriftBins(e).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got == Map(
      10L -> ((3L, 0L, 7500L, 0L, 7500L)),
      20L -> ((1L, 4L, 2500L, 10000L, 7500L))))
  }

  test("weighted median follows the token mass, not the document count") {
    // source A: two tiny docs plus one 10-token doc at length 100 — the
    // token-weighted median lands on 100 even though the doc-median is 2
    val d = spark.createDataFrame(Seq(
      Row(1L, "w", "en", "A", 1L),
      Row(2L, "w w", "en", "A", 2L),
      Row(3L, "w w w w w w w w w w", "en", "A", 100L),
      // source B: symmetric weights, exact half reached at the lower of
      // the two middle values
      Row(4L, "w w", "en", "B", 10L),
      Row(5L, "w w", "en", "B", 20L)).asJava, docSchema)
    val got = DataQuality.weightedMedianLength(d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("A") == ((100L, 13L, 3L)))
    assert(got("B") == ((10L, 4L, 2L)))
  }

  test("quality assertions count injected violations exactly") {
    // fixture is clean: every rule must report zero
    val clean = DataQuality.qualityAssertions(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(clean.values.forall(_ == 0L), s"fixture not clean: $clean")
    // inject violations (the null-id row also has null text/lang, so it
    // lands in text_nonempty and lang_present but NOT in the null-guarded
    // n_chars comparison, and null ids never count as duplicates)
    val dirty = spark.createDataFrame(Seq(
      Row(1L, "ok text", "en", "web", 7L),
      Row(1L, "dup id", "en", "web", 6L),     // duplicate doc_id
      Row(null, null, null, "web", 9L),       // null id/text/lang
      Row(3L, "", "en", "web", 0L),           // empty text
      Row(4L, "five ch", "", "web", 99L)      // empty lang, wrong n_chars
    ).asJava, docSchema)
    val got = DataQuality.qualityAssertions(dirty).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "doc_id_unique" -> 1L, "doc_id_not_null" -> 1L,
      "text_nonempty" -> 2L, "n_chars_matches_text" -> 1L,
      "lang_present" -> 2L))
  }

  test("table profile: rows, nulls and distincts on a known table") {
    val tiny = spark.createDataFrame(Seq(
      Row(1L, "a", "en", "web", 1L),
      Row(2L, "a", null, "web", 1L),
      Row(3L, "b", "en", "book", 1L)).asJava, docSchema)
    val got = DataQuality.tableProfile(tiny, Seq("text", "lang")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map("text" -> ((3L, 0L, 2L)), "lang" -> ((3L, 1L, 1L))))
  }

  test("approx profile eval: exact columns match tableProfile and the HLL band holds") {
    val tiny = spark.createDataFrame(Seq(
      Row(1L, "a", "en", "web", 1L),
      Row(2L, "a", null, "web", 1L),
      Row(3L, "b", "en", "book", 1L)).asJava, docSchema)
    val got = DataQuality.profileApproxEval(tiny, Seq("text", "lang"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    // exact columns identical to tableProfile; at these cardinalities the
    // HLL++ sparse path is exact, so the 10% band flag must be 1
    assert(got == Map(
      "text" -> ((3L, 0L, 2L, 1)), "lang" -> ((3L, 1L, 1L, 1))))
  }

  test("vocab drift flags a token dumped into one slice only") {
    val rows = (0L until 20L).map { i =>
      val extra = if (i % 2 == 0) " zonly" else "" // token only in even ids
      Row(i, "base tok" + extra, "en", "web", 0L)
    }
    val df = spark.createDataFrame(rows.asJava, docSchema)
    val got = DataQuality.vocabDrift(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getInt(3), r.getInt(4)))).toMap
    assert(got("zonly") == ((10L, 0L, 1, 0)))
    // equal-count tokens read as drifted DOWN: the even slice's total is
    // diluted by the dumped token, so their even-slice SHARE shrank —
    // shares, not raw counts, are what drift monitoring compares
    assert(got("base") == ((10L, 10L, 0, 1)))
    assert(got("tok") == ((10L, 10L, 0, 1)))
  }

  test("robust stats: a corrupt row moves neither median nor MAD, and is the outlier") {
    val schema = StructType(Seq(
      StructField("source", StringType), StructField("n_chars", LongType)))
    val tiny = spark.createDataFrame((
      Seq.fill(4)(Row("s1", 10L)) :+ Row("s1", 1000L)
        :+ Row("s2", 5L) :+ Row("s2", 7L) :+ Row("s2", 9L)).asJava, schema)
    val got = DataQuality.robustLengthStats(tiny).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    // s1: median 10 and MAD 0 ignore the 1000 — which is the one outlier
    assert(got("s1") == ((5L, 10.0, 0.0, 1L)))
    // s2: median 7, deviations (2,0,2) → MAD 2, no deviation beyond 5*2
    assert(got("s2") == ((3L, 7.0, 2.0, 0L)))
  }

  test("fkIntegrityReport: injected orphans are counted, nulls excluded, clean edges zero") {
    import spark.implicits._
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(3L), None).toDF("fk") // 3 is orphan, null skipped
    val tabs = Map("p" -> parent, "c" -> child)
    val rep = DataQuality.fkIntegrityReport(tabs, Seq(("c", "fk", "p", "pk")))
      .collect().head
    assert(rep.getAs[Long]("n_child_rows") == 3L)
    assert(rep.getAs[Long]("n_orphans") == 1L)
    // fixture graph is referentially closed: every edge reports zero orphans
    val fix = DataQuality.fkIntegrityReport(
      n => spark.read.parquet(s"$sfDir/$n.parquet"),
      Seq(("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_orderkey", "orders", "o_orderkey")))
    assert(fix.filter(col("n_orphans") =!= 0L).count() == 0)
  }

  private def doc(id: Long, text: String, lang: String = "en",
      source: String = "s1"): Row =
    Row(id, text, lang, source, text.length.toLong)

  test("kendall grid: monotone agreement is +1e6, inversion is -1e6") {
    // four docs on distinct x AND y bands, same rank order in both
    // signals: bx = n_chars div 128, by = tokens div 32 — build texts
    // whose char and token counts climb together (no ties anywhere, so
    // n1 = n2 = 0 and tau2 = (C-D)^2/n0^2 = 1)
    def text(tokens: Int): String = Seq.fill(tokens)("abc").mkString(" ")
    val up = spark.createDataFrame(Seq(
      doc(1, text(10)), doc(2, text(40)), doc(3, text(70)),
      doc(4, text(100))).asJava, docSchema)
    val got = DataQuality.kendallGridCorr(up).collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("tau2_signed_ppm") == 1000000L)
    // flip one signal: keep token counts climbing but n_chars falling is
    // impossible (chars grow with tokens here), so instead check a split
    // source is scored independently
    val two = spark.createDataFrame(Seq(
      doc(1, text(10), source = "a"), doc(2, text(40), source = "a"),
      doc(3, text(10), source = "b"), doc(4, text(40), source = "b"))
      .asJava, docSchema)
    val bySrc = DataQuality.kendallGridCorr(two).collect()
    assert(bySrc.length == 2 &&
      bySrc.forall(_.getAs[Long]("tau2_signed_ppm") == 1000000L))
  }

  test("kendall grid: independent signals inside one band are all ties") {
    // every doc lands in the same (bx, by) cell -> n0 = n1 = n2, den = 0
    val same = spark.createDataFrame(Seq(
      doc(1, "a b"), doc(2, "c d"), doc(3, "e f")).asJava, docSchema)
    val got = DataQuality.kendallGridCorr(same).collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("tau2_signed_ppm") == 0L)
    assert(got.head.getAs[Long]("n_c") == 0L)
  }

  test("calibration bins: hand-built confidence vs positive rate") {
    // doc A: 2 stopwords of 4 tokens -> 5000 bp -> bin 5, lang en (pos)
    // doc B: 2 of 4 -> bin 5, lang de (neg)
    // doc C: 0 of 2 -> 0 bp -> bin 0, lang en (pos)
    val d = spark.createDataFrame(Seq(
      doc(1, "the a cat dog"), doc(2, "the a x y", lang = "de"),
      doc(3, "cat dog")).asJava, docSchema)
    val got = DataQuality.calibrationBins(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got == Map(
      5L -> ((2L, 5000L, 5000L, 0L)),
      0L -> ((1L, 0L, 10000L, 10000L))))
  }

  test("mix-shift TV: hand mixes give exactly 2500 bp; matching mix gives 0") {
    import spark.implicits._
    // A = (.5, .5), B = (1, 0), global = (.75, .25) → TV = .25 for both
    val df = Seq(("A", "c1"), ("A", "c1"), ("A", "c2"), ("A", "c2"),
      ("B", "c1"), ("B", "c1"), ("B", "c1"), ("B", "c1"))
      .toDF("grp0", "cat0")
    val got = DataQuality.mixShiftTV(df, "grp0", "cat0").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("A" -> ((4L, 2500L)), "B" -> ((4L, 2500L))))
    // a group whose mix equals the global mix scores 0
    val same = Seq(("A", "c1"), ("A", "c2"), ("B", "c1"), ("B", "c2"))
      .toDF("grp0", "cat0")
    val z = DataQuality.mixShiftTV(same, "grp0", "cat0").collect()
      .map(_.getLong(2)).toSeq
    assert(z == Seq(0L, 0L))
  }

  test("KS two-sample: hand CDFs give D = 1/2; identical samples give 0") {
    import spark.implicits._
    val df = Seq(("A", 1L), ("A", 2L), ("A", 3L), ("A", 4L),
      ("B", 3L), ("B", 4L), ("B", 5L), ("B", 6L))
      .toDF("cohort0", "v")
    val got = DataQuality.ksTwoSample(df, "cohort0", "A", "B", col("v"))
      .collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getInt(3)) ==
      ((4L, 4L, 500000L, 0)))
    val same = Seq(("A", 1L), ("A", 2L), ("B", 1L), ("B", 2L))
      .toDF("cohort0", "v")
    val z = DataQuality.ksTwoSample(same, "cohort0", "A", "B", col("v"))
      .collect().head
    assert(z.getLong(2) == 0L && z.getInt(3) == 0)
  }

  test("Mann-Whitney: full separation and tie-averaged ranks by hand") {
    import spark.implicits._
    // A = {1,2}, B = {3,4}: complete dominance. ranksum(A)=3 → u2_a = 0,
    // u2_b = 2·n_a·n_b = 8, rb = −1; z² = (0−2)²/(4·5/12) = 2.4
    val df = Seq(("A", 1L), ("A", 2L), ("B", 3L), ("B", 4L))
      .toDF("cohort0", "v")
    val got = DataQuality.mannWhitneyU(df, "cohort0", "A", "B", col("v"))
      .collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4), got.getLong(5), got.getLong(6), got.getInt(7)) ==
      ((2L, 2L, 0L, 8L, 0L, -1000000L, 2400L, 0)))
    // A = {1,2}, B = {2,3}: the shared 2 averages ranks 2/3 → avgrank 2.5,
    // doubled 5; ranksum2(A) = 2+5 = 7 → u2_a = 1; tie_cubic = 2³−2 = 6;
    // var12 = 4·(5·4·3−6) = 216 → Var(U) = 216/(12·4·3) = 1.5 and
    // z² = ((1−4)/2)²/1.5 = 1.5 exactly → 1500 milli
    val tied = Seq(("A", 1L), ("A", 2L), ("B", 2L), ("B", 3L))
      .toDF("cohort0", "v")
    val gt = DataQuality.mannWhitneyU(tied, "cohort0", "A", "B", col("v"))
      .collect().head
    assert((gt.getLong(2), gt.getLong(3), gt.getLong(4), gt.getLong(5),
      gt.getLong(6), gt.getInt(7)) == ((1L, 7L, 6L, -750000L, 1500L, 0)))
    // degenerate guards (ANSI): all-tied sample zeroes var12, an absent
    // cohort zeroes n1·n2 — both must read 0, not DIVIDE_BY_ZERO
    val allTied = Seq(("A", 5L), ("A", 5L), ("B", 5L))
      .toDF("cohort0", "v")
    val at = DataQuality.mannWhitneyU(allTied, "cohort0", "A", "B", col("v"))
      .collect().head
    assert((at.getLong(5), at.getLong(6), at.getInt(7)) == ((0L, 0L, 0)))
    val oneSided = Seq(("A", 1L), ("A", 2L)).toDF("cohort0", "v")
    val os = DataQuality.mannWhitneyU(oneSided, "cohort0", "A", "B", col("v"))
      .collect().head
    assert((os.getLong(1), os.getLong(5), os.getLong(6)) == ((0L, 0L, 0L)))
  }

  test("Kruskal-Wallis: 3-group hand case; tie correction; degenerate guards") {
    import spark.implicits._
    // A={1,2}, B={3,4}, C={5,6}: R_i = 3,7,11 -> H = 12/42*89.5 - 21
    // = 4.5714 -> 4571 milli; no ties; df=2, crit 5992 -> no reject
    val df = Seq(("A", 1L), ("A", 2L), ("B", 3L), ("B", 4L),
      ("C", 5L), ("C", 6L)).toDF("cohort0", "v")
    val got = DataQuality.kruskalWallisH(df, "cohort0", col("v"))
      .collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4), got.getInt(5)) == ((3L, 6L, 0L, 4571L, 2L, 0)))
    // A={1,1}, B={2,3}: raw H = 2.4, tie term 6 over cube 60 ->
    // corrected 2.4/0.9 = 2.6667 -> 2666 milli (truncated); df=1
    val tied = Seq(("A", 1L), ("A", 1L), ("B", 2L), ("B", 3L))
      .toDF("cohort0", "v")
    val gt = DataQuality.kruskalWallisH(tied, "cohort0", col("v"))
      .collect().head
    assert((gt.getLong(2), gt.getLong(3), gt.getInt(5)) == ((6L, 2666L, 0)))
    // all-tied: H = 0 and the zeroed correction divisor is guarded (ANSI)
    val at = DataQuality.kruskalWallisH(
      Seq(("A", 5L), ("A", 5L), ("B", 5L)).toDF("cohort0", "v"),
      "cohort0", col("v")).collect().head
    assert((at.getLong(3), at.getInt(5)) == ((0L, 0)))
    // single cohort: H = 0, df = 0 has no frozen critical -> NULL verdict
    val sc = DataQuality.kruskalWallisH(
      Seq(("A", 1L), ("A", 2L)).toDF("cohort0", "v"),
      "cohort0", col("v")).collect().head
    assert(sc.getLong(3) == 0L && sc.isNullAt(5))
  }

  test("Simpson diversity: skewed vs monolingual source by hand") {
    import spark.implicits._
    // s1: en*3 fr*1 -> sq=10, gini = 1e6 - 10e6//16 = 375000, eff 1600
    // s2: en*2 -> gini 0, eff 1000 (exactly one effective language)
    val docs = Seq((1L, "t", "s1", "en"), (2L, "t", "s1", "en"),
      (3L, "t", "s1", "en"), (4L, "t", "s1", "fr"),
      (5L, "t", "s2", "en"), (6L, "t", "s2", "en"))
      .toDF("doc_id", "text", "source", "lang")
    val got = DataQuality.sourceSimpsonDiversity(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      "s1" -> ((4L, 2L, 375000L, 1600L)),
      "s2" -> ((2L, 1L, 0L, 1000L))))
  }

  test("Brown-Forsythe: hand moments; zero-SSW guard; all-constant zero") {
    import spark.implicits._
    // A={0,2,10} m2=4 -> z={4,0,16}; B={5,5,5} m2=10 -> z=0:
    // sqb=133, ssb=67, ssw=139, F = 4*67000//139 = 1928 < 3842
    val df = Seq(("A", 0L), ("A", 2L), ("A", 10L),
      ("B", 5L), ("B", 5L), ("B", 5L)).toDF("cohort0", "v")
    val got = DataQuality.brownForsytheF(df, "cohort0", col("v"))
      .collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4), got.getLong(5), got.getInt(6)) ==
      ((2L, 6L, 67L, 139L, 1928L, 1L, 0)))
    // within-group spreads identical -> SSW = 0: guarded divisor reads
    // the unscaled numerator (ANSI-safe), verdict rejects
    val z0 = Seq(("A", 0L), ("A", 10L), ("B", 4L), ("B", 6L))
      .toDF("cohort0", "v")
    val g2 = DataQuality.brownForsytheF(z0, "cohort0", col("v"))
      .collect().head
    assert((g2.getLong(2), g2.getLong(3), g2.getLong(4), g2.getInt(6)) ==
      ((64L, 0L, 128000L, 1)))
    // all values identical everywhere -> both sums 0 -> F = 0
    val const = Seq(("A", 7L), ("A", 7L), ("B", 7L)).toDF("cohort0", "v")
    val g3 = DataQuality.brownForsytheF(const, "cohort0", col("v"))
      .collect().head
    assert((g3.getLong(2), g3.getLong(3), g3.getLong(4), g3.getInt(6)) ==
      ((0L, 0L, 0L, 0)))
  }

  test("Welch effect: hand moments; zero-variance and absent-cohort guards") {
    import spark.implicits._
    // A={0,10} (mean 5, s2 50), B={20,30} (mean 25, s2 50):
    // t2 = 400/(25+25) = 8 -> 8000 milli (reject), d2 = 400/50 = 8e6 ppm
    val df = Seq(("A", 0L), ("A", 10L), ("B", 20L), ("B", 30L))
      .toDF("cohort0", "v")
    val got = DataQuality.welchEffect(df, "cohort0", "A", "B", col("v"))
      .collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4), got.getInt(5)) ==
      ((2L, 2L, -20000L, 8000000L, 8000L, 1)))
    // absent cohort B: every divisor guard fires, all statistics read 0
    val solo = Seq(("A", 1L), ("A", 2L)).toDF("cohort0", "v")
    val g2 = DataQuality.welchEffect(solo, "cohort0", "A", "B", col("v"))
      .collect().head
    assert((g2.getLong(1), g2.getLong(2), g2.getLong(4), g2.getInt(5)) ==
      ((0L, 0L, 0L, 0)))
    // zero variance both sides with a real mean gap: guarded divisor 1
    // reads the unscaled numerator (documented; "infinitely significant")
    val const = Seq(("A", 5L), ("A", 5L), ("B", 7L), ("B", 7L))
      .toDF("cohort0", "v")
    val g3 = DataQuality.welchEffect(const, "cohort0", "A", "B", col("v"))
      .collect().head
    assert((g3.getLong(2), g3.getLong(4), g3.getInt(5)) ==
      ((-2000L, 4000000000L, 1)))
  }

  test("Dunn post-hoc: pairwise z2 by hand; Bonferroni boundary case") {
    import spark.implicits._
    // A={1,2}, B={3,4}, C={5,6}: sigma2 = 3.5, pair z2 = 4/3.5, 16/3.5,
    // 4/3.5 -> 1142/4571/1142 milli; k=3 crit 5732 -> all retained
    val df = Seq(("A", 1L), ("A", 2L), ("B", 3L), ("B", 4L),
      ("C", 5L), ("C", 6L)).toDF("cohort0", "v")
    val got = DataQuality.dunnPosthoc(df, "cohort0", col("v")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getInt(6)))).toMap
    assert(got == Map(
      ("A", "B") -> ((2L, 2L, -400L, 1142L, 0)),
      ("A", "C") -> ((2L, 2L, -800L, 4571L, 0)),
      ("B", "C") -> ((2L, 2L, -400L, 1142L, 0))))
    // two fully separated triples: z2 = 9/(3.5*2/3) = 3.857 -> 3857,
    // JUST over the k=2 critical 3842 -> rejected
    val two = Seq(("A", 1L), ("A", 2L), ("A", 3L),
      ("B", 10L), ("B", 11L), ("B", 12L)).toDF("cohort0", "v")
    val g2 = DataQuality.dunnPosthoc(two, "cohort0", col("v"))
      .collect().head
    assert((g2.getLong(4), g2.getLong(5), g2.getInt(6)) ==
      ((-600L, 3857L, 1)))
  }

  test("Lorenz/Gini: distinct values, tie groups, and sub-decile dropout") {
    import spark.implicits._
    // values 1..10: share_d = 1e6*d(d+1)/2 // 55; Gini = 0.3 exactly
    val ten = (1L to 10L).map(v => (v, v)).toDF("id", "x")
    val got = DataQuality.lorenzGini(ten, "x").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got.size == 10)
    assert(got(1) == ((1L, 1L, 18181L, 300000L)))
    assert(got(5) == ((5L, 15L, 272727L, 300000L)))
    assert(got(10) == ((10L, 55L, 1000000L, 300000L)))
    // {2,2,2,4}: n=4 so deciles 1-2 have boundary 0 and drop out; the
    // straddling tie group interpolates exactly; Gini = 6/40 = 150000
    val tied = Seq((1L, 2L), (2L, 2L), (3L, 2L), (4L, 4L)).toDF("id", "x")
    val g2 = DataQuality.lorenzGini(tied, "x").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(g2.size == 8 && !g2.contains(1) && !g2.contains(2))
    assert(g2(3) == ((1L, 2L, 200000L, 150000L)))
    assert(g2(5) == ((2L, 4L, 400000L, 150000L)))
    assert(g2(8) == ((3L, 6L, 600000L, 150000L)))
    assert(g2(10) == ((4L, 10L, 1000000L, 150000L)))
  }

  test("conformal interval: order-statistic radius; small cohort ships NULL") {
    import spark.implicits._
    // A: train (odd ids) 100,300 -> pred 200; cal residuals 10..100 ->
    // p = ceil(0.9*11) = 10 -> radius 100
    val a = Seq((1L, 100L), (3L, 300L)) ++
      (1 to 10).map(i => (2L * i, 200L + 10L * i))
    // B: one train row, two cal rows -> p = 3 > n_cal = 2 -> NULL
    val b = Seq((21L, 500L), (22L, 480L), (24L, 530L))
    val df = (a.map { case (id, v) => ("A", id, v) } ++
      b.map { case (id, v) => ("B", id, v) })
      .toDF("cohort0", "id0", "v")
    val got = DataQuality.conformalInterval(df, "cohort0", "id0", col("v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(got == Map(
      "A" -> ((2L, 10L, 200L, 100L)),
      "B" -> ((1L, 2L, 500L, -1L))))
  }

  test("inventory policy: EOQ isqrt repair and 3/4-fractile by hand") {
    import spark.implicits._
    // part 1: qty 1..4 -> demand 10, x = 500, EOQ = 22, q75 = 3
    // part 2: one line of 7 -> x = 350, EOQ = 18, q75 = 7
    val li = (Seq(1, 2, 3, 4).map(q => (1L, q.toDouble)) ++
      Seq((2L, 7.0))).toDF("l_partkey", "l_quantity")
    val got = DataQuality.inventoryPolicy(li).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got == Map(
      1L -> ((4L, 10L, 22L, 3L)),
      2L -> ((1L, 7L, 18L, 7L))))
  }

  test("linecount dispersion: over-dispersed hand histogram reads 2000 milli") {
    import spark.implicits._
    // per-order line counts 1,1,1,5 -> VMR = (4*28-64)/(3*8) = 2.0
    val li = (Seq(1L, 2L, 3L) ++ Seq.fill(5)(4L)).map(o => (o, 1))
      .toDF("l_orderkey", "pad")
    val got = DataQuality.linecountDispersion(li).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((3L, 2000L)), 5L -> ((1L, 2000L))))
  }

  test("Pareto share: top-20% cut lands inside a tie group exactly") {
    import spark.implicits._
    // values 1..5: top unit holds 5/15 -> complement floor gives 333334
    val a = (1L to 5L).map(v => (v, v)).toDF("id", "x")
    val g1 = DataQuality.paretoTopShare(a, "x").collect().head
    assert((g1.getLong(0), g1.getLong(1), g1.getLong(2), g1.getLong(3)) ==
      ((5L, 1L, 15L, 333334L)))
    // 2,2,2,2,10: boundary splits the tie group; top = 10/18 -> 555556
    val b = Seq(2L, 2L, 2L, 2L, 10L).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "x")
    val g2 = DataQuality.paretoTopShare(b, "x").collect().head
    assert((g2.getLong(2), g2.getLong(3)) == ((18L, 555556L)))
  }

  test("trimmed mean: outlier immunity and partial tie-group trimming") {
    import spark.implicits._
    // A: 1..9 plus a 1000 outlier -> trimmed keeps positions 2..9
    // (values 2..9, mean 5.5); raw mean is dragged to 104.5
    val a = ((1L to 9L) :+ 1000L).map(v => ("A", v))
    // B: 1x3, 2x4, 3x3 -> one unit shaved off each edge tie group
    val b = (Seq.fill(3)(1L) ++ Seq.fill(4)(2L) ++ Seq.fill(3)(3L))
      .map(v => ("B", v))
    val got = DataQuality.trimmedMean((a ++ b).toDF("cohort0", "v"),
      "cohort0", col("v")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      "A" -> ((10L, 8L, 5500L, 104500L)),
      "B" -> ((10L, 8L, 2000L, 2000L))))
  }

  test("QQ shift: shifted uniform reads a constant 10-dollar decile gap") {
    import spark.implicits._
    val df = ((1L to 10L).map(v => ("A", v)) ++
      (11L to 20L).map(v => ("B", v))).toDF("cohort0", "v")
    val got = DataQuality.qqShiftProfile(df, "cohort0", "A", "B", col("v"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got.size == 9)
    (1 to 9).foreach { d =>
      assert(got(d) == ((d.toLong, d + 10L, 10L, 100000L / d)), s"d=$d")
    }
  }

  test("length skewness: quartile positions and the collapsed-IQR guard") {
    import spark.implicits._
    // s1 lengths 1,1,2,10: q1=1, q2=1, q3=2 -> bowley = 1000
    // s2 constant: IQR 0 -> guarded 0
    val docs = (Seq(1L, 1L, 2L, 10L).zipWithIndex.map { case (n, i) =>
      (i.toLong, "t", "s1", "en", n) } ++
      Seq((10L, "t", "s2", "en", 5L), (11L, "t", "s2", "en", 5L)))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    val got = DataQuality.lengthSkewness(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == Map(
      "s1" -> ((4L, 1L, 1L, 2L, 1000L)),
      "s2" -> ((2L, 5L, 5L, 5L, 0L))))
  }

  test("order reconciliation: exact match bands -1; hand diff lands its bp band") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val oSchema = StructType(Seq(StructField("o_orderkey", LongType),
      StructField("o_totalprice", DoubleType)))
    val lSchema = StructType(Seq(StructField("l_orderkey", LongType),
      StructField("l_extendedprice", DoubleType),
      StructField("l_tax", DoubleType), StructField("l_discount", DoubleType)))
    // order 1: one line 100.00, tax 8%, disc 5% -> 10000*108*95/10000 = 10260
    //   header 102.60 -> exact match, band -1
    // order 2: same line but header 110.00 (11000c): diff 740, bp = 740*1e4/11000
    //   = 672 -> band = len(bin(672))-1 = 9
    val orders = spark.createDataFrame(Seq(
      Row(1L, 102.60), Row(2L, 110.00)).asJava, oSchema)
    val lines = spark.createDataFrame(Seq(
      Row(1L, 100.00, 0.08, 0.05), Row(2L, 100.00, 0.08, 0.05)).asJava, lSchema)
    val got = analytics.DataQuality.orderTotalReconciliation(orders, lines)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(-1L -> ((1L, 0L, 0L, 0L)), 9L -> ((1L, 672L, 672L, 740L))))
  }
}
