package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SC}

/** ScalaCheck property tests for the pure scalar surface (SURVEY §5):
  * threshold ladders total/mutually exclusive, sketch invariants,
  * date_key round-trip, normalization/word-count invariants. Run through
  * scalacheck's own runner (no scalatestplus artifact in the offline
  * cache). */
class PropertySpec extends SparkSpec {

  private def check(label: String, p: Prop): Unit = {
    val r = SC.check(SC.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, s"$label: ${r.status}")
  }

  private def arr(tokens: Seq[String]): GenericArrayData =
    new GenericArrayData(tokens.map(UTF8String.fromString).toArray[Any])

  private val token: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)

  test("simhash is token-order invariant and multiset-faithful (property)") {
    check("order invariance", Prop.forAll(Gen.listOf(token)) { toks =>
      val s = graft.functions.SketchUtil.simhash(arr(toks))
      s == graft.functions.SketchUtil.simhash(arr(toks.reverse)) &&
        s == graft.functions.SketchUtil.simhash(arr(toks.sorted))
    })
    // duplicating every token doubles every vote: sign vector (= sketch)
    // is unchanged
    check("vote linearity", Prop.forAll(Gen.listOf(token)) { toks =>
      graft.functions.SketchUtil.simhash(arr(toks)) ==
        graft.functions.SketchUtil.simhash(arr(toks ++ toks))
    })
  }

  test("minhash minima are monotone under corpus growth (property)") {
    val doc = Gen.listOf(token).suchThat(_.size >= 3)
    check("monotonicity", Prop.forAll(doc, Gen.nonEmptyListOf(token)) { (toks, extra) =>
      val base = graft.functions.SketchUtil.minhash(arr(toks), 3, 16)
      val grown = graft.functions.SketchUtil.minhash(arr(toks ++ extra), 3, 16)
      (0 until 16).forall(i => grown.getLong(i) <= base.getLong(i))
    })
    check("short docs are null", Prop.forAll(Gen.listOfN(2, token)) { toks =>
      graft.functions.SketchUtil.minhash(arr(toks), 3, 16) == null
    })
  }

  test("sentimentKey ladder is total, in 1..5, and mirrors the reference CASE (property via Spark)") {
    import spark.implicits._
    // reference semantics, complete_data_pipeline_fixed.py:229-235
    def refKey(x: Double): Int =
      if (x >= 0.5) 1 else if (x >= 0.1) 2
      else if (x <= -0.5) 5 else if (x <= -0.1) 4 else 3
    val samples = Gen.listOfN(500,
      Gen.oneOf(Gen.choose(-1.1, 1.1), Gen.oneOf(-0.5, -0.1, 0.1, 0.5, 0.0)))
      .sample.get
    val out = samples.toDF("s")
      .select(col("s"), graft.domain.Star.sentimentKey(col("s")).as("k"))
      .collect()
    out.foreach { r =>
      val (s, k) = (r.getDouble(0), r.getInt(1))
      assert(k >= 1 && k <= 5, s"key $k out of range for $s")
      assert(k === refKey(s), s"key $k != reference ${refKey(s)} for $s")
    }
  }

  test("date_key YYYYMMDD round-trips for the whole dim_date span (property)") {
    val date = Gen.choose(0L, java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.of(2020, 1, 1), java.time.LocalDate.of(2030, 12, 31)))
      .map(java.time.LocalDate.of(2020, 1, 1).plusDays(_))
    check("round trip", Prop.forAll(date) { d =>
      val dk = d.getYear * 10000 + d.getMonthValue * 100 + d.getDayOfMonth
      dk / 10000 == d.getYear && dk / 100 % 100 == d.getMonthValue &&
        dk % 100 == d.getDayOfMonth
    })
  }

  test("Misra-Gries retains every item above the n/(k+1) bound (property)") {
    val stream = Gen.listOf(Gen.chooseNum(0, 30).map("w" + _))
    val kGen = Gen.chooseNum(2, 16)
    check("retention", Prop.forAll(stream, kGen) { (s, k) =>
      val out = graft.operators.FreqItems.misraGries(s.iterator, k).toSet
      val counts = s.groupBy(identity).view.mapValues(_.size.toLong)
      val mustKeep = counts.filter(_._2 > s.size.toLong / (k + 1)).keys
      mustKeep.forall(out.contains) && out.size <= k
    })
    // two-phase exactness on a deliberately adversarial split: heavy item
    // spread thinly across partitions still surfaces in at least one
    val parts = Seq.fill(8)(Seq.fill(40)("hot") ++ (1 to 160).map("cold" + _))
    val cands = parts.flatMap(p =>
      graft.operators.FreqItems.misraGries(p.iterator, 512)).toSet
    assert(cands.contains("hot"))
  }

  test("GlobalRank equals the sorted index for arbitrary multisets (property via Spark)") {
    import spark.implicits._
    // Random duplicates-heavy doubles (negatives, ties, tiny/degenerate
    // sizes) — the boundary/bucket edge cases a fixed dataset never hits.
    val data = Gen.listOf(Gen.chooseNum(-50, 50).map(_ / 7.0))
    (1 to 12).foreach { i =>
      val vs = data.sample.getOrElse(Nil)
      if (vs.nonEmpty) {
        val df = vs.zipWithIndex.map { case (v, id) => (id.toLong, v) }.toDF("id", "v")
        val ranked = graft.operators.GlobalRank
          .withRank(df, col("v"), descending = i % 2 == 0,
            tieBreakers = Seq(col("id")), rnName = "rn")
          .select("id", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val expected = vs.zipWithIndex
          .sortBy { case (v, id) => (if (i % 2 == 0) -v else v, id) }
          .zipWithIndex.map { case ((_, id), rn) => id.toLong -> (rn + 1).toLong }
          .toMap
        assert(ranked === expected, s"round $i: ranks diverged from sorted index")
      }
    }
  }

  test("whitespace normalization is idempotent and word-count stable (property via Spark)") {
    import spark.implicits._
    val word = Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString)
    val ws = Gen.oneOf(" ", "  ", "\t", " \t ")
    val messy = Gen.listOfN(40,
      for { w <- Gen.listOf(word).suchThat(_.nonEmpty); sep <- ws }
        yield (w.mkString(sep), w.size)).sample.get
    val norm = regexp_replace(trim(col("raw")), "\\s+", " ")
    val out = messy.toDF("raw", "n")
      .select(col("n"),
        size(split(norm, " ")).as("wc"),
        (norm === regexp_replace(trim(norm), "\\s+", " ")).as("idem"))
      .collect()
    out.foreach { r =>
      assert(r.getInt(1) === r.getInt(0), "word count drifted under whitespace noise")
      assert(r.getBoolean(2), "normalization not idempotent")
    }
  }
}
