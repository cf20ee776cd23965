package graft.domain

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NlpSpec extends SparkSpec {
  import spark.implicits._

  private def langOf(text: String): (String, Double) = {
    val df = Nlp.withLanguage(Seq(text).toDF("text"))
    val r = df.select("detected_language", "language_confidence").head()
    (r.getString(0), r.getDouble(1))
  }

  private def sentimentOf(text: String): (Double, String) = {
    val df = Nlp.withSentiment(Seq(text).toDF("text"))
    val r = df.select("sentiment_score", "sentiment_label").head()
    (r.getDouble(0), r.getString(1))
  }

  test("language: French markers beat Arabic; confidence = hits/words capped") {
    val (lang, conf) = langOf("le service est excellent dans cette banque")
    assert(lang === "fr")
    assert(conf > 0 && conf <= 1.0)
  }

  test("language: Arabic detected from marker tokens") {
    assert(langOf("خدمة بنك جيد")._1 === "ar")
  }

  test("language: <3 chars → unknown with 0.0 confidence (reference floor)") {
    assert(langOf("ab") === (("unknown", 0.0)))
  }

  test("language: no markers → unknown with 0.3 confidence floor") {
    val (lang, conf) = langOf("zzz qqq www")
    assert(lang === "unknown")
    assert(conf === Thresholds.languageUnknownConfidence)
  }

  test("sentiment: lexicon scoring with ±0.8 clamp and ±0.1 label bands") {
    val (s1, l1) = sentimentOf("excellent service bon personnel rapide merci super parfait")
    assert(s1 === 0.8) // 7 positive hits → clamped to 0.8
    assert(l1 === "Positive")
    val (s2, l2) = sentimentOf("mauvais lent horrible nul pire attente")
    assert(s2 === -0.8)
    assert(l2 === "Negative")
    val (s3, l3) = sentimentOf("une visite normale sans rien")
    assert(s3 === 0.0)
    assert(l3 === "Neutral")
  }

  test("sentiment: score always within clamp; label total function (property sweep)") {
    val vocab = Nlp.positiveLexicon ++ Nlp.negativeLexicon ++ Seq("banque", "agence")
    val rng = new scala.util.Random(42)
    val texts = (1 to 50).map { _ =>
      (0 until rng.nextInt(30)).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" ")
    }.map(t => if (t.isEmpty) "x" else t)
    val rows = Nlp.withSentiment(texts.toDF("text"))
      .select("sentiment_score", "sentiment_label").collect()
    rows.foreach { r =>
      assert(r.getDouble(0) >= -0.8 && r.getDouble(0) <= 0.8)
      assert(Set("Positive", "Negative", "Neutral").contains(r.getString(1)))
    }
  }

  /** The reference's own smoke corpus (nlp_processor_simple.py:319-328). */
  private val smokeReviews = Seq(
    "Le service client est excellent et le personnel très accueillant",
    "Temps d'attente très long et service décevant",
    "Personnel non professionnel et aucune considération pour les clients",
    "Très bonne expérience, service rapide et efficace",
    "L'application mobile ne fonctionne pas bien",
    "Les frais bancaires sont trop élevés et injustifiés",
    "Agence propre et bien organisée, bon accueil",
    "Impossible de joindre quelqu'un au téléphone")

  test("sentiment: FullLexiconScorer matches TextBlob-grade labels on the smoke corpus") {
    val labels = Nlp.withSentiment(smokeReviews.toDF("text"),
        scorer = FullLexiconScorer)
      .select("sentiment_label").collect().map(_.getString(0)).toSeq
    // The reference's TextBlob scorer reads these as P,N,N,P,N,N,P,N —
    // including the three the portable keyword spec gets wrong (negated
    // praise in #3 and #5, accented complaint vocabulary in #6).
    assert(labels === Seq("Positive", "Negative", "Negative", "Positive",
      "Negative", "Negative", "Positive", "Negative"))
  }

  test("sentiment: portable spec on the same corpus — documents its known gaps") {
    val labels = Nlp.withSentiment(smokeReviews.toDF("text"))
      .select("sentiment_label").collect().map(_.getString(0)).toSeq
    // ASCII 10-word lists: no negation handling (#3, #5 read Positive),
    // no accented forms (#6, #8 read Neutral). This is the reference's
    // own portable fallback behavior, kept bit-reproducible for q24.
    assert(labels === Seq("Positive", "Negative", "Positive", "Positive",
      "Positive", "Neutral", "Positive", "Neutral"))
  }

  test("sentiment: FullLexiconScorer emits the reference's full 4-field contract") {
    // analyze_sentiment returns {score, label, confidence, subjectivity}
    // with confidence = min(subjectivity + |polarity|, 1) and an all-zero
    // early return for <3-char text (nlp_processor_simple.py:77-121).
    val out = Nlp.withSentiment((smokeReviews ++ Seq("ok", "", null)).toDF("text"),
        scorer = FullLexiconScorer)
      .select("text", "sentiment_score", "sentiment_label",
        "sentiment_confidence", "subjectivity")
      .collect()
    out.foreach { r =>
      val (score, conf, subj) = (r.getDouble(1), r.getDouble(3), r.getDouble(4))
      assert(subj >= 0.0 && subj <= 1.0, s"subjectivity out of range: $r")
      assert(conf === math.min(subj + math.abs(score), 1.0),
        s"confidence must be min(subjectivity+|polarity|, 1): $r")
      if (r.getString(0) == null || r.getString(0).trim.length < 3)
        assert(score === 0.0 && conf === 0.0 && subj === 0.0 &&
          r.getString(2) === "Neutral", s"short-text early return violated: $r")
    }
    // subjectivity is polarity-word density: smoke review #4 ("Très bonne
    // expérience, service rapide et efficace") has 3 lexicon hits / 7 words.
    val r4 = out.find(_.getString(0) == smokeReviews(3)).get
    assert(r4.getDouble(4) === 3.0 / 7)
    // the portable scorer keeps the 3-column contract (q24's oracle shape)
    val portable = Nlp.withSentiment(smokeReviews.toDF("text"))
    assert(!portable.columns.contains("subjectivity"))
  }

  test("sentiment: full-lexicon score is mean word polarity in [-1, 1]") {
    val rows = Nlp.withSentiment(
        Seq("excellent mais lent", "zzz qqq", "service excellent rapide")
          .toDF("text"), scorer = FullLexiconScorer)
      .select("sentiment_score").collect().map(_.getDouble(0)).toSeq
    assert(rows(0) === 0.0) // 1 pos, 1 neg → balanced
    assert(rows(1) === 0.0) // no hits
    assert(rows(2) === 1.0) // unopposed positives
  }

  test("features: word_count/char_count/rating_category/detail level") {
    val df = Nlp.withFeatures(
      Seq((5, "un deux trois", "2024-06-01 10:00:00"))
        .toDF("rating", "text", "rt")
        .withColumn("review_time", col("rt").cast("timestamp")))
    val r = df.select("word_count", "char_count", "rating_category",
      "review_detail_level", "review_year", "review_month", "day_of_week").head()
    assert(r.getInt(0) === 3)
    assert(r.getInt(1) === 13)
    assert(r.getString(2) === "Positive")
    assert(r.getString(3) === "brief")
    assert(r.getInt(4) === 2024)
    assert(r.getString(5) === "2024-06")
    assert(r.getString(6) === "Saturday")
  }

  test("word_count: empty text → 0 (python semantics, not PG string_to_array)") {
    val df = Nlp.withFeatures(
      Seq((3, "", "2024-06-01 10:00:00")).toDF("rating", "text", "rt")
        .withColumn("review_time", col("rt").cast("timestamp")))
    assert(df.select("word_count").head().getInt(0) === 0)
  }

  test("mention flags are null-safe and case-insensitive") {
    val df = Nlp.withFeatures(
      Seq((3, "Le SERVICE est top, frais corrects", "2024-06-01 10:00:00"))
        .toDF("rating", "text", "rt")
        .withColumn("review_time", col("rt").cast("timestamp")))
    val r = df.select("mentions_service", "mentions_fees", "mentions_waiting").head()
    assert(r.getBoolean(0)); assert(r.getBoolean(1)); assert(!r.getBoolean(2))
  }

  test("topicTokens: lowercases, strips digits/punct, drops stopwords and short tokens") {
    val toks = Seq("Le Service est EXCELLENT!!! 123 au guichet")
      .toDF("text").select(Nlp.topicTokens(col("text")).as("t"))
      .head().getSeq[String](0)
    assert(toks === Seq("service", "excellent", "guichet"))
  }
}
