package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** NLP surface (SURVEY §2.8) as pure column expressions — the reference's
  * row-wise pandas functions become codegen'd Catalyst expressions; no UDFs
  * needed anywhere on the hot path.
  *
  * N1 language detection (nlp_processor_simple.py:42-75): marker-word hit
  * counting, French list beats Arabic, conf = min(hits/words, 1.0),
  * `unknown` floor 0.3, texts < 3 chars → ('unknown', 0.0).
  *
  * N2 sentiment (portable keyword-lexicon spec the reference itself ships as
  * its fallback/test oracle, test_phase2_simple.py:83-104): score =
  * clamp(0.2·(pos−neg), ±0.8), labels at ±0.1
  * (nlp_processor_simple.py:96-102).
  */
object Nlp {

  /** French marker words (function words, same semantics as the reference's
    * 19-word list). */
  val frenchMarkers: Seq[String] = Seq(
    "le", "la", "les", "de", "du", "des", "et", "est", "un", "une",
    "dans", "pour", "avec", "sur", "ce", "cette", "tres", "bien", "service")

  /** Arabic marker tokens (bank-domain nouns, mirroring the reference's
    * 8-token list). */
  val arabicMarkers: Seq[String] = Seq(
    "بنك", "خدمة", "جيد", "سيء", "ممتاز", "فرع", "موظف", "وقت")

  val positiveLexicon: Seq[String] = Seq(
    "bon", "bien", "excellent", "parfait", "rapide", "professionnel",
    "merci", "super", "agreable", "efficace")

  val negativeLexicon: Seq[String] = Seq(
    "mauvais", "lent", "attente", "probleme", "nul", "horrible",
    "decevant", "long", "jamais", "pire")

  /** 68-word-class French stopword list for topic preprocessing (N3,
    * nlp_processor_simple.py:123-157). */
  val frenchStopwords: Seq[String] = Seq(
    "le", "la", "les", "un", "une", "des", "de", "du", "et", "ou", "mais",
    "donc", "car", "ne", "pas", "plus", "moins", "tres", "bien", "mal",
    "avec", "sans", "pour", "par", "sur", "sous", "dans", "entre", "vers",
    "chez", "ce", "cette", "ces", "cet", "mon", "ma", "mes", "ton", "ta",
    "tes", "son", "sa", "ses", "notre", "nos", "votre", "vos", "leur",
    "leurs", "je", "tu", "il", "elle", "nous", "vous", "ils", "elles",
    "qui", "que", "quoi", "dont", "est", "sont", "etait", "etre", "avoir",
    "a", "au", "aux")

  private def markerHits(c: Column, markers: Seq[String]): Column =
    regexp_count(lower(c), lit("\\b(" + markers.mkString("|") + ")\\b"))

  private def wordCount(c: Column): Column =
    when(length(trim(c)) === 0, 0).otherwise(size(split(trim(c), "\\s+")))

  /** N1: adds detected_language + language_confidence columns. */
  def withLanguage(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val fr = markerHits(t, frenchMarkers)
    val ar = arabicMarkers.map(m => when(t.contains(m), 1).otherwise(0)).reduce(_ + _)
    val words = wordCount(t)
    df.withColumn("__fr", fr).withColumn("__ar", ar).withColumn("__w", words)
      .withColumn("detected_language",
        when(length(coalesce(t, lit(""))) < 3, "unknown")
          .when(col("__fr") >= col("__ar") && col("__fr") > 0, "fr")
          .when(col("__ar") > 0, "ar")
          .otherwise("unknown"))
      .withColumn("language_confidence",
        when(length(coalesce(t, lit(""))) < 3, 0.0)
          .when(col("detected_language") === "unknown", Thresholds.languageUnknownConfidence)
          .otherwise(least(
            greatest(col("__fr"), col("__ar")).cast("double") / col("__w").cast("double"),
            lit(1.0))))
      .drop("__fr", "__ar", "__w")
  }

  /** N2: adds sentiment_score / sentiment_label / sentiment_confidence —
    * plus `subjectivity` for scorers that model it, completing the
    * reference's 4-field analyze_sentiment contract with its
    * min(subjectivity + |polarity|, 1) confidence and all-zero short-text
    * early return (nlp_processor_simple.py:77-121). The scorer is
    * pluggable (see graft.domain.SentimentScorer): the default
    * [[PortableScorer]] is the reference's bit-reproducible 3-column spec
    * the pipeline and q24 run on; [[FullLexiconScorer]] narrows the gap
    * to the reference's TextBlob scorer. Label thresholds (±0.1,
    * nlp_processor_simple.py:96-102) are shared — they're the
    * reference's, independent of lexicon. */
  def withSentiment(df: DataFrame, textCol: String = "text",
      scorer: SentimentScorer = PortableScorer): DataFrame = {
    val t = col(textCol)
    val pos = scorer.hits(t, scorer.positive)
    val neg = scorer.hits(t, scorer.negative)
    val subjOpt = scorer.subjectivity(col("__pos"), col("__neg"), col("__w"))
    // The reference's analyze_sentiment early-returns all-zero fields for
    // blank/<3-char text (nlp_processor_simple.py:82-88). Applied only on
    // the 4-field contract path: the portable 3-column spec predates it
    // and its oracle (q24) must stay byte-stable.
    val short = length(trim(coalesce(t, lit("")))) < 3
    def guarded(c: Column): Column =
      if (subjOpt.isDefined) when(short, lit(0.0)).otherwise(c) else c
    val base = df.withColumn("__pos", pos).withColumn("__neg", neg)
      .withColumn("__w", wordCount(t))
      .withColumn("sentiment_score",
        guarded(scorer.score(col("__pos"), col("__neg"))))
      .withColumn("sentiment_label",
        when(col("sentiment_score") > Thresholds.sentimentPositive, "Positive")
          .when(col("sentiment_score") < Thresholds.sentimentNegative, "Negative")
          .otherwise("Neutral"))
      .withColumn("sentiment_confidence",
        guarded(scorer.confidence(col("__pos"), col("__neg"),
          col("sentiment_score"), subjOpt)))
    subjOpt.fold(base)(s => base.withColumn("subjectivity", guarded(s)))
      .drop("__pos", "__neg", "__w")
  }

  /** N3 preprocessing as a column: lower, accent-preserving letter filter,
    * collapse whitespace, drop stopwords and tokens ≤ 2 chars
    * (nlp_processor_simple.py:146-157). Returns an array<string> column. */
  def topicTokens(textCol: Column): Column = {
    val cleaned = regexp_replace(lower(textCol), "[^a-zàáâäçèéêëìíîïòóôöùúûüÿ\\s]", " ")
    val toks = split(regexp_replace(trim(cleaned), "\\s+", " "), " ")
    array_except(filter(toks, t => length(t) > 2), lit(frenchStopwords.toArray))
  }

  /** N9 feature engineering (run_phase2_transformation.py:142-180). */
  def withFeatures(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("word_count", wordCount(t))
      .withColumn("char_count", length(coalesce(t, lit(""))))
      .withColumn("rating_category",
        when(col("rating") >= Thresholds.ratingHigh, "Positive")
          .when(col("rating") <= Thresholds.ratingLow, "Negative")
          .otherwise("Neutral"))
      .withColumn("review_detail_level",
        when(col("word_count") >= 50, "detailed")
          .when(col("word_count") >= 20, "moderate")
          .otherwise("brief"))
      .withColumn("review_year", year(col("review_time")))
      .withColumn("review_month", date_format(col("review_time"), "yyyy-MM"))
      .withColumn("day_of_week", date_format(col("review_time"), "EEEE"))
      .withColumn("mentions_service",
        coalesce(lower(t).rlike("service|accueil|personnel"), lit(false)))
      .withColumn("mentions_waiting",
        coalesce(lower(t).rlike("attente|attendre|queue|file"), lit(false)))
      .withColumn("mentions_fees",
        coalesce(lower(t).rlike("frais|commission|tarif|prix"), lit(false)))
  }

  /** Full silver enrichment: language + sentiment + features (N8 driver,
    * nlp_processor_simple.py:244-286 — one lineage, no iterrows analog). */
  def enrich(staged: DataFrame): DataFrame =
    withFeatures(withSentiment(withLanguage(staged)))
}
