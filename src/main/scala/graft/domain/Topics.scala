package graft.domain

import org.apache.spark.ml.feature.{CountVectorizer, CountVectorizerModel, IDF, NGram}
import org.apache.spark.ml.clustering.{LDA, LDAModel}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Topic modeling (N4-N7, nlp_processor_simple.py:159-242,288-308):
  * unigram+bigram vocabulary (vocabSize=100, minDF=2, maxDF=0.8) → TF-IDF →
  * online LDA k=8, seed=42, maxIter=10, all spark.ml stages. sklearn and
  * MLlib won't agree bit-for-bit on model internals (SURVEY §7.4.7) — parity
  * target is distribution shape + argmax stability, covered by TopicsSpec.
  */
object Topics {

  /** The 8 fixed topic labels (nlp_processor_simple.py:31-40). */
  val topicLabels: Seq[String] = Seq(
    "Service Quality", "Wait Times", "Staff Behavior", "Digital Services",
    "Fees & Pricing", "Branch Facilities", "Account Services", "Customer Support")

  final case class TopicModel(cv: CountVectorizerModel, lda: LDAModel)

  /** tokens column → unigram+bigram terms column (N4 ngram_range=(1,2)). */
  def withTerms(df: DataFrame): DataFrame = {
    val bigrams = new NGram().setN(2).setInputCol("tokens").setOutputCol("__bigrams")
    bigrams.transform(df)
      .withColumn("terms", concat(col("tokens"), col("__bigrams")))
      .drop("__bigrams")
  }

  /** Fit the vocabulary + LDA on a corpus with a `tokens` array column.
    * Skips (returns None) below 10 docs like the reference
    * (nlp_processor_simple.py:25). */
  def fit(corpus: DataFrame, k: Int = 8): Option[TopicModel] = {
    if (corpus.limit(10).count() < 10) return None
    val terms = withTerms(corpus)
    val cv = new CountVectorizer()
      .setInputCol("terms").setOutputCol("tf")
      .setVocabSize(100).setMinDF(2.0).setMaxDF(0.8)
      .fit(terms)
    val tf = cv.transform(terms)
    val lda = new LDA()
      .setK(k).setSeed(42).setMaxIter(10).setOptimizer("online")
      .setFeaturesCol("tf")
      .fit(tf)
    Some(TopicModel(cv, lda))
  }

  /** N6: dominant_topic label + topic_distribution map per document. */
  def transform(model: TopicModel, df: DataFrame): DataFrame = {
    val withTf = model.cv.transform(withTerms(df))
    val scored = model.lda.transform(withTf)
    val toArr = udf((v: Vector) => v.toArray)
    val labels = topicLabels.take(model.lda.getK)
    scored
      .withColumn("__dist", toArr(col("topicDistribution")))
      .withColumn("__argmax",
        expr("array_position(__dist, array_max(__dist))").cast("int") - 1)
      .withColumn("dominant_topic",
        element_at(typedLit(labels), col("__argmax") + 1))
      .withColumn("topic_distribution",
        map_from_arrays(
          typedLit(labels.indices.map(i => s"topic_$i")),
          col("__dist")))
      .drop("topicDistribution", "tf", "terms", "__dist", "__argmax")
  }

  /** N7: per-topic top-N terms with weights (describeTopics joined back to
    * vocabulary; nlp_processor_simple.py:288-308). */
  def topicSummary(spark: SparkSession, model: TopicModel, topN: Int = 10): DataFrame = {
    val vocab = model.cv.vocabulary
    val lookup = udf((idxs: Seq[Int]) => idxs.map(vocab(_)))
    model.lda.describeTopics(topN)
      .withColumn("terms", lookup(col("termIndices")))
      .select(col("topic"), col("terms"), col("termWeights"))
  }
}
