package graft.domain

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopicsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = {
    val service = (1 to 8).map(i =>
      s"service excellent personnel accueil professionnel agence$i guichet rapide")
    val fees = (1 to 8).map(i =>
      s"frais commission tarif eleve compte carte bancaire cher agence$i")
    (service ++ fees).toDF("text")
      .withColumn("tokens", Nlp.topicTokens(col("text")))
  }

  test("fit declines below 10 docs (reference guard)") {
    val tiny = Seq("service bon").toDF("text")
      .withColumn("tokens", Nlp.topicTokens(col("text")))
    assert(Topics.fit(tiny, k = 2).isEmpty)
  }

  test("LDA k=2 seed=42: distributions sum to 1, scoring deterministic") {
    val model = Topics.fit(corpus, k = 2).get
    val out = Topics.transform(model, corpus).cache()
    val sums = out.select(expr("aggregate(map_values(topic_distribution), 0.0d, (a, x) -> a + x)").as("s"))
      .collect().map(_.getDouble(0))
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-6))
    assert(out.filter(col("dominant_topic").isNull).count() === 0)
    // one fitted model scores deterministically (distributed float reduction
    // order can perturb refits — SURVEY §7.4.7 scopes parity to argmax shape)
    val again = Topics.transform(model, corpus)
    val a = out.select("text", "dominant_topic").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val b = again.select("text", "dominant_topic").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(a === b)
  }

  test("topicSummary exposes top terms per topic from the vocabulary") {
    val model = Topics.fit(corpus, k = 2).get
    val summary = Topics.topicSummary(spark, model, topN = 5).collect()
    assert(summary.length === 2)
    summary.foreach { r =>
      assert(r.getSeq[String](1).length === 5)
      assert(r.getSeq[Double](2).length === 5)
    }
  }
}
