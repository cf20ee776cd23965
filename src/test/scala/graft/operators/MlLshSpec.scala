package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.functions._

/** spark.ml MinHashLSH as the library alternative to the hand-rolled
  * MinHash in q28 (SURVEY §7.3: `ml.feature.MinHashLSH` for near-dup
  * detection). Cross-validates: the ML path must recover the planted
  * near-dup pair that the q27 exact-Jaccard query finds at sf0.001. */
class MlLshSpec extends SparkSpec {

  test("ml MinHashLSH approxSimilarityJoin recovers the exact-Jaccard near-dups") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), split(col("text"), " ").as("tokens"))
      .filter(size(col("tokens")) >= 3)
    val tf = new HashingTF().setInputCol("tokens").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val featurized = tf.transform(docs)
      .filter(expr("aggregate(tokens, 0, (a, x) -> a + 1) > 0"))
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42)
    val model = lsh.fit(featurized)
    val pairs = model.approxSimilarityJoin(featurized, featurized, 0.5, "dist")
      .select(col("datasetA.doc_id").as("doc_a"), col("datasetB.doc_id").as("doc_b"),
        col("dist"))
      .filter(col("doc_a") < col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // ground truth: within-source exact-Jaccard >= 0.5 pairs from q27
    val exact = graft.queries.DedupOps.queries("q27_dedup_ngram_jaccard")(
      spark, "/root/testdata/sf0.001")
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "testdata should contain planted near-dups")
    // token-level LSH (distance = 1 - token jaccard) must cover the
    // shingle-level pairs: near-identical docs are near-dups in both spaces
    assert(exact.subsetOf(pairs),
      s"ml LSH missed planted pairs: ${exact -- pairs}")
  }
}
