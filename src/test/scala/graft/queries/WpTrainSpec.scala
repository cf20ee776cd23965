package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WordPiece trainer (BpeOps.trainWordPiece): the likelihood criterion,
  * pinned against the one behavior that separates it from BPE — a
  * frequent pair of already-frequent symbols must LOSE to a rarer pair
  * whose parts occur almost nowhere else. Plus the determinism contract
  * every trainer in the repo carries. */
class WpTrainSpec extends SparkSpec {
  import spark.implicits._

  test("likelihood argmax diverges from frequency argmax on the canonical fixture") {
    // "aa" x10: pair count 10 but a occurs 20 times -> score 10/400 = 0.025.
    // "bc" x4: pair count 4, b and c occur only here -> score 4/16 = 0.25.
    val wf = Seq(("aa", 10L), ("bc", 4L)).toDF("word", "freq")
    val bpe = BpeOps.trainBpe(wf, 1)
    val wp = BpeOps.trainWordPiece(wf, 1)
    assert(bpe.head.merged === "aa", "frequency picks the frequent pair")
    assert(wp.head.merged === "bc", "likelihood picks the exclusive pair")
    assert(wp.head.count === 4L && math.abs(wp.head.score - 0.25) < 1e-15)
  }

  test("deterministic under repartitioning; placeholder expansion works") {
    val words = Seq(("abab", 5L), ("abc", 3L), ("bcd", 2L), ("dd", 7L))
    val a = BpeOps.trainWordPiece(words.toDF("word", "freq"), 4)
    val b = BpeOps.trainWordPiece(words.toDF("word", "freq").repartition(7), 4)
    assert(a === b, "merge list must be partitioning-invariant")
    assert(a.nonEmpty && a.map(_.step) === a.indices.toSeq)
    // Every merged surface string expands placeholders fully (no PUA).
    assert(a.forall(m => m.merged.forall(c => c < 0xE000.toChar)))
  }

  test("corpus run: q216 emits OracleMerges scored merges") {
    val df = graft.SparkEntry.queries("q216_wordpiece_train")(
      spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.length === BpeOps.OracleMerges)
    assert(rows.forall(r => r.getDouble(3) > 0.0 && r.getLong(2) > 0L))
  }
}
