package graft.queries

import graft.SparkSpec

/** The q119 property its corpus oracle can't state: winnowing's DETECTION
  * GUARANTEE — any two docs sharing a token run of length ≥ k + w − 1
  * (= 7 here) must share at least one selected fingerprint — plus the
  * density bound (selected ≤ grams) and a negative control. */
class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(): String = {
    val shared = "charlie delta echo foxtrot golf hotel india juliett" // 8 tokens
    val docs = Seq(
      (1L, s"alpha bravo $shared kilo lima", "a"),
      (2L, s"zulu yankee xray whiskey $shared", "b"),
      (3L, "one two three four five six seven eight nine ten", "c"))
      .map { case (id, tx, src) => (id, tx, "en", src, tx.length.toLong) }
    val dir = java.nio.file.Files.createTempDirectory("winnow").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q119: shared >=7-token run guarantees a shared fingerprint; disjoint doc has none") {
    val dir = writeDocs()
    val out = DedupOps.queries("q119_winnowing")(spark, dir).collect()
    val byId = out.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // Density: selection is non-empty and never exceeds the gram count.
    byId.values.foreach { case (ng, nf, _) =>
      assert(nf >= 1 && nf <= ng)
    }
    // The guarantee: docs 1 and 2 share an 8-token run (≥ k+w−1 = 7), so
    // each must count the other as a partner.
    assert(byId(1L)._3 >= 1L, "doc 1 links to doc 2")
    assert(byId(2L)._3 >= 1L, "doc 2 links to doc 1")
    // Negative control: doc 3 shares no 4-gram with anything.
    assert(byId(3L)._3 === 0L)
  }
}
