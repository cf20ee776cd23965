package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SketchExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_simhash equals the SimhashAgg aggregation formulation bit-for-bit") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val viaExpr = docs
      .select(col("doc_id"), expr("graft_simhash(split(text, ' '))").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaAgg = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("cnt"))
      .withColumn("th", expr("graft_h60(token)"))
      .groupBy(col("doc_id"))
      .agg(graft.operators.SimhashAgg(col("th"), col("cnt")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr === viaAgg)
  }

  test("h60 matches the SQL formulation ('0x' || substr(md5(s),1,15))::BIGINT") {
    // Values pinned from DuckDB 1.0 — the oracle engine must agree on the
    // portable hash or every sketch oracle collapses.
    import org.apache.spark.unsafe.types.UTF8String
    assert(SketchUtil.h60(UTF8String.fromString("")) === 955282973525019424L)
    assert(SketchUtil.h60(UTF8String.fromString("hello")) === 419982666956583591L)
    // And the column expression is the same function.
    val viaExpr = Seq("", "hello", "héllo wörld")
      .toDF("s").select(expr("graft_h60(s)")).as[Long].collect()
    val direct = Seq("", "hello", "héllo wörld")
      .map(s => SketchUtil.h60(UTF8String.fromString(s)))
    assert(viaExpr.toSeq === direct)
  }

  test("minhash lane constants are non-zero across the usable permutation range") {
    (0 until (1 << 20)).foreach { p =>
      assert(SketchUtil.laneA(p) != 0L, s"laneA($p) = 0")
      assert(SketchUtil.laneB(p) != 0L, s"laneB($p) = 0")
    }
  }

  test("graft_simhash is insensitive to token order, sensitive to token multiset") {
    val rows = Seq(
      ("a b c d e f", "f e d c b a", "a b c d e g"))
      .toDF("t1", "t2", "t3")
      .select(
        expr("graft_simhash(split(t1, ' '))").as("s1"),
        expr("graft_simhash(split(t2, ' '))").as("s2"),
        expr("graft_simhash(split(t3, ' '))").as("s3"))
      .head()
    assert(rows.getLong(0) === rows.getLong(1)) // order-free
    assert(rows.getLong(0) !== rows.getLong(2)) // content-sensitive
  }

  test("graft_minhash: shape, determinism, null for short docs, identity for dups") {
    val df = Seq(
      (1L, "w x y z w x y z"),
      (2L, "w x y z w x y z"), // exact dup of 1 → identical signature
      (3L, "completely different tokens here now ok"),
      (4L, "a b")) // shorter than one 3-shingle → null
      .toDF("id", "text")
      .select(col("id"), expr("graft_minhash(split(text, ' '), 3, 16)").as("mh"))
    val rows = df.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    assert(rows(1) !== null)
    assert(rows(1).length === 16)
    assert(rows(1) === rows(2)) // identical docs → identical signature
    assert(rows(1) !== rows(3))
    assert(rows(4) === null)
  }

  test("graft_minhash signature agreement tracks Jaccard similarity") {
    // Two docs sharing most shingles should agree on most of the 16 minima;
    // two unrelated docs should agree on (almost) none.
    val near = Seq(
      ("t u v w x y z a b c d e f g h i j k", "t u v w x y z a b c d e f g h i j q"))
      .toDF("a", "b")
      .select(
        expr("graft_minhash(split(a, ' '), 3, 16)").as("ma"),
        expr("graft_minhash(split(b, ' '), 3, 16)").as("mb"))
      .select(expr("size(filter(zip_with(ma, mb, (x, y) -> x = y), v -> v))").as("agree"))
      .head().getInt(0)
    assert(near >= 10, s"near-dup pair agreed on only $near/16 minima")
    val far = Seq(
      ("t u v w x y z a b c d e f g h i j k", "one two three four five six seven eight nine"))
      .toDF("a", "b")
      .select(
        expr("graft_minhash(split(a, ' '), 3, 16)").as("ma"),
        expr("graft_minhash(split(b, ' '), 3, 16)").as("mb"))
      .select(expr("size(filter(zip_with(ma, mb, (x, y) -> x = y), v -> v))").as("agree"))
      .head().getInt(0)
    assert(far <= 2, s"unrelated pair agreed on $far/16 minima")
  }

  test("q28 LSH candidates still recover the exact-Jaccard near-dup pairs") {
    // The planted near-dups (jaccard >= 0.97) must collide in at least one
    // of the 4 bands — recall check of the banding scheme end-to-end.
    val d = "/root/testdata/sf0.01"
    val exact = graft.queries.DedupOps.queries("q27_dedup_ngram_jaccard")(spark, d)
      .filter(col("jaccard") >= 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = graft.queries.DedupOps.queries("q28_dedup_minhash_lsh")(spark, d)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(exact.subsetOf(lsh),
      s"LSH missed planted near-dups: ${exact.diff(lsh)}")
  }
}
