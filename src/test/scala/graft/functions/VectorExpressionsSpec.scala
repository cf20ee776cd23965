package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot matches the ordered lambda fold bit-for-bit on real data") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(expr("cast(embedding as array<double>)").as("v")).limit(100)
    val both = e.select(
      expr("graft_dot(v, v)").as("native"),
      expr("aggregate(zip_with(v, v, (x, y) -> x * y), cast(0.0 as double), (a, p) -> a + p)").as("fold"))
    assert(both.filter(col("native") =!= col("fold")).count() === 0)
  }

  test("graft_l2norm matches sqrt of the squared fold") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(expr("cast(embedding as array<double>)").as("v")).limit(100)
    val both = e.select(
      expr("graft_l2norm(v)").as("native"),
      sqrt(expr("aggregate(v, cast(0.0 as double), (a, x) -> a + x * x)")).as("fold"))
    assert(both.filter(col("native") =!= col("fold")).count() === 0)
  }

  test("null and empty-array semantics") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),
      (None, Some(Seq(1.0))),
      (Some(Seq.empty[Double]), Some(Seq.empty[Double])))
      .toDF("a", "b")
    val out = df.select(expr("graft_dot(a, b)").as("d"), expr("graft_l2norm(a)").as("n")).collect()
    assert(out(0).getDouble(0) === 11.0)
    assert(out(0).getDouble(1) === math.sqrt(5.0))
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
    assert(out(2).getDouble(0) === 0.0)
  }

  test("quantized ANN (q85) tracks the exact-cosine ranking on this corpus") {
    // int8 codes carry ~1/255-step error — enough to swap near-tied tail
    // ranks but far below the top-1 gaps on this corpus. Pin the
    // deterministic agreement: the nearest neighbor matches exactly for
    // every query, and at least 2 of each top-3 coincide (observed: 23/24
    // positions agree; the one miss is a rank-3 near-tie).
    val d = "/root/testdata/sf0.001"
    def topk(name: String, k: Int) = graft.SparkEntry.queries(name)(spark, d)
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk").collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq).toMap
    val exact = topk("q32_ann_bruteforce", 3)
    val quant = topk("q85_ann_quantized", 3)
    assert(quant.keySet === exact.keySet)
    exact.foreach { case (q, nbrs) =>
      assert(quant(q).head === nbrs.head,
        s"query $q: quantized top-1 ${quant(q).head} != exact ${nbrs.head}")
      assert((nbrs.toSet & quant(q).toSet).size >= 2,
        s"query $q: quantized top-3 ${quant(q)} diverged from exact $nbrs")
    }
  }

  test("graft_lsh8 matches the interpreted plane/fold formulation bit-for-bit") {
    // The exact expression graft_lsh8 replaced (q33/q40's original bucket):
    // 8 sign bits over ordered per-plane folds with the seedless integer
    // planes (p*97 + d*13) % 7 - 3.
    val foldExpr =
      """aggregate(sequence(0, 7), 0,
        |  (acc, p) -> acc + if(
        |    aggregate(zip_with(embedding, transform(sequence(0, size(embedding) - 1), dd -> cast((p * 97 + dd * 13) % 7 - 3 as double)),
        |      (x, pl) -> cast(x as double) * pl), cast(0.0 as double), (a, v) -> a + v) > 0,
        |    shiftleft(1, p), 0))""".stripMargin
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val both = e.select(
      expr("graft_lsh8(embedding)").as("native"),
      expr(foldExpr).as("fold"))
    assert(both.filter(col("native") =!= col("fold")).count() === 0)
    // double input path agrees with the float path (float→double is exact)
    val dbl = e.select(
      expr("graft_lsh8(embedding)").as("f"),
      expr("graft_lsh8(cast(embedding as array<double>))").as("d"))
    assert(dbl.filter(col("f") =!= col("d")).count() === 0)
    // buckets spread: 500 vectors over 256 buckets must not collapse
    val distinct = e.select(expr("graft_lsh8(embedding)")).distinct().count()
    assert(distinct > 50, s"suspiciously few LSH buckets: $distinct")
  }

  test("expressions run inside whole-stage codegen (no interpreted fallback)") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(expr("graft_dot(cast(embedding as array<double>), cast(embedding as array<double>))").as("d"))
    val codegen = e.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators fused into a WholeStageCodegen stage
    assert(codegen.matches("(?s).*\\*\\(\\d+\\) Project \\[graft_dot.*"),
      s"graft_dot not inside a codegen stage:\n$codegen")
    assert(e.count() === 500)
  }
}
