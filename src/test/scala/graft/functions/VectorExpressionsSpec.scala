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

  test("graft_lsh(v, n) refines: higher bit-counts subdivide lower ones") {
    // Plane p depends only on p, so the first 8 planes of a 12-bit bucket
    // are exactly the 8-bit bucket: lsh(v,12) & 255 == lsh8(v).
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val refine = e.select(
      expr("graft_lsh(embedding, 12)").as("b12"),
      expr("graft_lsh8(embedding)").as("b8"))
    assert(refine.filter((col("b12").bitwiseAND(lit(255))) =!= col("b8")).count() === 0)
  }

  test("hash-family planes (p >= 8) are pairwise distinct and disjoint from the legacy ones") {
    // The legacy linear family (p*97 + d*13) % 7 - 3 is periodic in p with
    // period 7 (any polynomial in p is, mod 7) — plane 7 even duplicates
    // plane 0 inside the oracle-pinned 8-bit family (so graft_lsh8 carries 7
    // informative bits; baked into the oracles, harmless for correctness).
    // Planes 8+ therefore come from a multiplicative-hash family; extending
    // the linear one would have made every extra bit a verbatim copy and the
    // scale knob a no-op.
    def weight(p: Int, d: Int): Int =
      if (p < 8) (p * 97 + d * 13) % 7 - 3
      else (((p * 2654435761L + d * 40503L) >>> 16) % 7L).toInt - 3
    val legacy = (0 until 8).map(p => (0 until 64).map(d => weight(p, d)))
    val hashed = (8 until 24).map(p => (0 until 64).map(d => weight(p, d)))
    assert(legacy(7) === legacy(0))           // the documented legacy quirk
    assert(legacy.take(7).distinct.size === 7)
    assert(hashed.distinct.size === 16, "hash-family planes must be pairwise distinct")
    assert((hashed.toSet & legacy.toSet).isEmpty, "hash planes must not duplicate legacy ones")
  }

  test("bucket populations shrink as the bit-count grows (the scale knob works)") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    def stats(bits: Int): (Long, Long) = {
      val counts = e.groupBy(expr(s"graft_lsh(embedding, $bits)")).count()
      (counts.count(), counts.agg(max("count")).head().getLong(0))
    }
    val (distinct8, max8) = stats(8)
    val (distinct12, max12) = stats(12)
    assert(distinct12 >= distinct8,
      s"12-bit buckets ($distinct12) should be at least as many as 8-bit ($distinct8)")
    assert(max12 <= max8,
      s"12-bit max bucket population ($max12) should not exceed 8-bit ($max8)")
    // and strictly: on this corpus the refinement genuinely splits buckets
    assert(distinct12 > distinct8 && max12 < max8)
  }

  test("graft_lsh null-element semantics: any null element clears every bit") {
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0, 3.0)),
      (2L, Seq[java.lang.Double](1.0, null, 3.0)))
      .toDF("id", "v")
    val out = df.select(col("id"), expr("graft_lsh(v, 8)").as("b"),
      // the interpreted fold the expression claims parity with: a null
      // element nulls the per-plane aggregate, if(null,..,0) clears the bit
      expr(
        """aggregate(sequence(0, 7), 0,
          |  (acc, p) -> acc + if(
          |    aggregate(zip_with(v, transform(sequence(0, size(v) - 1), dd -> cast((p * 97 + dd * 13) % 7 - 3 as double)),
          |      (x, pl) -> x * pl), cast(0.0 as double), (a, w) -> a + w) > 0,
          |    shiftleft(1, p), 0))""".stripMargin).as("fold"))
      .collect().sortBy(_.getLong(0))
    assert(out(0).getInt(1) === out(0).getInt(2)) // clean row: parity
    assert(out(1).getInt(1) === 0)                // null element: all bits clear
    assert(out(1).getInt(2) === 0)                // matches the fold
  }

  test("graft_lsh rejects non-foldable or out-of-range bit-counts") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings").limit(1)
    intercept[org.apache.spark.sql.AnalysisException] {
      e.select(expr("graft_lsh(embedding, 31)")).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      e.select(expr("graft_lsh(embedding, 0)")).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      e.select(expr("graft_lsh(embedding, cast(vec_id as int))")).collect()
    }
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
