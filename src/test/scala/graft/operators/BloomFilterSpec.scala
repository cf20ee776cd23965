package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BloomFilterSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("SQL mightContain tests exactly the bits the builder set (hash parity)") {
    import spark.implicits._
    val keys = (1L to 500L).map(_ * 7919L)
    val bmRow = keys.toDF("k").agg(BloomFilter.agg(col("k")).as("bm"))
    val bm = bmRow.head().getSeq[Long](0).toArray
    // every inserted key passes both the Scala and the SQL test
    val sqlHits = keys.toDF("k").crossJoin(bmRow)
      .filter(BloomFilter.mightContain(col("bm"), col("k")))
      .count()
    assert(sqlHits == keys.size, "false negative in SQL membership test")
    assert(keys.forall(BloomFilter.contains(bm, _, 3)))
    // probes agree bit-for-bit between Scala and SQL on non-members too
    val probes = (1L to 2000L).map(_ * 104729L + 13L)
    val sqlSet = probes.toDF("k").crossJoin(bmRow)
      .filter(BloomFilter.mightContain(col("bm"), col("k")))
      .select(col("k")).as[Long].collect().toSet
    probes.foreach { p =>
      assert(BloomFilter.contains(bm, p, 3) == sqlSet.contains(p),
        s"Scala/SQL membership disagree for $p")
    }
    // an 8 KB filter holding 500 keys must reject most random probes
    assert(sqlSet.size < probes.size / 2, s"no pruning power: ${sqlSet.size}")
  }

  test("bloom semi join returns exactly the plain semi join") {
    val build = Tables(spark, d, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val probe = Tables(spark, d, "lineitem")
    val bloom = BloomFilter.semiJoin(probe, "l_orderkey", build, "o_orderkey")
    val plain = probe.join(build.select(col("o_orderkey").as("l_orderkey")),
      Seq("l_orderkey"), "left_semi")
    assert(bloom.count() == plain.count())
    assert(bloom.exceptAll(plain).isEmpty && plain.exceptAll(bloom).isEmpty)
  }
}
