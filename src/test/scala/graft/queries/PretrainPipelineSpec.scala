package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q115 composition properties beyond the corpus oracle: its survivor set
  * must be exactly q95's stage-5 population, its global rank a permutation,
  * and its running symbol sum internally consistent — plus partitioning
  * invariance across shuffle-partition settings (the GlobalRank prefix-sum
  * path has its own bucket boundaries to get wrong). */
class PretrainPipelineSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q115: survivors = q95 stage 5; rank is a permutation; cum sum consistent") {
    val out = PipelineOps.queries("q115_pretrain_pipeline")(spark, sf).collect()
    val s5 = PipelineOps.queries("q95_quality_funnel")(spark, sf).collect()
      .find(_.getInt(0) == 5).get.getLong(2)
    assert(out.length.toLong === s5, "one plan row per gate-surviving doc")
    val rns = out.map(_.getLong(2)).sorted.toSeq
    assert(rns === (1L to out.length.toLong), "rn is a contiguous permutation")
    val byRn = out.sortBy(_.getLong(2))
    var cum = 0L
    byRn.foreach { r =>
      cum += r.getLong(3) // n_symbols
      assert(r.getLong(4) === cum, s"cum_symbols at rn=${r.getLong(2)}")
      assert(r.getLong(5) === (cum - r.getLong(3)) / 2048L, "pack_bin")
      assert(r.getLong(6) === (cum - r.getLong(3)) % 2048L, "bin_offset")
    }
  }

  test("q115: plan identical under a different shuffle partition count") {
    val run1 = PipelineOps.queries("q115_pretrain_pipeline")(spark, sf).collect().toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val run2 = PipelineOps.queries("q115_pretrain_pipeline")(spark, sf).collect().toSeq
      assert(run1.map(_.toSeq) === run2.map(_.toSeq))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
