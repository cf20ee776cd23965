package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q42's two component-resolution tiers must agree: driver union-find
  * (small edge sets) vs distributed pointer-doubling propagation. */
class DupClustersSpec extends SparkSpec {
  import spark.implicits._

  private def directed(pairs: Seq[(Long, Long)]) = {
    val p = pairs.toDF("doc_a", "doc_b")
    p.union(p.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .distinct()
  }

  test("driver union-find labels every member with its component minimum") {
    // chain 1-2-3-4, triangle 10-11-12 with extra edge, isolated pair 20-21
    val edges = directed(Seq(
      (2L, 1L), (3L, 2L), (4L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L)))
    val got = PipelineOps.driverComponents(spark, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("driver and distributed tiers produce identical labels on random graphs") {
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { round =>
      // ~60 random edges over 40 nodes: multiple components, long chains,
      // duplicate edges — the shapes that trip pointer doubling.
      val pairs = Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter(p => p._1 != p._2)
      val edges = directed(pairs).localCheckpoint(true)
      val viaDriver = PipelineOps.driverComponents(spark, edges)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val viaSpark = PipelineOps.distributedComponents(edges)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaDriver === viaSpark, s"tier divergence in round $round")
    }
  }
}
