package graft.streaming

import graft.{SparkSpec, Tables}
import graft.queries.DedupOps
import org.apache.spark.sql.functions._

/** Streaming incremental dedup ≡ batch q112 on the same split: the index
  * is built once from the base corpus, the q112 "new crawl" split arrives
  * as a MULTI-micro-batch file stream (with injected in-stream id
  * duplicates), and the union of per-batch probe verdicts must equal the
  * batch query's — same probe function, so equality is by construction;
  * the spec proves the streaming plumbing (watermark id-dedup, per-batch
  * idempotent sink, state across batches) loses and invents nothing.
  */
class DedupStreamSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("multi-batch stream probe verdicts equal batch q112 verdicts") {
    val root = java.nio.file.Files.createTempDirectory("graft_dstream").toString
    val docs = Tables(spark, sf, "documents").select(col("doc_id"), col("text"))
    val base = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + col("doc_id")))

    DedupOps.buildDedupIndex(base, s"$root/index")

    // Stream input: the crawl split plus in-stream duplicates (every 4th
    // doc delivered twice — the crawler-retry shape the watermark dedup
    // must absorb), spread over 4 files → 4 micro-batches at
    // maxFilesPerTrigger=1.
    val dups = batch.filter(col("doc_id") % 20 === 0)
    batch.union(dups).repartition(4)
      .write.mode("overwrite").parquet(s"$root/in")

    DedupStream.runProbe(spark, s"$root/in", s"$root/index",
      s"$root/out", s"$root/ckpt", maxFilesPerTrigger = Some(1))

    val streamed = DedupStream.readVerdicts(spark, s"$root/out")
      .collect().map(_.toSeq).toSet
    val expected = graft.SparkEntry.queries("q112_incremental_dedup")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(streamed.size === batch.count(),
      "one verdict per unique crawl doc — in-stream dups must be absorbed")
    assert(streamed === expected,
      "streamed probe verdicts must equal batch q112 on the same split")

    // Idempotence: re-running against the same checkpoint with no new
    // files must not change the emitted verdicts.
    DedupStream.runProbe(spark, s"$root/in", s"$root/index",
      s"$root/out", s"$root/ckpt", maxFilesPerTrigger = Some(1))
    val again = DedupStream.readVerdicts(spark, s"$root/out")
      .collect().map(_.toSeq).toSet
    assert(again === expected)
  }
}
