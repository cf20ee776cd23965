package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class MediaSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_media")
    (0 until 5).foreach { i =>
      val bytes = Array.tabulate[Byte](100 + i * 37)(j => ((i * 31 + j * 7) % 256).toByte)
      Files.write(Paths.get(d.toString, s"asset_$i.jpg"), bytes)
    }
    Files.write(Paths.get(d.toString, "ignore.txt"), Array[Byte](1, 2, 3))
    d.toString
  }

  test("binaryFile ingestion: glob filter, ids, opaque content, meta struct") {
    val media = Media.ingest(spark, dir, "image", glob = "*.jpg")
    assert(media.count() === 5)
    assert(media.schema("content").dataType.typeName === "binary")
    assert(media.select("meta.format").distinct().head().getString(0) === "jpg")
    assert(media.select("media_id").distinct().count() === 5)
  }

  test("batched mapPartitions feature extraction: stable shapes and values") {
    implicit val s = spark
    val media = Media.ingest(spark, dir, "image", glob = "*.jpg")
    val feats = Media.extractFeatures(media, batchSize = 2).collect()
    assert(feats.length === 5)
    feats.foreach { f =>
      assert(f.feature.length === 16)
      assert(f.n_bytes >= 100)
      assert(f.byte_entropy >= 0.0 && f.byte_entropy <= 8.0)
      assert(f.byte_mean >= 0.0 && f.byte_mean <= 255.0)
    }
    // deterministic: same input → same features
    val again = Media.extractFeatures(media, batchSize = 3).collect()
    assert(feats.sortBy(_.media_id).map(_.byte_mean).toSeq ===
      again.sortBy(_.media_id).map(_.byte_mean).toSeq)
  }

  test("frame sampling plan explodes metadata without decoding") {
    import spark.implicits._
    val vids = Seq((1L, "video", 3500L), (2L, "video", 999L), (3L, "image", 0L))
      .toDF("media_id", "kind", "duration_ms")
      .select(col("media_id"), col("kind"),
        struct(lit("mp4").as("format"), lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height"), col("duration_ms")).as("meta"))
    val plan = Media.sampleFramePlan(vids, everyMs = 1000L)
    val byId = plan.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(1L) === 4) // 0,1000,2000,3000
    assert(byId(2L) === 1) // 0
    assert(!byId.contains(3L)) // images not sampled
  }
}
