package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, per the large-scale-pipeline brief. The Spark-side
  * plumbing — schema, ingestion via the binaryFile source, partition-size
  * management, batched per-partition processing (the Scala analog of
  * mapInPandas batching) — is real and tested. IMAGE decode is real too
  * (JPEG/PNG/GIF/BMP dimensions via the JDK's javax.imageio); only the
  * audio/video codec step is a STUB (no such libraries in this container)
  * implemented as a deterministic byte-statistics fake, clearly marked
  * below.
  */
object Media {

  /** media table schema: one row per asset, content opaque. */
  val schema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("uri", StringType, nullable = true),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))), nullable = true)))

  /** Ingest a directory of files as media rows via Spark's binaryFile
    * source (real distributed ingestion; driver never touches bytes).
    * `maxBytesPerPartition` keeps executor memory bounded for large assets —
    * at 100 TB the knob that matters is files-per-task, not rows. */
  def ingest(spark: SparkSession, dir: String, kind: String,
      glob: String = "*", maxBytesPerPartition: Long = 128L << 20): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .withColumn("media_id", xxhash64(col("path")))
      .select(
        col("media_id"), lit(kind).as("kind"), col("path").as("uri"),
        col("content"),
        struct(
          regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1).as("format"),
          lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height"),
          lit(null).cast("long").as("duration_ms")).as("meta"))

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int, byte_mean: Double,
      byte_entropy: Double, width: Option[Int], height: Option[Int],
      feature: Array[Float])

  /** REAL image decode: JPEG/PNG/GIF/BMP via the JDK's javax.imageio — no
    * external libraries needed. Returns None for undecodable bytes (or
    * non-image kinds). Runs inside the batched mapPartitions below, never
    * on the driver. */
  private[multimodal] def decodeImageDims(bytes: Array[Byte]): Option[(Int, Int)] =
    if (bytes == null || bytes.isEmpty) None
    else try {
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
        .map(img => (img.getWidth, img.getHeight))
    } catch {
      // ImageIO.read throws RuntimeExceptions (IllegalArgument, index/array
      // bounds) on corrupt or truncated headers, not just IOException — one
      // bad blob must not fail the whole partition task.
      case scala.util.control.NonFatal(_) => None
    }

  private[multimodal] def decodeOne(id: Long, kind: String, bytes: Array[Byte]): MediaFeatures = {
    val n = if (bytes == null) 0 else bytes.length
    val hist = new Array[Long](256)
    var i = 0
    var sum = 0L
    while (i < n) { val b = bytes(i) & 0xff; hist(b) += 1; sum += b; i += 1 }
    val mean = if (n == 0) 0.0 else sum.toDouble / n
    var ent = 0.0
    var j = 0
    while (j < 256) {
      if (hist(j) > 0) { val p = hist(j).toDouble / n; ent -= p * math.log(p) / math.log(2) }
      j += 1
    }
    val feat = new Array[Float](16)
    i = 0
    while (i < n) { feat(i % 16) += (bytes(i) & 0xff) / 255.0f; i += 1 }
    // Images decode for real (JDK imageio); the stub below covers only the
    // codecs this container lacks.
    val dims = if (kind == "image") decodeImageDims(bytes) else None
    /* ======================= STUB BOUNDARY =======================
     * Audio/video codecs (PCM, H.264) are not available in this
     * container; their byte-statistics features above are a deterministic
     * stand-in with the same shape/contract a real extractor would have.
     * Swap this branch for a codec-backed implementation at deploy time.
     * ===================== END STUB BOUNDARY ===================== */
    MediaFeatures(id, kind, n, mean, ent, dims.map(_._1), dims.map(_._2), feat)
  }

  /** Batched per-partition feature extraction — the Scala analog of a
    * mapInPandas UDF: rows are processed in bounded batches inside each
    * partition so a codec can amortize setup, and the iterator contract
    * keeps memory at one batch, not one partition. */
  def extractFeatures(media: DataFrame, batchSize: Int = 64)
      (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // codec setup would happen once per batch here
          batch.iterator.map { case (id, kind, bytes) => decodeOne(id, kind, bytes) }
        }
      }
  }

  /** Deterministic fixed-rate frame sampling plan for video rows: pure
    * metadata arithmetic (no decode), yielding (media_id, frame_no, offset_ms)
    * rows — the explode-shaped fan-out a real frame extractor consumes. */
  def sampleFramePlan(media: DataFrame, everyMs: Long = 1000L): DataFrame =
    media.filter(col("kind") === "video" && col("meta.duration_ms").isNotNull)
      .select(col("media_id"),
        explode(sequence(lit(0L), col("meta.duration_ms") - 1, lit(everyMs)))
          .as("offset_ms"))
      .withColumn("frame_no", (col("offset_ms") / everyMs).cast("int"))
}
