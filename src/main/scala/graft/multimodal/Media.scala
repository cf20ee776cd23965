package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, per the large-scale-pipeline brief. The Spark-side
  * plumbing — schema, ingestion via the binaryFile source, partition-size
  * management, batched per-partition processing (the Scala analog of
  * mapInPandas batching) — is real and tested. METADATA decode is real
  * for all three kinds: images (JPEG/PNG/GIF/BMP dimensions via the
  * JDK's javax.imageio), audio (WAV/AIFF/AU via javax.sound.sampled;
  * MP3 duration/rate/channels via a frame-header parse), and MP4/MOV +
  * MKV/WebM video (duration + dimensions via ISO-BMFF box / EBML tree
  * parses) — see Containers.scala for the pure byte-format parsers. Only the
  * sample/frame DECODE step (pixels/PCM) is a STUB (no codec libraries
  * in this container or the JDK), implemented as a deterministic
  * byte-statistics fake, clearly marked below.
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
      duration_ms: Option[Long], sample_rate: Option[Int],
      channels: Option[Int], feature: Array[Float], bin_sums: Array[Long])

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

  /** REAL audio decode: WAV/AIFF/AU container + PCM metadata via the
    * JDK's javax.sound.sampled — like imageio, shipped with the JDK, no
    * external libraries. Returns (duration_ms, sample_rate, channels);
    * None for undecodable bytes or non-audio kinds. Compressed codecs
    * (MP3/AAC) have no JDK decoder and remain behind the stub boundary
    * below. */
  private[multimodal] def decodeAudioMeta(bytes: Array[Byte])
      : Option[(Long, Int, Int)] =
    if (bytes == null || bytes.isEmpty) None
    else try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val frames = in.getFrameLength
        if (frames <= 0 || fmt.getFrameRate <= 0) None
        else Some((
          (frames * 1000.0 / fmt.getFrameRate).toLong,
          fmt.getSampleRate.toInt, fmt.getChannels))
      } finally in.close()
    } catch {
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
    // feature: float accumulation (the decoder stand-in); bin_sums: the
    // same 16 positional bins in EXACT integer arithmetic — the form an
    // engine-external oracle can recompute bit-identically (float += is
    // order- and rounding-dependent; integer sums are not).
    val feat = new Array[Float](16)
    val bins = new Array[Long](16)
    i = 0
    while (i < n) {
      val b = bytes(i) & 0xff
      feat(i % 16) += b / 255.0f
      bins(i % 16) += b
      i += 1
    }
    // Metadata is real across all three kinds: images via JDK imageio,
    // uncompressed audio via JDK javax.sound, MP3 and ADTS AAC via
    // frame-header parse, MP4/MOV video via ISO-BMFF box parse
    // (Containers.scala) — all pure public byte formats, no codec
    // library needed.
    val dims0 = if (kind == "image") decodeImageDims(bytes) else None
    val audio = if (kind == "audio")
      decodeAudioMeta(bytes)
        .orElse(Containers.parseMp3(bytes).map(m => (m.durationMs, m.sampleRate, m.channels)))
        .orElse(Containers.parseAacAdts(bytes).map(m => (m.durationMs, m.sampleRate, m.channels)))
    else None
    val video: Option[(Long, Option[Int], Option[Int])] = if (kind == "video")
      Containers.parseMp4(bytes).map(m => (m.durationMs, m.width, m.height))
        .orElse(Containers.parseMkv(bytes).map(m => (m.durationMs, m.width, m.height)))
    else None
    val dims = dims0.orElse(for (v <- video; w <- v._2; h <- v._3) yield (w, h))
    val durationMs = audio.map(_._1).orElse(video.map(_._1))
    /* ======================= STUB BOUNDARY =======================
     * Only the sample/frame DECODE step (H.264/VP9 pixels, AAC/MP3 PCM)
     * remains stubbed — no such codec exists in this container or the
     * JDK. The byte-statistics `feature` vector above is its
     * deterministic stand-in with the same shape/contract a real
     * decoder-backed extractor would fill. Swap at deploy time.
     * ===================== END STUB BOUNDARY ===================== */
    MediaFeatures(id, kind, n, mean, ent, dims.map(_._1), dims.map(_._2),
      durationMs, audio.map(_._2), audio.map(_._3), feat, bins)
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
