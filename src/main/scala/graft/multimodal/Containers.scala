package graft.multimodal

/** Pure byte-format container-header parsers for media the JDK has no
  * decoder for: MP4 (ISO BMFF boxes, ISO/IEC 14496-12) and MP3 (MPEG
  * audio frame headers, ISO/IEC 11172-3). Duration, dimensions, sample
  * rate and channel count live in PUBLIC container/frame headers and
  * need no codec — parsing them here shrinks Media's stub boundary to
  * the actual sample/frame DECODE step.
  *
  * All parsers are defensive: any malformed, truncated, or non-matching
  * byte sequence returns None (one bad blob must not fail a partition
  * task), and all reads are bounds-checked. Pure functions on
  * Array[Byte] — trivially executor-side and unit-testable without
  * Spark.
  */
object Containers {

  final case class Mp4Meta(durationMs: Long, width: Option[Int], height: Option[Int])
  final case class Mp3Meta(durationMs: Long, sampleRate: Int, channels: Int, bitrateKbps: Int)

  // ---- big-endian readers, all bounds-checked ----
  private def u8(b: Array[Byte], o: Int): Int = b(o) & 0xff
  private def u16(b: Array[Byte], o: Int): Int = (u8(b, o) << 8) | u8(b, o + 1)
  private def u32(b: Array[Byte], o: Int): Long =
    ((u8(b, o).toLong << 24) | (u8(b, o + 1) << 16) | (u8(b, o + 2) << 8) | u8(b, o + 3)) & 0xffffffffL
  private def u64(b: Array[Byte], o: Int): Long =
    (u32(b, o) << 32) | u32(b, o + 4)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Walk ISO BMFF boxes in b[start, end): (type, payloadStart, payloadEnd). */
  private def boxes(b: Array[Byte], start: Long, end: Long): Iterator[(String, Long, Long)] =
    new Iterator[(String, Long, Long)] {
      private var o = start
      def hasNext: Boolean = o + 8 <= end
      def next(): (String, Long, Long) = {
        val size = u32(b, o.toInt)
        val typ = fourcc(b, o.toInt + 4)
        val (payloadStart, boxEnd) =
          if (size == 1L && o + 16 <= end) (o + 16, o + u64(b, o.toInt + 8))
          else if (size == 0L) (o + 8, end)     // box extends to end of file
          else (o + 8, o + size)
        // malformed size (overlapping/zero advance/overflow) → stop the walk
        val safeEnd = if (boxEnd <= o + 8 || boxEnd > end) end else boxEnd
        val out = (typ, payloadStart, safeEnd)
        o = if (boxEnd <= o + 8 || boxEnd > end) end else boxEnd
        out
      }
    }

  /** MP4/MOV metadata from the `moov` box: duration/timescale from
    * `mvhd`, presentation dimensions (16.16 fixed point) from the first
    * visual `tkhd`. Header-only — no sample data touched. */
  def parseMp4(b: Array[Byte]): Option[Mp4Meta] = {
    if (b == null || b.length < 16) return None
    // An MP4 starts with a well-formed box whose type is one of the
    // signature top-level types (ftyp almost always first).
    val top = boxes(b, 0L, b.length.toLong).toSeq
    if (!top.exists(_._1 == "moov") ||
        !top.headOption.exists(t => Set("ftyp", "moov", "free", "skip", "mdat", "wide").contains(t._1)))
      return None
    val (_, moovStart, moovEnd) = top.find(_._1 == "moov").get

    var durationMs: Option[Long] = None
    var dims: Option[(Int, Int)] = None
    boxes(b, moovStart, moovEnd).foreach {
      case ("mvhd", ps, pe) if durationMs.isEmpty =>
        val p = ps.toInt
        val v = if (pe - ps >= 1) u8(b, p) else -1
        if (v == 0 && pe - ps >= 20) {
          val timescale = u32(b, p + 12)
          val duration = u32(b, p + 16)
          if (timescale > 0) durationMs = Some(duration * 1000L / timescale)
        } else if (v == 1 && pe - ps >= 32) {
          val timescale = u32(b, p + 20)
          val duration = u64(b, p + 24)
          // duration is an attacker-controlled unsigned 64-bit field read
          // into a signed Long: a top-bit value arrives negative, and
          // duration * 1000 can overflow into garbage. Both violate the
          // defensive-parser contract → no duration rather than a lie.
          if (timescale > 0 && duration >= 0 && duration <= Long.MaxValue / 1000)
            durationMs = Some(duration * 1000L / timescale)
        }
      case ("trak", ps, pe) if dims.isEmpty =>
        boxes(b, ps, pe).foreach {
          case ("tkhd", tps, tpe) if dims.isEmpty =>
            val p = tps.toInt
            val v = if (tpe - tps >= 1) u8(b, p) else -1
            // v0 body is 84 bytes (width at 76, height at 80); v1 is 96
            // (8-byte times push them to 88/92). Width/height are 16.16
            // fixed point; audio tracks carry zeros — skip those.
            val (wo, ho) =
              if (v == 0 && tpe - tps >= 84) (p + 76, p + 80)
              else if (v == 1 && tpe - tps >= 96) (p + 88, p + 92)
              else (-1, -1)
            if (wo >= 0) {
              val w = (u32(b, wo) >> 16).toInt
              val h = (u32(b, ho) >> 16).toInt
              if (w > 0 && h > 0) dims = Some((w, h))
            }
          case _ =>
        }
      case _ =>
    }
    durationMs.map(d => Mp4Meta(d, dims.map(_._1), dims.map(_._2)))
  }

  final case class MkvMeta(durationMs: Long, width: Option[Int], height: Option[Int])

  /** EBML variable-length integer at offset o: the first byte's leading
    * zeros give the length; element IDs keep the marker bit (they are
    * defined with it), sizes strip it. None on malformed/truncated. */
  private def vint(b: Array[Byte], o: Int, keepMarker: Boolean): Option[(Long, Int)] = {
    if (o >= b.length) return None
    val first = b(o) & 0xff
    if (first == 0) return None // >8-byte vint: not a valid id/size here
    val len = Integer.numberOfLeadingZeros(first) - 23
    if (o + len > b.length) return None
    var v: Long = if (keepMarker) first.toLong else (first & (0xff >>> len)).toLong
    var i = 1
    while (i < len) { v = (v << 8) | (b(o + i) & 0xff); i += 1 }
    Some((v, len))
  }

  /** Child elements of an EBML master element body: (id, payloadStart,
    * payloadEnd). An all-ones size (unknown length — streamed files use it
    * for Segment) extends to the enclosing end. Malformed data stops the
    * walk — partial metadata beats a crash. */
  private def ebmlChildren(b: Array[Byte], start: Long, end: Long): Seq[(Long, Long, Long)] = {
    val out = Seq.newBuilder[(Long, Long, Long)]
    var o = start
    var ok = true
    while (ok && o < end) {
      val parsed = for {
        (id, idLen) <- vint(b, o.toInt, keepMarker = true)
        (sz, szLen) <- vint(b, (o + idLen).toInt, keepMarker = false)
      } yield (id, sz, szLen, idLen + szLen)
      parsed match {
        case Some((id, sz, szLen, hdr)) =>
          val ps = o + hdr
          val unknown = sz == (1L << (7 * szLen)) - 1
          val pe = if (unknown) end else math.min(end, ps + sz)
          if (ps > end) ok = false
          else { out += ((id, ps, pe)); o = if (unknown) end else pe }
        case None => ok = false
      }
    }
    out.result()
  }

  private def ebmlUint(b: Array[Byte], ps: Long, pe: Long): Long = {
    var v = 0L
    var i = ps
    while (i < pe && i - ps < 8) { v = (v << 8) | (b(i.toInt) & 0xff); i += 1 }
    v
  }
  private def ebmlFloat(b: Array[Byte], ps: Long, pe: Long): Option[Double] =
    (pe - ps) match {
      case 4 => Some(java.lang.Float.intBitsToFloat(ebmlUint(b, ps, pe).toInt).toDouble)
      case 8 => Some(java.lang.Double.longBitsToDouble(ebmlUint(b, ps, pe)))
      case _ => None
    }

  // EBML element IDs (stored form, marker bit included)
  private val EbmlMagic = 0x1A45DFA3L
  private val Segment = 0x18538067L
  private val Info = 0x1549A966L
  private val TimestampScale = 0x2AD7B1L
  private val DurationId = 0x4489L
  private val Tracks = 0x1654AE6BL
  private val TrackEntry = 0xAEL
  private val VideoEl = 0xE0L
  private val PixelWidth = 0xB0L
  private val PixelHeight = 0xBAL

  /** MKV/WebM metadata from the EBML tree (RFC 8794 + the public Matroska
    * element registry): duration = Info/Duration (float ticks) ×
    * Info/TimestampScale (ns/tick, default 10⁶), dimensions from the
    * first TrackEntry/Video's PixelWidth/PixelHeight. Header-only — no
    * Cluster/sample data touched; unknown-size Segments (streamed files)
    * extend to end-of-buffer. */
  def parseMkv(b: Array[Byte]): Option[MkvMeta] = {
    if (b == null || b.length < 8) return None
    if (u32(b, 0) != EbmlMagic) return None
    ebmlChildren(b, 0L, b.length.toLong).find(_._1 == Segment).flatMap { case (_, ss, se) =>
      var scaleNs = 1000000L
      var durTicks: Option[Double] = None
      var w: Option[Int] = None
      var h: Option[Int] = None
      ebmlChildren(b, ss, se).foreach {
        case (Info, ps, pe) =>
          ebmlChildren(b, ps, pe).foreach {
            case (TimestampScale, ips, ipe) => scaleNs = ebmlUint(b, ips, ipe)
            case (DurationId, ips, ipe) => durTicks = ebmlFloat(b, ips, ipe)
            case _ =>
          }
        case (Tracks, ps, pe) if w.isEmpty =>
          for {
            (id1, tps, tpe) <- ebmlChildren(b, ps, pe) if id1 == TrackEntry
            (id2, vps, vpe) <- ebmlChildren(b, tps, tpe) if id2 == VideoEl
            (id3, ips, ipe) <- ebmlChildren(b, vps, vpe)
          } id3 match {
            case PixelWidth if w.isEmpty => w = Some(ebmlUint(b, ips, ipe).toInt)
            case PixelHeight if h.isEmpty => h = Some(ebmlUint(b, ips, ipe).toInt)
            case _ =>
          }
        case _ =>
      }
      durTicks.map(d => MkvMeta((d * scaleNs / 1e6).toLong, w, h))
    }
  }

  // MPEG audio tables (Layer III only — the overwhelmingly common case;
  // Layer I/II return None). Index 0 = MPEG1, 1 = MPEG2, 2 = MPEG2.5.
  private val SampleRates = Array(
    Array(44100, 48000, 32000),
    Array(22050, 24000, 16000),
    Array(11025, 12000, 8000))
  private val BitratesL3Mpeg1 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val BitratesL3Mpeg2 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  private final case class Mp3Frame(
      mpegIdx: Int, bitrateKbps: Int, sampleRate: Int, channels: Int,
      frameLen: Int, samplesPerFrame: Int)

  private def parseFrameHeader(b: Array[Byte], o: Int): Option[Mp3Frame] = {
    if (o + 4 > b.length) return None
    if (u8(b, o) != 0xff || (u8(b, o + 1) & 0xe0) != 0xe0) return None
    val versionBits = (u8(b, o + 1) >> 3) & 3   // 3=MPEG1 2=MPEG2 0=MPEG2.5
    val layerBits = (u8(b, o + 1) >> 1) & 3     // 1=Layer III
    if (layerBits != 1 || versionBits == 1) return None
    val mpegIdx = versionBits match { case 3 => 0; case 2 => 1; case _ => 2 }
    val brIdx = (u8(b, o + 2) >> 4) & 15
    val srIdx = (u8(b, o + 2) >> 2) & 3
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None // free-format/invalid
    val padding = (u8(b, o + 2) >> 1) & 1
    val channels = if (((u8(b, o + 3) >> 6) & 3) == 3) 1 else 2
    val kbps = if (mpegIdx == 0) BitratesL3Mpeg1(brIdx) else BitratesL3Mpeg2(brIdx)
    val sr = SampleRates(mpegIdx)(srIdx)
    val spf = if (mpegIdx == 0) 1152 else 576
    val len = spf / 8 * kbps * 1000 / sr + padding
    if (len <= 4) None
    else Some(Mp3Frame(mpegIdx, kbps, sr, channels, len, spf))
  }

  /** Bytes to skip for a leading ID3v2 tag ("ID3" + version(2) + flags(1)
    * + syncsafe u28 size) — both MP3 and ADTS AAC streams commonly carry
    * one. 0 when absent. */
  private def id3v2Skip(b: Array[Byte]): Int =
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val sz = ((u8(b, 6) & 0x7f) << 21) | ((u8(b, 7) & 0x7f) << 14) |
        ((u8(b, 8) & 0x7f) << 7) | (u8(b, 9) & 0x7f)
      10 + sz
    } else 0

  /** MP3 metadata from the first valid frame header: sample rate,
    * channel mode, bitrate; duration from the Xing/Info frame count when
    * present (VBR-exact), else the CBR estimate audio_bytes·8/bitrate.
    * Skips a leading ID3v2 tag (syncsafe length). Requires TWO
    * consecutive valid frame headers so random byte blobs that happen to
    * contain 0xFFE somewhere don't parse. */
  def parseMp3(b: Array[Byte]): Option[Mp3Meta] = {
    if (b == null || b.length < 4) return None
    val audioStart = id3v2Skip(b)
    if (audioStart + 4 > b.length) return None
    // Scan a bounded window for the first sync'd frame whose SUCCESSOR is
    // also a valid frame (or lands exactly at end-of-buffer).
    val scanEnd = math.min(b.length - 4, audioStart + 4096)
    var off = audioStart
    var found: Option[(Int, Mp3Frame)] = None
    while (off <= scanEnd && found.isEmpty) {
      parseFrameHeader(b, off) match {
        case Some(f) =>
          val nxt = off + f.frameLen
          if (nxt == b.length || parseFrameHeader(b, nxt).isDefined)
            found = Some((off, f))
          else off += 1
        case None => off += 1
      }
    }
    found.map { case (start, f) =>
      // Xing/Info tag (VBR): after the side info — MPEG1: 17 (mono) / 32
      // (stereo) bytes; MPEG2/2.5: 9 / 17 — plus the 4-byte header.
      val sideInfo =
        if (f.mpegIdx == 0) { if (f.channels == 1) 17 else 32 }
        else { if (f.channels == 1) 9 else 17 }
      val tagOff = start + 4 + sideInfo
      val vbrFrames: Option[Long] =
        if (tagOff + 12 <= b.length &&
            (fourcc(b, tagOff) == "Xing" || fourcc(b, tagOff) == "Info") &&
            (u32(b, tagOff + 4) & 1L) == 1L)
          Some(u32(b, tagOff + 8))
        else None
      val durationMs = vbrFrames match {
        case Some(frames) => frames * f.samplesPerFrame * 1000L / f.sampleRate
        case None => (b.length - start).toLong * 8L / f.bitrateKbps
      }
      Mp3Meta(durationMs, f.sampleRate, f.channels, f.bitrateKbps)
    }
  }

  final case class AacMeta(durationMs: Long, sampleRate: Int, channels: Int)

  /** ISO/IEC 14496-3 sampling-frequency-index table (13 defined values;
    * 13–15 are reserved/escape → reject). */
  private val AacSampleRates = Array(96000, 88200, 64000, 48000, 44100,
    32000, 24000, 22050, 16000, 12000, 11025, 8000, 7350)
  /** channel_configuration → channel count; config 6 is 5.1 (6 ch),
    * 7 is 7.1 (8 ch); 0 means "in a PCE" which header-only parsing
    * cannot resolve → reject. */
  private val AacChannels = Array(0, 1, 2, 3, 4, 5, 6, 8)

  /** One ADTS frame header at `o`: (frameLen, sampleRate, channels,
    * samples in this frame). The 7-byte (9 with CRC) public header:
    * 12-bit 0xFFF sync, MPEG version bit (either accepted), 2 layer bits
    * (must be 00), protection-absent bit; then profile(2),
    * sampling_frequency_index(4), private(1), channel_configuration(3),
    * …, 13-bit frame length spanning bytes 3–5, and
    * number_of_raw_data_blocks−1 in byte 6 (each raw block = 1024
    * samples). */
  private def parseAdtsHeader(b: Array[Byte], o: Int): Option[(Int, Int, Int, Long)] = {
    if (o + 7 > b.length) return None
    if (u8(b, o) != 0xff || (u8(b, o + 1) & 0xf6) != 0xf0) return None
    val sfIdx = (u8(b, o + 2) >> 2) & 0xf
    if (sfIdx >= AacSampleRates.length) return None
    val chanCfg = ((u8(b, o + 2) & 1) << 2) | ((u8(b, o + 3) >> 6) & 3)
    if (chanCfg == 0) return None
    val frameLen = ((u8(b, o + 3) & 3) << 11) | (u8(b, o + 4) << 3) |
      ((u8(b, o + 5) >> 5) & 7)
    val headerLen = if ((u8(b, o + 1) & 1) == 0) 9 else 7 // CRC adds 2
    if (frameLen < headerLen) return None
    val rawBlocks = (u8(b, o + 6) & 3) + 1
    Some((frameLen, AacSampleRates(sfIdx), AacChannels(chanCfg), rawBlocks * 1024L))
  }

  /** AAC (ADTS stream) metadata from frame headers only: sample rate and
    * channel count from the first frame, duration by hopping frame
    * lengths and summing raw-data-block sample counts — exact for the
    * fully-present frames, no codec touched. Same anti-false-positive
    * rule as MP3: the first frame's SUCCESSOR must also parse (or the
    * frame must end exactly at end-of-buffer), so random blobs containing
    * a stray 0xFFFx don't parse. A truncated or corrupt tail ends the
    * walk gracefully — metadata reflects the valid prefix. */
  def parseAacAdts(b: Array[Byte]): Option[AacMeta] = {
    if (b == null || b.length < 7) return None
    val start = id3v2Skip(b)
    if (start + 7 > b.length) return None
    parseAdtsHeader(b, start).flatMap { case (len0, sr, ch, _) =>
      val secondOk = start + len0 == b.length ||
        parseAdtsHeader(b, start + len0).isDefined
      if (!secondOk) None
      else {
        var off = start
        var samples = 0L
        var walking = true
        while (walking && off + 7 <= b.length) {
          parseAdtsHeader(b, off) match {
            case Some((len, _, _, smp)) if off + len <= b.length =>
              samples += smp; off += len
            case _ => walking = false
          }
        }
        Some(AacMeta(samples * 1000L / sr, sr, ch))
      }
    }
  }
}
