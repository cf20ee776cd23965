package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import java.nio.ByteBuffer

/** Container-header parsers on hand-built byte fixtures: every field is
  * constructed at a known offset per the public specs (ISO/IEC 14496-12
  * box layout, ISO/IEC 11172-3 frame headers), so the expected values
  * are first-principles, not parser echoes. */
class ContainersSpec extends AnyFunSuite {

  // ---- MP4 fixture builders ----
  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + payload.length)
    bb.putInt(8 + payload.length)
    bb.put(typ.getBytes("US-ASCII"))
    bb.put(payload)
    bb.array()
  }
  private def mvhdV0(timescale: Int, duration: Int): Array[Byte] = {
    val p = ByteBuffer.allocate(100) // version+flags, times, ts, dur, rest zeroed
    p.putInt(12, timescale)
    p.putInt(16, duration)
    box("mvhd", p.array())
  }
  private def mvhdV1(timescale: Int, duration: Long): Array[Byte] = {
    val p = ByteBuffer.allocate(112)
    p.put(0, 1.toByte) // version 1: 64-bit times
    p.putInt(20, timescale)
    p.putLong(24, duration)
    box("mvhd", p.array())
  }
  private def tkhdV0(w: Int, h: Int): Array[Byte] = {
    val p = ByteBuffer.allocate(84)
    p.putInt(76, w << 16) // 16.16 fixed point
    p.putInt(80, h << 16)
    box("tkhd", p.array())
  }
  private def ftyp: Array[Byte] =
    box("ftyp", "isom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 1) ++ "isom".getBytes("US-ASCII"))

  test("MP4: mvhd v0 duration + first visual tkhd dimensions") {
    // timescale 600, duration 3000 ticks -> 5000 ms; 640x360 video track
    val mp4 = ftyp ++ box("moov",
      mvhdV0(600, 3000) ++ box("trak", tkhdV0(640, 360)))
    val m = Containers.parseMp4(mp4)
    assert(m === Some(Containers.Mp4Meta(5000L, Some(640), Some(360))))
  }

  test("MP4: mvhd v1 (64-bit duration), audio-only track has no dims") {
    // timescale 90000, duration 90000*7 -> 7000 ms; tkhd w=h=0 (audio)
    val mp4 = ftyp ++ box("moov",
      mvhdV1(90000, 90000L * 7) ++ box("trak", tkhdV0(0, 0)))
    val m = Containers.parseMp4(mp4)
    assert(m === Some(Containers.Mp4Meta(7000L, None, None)))
  }

  test("MP4: mvhd v1 overflow-hostile durations are rejected, not garbled") {
    // duration is attacker-controlled unsigned 64-bit: a top-bit value
    // reads negative through the signed Long, and duration * 1000 past
    // Long.MaxValue/1000 overflows — both must be None, never a
    // negative/garbage durationMs (the defensive-parser contract).
    assert(Containers.parseMp4(
      ftyp ++ box("moov", mvhdV1(90000, Long.MinValue))) === None)
    assert(Containers.parseMp4(
      ftyp ++ box("moov", mvhdV1(90000, Long.MaxValue / 1000 + 1))) === None)
    // the boundary-safe maximum still parses exactly
    assert(Containers.parseMp4(
      ftyp ++ box("moov", mvhdV1(1000, Long.MaxValue / 1000))) ===
      Some(Containers.Mp4Meta(Long.MaxValue / 1000, None, None)))
  }

  test("MP4: first VISUAL track wins (audio tkhd with zero dims skipped)") {
    val mp4 = ftyp ++ box("moov",
      mvhdV0(1000, 1500) ++ box("trak", tkhdV0(0, 0)) ++ box("trak", tkhdV0(1920, 1080)))
    val m = Containers.parseMp4(mp4)
    assert(m === Some(Containers.Mp4Meta(1500L, Some(1920), Some(1080))))
  }

  test("MP4: junk, truncation, and missing moov are all None") {
    assert(Containers.parseMp4(null) === None)
    assert(Containers.parseMp4(Array.fill[Byte](64)(0x2a)) === None)
    assert(Containers.parseMp4(ftyp) === None) // no moov
    val good = ftyp ++ box("moov", mvhdV0(600, 3000) ++ box("trak", tkhdV0(4, 3)))
    // tail truncation cuts the tkhd but not the mvhd: graceful partial
    // metadata (duration, no dims), never a crash or an out-of-bounds read
    assert(Containers.parseMp4(good.take(good.length - 30)) ===
      Some(Containers.Mp4Meta(5000L, None, None)))
    // truncation inside the mvhd itself -> nothing parseable
    assert(Containers.parseMp4(good.take(40)) === None)
    // random bytes that don't start with a signature box type
    val evil = Array.tabulate[Byte](256)(i => (i * 37).toByte)
    assert(Containers.parseMp4(evil) === None)
  }

  // ---- MKV/EBML fixture builders ----
  private def beBytes(v: Long): Array[Byte] = {
    // minimal big-endian encoding (EBML uints are variable length)
    val full = ByteBuffer.allocate(8).putLong(v).array()
    val skip = full.indexWhere(_ != 0) match { case -1 => 7; case i => i }
    full.drop(skip)
  }
  private def el(id: Long, payload: Array[Byte]): Array[Byte] = {
    require(payload.length < 127)
    beBytes(id) ++ Array((0x80 | payload.length).toByte) ++ payload
  }
  private def mkv(timestampScaleNs: Long, durationTicks: Float,
      w: Int, h: Int): Array[Byte] = {
    val info = el(0x1549A966L,
      el(0x2AD7B1L, beBytes(timestampScaleNs)) ++
        el(0x4489L, ByteBuffer.allocate(4).putFloat(durationTicks).array()))
    val video = el(0xE0L, el(0xB0L, beBytes(w)) ++ el(0xBAL, beBytes(h)))
    val tracks = el(0x1654AE6BL, el(0xAEL, video))
    el(0x1A45DFA3L, Array.empty[Byte]) ++ el(0x18538067L, info ++ tracks)
  }

  test("MKV: duration from Duration x TimestampScale, dims from the video track") {
    // 5000 ticks at the default 1e6 ns/tick -> 5000 ms, 1280x720
    val m = Containers.parseMkv(mkv(1000000L, 5000.0f, 1280, 720))
    assert(m === Some(Containers.MkvMeta(5000L, Some(1280), Some(720))))
    // non-default scale: 2000 ticks x 2e6 ns = 4000 ms
    val m2 = Containers.parseMkv(mkv(2000000L, 2000.0f, 320, 240))
    assert(m2 === Some(Containers.MkvMeta(4000L, Some(320), Some(240))))
  }

  test("MKV: unknown-size Segment (streamed file) extends to end of buffer") {
    val body = mkv(1000000L, 1500.0f, 64, 48)
    // rewrite the Segment's 1-byte size to the all-ones 'unknown' vint
    val segOff = el(0x1A45DFA3L, Array.empty[Byte]).length
    val sizeOff = segOff + 4 // segment id is 4 bytes
    val streamed = body.clone()
    streamed(sizeOff) = 0xff.toByte
    val m = Containers.parseMkv(streamed)
    assert(m === Some(Containers.MkvMeta(1500L, Some(64), Some(48))))
  }

  test("MKV: junk and truncation are None or partial, never a crash") {
    assert(Containers.parseMkv(null) === None)
    assert(Containers.parseMkv(Array.fill[Byte](64)(0x3c)) === None)
    val good = mkv(1000000L, 5000.0f, 1280, 720)
    // cutting into the Tracks element degrades dims but keeps duration
    assert(Containers.parseMkv(good.take(good.length - 8))
      .exists(_.durationMs === 5000L),
      "duration must survive a tail cut into Tracks")
    // cutting into Info loses everything parseable
    assert(Containers.parseMkv(good.take(12)) === None)
  }

  // ---- MP3 fixture builders: MPEG1 Layer III @44100 ----
  // header: FF FB (sync+MPEG1+L3), bitrate idx 9 = 128 kbps, sr idx 0,
  // no padding; channel mode in the top 2 bits of byte 3.
  private def mp3Frame(mono: Boolean, fill: Byte = 0): Array[Byte] = {
    val len = 144 * 128000 / 44100 // = 417
    val f = Array.fill[Byte](len)(fill)
    f(0) = 0xff.toByte
    f(1) = 0xfb.toByte
    f(2) = 0x90.toByte
    f(3) = (if (mono) 0xc0 else 0x00).toByte
    f
  }

  test("MP3 CBR: rate/channels/bitrate from the header, duration from size*8/bitrate") {
    val bytes = mp3Frame(mono = true) ++ mp3Frame(mono = true) ++ mp3Frame(mono = true)
    val m = Containers.parseMp3(bytes).get
    assert(m.sampleRate === 44100)
    assert(m.channels === 1)
    assert(m.bitrateKbps === 128)
    assert(m.durationMs === bytes.length * 8L / 128) // 1251*8/128 = 78 ms
  }

  test("MP3 VBR: Xing frame count wins over the CBR estimate") {
    // Xing tag sits after the 4-byte header + 17 bytes of mono side info
    val first = mp3Frame(mono = true)
    val bb = ByteBuffer.wrap(first)
    bb.position(4 + 17)
    bb.put("Xing".getBytes("US-ASCII"))
    bb.putInt(1)    // flags: frames present
    bb.putInt(100)  // 100 frames
    val bytes = first ++ mp3Frame(mono = true)
    val m = Containers.parseMp3(bytes).get
    assert(m.durationMs === 100L * 1152 * 1000 / 44100) // 2612 ms
  }

  test("MP3: stereo mode, ID3v2 skip, and junk rejection") {
    val stereo = mp3Frame(mono = false) ++ mp3Frame(mono = false)
    assert(Containers.parseMp3(stereo).get.channels === 2)
    // ID3v2 header: "ID3" vv f + syncsafe size 20 + 20 bytes of tag junk
    val id3 = "ID3".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0, 0, 0, 0, 20) ++
      Array.fill[Byte](20)(0x55)
    val m = Containers.parseMp3(id3 ++ stereo).get
    assert(m.sampleRate === 44100 && m.channels === 2)
    assert(Containers.parseMp3(null) === None)
    assert(Containers.parseMp3(Array.fill[Byte](1000)(0x41)) === None)
    // a lone 0xFFE sync with garbage after it must NOT parse (the
    // two-consecutive-frames rule)
    val fake = Array.fill[Byte](1000)(0x11)
    fake(50) = 0xff.toByte; fake(51) = 0xfb.toByte; fake(52) = 0x90.toByte
    assert(Containers.parseMp3(fake) === None)
  }

  // ---- ADTS AAC fixture builders: header fields at first-principles
  // bit offsets (ISO/IEC 14496-3): FF F1/F0 sync+layer00+protection,
  // AAC-LC profile, sfIdx at byte2 bits 5-2, channel config straddling
  // bytes 2/3, 13-bit frame length straddling bytes 3-5, raw-data-block
  // count minus one in byte 6's low 2 bits.
  private def adtsFrame(sfIdx: Int, chanCfg: Int, payload: Int,
      rawBlocks: Int = 1, crc: Boolean = false): Array[Byte] = {
    val hdr = if (crc) 9 else 7
    val len = hdr + payload
    val f = Array.tabulate[Byte](len)(i => (i * 31).toByte)
    f(0) = 0xff.toByte
    f(1) = (0xf0 | (if (crc) 0 else 1)).toByte
    f(2) = ((1 << 6) | (sfIdx << 2) | ((chanCfg >> 2) & 1)).toByte
    f(3) = (((chanCfg & 3) << 6) | ((len >> 11) & 3)).toByte
    f(4) = ((len >> 3) & 0xff).toByte
    f(5) = (((len & 7) << 5) | 0x1f).toByte // buffer-fullness bits: junk
    f(6) = (0xfc | (rawBlocks - 1)).toByte
    f
  }

  test("ADTS AAC: rate/channels from the header, duration from frame-hop sample count") {
    // two stereo 44100 frames, 1024 samples each -> 2048*1000/44100 = 46 ms
    val bytes = adtsFrame(4, 2, 13) ++ adtsFrame(4, 2, 21)
    assert(Containers.parseAacAdts(bytes) ===
      Some(Containers.AacMeta(46L, 44100, 2)))
    // multiple raw data blocks per frame each contribute 1024 samples
    val multi = adtsFrame(11, 1, 13, rawBlocks = 4) ++ adtsFrame(11, 1, 9, rawBlocks = 4)
    assert(Containers.parseAacAdts(multi) ===
      Some(Containers.AacMeta(8192L * 1000 / 8000, 8000, 1)))
  }

  test("ADTS AAC: CRC headers, 5.1 config, ID3v2 skip") {
    val crc = adtsFrame(4, 6, 13, crc = true) ++ adtsFrame(4, 6, 13, crc = true)
    assert(Containers.parseAacAdts(crc) === Some(Containers.AacMeta(46L, 44100, 6)))
    val id3 = "ID3".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0, 0, 0, 0, 20) ++
      Array.fill[Byte](20)(0x55)
    assert(Containers.parseAacAdts(id3 ++ adtsFrame(4, 2, 13) ++ adtsFrame(4, 2, 13)) ===
      Some(Containers.AacMeta(46L, 44100, 2)))
  }

  test("ADTS AAC: junk, lone syncs, reserved fields, truncation all defend") {
    assert(Containers.parseAacAdts(null) === None)
    assert(Containers.parseAacAdts(Array.fill[Byte](500)(0x41)) === None)
    // a valid first frame followed by garbage (not end-of-buffer): the
    // two-consecutive-frames rule rejects the stray-sync false positive
    assert(Containers.parseAacAdts(
      adtsFrame(4, 2, 13) ++ Array.fill[Byte](64)(0x2a)) === None)
    // reserved sampling index (13) and PCE channel config (0) reject
    assert(Containers.parseAacAdts(adtsFrame(13, 2, 13) ++ adtsFrame(13, 2, 13)) === None)
    assert(Containers.parseAacAdts(adtsFrame(4, 0, 13) ++ adtsFrame(4, 0, 13)) === None)
    // layer bits must be 00: flip one and the sync check fails
    val badLayer = adtsFrame(4, 2, 13) ++ adtsFrame(4, 2, 13)
    badLayer(1) = (badLayer(1) | 0x06).toByte
    assert(Containers.parseAacAdts(badLayer) === None)
    // a truncated FINAL frame ends the walk: only the whole frames count
    val cut = adtsFrame(4, 2, 13) ++ adtsFrame(4, 2, 13) ++ adtsFrame(4, 2, 200).take(30)
    assert(Containers.parseAacAdts(cut) === Some(Containers.AacMeta(46L, 44100, 2)))
  }
}
