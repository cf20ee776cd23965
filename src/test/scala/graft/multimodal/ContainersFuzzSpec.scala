package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Randomized robustness for the byte-format parsers, complementing
  * ContainersSpec's first-principles fixtures: over arbitrary byte
  * blobs — pure noise, magic-prefixed noise (the paths that reach deep
  * parser code), and truncations — every parser must be TOTAL: return
  * None or Some, never throw (the defensive-parser contract the mvhd
  * overflow advisory was about). Seeded, deterministic.
  */
class ContainersFuzzSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(1234)

  private def noise(n: Int): Array[Byte] = {
    val a = new Array[Byte](n); rnd.nextBytes(a); a
  }

  /** Magic prefixes steering blobs into each parser's deep path. */
  private val magics: Seq[Array[Byte]] = Seq(
    Array[Byte]('I', 'D', '3'),                                   // ID3v2
    Array[Byte](0xff.toByte, 0xfb.toByte),                        // MP3 sync
    Array[Byte](0xff.toByte, 0xf1.toByte),                        // ADTS sync
    Array[Byte](0x1a, 0x45, 0xdf.toByte, 0xa3.toByte),            // EBML
    Array[Byte](0, 0, 0, 0x18, 'f', 't', 'y', 'p'),               // MP4 ftyp
    Array[Byte](0, 0, 0, 0x08, 'm', 'v', 'h', 'd'),               // bare box
    Array[Byte](0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte))

  private def allParsers(b: Array[Byte]): Unit = {
    Containers.parseMp4(b)
    Containers.parseMkv(b)
    Containers.parseMp3(b)
    Containers.parseAacAdts(b)
  }

  test("parsers are total on noise, magic-prefixed noise, and truncations") {
    (0 until 200).foreach { i =>
      val blob = noise(rnd.nextInt(512))
      allParsers(blob)
      val prefixed = magics(i % magics.length) ++ blob
      allParsers(prefixed)
      // every truncation of a prefixed blob — the bounds-check gauntlet
      Seq(0, 1, 2, 3, 4, 7, 9, 10, prefixed.length / 2).foreach { k =>
        allParsers(prefixed.take(k))
      }
    }
    // adversarial sizes: huge declared box/tag lengths over tiny buffers
    val hugeBox = Array[Byte](0x7f, -1, -1, -1, 'm', 'o', 'o', 'v') ++ noise(16)
    val negBox = Array[Byte](-1, -1, -1, -1, 'm', 'o', 'o', 'v') ++ noise(16)
    val hugeId3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0x7f, 0x7f, 0x7f, 0x7f) ++
      noise(8)
    Seq(hugeBox, negBox, hugeId3).foreach(allParsers)
    allParsers(Array.emptyByteArray)
    assert(Containers.parseMp3(null) === None)
  }

  test("noise never satisfies the two-consecutive-frames rule") {
    // 0xFFE syncs occur in noise, but a VALID successor frame at the
    // exact computed offset should be vanishingly rare — the rule that
    // keeps random blobs from parsing as audio. 400 blobs, zero parses.
    val parsed = (0 until 400).count { _ =>
      Containers.parseMp3(noise(256)).isDefined ||
        Containers.parseAacAdts(noise(256)).isDefined
    }
    assert(parsed === 0, s"$parsed random blobs parsed as audio")
  }

  test("adversarial unicode byte sequences: total, deterministic, sane columns") {
    // Real-world metadata blocks (ID3 text frames, MKV strings) carry
    // encoded text; adversarial encodings must neither throw nor skew
    // the derived numeric columns: UTF-8/UTF-16 BOMs, overlong
    // encodings, lone-surrogate UTF-8 (CESU-style ED A0 80), NUL runs.
    val unicodeSalts: Seq[Array[Byte]] = Seq(
      Array(0xef, 0xbb, 0xbf).map(_.toByte),             // UTF-8 BOM
      Array(0xfe, 0xff).map(_.toByte),                   // UTF-16 BE BOM
      Array(0xff, 0xfe).map(_.toByte),                   // UTF-16 LE BOM
      Array(0xc0, 0x80).map(_.toByte),                   // overlong NUL
      Array(0xed, 0xa0, 0x80).map(_.toByte),             // lone surrogate
      Array[Byte](0, 0, 0, 0),                           // NUL run
      Array(0xf4, 0x90, 0x80, 0x80).map(_.toByte))       // > U+10FFFF
    val rnd2 = new scala.util.Random(9876)
    (0 until 120).foreach { i =>
      val salt = unicodeSalts(i % unicodeSalts.length)
      val body = {
        val a = new Array[Byte](64 + rnd2.nextInt(128)); rnd2.nextBytes(a); a
      }
      // salt placed straight after each magic (where ID3 frame text /
      // EBML doc-type strings live) and repeated through the body
      magics.foreach { m =>
        val blob = m ++ salt ++ body.grouped(16).flatMap(_ ++ salt).toArray
        val first = (Containers.parseMp4(blob), Containers.parseMkv(blob),
          Containers.parseMp3(blob), Containers.parseAacAdts(blob))
        val second = (Containers.parseMp4(blob), Containers.parseMkv(blob),
          Containers.parseMp3(blob), Containers.parseAacAdts(blob))
        assert(first === second, "non-deterministic parse")
        first._1.foreach(m4 => assert(m4.durationMs >= 0))
        first._2.foreach(mk => assert(mk.durationMs >= 0))
        first._3.foreach(m3 => assert(m3.durationMs >= 0 && m3.sampleRate > 0))
        first._4.foreach(aa => assert(aa.durationMs >= 0 && aa.sampleRate > 0))
      }
    }
  }
}
