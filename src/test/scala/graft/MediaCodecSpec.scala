package graft

import graft.functions.MediaCodecs
import graft.operators.MultimodalOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayOutputStream

/** The REAL media decoders on REAL media bytes: hand-assembled PCM WAV
  * and binary PPM/PGM payloads with known ground truth, plus the hostile
  * inputs (truncation, lying size fields, wrong format tags) a crawl
  * always contains. Also pins the JVM sniff against the SQL hex-prefix
  * sniff through the registered mapPartitions pipeline.
  */
class MediaCodecSpec extends AnyFunSuite {
  import TestSpark._

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Assemble a valid PCM16 WAV from samples (mono unless told otherwise),
    * optionally inserting an unknown chunk before fmt to prove the walker
    * skips it.
    */
  private def wav(samples: Seq[Int], channels: Int = 1, rate: Int = 8000,
      extraChunk: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val data = samples.flatMap(le16).toArray
    val junk = if (extraChunk) "LIST".getBytes("US-ASCII") ++ le32(3) ++
      Array[Byte](1, 2, 3, 0) // odd size 3 → 1 pad byte (RIFF alignment)
    else Array.emptyByteArray
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++
      le16(channels) ++ le32(rate) ++ le32(rate.toLong * channels * 2) ++
      le16(channels * 2) ++ le16(16)
    val dataCk = "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
    val body = "WAVE".getBytes("US-ASCII") ++ junk ++ fmt ++ dataCk
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(body.length))
    out.write(body)
    out.toByteArray
  }

  /** Assemble a binary PPM/PGM with a comment line in the header. */
  private def pnm(kind: String, w: Int, h: Int, px: Seq[Int]): Array[Byte] =
    (s"$kind\n# spec fixture\n$w $h\n255\n").getBytes("US-ASCII") ++
      px.map(_.toByte).toArray

  test("WAV decode recovers exact header fields and amplitude stats") {
    val samples = Seq(0, 1000, -1000, 32767, -32768, 5)
    val got = MediaCodecs.decodeWav(wav(samples)).get
    assert(got.channels === 1)
    assert(got.sampleRate === 8000)
    assert(got.bits === 16)
    assert(got.nSamples === 6L)
    assert(got.sumAbs === 0L + 1000 + 1000 + 32767 + 32768 + 5)
  }

  test("wavEnergyWindows: exact per-window squared-amplitude sums, " +
      "short tail window, and totality on non-16-bit / hostile bytes") {
    val samples = Seq(0, 1000, -1000, 32767, -32768, 5, 7)
    val got = MediaCodecs.wavEnergyWindows(wav(samples), window = 3).get
    def sq(xs: Seq[Int]) = xs.map(x => x.toLong * x).sum
    assert(got === Seq(
      (sq(Seq(0, 1000, -1000)), 3L),
      (sq(Seq(32767, -32768, 5)), 3L),
      (sq(Seq(7)), 1L))) // the tail window carries its true count
    // windows partition the stream
    assert(got.map(_._2).sum === samples.length.toLong)
    // the extra LIST chunk shifts the data offset - the re-walk follows
    val withJunk = MediaCodecs.wavEnergyWindows(
      wav(samples, extraChunk = true), window = 3).get
    assert(withJunk === got)
    // totality: garbage and truncated bytes give None, never a throw
    assert(MediaCodecs.wavEnergyWindows("nope".getBytes, 4).isEmpty)
    assert(MediaCodecs.wavEnergyWindows(wav(samples).take(20), 4).isEmpty)
  }

  test("WAV chunk walk skips unknown odd-sized chunks with padding") {
    val got = MediaCodecs.decodeWav(wav(Seq(7, -7), channels = 2,
      rate = 44100, extraChunk = true)).get
    assert(got.channels === 2)
    assert(got.sampleRate === 44100)
    assert(got.nSamples === 2L)
    assert(got.sumAbs === 14L)
  }

  test("hostile WAV inputs return None, never throw") {
    val good = wav(Seq(1, 2, 3))
    // truncation at every prefix length must be safe
    (0 until good.length).foreach { n =>
      MediaCodecs.decodeWav(good.take(n)) // must not throw
    }
    assert(MediaCodecs.decodeWav(good.take(20)).isEmpty)
    // a lying chunk size that points past the buffer
    val lying = good.clone()
    lying(16) = 0x7f.toByte // fmt chunk size low byte → enormous
    assert(MediaCodecs.decodeWav(lying).isEmpty)
    // non-PCM format tag
    val nonPcm = good.clone()
    nonPcm(20) = 3 // IEEE float tag
    assert(MediaCodecs.decodeWav(nonPcm).isEmpty)
    assert(MediaCodecs.decodeWav("RIFF".getBytes("US-ASCII")).isEmpty)
  }

  test("PPM decode recovers dimensions and exact per-channel sums") {
    // 2×2 RGB: pixels (1,2,3)(4,5,6)(7,8,9)(250,251,252)
    val got = MediaCodecs.decodePnm(pnm("P6", 2, 2,
      Seq(1, 2, 3, 4, 5, 6, 7, 8, 9, 250, 251, 252))).get
    assert(got.kind === "ppm")
    assert((got.width, got.height, got.maxval) === ((2, 2, 255)))
    assert(got.sumR === 1L + 4 + 7 + 250)
    assert(got.sumG === 2L + 5 + 8 + 251)
    assert(got.sumB === 3L + 6 + 9 + 252)
  }

  test("PGM decode fills a single channel; malformed PNM returns None") {
    val got = MediaCodecs.decodePnm(pnm("P5", 3, 1, Seq(10, 20, 30))).get
    assert(got.kind === "pgm")
    assert(got.sumR === 60L)
    assert((got.sumG, got.sumB) === ((0L, 0L)))
    // truncated pixel data
    assert(MediaCodecs.decodePnm(pnm("P6", 2, 2, Seq(1, 2, 3))).isEmpty)
    // 16-bit maxval is out of scope for the raw-byte reader
    assert(MediaCodecs.decodePnm(
      "P6\n1 1\n65535\nxx".getBytes("US-ASCII")).isEmpty)
    // header ints that never terminate
    assert(MediaCodecs.decodePnm("P6 99999999999".getBytes("US-ASCII")).isEmpty)
    // the single byte after maxval must BE whitespace: an out-of-spec
    // 'P5 2 2 255X<pixels>' would otherwise decode with every pixel read
    // shifted one byte yet still report decoded — total but not faithful
    assert(MediaCodecs.decodePnm(
      ("P5 2 2 255X" + "").getBytes("US-ASCII")).isEmpty)
    assert(MediaCodecs.decodePnm(
      ("P5 2 2 255\n" + "").getBytes("US-ASCII"))
      .get.sumR === 10L)
  }

  test("sniff classifies magic bytes and is safe on short input") {
    assert(MediaCodecs.sniff(Array(0x89.toByte, 'P', 'N', 'G')) === "png")
    assert(MediaCodecs.sniff(Array(0xff.toByte, 0xd8.toByte, 0xff.toByte,
      0xe0.toByte)) === "jpeg")
    assert(MediaCodecs.sniff("GIF89a".getBytes("US-ASCII")) === "gif")
    assert(MediaCodecs.sniff("BMxxxx".getBytes("US-ASCII")) === "bmp")
    assert(MediaCodecs.sniff(Array.emptyByteArray) === "unknown")
    assert(MediaCodecs.sniff("P7 ".getBytes("US-ASCII")) === "unknown")
    // the JVM sniff accepts EXACTLY the four whitespace bytes the SQL
    // hex-prefix sniff accepts (20/0A/09/0D) — Character.isWhitespace's
    // wider set (0x0B vertical tab, 0x0C, 0x1C-0x1F) must NOT classify,
    // or the two paths would drift on the same payload
    assert(MediaCodecs.sniff(Array('P'.toByte, '5'.toByte, 0x0B.toByte))
      === "unknown")
    assert(MediaCodecs.sniff(Array('P'.toByte, '6'.toByte, 0x0C.toByte))
      === "unknown")
    assert(MediaCodecs.sniff(Array('P'.toByte, '5'.toByte, 0x0D.toByte,
      '1'.toByte)) === "pnm")
    assert(MediaCodecs.sniff("RIFFxxxxAVI ".getBytes("US-ASCII"))
      === "unknown")
  }

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  test("image header parsers recover exact dimensions per format") {
    import MediaCodecs.{imageDims, ImageDims}
    val png = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte) ++ be32(13) ++ "IHDR".getBytes("US-ASCII") ++
      be32(640) ++ be32(480) ++ Array[Byte](8, 2, 0, 0, 0)
    assert(imageDims(png) === Some(ImageDims("png", 640, 480)))
    // JPEG: SOI, APP0 (JFIF-ish), a COM, then SOF0 with dims
    val jpeg = Array(0xff, 0xd8).map(_.toByte) ++
      Array(0xff, 0xe0).map(_.toByte) ++ be16(7) ++
        "JFIF ".getBytes("US-ASCII") ++
      Array(0xff, 0xfe).map(_.toByte) ++ be16(4) ++ "hi".getBytes ++
      Array(0xff, 0xc0).map(_.toByte) ++ be16(11) ++ Array[Byte](8) ++
        be16(1080) ++ be16(1920) ++ Array[Byte](3, 0, 0, 0)
    assert(imageDims(jpeg) === Some(ImageDims("jpeg", 1920, 1080)))
    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](0x20, 0x03, 0x58, 0x02) // 800×600 little-endian
    assert(imageDims(gif) === Some(ImageDims("gif", 800, 600)))
    val bmp = "BM".getBytes("US-ASCII") ++ new Array[Byte](12) ++
      Array[Byte](40, 0, 0, 0) ++
      Array[Byte](0x40, 0x01, 0, 0) ++ // width 320
      Array[Byte](0x10.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte) // -240
    assert(imageDims(bmp) === Some(ImageDims("bmp", 320, 240)),
      "top-down BMP height is reported as magnitude")
  }

  test("image header parsers are total on malformed headers") {
    import MediaCodecs.imageDims
    val pngBad = Array(0x89, 'P', 'N', 'G', 0, 0, 0, 0).map(_.toByte) ++
      be32(13) ++ "IDAT".getBytes("US-ASCII") ++ be32(1) ++ be32(1)
    assert(imageDims(pngBad).isEmpty, "first chunk must be IHDR")
    // JPEG whose marker stream hits EOI before any SOF
    val noSof = Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)
    assert(imageDims(noSof).isEmpty)
    // truncated mid-marker must not throw
    val jpegTrunc = Array(0xff, 0xd8, 0xff, 0xc0, 0x00).map(_.toByte)
    assert(imageDims(jpegTrunc).isEmpty)
    assert(imageDims("GIF89a".getBytes("US-ASCII")).isEmpty)
    assert(imageDims("not an image".getBytes("US-ASCII")).isEmpty)
  }

  /** Assemble a valid GIF89a with `frames` single-pixel images and an
    * optional graphic-control extension per frame.
    */
  private def gif(frames: Int, withExt: Boolean = true): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(Array[Byte](1, 0, 1, 0, 0, 0, 0)) // 1×1, no global table
    (1 to frames).foreach { _ =>
      if (withExt) // graphic control: 0x21 0xF9, one 4-byte sub-block
        out.write(Array(0x21, 0xf9, 4, 0, 0, 0, 0, 0).map(_.toByte))
      out.write(Array(0x2c, 0, 0, 0, 0, 1, 0, 1, 0, 0).map(_.toByte))
      out.write(Array[Byte](2)) // LZW min code size
      out.write(Array[Byte](1, 0x44, 0)) // one 1-byte sub-block + end
    }
    out.write(0x3b)
    out.toByteArray
  }

  test("gifFrames counts image descriptors without LZW decode") {
    assert(MediaCodecs.gifFrames(gif(1)) === Some(1))
    assert(MediaCodecs.gifFrames(gif(3)) === Some(3))
    assert(MediaCodecs.gifFrames(gif(2, withExt = false)) === Some(2))
    // truncated before the trailer / desynchronized → None, no throw
    val g = gif(2)
    (0 until g.length).foreach(n => MediaCodecs.gifFrames(g.take(n)))
    assert(MediaCodecs.gifFrames(g.take(g.length - 1)).isEmpty)
    val bad = g.clone(); bad(13) = 0x7e // neither 0x21/0x2C/0x3B
    assert(MediaCodecs.gifFrames(bad).isEmpty)
  }

  test("audioEnergyWindows pipeline emits exact window features for " +
      "WAV assets and silently no rows for undecodable payloads") {
    import TestSpark.spark.implicits._
    val rows = Seq(
      (1L, wav(Seq(3, -4, 5, 12))),
      (2L, "not audio at all".getBytes)).toDF("asset_id", "payload")
    val got = graft.api.Graft
      .audioEnergyWindows(rows, "asset_id", "payload", window = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq === Seq(
      (1L, 0L, 25L, 2L, math.sqrt(25.0 / 2)), // 3² + (−4)²
      (1L, 1L, 169L, 2L, math.sqrt(169.0 / 2)))) // 5² + 12²
  }

  test("aHash bands: a half-bright PGM sets exactly the bright columns") {
    // 8×8 PGM, left half 0 / right half 200: one pixel per cell, mean
    // 100 → bits set for x ∈ 4..7 in every row. Each 16-bit band packs
    // two rows → positions 4-7 and 12-15 → 0xF0F0 in all four bands.
    val px = (0 until 64).map(p => if (p % 8 >= 4) 200 else 0)
    val bands = MediaCodecs.pnmAHashBands(pnm("P5", 8, 8, px)).get
    assert(bands.toSeq === Seq.fill(4)(0xF0F0L))
    // brightening corner pixel (0,0) to 255 flips exactly bit 0 of
    // band 0: 255·64 > (6400+255)·1
    val px2 = 255 +: px.tail
    val bands2 = MediaCodecs.pnmAHashBands(pnm("P5", 8, 8, px2)).get
    assert(bands2.toSeq === Seq(0xF0F1L, 0xF0F0L, 0xF0F0L, 0xF0F0L))
    assert(bands.zip(bands2)
      .map { case (a, b) => java.lang.Long.bitCount(a ^ b) }.sum === 1)
  }

  test("aHash bands: PPM luma is the channel sum; grid 4 packs one band") {
    // 4×4 P6, all pixels (10,10,10) except (1,1) = (200,200,200):
    // grid 4 → one pixel per cell, only cell k = 1·4+1 = 5 above mean
    val px = (0 until 16).flatMap(p =>
      if (p == 5) Seq(200, 200, 200) else Seq(10, 10, 10))
    val bands = MediaCodecs.pnmAHashBands(pnm("P6", 4, 4, px), grid = 4).get
    assert(bands.toSeq === Seq(1L << 5))
  }

  test("phash pair pipeline: identical payloads pair at hamming 0, " +
      "garbage is skipped") {
    import TestSpark.spark.implicits._
    val img = (0 until 64).map(p => if (p % 8 >= 4) 200 else 0)
    val other = (0 until 64).map(p => if (p % 8 < 4) 200 else 0)
    val rows = Seq(
      (1L, pnm("P5", 8, 8, img)), (2L, pnm("P5", 8, 8, img)),
      (3L, pnm("P5", 8, 8, other)),
      (4L, "not an image".getBytes("US-ASCII")))
      .toDF("id", "payload")
    val got = graft.api.Graft.imageNearDup(TestSpark.spark, rows,
      "id", "payload").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      === Seq((1L, 2L, 0L)))
  }

  test("registered phash query: variant pairs land within the threshold " +
      "and nothing else") {
    val rows = graft.operators.MultimodalOps
      .phashNearDup(TestSpark.spark, "/root/testdata/sf0.001").collect()
    // one pair per nation: (2k, 2k+1), measured hamming 0–3
    assert(rows.length === 25)
    assert(rows.forall(r => r.getLong(1) === r.getLong(0) + 1
      && r.getLong(0) % 2 === 0))
    assert(rows.forall(r => r.getLong(2) <= 3))
  }

  test("registered audio-energy query: in-engine WAV synthesis decodes to " +
      "the 256/256/88 window grid with the formula's exact energies") {
    val rows = graft.operators.MultimodalOps
      .audioEnergy(TestSpark.spark, "/root/testdata/sf0.001").collect()
    assert(rows.length === 18) // 6 assets × 3 windows
    // window layout: 600 samples at window 256 ⇒ 256, 256, 88
    assert(rows.map(r => (r.getLong(1), r.getLong(3))).distinct.sorted.toSeq
      === Seq((0L, 256L), (1L, 256L), (2L, 88L)))
    // driver-side replay of the sample formula for one mid-grid cell
    val want = (256 until 512).map { i =>
      val v = ((3L * 131 + i * 17) % 4096) - 2048; v * v
    }.sum
    val cell = rows.find(r => r.getLong(0) == 3L && r.getLong(1) == 1L).get
    assert(cell.getLong(2) === want)
  }

  test("the decode pipeline carries GIF frame counts through feat_c") {
    import TestSpark.spark.implicits._
    val rows = Seq((1L, gif(3))).toDF("asset_id", "payload")
    val r = MultimodalOps.decodeMediaOn(spark, rows).collect().head
    assert((r.getString(1), r.getBoolean(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) === (("gif", true, 1L, 1L, 3L)))
  }

  test("the decode pipeline routes wav/pnm/garbage rows correctly") {
    import TestSpark.spark.implicits._
    val rows = Seq(
      (1L, wav(Seq(100, -100, 50))),
      (2L, pnm("P6", 1, 2, Seq(9, 8, 7, 6, 5, 4))),
      (3L, "not media at all".getBytes("UTF-8")),
      (4L, wav(Seq(1)).take(30))) // sniffs wav, fails decode
      .toDF("asset_id", "payload")
    val got = MultimodalOps.decodeMediaOn(spark, rows).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got(1L) === (("wav", true, 1L, 3L, 250L)))
    assert(got(2L) === (("pnm", true, 2L, 39L, 255L)))
    assert(got(3L) === (("unknown", false, 0L, 0L, 0L)))
    assert(got(4L) === (("wav", false, 0L, 0L, 0L)))
  }

  test("JVM sniff and the SQL hex-prefix sniff agree on the corpus") {
    import TestSpark.spark.implicits._
    val sqlCounts = MultimodalOps.formatSniff(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val jvmCounts = Tables.documents(spark, sf)
      .select(col("text").cast("binary").as("b")).as[Array[Byte]]
      .map(MediaCodecs.sniff).groupBy("value").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sqlCounts === jvmCounts)
  }
}
