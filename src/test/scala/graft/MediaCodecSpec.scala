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
  }

  test("sniff classifies magic bytes and is safe on short input") {
    assert(MediaCodecs.sniff(Array(0x89.toByte, 'P', 'N', 'G')) === "png")
    assert(MediaCodecs.sniff(Array(0xff.toByte, 0xd8.toByte, 0xff.toByte,
      0xe0.toByte)) === "jpeg")
    assert(MediaCodecs.sniff("GIF89a".getBytes("US-ASCII")) === "gif")
    assert(MediaCodecs.sniff("BMxxxx".getBytes("US-ASCII")) === "bmp")
    assert(MediaCodecs.sniff(Array.emptyByteArray) === "unknown")
    assert(MediaCodecs.sniff("P7 ".getBytes("US-ASCII")) === "unknown")
    assert(MediaCodecs.sniff("RIFFxxxxAVI ".getBytes("US-ASCII"))
      === "unknown")
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
