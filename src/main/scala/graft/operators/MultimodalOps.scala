package graft.operators

import graft.{OpFamily, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.11 #66): media as opaque
  * `binary` payloads with typed metadata, flowing through decode /
  * feature-extract / frame-sample stages.
  *
  * No image/audio codecs exist in this environment, so the DECODE STEP IS A
  * STUB — a deterministic fake that derives "features" from the bytes (and
  * says so in its column names). Everything around the stub is real and
  * tested: the binary encoding, the metadata struct schema, batch chunking,
  * the per-partition typed pipeline (`mapPartitions`, the Scala analogue of
  * `mapInPandas` — one iterator per batch, arbitrary library calls inside),
  * and the aggregation topology downstream.
  *
  * Scale notes: payloads stay opaque bytes end-to-end (no row-level
  * re-encode), the decode stage is a narrow per-partition pass, and
  * frame sampling explodes bounded chunk counts — all linear, no shuffle
  * before the final keyed aggregation.
  */
object MultimodalOps extends OpFamily {

  /** documents.text re-cast as a binary payload column with a metadata
    * struct — the canonical multimodal table shape.
    */
  private def assets(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id").as("asset_id"),
        col("text").cast("binary").as("payload"),
        struct(col("lang").as("lang"), col("source").as("source"),
          col("n_chars").as("n_bytes_declared")).as("meta"))

  /** Binary metadata extraction: sizes, content hash, base64 head. */
  def binaryMeta(s: SparkSession, d: String): DataFrame =
    assets(s, d)
      .select(
        col("asset_id"),
        octet_length(col("payload")).as("n_bytes"),
        col("meta.n_bytes_declared").as("n_bytes_declared"),
        md5(col("payload")).as("content_md5"),
        substring(base64(col("payload")), 1, 24).as("b64_head"),
        col("meta.lang").as("lang"))
      .orderBy(col("asset_id"))

  /** STUB decode via typed mapPartitions: a real per-partition pipeline
    * whose "decoder" fabricates deterministic pseudo-features from the
    * payload bytes (a real decoder would link an image/audio lib here).
    */
  def decodeStub(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    assets(s, d)
      .select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // --- STUB: stands in for e.g. ImageIO.read(bytes) ---
          val fakeWidth = 64 + (bytes.length % 640)
          val fakeHeight = 64 + ((bytes.length * 7) % 480)
          val checksum = bytes.foldLeft(0L)((a, b) => a * 31 + (b & 0xff))
          (id, fakeWidth, fakeHeight, checksum)
        }
      }
      .toDF("asset_id", "stub_width", "stub_height", "byte_checksum")
      .orderBy(col("asset_id"))
  }

  /** STUB resize via typed mapPartitions: every-4th-byte subsample stands
    * in for pixel decimation (a real implementation would decode, scale
    * and re-encode here). The resized bytes are materialized inside the
    * task — proving the batch shape carries binary through — and the
    * registered output projects the size/dimension metadata, which is
    * integer arithmetic both engines replay exactly.
    */
  def resizeStub(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    assets(s, d)
      .select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val inW = 64 + (bytes.length % 640)
          val inH = 64 + ((bytes.length * 7) % 480)
          // --- STUB: stands in for decode→scale(0.5)→encode ---
          val resized = Array.tabulate(bytes.length / 4)(i => bytes(i * 4))
          (id, bytes.length, inW, inH, inW / 2, inH / 2, resized.length)
        }
      }
      .toDF("asset_id", "in_bytes", "in_w", "in_h", "out_w", "out_h",
        "resized_bytes")
      .orderBy(col("asset_id"))
  }

  /** Frame sampling: chunk each payload into fixed 32-byte frames, keep
    * every 4th frame, summarize per asset — the video-keyframe topology
    * with text bytes standing in for frames.
    */
  def frameSample(s: SparkSession, d: String): DataFrame = {
    val frames = assets(s, d)
      .select(col("asset_id"), binaryFrames32("payload").as("frames"))
      .select(col("asset_id"), posexplode(col("frames")).as(Seq("i", "frame")))
      .filter(pmod(col("i"), lit(4)) === 0)
    frames
      .groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(octet_length(col("frame"))).as("sampled_bytes"),
        min(substring(base64(col("frame")), 1, 8)).as("min_frame_b64"))
      .orderBy(col("asset_id"))
  }

  /** Decode → aggregate composition: the stub-decoded per-asset features
    * rolled up per language — the "extract features, then profile the
    * corpus" pipeline. The stub's width/height derivations are pure
    * functions of payload size, so unlike the checksum this stage IS
    * SQL-replayable and oracle-checked end-to-end through mapPartitions.
    */
  def decodeAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    assets(s, d)
      .select(col("asset_id"), col("payload"), col("meta.lang").as("lang"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        it.map { case (id, bytes, lang) =>
          // --- STUB: same fake decoder as decodeStub ---
          (id, lang, 64 + (bytes.length % 640), 64 + ((bytes.length * 7) % 480))
        }
      }
      .toDF("asset_id", "lang", "stub_width", "stub_height")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_assets"),
        sum(col("stub_width")).cast("bigint").as("sum_w"),
        (sum(col("stub_height")).cast("double") / count(lit(1))).as("avg_h"))
      .orderBy(col("lang"))
  }

  /** Container-format sniff over the binary payload: classify by magic
    * bytes (RIFF/WAVE, PNG, JPEG, GIF, BMP, PNM) and profile the corpus
    * per format — the triage pass a crawl pipeline runs BEFORE routing
    * payloads to decoders. Expressed as hex-prefix comparisons on the
    * binary column (byte-accurate in both engines, so fully
    * oracle-checked); [[graft.functions.MediaCodecs.sniff]] implements
    * the identical classification for the JVM decode path, and
    * MediaCodecSpec pins the two against each other on real media bytes.
    */
  def formatSniff(s: SparkSession, d: String): DataFrame = {
    val h = hex(col("payload"))
    val fmt = when(substring(h, 1, 8) === "52494646" &&
        substring(h, 17, 8) === "57415645", "wav")
      .when(substring(h, 1, 8) === "89504E47", "png")
      .when(substring(h, 1, 6) === "FFD8FF", "jpeg")
      .when(substring(h, 1, 8) === "47494638", "gif")
      .when(substring(h, 1, 4) === "424D", "bmp")
      .when(substring(h, 1, 2) === "50" &&
        substring(h, 3, 2).isin("35", "36") &&
        substring(h, 5, 2).isin("20", "0A", "09", "0D"), "pnm")
      .otherwise("unknown")
    assets(s, d)
      .select(col("asset_id"), octet_length(col("payload")).as("n_bytes"),
        fmt.as("format"))
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).cast("bigint").as("total_bytes"))
      .orderBy(col("format"))
  }

  /** REAL media decode over any (asset_id, payload) frame: sniff the
    * container, then run the genuine pure-JVM parsers —
    * [[graft.functions.MediaCodecs.decodeWav]] (RIFF chunk walk + PCM16
    * amplitude stats) and [[graft.functions.MediaCodecs.decodePnm]]
    * (P5/P6 header + pixel sums). Feature columns by format: wav →
    * (channels, n_samples, sum_abs_amplitude); pnm → (n_pixels,
    * sum_pixel_values, maxval); undecodable/unknown → zeros with
    * decoded=false. Malformed bytes can never throw — the decoders are
    * total — so one corrupt payload cannot kill a 100 TB decode stage.
    */
  private[graft] def decodeMediaOn(s: SparkSession, df: DataFrame): DataFrame = {
    import s.implicits._
    import graft.functions.MediaCodecs
    df.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          MediaCodecs.sniff(bytes) match {
            case "wav" => MediaCodecs.decodeWav(bytes) match {
              case Some(w) =>
                (id, "wav", true, w.channels.toLong, w.nSamples, w.sumAbs)
              case None => (id, "wav", false, 0L, 0L, 0L)
            }
            case "pnm" => MediaCodecs.decodePnm(bytes) match {
              case Some(p) => (id, "pnm", true, p.width.toLong * p.height,
                p.sumR + p.sumG + p.sumB, p.maxval.toLong)
              case None => (id, "pnm", false, 0L, 0L, 0L)
            }
            case fmt @ ("png" | "jpeg" | "gif" | "bmp") =>
              // header-only: dimensions without entropy decode; for GIF
              // the block walk also yields the animation frame count
              MediaCodecs.imageDims(bytes) match {
                case Some(dm) =>
                  val frames = if (fmt == "gif")
                    MediaCodecs.gifFrames(bytes).getOrElse(0).toLong
                  else 0L
                  (id, fmt, true, dm.width, dm.height, frames)
                case None => (id, fmt, false, 0L, 0L, 0L)
              }
            case fmt => (id, fmt, false, 0L, 0L, 0L)
          }
        }
      }
      .toDF("asset_id", "format", "decoded", "feat_a", "feat_b", "feat_c")
      .orderBy(col("asset_id"))
  }

  /** [[decodeMediaOn]] over the corpus assets (text payloads classify as
    * unknown — MediaCodecSpec proves the decoders on real WAV/PNM bytes).
    */
  def decodeMedia(s: SparkSession, d: String): DataFrame =
    decodeMediaOn(s, assets(s, d))

  /** Windowed audio ENERGY extraction over any (asset_id, payload)
    * frame — the per-asset feature table VAD/loudness/clip stages read:
    * one row per (asset, window) with the EXACT integral sum of squared
    * PCM16 amplitudes, its sample count, and the derived RMS (one sqrt
    * per window — reproducible because the sum is integer). Non-WAV /
    * non-16-bit / malformed payloads contribute no rows instead of
    * failing the stage ([[graft.functions.MediaCodecs.wavEnergyWindows]]
    * is total). Same mapPartitions shape as [[decodeMediaOn]]: per-row
    * byte parsing, no driver involvement, output linear in audio
    * length/window.
    */
  private[graft] def audioEnergyOn(s: SparkSession, df: DataFrame,
      window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window") // driver-side
    import s.implicits._
    import graft.functions.MediaCodecs
    df.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          MediaCodecs.wavEnergyWindows(bytes, window)
            .getOrElse(Seq.empty).iterator.zipWithIndex
            .map { case ((sumSq, n), w) =>
              (id, w.toLong, sumSq, n,
                math.sqrt(sumSq.toDouble / n))
            }
        }
      }
      .toDF("asset_id", "win", "sum_sq", "n_samples", "rms")
      .orderBy(col("asset_id"), col("win"))
  }

  /** REGISTERED audio path: synthesize real PCM16 WAV payloads in-engine
    * (6 assets keyed by nation, 600 deterministic samples each — header
    * hex is a plan-time constant, sample bytes come from
    * hex/lpad/unhex SQL expressions, so the binary assembly is
    * distributed row-local work, no driver bytes), then run the REAL
    * [[audioEnergyOn]] decoder over them. The DuckDB oracle never sees a
    * byte: it recomputes each window's Σv² straight from the sample
    * formula — so a hash match proves the whole encode→RIFF-parse→
    * window-sum path agrees with pure arithmetic, the strongest check a
    * binary decoder can get without codec libs (closes the r11 gap where
    * wavEnergyWindows was spec-only because the fixture corpus carries
    * no real audio payloads).
    *
    * Sample v_i = ((asset·131 + i·17) mod 4096) − 2048, window 256 ⇒
    * per-asset windows of 256/256/88 — exercising the short tail window.
    */
  def audioEnergy(s: SparkSession, d: String): DataFrame = {
    val n = 600
    // u16 little-endian of v_i as 4 hex chars; 63488 = 2^16 − 2048 maps
    // the signed sample into its two's-complement u16 image
    val h4 =
      "lpad(hex(((asset_id * 131 + i * 17) % 4096 + 63488) % 65536), 4, '0')"
    val dataHex = s"""array_join(transform(sequence(0, ${n - 1}),
        i -> concat(substring($h4, 3, 2), substring($h4, 1, 2))), '')"""
    val wavs = Tables.nation(s, d)
      .filter(col("n_nationkey") < 6)
      .select(col("n_nationkey").cast("long").as("asset_id"))
      .withColumn("payload",
        unhex(concat(lit(wavHeaderHex(n)), expr(dataHex))))
    audioEnergyOn(s, wavs, window = 256)
  }

  /** REGISTERED image path — the PPM twin of [[audioEnergy]]: binary P6
    * images synthesized in-engine (ASCII header as a plan-time hex
    * constant, RGB bytes hex-assembled per pixel from a deterministic
    * formula) run through the REAL PNM parser's header walk + channel
    * accumulation, while the oracle recomputes the per-channel sums
    * straight from the pixel formula — the hash match certifies the
    * whole encode→parse→sum path against pure arithmetic, the image
    * analogue of the audio check.
    */
  def imageChannelSums(s: SparkSession, d: String): DataFrame = {
    val (w, h) = (24, 16)
    val n = w * h
    val headerHex = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      .map(b => f"$b%02x").mkString
    def ch(mul: Int, step: Int) =
      s"lpad(hex((asset_id * $mul + p * $step) % 256), 2, '0')"
    val dataHex = s"""array_join(transform(sequence(0, ${n - 1}),
        p -> concat(${ch(7, 3)}, ${ch(11, 5)}, ${ch(13, 7)})), '')"""
    val ppms = Tables.nation(s, d)
      .filter(col("n_nationkey") < 6)
      .select(col("n_nationkey").cast("long").as("asset_id"))
      .withColumn("payload",
        unhex(concat(lit(headerHex), expr(dataHex))))
    import s.implicits._
    import graft.functions.MediaCodecs
    ppms.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          MediaCodecs.decodePnm(bytes).map(p =>
            (id, p.width.toLong, p.height.toLong, p.sumR, p.sumG, p.sumB))
        }
      }
      .toDF("asset_id", "width", "height", "sum_r", "sum_g", "sum_b")
      .orderBy(col("asset_id"))
  }

  /** PERCEPTUAL-HASH IMAGE NEAR-DUP — the image twin of the text
    * MinHash pipeline, end-to-end oracle-checked: synthesize two P6
    * variants per nation (the odd variant perturbs luma by +30 on every
    * 29th pixel — a sparse "re-encode" that leaves the 8×8 average-hash
    * within a few bits), run each payload through the REAL PNM decoder's
    * [[graft.functions.MediaCodecs.pnmAHashBands]] (header walk + cell
    * lattice + division-free mean threshold, all integer-exact), then
    * find near-dups by the standard banded-LSH shape: candidates must
    * share at least one of the four 16-bit hash bands (an equi-join on
    * (band, value) — NEVER all-pairs), and only candidates pay the
    * 64-bit hamming distance (`bit_count(xor)` per band, codegen'd
    * built-ins). The DuckDB oracle recomputes the same bands straight
    * from the pixel formula and replays the same band join — the hash
    * match certifies encode→parse→hash→block→distance against pure
    * arithmetic.
    *
    * Scale: hashes are 4 small ints per asset; the band join is the
    * same blocked candidate generation as minhash-LSH (candidates
    * bounded by band-bucket sizes, skew-bounded since a 16-bit band has
    * 65k buckets); at 100 TB the decode is a narrow per-partition pass
    * and everything downstream moves (id, 4×int) rows only. Threshold
    * hamming ≤ 6: measured on this corpus true variant pairs land at
    * 0–3 and the closest false candidate at 9.
    */
  def phashNearDup(s: SparkSession, d: String): DataFrame = {
    val (w, h) = (24, 16)
    val n = w * h
    val headerHex = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      .map(b => f"$b%02x").mkString
    def ch(mul: Int, step: Int) =
      s"lpad(hex((base * $mul + p * $step + " +
        s"(CASE WHEN v = 1 AND p % 29 = 0 THEN 30 ELSE 0 END)) % 256), 2, '0')"
    val dataHex = s"""array_join(transform(sequence(0, ${n - 1}),
        p -> concat(${ch(7, 3)}, ${ch(11, 5)}, ${ch(13, 7)})), '')"""
    val ppms = Tables.nation(s, d)
      .select(col("n_nationkey").cast("long").as("base"))
      .select(col("base"), explode(array(lit(0L), lit(1L))).as("v"))
      .select((col("base") * 2 + col("v")).as("asset_id"),
        col("base"), col("v"))
      .withColumn("payload",
        unhex(concat(lit(headerHex), expr(dataHex))))
    phashPairsOn(s, ppms, "asset_id", "payload", maxHamming = 6)
  }

  /** The [[phashNearDup]] core over ANY (id, PNM payload) frame — the
    * [[graft.api.Graft.imageNearDup]] entry: decode → 8×8 aHash bands →
    * banded candidate join → hamming ≤ `maxHamming` pairs (a, b,
    * hamming). Undecodable payloads drop out at the hash stage.
    */
  private[graft] def phashPairsOn(s: SparkSession, df: DataFrame,
      idCol: String, payloadCol: String, maxHamming: Int): DataFrame = {
    import s.implicits._
    import graft.functions.MediaCodecs
    val hashes = df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          MediaCodecs.pnmAHashBands(bytes).map(bs =>
            (id, bs(0), bs(1), bs(2), bs(3)))
        }
      }
      .toDF("asset_id", "h0", "h1", "h2", "h3")
      .localCheckpoint() // two consumers: both sides of the band join
    def banded(side: String) = hashes
      .select(col("asset_id").as(side),
        col("h0").as(s"${side}0"), col("h1").as(s"${side}1"),
        col("h2").as(s"${side}2"), col("h3").as(s"${side}3"),
        explode(array(
          struct(lit(0).as("bi"), col("h0").as("bv")),
          struct(lit(1).as("bi"), col("h1").as("bv")),
          struct(lit(2).as("bi"), col("h2").as("bv")),
          struct(lit(3).as("bi"), col("h3").as("bv")))).as("e"))
      .select(col(side), col(s"${side}0"), col(s"${side}1"),
        col(s"${side}2"), col(s"${side}3"),
        col("e.bi").as("bi"), col("e.bv").as("bv"))
    banded("a").join(banded("b"), Seq("bi", "bv"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        (expr("bit_count(a0 ^ b0) + bit_count(a1 ^ b1)") +
          expr("bit_count(a2 ^ b2) + bit_count(a3 ^ b3)"))
          .cast("long").as("hamming"))
      .distinct() // a pair may collide on several bands
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("a"), col("b"))
  }

  /** Canonical 44-byte PCM16 mono WAV header (8 kHz) as a hex literal —
    * plan-time constant; only the RIFF/data sizes depend on nSamples.
    */
  private def wavHeaderHex(nSamples: Int): String = {
    def le16(v: Int) = f"${v & 0xff}%02x${(v >> 8) & 0xff}%02x"
    def le32(v: Int) =
      le16(v & 0xffff) + le16((v >>> 16) & 0xffff)
    val dataSize = nSamples * 2
    "52494646" + le32(36 + dataSize) + "57415645" + // RIFF <sz> WAVE
      "666d7420" + le32(16) + le16(1) + le16(1) + // fmt: PCM, mono
      le32(8000) + le32(16000) + le16(2) + le16(16) + // 8 kHz, 16-bit
      "64617461" + le32(dataSize) // data <sz>
  }

  /** named payload column → array of 32-byte frames (pure SQL expression). */
  private def binaryFrames32(p: String) =
    expr(s"""transform(
        sequence(0, CAST(floor((octet_length($p) - 1) / 32) AS INT)),
        i -> substring($p, i * 32 + 1, 32))""")

  val queries = Map(
    "mm_format_sniff" -> (formatSniff _),
    "mm_decode_media" -> (decodeMedia _),
    "mm_binary_meta" -> (binaryMeta _),
    "mm_decode_stub" -> (decodeStub _),
    "mm_resize_stub" -> (resizeStub _),
    "mm_decode_agg" -> (decodeAgg _),
    "mm_audio_energy" -> (audioEnergy _),
    "mm_image_channel_sums" -> (imageChannelSums _),
    "mm_phash_pairs" -> (phashNearDup _),
    "mm_frame_sample" -> (frameSample _))

  val oracle = Map(
    "mm_phash_pairs" ->
      """WITH a AS (SELECT CAST(n_nationkey AS BIGINT) AS base FROM nation),
         assets AS (SELECT base, v, base * 2 + v AS asset_id
           FROM a, unnest([0, 1]) AS t(v)),
         px AS (SELECT asset_id, p % 24 AS x, p // 24 AS y,
             ((base * 7 + p * 3 + d) % 256) + ((base * 11 + p * 5 + d) % 256)
               + ((base * 13 + p * 7 + d) % 256) AS l
           FROM (SELECT asset_id, base, p,
               CASE WHEN v = 1 AND p % 29 = 0 THEN 30 ELSE 0 END AS d
             FROM assets, unnest(range(0, 384)) AS t(p))),
         cells AS (SELECT asset_id, (y * 8) // 16 AS cy, (x * 8) // 24 AS cx,
             CAST(sum(l) AS BIGINT) AS cs, CAST(count(*) AS BIGINT) AS cn
           FROM px GROUP BY asset_id, cy, cx),
         tot AS (SELECT asset_id, CAST(sum(cs) AS BIGINT) AS ts,
             CAST(sum(cn) AS BIGINT) AS tn
           FROM cells GROUP BY asset_id),
         bands AS (SELECT c.asset_id, (cy * 8 + cx) // 16 AS bi,
             CAST(sum(CASE WHEN cs * tn > ts * cn
               THEN 1 << ((cy * 8 + cx) % 16) ELSE 0 END) AS BIGINT) AS bv
           FROM cells c JOIN tot t ON c.asset_id = t.asset_id
           GROUP BY c.asset_id, bi),
         h AS (SELECT asset_id,
             CAST(max(CASE WHEN bi = 0 THEN bv END) AS BIGINT) AS h0,
             CAST(max(CASE WHEN bi = 1 THEN bv END) AS BIGINT) AS h1,
             CAST(max(CASE WHEN bi = 2 THEN bv END) AS BIGINT) AS h2,
             CAST(max(CASE WHEN bi = 3 THEN bv END) AS BIGINT) AS h3
           FROM bands GROUP BY asset_id),
         cand AS (SELECT DISTINCT la.asset_id AS a, lb.asset_id AS b
           FROM bands la JOIN bands lb
             ON la.bi = lb.bi AND la.bv = lb.bv
               AND la.asset_id < lb.asset_id),
         d AS (SELECT a, b,
             bit_count(xor(ha.h0, hb.h0)) + bit_count(xor(ha.h1, hb.h1))
               + bit_count(xor(ha.h2, hb.h2)) + bit_count(xor(ha.h3, hb.h3))
               AS hamming
           FROM cand JOIN h ha ON cand.a = ha.asset_id
             JOIN h hb ON cand.b = hb.asset_id)
         SELECT a, b, CAST(hamming AS BIGINT) AS hamming FROM d
         WHERE hamming <= 6 ORDER BY a, b""",
    "mm_image_channel_sums" ->
      """WITH a AS (SELECT CAST(n_nationkey AS BIGINT) AS asset_id
             FROM nation WHERE n_nationkey < 6),
         px AS (SELECT asset_id,
             (asset_id * 7 + p * 3) % 256 AS r,
             (asset_id * 11 + p * 5) % 256 AS g,
             (asset_id * 13 + p * 7) % 256 AS b
           FROM a, unnest(range(0, 384)) AS t(p))
         SELECT asset_id, CAST(24 AS BIGINT) AS width,
           CAST(16 AS BIGINT) AS height,
           CAST(sum(r) AS BIGINT) AS sum_r,
           CAST(sum(g) AS BIGINT) AS sum_g,
           CAST(sum(b) AS BIGINT) AS sum_b
         FROM px GROUP BY asset_id ORDER BY asset_id""",
    "mm_audio_energy" ->
      """WITH a AS (SELECT CAST(n_nationkey AS BIGINT) AS asset_id
             FROM nation WHERE n_nationkey < 6),
         s AS (SELECT asset_id, i,
             ((asset_id * 131 + i * 17) % 4096) - 2048 AS v
           FROM a, unnest(range(0, 600)) AS t(i)),
         w AS (SELECT asset_id, i // 256 AS win,
             CAST(sum(v * v) AS BIGINT) AS sum_sq,
             CAST(count(*) AS BIGINT) AS n_samples
           FROM s GROUP BY asset_id, i // 256)
         SELECT asset_id, win, sum_sq, n_samples,
           sqrt(CAST(sum_sq AS DOUBLE) / n_samples) AS rms
         FROM w ORDER BY asset_id, win""",
    "mm_format_sniff" ->
      """SELECT format, count(*) AS n_assets,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
         FROM (SELECT text,
           CASE
             WHEN substring(hex(encode(text)), 1, 8) = '52494646'
              AND substring(hex(encode(text)), 17, 8) = '57415645'
               THEN 'wav'
             WHEN substring(hex(encode(text)), 1, 8) = '89504E47'
               THEN 'png'
             WHEN substring(hex(encode(text)), 1, 6) = 'FFD8FF'
               THEN 'jpeg'
             WHEN substring(hex(encode(text)), 1, 8) = '47494638'
               THEN 'gif'
             WHEN substring(hex(encode(text)), 1, 4) = '424D' THEN 'bmp'
             WHEN substring(hex(encode(text)), 1, 2) = '50'
              AND substring(hex(encode(text)), 3, 2) IN ('35', '36')
              AND substring(hex(encode(text)), 5, 2)
                IN ('20', '0A', '09', '0D') THEN 'pnm'
             ELSE 'unknown' END AS format
           FROM documents)
         GROUP BY format ORDER BY format""",
    "mm_binary_meta" ->
      """SELECT doc_id AS asset_id, octet_length(encode(text)) AS n_bytes,
           n_chars AS n_bytes_declared, md5(text) AS content_md5,
           substring(base64(encode(text)), 1, 24) AS b64_head, lang
         FROM documents ORDER BY asset_id""",
    "mm_resize_stub" ->
      """SELECT doc_id AS asset_id,
           octet_length(encode(text)) AS in_bytes,
           64 + (octet_length(encode(text)) % 640) AS in_w,
           64 + ((octet_length(encode(text)) * 7) % 480) AS in_h,
           (64 + (octet_length(encode(text)) % 640)) // 2 AS out_w,
           (64 + ((octet_length(encode(text)) * 7) % 480)) // 2 AS out_h,
           octet_length(encode(text)) // 4 AS resized_bytes
         FROM documents ORDER BY asset_id""",
    "mm_decode_agg" ->
      """SELECT lang, count(*) AS n_assets,
           CAST(sum(64 + (octet_length(encode(text)) % 640)) AS BIGINT)
             AS sum_w,
           CAST(sum(64 + ((octet_length(encode(text)) * 7) % 480)) AS DOUBLE)
             / count(*) AS avg_h
         FROM documents GROUP BY lang ORDER BY lang""",
    "mm_frame_sample" ->
      """SELECT doc_id AS asset_id, count(*) AS n_sampled,
           CAST(sum(octet_length(encode(frame))) AS BIGINT) AS sampled_bytes,
           min(substring(base64(encode(frame)), 1, 8)) AS min_frame_b64
         FROM (
           SELECT doc_id, unnest(list_transform(
               range(0, CAST(floor((octet_length(encode(text)) - 1) / 32)
                 AS INTEGER) + 1),
               i -> substring(text, i * 32 + 1, 32))) AS frame,
             unnest(range(0, CAST(floor((octet_length(encode(text)) - 1) / 32)
               AS INTEGER) + 1)) AS i
           FROM documents)
         WHERE i % 4 = 0 GROUP BY doc_id ORDER BY asset_id""")
}
