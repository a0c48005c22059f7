package graft.functions

/** Pure-JVM media parsing for the multimodal pipeline — no codec
  * libraries exist in this environment, but two ubiquitous container
  * formats need none: PCM WAV (a RIFF chunk walk plus fixed-point
  * samples) and binary PPM/PGM (an ASCII header plus raw pixel bytes).
  * These are REAL decoders, exercised on genuine in-spec-constructed
  * media bytes; formats that require entropy coding (JPEG/PNG/MP3)
  * remain sniffed-but-stubbed, which is the honest boundary of a
  * dependency-free sandbox.
  *
  * Every function is total over arbitrary byte arrays: malformed,
  * truncated, or hostile input returns None / "unknown", never throws —
  * the property a decode stage running over a 100 TB crawl actually
  * needs, where a fraction of every real corpus is corrupt.
  */
object MediaCodecs {

  /** Magic-byte container classification. Mirrors the SQL-expressible
    * prefix checks in mm_format_sniff (hex of the leading bytes), so the
    * JVM and SQL paths cannot drift.
    */
  def sniff(b: Array[Byte]): String = {
    def at(i: Int): Int = if (i >= 0 && i < b.length) b(i) & 0xff else -1
    def ascii(from: Int, s: String): Boolean =
      s.indices.forall(i => at(from + i) == s.charAt(i).toInt)
    if (ascii(0, "RIFF") && ascii(8, "WAVE")) "wav"
    else if (at(0) == 0x89 && ascii(1, "PNG")) "png"
    else if (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) "jpeg"
    else if (ascii(0, "GIF8")) "gif"
    else if (ascii(0, "BM")) "bmp"
    else if (at(0) == 'P'.toInt && (at(1) == '5'.toInt || at(1) == '6'.toInt)
      && (at(2) == 0x20 || at(2) == 0x0A || at(2) == 0x09 || at(2) == 0x0D))
      "pnm" // exactly the four bytes the SQL sniff accepts — NOT
    // Character.isWhitespace, whose wider set (0x0B 0x0C 0x1C-0x1F)
    // would let the JVM and mm_format_sniff classify a payload
    // differently
    else "unknown"
  }

  /** Decoded PCM WAV facts: header fields plus integral sample stats
    * (sum of |amplitude| over all 16-bit samples — order-independent, so
    * downstream aggregation is engine-exact).
    */
  final case class WavInfo(channels: Int, sampleRate: Int, bits: Int,
    nSamples: Long, sumAbs: Long)

  /** Parse a PCM (format tag 1) WAV by walking RIFF chunks. Accepts any
    * chunk order, skips unknown chunks (word-aligned), requires one
    * "fmt " before "data". Only 16-bit samples get amplitude stats;
    * other depths decode header-only with sumAbs = -1.
    */
  def decodeWav(b: Array[Byte]): Option[WavInfo] = {
    def u16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def u32(i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    if (b.length < 12 || sniff(b) != "wav") return None
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // channels, rate, bits
    var out: Option[WavInfo] = None
    while (out.isEmpty && off + 8 <= b.length) {
      val id = new String(b, off, 4, "US-ASCII")
      val size = u32(off + 4)
      val body = off + 8
      // a hostile size field must not read past the buffer or loop forever
      if (size < 0 || body + size > b.length) return None
      id match {
        case "fmt " =>
          if (size < 16 || u16(body) != 1) return None // PCM only
          fmt = Some((u16(body + 2), u32(body + 4).toInt, u16(body + 14)))
        case "data" =>
          fmt match {
            case Some((ch, rate, bits)) =>
              if (ch <= 0 || bits <= 0) return None
              if (bits == 16) {
                val n = size / 2
                var i = 0L
                var sum = 0L
                while (i < n) {
                  val s = u16(body + (i * 2).toInt).toShort.toInt
                  sum += math.abs(s.toLong)
                  i += 1
                }
                out = Some(WavInfo(ch, rate, bits, n, sum))
              } else
                out = Some(WavInfo(ch, rate, bits,
                  size / ((bits / 8).max(1)), -1L))
            case None => return None // data before fmt
          }
        case _ => () // skip unknown chunk
      }
      off = body + size.toInt + (size.toInt & 1) // RIFF word alignment
    }
    out
  }

  /** Windowed audio ENERGY over a PCM16 WAV — the feature-extraction
    * step an audio training pipeline runs after decode (VAD/silence
    * trimming, loudness normalization, clip detection all read windowed
    * energy): for each window of `window` samples (frame-interleaved;
    * the last window may be short), the EXACT integral sum of squared
    * amplitudes plus its sample count — callers derive RMS as
    * sqrt(sum_sq/n) without losing reproducibility to float order.
    * Total like [[decodeWav]]: malformed bytes or non-16-bit audio →
    * None, never a throw. Headroom: a 16-bit square is < 2³⁰, so a
    * window may hold 2³³ samples before the long sum could wrap —
    * far past any real window size.
    */
  def wavEnergyWindows(b: Array[Byte],
      window: Int): Option[Seq[(Long, Long)]] = {
    require(window >= 1, s"window must be >= 1, got $window")
    def u16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    decodeWav(b).filter(_.bits == 16).map { w =>
      // re-walk to the data chunk (decodeWav validated the layout)
      var off = 12
      var body = -1
      var size = 0L
      while (body < 0) {
        val id = new String(b, off, 4, "US-ASCII")
        val sz = (b(off + 4) & 0xffL) | ((b(off + 5) & 0xffL) << 8) |
          ((b(off + 6) & 0xffL) << 16) | ((b(off + 7) & 0xffL) << 24)
        if (id == "data") { body = off + 8; size = sz }
        else off = off + 8 + sz.toInt + (sz.toInt & 1)
      }
      val n = (size / 2).toInt
      val out = Seq.newBuilder[(Long, Long)]
      var i = 0
      while (i < n) {
        val m = math.min(window, n - i)
        var j = 0
        var acc = 0L
        while (j < m) {
          val s = u16(body + (i + j) * 2).toShort.toLong
          acc += s * s
          j += 1
        }
        out += ((acc, m.toLong))
        i += m
      }
      out.result()
    }
  }

  /** Header-level image facts: pixel dimensions straight from the
    * container header — PNG IHDR, JPEG SOF marker walk, GIF logical
    * screen, BMP info header. No entropy decode (that genuinely needs a
    * codec library); dimensions, the field a corpus profile/resize
    * planner actually reads, are plain header bytes.
    */
  final case class ImageDims(format: String, width: Long, height: Long)

  /** Parse dimensions for a sniffed png/jpeg/gif/bmp payload. Total:
    * malformed headers → None.
    */
  def imageDims(b: Array[Byte]): Option[ImageDims] = {
    def at(i: Int): Int = if (i >= 0 && i < b.length) b(i) & 0xff else -1
    def be32(i: Int): Long =
      ((at(i).toLong << 24) | (at(i + 1).toLong << 16) |
        (at(i + 2).toLong << 8) | at(i + 3).toLong)
    def be16(i: Int): Int = (at(i) << 8) | at(i + 1)
    def le16(i: Int): Int = at(i) | (at(i + 1) << 8)
    def le32(i: Int): Long =
      (at(i).toLong | (at(i + 1).toLong << 8) |
        (at(i + 2).toLong << 16) | (at(i + 3).toLong << 24))
    sniff(b) match {
      case "png" =>
        // fixed layout: 8-byte signature, 4-byte length(=13), "IHDR",
        // then big-endian width/height
        if (b.length >= 24 && be32(8) == 13L && at(12) == 'I'.toInt &&
          at(13) == 'H'.toInt && at(14) == 'D'.toInt && at(15) == 'R'.toInt)
          Some(ImageDims("png", be32(16), be32(20)))
            .filter(d => d.width > 0 && d.height > 0)
        else None
      case "jpeg" =>
        // marker walk: FF xx [len16 payload]; SOFn (C0-CF minus C4/C8/CC)
        // carries height/width big-endian at payload+1/+3
        var i = 2
        var out: Option[ImageDims] = None
        while (out.isEmpty && i + 3 < b.length) {
          if (at(i) != 0xff) return None // desynchronized marker stream
          val m = at(i + 1)
          if (m == 0xff) i += 1 // fill bytes before a marker are legal
          else if ((m >= 0xd0 && m <= 0xd9) || m == 0x01)
            i += 2 // SOI/EOI/RSTn/TEM are standalone, no length field
          else {
            val len = be16(i + 2)
            if (len < 2 || i + 2 + len > b.length) return None
            if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 &&
              m != 0xcc) {
              val h = be16(i + 5)
              val w = be16(i + 7)
              out = if (w > 0 && h > 0) Some(ImageDims("jpeg", w, h))
              else None
              if (out.isEmpty) return None
            }
            if (m == 0xda) return out // entropy data follows — stop walking
            i += 2 + len
          }
        }
        out
      case "gif" =>
        if (b.length >= 10) Some(ImageDims("gif", le16(6), le16(8)))
          .filter(d => d.width > 0 && d.height > 0)
        else None
      case "bmp" =>
        // BITMAPINFOHEADER: signed little-endian; height may be negative
        // (top-down rows) — report magnitude
        if (b.length >= 26 && le32(14) >= 40) {
          val w = le32(18).toInt
          val h = le32(22).toInt
          if (w > 0 && h != 0) Some(ImageDims("bmp", w.toLong,
            math.abs(h.toLong)))
          else None
        } else None
      case _ => None
    }
  }

  /** GIF frame count WITHOUT LZW decode: the container frames its
    * compressed data in length-prefixed sub-blocks, so a linear walk —
    * logical screen descriptor, optional color tables, extension blocks,
    * image descriptors — counts animation frames while skipping every
    * compressed byte by its declared length. None on desynchronized or
    * truncated block streams (no trailer ⇒ None, like every parser here).
    */
  def gifFrames(b: Array[Byte]): Option[Int] = {
    if (sniff(b) != "gif") return None
    def at(i: Int): Int = if (i < b.length) b(i) & 0xff else -1
    var i = 6
    if (i + 7 > b.length) return None
    val flags = at(i + 4)
    i += 7
    if ((flags & 0x80) != 0) i += 3 * (1 << ((flags & 7) + 1))
    var frames = 0
    def skipSubBlocks(): Boolean = {
      var len = at(i)
      while (len > 0) { i += 1 + len; len = at(i) }
      if (len == 0) { i += 1; true } else false // -1 = ran off the end
    }
    while (i < b.length) {
      at(i) match {
        case 0x3b => return Some(frames) // trailer
        case 0x21 => // extension: label byte, then sub-blocks
          i += 2
          if (!skipSubBlocks()) return None
        case 0x2c => // image descriptor
          if (i + 10 > b.length) return None
          val lflags = at(i + 9)
          i += 10
          if ((lflags & 0x80) != 0) i += 3 * (1 << ((lflags & 7) + 1))
          i += 1 // LZW minimum code size
          if (!skipSubBlocks()) return None
          frames += 1
        case _ => return None // desynchronized block stream
      }
    }
    None // no trailer reached
  }

  /** Decoded binary PPM (P6) / PGM (P5) facts: dimensions, maxval, and
    * integral per-channel pixel sums (PGM fills only sumR).
    */
  final case class PnmInfo(kind: String, width: Int, height: Int,
    maxval: Int, sumR: Long, sumG: Long, sumB: Long)

  /** Parse the ASCII header (tolerating '#' comments, any whitespace
    * runs) then read width·height raw pixels. Truncated pixel data or
    * maxval > 255 (two-byte samples) → None.
    */
  def decodePnm(b: Array[Byte]): Option[PnmInfo] =
    pnmHeader(b).map { case (kind, w, h, mx, off) =>
      val ch = if (kind == "ppm") 3 else 1
      val need = w.toLong * h * ch
      val sums = Array(0L, 0L, 0L)
      var p = 0L
      while (p < need) {
        sums((p % ch).toInt) += (b(off + p.toInt) & 0xff)
        p += 1
      }
      PnmInfo(kind, w, h, mx, sums(0), sums(1), sums(2))
    }

  /** The shared PNM header walk: (kind, width, height, maxval,
    * pixel-data offset), with the pixel payload verified complete.
    */
  private def pnmHeader(b: Array[Byte])
      : Option[(String, Int, Int, Int, Int)] = {
    if (sniff(b) != "pnm") return None
    val kind = if (b(1) == '6'.toByte) "ppm" else "pgm"
    var i = 2
    // read exactly 3 whitespace-separated ints, skipping # comments
    def nextInt(): Option[Int] = {
      while (i < b.length &&
        (Character.isWhitespace(b(i) & 0xff) || b(i) == '#'.toByte)) {
        if (b(i) == '#'.toByte)
          while (i < b.length && b(i) != '\n'.toByte) i += 1
        else i += 1
      }
      val start = i
      while (i < b.length && (b(i) & 0xff) >= '0'.toInt &&
        (b(i) & 0xff) <= '9'.toInt) i += 1
      if (i == start || i - start > 9) None
      else Some(new String(b, start, i - start, "US-ASCII").toInt)
    }
    for {
      w <- nextInt()
      h <- nextInt()
      mx <- nextInt()
      // exactly ONE whitespace byte after maxval, per spec — and it must
      // BE whitespace: 'P5 2 2 255X<pixels>' is out-of-spec, and skipping
      // the X blindly would shift all pixel reads by one byte yet still
      // report decoded=true (parser total but not faithful)
      if w > 0 && h > 0 && mx > 0 && mx <= 255 && i < b.length &&
        Character.isWhitespace(b(i) & 0xff)
      _ = { i += 1 }
      ch = if (kind == "ppm") 3 else 1
      need = w.toLong * h * ch
      if i + need <= b.length
    } yield (kind, w, h, mx, i)
  }

  /** AVERAGE-HASH (aHash) of a PNM image over a grid×grid cell lattice,
    * returned as `grid²/16` 16-bit band values (grid must be a multiple
    * of 4 so bands pack exactly) — the banding the LSH near-dup join
    * blocks on. Integer-exact everywhere so an analytic replay (e.g. a
    * SQL oracle computing the same cells from a pixel formula) is
    * bit-identical:
    *  - luma(p) = r+g+b for PPM, the sample value for PGM (the bit rule
    *    is scale-invariant, so no /3 normalization is needed);
    *  - pixel (x, y) maps to cell ((x·grid) div W, (y·grid) div H) — the
    *    floor lattice, exact for any W, H;
    *  - cell bit = 1 iff cellSum·nPixels > totalSum·cellPixels (strict;
    *    the division-free form of "cell mean above image mean");
    *  - cell k = cy·grid+cx contributes bit (k mod 16) of band
    *    (k div 16).
    */
  def pnmAHashBands(b: Array[Byte], grid: Int = 8): Option[Array[Long]] = {
    require(grid >= 4 && grid % 4 == 0, s"grid must be a multiple of 4: $grid")
    pnmHeader(b).map { case (kind, w, h, _, off) =>
      val ch = if (kind == "ppm") 3 else 1
      val cellSum = new Array[Long](grid * grid)
      val cellN = new Array[Long](grid * grid)
      var tot = 0L
      var p = 0
      val n = w * h
      while (p < n) {
        var l = 0
        var c = 0
        while (c < ch) { l += b(off + p * ch + c) & 0xff; c += 1 }
        val cx = (p % w) * grid / w
        val cy = (p / w) * grid / h
        val k = cy * grid + cx
        cellSum(k) += l; cellN(k) += 1; tot += l
        p += 1
      }
      val bands = new Array[Long](grid * grid / 16)
      var k = 0
      while (k < grid * grid) {
        if (cellSum(k) * n > tot * cellN(k))
          bands(k / 16) |= 1L << (k % 16)
        k += 1
      }
      bands
    }
  }
}
