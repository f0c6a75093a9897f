package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, Dataset}

/** REAL decoders for the self-describing media formats a JVM can parse with
  * no external codec: PPM (P6) images and WAV (RIFF/PCM) audio. This is the
  * codec body [[Multimodal.decodeStub]] declares a slot for — formats that
  * need libjpeg/ffmpeg stay stubbed (honestly, per the brief), but binary
  * parsing, feature extraction and the dead-letter path are real here and
  * exercised end-to-end by the `multimodal_decode` oracle query.
  *
  * Scale shape: decode runs inside `mapPartitions` (one dispatch table per
  * partition, streamed rows) and each row touches only its own payload —
  * map-only, no shuffle, embarrassingly parallel over 100 TB of media.
  */
object MediaCodecs {

  /** Unified decode record; format-specific fields are None for the other
    * kind (image: width/height/mean RGB of the raster; audio: rate,
    * sample count, peak amplitude, RMS energy, zero crossings). */
  case class MediaInfo(
      doc_id: Long,
      format: String,
      width: Option[Long],
      height: Option[Long],
      mean_r: Option[Long],
      mean_g: Option[Long],
      mean_b: Option[Long],
      sample_rate: Option[Long],
      n_samples: Option[Long],
      peak: Option[Long],
      rms: Option[Long] = None,
      zero_cross: Option[Long] = None)

  // ---- PPM P6 (netpbm): "P6" <ws> width <ws> height <ws> maxval \n raster ----

  def ppmEncode(w: Int, h: Int, rgb: (Int, Int, Int)): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val raster = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      raster(i * 3) = rgb._1.toByte
      raster(i * 3 + 1) = rgb._2.toByte
      raster(i * 3 + 2) = rgb._3.toByte
      i += 1
    }
    header ++ raster
  }

  /** P6 encode of an arbitrary raster (rgb triplets, row-major) — the
    * general form of [[ppmEncode]]'s constant-color convenience. */
  def ppmEncodeRaster(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, "raster size mismatch")
    s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ rgb
  }

  /** (width, height, rgb raster copy) of a valid P6 payload; None on
    * malformation. The raster-access sibling of [[ppmDecode]] (which
    * reduces to summary stats), for stages that transform pixels. */
  def ppmRaster(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    ppmHeader(bytes).map { case (w, h, pos) =>
      (w, h, java.util.Arrays.copyOfRange(bytes, pos, pos + w * h * 3))
    }

  /** Parse a P6 payload: magic, whitespace/comment-tolerant header ints,
    * 8-bit raster. Returns None on any malformation (dead-letter, the
    * converter-error analogue of reader's per-row error returns). */
  def ppmDecode(id: Long, bytes: Array[Byte]): Option[MediaInfo] =
    ppmHeader(bytes).map { case (w, h, pos) =>
      var (sr, sg, sb) = (0L, 0L, 0L)
      var i = 0
      while (i < w * h) {
        sr += bytes(pos + i * 3) & 0xff
        sg += bytes(pos + i * 3 + 1) & 0xff
        sb += bytes(pos + i * 3 + 2) & 0xff
        i += 1
      }
      val n = w.toLong * h
      MediaInfo(id, "ppm", Some(w.toLong), Some(h.toLong),
        Some(sr / n), Some(sg / n), Some(sb / n), None, None, None)
    }

  /** Nearest-neighbor resize of a P6 payload (the "resize" stage of the
    * multimodal pipeline): re-parses the header with the same tolerant
    * reader as [[ppmDecode]], samples source pixels at
    * floor(i * src/dst) and re-encodes. None on malformed input. */
  def ppmResizeNearest(bytes: Array[Byte], newW: Int, newH: Int): Option[Array[Byte]] = {
    // allocation bound in Long: a huge target would overflow newW*newH*3
    if (newW <= 0 || newH <= 0 || newW.toLong * newH * 3 >= Int.MaxValue - 64) return None
    ppmHeader(bytes).map { case (w, h, rasterPos) =>
      val out = new Array[Byte](newW * newH * 3)
      var y = 0
      while (y < newH) {
        val sy = (y.toLong * h / newH).toInt
        var x = 0
        while (x < newW) {
          val sx = (x.toLong * w / newW).toInt
          val src = rasterPos + (sy * w + sx) * 3
          val dst = (y * newW + x) * 3
          out(dst) = bytes(src); out(dst + 1) = bytes(src + 1); out(dst + 2) = bytes(src + 2)
          x += 1
        }
        y += 1
      }
      s"P6\n$newW $newH\n255\n".getBytes("US-ASCII") ++ out
    }
  }

  /** (width, height, raster offset) of a valid P6 payload; None otherwise.
    * Shared by decode and resize. */
  private def ppmHeader(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    var pos = 2
    def skipWsAndComments(): Unit = {
      var going = true
      while (going && pos < bytes.length) {
        val c = bytes(pos)
        if (c == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
        else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') pos += 1
        else going = false
      }
    }
    def readInt(): Option[Int] = {
      skipWsAndComments()
      val start = pos
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') pos += 1
      if (pos == start || pos - start > 9) None
      else Some(new String(bytes, start, pos - start, "US-ASCII").toInt)
    }
    for {
      w <- readInt()
      h <- readInt()
      maxval <- readInt()
      if maxval == 255 && w > 0 && h > 0
      if pos < bytes.length && { pos += 1; bytes.length - pos >= w.toLong * h * 3 }
    } yield (w, h, pos)
  }

  // ---- WAV (RIFF little-endian, PCM 16-bit) ----

  def wavEncode(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                    // PCM
      .putShort(1)                    // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)         // byte rate
      .putShort(2)                    // block align
      .putShort(16)                   // bits/sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Parse a RIFF/WAVE payload: walk chunks to fmt + data (tolerating
    * extra chunks in between), require PCM16 mono, extract sample count
    * and peak amplitude. None on malformation. */
  /** (sample rate, PCM16 samples) of a valid mono WAV; None on
    * malformation. The sample-access sibling of [[wavDecode]] (which
    * reduces to summary features), for stages that transform or
    * fingerprint the waveform. Same chunk-walk and guards. */
  def wavSamples(bytes: Array[Byte]): Option[(Int, Array[Short])] = {
    if (bytes.length < 12) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag4(at: Int) = new String(bytes, at, 4, "US-ASCII")
    if (tag4(0) != "RIFF" || tag4(8) != "WAVE") return None
    var pos = 12
    var rate = -1
    var samples: Array[Short] = null
    while (pos + 8 <= bytes.length) {
      val tag = tag4(pos)
      val len = buf.getInt(pos + 4)
      if (len < 0 || pos + 8 + len.toLong > bytes.length) return None
      tag match {
        case "fmt " =>
          if (len < 16) return None
          val codec = buf.getShort(pos + 8)
          val channels = buf.getShort(pos + 10)
          val bits = buf.getShort(pos + 22)
          if (codec != 1 || channels != 1 || bits != 16) return None
          rate = buf.getInt(pos + 12)
        case "data" =>
          if (rate < 0) return None // fmt must precede data
          samples = Array.tabulate(len / 2)(i => buf.getShort(pos + 8 + i * 2))
        case _ => // skip unknown chunk
      }
      pos += 8 + len + (len & 1)
    }
    if (rate < 0 || samples == null) None else Some((rate, samples))
  }

  def wavDecode(id: Long, bytes: Array[Byte]): Option[MediaInfo] = {
    if (bytes.length < 12) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag4(at: Int) = new String(bytes, at, 4, "US-ASCII")
    if (tag4(0) != "RIFF" || tag4(8) != "WAVE") return None
    var pos = 12
    var rate = -1
    var peak = -1L
    var nSamples = -1L
    var rmsOut = 0L
    var zcOut = 0L
    while (pos + 8 <= bytes.length) {
      val tag = tag4(pos)
      val len = buf.getInt(pos + 4)
      // bounds math in Long: a crafted len near Int.MaxValue wraps
      // `pos + 8 + len` negative and would bypass the guard
      if (len < 0 || pos + 8 + len.toLong > bytes.length) return None
      tag match {
        case "fmt " =>
          if (len < 16) return None
          val codec = buf.getShort(pos + 8)
          val channels = buf.getShort(pos + 10)
          val bits = buf.getShort(pos + 22)
          if (codec != 1 || channels != 1 || bits != 16) return None
          rate = buf.getInt(pos + 12)
        case "data" =>
          if (rate < 0) return None // fmt must precede data
          nSamples = len / 2L
          var i = 0
          var p = 0L
          var sumSq = 0L
          var zc = 0L
          var prevNonNeg = false
          while (i < len / 2) {
            val s = buf.getShort(pos + 8 + i * 2).toLong
            val a = math.abs(s)
            if (a > p) p = a
            sumSq += s * s
            val nonNeg = s >= 0
            if (i > 0 && nonNeg != prevNonNeg) zc += 1
            prevNonNeg = nonNeg
            i += 1
          }
          peak = p
          // floor(sqrt(mean square)): one double division + sqrt, written
          // identically by the oracle (sumSq exact in Long, < 2^53)
          rmsOut = if (nSamples > 0)
            math.floor(math.sqrt(sumSq.toDouble / nSamples)).toLong else 0L
          zcOut = zc
        case _ => // skip unknown chunk (LIST, fact, ...)
      }
      pos += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (rate < 0 || nSamples < 0) None
    else Some(MediaInfo(id, "wav", None, None, None, None, None,
      Some(rate.toLong), Some(nSamples), Some(peak), Some(rmsOut), Some(zcOut)))
  }

  /** Deterministic synthetic P6 payload for a row id — the single source
    * of the arithmetic the multimodal_decode/multimodal_resize oracles
    * replay (dims 1+id%8 x 1+id%5, uniform color (id, 7id, 13id) mod 256).
    * Any change here must update BOTH oracle SQL strings. */
  def syntheticPpm(id: Long): Array[Byte] =
    ppmEncode((1 + id % 8).toInt, (1 + id % 5).toInt,
      ((id % 256).toInt, ((id * 7) % 256).toInt, ((id * 13) % 256).toInt))

  // ---- BMP (BITMAPINFOHEADER, 24bpp uncompressed) ----

  /** Parse a BI_RGB 24bpp BMP: little-endian header fields, pixel rows
    * padded to 4-byte multiples and stored bottom-up (negative biHeight =
    * top-down). Emits the same image MediaInfo shape as [[ppmDecode]]
    * (mean RGB; BMP stores BGR). None on malformation. */
  def bmpDecode(id: Long, bytes: Array[Byte]): Option[MediaInfo] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOffset = buf.getInt(10)
    val headerSize = buf.getInt(14)
    val w = buf.getInt(18)
    val hRaw = buf.getInt(22)
    val planes = buf.getShort(26)
    val bpp = buf.getShort(28)
    val compression = buf.getInt(30)
    // abs in Long: math.abs(Int.MinValue) stays negative and would slip
    // through every guard below as h < 0
    val h = math.abs(hRaw.toLong).toInt
    if (headerSize < 40 || w <= 0 || h <= 0 || hRaw == Int.MinValue ||
      planes != 1 || bpp != 24 || compression != 0) return None
    val rowBytes = ((w.toLong * 3 + 3) / 4) * 4 // rows pad to 4-byte multiples
    if (dataOffset < 54 || dataOffset.toLong + rowBytes * h > bytes.length) return None
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < h) {
      val rowStart = dataOffset + y * rowBytes.toInt
      var x = 0
      while (x < w) {
        // pixel order on disk is B, G, R
        sb += bytes(rowStart + x * 3) & 0xff
        sg += bytes(rowStart + x * 3 + 1) & 0xff
        sr += bytes(rowStart + x * 3 + 2) & 0xff
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    Some(MediaInfo(id, "bmp", Some(w.toLong), Some(h.toLong),
      Some(sr / n), Some(sg / n), Some(sb / n), None, None, None))
  }

  /** Partition-batched decode with magic-byte dispatch; undecodable
    * payloads drop to the dead-letter side (None). */
  def decodeMedia(payloads: Dataset[(Long, Array[Byte])]): Dataset[MediaInfo] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6') ppmDecode(id, bytes)
        else if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I' &&
          bytes(2) == 'F' && bytes(3) == 'F') wavDecode(id, bytes)
        else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') bmpDecode(id, bytes)
        else if (bytes.length >= 4 && bytes(0) == 'q' && bytes(1) == 'o' &&
          bytes(2) == 'i' && bytes(3) == 'f') qoiDecode(id, bytes).map(_._1)
        else if (bytes.length >= 4 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
          bytes(2) == 'N' && bytes(3) == 'G') pngDecode(id, bytes).map(_._1)
        else if (bytes.length >= 4 && bytes(0) == 'G' && bytes(1) == 'I' &&
          bytes(2) == 'F' && bytes(3) == '8') gifDecode(id, bytes).map(_._1)
        else None
      }
    }
  }

  // ---- QOI (Quite OK Image, qoiformat.org): 14-byte header + op-coded
  // RGB(A) stream. A REAL modern raster codec a JVM can implement exactly:
  // RUN/INDEX/DIFF/LUMA/RGB/RGBA ops over a rolling 64-entry color index
  // (hash (3r+5g+7b+11a) % 64), big-endian dims, 7x00+01 end marker. ----

  /** Encode an RGB raster (3 bytes/pixel) with the full op set. */
  def qoiEncode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, "raster size mismatch")
    val out = new java.io.ByteArrayOutputStream(rgb.length / 2 + 32)
    out.write(Array[Byte]('q', 'o', 'i', 'f'))
    def be32(v: Int): Unit = { out.write(v >>> 24); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    be32(w); be32(h); out.write(3); out.write(0)
    val index = new Array[Int](64) // packed rgba, 0 = unseen (qoi inits to 0)
    var pr = 0; var pg = 0; var pb = 0; val pa = 255
    var run = 0
    var i = 0
    val n = w * h
    while (i < n) {
      val r = rgb(i * 3) & 0xff; val g = rgb(i * 3 + 1) & 0xff; val b = rgb(i * 3 + 2) & 0xff
      if (r == pr && g == pg && b == pb) {
        run += 1
        if (run == 62) { out.write(0xc0 | (run - 1)); run = 0 }
      } else {
        if (run > 0) { out.write(0xc0 | (run - 1)); run = 0 }
        val hash = (r * 3 + g * 5 + b * 7 + pa * 11) % 64
        val packed = (r << 24) | (g << 16) | (b << 8) | pa
        if (index(hash) == packed) out.write(hash)
        else {
          index(hash) = packed
          val dr = r - pr; val dg = g - pg; val db = b - pb
          val dgr = dr - dg; val dgb = db - dg
          if (dr >= -2 && dr <= 1 && dg >= -2 && dg <= 1 && db >= -2 && db <= 1)
            out.write(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
          else if (dg >= -32 && dg <= 31 && dgr >= -8 && dgr <= 7 && dgb >= -8 && dgb <= 7) {
            out.write(0x80 | (dg + 32)); out.write(((dgr + 8) << 4) | (dgb + 8))
          } else { out.write(0xfe); out.write(r); out.write(g); out.write(b) }
        }
        pr = r; pg = g; pb = b
      }
      i += 1
    }
    if (run > 0) out.write(0xc0 | (run - 1))
    (0 until 7).foreach(_ => out.write(0)); out.write(1)
    out.toByteArray
  }

  /** Decode any RGB/RGBA QOI payload; returns (MediaInfo, rgb bytes).
    * None on malformed input (dead-letter lane). */
  def qoiDecode(id: Long, bytes: Array[Byte]): Option[(MediaInfo, Array[Byte])] = {
    if (bytes.length < 22 || bytes(0) != 'q' || bytes(1) != 'o' ||
      bytes(2) != 'i' || bytes(3) != 'f') return None
    def be32(at: Int): Int = ((bytes(at) & 0xff) << 24) | ((bytes(at + 1) & 0xff) << 16) |
      ((bytes(at + 2) & 0xff) << 8) | (bytes(at + 3) & 0xff)
    val w = be32(4); val h = be32(8)
    val channels = bytes(12) & 0xff
    if (w <= 0 || h <= 0 || w.toLong * h > (1 << 26) || (channels != 3 && channels != 4))
      return None
    val n = w * h
    val rgb = new Array[Byte](n * 3)
    val index = new Array[Int](64)
    var r = 0; var g = 0; var b = 0; var a = 255
    var p = 14
    var px = 0
    try {
      while (px < n) {
        val op = bytes(p) & 0xff; p += 1
        if (op == 0xfe) { r = bytes(p) & 0xff; g = bytes(p + 1) & 0xff; b = bytes(p + 2) & 0xff; p += 3 }
        else if (op == 0xff) { r = bytes(p) & 0xff; g = bytes(p + 1) & 0xff
          b = bytes(p + 2) & 0xff; a = bytes(p + 3) & 0xff; p += 4 }
        else (op >> 6) match {
          case 0 => val v = index(op & 0x3f)
            r = v >>> 24; g = (v >>> 16) & 0xff; b = (v >>> 8) & 0xff; a = v & 0xff
          case 1 => r = (r + ((op >> 4) & 3) - 2) & 0xff
            g = (g + ((op >> 2) & 3) - 2) & 0xff
            b = (b + (op & 3) - 2) & 0xff
          case 2 => val dg = (op & 0x3f) - 32
            val d2 = bytes(p) & 0xff; p += 1
            r = (r + dg + ((d2 >> 4) & 0x0f) - 8) & 0xff
            g = (g + dg) & 0xff
            b = (b + dg + (d2 & 0x0f) - 8) & 0xff
          case _ => // RUN: repeat previous pixel (bias -1); first copy below
            var k = op & 0x3f
            while (k > 0 && px < n - 1) {
              rgb(px * 3) = r.toByte; rgb(px * 3 + 1) = g.toByte; rgb(px * 3 + 2) = b.toByte
              px += 1; k -= 1
            }
            if (k > 0) return None // run past end of image
        }
        index((r * 3 + g * 5 + b * 7 + a * 11) % 64) = (r << 24) | (g << 16) | (b << 8) | a
        rgb(px * 3) = r.toByte; rgb(px * 3 + 1) = g.toByte; rgb(px * 3 + 2) = b.toByte
        px += 1
      }
    } catch { case _: ArrayIndexOutOfBoundsException => return None }
    var (sr, sg, sb) = (0L, 0L, 0L)
    var i = 0
    while (i < n) { sr += rgb(i * 3) & 0xff; sg += rgb(i * 3 + 1) & 0xff; sb += rgb(i * 3 + 2) & 0xff; i += 1 }
    Some((MediaInfo(id, "qoi", Some(w.toLong), Some(h.toLong),
      Some(sr / n), Some(sg / n), Some(sb / n), None, None, None), rgb))
  }

  // ---- PNG (RFC 2083): 8-byte signature + length-tagged CRC32 chunks;
  // IDAT = zlib(DEFLATE) of filtered scanlines (filter byte per row, five
  // filter types: None/Sub/Up/Average/Paeth). The one ubiquitous raster
  // format a bare JVM can decode EXACTLY — Inflater + CRC32 ship in
  // java.util.zip; no libpng needed. ----

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private[graft] def pngChunk(out: java.io.ByteArrayOutputStream, tag: String,
      data: Array[Byte]): Unit = {
    def be32(v: Int): Unit = { out.write(v >>> 24); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    be32(data.length)
    val tagBytes = tag.getBytes("US-ASCII")
    out.write(tagBytes)
    out.write(data)
    val crc = new java.util.zip.CRC32()
    crc.update(tagBytes); crc.update(data)
    be32(crc.getValue.toInt)
  }

  /** Encode an RGB raster as 8-bit truecolor PNG. The row filter CYCLES
    * through all five types (y % 5) so a decoder that mishandles any one
    * of Sub/Up/Average/Paeth fails the round trip — the same
    * exercise-every-op principle as qoiEncode. Deflate level 6 is
    * bit-deterministic on a given input (the text_compress claim). */
  def pngEncode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, "raster size mismatch")
    val stride = w * 3
    val raw = new Array[Byte]((stride + 1) * h)
    var y = 0
    while (y < h) {
      val ft = y % 5
      raw(y * (stride + 1)) = ft.toByte
      var x = 0
      while (x < stride) {
        val cur = rgb(y * stride + x) & 0xff
        val left = if (x >= 3) rgb(y * stride + x - 3) & 0xff else 0
        val up = if (y > 0) rgb((y - 1) * stride + x) & 0xff else 0
        val ul = if (x >= 3 && y > 0) rgb((y - 1) * stride + x - 3) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case _ => paeth(left, up, ul)
        }
        raw(y * (stride + 1) + 1 + x) = ((cur - pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater(6)
    deflater.setInput(raw); deflater.finish()
    val zout = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) zout.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream(zout.size() + 64)
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    val ihdr = ByteBuffer.allocate(13).order(ByteOrder.BIG_ENDIAN)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    pngChunk(out, "IHDR", ihdr)
    pngChunk(out, "IDAT", zout.toByteArray)
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decode an 8-bit truecolor (RGB or RGBA) non-interlaced PNG: signature,
    * chunk walk with CRC32 verification, multi-IDAT concatenation, inflate,
    * per-row unfilter (all five types), alpha dropped for the RGB feature
    * row. None on ANY malformation — bad signature/CRC/header fields,
    * truncated or over-long IDAT, unknown filter type, inflate error (the
    * dead-letter lane every other codec here has). */
  def pngDecode(id: Long, bytes: Array[Byte]): Option[(MediaInfo, Array[Byte])] = {
    if (bytes.length < 45 || (bytes(0) & 0xff) != 0x89 || bytes(1) != 'P' ||
      bytes(2) != 'N' || bytes(3) != 'G') return None
    def be32(at: Int): Int = ((bytes(at) & 0xff) << 24) | ((bytes(at + 1) & 0xff) << 16) |
      ((bytes(at + 2) & 0xff) << 8) | (bytes(at + 3) & 0xff)
    var w = 0; var h = 0; var channels = 0
    val idat = new java.io.ByteArrayOutputStream()
    var p = 8
    var sawEnd = false
    try {
      while (p + 8 <= bytes.length && !sawEnd) {
        val len = be32(p)
        if (len < 0 || p + 12 + len > bytes.length) return None
        val tag = new String(bytes, p + 4, 4, "US-ASCII")
        val crc = new java.util.zip.CRC32()
        crc.update(bytes, p + 4, 4 + len)
        if (crc.getValue.toInt != be32(p + 8 + len)) return None
        tag match {
          case "IHDR" =>
            if (len != 13) return None
            w = be32(p + 8); h = be32(p + 12)
            val depth = bytes(p + 16) & 0xff
            val color = bytes(p + 17) & 0xff
            val interlace = bytes(p + 20) & 0xff
            if (depth != 8 || (color != 2 && color != 6) || interlace != 0) return None
            if (w <= 0 || h <= 0 || w.toLong * h > (1 << 26)) return None
            channels = if (color == 2) 3 else 4
          case "IDAT" => idat.write(bytes, p + 8, len)
          case "IEND" => sawEnd = true
          case _ => () // ancillary chunk: CRC-checked, content ignored
        }
        p += 12 + len
      }
    } catch { case _: ArrayIndexOutOfBoundsException => return None }
    if (!sawEnd || channels == 0 || idat.size() == 0) return None
    val stride = w * channels
    val raw = new Array[Byte]((stride + 1) * h)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    var off = 0
    try {
      while (off < raw.length && !inflater.finished()) {
        val k = inflater.inflate(raw, off, raw.length - off)
        if (k == 0 && inflater.needsInput()) return None // truncated stream
        off += k
      }
      // Strict end-of-stream: a full raster is not enough — the deflate
      // stream must also FINISH exactly here. Probe once so zlib sees the
      // final-block marker, then reject trailing compressed data (probe
      // produced bytes), an unfinished stream, or unread IDAT input.
      if (off == raw.length && !inflater.finished()) {
        val probe = new Array[Byte](1)
        if (inflater.inflate(probe) > 0) return None // stream longer than raster
      }
      if (!inflater.finished() || inflater.getRemaining != 0) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inflater.end()
    if (off != raw.length) return None
    // unfilter in place into the rgb raster
    val px = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val ft = raw(y * (stride + 1)) & 0xff
      if (ft > 4) return None
      var x = 0
      while (x < stride) {
        val v = raw(y * (stride + 1) + 1 + x) & 0xff
        val left = if (x >= channels) px(y * stride + x - channels) & 0xff else 0
        val up = if (y > 0) px((y - 1) * stride + x) & 0xff else 0
        val ul = if (x >= channels && y > 0) px((y - 1) * stride + x - channels) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case _ => paeth(left, up, ul)
        }
        px(y * stride + x) = ((v + pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val n = w * h
    val rgb = if (channels == 3) px else {
      val r3 = new Array[Byte](n * 3)
      var i = 0
      while (i < n) {
        r3(i * 3) = px(i * 4); r3(i * 3 + 1) = px(i * 4 + 1); r3(i * 3 + 2) = px(i * 4 + 2)
        i += 1
      }
      r3
    }
    var (sr, sg, sb) = (0L, 0L, 0L)
    var i = 0
    while (i < n) { sr += rgb(i * 3) & 0xff; sg += rgb(i * 3 + 1) & 0xff; sb += rgb(i * 3 + 2) & 0xff; i += 1 }
    Some((MediaInfo(id, "png", Some(w.toLong), Some(h.toLong),
      Some(sr / n), Some(sg / n), Some(sb / n), None, None, None), rgb))
  }

  // ---- GIF (GIF89a, CompuServe 1990 spec): "GIF89a" + logical screen
  // descriptor (LE16 dims) + global color table + image descriptor +
  // variable-width LZW image data in 255-byte sub-blocks + 0x3B trailer.
  // The LZW is the real thing: clear/EOI codes, growing dictionary,
  // LSB-first bit packing, width bumps at powers of two, 4096-entry cap
  // with mid-stream clear — the last major pre-DCT raster format the
  // codec tier was missing. Decode is STRICT (the PNG/QOI contract):
  // bad magic, truncated sub-blocks, out-of-range codes, raster
  // over/underflow and trailing bytes all dead-letter to None. ----

  /** Encode an indexed raster as GIF89a. Palette length must be a power
    * of two in [4, 256] (the GIF minimum LZW code size is 2). */
  def gifEncode(w: Int, h: Int, palette: Array[(Int, Int, Int)], idx: Array[Byte]): Array[Byte] = {
    require(idx.length == w * h, "raster size mismatch")
    val psize = palette.length
    require(psize >= 4 && psize <= 256 && (psize & (psize - 1)) == 0,
      "palette must be a power of two in [4, 256]")
    var bpp = 1
    while ((1 << bpp) < psize) bpp += 1
    val out = new java.io.ByteArrayOutputStream(idx.length + 64)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(w); le16(h)
    out.write(0x80 | ((bpp - 1) << 4) | (bpp - 1)) // global table, 2^bpp entries
    out.write(0); out.write(0)                     // bg index, aspect
    palette.foreach { case (r, g, b) => out.write(r); out.write(g); out.write(b) }
    out.write(0x2c)                                // image descriptor
    le16(0); le16(0); le16(w); le16(h)
    out.write(0)                                   // no local table, not interlaced
    val minCode = math.max(2, bpp)
    out.write(minCode)

    // LZW compress with LSB-first bit packing
    val clear = 1 << minCode
    val eoi = clear + 1
    val data = new java.io.ByteArrayOutputStream(idx.length)
    var bitBuf = 0L
    var bitCnt = 0
    var width = minCode + 1
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += width
      while (bitCnt >= 8) { data.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8 }
    }
    var dict = new java.util.HashMap[Long, Int]()
    var next = eoi + 1
    emit(clear)
    var cur = idx(0) & 0xff
    var i = 1
    while (i < idx.length) {
      val k = idx(i) & 0xff
      val key = (cur.toLong << 8) | k // cur < 4096 (12 bits) + k < 256 (8 bits)
      // getOrDefault, NOT get: a java map parameterized on scala Int
      // unboxes a missing key's null to 0 — a phantom hit on entry 0
      val hit = dict.getOrDefault(key, -1)
      if (hit >= 0) cur = hit
      else {
        emit(cur)
        if (next < 4096) {
          dict.put(key, next)
          next += 1
          // canonical width-bump rule (giflib): the decoder can receive a
          // code equal to its `next` (the KwKwK case), so width must cover
          // `next` itself — bump at next == 2^width, NOT one step later
          if (next >= (1 << width) && width < 12) width += 1
        } else {
          emit(clear)
          dict = new java.util.HashMap[Long, Int]()
          width = minCode + 1
          next = eoi + 1
        }
        cur = k
      }
      i += 1
    }
    emit(cur)
    emit(eoi)
    if (bitCnt > 0) data.write((bitBuf & 0xff).toInt)
    val lzw = data.toByteArray
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n)
      out.write(lzw, off, n)
      off += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Strict GIF decode → (info, palette-resolved RGB raster). */
  def gifDecode(id: Long, bytes: Array[Byte]): Option[(MediaInfo, Array[Byte])] = {
    if (bytes.length < 14) return None
    val sig = new String(bytes, 0, 6, "US-ASCII")
    if (sig != "GIF89a" && sig != "GIF87a") return None
    def le16(at: Int): Int = (bytes(at) & 0xff) | ((bytes(at + 1) & 0xff) << 8)
    val sw = le16(6); val sh = le16(8)
    val flags = bytes(10) & 0xff
    if ((flags & 0x80) == 0) return None // global color table required here
    val psize = 1 << ((flags & 0x07) + 1)
    var p = 13
    if (p + psize * 3 > bytes.length) return None
    val pal = Array.tabulate(psize)(j => (bytes(p + j * 3) & 0xff,
      bytes(p + j * 3 + 1) & 0xff, bytes(p + j * 3 + 2) & 0xff))
    p += psize * 3
    if (p >= bytes.length || (bytes(p) & 0xff) != 0x2c) return None
    if (p + 10 > bytes.length) return None
    val w = le16(p + 5); val h = le16(p + 7)
    if (w <= 0 || h <= 0 || w > sw || h > sh || w.toLong * h > (1 << 26)) return None
    if ((bytes(p + 9) & 0x80) != 0) return None // local tables unsupported
    p += 10
    if (p >= bytes.length) return None
    val minCode = bytes(p) & 0xff
    if (minCode < 2 || minCode > 8) return None
    p += 1

    // gather LZW bytes from sub-blocks
    val data = new java.io.ByteArrayOutputStream(bytes.length)
    var done = false
    while (!done) {
      if (p >= bytes.length) return None
      val n = bytes(p) & 0xff
      p += 1
      if (n == 0) done = true
      else {
        if (p + n > bytes.length) return None
        data.write(bytes, p, n)
        p += n
      }
    }
    if (p >= bytes.length || (bytes(p) & 0xff) != 0x3b) return None
    if (p + 1 != bytes.length) return None // trailing bytes are malformation
    val lzw = data.toByteArray

    // LZW decompress (strict): prefix/suffix tables, KwKwK case, width
    // bumps mirroring the encoder, hard raster-length check
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    val outRaster = new Array[Byte](w * h)
    var outPos = 0
    var next = eoi + 1
    var width = minCode + 1
    var bitBuf = 0L
    var bitCnt = 0
    var bp = 0
    var prev = -1
    def readCode(): Int = {
      while (bitCnt < width && bp < lzw.length) {
        bitBuf |= (lzw(bp) & 0xffL) << bitCnt
        bitCnt += 8
        bp += 1
      }
      if (bitCnt < width) return -1
      val c = (bitBuf & ((1L << width) - 1)).toInt
      bitBuf >>>= width
      bitCnt -= width
      c
    }
    def expand(code0: Int, extra: Int): Boolean = {
      // walk the chain into a small stack, then emit in order
      var code = code0
      var depth = 0
      val stack = new Array[Int](4097)
      if (extra >= 0) { stack(depth) = extra; depth += 1 }
      while (code >= clear + 2) {
        if (depth >= stack.length) return false
        stack(depth) = suffix(code); depth += 1
        code = prefix(code)
      }
      if (code >= psize) return false // root beyond palette
      if (depth >= stack.length) return false
      stack(depth) = code; depth += 1
      if (outPos + depth > outRaster.length) return false
      var d = depth - 1
      while (d >= 0) { outRaster(outPos) = stack(d).toByte; outPos += 1; d -= 1 }
      true
    }
    def firstSym(code0: Int): Int = {
      var code = code0
      while (code >= clear + 2) code = prefix(code)
      code
    }
    var finished = false
    while (!finished) {
      val c = readCode()
      if (c < 0) return None
      if (c == clear) {
        next = eoi + 1; width = minCode + 1; prev = -1
      } else if (c == eoi) {
        finished = true
      } else if (prev == -1) {
        if (c >= clear) return None
        if (!expand(c, -1)) return None
        prev = c
      } else {
        if (c > next) return None
        if (c == next) {
          // KwKwK: emit prev + first(prev)
          if (!expand(prev, firstSym(prev))) return None
        } else {
          if (!expand(c, -1)) return None
        }
        if (next < 4096) {
          prefix(next) = prev
          suffix(next) = if (c == next) firstSym(prev) else firstSym(c)
          next += 1
          // the decoder adds its entry one code LATER than the encoder
          // (nothing is added for the first code after a clear), so its
          // entry count lags the encoder's by exactly one at every stream
          // position — it must bump width one step early to stay in sync
          if (next >= (1 << width) - 1 && width < 12) width += 1
        }
        prev = c
      }
    }
    if (outPos != outRaster.length) return None
    val n = w * h
    var sr = 0L; var sg = 0L; var sb = 0L
    val rgb = new Array[Byte](n * 3)
    var i2 = 0
    while (i2 < n) {
      val pi = outRaster(i2) & 0xff
      if (pi >= psize) return None
      val (r, g, b) = pal(pi)
      rgb(i2 * 3) = r.toByte; rgb(i2 * 3 + 1) = g.toByte; rgb(i2 * 3 + 2) = b.toByte
      sr += r; sg += g; sb += b
      i2 += 1
    }
    Some((MediaInfo(id, "gif", Some(w.toLong), Some(h.toLong),
      Some(sr / n), Some(sg / n), Some(sb / n), None, None, None), rgb))
  }
}
