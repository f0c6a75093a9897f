package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MediaCodecs
import graft.operators.MediaCodecs.MediaInfo

/** The real codec half of the multimodal story: header parsing, chunk
  * walking, feature extraction, and the dead-letter path on malformed
  * payloads. */
class MediaCodecsSpec extends AnyFunSuite {
  import TestSpark._

  test("ppm round-trip and comment/whitespace-tolerant header") {
    val enc = MediaCodecs.ppmEncode(4, 3, (10, 20, 30))
    val d = MediaCodecs.ppmDecode(1L, enc).get
    assert((d.width, d.height, d.mean_r, d.mean_g, d.mean_b) ===
      ((Some(4L), Some(3L), Some(10L), Some(20L), Some(30L))))

    // netpbm allows comments and arbitrary whitespace inside the header
    val commented = "P6\n# a comment\n 2\t1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 5, 6, 7)
    val c = MediaCodecs.ppmDecode(2L, commented).get
    assert((c.width, c.height, c.mean_r) === ((Some(2L), Some(1L), Some(3L))))
  }

  test("ppm malformed payloads dead-letter instead of throwing") {
    val enc = MediaCodecs.ppmEncode(4, 3, (10, 20, 30))
    assert(MediaCodecs.ppmDecode(1L, enc.dropRight(1)).isEmpty) // short raster
    assert(MediaCodecs.ppmDecode(1L, "P6\n4 3\n65535\n".getBytes ++
      new Array[Byte](36)).isEmpty)                             // 16-bit maxval unsupported
    assert(MediaCodecs.ppmDecode(1L, "P5\n1 1\n255\nx".getBytes).isEmpty) // wrong magic
  }

  test("wav round-trip, extra chunk tolerated, odd-length alignment") {
    val samples = Array[Short](100, -200, 32767, -32768, 0)
    val enc = MediaCodecs.wavEncode(samples, 44100)
    val d = MediaCodecs.wavDecode(1L, enc).get
    assert((d.sample_rate, d.n_samples, d.peak) ===
      ((Some(44100L), Some(5L), Some(32768L))))
    // rms = floor(sqrt(mean of squares)); zero crossings on >=0 sign flips:
    // 100 -> -200 -> 32767 -> -32768 -> 0 flips at every step
    val sumSq = samples.map(s => s.toLong * s).sum
    assert(d.rms === Some(math.floor(math.sqrt(sumSq.toDouble / 5)).toLong))
    assert(d.zero_cross === Some(4L))

    // splice an odd-length LIST chunk between fmt and data: the walker must
    // skip it (word-aligned) and still find data
    val head = enc.take(36) // RIFF..fmt chunk
    val tail = enc.drop(36) // data chunk
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte]('a', 'b', 'c', 0) // 3 bytes + pad
    val spliced = head ++ listChunk ++ tail
    val s2 = MediaCodecs.wavDecode(2L, spliced).get
    assert(s2.peak === Some(32768L))
  }

  test("wav malformed payloads dead-letter") {
    val enc = MediaCodecs.wavEncode(Array[Short](1, 2, 3), 8000)
    assert(MediaCodecs.wavDecode(1L, enc.dropRight(2)).isEmpty) // truncated data
    val stereo = enc.clone()
    stereo(22) = 2 // channels=2 unsupported
    assert(MediaCodecs.wavDecode(1L, stereo).isEmpty)
    assert(MediaCodecs.wavDecode(1L, "RIFFxxxxNOPE".getBytes).isEmpty)
  }

  test("nearest-neighbor resize samples floor(i*src/dst) on a gradient") {
    // 4x2 raster with per-pixel distinct red channel: pixel (x,y) = (10x+y, 0, 0)
    val header = "P6\n4 2\n255\n".getBytes("US-ASCII")
    val raster = (for (y <- 0 until 2; x <- 0 until 4)
      yield Seq((10 * x + y).toByte, 0.toByte, 0.toByte)).flatten.toArray
    val src = header ++ raster

    val out = MediaCodecs.ppmResizeNearest(src, 2, 1).get
    // dst (0,0) <- src(0,0)=0; dst (1,0) <- src(2,0)=20
    assert(out.startsWith("P6\n2 1\n255\n".getBytes("US-ASCII")))
    val outRaster = out.drop("P6\n2 1\n255\n".length)
    assert(outRaster.toSeq == Seq[Byte](0, 0, 0, 20, 0, 0))

    // upscale also works (repeats source pixels), malformed input dead-letters
    val up = MediaCodecs.ppmResizeNearest(src, 8, 2).get
    assert(up.length == "P6\n8 2\n255\n".length + 8 * 2 * 3)
    assert(MediaCodecs.ppmResizeNearest("nope".getBytes, 2, 2).isEmpty)
    assert(MediaCodecs.ppmResizeNearest(src, 0, 2).isEmpty)
  }

  private def bmp24(w: Int, h: Int, bgr: (Int, Int, Int)): Array[Byte] = {
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val buf = java.nio.ByteBuffer.allocate(54 + rowBytes * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + rowBytes * h)
      .putInt(0).putInt(54)          // reserved, data offset
      .putInt(40).putInt(w).putInt(h) // BITMAPINFOHEADER
      .putShort(1).putShort(24).putInt(0).putInt(rowBytes * h)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (_ <- 0 until h) {
      for (_ <- 0 until w) {
        buf.put(bgr._1.toByte).put(bgr._2.toByte).put(bgr._3.toByte)
      }
      for (_ <- w * 3 until rowBytes) buf.put(0.toByte) // row padding
    }
    buf.array()
  }

  test("bmp decode: little-endian header, BGR order, padded rows") {
    // w=3 -> 9 data bytes per row padded to 12: the padding must be skipped
    val d = MediaCodecs.bmpDecode(1L, bmp24(3, 2, (10, 20, 30))).get
    assert((d.format, d.width, d.height) === (("bmp", Some(3L), Some(2L))))
    assert((d.mean_r, d.mean_g, d.mean_b) === ((Some(30L), Some(20L), Some(10L))))
    // malformed: truncated raster, wrong bpp
    assert(MediaCodecs.bmpDecode(1L, bmp24(3, 2, (1, 2, 3)).dropRight(4)).isEmpty)
    val bpp8 = bmp24(2, 2, (1, 2, 3)); bpp8(28) = 8
    assert(MediaCodecs.bmpDecode(1L, bpp8).isEmpty)
  }

  test("decodeMedia dispatches by magic and drops undecodables") {
    import spark.implicits._
    val rows = Seq(
      (1L, MediaCodecs.ppmEncode(2, 2, (5, 5, 5))),
      (2L, MediaCodecs.wavEncode(Array[Short](7, -9), 16000)),
      (3L, bmp24(2, 1, (9, 8, 7))),
      (4L, Array[Byte](0x47, 0x49, 0x46, 1, 2))) // GIF magic: not implemented -> dropped
    val out: Seq[MediaInfo] = MediaCodecs.decodeMedia(rows.toDS()).collect().toSeq
    assert(out.map(_.doc_id).sorted == Seq(1L, 2L, 3L))
    assert(out.find(_.doc_id == 1L).get.format == "ppm")
    assert(out.find(_.doc_id == 2L).get.peak == Some(9L))
    assert(out.find(_.doc_id == 3L).get.mean_r == Some(7L))
  }

  test("qoi: encode/decode round trip is pixel-exact on adversarial rasters") {
    val rnd = new scala.util.Random(21)
    // random (RGB ops), constant (RUN), gradient (DIFF/LUMA), palette (INDEX)
    val rasters = Seq(
      (8, 5, Array.fill(8 * 5 * 3)(rnd.nextInt(256).toByte)),
      (62, 3, Array.fill(62 * 3 * 3)(77.toByte)), // 62+ runs hit the run-length cap
      (16, 4, Array.tabulate(16 * 4 * 3)(i => ((i / 3) % 256).toByte)),
      (10, 10, Array.tabulate(10 * 10 * 3)(i => (((i / 3) % 4) * 50).toByte)))
    rasters.foreach { case (w, h, rgb) =>
      val enc = MediaCodecs.qoiEncode(w, h, rgb)
      val dec = MediaCodecs.qoiDecode(1L, enc)
      assert(dec.isDefined, s"${w}x$h failed to decode")
      assert(java.util.Arrays.equals(dec.get._2, rgb), s"${w}x$h not pixel-exact")
      assert(dec.get._1.width === Some(w.toLong) && dec.get._1.height === Some(h.toLong))
    }
  }

  test("qoi: malformed payloads dead-letter (bad magic, truncated, run overrun)") {
    val ok = MediaCodecs.qoiEncode(3, 3, Array.fill(27)(1.toByte))
    assert(MediaCodecs.qoiDecode(1L, "qoix".getBytes ++ ok.drop(4)).isEmpty)
    assert(MediaCodecs.qoiDecode(1L, ok.take(16)).isEmpty)
    // hand-built: 2x1 image whose single RUN op claims 5 pixels
    val overrun = Array[Byte]('q', 'o', 'i', 'f', 0, 0, 0, 2, 0, 0, 0, 1, 3, 0,
      0xfe.toByte, 1, 2, 3, (0xc0 | 4).toByte, 0, 0, 0, 0, 0, 0, 0, 1)
    assert(MediaCodecs.qoiDecode(1L, overrun).isEmpty)
  }

  test("qoi: decodes the RGBA op and alpha feeds the index hash") {
    // 1x2 RGBA image: RGBA pixel then INDEX referencing it would need the
    // alpha-aware hash; here just RGBA then RUN via repeat
    val p = Array[Byte]('q', 'o', 'i', 'f', 0, 0, 0, 1, 0, 0, 0, 2, 4, 0,
      0xff.toByte, 10, 20, 30, 128.toByte, 0xc0.toByte, // run of 1 more
      0, 0, 0, 0, 0, 0, 0, 1)
    val dec = MediaCodecs.qoiDecode(9L, p)
    assert(dec.isDefined)
    assert(dec.get._2.toSeq === Seq[Byte](10, 20, 30, 10, 20, 30))
  }

  test("png: encode/decode round trip is pixel-exact and exercises all five filters") {
    val rnd = new scala.util.Random(47)
    // h >= 5 so the y % 5 filter cycle hits None/Sub/Up/Average/Paeth
    val rasters = Seq(
      (7, 5, Array.fill(7 * 5 * 3)(rnd.nextInt(256).toByte)),
      (3, 9, Array.fill(3 * 9 * 3)(200.toByte)),
      (16, 6, Array.tabulate(16 * 6 * 3)(i => ((i / 3) % 256).toByte)),
      (1, 7, Array.tabulate(1 * 7 * 3)(i => (i * 37 % 256).toByte)))
    rasters.foreach { case (w, h, rgb) =>
      val enc = MediaCodecs.pngEncode(w, h, rgb)
      val dec = MediaCodecs.pngDecode(1L, enc)
      assert(dec.isDefined, s"${w}x$h failed to decode")
      assert(java.util.Arrays.equals(dec.get._2, rgb), s"${w}x$h not pixel-exact")
      assert(dec.get._1.format === "png")
      assert(dec.get._1.width === Some(w.toLong) && dec.get._1.height === Some(h.toLong))
    }
  }

  test("png: malformed payloads dead-letter (bad magic, flipped CRC, truncated IDAT)") {
    val ok = MediaCodecs.pngEncode(4, 6, Array.tabulate(4 * 6 * 3)(i => (i % 251).toByte))
    assert(MediaCodecs.pngDecode(1L, ok).isDefined)
    // bad signature
    val badSig = ok.clone(); badSig(1) = 'X'
    assert(MediaCodecs.pngDecode(1L, badSig).isEmpty)
    // flip one byte inside the IDAT payload -> CRC mismatch must reject
    val flipped = ok.clone(); flipped(8 + 25 + 12) = (flipped(8 + 25 + 12) ^ 0x5a).toByte
    assert(MediaCodecs.pngDecode(1L, flipped).isEmpty)
    // truncated file
    assert(MediaCodecs.pngDecode(1L, ok.take(40)).isEmpty)
  }

  test("png: rgba input drops alpha; unknown ancillary chunks are tolerated") {
    // hand-build a 1x1 RGBA png via the encoder path pieces: reuse encode
    // for RGB then splice a color-type-6 image made by hand
    val w = 2; val h = 1
    val raw = Array[Byte](0, 10, 20, 30, 40, 50, 60, 70, 80) // filter 0 + 2 RGBA px
    val deflater = new java.util.zip.Deflater(6)
    deflater.setInput(raw); deflater.finish()
    val zbuf = new Array[Byte](64)
    val zlen = deflater.deflate(zbuf); deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    def chunk(tag: String, data: Array[Byte]): Unit =
      MediaCodecs.pngChunk(out, tag, data)
    chunk("IHDR", java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(6.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array())
    chunk("tEXt", "comment".getBytes("US-ASCII")) // ancillary, must be skipped
    chunk("IDAT", zbuf.take(zlen))
    chunk("IEND", Array.emptyByteArray)
    val dec = MediaCodecs.pngDecode(5L, out.toByteArray)
    assert(dec.isDefined)
    assert(dec.get._2.toSeq === Seq[Byte](10, 20, 30, 50, 60, 70))
  }

  test("gif round-trips rasters incl. width bumps and the 4096-entry clear") {
    val rnd = new scala.util.Random(61)
    // small structured images: runs (LZW back-references) + noise
    for (trial <- 1 to 20) {
      val w = 2 + rnd.nextInt(9)
      val h = 2 + rnd.nextInt(7)
      val psize = Seq(4, 8, 16, 256)(rnd.nextInt(4))
      val pal = Array.tabulate(psize)(j => (rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)))
      val idx = Array.tabulate(w * h) { i =>
        (if (i % 5 == 0) (i / w) % psize else rnd.nextInt(psize)).toByte
      }
      val enc = MediaCodecs.gifEncode(w, h, pal, idx)
      val (info, rgb) = MediaCodecs.gifDecode(trial.toLong, enc).get
      assert((info.width, info.height) === ((Some(w.toLong), Some(h.toLong))), s"trial $trial")
      val expect = idx.flatMap { b =>
        val (r, g, bl) = pal(b & 0xff); Array(r.toByte, g.toByte, bl.toByte)
      }
      assert(rgb.toSeq === expect.toSeq, s"trial $trial raster")
    }
    // LARGE noise image: dictionary crosses every width bump and the
    // 4096-entry cap (mid-stream clear + re-grow) — the boundary where a
    // width-rule off-by-one desyncs encoder and decoder
    val w = 128; val h = 200
    val pal = Array.tabulate(256)(j => (j, (j * 7) % 256, (j * 13) % 256))
    val idx = Array.tabulate(w * h)(_ => rnd.nextInt(256).toByte)
    val enc = MediaCodecs.gifEncode(w, h, pal, idx)
    val (info, rgb) = MediaCodecs.gifDecode(99L, enc).get
    assert((info.width, info.height) === ((Some(128L), Some(200L))))
    assert(rgb.length === w * h * 3)
    val expect = idx.flatMap { b =>
      val (r, g, bl) = pal(b & 0xff); Array(r.toByte, g.toByte, bl.toByte)
    }
    assert(rgb.toSeq === expect.toSeq)
  }

  test("gif malformed inputs dead-letter to None") {
    val pal = Array.tabulate(4)(j => (j * 10, j * 20, j * 30))
    val good = MediaCodecs.gifEncode(3, 2, pal, Array[Byte](0, 1, 2, 3, 0, 1))
    assert(MediaCodecs.gifDecode(1L, good).isDefined)
    assert(MediaCodecs.gifDecode(1L, good.dropRight(1)).isEmpty)      // no trailer
    assert(MediaCodecs.gifDecode(1L, good :+ 0.toByte).isEmpty)       // trailing bytes
    assert(MediaCodecs.gifDecode(1L, good.take(10)).isEmpty)          // truncated header
    val badMagic = good.clone; badMagic(0) = 'X'.toByte
    assert(MediaCodecs.gifDecode(1L, badMagic).isEmpty)
    val truncBlock = good.take(good.length - 8)                       // inside sub-block
    assert(MediaCodecs.gifDecode(1L, truncBlock).isEmpty)
    assert(MediaCodecs.gifDecode(1L, Array.emptyByteArray).isEmpty)
  }
}
