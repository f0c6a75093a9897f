package graft.functions

/** Avro BINARY encoding primitives (the Kafka wire format reader-style
  * pipelines meet constantly; reference behavior: the Debezium envelope
  * tier consumes the JSON rendering of the same records —
  * lib/debezium/transformer — while real deployments ship Avro): zigzag
  * varint ints/longs, length-prefixed UTF-8 strings/bytes, 1-byte
  * booleans, 8-byte little-endian IEEE doubles, record = fields
  * back-to-back in writer-schema order (no tags, no framing — the schema
  * IS the structure, which is why decode must be schema-driven).
  *
  * The decoder is strict where the spec allows it: a varint may span at
  * most 10 bytes (64-bit range), truncated input and TRAILING bytes both
  * dead-letter to None — the converter-error analogue of reader's per-row
  * error returns, same contract as the media codecs.
  */
object AvroBinary {

  sealed trait AType
  case object ALong extends AType
  case object AInt extends AType
  case object ABool extends AType
  case object ADouble extends AType
  case object AString extends AType

  def zigzag(n: Long): Long = (n << 1) ^ (n >> 63)
  def unzigzag(z: Long): Long = (z >>> 1) ^ -(z & 1L)

  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  /** Encode one record in writer-schema order. Values must match types:
    * ALong→Long, AInt→Int, ABool→Boolean, ADouble→Double, AString→String. */
  def encodeRecord(fields: Seq[(AType, Any)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(32)
    fields.foreach {
      case (ALong, v: Long)      => writeVarint(out, zigzag(v))
      case (AInt, v: Int)        => writeVarint(out, zigzag(v.toLong))
      case (ABool, v: Boolean)   => out.write(if (v) 1 else 0)
      case (ADouble, v: Double)  =>
        val bits = java.lang.Double.doubleToLongBits(v)
        var i = 0
        while (i < 8) { out.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
      case (AString, v: String)  =>
        val b = v.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        writeVarint(out, zigzag(b.length.toLong)) // lengths are Avro longs: zigzag too
        out.write(b)
      case (t, v) => throw new IllegalArgumentException(s"type/value mismatch: $t / $v")
    }
    out.toByteArray
  }

  /** Schema-driven decode; None on truncation, varint overrun (> 10
    * bytes), negative length, or trailing bytes. */
  def decodeRecord(schema: Seq[AType], bytes: Array[Byte]): Option[Seq[Any]] = {
    var p = 0
    def readVarint(): Option[Long] = {
      var shift = 0
      var v = 0L
      var n = 0
      while (n < 10) {
        if (p >= bytes.length) return None
        val b = bytes(p) & 0xff
        p += 1
        // Strictness: at shift 63 only ONE payload bit fits in a Long; a
        // 10th byte with any higher bit set would silently alias two
        // distinct encodings onto one value — reject instead.
        if (shift == 63 && (b & 0x7e) != 0) return None
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return Some(v)
        shift += 7
        n += 1
      }
      None // varint longer than the 64-bit maximum
    }
    val out = Seq.newBuilder[Any]
    schema.foreach { t =>
      val v: Option[Any] = t match {
        case ALong => readVarint().map(unzigzag)
        case AInt  => readVarint().map(z => unzigzag(z).toInt)
        case ABool =>
          if (p >= bytes.length) None
          else { val b = bytes(p); p += 1
            if (b == 0 || b == 1) Some(b == 1) else None }
        case ADouble =>
          if (p + 8 > bytes.length) None
          else {
            var bits = 0L
            var i = 7
            while (i >= 0) { bits = (bits << 8) | (bytes(p + i) & 0xffL); i -= 1 }
            p += 8
            Some(java.lang.Double.longBitsToDouble(bits))
          }
        case AString =>
          readVarint().map(unzigzag).flatMap { len =>
            if (len < 0 || p + len > bytes.length) None
            else {
              val s = new String(bytes, p, len.toInt,
                java.nio.charset.StandardCharsets.UTF_8)
              p += len.toInt
              Some(s)
            }
          }
      }
      v match {
        case Some(x) => out += x
        case None    => return None
      }
    }
    if (p != bytes.length) None // trailing bytes: not this record's encoding
    else Some(out.result())
  }
}
