package graft.functions

/** Protobuf (proto3) WIRE-format primitives — the other ubiquitous Kafka
  * payload beside Avro, and structurally its opposite: Avro is
  * schema-ordered fields with no framing (the reader MUST know the writer
  * schema), protobuf is self-framing tag-value pairs (tag = field_number
  * << 3 | wire_type) that may arrive in ANY order, repeat, or include
  * fields the reader has never heard of — which a correct decoder SKIPS by
  * wire type rather than rejecting (forward compatibility is the
  * protocol's whole point). Wire types implemented: 0 varint (int64 plain,
  * sint64 zigzag), 1 fixed64 (little-endian IEEE double), 2
  * length-delimited (UTF-8 string), 5 fixed32 (not emitted by the query,
  * but skippable).
  *
  * Strictness mirrors AvroBinary: varints cap at 10 bytes, truncation
  * anywhere dead-letters to None; later occurrences of a scalar field
  * overwrite earlier ones (the spec's last-one-wins rule).
  */
object ProtoBinary {

  sealed trait PType
  case object PInt64 extends PType // wire 0, plain varint
  case object PSint64 extends PType // wire 0, zigzag varint
  case object PBool extends PType // wire 0, varint 0/1
  case object PDouble extends PType // wire 1, fixed64 LE
  case object PString extends PType // wire 2, length-delimited

  private def wireOf(t: PType): Int = t match {
    case PDouble => 1
    case PString => 2
    case _       => 0
  }

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

  /** Encode (fieldNumber, type, value) triples in the given order (any
    * order is legal on the wire). */
  def encode(fields: Seq[(Int, PType, Any)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(32)
    fields.foreach { case (num, t, v) =>
      writeVarint(out, (num.toLong << 3) | wireOf(t))
      (t, v) match {
        case (PInt64, x: Long)    => writeVarint(out, x)
        case (PSint64, x: Long)   => writeVarint(out, zigzag(x))
        case (PBool, x: Boolean)  => writeVarint(out, if (x) 1L else 0L)
        case (PDouble, x: Double) =>
          val bits = java.lang.Double.doubleToLongBits(x)
          var i = 0
          while (i < 8) { out.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
        case (PString, x: String) =>
          val b = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          writeVarint(out, b.length.toLong)
          out.write(b)
        case (tt, vv) => throw new IllegalArgumentException(s"type/value mismatch: $tt / $vv")
      }
    }
    out.toByteArray
  }

  /** Decode against a field schema (number → type). Unknown field numbers
    * are SKIPPED by wire type; a known field with the WRONG wire type,
    * any truncation, an overlong varint, or an unsupported wire type (3/4
    * group markers) dead-letter to None. Returns number → value; absent
    * fields simply missing (proto3 default semantics are the caller's
    * concern). */
  def decode(schema: Map[Int, PType], bytes: Array[Byte]): Option[Map[Int, Any]] = {
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
      None
    }
    def readFixed64(): Option[Long] = {
      if (p + 8 > bytes.length) None
      else {
        var bits = 0L
        var i = 7
        while (i >= 0) { bits = (bits << 8) | (bytes(p + i) & 0xffL); i -= 1 }
        p += 8
        Some(bits)
      }
    }
    val out = scala.collection.mutable.Map.empty[Int, Any]
    while (p < bytes.length) {
      val tag = readVarint() match { case Some(t) => t; case None => return None }
      val num = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      schema.get(num) match {
        case Some(t) if wireOf(t) == wire =>
          t match {
            case PInt64 => readVarint() match {
              case Some(v) => out(num) = v; case None => return None }
            case PSint64 => readVarint() match {
              case Some(v) => out(num) = unzigzag(v); case None => return None }
            case PBool => readVarint() match {
              case Some(v) if v == 0L || v == 1L => out(num) = (v == 1L)
              case _ => return None }
            case PDouble => readFixed64() match {
              case Some(b) => out(num) = java.lang.Double.longBitsToDouble(b)
              case None => return None }
            case PString => readVarint() match {
              case Some(len) if len >= 0 && p + len <= bytes.length =>
                out(num) = new String(bytes, p, len.toInt,
                  java.nio.charset.StandardCharsets.UTF_8)
                p += len.toInt
              case _ => return None }
          }
        case Some(_) => return None // known field, wrong wire type
        case None => // unknown field: skip by wire type (forward compat)
          wire match {
            case 0 => if (readVarint().isEmpty) return None
            case 1 => if (readFixed64().isEmpty) return None
            case 2 => readVarint() match {
              case Some(len) if len >= 0 && p + len <= bytes.length => p += len.toInt
              case _ => return None }
            case 5 =>
              if (p + 4 > bytes.length) return None
              p += 4
            case _ => return None // group markers (3/4): unsupported
          }
      }
    }
    Some(out.toMap)
  }
}
