package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ProtoBinary
import graft.functions.ProtoBinary._

class ProtoBinarySpec extends AnyFunSuite {

  private val schema = Map(1 -> (PInt64: PType), 2 -> (PSint64: PType),
    3 -> (PString: PType), 4 -> (PDouble: PType), 5 -> (PBool: PType))

  test("round trip is value-exact under random FIELD ORDER (the wire allows any)") {
    val rnd = new scala.util.Random(53)
    (1 to 200).foreach { _ =>
      val fields: Seq[(Int, PType, Any)] = rnd.shuffle(Seq[(Int, PType, Any)](
        (1, PInt64, math.abs(rnd.nextLong())),
        (2, PSint64, rnd.nextLong()),
        (3, PString, Seq("", "x", "héllo", "a" * rnd.nextInt(30))(rnd.nextInt(4))),
        (4, PDouble, rnd.nextDouble() * 1e6),
        (5, PBool, rnd.nextBoolean())))
      val dec = ProtoBinary.decode(schema, ProtoBinary.encode(fields))
      assert(dec.isDefined)
      fields.foreach { case (num, _, v) =>
        (dec.get(num), v) match {
          case (g: Double, w: Double) =>
            assert(java.lang.Double.doubleToLongBits(g) ===
              java.lang.Double.doubleToLongBits(w))
          case (g, w) => assert(g === w, s"field $num")
        }
      }
    }
  }

  test("unknown fields are skipped by wire type, not rejected (forward compat)") {
    val enc = ProtoBinary.encode(Seq(
      (7, PInt64, 999L), // unknown varint
      (1, PInt64, 5L),
      (8, PDouble, 1.25), // unknown fixed64
      (11, PString, "junk"), // unknown length-delimited
      (3, PString, "keep")))
    val dec = ProtoBinary.decode(schema, enc)
    assert(dec.isDefined)
    assert(dec.get === Map(1 -> 5L, 3 -> "keep"))
  }

  test("last-one-wins for repeated scalar fields (the spec's merge rule)") {
    val enc = ProtoBinary.encode(Seq((1, PInt64, 5L), (1, PInt64, 9L)))
    assert(ProtoBinary.decode(schema, enc).get === Map(1 -> 9L))
  }

  test("malformed payloads dead-letter: truncation, wrong wire type, overlong varint") {
    val ok = ProtoBinary.encode(Seq((1, PInt64, 300L), (3, PString, "abc"),
      (4, PDouble, 2.5)))
    // protobuf messages are self-delimiting only by CONTAINER: a prefix
    // ending exactly on a field boundary is itself a valid message (field
    // 1 is bytes 0-2 here), so only MID-field cuts must dead-letter
    assert(ProtoBinary.decode(schema, ok.take(0)).contains(Map.empty))
    assert(ProtoBinary.decode(schema, ok.take(3)).contains(Map(1 -> 300L)))
    assert(ProtoBinary.decode(schema, ok.take(1)).isEmpty, "tag with no varint")
    assert(ProtoBinary.decode(schema, ok.take(2)).isEmpty, "mid-varint cut")
    assert(ProtoBinary.decode(schema, ok.take(4)).isEmpty, "tag with no length")
    assert(ProtoBinary.decode(schema, ok.take(6)).isEmpty, "mid-string cut")
    assert(ProtoBinary.decode(schema, ok.take(ok.length - 1)).isEmpty, "mid-double cut")
    // field 1 declared varint but sent as fixed64: known field, wrong wire
    val wrongWire = ProtoBinary.encode(Seq((4, PDouble, 1.0)))
      .updated(0, ((1 << 3) | 1).toByte)
    assert(ProtoBinary.decode(schema, wrongWire).isEmpty)
    val overlong = Array((1 << 3).toByte) ++ Array.fill(11)(0x80.toByte)
    assert(ProtoBinary.decode(schema, overlong).isEmpty)
  }
}
