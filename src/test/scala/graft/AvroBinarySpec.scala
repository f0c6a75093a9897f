package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.AvroBinary
import graft.functions.AvroBinary._

class AvroBinarySpec extends AnyFunSuite {

  private val schema = Seq[AType](ALong, AInt, ABool, ADouble, AString)

  test("round trip is value-exact on random records (negatives, extremes, unicode)") {
    val rnd = new scala.util.Random(13)
    val cases: Seq[Seq[(AType, Any)]] =
      (1 to 200).map { _ =>
        Seq[(AType, Any)](
          (ALong, rnd.nextLong()),
          (AInt, rnd.nextInt()),
          (ABool, rnd.nextBoolean()),
          (ADouble, rnd.nextDouble() * math.pow(10, rnd.nextInt(20) - 10)),
          (AString, Seq("", "x", "héllo", "uné±", "a" * rnd.nextInt(40))(rnd.nextInt(5))))
      } ++ Seq(
        Seq[(AType, Any)]((ALong, Long.MaxValue), (AInt, Int.MinValue), (ABool, false),
          (ADouble, Double.MinPositiveValue), (AString, "edge")),
        Seq[(AType, Any)]((ALong, Long.MinValue), (AInt, Int.MaxValue), (ABool, true),
          (ADouble, -0.0), (AString, "")))
    cases.foreach { fields =>
      val enc = AvroBinary.encodeRecord(fields)
      val dec = AvroBinary.decodeRecord(schema, enc)
      assert(dec.isDefined, s"failed to decode ${fields}")
      val want = fields.map(_._2)
      val got = dec.get
      // compare doubles bit-wise so -0.0 and NaN-adjacent values stay exact
      got.zip(want).foreach {
        case (g: Double, w: Double) =>
          assert(java.lang.Double.doubleToLongBits(g) ===
            java.lang.Double.doubleToLongBits(w))
        case (g, w) => assert(g === w)
      }
    }
  }

  test("zigzag is the Avro mapping (0,-1,1,-2,2 -> 0,1,2,3,4) and self-inverse") {
    assert(Seq(0L, -1L, 1L, -2L, 2L).map(AvroBinary.zigzag) === Seq(0L, 1L, 2L, 3L, 4L))
    val rnd = new scala.util.Random(7)
    (1 to 1000).foreach { _ =>
      val v = rnd.nextLong()
      assert(AvroBinary.unzigzag(AvroBinary.zigzag(v)) === v)
    }
  }

  test("malformed payloads dead-letter: truncation, trailing bytes, overlong varint, bad bool") {
    val ok = AvroBinary.encodeRecord(Seq(
      (ALong, 123456789L), (AInt, -42), (ABool, true), (ADouble, 2.5), (AString, "hey")))
    assert(AvroBinary.decodeRecord(schema, ok).isDefined)
    // truncation at every prefix length must fail, never throw
    (0 until ok.length).foreach { k =>
      assert(AvroBinary.decodeRecord(schema, ok.take(k)).isEmpty, s"prefix $k decoded")
    }
    // trailing garbage is not this record's encoding
    assert(AvroBinary.decodeRecord(schema, ok :+ 0.toByte).isEmpty)
    // an 11-byte all-continuation varint exceeds the 64-bit maximum
    val overlong = Array.fill(11)(0x80.toByte)
    assert(AvroBinary.decodeRecord(Seq(ALong), overlong).isEmpty)
    // bool bytes other than 0/1 are invalid
    val badBool = AvroBinary.encodeRecord(Seq((ALong, 1L))) ++ Array(7.toByte)
    assert(AvroBinary.decodeRecord(Seq(ALong, ABool), badBool).isEmpty)
  }
}
