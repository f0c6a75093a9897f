package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{Converters => Cv, TextFunctions => Tf}

class ConvertersSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("temporal converters match debezium epoch semantics") {
    val df = Seq("2024-01-02 03:04:05.123456").toDF("s")
      .select(col("s").cast("timestamp_ntz").as("ts"))
    val r = df.select(
      Cv.epochDays(col("ts")).as("d"),
      Cv.epochMillis(col("ts")).as("ms"),
      Cv.epochMicros(col("ts")).as("us"),
      Cv.microsSinceMidnight(Cv.epochMicros(col("ts"))).as("mod")).head()
    assert(r.getAs[Long]("d") === 19724L)
    assert(r.getAs[Long]("ms") === 1704164645123L)
    assert(r.getAs[Long]("us") === 1704164645123456L)
    assert(r.getAs[Long]("mod") === (3L * 3600 + 4 * 60 + 5) * 1000000 + 123456)
  }

  test("money converter strips symbol and commas (money.go semantics)") {
    val r = Seq("$1,234,567.89", "$12.05", "7.20").toDF("m")
      .select(Cv.moneyToDecimal(col("m")).cast("string").as("v"))
      .collect().map(_.getString(0))
    assert(r.toSeq === Seq("1234567.89", "12.05", "7.20"))
  }

  test("decimal converter pins scale exactly") {
    val r = Seq(151998.3799999999d).toDF("x")
      .select(Cv.decimalString(col("x")).as("s"), Cv.unscaledLong(col("x")).as("u")).head()
    assert(r.getString(0) === "151998.38")
    assert(r.getLong(1) === 15199838L)
  }

  test("uuid converter shape + determinism") {
    val r = Seq(42L, 42L).toDF("k").select(Cv.uuidFromKey(col("k")).as("u"))
      .collect().map(_.getString(0))
    assert(r(0) === r(1))
    assert(r(0).matches("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"))
  }

  test("bit extraction and popcount") {
    val r = Seq(11L).toDF("k") // 1011
      .select(Cv.bitAt(col("k"), 0).as("b0"), Cv.bitAt(col("k"), 2).as("b2"),
        Cv.popCount(col("k")).as("p")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((1L, 0L, 3L)))
  }

  test("mssql GUID mixed-endian byte order (go-mssqldb String() pinning)") {
    // wire bytes 00112233 4455 6677 8899AABBCCDDEEFF: first three groups
    // little-endian -> 33221100-5544-7766, last two big-endian
    val r = Seq("00112233445566778899AABBCCDDEEFF").toDF("h")
      .select(Cv.mssqlGuid(unhex(col("h"))).as("g")).head().getString(0)
    assert(r === "33221100-5544-7766-8899-AABBCCDDEEFF")
  }

  test("hash60 is 60-bit non-negative and stable") {
    val r = Seq("abc", "abc").toDF("s").select(Tf.hash60(col("s")).as("h"))
      .collect().map(_.getLong(0))
    assert(r(0) === r(1) && r(0) >= 0 && r(0) < (1L << 60))
  }

  test("SET bitmask renders comma-joined declared options (asSet pinning)") {
    val opts = Seq("a", "b", "c", "d")
    def render(mask: Long): String =
      Seq(mask).toDF("m").select(Cv.setString(col("m"), opts).as("s")).head().getString(0)
    assert(render(0L) === "") // empty set = strings.Join of empty slice
    assert(render(1L) === "a")
    assert(render(5L) === "a,c") // bits 0 and 2
    assert(render(15L) === "a,b,c,d")
    assert(render(8L) === "d")
  }

  test("non-strict zero dates null out; well-formed and short strings survive") {
    val rows = Seq(
      ("0000-00-00 00:00:00", true),
      ("2024-00-15 10:30:00", true),
      ("2024-07-00 10:30:00", true),
      ("0000-xx-01 10:30:00", true), // year hits zero before the bad month (go loop order)
      ("2024-xx-00 10:30:00", false), // Atoi fails on month before day is checked
      ("2024-07-15 10:30:00", false),
      ("2024-7-5", false), // < 10 chars: length guard
      ("2024-10-05", false))
      .toDF("d", "expect")
    val bad = rows.select(Cv.nonStrictInvalidDate(col("d")).as("got"), col("expect"))
      .where(col("got") =!= col("expect")).count()
    assert(bad === 0)
    // the converter itself: zero date -> NULL, valid -> parsed epoch
    val r = Seq("0000-00-00 00:00:00", "1970-01-01 00:00:10").toDF("d")
      .select(unix_millis(Cv.mysqlDatetime(col("d"))).as("ms")).collect()
    assert(r(0).isNullAt(0) && r(1).getLong(0) === 10000L)
  }

  test("bit varying packs little-endian minimal bytes; invalid lanes NULL") {
    // independent reference: BigInteger base-2 -> toByteArray (big-endian,
    // possibly with a sign byte) -> strip leading zeros -> reverse -> hex
    def ref(bits: String): String = {
      val bytes = new java.math.BigInteger(bits, 2).toByteArray
        .dropWhile(_ == 0).reverse
      bytes.map(b => f"${b & 0xff}%02X").mkString
    }
    val cases = Seq("1", "0", "100000000", "1111111100000001", "00000001",
      "101", "11111111111111111111111111111111")
    val got = cases.toDF("b")
      .select(col("b"), Cv.bitVaryingHex(col("b"), 32).as("h")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach(c => assert(got(c) === ref(c), s"bits=$c"))
    assert(got("0") === "") // big.Int.Bytes() of zero is empty
    val invalid = Seq("10201", "abc", "1" * 33).toDF("b")
      .select(Cv.bitVaryingHex(col("b"), 32).as("h")).collect()
    assert(invalid.forall(_.isNullAt(0))) // error lane
  }

  test("timetz: three layouts normalize to GMT, wrap midnight, reject bad inputs") {
    // expectations mirror Go: parse the offset clock time, convert to UTC,
    // format 15:04:05.000000Z (sources/postgres/adapter/converters.go:23-44)
    val cases = Seq(
      "15:04:05-07" -> "22:04:05.000000Z", // negative offset adds
      "15:04:05.123-07" -> "22:04:05.123000Z", // ms layout
      "15:04:05.123456+05" -> "10:04:05.123456Z", // us layout
      "01:30:00+05" -> "20:30:00.000000Z", // wraps below midnight
      "23:30:00-01" -> "00:30:00.000000Z", // wraps above midnight
      "00:00:00+00" -> "00:00:00.000000Z",
      "25:04:05-07" -> null, // hour out of range (shape-valid)
      "15:04:05.12-07" -> null, // 2-digit fraction: not an accepted layout
      "15:04:05" -> null, // missing offset
      "15:04:05-0730" -> null, // minute offsets not in the layout set
      "garbage" -> null)
    val got = cases.map(_._1).toDF("t")
      .select(col("t"), Cv.timeTzUtcString(col("t")).as("u")).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    cases.foreach { case (in, want) => assert(got(in) === want, s"input=$in") }
  }
}
