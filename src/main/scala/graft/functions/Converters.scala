package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Debezium-style type converters, re-expressed as codegen'd Column
  * expressions instead of reader's per-row interface dispatch
  * (reference: lib/debezium/converters/converters.go — ValueConverter).
  *
  * Reader converts one value at a time through ~23 converter structs; on
  * Spark the same logical conversions are declarative expressions that
  * whole-stage codegen fuses into the scan loop — no virtual dispatch, no
  * boxing, and Catalyst can constant-fold/prune around them.
  *
  * All integer-valued outputs are BIGINT so results compare cleanly against
  * DuckDB oracles (which default to int64).
  */
object Converters {

  // ---- temporal (reference: lib/debezium/converters/time.go) ----

  /** Debezium `Date`: days since epoch (DateConverter, time.go:80+). */
  def epochDays(c: Column): Column =
    datediff(c.cast("date"), to_date(lit("1970-01-01"))).cast("long")

  /** Debezium `Timestamp`: milliseconds since epoch (time.go Timestamp). */
  def epochMillis(c: Column): Column = unix_millis(c.cast("timestamp"))

  /** Debezium `MicroTimestamp`: microseconds since epoch. */
  def epochMicros(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Debezium `MicroTime`: microseconds past midnight, no TZ
    * (MicroTimeConverter, time.go:32-58). Takes raw epoch micros. */
  def microsSinceMidnight(epochMicros: Column): Column =
    pmod(epochMicros, lit(86400000000L))

  /** ISO date string (reader renders dates via time.Format downstream). */
  def isoDate(c: Column): Column = c.cast("date").cast("string")

  /** Debezium `ZonedTimestamp` (ZonedTimestampConverter, time.go:180-208):
    * GMT ISO-8601 string with up-to-µs precision, TRAILING FRACTIONAL
    * ZEROS TRIMMED (Go's ".999999" layout drops them, and the dot when the
    * fraction is zero). Years outside [0, 9999] convert to NULL, mirroring
    * the reference's skip-on-marshal-error guard. */
  def zonedTimestamp(c: Column): Column = {
    val ts = c.cast("timestamp")
    val fixed = date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    val trimmed = regexp_replace(regexp_replace(fixed, lit("0+$"), lit("")), lit("\\.$"), lit(""))
    when(year(ts).between(0, 9999), concat(trimmed, lit("Z")))
  }

  /** Debezium `Year` (YearConverter, time.go:210-223): int32 year. */
  def yearInt(c: Column): Column = year(c.cast("timestamp")).cast("int")

  // ---- duration (reference: lib/debezium/converters/time_duration.go) ----
  // getTimeDuration(t, unit) = (hours + minutes + seconds + nanos) / unit:
  // the time-of-day expressed in the given unit. TimeConverter emits int32
  // milliseconds, MicroTimeConverter int64 micros, NanoTimeConverter int64
  // nanos (time.go:15-77). Input here is raw epoch nanoseconds (the events
  // table's physical clock); day truncation is the pmod.

  private val DayNanos = 86400000000000L

  /** Exact floor division for |a| < 2^53: subtract the remainder first so
    * the double divide has an integer quotient (no rounding hazard). */
  private def longDiv(a: Column, b: Long): Column =
    ((a - pmod(a, lit(b))) / lit(b)).cast("long")

  /** Debezium `Time`: int32 milliseconds past midnight. */
  def timeOfDayMillis(epochNanos: Column): Column =
    longDiv(pmod(epochNanos, lit(DayNanos)), 1000000L).cast("int")

  /** Debezium `MicroTime`: int64 microseconds past midnight. */
  def timeOfDayMicros(epochNanos: Column): Column =
    longDiv(pmod(epochNanos, lit(DayNanos)), 1000L)

  /** Debezium `NanoTime`: int64 nanoseconds past midnight. */
  def timeOfDayNanos(epochNanos: Column): Column =
    pmod(epochNanos, lit(DayNanos))

  // ---- checked integer widths (reference: lib/debezium/converters/int.go) ----
  // asInt16/asInt32 REJECT values that overflow the declared width instead
  // of silently wrapping (int.go:8-51). The columnar analogue of the error
  // return is NULL-on-overflow plus an explicit fits flag, so a pipeline can
  // route overflows to a dead-letter side instead of aborting the batch.

  /** int16 downcast, NULL when the value overflows (asInt16, int.go:8-30). */
  def checkedInt16(c: Column): Column =
    when(c.between(Short.MinValue.toLong, Short.MaxValue.toLong), c.cast("smallint"))

  def fitsInt16(c: Column): Column =
    c.between(Short.MinValue.toLong, Short.MaxValue.toLong)

  /** int32 downcast, NULL when the value overflows (asInt32, int.go:33-51). */
  def checkedInt32(c: Column): Column =
    when(c.between(Int.MinValue.toLong, Int.MaxValue.toLong), c.cast("int"))

  def fitsInt32(c: Column): Column =
    c.between(Int.MinValue.toLong, Int.MaxValue.toLong)

  // ---- decimal / money (reference: lib/debezium/converters/decimal.go, money.go) ----

  /** Scale-pinned exact decimal: the Spark analogue of
    * encodeDecimalWithScale (decimal.go:14-28) — the value is locked to the
    * declared scale at the type level, so scale drift is impossible by
    * construction rather than checked per row. */
  def toDecimal(c: Column, precision: Int = 12, scale: Int = 2): Column =
    c.cast(s"decimal($precision,$scale)")

  /** Canonical string rendering of a scale-pinned decimal. */
  def decimalString(c: Column, precision: Int = 12, scale: Int = 2): Column =
    toDecimal(c, precision, scale).cast("string")

  /** Kafka-connect unscaled integer for a decimal (decimal.go encodes
    * big-endian bytes of the unscaled value; we surface the integer itself,
    * which is the information content). Arithmetic stays in DECIMAL space
    * end-to-end — a double multiply + round would lose integer precision
    * above ~2^53/10^scale, diverging from Debezium's exact unscaled
    * encoding. The value is pinned to `scale` by the decimal cast (HALF_UP,
    * matching Debezium/Kafka-connect), then the power-of-ten shift is an
    * exact decimal multiply. */
  def unscaledLong(c: Column, scale: Int = 2): Column = {
    require(scale >= 0 && scale <= 6, "scale out of supported range")
    val p10 = math.pow(10, scale).toLong
    (toDecimal(c, 24 + scale, scale) * lit(p10).cast("decimal(7,0)")).cast("long")
  }

  /** Money parse (money.go:39-60): strip currency symbol + grouping commas,
    * then pin to scale 2. `translate` (per-char table lookup) over a regex
    * engine: the stripped set is a fixed character list, not a pattern. */
  def moneyToDecimal(c: Column, currencySymbol: String = "$"): Column =
    translate(c, currencySymbol + ",", "").cast("decimal(12,2)")

  // ---- postgres interval / hstore parse (lib/postgres/parse/parse.go) ----
  // parse.go:68-80 scans interval strings into pgtype.Interval{Days,
  // Microseconds} (components kept separate, not normalized); parse.go:
  // 112-126 scans hstore '"k"=>"v"' text into a string map. Both arrive
  // from the wire as text, so the columnar analogue is anchored regex
  // extraction — codegen'd, no per-row driver.

  /** Days component of a 'D days HH:MM:SS' interval string (0 if absent). */
  def intervalDays(c: Column): Column = {
    val d = regexp_extract(c, "(\\d+) days?", 1)
    when(d === "", 0L).otherwise(d.cast("long"))
  }

  /** Time-of-day component of an interval string, in microseconds. */
  def intervalTimeMicros(c: Column): Column = {
    def part(g: Int): Column = {
      val v = regexp_extract(c, "(\\d{2}):(\\d{2}):(\\d{2})", g)
      when(v === "", 0L).otherwise(v.cast("long"))
    }
    (part(1) * 3600L + part(2) * 60L + part(3)) * 1000000L
  }

  /** Debezium MicroDuration: the whole interval collapsed to microseconds
    * (days at 24h — the same convention Debezium's interval.go uses). */
  def intervalMicroDuration(c: Column): Column =
    intervalDays(c) * 86400000000L + intervalTimeMicros(c)

  /** Value for `key` in an hstore text rendering; NULL when the key is
    * absent OR carries hstore NULL (parse.go drops NULL-valued keys from
    * the map — `"k"=>NULL` renders unquoted, so requiring the value's
    * opening quote in the presence test treats it as absent). Presence is
    * tested separately from extraction so a present-but-EMPTY value
    * (`"k"=>""`) stays "" rather than collapsing into NULL. */
  def hstoreValue(c: Column, key: String): Column = {
    val quoted = java.util.regex.Pattern.quote(key)
    val present = c.rlike("\"" + quoted + "\"=>\"")
    when(present, regexp_extract(c, "\"" + quoted + "\"=>\"([^\"]*)\"", 1))
  }

  /** PG TIME WITH TIME ZONE → GMT-normalized "HH:mm:ss.ffffffZ" string
    * (sources/postgres/adapter/converters.go:13-44 TimeWithTimezoneConverter
    * + lib/timeutil/exact.go:8-18 ParseExact). The reference accepts exactly
    * three layouts — plain / .ms / .us seconds, offset ±HH — by parsing and
    * requiring the value to round-trip; re-expressed here as a strict shape
    * gate (anchored regex + field range checks — equivalent acceptance for
    * all-numeric layouts) feeding pure integer arithmetic. No engine
    * timestamp functions anywhere, so the oracle replays the conversion
    * bit-identically; the clock wraps modulo 24h exactly like Go's
    * time-only parse. Invalid inputs dead-letter to NULL. */
  def timeTzUtcString(c: Column): Column = {
    val shape = "^\\d{2}:\\d{2}:\\d{2}(\\.\\d{3}|\\.\\d{6})?[+-]\\d{2}$"
    // empty-safe int: ANSI mode throws on cast(""), and Spark's AND does
    // not short-circuit inside codegen, so every cast must be null-gated
    def num(s: Column): Column =
      when(s === "", lit(null)).otherwise(s).cast("int")
    val h = num(substring(c, 1, 2))
    val mi = num(substring(c, 4, 2))
    val se = num(substring(c, 7, 2))
    // ONE regex (the shape gate) per row instead of six; with the shape
    // pinned, every field position follows from the total length (11 plain
    // / 15 ms / 18 us) — the remaining extraction is substring arithmetic
    val sign = when(substring(c, -3, 1) === "+", lit(1)).otherwise(lit(-1))
    val oh = num(substring(c, -2, 2))
    val fracUs = when(length(c) === 11, lit(0L))
      .when(length(c) === 15, num(substring(c, 10, 3)).cast("long") * 1000L)
      .when(length(c) === 18, num(substring(c, 10, 6)).cast("long"))
      .otherwise(lit(null).cast("long"))
    val valid = c.rlike(shape) &&
      h <= 23 && mi <= 59 && se <= 59 && oh <= 23
    val utcSec = pmod(h * 3600 + mi * 60 + se - sign * oh * lit(3600), lit(86400))
    when(valid,
      concat(
        lpad(floor(utcSec / 3600).cast("string"), 2, "0"), lit(":"),
        lpad(floor(pmod(utcSec, lit(3600)) / 60).cast("string"), 2, "0"), lit(":"),
        lpad(pmod(utcSec, lit(60)).cast("string"), 2, "0"), lit("."),
        lpad(fracUs.cast("string"), 6, "0"), lit("Z")))
  }

  // ---- json (reference: lib/debezium/converters/json.go) ----

  /** Extract a JSON field as string (JSONB passthrough analogue). */
  def jsonField(c: Column, path: String): Column = get_json_object(c, path)

  /** Extract a JSON field as BIGINT. */
  def jsonFieldLong(c: Column, path: String): Column =
    get_json_object(c, path).cast("long")

  // ---- uuid / bits (reference: lib/debezium/converters/uuid.go, bit.go) ----

  /** Deterministic UUID-shaped string from any key column (uuid.go renders
    * 16 bytes as 8-4-4-4-12; we derive the bytes from md5 so the oracle can
    * reproduce them). */
  def uuidFromKey(c: Column): Column = {
    val h = md5(c.cast("string"))
    concat_ws("-",
      substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
      substring(h, 17, 4), substring(h, 21, 12))
  }

  /** Single-bit extraction (bit.go BitConverter). */
  def bitAt(c: Column, pos: Int): Column =
    shiftright(c.cast("long"), pos).bitwiseAND(lit(1L))

  /** Population count (bit_varying.go analogue). */
  def popCount(c: Column): Column = bit_count(c.cast("long")).cast("long")

  /** PG bit varying (lib/debezium/converters/bit_varying.go:27-60 +
    * bit.go stringToByteA:68-77): validate the 0/1 string against the
    * optional max length, parse base-2, emit big.Int's minimal big-endian
    * bytes REVERSED (little-endian, the java.util.BitSet layout Debezium
    * uses), hex-rendered for comparability. Invalid characters or
    * over-length → NULL (the reference's error return, expressed as the
    * declarative error lane). All-zero bits → '' (big.Int.Bytes() of zero
    * is empty). Column-arithmetic base-2 window caps maxLen at 63 bits;
    * beyond that the swap-in is a kernel, not this expression. */
  def bitVaryingHex(bits: Column, maxLen: Int): Column = {
    require(maxLen > 0 && maxLen <= 63, s"maxLen $maxLen outside the long window")
    val valid = bits.rlike("^[01]+$") && length(bits) <= maxLen
    val v = conv(bits, 2, 10).cast("long")
    // byte i of the little-endian rendering is present iff some higher-or-
    // equal bit is set — exactly "minimal big-endian, reversed"
    val bytes = (0 until (maxLen + 7) / 8).map { i =>
      when(shiftright(v, 8 * i) > 0,
        lpad(hex(shiftright(v, 8 * i).bitwiseAND(lit(255L))), 2, "0"))
    }
    when(valid, concat_ws("", bytes: _*))
  }

  // ---- MySQL schema conversions (reference: lib/mysql/schema/convert.go) ----

  /** MySQL SET (convert.go asSet:15-31): the streaming wire value is an
    * int64 bitmask where bit i selects the i-th DECLARED option; rendered
    * as the comma-joined selected options (bitmask 0 → empty string, the
    * strings.Join of an empty slice). concat_ws skips NULL slots, so the
    * whole conversion is one codegen'd expression. */
  def setString(bitmask: Column, opts: Seq[String]): Column = {
    val parts = opts.zipWithIndex.map { case (opt, i) =>
      when(shiftright(bitmask.cast("long"), i).bitwiseAND(lit(1L)) === 1L, lit(opt))
    }
    concat_ws(",", parts: _*)
  }

  /** MySQL non-strict-mode invalid date detector (convert.go
    * hasNonStrictModeInvalidDate:264-287): true when the first 10 chars
    * split on '-' into exactly three parts and, scanning left to right,
    * an all-zero numeric part is reached before any non-numeric part —
    * i.e. year, month, or day renders as 0 ("0000-00-00 00:00:00",
    * "2024-00-15 …"). Strings shorter than 10 chars are never flagged
    * (the reference's length guard). */
  def nonStrictInvalidDate(c: Column): Column = {
    val head = substring(c, 1, 10)
    (length(c) >= 10) && (
      head.rlike("^0+-[^-]*-[^-]*$") ||
        head.rlike("^\\d*[1-9]\\d*-0+-[^-]*$") ||
        head.rlike("^\\d*[1-9]\\d*-\\d*[1-9]\\d*-0+$"))
  }

  /** MySQL DATETIME/TIMESTAMP under non-strict mode (convert.go:153-161):
    * zero-date-class strings become NULL instead of erroring; everything
    * else parses as a timestamp. The `when` keeps the parse in the valid
    * branch only, so ANSI mode never sees a zero date. */
  def mysqlDatetime(c: Column): Column =
    when(!nonStrictInvalidDate(c), to_timestamp(c))

  /** PG geography/geometry hex-EWKB → base64 WKB payload, the rendering
    * reader ships to consumers (lib/postgres/parse/geom.go:52-66: hex
    * decode then base64 encode). */
  def geographyWkbB64(hexCol: Column): Column = base64(unhex(hexCol))

  /** PG array column, delivered as JSON-array text, parsed to a typed Spark
    * array (parse.go:81-92 json.Unmarshal). One from_json pass. */
  def pgArray(c: Column, elementType: String): Column =
    from_json(c, org.apache.spark.sql.types.DataType.fromDDL(s"array<$elementType>"))

  /** MSSQL `uniqueidentifier` wire bytes → canonical uppercase GUID string.
    * The wire layout is mixed-endian (reference: lib/mssql/parse/parse.go:
    * 55-61 delegates to go-mssqldb UniqueIdentifier.Scan/String): the first
    * three groups are little-endian, the last two big-endian, so the
    * canonical rendering reads bytes 3·2·1·0 - 5·4 - 7·6 - 8·9 - 10..15.
    * Pure string/byte arithmetic — codegen'd, map-only at any scale. */
  def mssqlGuid(bytes: Column): Column = {
    val h = hex(bytes) // uppercase hex, 2 chars per byte
    def b(i: Int): Column = substring(h, i * 2 + 1, 2)
    concat_ws("-",
      concat(b(3), b(2), b(1), b(0)),
      concat(b(5), b(4)),
      concat(b(7), b(6)),
      concat(b(8), b(9)),
      concat(b(10), b(11), b(12), b(13), b(14), b(15)))
  }
}
