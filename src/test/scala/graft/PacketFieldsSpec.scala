package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** [[graft.streaming.PacketFields]] — the fused single-pass TNC2 parser —
  * pinned field-for-field against the regexp_extract expression tree it
  * replaced (reproduced verbatim below as the in-test reference oracle), over
  * an adversarial line battery, under BOTH eval paths (whole-stage codegen on
  * and off). Any divergence between the compiled character-level parser and
  * java.util.regex semantics fails here before it can reach the DuckDB gate. */
class PacketFieldsSpec extends SparkSuite {
  import spark.implicits._

  import org.apache.spark.sql.Column

  /** Maidenhead grid from lat/lon columns — factored so the third-party
    * override can recompute it after substituting the inner position. */
  private def gridOf(lat: Column, lon: Column): Column = {
    val adjLon = least(lon + 180.0, lit(359.999999))
    val adjLat = least(lat + 90.0, lit(179.999999))
    concat(
      element_at(split(lit("ABCDEFGHIJKLMNOPQR"), ""), (floor(adjLon / 20) + 1).cast("int")),
      element_at(split(lit("ABCDEFGHIJKLMNOPQR"), ""), (floor(adjLat / 10) + 1).cast("int")),
      floor(pmod(adjLon, lit(20)) / 2).cast("int").cast("string"),
      floor(pmod(adjLat, lit(10))).cast("int").cast("string"),
      element_at(split(lit("abcdefghijklmnopqrstuvwx"), ""),
        (floor(pmod(adjLon, lit(2)) * 12) + 1).cast("int")),
      element_at(split(lit("abcdefghijklmnopqrstuvwx"), ""),
        (floor(pmod(adjLat, lit(1)) * 24) + 1).cast("int")))
  }

  /** Reference semantics for the third-party tunnel on top of [[regexParse]]:
    * run the single-level formulation on the outer line, re-run it (prefixed)
    * on the payload after `}`, and splice the inner position/speed/source in
    * where the inner header parsed — the same one-level rule as the fused
    * parser (`allowTp` false on the inner pass: an inner `}` stays 'other'
    * because the prefixed pass itself has no tunnel branch). */
  private def refParse(lines: DataFrame, raw: String = "raw"): DataFrame = {
    val outer = regexParse(lines, raw)
    val withInner = outer.withColumn("raw2",
      when(col("dti") === "}", expr("substring(payload, 2)")).otherwise(lit("")))
    val both = regexParse(withInner, "raw2", "i_")
    val isTp = col("dti") === "}" && col("callsign") =!= "" &&
      col("i_callsign") =!= "" && col("i_payload") =!= ""
    both
      .withColumn("packet_type", when(isTp, "thirdparty").otherwise(col("packet_type")))
      .withColumn("tp_callsign", when(isTp, col("i_callsign")))
      .withColumn("lat", when(isTp, col("i_lat")).otherwise(col("lat")))
      .withColumn("lon", when(isTp, col("i_lon")).otherwise(col("lon")))
      .withColumn("mice_speed", when(isTp, col("i_mice_speed")).otherwise(col("mice_speed")))
      .withColumn("mice_course", when(isTp, col("i_mice_course")).otherwise(col("mice_course")))
      .withColumn("grid",
        when(col("lat").isNotNull && col("lon").isNotNull,
          gridOf(col("lat"), col("lon"))).otherwise(lit(null)))
  }

  /** The ORIGINAL regex formulation of PacketParse.parse (pre-fusion),
    * kept as the semantic reference and extended with the same compressed /
    * Mic-E families the fused parser grew — expression trees only, no code
    * shared with the production parser. `prefix` names the output columns so
    * [[refParse]] can run an inner (third-party) pass on the same rows. */
  private def regexParse(lines: DataFrame, raw: String = "raw",
      prefix: String = ""): DataFrame = {
    val posBody = "([0-9]{4}\\.[0-9]{2})([NS])(.)([0-9]{5}\\.[0-9]{2})([EW])"
    val barePos = s"^[!=]$posBody"
    val timedPos = s"^[/@][0-9]{6}[zh/]$posBody"
    val objPos = s"^;.{9}[*_][0-9]{6}[zh/]$posBody"
    val telemetryHead = "^T#([0-9]{1,5}),"
    val telemetry = "^T#([0-9]{1,5}),([0-9.-]+),[0-9.-]+,[0-9.-]+,[0-9.-]+,[0-9.-]+,([01]{8})"
    val weatherHead = "^_[0-9]{8}"
    val weather = "^_([0-9]{8})c([0-9. ]{3})s([0-9. ]{3})g([0-9. ]{3})t(-?[0-9. ]{2,3})"
    // compressed body: table, 8 base-91 chars (33–123), symbol (33–126),
    // cs+T (32–125) — table excludes digits, so disjoint from ddmm.hh
    val compBody = "([\\/\\\\A-Za-j])([!-{]{8})([!-~])([ -}]{3})"
    val compBare = s"^[!=]$compBody"
    val compTimed = s"^[/@][0-9]{6}[zh/]$compBody"
    val compObj = s"^;.{9}[*_][0-9]{6}[zh/]$compBody"

    val callsignC = regexp_extract(col(raw), "^([A-Za-z0-9-]+)>", 1)
    val pathC = regexp_extract(col(raw), "^[^>]+>([^:]*):", 1)
    val payloadC = regexp_extract(col(raw), "^[^:]+:(.*)$", 1)
    val dtiC = substring(payloadC, 1, 1)

    def grp(pattern: String, i: Int) = regexp_extract(payloadC, pattern, i)
    def posGrp(i: Int) =
      when(grp(barePos, i) =!= "", grp(barePos, i))
        .when(grp(timedPos, i) =!= "", grp(timedPos, i))
        .otherwise(grp(objPos, i))
    def toDeg(s: Column, degDigits: Int, hemi: Column, neg: String): Column =
      when(s === "", lit(null).cast(DoubleType)).otherwise(
        (substring(s, 1, degDigits).cast(DoubleType) +
          substring(s, degDigits + 1, 5).cast(DoubleType) / 60.0) *
          when(hemi === neg, -1.0).otherwise(1.0))

    val uLat = toDeg(posGrp(1), 2, posGrp(2), "S")
    val uLon = toDeg(posGrp(4), 3, posGrp(5), "W")

    // compressed base-91 decode
    def compGrp(i: Int) =
      when(grp(compBare, i) =!= "", grp(compBare, i))
        .when(grp(compTimed, i) =!= "", grp(compTimed, i))
        .otherwise(grp(compObj, i))
    val c8 = compGrp(2)
    def b91v(i: Int) = ascii(substring(c8, i, 1)) - 33
    val yv = ((b91v(1).cast("long") * 91 + b91v(2)) * 91 + b91v(3)) * 91 + b91v(4)
    val xv = ((b91v(5).cast("long") * 91 + b91v(6)) * 91 + b91v(7)) * 91 + b91v(8)
    val cLat = when(c8 =!= "", lit(90.0) - yv.cast(DoubleType) / 380926.0)
    val cLon = when(c8 =!= "", lit(-180.0) + xv.cast(DoubleType) / 190463.0)

    // Mic-E: lat digits + flags from the destination (first path component,
    // SSID stripped), lon + speed/course from byte−28 info field
    val destCore = regexp_extract(regexp_extract(pathC, "^([^,]*)", 1), "^([^-]*)", 1)
    val infoOk = (2 to 7).map(i =>
      ascii(substring(payloadC, i, 1)).between(28, 127)).reduce(_ && _)
    val miceOk = dtiC.isin("`", "'") && destCore.rlike("^[0-9A-LP-Z]{6}$") &&
      length(payloadC) >= 9 && infoOk
    val dd = translate(destCore, "ABCDEFGHIJKLPQRSTUVWXYZ", "01234567890001234567890")
    def dig(i: Int) = substring(dd, i, 1).cast("int")
    val north = substring(destCore, 4, 1).rlike("[P-Z]")
    val offset = substring(destCore, 5, 1).rlike("[P-Z]")
    val west = substring(destCore, 6, 1).rlike("[P-Z]")
    val latDeg = dig(1) * 10 + dig(2)
    val latMinC = dig(3) * 1000 + dig(4) * 100 + dig(5) * 10 + dig(6)
    val mLat = when(miceOk,
      (latDeg.cast(DoubleType) + latMinC.cast(DoubleType) / 100.0 / 60.0) *
        when(north, 1.0).otherwise(-1.0))
    def ib(i: Int) = ascii(substring(payloadC, i, 1)) // payload char i, 1-based
    val d0a = ib(2) - 28 + when(offset, 100).otherwise(0)
    val d0 = when(d0a.between(180, 189), d0a - 80)
      .when(d0a.between(190, 199), d0a - 190).otherwise(d0a)
    val m0a = ib(3) - 28
    val m0 = when(m0a >= 60, m0a - 60).otherwise(m0a)
    val lonMinC = m0 * 100 + (ib(4) - 28)
    val mLon = when(miceOk,
      (d0.cast(DoubleType) + lonMinC.cast(DoubleType) / 100.0 / 60.0) *
        when(west, -1.0).otherwise(1.0))
    val spA = (ib(5) - 28).cast("long") * 10 +
      call_function("div", (ib(6) - 28).cast("long"), lit(10L))
    val spd = when(spA >= 800, spA - 800).otherwise(spA)
    val crsA = pmod(ib(6) - 28, lit(10)).cast("long") * 100 + (ib(7) - 28)
    val crs = when(crsA >= 400, crsA - 400).otherwise(crsA)

    // NMEA ($GPRMC status A / $GPGGA fix 1-9): ddmm.mm… coordinate fields
    val nf = split(payloadC, ",", -1)
    val isRmc = payloadC.startsWith("$GPRMC,")
    val isGga = payloadC.startsWith("$GPGGA,")
    val nmeaValid =
      (isRmc && size(nf) >= 10 && element_at(nf, 3) === "A") ||
        (isGga && size(nf) >= 7 && element_at(nf, 7).rlike("^[1-9]$"))
    val latF = when(isRmc, element_at(nf, 4)).otherwise(element_at(nf, 3))
    val nsF = when(isRmc, element_at(nf, 5)).otherwise(element_at(nf, 4))
    val lonF = when(isRmc, element_at(nf, 6)).otherwise(element_at(nf, 5))
    val ewF = when(isRmc, element_at(nf, 7)).otherwise(element_at(nf, 6))
    val nmeaOk = dtiC === "$" && (isRmc || isGga) && nmeaValid &&
      latF.rlike("^[0-9]{4}\\.[0-9]+$") && lonF.rlike("^[0-9]{5}\\.[0-9]+$") &&
      nsF.isin("N", "S") && ewF.isin("E", "W")
    val nLat = when(nmeaOk,
      (substring(latF, 1, 2).cast(DoubleType) +
        substring(latF, 3, 1000).cast(DoubleType) / 60.0) *
        when(nsF === "S", -1.0).otherwise(1.0))
    val nLon = when(nmeaOk,
      (substring(lonF, 1, 3).cast(DoubleType) +
        substring(lonF, 4, 1000).cast(DoubleType) / 60.0) *
        when(ewF === "W", -1.0).otherwise(1.0))

    // the families are disjoint on (dti, first body char)
    val latAll = coalesce(uLat, cLat, mLat, nLat)
    val lonAll = coalesce(uLon, cLon, mLon, nLon)
    val latG = when(latAll.between(-90.0, 90.0), latAll)
    val lonG = when(lonAll.between(-180.0, 180.0), lonAll)

    val ptypeC =
      when(callsignC === "" || payloadC === "", "other")
        .when(dtiC.isin("!", "="),
          when(latG.isNotNull && lonG.isNotNull, "position").otherwise("other"))
        .when(dtiC.isin("/", "@"),
          when(latG.isNotNull && lonG.isNotNull, "position_ts").otherwise("other"))
        .when(dtiC === ">", "status")
        .when(dtiC === ":" &&
          regexp_extract(payloadC, "^:([^:]{9}):", 1) =!= "", "message")
        .when(dtiC === ";" &&
          latG.isNotNull && lonG.isNotNull, "object")
        .when(dtiC === "T" && payloadC.rlike(telemetryHead), "telemetry")
        .when(dtiC === "_" && payloadC.rlike(weatherHead), "weather")
        .when(dtiC.isin("`", "'"),
          when(latG.isNotNull && lonG.isNotNull, "mice").otherwise("other"))
        .when(dtiC === "$",
          when(latG.isNotNull && lonG.isNotNull, "nmea").otherwise("other"))
        .otherwise("other")

    lines
      .withColumn(prefix + "callsign", callsignC)
      .withColumn(prefix + "path", pathC)
      .withColumn(prefix + "payload", payloadC)
      .withColumn(prefix + "dti", dtiC)
      .withColumn(prefix + "lat", latG)
      .withColumn(prefix + "lon", lonG)
      .withColumn(prefix + "packet_type", ptypeC)
      .withColumn(prefix + "obj_name",
        when(ptypeC === "object",
          trim(regexp_extract(payloadC, "^;(.{9})[*_]", 1))).otherwise(lit(null)))
      .withColumn(prefix + "obj_killed",
        when(ptypeC === "object",
          regexp_extract(payloadC, "^;.{9}([*_])", 1) === "_").otherwise(lit(null)))
      .withColumn(prefix + "tlm_seq",
        when(ptypeC === "telemetry",
          expr(s"try_cast(regexp_extract(regexp_extract($raw, '^[^:]+:(.*)$$', 1), " +
            s"'$telemetryHead', 1) AS INT)"))
          .otherwise(lit(null)))
      .withColumn(prefix + "tlm_a1",
        when(ptypeC === "telemetry" && grp(telemetry, 2) =!= "",
          expr(s"try_cast(regexp_extract(regexp_extract($raw, '^[^:]+:(.*)$$', 1), " +
            s"'$telemetry', 2) AS DOUBLE)"))
          .otherwise(lit(null)))
      .withColumn(prefix + "tlm_bits",
        when(ptypeC === "telemetry" && grp(telemetry, 3) =!= "",
          grp(telemetry, 3)).otherwise(lit(null)))
      .withColumn(prefix + "wx_wind_dir",
        when(ptypeC === "weather",
          expr(s"try_cast(regexp_extract(regexp_extract($raw, '^[^:]+:(.*)$$', 1), " +
            s"'$weather', 2) AS INT)")).otherwise(lit(null)))
      .withColumn(prefix + "wx_wind_speed",
        when(ptypeC === "weather",
          expr(s"try_cast(regexp_extract(regexp_extract($raw, '^[^:]+:(.*)$$', 1), " +
            s"'$weather', 3) AS INT)")).otherwise(lit(null)))
      .withColumn(prefix + "wx_gust",
        when(ptypeC === "weather",
          expr(s"try_cast(regexp_extract(regexp_extract($raw, '^[^:]+:(.*)$$', 1), " +
            s"'$weather', 4) AS INT)")).otherwise(lit(null)))
      .withColumn(prefix + "wx_temp_f",
        when(ptypeC === "weather",
          expr(s"try_cast(regexp_extract(regexp_extract($raw, '^[^:]+:(.*)$$', 1), " +
            s"'$weather', 5) AS INT)")).otherwise(lit(null)))
      .withColumn(prefix + "msg_addressee",
        when(ptypeC === "message",
          trim(regexp_extract(payloadC, "^:([^:]{9}):", 1))).otherwise(lit(null)))
      .withColumn(prefix + "msg_text",
        when(ptypeC === "message",
          regexp_extract(payloadC, "^:[^:]{9}:(.*)$", 1)).otherwise(lit(null)))
      .withColumn(prefix + "status_text",
        when(ptypeC === "status", substring(payloadC, 2, 256))
          .otherwise(lit(null)))
      .withColumn(prefix + "grid",
        when(latG.isNotNull && lonG.isNotNull,
          gridOf(latG, lonG)).otherwise(lit(null)))
      .withColumn(prefix + "mice_speed",
        when(ptypeC === "mice", spd).otherwise(lit(null)))
      .withColumn(prefix + "mice_course",
        when(ptypeC === "mice", crs).otherwise(lit(null)))
      .withColumn(prefix + "tp_callsign", lit(null).cast("string"))
  }

  /** Adversarial battery: every payload family, every structural break point
    * the character parser has, plus range/boundary coordinates. */
  private val battery: Seq[String] = Seq(
    // valid positions, all hemisphere combos + boundaries
    "N0CALL>APRS,WIDE1-1:!4903.50N/07201.75W-hello",
    "DB0XYZ-10>APRS:!5230.25S/01323.50E>cmt",
    "K2DEF>APRS:=4741.10N\\12217.50W-Seattle",
    "A1A>B:!9000.00N/18000.00E#",          // boundary lat=90, lon=180 (grid clamp)
    "A1A>B:!0000.00N/00000.00W#",          // zeros
    "N0BAD>APRS:!9999.99N/19999.99W-junk", // both out of range
    "N0MIX>APRS:!4903.50N/19999.99W-x",    // lat ok, lon out of range
    "N0MIX2>APRS:!9999.99S/07201.75E-x",   // lat out, lon ok
    "T0TRUNC>A:!4903.50N/07201.7",         // truncated body
    "T1BAD>A:!49A3.50N/07201.75W-",        // non-digit in lat
    // timestamped
    "N0CALL>APRS:@092345z4903.50N/07201.75W>mobile",
    "N0CALL>APRS:/092345h4903.50S/07201.75E>m",
    "N0CALL>APRS:/092345/4903.50N/07201.75W>m",
    "N0CALL>APRS:@09234Xz4903.50N/07201.75W>m",  // bad ts digit
    "N0CALL>APRS:@092345x4903.50N/07201.75W>m",  // bad ts sep
    // objects
    "N0CALL>APRS:;LEADER   *092345z4903.50N/07201.75W>chase",
    "N0CALL>APRS:;OLDOBJ   _092345z4903.50N/07201.75W>gone",
    "N0CALL>APRS:;  PAD  X *092345z4903.50N/07201.75W>p",   // spaces in name
    "N0CALL>APRS:;SHORT *092345z4903.50N/07201.75W>x",      // name < 9 chars → other
    // messages
    "W1AW>APRS,TCPIP*::K1ABC-9  :hello there{001",
    "W1AW>APRS::ABCDEFGHI:",               // empty text
    "W1AW>APRS::         :only spaces addressee",
    "W1AW>APRS::SHORT:no",                 // addressee too short → other
    "W1AW>APRS::ABC:DEFGH:x",              // colon inside the 9 → other
    // status
    "DB0XYZ>APRS:>station up and running",
    "DB0XYZ>APRS:>",                       // empty status text
    // telemetry
    "W1AW>APRS:T#005,199.9,27.0,3.5,12.1,0.0,10110001",
    "W2BAD>APRS:T#12,bogus,1,2,3,4,00000000",   // malformed analog
    "W3X>APRS:T#123456,1,2,3,4,5,10101010",     // 6-digit seq → not telemetry
    "W4X>APRS:T#1,2,3,4,5,6,7,01010101",        // extra field → fields null
    "W5X>APRS:T#99999,-1.5,0,0,0,0,11111111",   // negative analog, max seq
    "W6X>APRS:T#7,1,2,3,4,5,1011000",           // 7-bit bits → fields null
    "W7X>APRS:T#7,1,2,3,4,5,101100012",         // 9 bits → first 8
    "W8X>APRS:T#7,1,2,3,4,5",                   // missing bits → fields null
    // weather
    "K7WX>APRS:_10090556c220s004g005t077r000p000P000h50b09900",
    "K7BAD>APRS:_10090556c...s...g...t077r000",
    "K7NEG>APRS:_10090556c220s004g005t-20r000",
    "K7SHT>APRS:_10090556c220s004g005t7",        // 1-char temp → fields null
    "K7T2>APRS:_10090556c220s004g005t07",        // 2-char temp ok
    "K7TRC>APRS:_10090556c220s004",              // truncated → fields null
    "K7SP>APRS:_10090556c 20s  4g  5t 77x",      // space-padded fields
    "K7HDR>APRS:_1009055Xc220s004g005t077",      // bad header digit → other
    // header break points
    "noise line",
    ">APRS:!4903.50N/07201.75W-",          // '>' at index 0
    "N0CALL:!4903.50N/07201.75W-",         // no '>'
    "N0CALL>APRS!4903.50N",                // no ':'
    "N0CALL>:payload",                     // empty path
    "n0-low>a:>lowercase callsign ok",
    "BAD CALL>APRS:>space breaks callsign",
    "N0CALL>APRS:",                        // empty payload
    "X>Y:?unknown dti",
    "",                                    // empty line
    "::::",
    "A>B:T#,1,2,3,4,5,10101010",           // zero-digit seq
    "A>B:_",                               // weather dti, no digits
    "A>B:T",                               // telemetry dti alone
    // unicode in payload (code-point dti / status substring)
    "U1>A:>\u00e9tat ok \u4e2d\u6587",
    "U2>A:\u4e2d4903.50N/07201.75W-",      // multibyte dti → other
    // astral (non-BMP) chars in fixed-width dot/negated-class fields: the
    // regex counts CODE POINTS, a surrogate pair is one point / two units
    // (r14 sweep — each of these previously flipped classification)
    "U3>A::ABCDEFGH\uD83D\uDE00:hi",       // 9-point addressee (10 units) → message
    "U4>A::\uD83D\uDE00ABCDEFG:x",         // 8 points before ':' at unit 10 → other
    "U5>A:!4903.50N\uD83D\uDE0007201.75W-",  // astral symbol-table char → position
    "U6>A:;AAAAAAAA\uD83D\uDE00*092345z4903.50N/07201.75W-", // 9-point obj name → object
    "U7>T7SUPW:`abcdef\uD83D\uDE00",       // 9 units, 8 points → other (mice len gate)
    // compressed positions (APRS-spec example coordinates: 49.5N 72.75W)
    "K1ABC>APRS,TCPIP*:!/5L!!<*e7>7P[comment",
    "K1ABC>APRS:=/5L!!<*e7>{!! ",
    "K1ABC>APRS:@092345z/5L!!<*e7>7P[t",    // timed compressed
    "K1ABC>APRS:;OBJECT123*092345z/5L!!<*e7>7P[o",  // compressed object
    "K1ABC>APRS:!\\5L!!<*e7>7P[alt table",
    "K1ABC>APRS:!a5L!!<*e7>7P[overlay a",
    "K1ABC>APRS:!k5L!!<*e7>7P[k not in a-j",  // bad table char → other
    "K1ABC>APRS:!/5L !!<*e7>7P[",             // space in base-91 run → other
    "K1ABC>APRS:!/5L!!<*e7>",                 // truncated (no cs+T) → other
    "K1ABC>APRS:!/5L!!<*e7>7P",               // 12 of 13 bytes → other
    "K1ABC>APRS:!/|||||||||||7P[",            // '|' (124) in b91 run → other
    "K1ABC>APRS:!/!!!!!!!!>!!!x",             // min b91 digits → lat 90, lon -180
    // Mic-E (dest T7SUPW: lat 47°35.07' N, lon offset, W; info: lon 100°35.50')
    "W1AW-9>T7SUPW,WIDE1-1:`l?N\u001e\u001cs>/comment",
    "W1AW-9>T7SUPW:'l?N\u001e\u001cs>/old gps",     // old-style DTI
    "W1AW>T7SZZZ,TCPIP*:`l?N\u001e\u001cs>/ambiguity zeros",
    "W1AW>Q7SUPW:`l?N\u001e\u001cs>/Q dest char",   // Q valid (P-Z)
    "W1AW>N7SUPW:`l?N\u001e\u001cs>/N invalid",     // N not in 0-9A-LP-Z → other
    "W1AW>T7SUPW:`l?N",                             // info too short → other
    "W1AW>T7SUPW7,WIDE1-1:`l?N\u001e\u001cs>/7-char dest",  // len != 6 → other
    "W1AW>T7SUPW:`\u001b?N\u001e\u001cs>/info byte < 28",   // → other
    "BACKTICK>APRS:`no valid dest here",
    // broken callsign + valid Mic-E body: ptype 'other' must carry NULL
    // mice_speed/mice_course (family gating — r14 sweep)
    "*>T7SUPW:`l?Ns>/x",
    // NMEA payloads (older trackers)
    "N0TRK>APRS,TCPIP*:$GPRMC,225446,A,4916.45,N,12311.12,W,000.5,054.7,191194,020.3,E*68",
    "N0TRK>APRS:$GPRMC,225446,V,4916.45,N,12311.12,W,000.5,054.7,191194,,*68", // void fix → other
    "N0TRK>APRS:$GPGGA,170834,4124.89,N,08151.68,W,1,05,1.5,280.2,M,-34.0,M,,*75",
    "N0TRK>APRS:$GPGGA,170834,4124.89,N,08151.68,W,0,00,,,M,,M,,*66",  // quality 0 → other
    "N0TRK>APRS:$GPGGA,170834,4124.89,N,08151.68,W",                   // truncated → other
    "N0TRK>APRS:$GPRMC,225446,A,4916.45,X,12311.12,W,000.5,054.7,191194,,",  // bad hemi → other
    "N0TRK>APRS:$GPRMC,225446,A,916.45,N,12311.12,W,000.5,054.7,191194,,",   // 3-digit lat → other
    "N0TRK>APRS:$GPGLL,4916.45,N,12311.12,W,225444,A",                 // GLL not handled → other
    "N0TRK>APRS:$GPRMC,225446,A,9916.45,N,12311.12,W,1,2,3,4",         // lat out of range
    // third-party tunnels (one level only)
    "IGATE-1>APRS,TCPIP*:}W1AW-9>APRS,TCPIP*:!4903.50N/07201.75W-inner pos",
    "IGATE-1>APRS:}W1AW>T7SUPW:`l?N\u001e\u001cs>/inner mice",
    "IGATE-1>APRS:}K1ABC>APRS:!/5L!!<*e7>7P[inner compressed",
    "IGATE-1>APRS:}DB0XYZ>APRS:>inner status",      // inner non-position: still thirdparty
    "IGATE-1>APRS:}garbage no header",              // inner header fails → other
    "IGATE-1>APRS:}X>Y:}Z>W:!4903.50N/07201.75W-",  // nested tunnel: pos NOT parsed
    "IGATE-1>APRS:}",                               // empty inner → other
    "IGATE-1>APRS:}X>:p")                           // inner empty path, has payload

  test("fused PacketFields equals the regex formulation on the battery — both eval paths") {
    val df = battery.toDF("raw")
    val cols = Seq("raw", "callsign", "path", "payload", "dti", "lat", "lon",
      "packet_type", "obj_name", "obj_killed", "tlm_seq", "tlm_a1", "tlm_bits",
      "wx_wind_dir", "wx_wind_speed", "wx_gust", "wx_temp_f",
      "msg_addressee", "msg_text", "status_text", "grid",
      "mice_speed", "mice_course", "tp_callsign")
    val expected = refParse(df).select(cols.map(col): _*)
      .orderBy("raw").collect().toSeq
    Seq(true, false).foreach { cg =>
      val key = "spark.sql.codegen.wholeStage"
      val prev = spark.conf.get(key, "true")
      val actual =
        try {
          spark.conf.set(key, cg.toString)
          graft.streaming.PacketParse.parse(df).select(cols.map(col): _*)
            .orderBy("raw").collect().toSeq
        } finally spark.conf.set(key, prev)
      expected.zip(actual).foreach { case (e, a) =>
        assert(e == a, s"codegen=$cg\n raw=${e.getAs[String]("raw")}\n exp=$e\n got=$a")
      }
      assert(expected.size == actual.size)
    }
  }

  test("fused PacketFields equals the regex formulation on 400 fuzzed lines — both eval paths") {
    // grammar-aware fuzz: random concatenations of valid fragments and noise
    // chars chosen to hit every structural break point of the char-level
    // parser (deterministic seed — failures reproduce)
    val rnd = new scala.util.Random(42)
    val heads = Seq("N0CALL>APRS,WIDE1-1:", "a-1>b:", ">x:", "AB:", "", "X>:", "X>Y",
      "W1AW>T7SUPW,WIDE1-1:", "W1AW>T7SZZZ:", "IG-1>APRS,TCPIP*:")
    val bodies = Seq(
      "!4903.50N/07201.75W-", "!9999.99N/19999.99W-", "@092345z4903.50N/07201.75W>",
      ";LEADER   *092345z4903.50N/07201.75W>", ":K1ABC-9  :msg", ">status",
      "T#005,199.9,27.0,3.5,12.1,0.0,10110001", "_10090556c220s004g005t077",
      "T#12,x", "_1009", "!49", ";SHORT*092345z", "",
      "!/5L!!<*e7>7P[", "=\\5L!!<*e7>{!! ", "@092345z/5L!!<*e7>7P[",
      "`l?Ns>/", "'l?Ns>/", "`l?N",
      "}W1AW-9>APRS:!4903.50N/07201.75W-", "}X>Y:}Z>W:>s", "}junk",
      "$GPRMC,225446,A,4916.45,N,12311.12,W,000.5,054.7,191194,,",
      "$GPGGA,170834,4124.89,N,08151.68,W,1,05,1.5,280.2,M,,M,,",
      "$GPRMC,2254", "$GPGGA,1,2,3")
    val noise = "!=/@;:>T_#,.-0123456789NSEW zhab`'}\\{[|$A"
    def randChunk(): String =
      (0 until rnd.nextInt(6)).map(_ => noise(rnd.nextInt(noise.length))).mkString
    val lines = (0 until 400).map { _ =>
      heads(rnd.nextInt(heads.length)) + randChunk() +
        bodies(rnd.nextInt(bodies.length)) + randChunk()
    }.distinct
    val df = lines.toDF("raw")
    val cols = Seq("raw", "callsign", "path", "payload", "dti", "lat", "lon",
      "packet_type", "obj_name", "obj_killed", "tlm_seq", "tlm_a1", "tlm_bits",
      "wx_wind_dir", "wx_wind_speed", "wx_gust", "wx_temp_f",
      "msg_addressee", "msg_text", "status_text", "grid",
      "mice_speed", "mice_course", "tp_callsign")
    val expected = refParse(df).select(cols.map(col): _*)
      .orderBy("raw").collect().toSeq
    Seq(true, false).foreach { cg =>
      val key = "spark.sql.codegen.wholeStage"
      val prev = spark.conf.get(key, "true")
      val actual =
        try {
          spark.conf.set(key, cg.toString)
          graft.streaming.PacketParse.parse(df).select(cols.map(col): _*)
            .orderBy("raw").collect().toSeq
        } finally spark.conf.set(key, prev)
      expected.zip(actual).foreach { case (e, a) =>
        assert(e == a, s"codegen=$cg\n raw=${e.getAs[String]("raw")}\n exp=$e\n got=$a")
      }
    }
  }

  test("fused parse evaluates the packet struct once, structurally") {
    // CollapseProject must NOT inline the non-cheap PacketFields into the
    // 20-field extraction — exactly one occurrence in the optimized plan.
    // (A LocalRelation would be constant-folded whole; parse a real scan.)
    val lines = Tables.table(spark, sf, "events")
      .select(concat(lit("U"), col("user_id").cast("string"),
        lit(">APRS,TCPIP*:!4903.50N/07201.75W-x")).as("raw"))
    val plan = graft.streaming.PacketParse.parse(lines)
      .queryExecution.optimizedPlan.toString
    val hits = "graft_packet_fields".r.findAllIn(plan).size
    assert(hits == 1, s"expected exactly one fused parse evaluation, got $hits:\n$plan")
  }

  test("item reports: name bounds, killed flag, compressed body, rejects") {
    import graft.streaming.PacketFieldsUtil.parseFields
    def f(payload: String) = parseFields(s"N0CALL>APRS,TCPIP*:$payload", allowTp = true)
    // live item, minimum 3-char name, uncompressed body
    val a = f(")AID!4903.50N/07201.75W-first aid")
    assert(a.ptype == "item" && a.objName == "AID" && a.objKilled == false)
    assert(a.lat != null && math.abs(a.lat.doubleValue() - (49.0 + 3.50 / 60.0)) < 1e-9)
    // killed item, maximum 9-char name — '_' both terminates and kills
    val k = f(")LONGNAME9_4903.50N/07201.75W-")
    assert(k.ptype == "item" && k.objName == "LONGNAME9" && k.objKilled == true)
    // compressed body after the terminator
    val c = f(")ITM!/5L!!<*e7>7P[")
    assert(c.ptype == "item" && c.lat != null && c.lon != null, c.toString)
    // 2-char name: first '!' lands at index 3 < 4 — not an item
    assert(f(")AB!4903.50N/07201.75W-").ptype == "other")
    // 10-char name: terminator past index 10 — not an item
    assert(f(")NAMETOOLONG!4903.50N/07201.75W-").ptype == "other")
    // valid name but malformed body — classified other, no position
    val m = f(")AID!9999.99X/07201.75W-")
    assert(m.ptype == "other" && m.lat == null)
  }

  test("position ambiguity: zero-fill, level surfacing, trailing-run rule") {
    import graft.streaming.PacketFieldsUtil.parseFields
    def f(payload: String) = parseFields(s"N0CALL>APRS,TCPIP*:$payload", allowTp = true)
    // unambiguous: level 0 and the exact position
    val e = f("!4903.50N/07201.75W-")
    assert(e.posAmbiguity == 0L && e.ptype == "position")
    // one spaced hundredth: zero-filled (3.50 -> 3.5_ reads 3.50)
    val a1 = f("!4903.5 N/07201.7 W-")
    assert(a1.posAmbiguity == 1L, a1.toString)
    assert(math.abs(a1.lat.doubleValue() - (49.0 + 3.50 / 60.0)) < 1e-9)
    assert(math.abs(a1.lon.doubleValue() - (-(72.0 + 1.70 / 60.0))) < 1e-9)
    // whole minutes spaced: level 4, degrees-only position
    val a4 = f("!49  .  N/072  .  W-")
    assert(a4.posAmbiguity == 4L && a4.lat == 49.0 && a4.lon == -72.0, a4.toString)
    // one-sided spacing surfaces the max of the two coordinates' levels:
    // a lat-exact / lon-spaced packet must NOT read as level 0 — its lon
    // was zero-filled (coarsened), and level 0 would present it as exact
    val lonOnly = f("!4903.50N/07201.7 W-")
    assert(lonOnly.posAmbiguity == 1L, lonOnly.toString)
    assert(math.abs(lonOnly.lon.doubleValue() - (-(72.0 + 1.70 / 60.0))) < 1e-9)
    assert(f("!4903.5 N/07201.75W-").posAmbiguity == 1L) // lat-only, same rule
    // non-trailing space run is malformed, not ambiguous
    assert(f("!49 3.50N/07201.75W-").ptype == "other")
    assert(f("!4903. 5N/07201.75W-").ptype == "other")
    // spaces never admitted in degree digits
    assert(f("!4 03.50N/07201.75W-").ptype == "other")
    // ambiguity surfaces on timed positions and objects too
    assert(f("@092345z4903.5 N/07201.7 W>").posAmbiguity == 1L)
    assert(f(";LEADER   *092345z4903.5 N/07201.7 W>").posAmbiguity == 1L)
    // compressed and Mic-E positions carry no ambiguity level
    assert(f("!/5L!!<*e7>7P[").posAmbiguity == null)
  }
}
