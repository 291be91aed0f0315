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

  /** The ORIGINAL regex formulation of PacketParse.parse (pre-fusion),
    * kept as the semantic reference. */
  private def regexParse(lines: DataFrame, raw: String = "raw"): DataFrame = {
    val posBody = "([0-9]{4}\\.[0-9]{2})([NS])(.)([0-9]{5}\\.[0-9]{2})([EW])"
    val barePos = s"^[!=]$posBody"
    val timedPos = s"^[/@][0-9]{6}[zh/]$posBody"
    val objPos = s"^;.{9}[*_][0-9]{6}[zh/]$posBody"
    val telemetryHead = "^T#([0-9]{1,5}),"
    val telemetry = "^T#([0-9]{1,5}),([0-9.-]+),[0-9.-]+,[0-9.-]+,[0-9.-]+,[0-9.-]+,([01]{8})"
    val weatherHead = "^_[0-9]{8}"
    val weather = "^_([0-9]{8})c([0-9. ]{3})s([0-9. ]{3})g([0-9. ]{3})t(-?[0-9. ]{2,3})"

    def grp(pattern: String, i: Int) = regexp_extract(col("payload"), pattern, i)
    def posGrp(i: Int) =
      when(grp(barePos, i) =!= "", grp(barePos, i))
        .when(grp(timedPos, i) =!= "", grp(timedPos, i))
        .otherwise(grp(objPos, i))
    def toDeg(s: org.apache.spark.sql.Column, degDigits: Int,
              hemi: org.apache.spark.sql.Column, neg: String): org.apache.spark.sql.Column =
      when(s === "", lit(null).cast(DoubleType)).otherwise(
        (substring(s, 1, degDigits).cast(DoubleType) +
          substring(s, degDigits + 1, 5).cast(DoubleType) / 60.0) *
          when(hemi === neg, -1.0).otherwise(1.0))

    val lat = toDeg(posGrp(1), 2, posGrp(2), "S")
    val lon = toDeg(posGrp(4), 3, posGrp(5), "W")

    val adjLon = least(col("lon") + 180.0, lit(359.999999))
    val adjLat = least(col("lat") + 90.0, lit(179.999999))
    val gridExpr = concat(
      element_at(split(lit("ABCDEFGHIJKLMNOPQR"), ""), (floor(adjLon / 20) + 1).cast("int")),
      element_at(split(lit("ABCDEFGHIJKLMNOPQR"), ""), (floor(adjLat / 10) + 1).cast("int")),
      floor(pmod(adjLon, lit(20)) / 2).cast("int").cast("string"),
      floor(pmod(adjLat, lit(10))).cast("int").cast("string"),
      element_at(split(lit("abcdefghijklmnopqrstuvwx"), ""),
        (floor(pmod(adjLon, lit(2)) * 12) + 1).cast("int")),
      element_at(split(lit("abcdefghijklmnopqrstuvwx"), ""),
        (floor(pmod(adjLat, lit(1)) * 24) + 1).cast("int")))

    lines
      .withColumn("callsign", regexp_extract(col(raw), "^([A-Za-z0-9-]+)>", 1))
      .withColumn("path", regexp_extract(col(raw), "^[^>]+>([^:]*):", 1))
      .withColumn("payload", regexp_extract(col(raw), "^[^:]+:(.*)$", 1))
      .withColumn("dti", substring(col("payload"), 1, 1))
      .withColumn("lat", when(lat.between(-90.0, 90.0), lat))
      .withColumn("lon", when(lon.between(-180.0, 180.0), lon))
      .withColumn("packet_type",
        when(col("callsign") === "" || col("payload") === "", "other")
          .when(col("dti").isin("!", "="),
            when(col("lat").isNotNull && col("lon").isNotNull, "position").otherwise("other"))
          .when(col("dti").isin("/", "@"),
            when(col("lat").isNotNull && col("lon").isNotNull, "position_ts").otherwise("other"))
          .when(col("dti") === ">", "status")
          .when(col("dti") === ":" &&
            regexp_extract(col("payload"), "^:([^:]{9}):", 1) =!= "", "message")
          .when(col("dti") === ";" &&
            col("lat").isNotNull && col("lon").isNotNull, "object")
          .when(col("dti") === "T" && col("payload").rlike(telemetryHead), "telemetry")
          .when(col("dti") === "_" && col("payload").rlike(weatherHead), "weather")
          .otherwise("other"))
      .withColumn("obj_name",
        when(col("packet_type") === "object",
          trim(regexp_extract(col("payload"), "^;(.{9})[*_]", 1))).otherwise(lit(null)))
      .withColumn("obj_killed",
        when(col("packet_type") === "object",
          regexp_extract(col("payload"), "^;.{9}([*_])", 1) === "_").otherwise(lit(null)))
      .withColumn("tlm_seq",
        when(col("packet_type") === "telemetry",
          expr(s"try_cast(regexp_extract(payload, '$telemetryHead', 1) AS INT)"))
          .otherwise(lit(null)))
      .withColumn("tlm_a1",
        when(col("packet_type") === "telemetry",
          expr(s"try_cast(regexp_extract(payload, '$telemetry', 2) AS DOUBLE)"))
          .otherwise(lit(null)))
      .withColumn("tlm_bits",
        when(col("packet_type") === "telemetry" && grp(telemetry, 3) =!= "",
          grp(telemetry, 3)).otherwise(lit(null)))
      .withColumn("wx_wind_dir",
        when(col("packet_type") === "weather",
          expr(s"try_cast(regexp_extract(payload, '$weather', 2) AS INT)"))
          .otherwise(lit(null)))
      .withColumn("wx_wind_speed",
        when(col("packet_type") === "weather",
          expr(s"try_cast(regexp_extract(payload, '$weather', 3) AS INT)"))
          .otherwise(lit(null)))
      .withColumn("wx_gust",
        when(col("packet_type") === "weather",
          expr(s"try_cast(regexp_extract(payload, '$weather', 4) AS INT)"))
          .otherwise(lit(null)))
      .withColumn("wx_temp_f",
        when(col("packet_type") === "weather",
          expr(s"try_cast(regexp_extract(payload, '$weather', 5) AS INT)"))
          .otherwise(lit(null)))
      .withColumn("msg_addressee",
        when(col("packet_type") === "message",
          trim(regexp_extract(col("payload"), "^:([^:]{9}):", 1))).otherwise(lit(null)))
      .withColumn("msg_text",
        when(col("packet_type") === "message",
          regexp_extract(col("payload"), "^:[^:]{9}:(.*)$", 1)).otherwise(lit(null)))
      .withColumn("status_text",
        when(col("packet_type") === "status", substring(col("payload"), 2, 256))
          .otherwise(lit(null)))
      .withColumn("grid",
        when(col("lat").isNotNull && col("lon").isNotNull, gridExpr).otherwise(lit(null)))
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
    "U2>A:\u4e2d4903.50N/07201.75W-")      // multibyte dti → other

  test("fused PacketFields equals the regex formulation on the battery — both eval paths") {
    val df = battery.toDF("raw")
    val cols = Seq("raw", "callsign", "path", "payload", "dti", "lat", "lon",
      "packet_type", "obj_name", "obj_killed", "tlm_seq", "tlm_a1", "tlm_bits",
      "wx_wind_dir", "wx_wind_speed", "wx_gust", "wx_temp_f",
      "msg_addressee", "msg_text", "status_text", "grid")
    val expected = regexParse(df).select(cols.map(col): _*)
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
    val heads = Seq("N0CALL>APRS,WIDE1-1:", "a-1>b:", ">x:", "AB:", "", "X>:", "X>Y")
    val bodies = Seq(
      "!4903.50N/07201.75W-", "!9999.99N/19999.99W-", "@092345z4903.50N/07201.75W>",
      ";LEADER   *092345z4903.50N/07201.75W>", ":K1ABC-9  :msg", ">status",
      "T#005,199.9,27.0,3.5,12.1,0.0,10110001", "_10090556c220s004g005t077",
      "T#12,x", "_1009", "!49", ";SHORT*092345z", "")
    val noise = "!=/@;:>T_#,.-0123456789NSEW zhab"
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
      "msg_addressee", "msg_text", "status_text", "grid")
    val expected = regexParse(df).select(cols.map(col): _*)
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
}
