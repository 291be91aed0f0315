package graft.streaming

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared eval body for [[PacketFields]] — top-level object so generated code
  * can call it through the Scala static forwarder (same discipline as
  * graft.functions.TokenCountsUtil).
  *
  * One hand-rolled character-level pass over the TNC2 line producing every
  * parser output at once. Replaces the ~15 independent `regexp_extract` /
  * `rlike` passes the original expression-tree parser ran per row (each one
  * re-scanning the payload through java.util.regex) — the single biggest
  * map-side cost of the 7 parser-gated packet/geo queries.
  *
  * EXACTNESS CONTRACT: field-for-field identical to the regex formulation it
  * replaces (the DuckDB oracles pin format∘parse as the identity, and
  * StreamingSpec pins the malformed-input behaviors), including:
  *  - `regexp_extract` no-match → "" for callsign/path/payload (not null);
  *  - java.util.regex default-mode `.` excluding the five line terminators,
  *    and `(.*)$` matching before a single FINAL terminator;
  *  - independent range-gating of lat and lon (one may be null);
  *  - `trim()` stripping 0x20 spaces only (obj_name / msg_addressee);
  *  - numeric fields emitted as the RAW matched substrings — the DataFrame
  *    layer applies the same ANSI `try_cast` as before, so malformed numerics
  *    null out with exactly Spark's cast semantics;
  *  - the Maidenhead grid arithmetic replayed in the identical IEEE op order
  *    (min-clamp, fmod, floor) as the expression tree it replaces.
  */
object PacketFieldsUtil {

  val schema: StructType = StructType(Seq(
    StructField("callsign", StringType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("payload", StringType, nullable = false),
    StructField("dti", StringType, nullable = false),
    StructField("lat", DoubleType, nullable = true),
    StructField("lon", DoubleType, nullable = true),
    StructField("packet_type", StringType, nullable = false),
    StructField("obj_name", StringType, nullable = true),
    StructField("obj_killed", BooleanType, nullable = true),
    StructField("tlm_seq_s", StringType, nullable = true),
    StructField("tlm_a1_s", StringType, nullable = true),
    StructField("tlm_bits", StringType, nullable = true),
    StructField("wx_dir_s", StringType, nullable = true),
    StructField("wx_speed_s", StringType, nullable = true),
    StructField("wx_gust_s", StringType, nullable = true),
    StructField("wx_temp_s", StringType, nullable = true),
    StructField("msg_addressee", StringType, nullable = true),
    StructField("msg_text", StringType, nullable = true),
    StructField("status_text", StringType, nullable = true),
    StructField("grid", StringType, nullable = true),
    StructField("mice_speed", LongType, nullable = true),
    StructField("mice_course", LongType, nullable = true),
    StructField("tp_callsign", StringType, nullable = true),
    StructField("pos_ambiguity", LongType, nullable = true)))

  private final val FIELD_LETTERS = "ABCDEFGHIJKLMNOPQR"
  private final val SUB_LETTERS = "abcdefghijklmnopqrstuvwx"

  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  // java.util.regex default-mode line terminators (what `.` excludes)
  @inline private def isTerm(c: Char): Boolean =
    c == '\n' || c == '\r' || c == 0x85.toChar || c == 0x2028.toChar || c == 0x2029.toChar
  @inline private def isTermCp(c: Int): Boolean =
    c == '\n'.toInt || c == '\r'.toInt || c == 0x85 || c == 0x2028 || c == 0x2029

  /** End UNIT index after consuming `count` CODE POINTS from `from`, none a
    * line terminator — regex `.{count}` semantics (java.util.regex counts
    * code points, so an astral char spans two UTF-16 units; r14 sweep: the
    * unit-counting scan this replaces mis-classified any packet with an
    * astral char in a fixed-width dot field). Returns -1 on no-match. */
  private def dotRunCp(p: String, from: Int, count: Int): Int = {
    var j = from
    var cp = 0
    val n = p.length
    while (cp < count) {
      if (j >= n) return -1
      val c = p.codePointAt(j)
      if (isTermCp(c)) return -1
      j += Character.charCount(c)
      cp += 1
    }
    j
  }
  @inline private def isCallChar(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || isDigit(c) || c == '-'
  @inline private def isTelChar(c: Char): Boolean = isDigit(c) || c == '.' || c == '-'
  @inline private def isWxChar(c: Char): Boolean = isDigit(c) || c == '.' || c == ' '

  /** Group value of `(.*)$` anchored at the start of s (default regex mode):
    * the whole string when it holds no line terminator; the prefix when the
    * only terminator is one single FINAL terminator char (incl. NEL/LS/PS)
    * or a final `\r\n`; null (no match) otherwise. */
  private def dotStarDollar(s: String): String = {
    var t = -1
    var i = 0
    val n = s.length
    while (i < n && t < 0) { if (isTerm(s.charAt(i))) t = i; i += 1 }
    if (t < 0) s
    else if (t == n - 1) s.substring(0, t)
    else if (s.charAt(t) == '\r' && t == n - 2 && s.charAt(t + 1) == '\n') s.substring(0, t)
    else null
  }

  /** Spark `trim()` semantics: strip 0x20 space chars from both ends. */
  private def trimSpaces(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  @inline private def digits(s: String, from: Int, count: Int): Boolean = {
    if (from + count > s.length) return false
    var i = from
    val end = from + count
    while (i < end) { if (!isDigit(s.charAt(i))) return false; i += 1 }
    true
  }

  /** Uncompressed position body
    * `(DD[0-9 ]{2}\.[0-9 ]{2})([NS])(.)(DDD[0-9 ]{2}\.[0-9 ]{2})([EW])`
    * starting at offset o of p, with APRS POSITION AMBIGUITY admitted:
    * real trackers space-substitute trailing latitude digits (minutes and
    * hundredths) to coarsen their reported position, and the longitude
    * carries the same convention. Degree digits stay strict; within each
    * coordinate the spaces must be a TRAILING run (`12 .  ` yes, `1 2.34`
    * no). Returns −1 if the body does not match, else the ambiguity level
    * 0–4 — the MAX of the two coordinates' spaced-digit counts: the spec
    * ties longitude ambiguity to the latitude's, but real trackers
    * sometimes space only one side, and reporting the lat count alone
    * would surface a coarsened (zero-filled) longitude as level 0. The
    * caller zero-fills spaced digits — the spec's "somewhere in the box"
    * becomes the box's low corner, deterministically.
    *
    * The symbol-table group between the coordinates is `(.)` — ONE CODE
    * POINT under java.util.regex, so an astral symbol char spans two
    * UTF-16 units and shifts the longitude (r14 sweep: the previous
    * fixed o+9 longitude offset assumed one unit and rejected such
    * bodies where the regex reference parses them). The symbol width − 1
    * rides the HIGH byte of the return value: level = r & 0xff,
    * longitude starts at o + 9 + (r >> 8). */
  private def bodyAmb(p: String, o: Int): Int = {
    if (p.length < o + 9) return -1
    if (!digits(p, o, 2)) return -1
    if (p.charAt(o + 4) != '.') return -1
    if (p.charAt(o + 7) != 'N' && p.charAt(o + 7) != 'S') return -1
    if (isTerm(p.charAt(o + 8))) return -1
    val symW = Character.charCount(p.codePointAt(o + 8))
    val q = o + 8 + symW // longitude field start
    if (p.length < q + 9) return -1
    if (!digits(p, q, 3)) return -1
    if (p.charAt(q + 5) != '.') return -1
    if (p.charAt(q + 8) != 'E' && p.charAt(q + 8) != 'W') return -1
    var amb = 0
    var sp = false
    var k = 0
    while (k < 4) { // lat digit positions in order: o+2, o+3, o+5, o+6
      val c = p.charAt(if (k < 2) o + 2 + k else o + 3 + k)
      if (c == ' ') { sp = true; amb += 1 }
      else if (!isDigit(c) || sp) return -1
      k += 1
    }
    var lonAmb = 0
    sp = false
    k = 0
    while (k < 4) { // lon digit positions: q+3, q+4, q+6, q+7
      val c = p.charAt(if (k < 2) q + 3 + k else q + 4 + k)
      if (c == ' ') { sp = true; lonAmb += 1 }
      else if (!isDigit(c) || sp) return -1
      k += 1
    }
    math.max(amb, lonAmb) | ((symW - 1) << 8)
  }

  /** Digit value with the ambiguity zero-fill (space → 0). */
  @inline private def dig0(c: Char): Int = if (isDigit(c)) c - '0' else 0

  // ---- compressed-position helpers (APRS base-91 form) -------------------
  /** Symbol-table byte admissible for a compressed body (`/`, `\`, alpha
    * overlay A–Z, compressed overlay a–j) — NOT a digit, which is what keeps
    * compressed and uncompressed (ddmm.hh…) bodies disjoint on char 1. */
  @inline private def compTable(c: Char): Boolean =
    c == '/' || c == '\\' || (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'j')
  /** Base-91 digit value of a compressed coordinate byte, −1 if invalid. */
  @inline private def b91(c: Char): Int =
    if (c >= 33 && c <= 123) c - 33 else -1

  // ---- NMEA helpers ($GPRMC / $GPGGA payloads from older trackers) ------
  /** `ddmm.mm…` / `dddmm.mm…` NMEA coordinate field: `degDigits` integer
    * degree digits, then minutes with a mandatory decimal point and at
    * least one decimal digit. */
  private def nmeaCoordOk(s: String, degDigits: Int): Boolean = {
    if (s.length < degDigits + 4) return false
    var i = 0
    while (i < degDigits + 2) { if (!isDigit(s.charAt(i))) return false; i += 1 }
    if (s.charAt(degDigits + 2) != '.') return false
    i = degDigits + 3
    if (i >= s.length) return false
    while (i < s.length) { if (!isDigit(s.charAt(i))) return false; i += 1 }
    true
  }

  // ---- Mic-E helpers (lat digits + flags ride the DESTINATION field) ----
  /** Valid Mic-E destination character ('0'–'9', 'A'–'L', 'P'–'Z'). */
  @inline private def miceValid(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'A' && c <= 'L') || (c >= 'P' && c <= 'Z')
  /** Latitude digit encoded in a Mic-E destination character; the ambiguity
    * markers K/L/Z read as digit 0 (the zero-fill policy — ambiguity itself
    * is not tracked as a separate output). */
  @inline private def miceDigit(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'A' && c <= 'J') c - 'A'
    else if (c >= 'P' && c <= 'Y') c - 'P'
    else 0 // K, L, Z

  /** Every parser output for one TNC2 line — the internal result record
    * [[parse]] flattens into the struct row. Factored out so the third-party
    * branch can re-run the parser on the tunneled inner packet (one level —
    * `allowTp` is false on the recursive call, per the APRS rule that
    * third-party payloads must not nest). */
  final case class Parsed(
      callsign: String, path: String, payload: String, dti: String,
      lat: java.lang.Double, lon: java.lang.Double, ptype: String,
      objName: String, objKilled: java.lang.Boolean,
      tlmSeq: String, tlmA1: String, tlmBits: String,
      wxDir: String, wxSpeed: String, wxGust: String, wxTemp: String,
      msgAddr: String, msgText: String, statusText: String, grid: String,
      miceSpeed: java.lang.Long, miceCourse: java.lang.Long,
      tpCallsign: String, posAmbiguity: java.lang.Long)

  def parse(rawU: UTF8String): InternalRow = {
    val p = parseFields(rawU.toString, allowTp = true)
    InternalRow(
      UTF8String.fromString(p.callsign),
      UTF8String.fromString(p.path),
      UTF8String.fromString(p.payload),
      UTF8String.fromString(p.dti),
      if (p.lat == null) null else p.lat.doubleValue(),
      if (p.lon == null) null else p.lon.doubleValue(),
      UTF8String.fromString(p.ptype),
      if (p.objName == null) null else UTF8String.fromString(p.objName),
      if (p.objKilled == null) null else p.objKilled.booleanValue(),
      if (p.tlmSeq == null) null else UTF8String.fromString(p.tlmSeq),
      if (p.tlmA1 == null) null else UTF8String.fromString(p.tlmA1),
      if (p.tlmBits == null) null else UTF8String.fromString(p.tlmBits),
      if (p.wxDir == null) null else UTF8String.fromString(p.wxDir),
      if (p.wxSpeed == null) null else UTF8String.fromString(p.wxSpeed),
      if (p.wxGust == null) null else UTF8String.fromString(p.wxGust),
      if (p.wxTemp == null) null else UTF8String.fromString(p.wxTemp),
      if (p.msgAddr == null) null else UTF8String.fromString(p.msgAddr),
      if (p.msgText == null) null else UTF8String.fromString(p.msgText),
      if (p.statusText == null) null else UTF8String.fromString(p.statusText),
      if (p.grid == null) null else UTF8String.fromString(p.grid),
      if (p.miceSpeed == null) null else p.miceSpeed.longValue(),
      if (p.miceCourse == null) null else p.miceCourse.longValue(),
      if (p.tpCallsign == null) null else UTF8String.fromString(p.tpCallsign),
      if (p.posAmbiguity == null) null else p.posAmbiguity.longValue())
  }

  def parseFields(raw: String, allowTp: Boolean): Parsed = {
    val n = raw.length

    // callsign: ^([A-Za-z0-9-]+)>  — maximal run then '>', else ""
    var i = 0
    while (i < n && isCallChar(raw.charAt(i))) i += 1
    val callsign = if (i > 0 && i < n && raw.charAt(i) == '>') raw.substring(0, i) else ""

    // path: ^[^>]+>([^:]*):  — first '>' at index >= 1, capture to next ':'
    var path = ""
    val gt = raw.indexOf('>')
    if (gt >= 1) {
      val pc = raw.indexOf(':', gt + 1)
      if (pc >= 0) path = raw.substring(gt + 1, pc)
    }

    // payload: ^[^:]+:(.*)$  — first ':' at index >= 1, then the (.*)$ rule
    var payload = ""
    val colon = raw.indexOf(':')
    if (colon >= 1) {
      val rest = dotStarDollar(raw.substring(colon + 1))
      if (rest != null) payload = rest
    }

    val plen = payload.length
    // dti: substring(payload, 1, 1) — first CODE POINT
    val dti =
      if (plen == 0) ""
      else payload.substring(0, Character.charCount(payload.codePointAt(0)))
    val d: Char = if (plen == 0) '\u0000' else payload.charAt(0)

    // position flavors (mutually exclusive on the first char):
    //   bare  ^[!=]BODY            timed ^[/@][0-9]{6}[zh/]BODY
    //   obj   ^;.{9}[*_][0-9]{6}[zh/]BODY
    @inline def tsSep(idx: Int): Boolean = plen > idx && {
      val c = payload.charAt(idx); c == 'z' || c == 'h' || c == '/'
    }
    // object name: ^;(.{9})[*_] — `.{9}` counts CODE POINTS (r14 sweep);
    // objEnd is the unit index just past the 9-point name, -1 on no-match
    val objEnd = if (d == ';') dotRunCp(payload, 1, 9) else -1
    // item report (`)` DTI): 3–9 char name, then '!' (live) or '_' (killed),
    // then a position body (uncompressed or compressed) — the portable-
    // object sibling of `;`. The FIRST '!'/'_' must fall at index 4–10
    // (name length 3–9); an earlier one means the name is too short and an
    // in-name '!'/'_' can never match because the scan stops at the first.
    var itemTerm = -1
    if (d == ')' && plen > 4) {
      var t = 1
      while (t < plen && t <= 10 &&
        payload.charAt(t) != '!' && payload.charAt(t) != '_') t += 1
      if (t >= 4 && t <= 10 && t < plen) itemTerm = t
    }

    val bodyOff: Int =
      if (d == '!' || d == '=') 1
      else if ((d == '/' || d == '@') && digits(payload, 1, 6) && tsSep(7)) 8
      else if (d == ';' && objEnd > 0 && plen > objEnd &&
        (payload.charAt(objEnd) == '*' || payload.charAt(objEnd) == '_') &&
        digits(payload, objEnd + 1, 6) && tsSep(objEnd + 7)) objEnd + 8
      else if (d == ')' && itemTerm > 0) itemTerm + 1
      else -1

    var lat: java.lang.Double = null
    var lon: java.lang.Double = null
    var miceSpeed: java.lang.Long = null
    var miceCourse: java.lang.Long = null
    var posAmb: java.lang.Long = null
    val ambR = if (bodyOff > 0) bodyAmb(payload, bodyOff) else -1
    val amb = if (ambR < 0) -1 else ambR & 0xff
    if (bodyOff > 0 && amb >= 0) {
      val o = bodyOff
      val q = o + 9 + (ambR >> 8) // longitude start (symbol width in high byte)
      // toDeg: (deg + minC/100.0/60.0) * sign — minC/100.0 is the correctly
      // rounded double of the decimal MM.mm, bitwise equal to the previous
      // Double.parseDouble("MM.mm") of the matched substring, so the IEEE
      // tree is unchanged for unambiguous bodies; spaced digits read as 0
      val latMinC = dig0(payload.charAt(o + 2)) * 1000 +
        dig0(payload.charAt(o + 3)) * 100 +
        dig0(payload.charAt(o + 5)) * 10 + dig0(payload.charAt(o + 6))
      val lonMinC = dig0(payload.charAt(q + 3)) * 1000 +
        dig0(payload.charAt(q + 4)) * 100 +
        dig0(payload.charAt(q + 6)) * 10 + dig0(payload.charAt(q + 7))
      val lat0 = ((payload.charAt(o) - '0') * 10 + (payload.charAt(o + 1) - '0')
        + latMinC.toDouble / 100.0 / 60.0) *
        (if (payload.charAt(o + 7) == 'S') -1.0 else 1.0)
      val lon0 = ((payload.charAt(q) - '0') * 100 +
        (payload.charAt(q + 1) - '0') * 10 + (payload.charAt(q + 2) - '0')
        + lonMinC.toDouble / 100.0 / 60.0) *
        (if (payload.charAt(q + 8) == 'W') -1.0 else 1.0)
      // independent range gates, exactly like the original lat/lon columns
      if (lat0 >= -90.0 && lat0 <= 90.0) lat = lat0
      if (lon0 >= -180.0 && lon0 <= 180.0) lon = lon0
      if (lat != null && lon != null) posAmb = java.lang.Long.valueOf(amb.toLong)
    } else if (bodyOff > 0 && plen >= bodyOff + 13 &&
      compTable(payload.charAt(bodyOff))) {
      // COMPRESSED position body: table, 4 base-91 lat chars, 4 base-91 lon
      // chars, symbol code, cs, T — 13 bytes. Disjoint from the uncompressed
      // form on the first body char (digit vs non-digit table), same DTIs.
      val o = bodyOff
      var ok = true
      var k = o + 1
      while (k < o + 9 && ok) { if (b91(payload.charAt(k)) < 0) ok = false; k += 1 }
      if (ok) {
        val sc = payload.charAt(o + 9)
        if (sc < 33 || sc > 126) ok = false
        k = o + 10
        while (k < o + 13 && ok) {
          val c = payload.charAt(k); if (c < 32 || c > 125) ok = false; k += 1
        }
      }
      if (ok) {
        val yv = ((b91(payload.charAt(o + 1)).toLong * 91 +
          b91(payload.charAt(o + 2))) * 91 +
          b91(payload.charAt(o + 3))) * 91 + b91(payload.charAt(o + 4))
        val xv = ((b91(payload.charAt(o + 5)).toLong * 91 +
          b91(payload.charAt(o + 6))) * 91 +
          b91(payload.charAt(o + 7))) * 91 + b91(payload.charAt(o + 8))
        val lat0 = 90.0 - yv.toDouble / 380926.0
        val lon0 = -180.0 + xv.toDouble / 190463.0
        if (lat0 >= -90.0 && lat0 <= 90.0) lat = lat0
        if (lon0 >= -180.0 && lon0 <= 180.0) lon = lon0
      }
    } else if (d == '`' || d == '\'') {
      // MIC-E: latitude digits + N/S + lon offset + E/W ride the DESTINATION
      // field (first path component, SSID stripped); the info field packs
      // lon degrees/minutes/hundredths and speed/course as byte−28 values.
      var pe = 0
      val pl = path.length
      while (pe < pl && path.charAt(pe) != ',') pe += 1
      var de = 0
      while (de < pe && path.charAt(de) != '-') de += 1
      // length(payload) >= 9 counts CODE POINTS like the reference's
      // length() (r14 sweep); plen >= 18 short-circuits the count — an
      // astral char is at most 2 units, so 18 units is always >= 9 points
      if (de == 6 && plen >= 9 &&
        (plen >= 18 || payload.codePointCount(0, plen) >= 9)) {
        var ok = true
        var k = 0
        while (k < 6 && ok) { if (!miceValid(path.charAt(k))) ok = false; k += 1 }
        k = 1
        while (k <= 6 && ok) {
          val c = payload.charAt(k); if (c < 28 || c > 127) ok = false; k += 1
        }
        if (ok) {
          val latDeg = miceDigit(path.charAt(0)) * 10 + miceDigit(path.charAt(1))
          val latMinC = miceDigit(path.charAt(2)) * 1000 +
            miceDigit(path.charAt(3)) * 100 +
            miceDigit(path.charAt(4)) * 10 + miceDigit(path.charAt(5))
          val north = path.charAt(3) >= 'P'
          val offset = path.charAt(4) >= 'P'
          val west = path.charAt(5) >= 'P'
          val lat0 = (latDeg.toDouble + latMinC.toDouble / 100.0 / 60.0) *
            (if (north) 1.0 else -1.0)
          var d0 = payload.charAt(1) - 28
          if (offset) d0 += 100
          if (d0 >= 180 && d0 <= 189) d0 -= 80
          else if (d0 >= 190 && d0 <= 199) d0 -= 190
          var m0 = payload.charAt(2) - 28
          if (m0 >= 60) m0 -= 60
          val lonMinC = m0 * 100 + (payload.charAt(3) - 28)
          val lon0 = (d0.toDouble + lonMinC.toDouble / 100.0 / 60.0) *
            (if (west) -1.0 else 1.0)
          if (lat0 >= -90.0 && lat0 <= 90.0) lat = lat0
          if (lon0 >= -180.0 && lon0 <= 180.0) lon = lon0
          if (lat != null && lon != null) {
            var sp = (payload.charAt(4) - 28) * 10 + (payload.charAt(5) - 28) / 10
            var crs = ((payload.charAt(5) - 28) % 10) * 100 + (payload.charAt(6) - 28)
            if (sp >= 800) sp -= 800
            if (crs >= 400) crs -= 400
            miceSpeed = java.lang.Long.valueOf(sp.toLong)
            miceCourse = java.lang.Long.valueOf(crs.toLong)
          }
        }
      }
    }
    // NMEA ($GPRMC with status A / $GPGGA with a nonzero single-digit fix
    // quality): position from the ddmm.mm… fields — the older-tracker
    // family. Checksum suffixes are not validated (transport-level).
    if (d == '$' && (payload.startsWith("$GPRMC,") || payload.startsWith("$GPGGA,"))) {
      val f = payload.split(",", -1)
      val rmc = payload.charAt(3) == 'R'
      val valid =
        if (rmc) f.length >= 10 && f(2) == "A"
        else f.length >= 7 && f(6).length == 1 &&
          f(6).charAt(0) >= '1' && f(6).charAt(0) <= '9'
      val (latF, nsF, lonF, ewF) =
        if (!valid) ("", "", "", "")
        else if (rmc) (f(3), f(4), f(5), f(6))
        else (f(2), f(3), f(4), f(5))
      if (valid && nmeaCoordOk(latF, 2) && nmeaCoordOk(lonF, 3) &&
        (nsF == "N" || nsF == "S") && (ewF == "E" || ewF == "W")) {
        val lat0 = (java.lang.Double.parseDouble(latF.substring(0, 2)) +
          java.lang.Double.parseDouble(latF.substring(2)) / 60.0) *
          (if (nsF == "S") -1.0 else 1.0)
        val lon0 = (java.lang.Double.parseDouble(lonF.substring(0, 3)) +
          java.lang.Double.parseDouble(lonF.substring(3)) / 60.0) *
          (if (ewF == "W") -1.0 else 1.0)
        if (lat0 >= -90.0 && lat0 <= 90.0) lat = lat0
        if (lon0 >= -180.0 && lon0 <= 180.0) lon = lon0
      }
    }

    // THIRD-PARTY tunnel (`}`): the payload after `}` is itself a full TNC2
    // packet (igate output). Re-parse it ONE level (allowTp=false — nested
    // tunnels stay 'other' per the APRS rule) and surface the inner
    // position/speed plus the inner source callsign; the header fields stay
    // the OUTER packet's, and the family-typed fields stay null.
    var tpCallsign: String = null
    if (d == '}' && allowTp && callsign.nonEmpty) {
      val inner = parseFields(payload.substring(1), allowTp = false)
      if (inner.callsign.nonEmpty && inner.payload.nonEmpty) {
        tpCallsign = inner.callsign
        lat = inner.lat
        lon = inner.lon
        miceSpeed = inner.miceSpeed
        miceCourse = inner.miceCourse
        posAmb = inner.posAmbiguity
      }
    }
    val hasPos = lat != null && lon != null

    // message head: ^:([^:]{9}):  — [^:] admits line terminators (negated
    // class) and {9} counts CODE POINTS (r14 sweep); msgAddrEnd is the unit
    // index of the closing ':' on match
    var msgAddrEnd = -1
    val msgMatch = d == ':' && {
      var ok = true
      var j = 1
      var cp = 0
      while (cp < 9 && ok) {
        if (j >= plen) ok = false
        else {
          val c = payload.codePointAt(j)
          if (c == ':'.toInt) ok = false
          else { j += Character.charCount(c); cp += 1 }
        }
      }
      if (ok && j < plen && payload.charAt(j) == ':') { msgAddrEnd = j; true }
      else false
    }

    // telemetry head: ^T#([0-9]{1,5}),  — greedy run; >5 digits never matches
    var telemRun = 0
    val telemHead = d == 'T' && plen > 2 && payload.charAt(1) == '#' && {
      var j = 2
      while (j < plen && isDigit(payload.charAt(j))) j += 1
      telemRun = j - 2
      telemRun >= 1 && telemRun <= 5 && j < plen && payload.charAt(j) == ','
    }

    // weather head: ^_[0-9]{8}
    val wxHead = d == '_' && digits(payload, 1, 8)

    val ptype: String =
      if (callsign.isEmpty || payload.isEmpty) "other"
      else if (d == '!' || d == '=') { if (hasPos) "position" else "other" }
      else if (d == '/' || d == '@') { if (hasPos) "position_ts" else "other" }
      else if (d == '>') "status"
      else if (d == ':') { if (msgMatch) "message" else "other" }
      else if (d == ';') { if (hasPos) "object" else "other" }
      else if (d == ')') { if (hasPos) "item" else "other" }
      else if (d == 'T') { if (telemHead) "telemetry" else "other" }
      else if (d == '_') { if (wxHead) "weather" else "other" }
      else if (d == '`' || d == '\'') { if (hasPos) "mice" else "other" }
      else if (d == '}') { if (tpCallsign != null) "thirdparty" else "other" }
      else if (d == '$') { if (hasPos) "nmea" else "other" }
      else "other"

    // ---- packet_type-gated field extraction (mirrors the when() gates) ----
    var objName: String = null
    var objKilled: java.lang.Boolean = null
    if (ptype == "object") {
      objName = trimSpaces(payload.substring(1, objEnd))
      objKilled = java.lang.Boolean.valueOf(payload.charAt(objEnd) == '_')
    } else if (ptype == "item") {
      // item names are variable-length (3–9 chars), not space-padded like
      // the fixed 9-char object field — no trim
      objName = payload.substring(1, itemTerm)
      objKilled = java.lang.Boolean.valueOf(payload.charAt(itemTerm) == '_')
    }

    var tlmSeq: String = null
    var tlmA1: String = null
    var tlmBits: String = null
    if (ptype == "telemetry") {
      tlmSeq = payload.substring(2, 2 + telemRun)
      // full: ^T#([0-9]{1,5}),([0-9.-]+),[0-9.-]+,[0-9.-]+,[0-9.-]+,[0-9.-]+,([01]{8})
      var p = 2 + telemRun + 1
      var ok = true
      var a1: String = null
      var f = 0
      while (f < 5 && ok) {
        val st = p
        while (p < plen && isTelChar(payload.charAt(p))) p += 1
        if (p == st || p >= plen || payload.charAt(p) != ',') ok = false
        else { if (f == 0) a1 = payload.substring(st, p); p += 1 }
        f += 1
      }
      if (ok && p + 8 <= plen) {
        var j = p
        var bitsOk = true
        while (j < p + 8 && bitsOk) {
          val c = payload.charAt(j); if (c != '0' && c != '1') bitsOk = false; j += 1
        }
        if (bitsOk) { tlmA1 = a1; tlmBits = payload.substring(p, p + 8) }
      }
    }

    var wxDir: String = null
    var wxSpeed: String = null
    var wxGust: String = null
    var wxTemp: String = null
    if (ptype == "weather") {
      // full: ^_([0-9]{8})c([0-9. ]{3})s([0-9. ]{3})g([0-9. ]{3})t(-?[0-9. ]{2,3})
      @inline def cls3(from: Int): Boolean = from + 3 <= plen &&
        isWxChar(payload.charAt(from)) && isWxChar(payload.charAt(from + 1)) &&
        isWxChar(payload.charAt(from + 2))
      if (plen > 9 && payload.charAt(9) == 'c' && cls3(10) &&
        plen > 13 && payload.charAt(13) == 's' && cls3(14) &&
        plen > 17 && payload.charAt(17) == 'g' && cls3(18) &&
        plen > 21 && payload.charAt(21) == 't') {
        val tStart = 22
        var t = tStart
        if (t < plen && payload.charAt(t) == '-') t += 1
        var e = t
        while (e < plen && e < t + 3 && isWxChar(payload.charAt(e))) e += 1
        if (e - t >= 2) {
          wxDir = payload.substring(10, 13)
          wxSpeed = payload.substring(14, 17)
          wxGust = payload.substring(18, 21)
          wxTemp = payload.substring(tStart, e)
        }
      }
    }

    var msgAddr: String = null
    var msgText: String = null
    if (ptype == "message") {
      msgAddr = trimSpaces(payload.substring(1, msgAddrEnd))
      // ^:[^:]{9}:(.*)$ — no-match extracts "" (regexp_extract), not null
      val t = dotStarDollar(payload.substring(msgAddrEnd + 1))
      msgText = if (t == null) "" else t
    }

    var statusText: String = null
    if (ptype == "status") {
      // substring(payload, 2, 256): code points 2..257
      val cpLen = payload.codePointCount(0, plen)
      val st = payload.offsetByCodePoints(0, 1)
      val en = if (cpLen <= 257) plen else payload.offsetByCodePoints(0, 257)
      statusText = payload.substring(st, en)
    }

    // family-typed outputs are packet_type-gated like every other family
    // (r14 sweep: mice_speed/mice_course and pos_ambiguity leaked onto
    // 'other' rows whose body decoded but whose callsign was broken — the
    // reference gates mice_speed/course on ptype = 'mice', and
    // pos_ambiguity follows the file's own gating rule; 'thirdparty'
    // carries the INNER parse's values, themselves gated by the inner
    // classification). lat/lon/grid stay intentionally ungated in both
    // formulations.
    if (ptype != "mice" && ptype != "thirdparty") {
      miceSpeed = null; miceCourse = null
    }
    if (ptype != "position" && ptype != "position_ts" && ptype != "object" &&
      ptype != "item" && ptype != "thirdparty") posAmb = null

    var grid: String = null
    if (hasPos) {
      // identical IEEE op order to the replaced expression tree: least-clamp,
      // double / int-widened-to-double division, floor, pmod (nonneg → fmod)
      val adjLon = math.min(lon.doubleValue() + 180.0, 359.999999)
      val adjLat = math.min(lat.doubleValue() + 90.0, 179.999999)
      val sb = new java.lang.StringBuilder(6)
      sb.append(FIELD_LETTERS.charAt(math.floor(adjLon / 20).toInt))
      sb.append(FIELD_LETTERS.charAt(math.floor(adjLat / 10).toInt))
      sb.append(math.floor((adjLon % 20) / 2).toInt)
      sb.append(math.floor(adjLat % 10).toInt)
      sb.append(SUB_LETTERS.charAt(math.floor((adjLon % 2) * 12).toInt))
      sb.append(SUB_LETTERS.charAt(math.floor((adjLat % 1) * 24).toInt))
      grid = sb.toString
    }

    Parsed(callsign, path, payload, dti, lat, lon, ptype,
      objName, objKilled, tlmSeq, tlmA1, tlmBits,
      wxDir, wxSpeed, wxGust, wxTemp, msgAddr, msgText, statusText, grid,
      miceSpeed, miceCourse, tpCallsign, posAmb)
  }
}

/** Codegen'd fused TNC2 packet parser: string → struct of every parsed field
  * in ONE compiled pass per row (header split, payload classification,
  * position/message/object/telemetry/weather field extraction, Maidenhead
  * grid). Replaces ~15 independent regex executions per row; the DataFrame
  * layer ([[PacketParse.parse]]) projects the struct fields and applies the
  * unchanged ANSI `try_cast`s for the numeric fields, so cast semantics are
  * bit-for-bit those of the regex formulation (pinned by StreamingSpec /
  * Round7Spec and the 7 packet/geo DuckDB oracles).
  */
case class PacketFields(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }

  override def dataType: DataType = PacketFieldsUtil.schema
  override def prettyName: String = "graft_packet_fields"

  override def nullSafeEval(a: Any): Any =
    PacketFieldsUtil.parse(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.streaming.PacketFieldsUtil.parse($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
