package graft.functions

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar function coverage (SURVEY.md §2.8): string / date / math / JSON /
  * tokenize. All built-in codegen'd functions — no UDFs anywhere.
  *
  * Cross-engine type notes baked into the oracle SQL: DuckDB length/len →
  * BIGINT vs Spark INT (oracle casts to INT); DuckDB ceil/floor(double) →
  * DOUBLE vs Spark BIGINT (oracle casts to BIGINT); DuckDB ln = Spark log.
  */
object Scalars {
  import Tables.table

  val all: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q_str_funcs",
      "upper/length/substr/concat/replace over customer names.",
      (s, dir) =>
        table(s, dir, "customer")
          .orderBy("c_custkey")
          .limit(500)
          .select(
            upper(col("c_name")).as("u"),
            length(col("c_name")).as("l"),
            substring(col("c_name"), 1, 8).as("s"),
            concat(col("c_name"), lit("#"), col("c_mktsegment")).as("cc"),
            replace(col("c_mktsegment"), lit("A"), lit("_")).as("rep")),
      Some(
        // '||' not concat(): DuckDB concat() SKIPS NULL arguments while
        // Spark concat() returns NULL when any argument is — '||' propagates
        // NULL on both engines (r14 sweep; same class as the audit-checksum
        // concat_ws fix)
        "SELECT upper(c_name) AS u, CAST(length(c_name) AS INT) AS l, substr(c_name, 1, 8) AS s, " +
          "c_name || '#' || c_mktsegment AS cc, replace(c_mktsegment,'A','_') AS rep " +
          "FROM customer ORDER BY c_custkey LIMIT 500")),

    GraftQuery(
      "q_date_funcs",
      "year/month extraction + month truncation to DATE.",
      (s, dir) =>
        table(s, dir, "orders")
          .orderBy("o_orderkey")
          .limit(1000)
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("y"),
            month(col("o_orderdate")).as("m"),
            date_trunc("month", col("o_orderdate")).cast(DateType).as("mo")),
      Some(
        "SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS y, CAST(month(o_orderdate) AS INT) AS m, " +
          "CAST(date_trunc('month', o_orderdate) AS DATE) AS mo " +
          "FROM orders ORDER BY o_orderkey LIMIT 1000")),

    GraftQuery(
      "q_math_funcs",
      "sqrt/ln/ceil/floor/abs + epsilon compare. Quantization is " +
        "floor(x*10^n) — one IEEE multiply + exact floor, identical given " +
        "identical doubles — NOT round(x, n): Spark's Round HALF_UP-rounds " +
        "the SHORTEST-DECIMAL representation while DuckDB rounds the scaled " +
        "binary double, so they disagree on every halfway shortest-repr " +
        "(round(0.285, 2) = 0.29 Spark vs 0.28 DuckDB — r14 sweep). sqrt is " +
        "IEEE-correctly-rounded (identical bits both engines); ln is not " +
        "formally so (JVM Math.log vs libm may differ 1 ulp) — a residual " +
        "measure-zero boundary-straddle risk this quantization shares with " +
        "every float comparison, accepted and documented here.",
      (s, dir) =>
        table(s, dir, "lineitem")
          .orderBy("l_orderkey", "l_linenumber")
          .limit(1000)
          .select(
            col("l_orderkey"),
            col("l_linenumber"),
            // class-22/22c guards: TPC-H's columns are positive finite,
            // but at scale a zero/negative value makes DuckDB's sqrt/ln
            // RAISE (Spark: NaN/NULL), and a NaN/Inf makes Spark's
            // floor/ceil→LONG silently SATURATE (NaN→0, Inf→Long.MaxValue)
            // where DuckDB's CAST raises — every quantized leg routes
            // through the shared finite/sqrtNN/lnQuant devices, NULL on
            // both engines for degenerate input
            floor(graft.Exact.finite(
              graft.Exact.sqrtNN(col("l_extendedprice"))) * 1e4).as("sq"),
            graft.Exact.lnQuant(col("l_extendedprice")).as("lg"),
            ceil(graft.Exact.finite(col("l_quantity"))).as("c"),
            floor(graft.Exact.finite(col("l_tax")) * 100).as("f"),
            (abs(col("l_discount") - 0.05) < 1e-12).as("near5")),
      Some(
        "SELECT l_orderkey, l_linenumber, CAST(floor(" +
          graft.Exact.finiteSql(graft.Exact.sqrtNNSql("l_extendedprice")) +
          "*1e4) AS BIGINT) AS sq, " +
          graft.Exact.lnQuantSql("l_extendedprice") +
          " AS lg, CAST(ceil(" + graft.Exact.finiteSql("l_quantity") +
          ") AS BIGINT) AS c, " +
          "CAST(floor(" + graft.Exact.finiteSql("l_tax") +
          "*100) AS BIGINT) AS f, abs(l_discount-0.05) < 1e-12 AS near5 " +
          "FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 1000")),

    GraftQuery(
      "q_str_extra",
      "lpad / rpad / trim / reverse / regexp_extract coverage.",
      (s, dir) =>
        table(s, dir, "customer")
          .orderBy("c_custkey")
          .limit(500)
          .select(
            col("c_custkey"),
            lpad(col("c_name"), 25, "0").as("lp"),
            rpad(col("c_mktsegment"), 12, "_").as("rp"),
            trim(concat(lit("  "), col("c_name"), lit("  "))).as("tr"),
            reverse(col("c_name")).as("rev"),
            regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits")),
      Some(
        "SELECT c_custkey, lpad(c_name, 25, '0') AS lp, rpad(c_mktsegment, 12, '_') AS rp, " +
          "trim('  ' || c_name || '  ') AS tr, reverse(c_name) AS rev, " +
          "regexp_extract(c_name, '([0-9]+)', 1) AS digits " +
          "FROM customer ORDER BY c_custkey LIMIT 500")),

    GraftQuery(
      "q_date_extra",
      "datediff / clamped month addition / last_day / day-of-month coverage. " +
        "Month arithmetic clamps to month end identically on both engines (verified).",
      (s, dir) =>
        table(s, dir, "orders")
          .orderBy("o_orderkey")
          .limit(1000)
          .select(
            col("o_orderkey"),
            datediff(col("o_orderdate"), lit("1995-01-01").cast(TimestampType)).as("dd"),
            add_months(col("o_orderdate"), 3).as("am"),
            last_day(col("o_orderdate")).as("ld"),
            dayofmonth(col("o_orderdate")).as("d")),
      Some(
        "SELECT o_orderkey, CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS dd, " +
          "CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS am, " +
          "last_day(CAST(o_orderdate AS DATE)) AS ld, " +
          "CAST(day(o_orderdate) AS INT) AS d " +
          "FROM orders ORDER BY o_orderkey LIMIT 1000")),

    GraftQuery(
      "q_json_extract",
      "Extract an int field from a JSON string column (get_json_object — no " +
        "JSON logical type). The integer contract is an EXPLICIT regex guard " +
        "([+-]?digits, ≤9 so INT can't overflow) on both engines: a bare " +
        "CAST of the extracted string would CRASH the Spark job under ANSI " +
        "on any non-integer k where DuckDB's CAST silently ROUNDS ('3.7' → " +
        "4 — even TRY_CAST rounds there), and DuckDB's json_extract_string " +
        "ERRORS on malformed JSON where get_json_object yields NULL — so " +
        "every out-of-contract shape maps to NULL symmetrically instead " +
        "(r14 sweep).",
      (s, dir) => {
        val ks = get_json_object(col("props"), "$.k")
        table(s, dir, "events")
          .orderBy("event_id")
          .limit(1000)
          .select(
            col("event_id"),
            // \A..\z, not ^..$: Java's $ tolerates one FINAL line terminator
            // ('12\n' would match and ANSI-cast to 12) while RE2's $ is
            // end-of-text — \A/\z mean end-of-text in BOTH engines
            when(ks.rlike("\\A[+-]?[0-9]{1,9}\\z"), ks.cast(IntegerType)).as("k"))
      },
      Some(
        "SELECT event_id, CASE WHEN json_valid(props) THEN " +
          "CASE WHEN regexp_matches(json_extract_string(props, '$.k'), '\\A[+-]?[0-9]{1,9}\\z') " +
          "THEN CAST(json_extract_string(props, '$.k') AS INT) END END AS k " +
          "FROM events ORDER BY event_id LIMIT 1000")),

    GraftQuery(
      "q_array_funcs",
      "Array function coverage: sort_array / array_contains / slice / array_distinct " +
        "sizes over the token arrays.",
      (s, dir) =>
        table(s, dir, "documents")
          .select(
            col("doc_id"),
            element_at(sort_array(split(col("text"), " ")), 1).as("first_tok"),
            array_contains(split(col("text"), " "), "the").as("has_the"),
            size(slice(split(col("text"), " "), 1, 5)).as("n_first5"),
            size(array_distinct(split(col("text"), " "))).as("n_uniq"))
          .orderBy("doc_id"),
      Some(
        "SELECT doc_id, list_sort(string_split(text,' '))[1] AS first_tok, " +
          "list_contains(string_split(text,' '), 'the') AS has_the, " +
          "CAST(len(string_split(text,' ')[1:5]) AS INT) AS n_first5, " +
          "CAST(len(list_distinct(string_split(text,' '))) AS INT) AS n_uniq " +
          "FROM documents ORDER BY doc_id")),

    GraftQuery(
      "q_cond_bit_funcs",
      "Conditional (coalesce/nullif/greatest/least) + bitwise (and/or/xor/shift) coverage.",
      (s, dir) =>
        table(s, dir, "orders")
          .orderBy("o_orderkey")
          .limit(1000)
          .select(
            col("o_orderkey"),
            coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("st"),
            greatest(col("o_totalprice"), lit(100000.0)).as("g"),
            least(col("o_totalprice"), lit(100000.0)).as("l"),
            col("o_orderkey").bitwiseAND(lit(255L)).as("band"),
            col("o_orderkey").bitwiseOR(lit(7L)).as("bor"),
            col("o_orderkey").bitwiseXOR(lit(255L)).as("bxor"),
            expr("shiftright(o_orderkey, 4)").as("shr")),
      Some(
        "SELECT o_orderkey, coalesce(nullif(o_orderstatus,'O'),'open') AS st, " +
          "greatest(o_totalprice, 100000.0) AS g, least(o_totalprice, 100000.0) AS l, " +
          "(o_orderkey & 255) AS band, (o_orderkey | 7) AS bor, xor(o_orderkey, 255) AS bxor, " +
          "(o_orderkey >> 4) AS shr FROM orders ORDER BY o_orderkey LIMIT 1000")),

    GraftQuery(
      "q_str_regex",
      "regexp_replace (global — DuckDB needs the 'g' flag to match Spark's " +
        "replace-all default) + translate.",
      (s, dir) =>
        table(s, dir, "customer")
          .orderBy("c_custkey")
          .limit(500)
          .select(
            col("c_custkey"),
            regexp_replace(col("c_name"), "[0-9]", "#").as("masked"),
            translate(col("c_name"), "0123456789", "abcdefghij").as("tr")),
      Some(
        "SELECT c_custkey, regexp_replace(c_name, '[0-9]', '#', 'g') AS masked, " +
          "translate(c_name, '0123456789', 'abcdefghij') AS tr " +
          "FROM customer ORDER BY c_custkey LIMIT 500")),

    GraftQuery(
      "q_map_funcs",
      "MapType surface: from_json into map<string,int>, key cardinality + " +
        "lookup. The parse domain is an EXPLICIT shared regex (flat object, " +
        "integer values ≤9 digits): outside it the two engines genuinely " +
        "disagree — Spark's from_json nulls the WHOLE map when any value " +
        "fails the int schema ({\"k\": 3.7} → NULL map) while DuckDB " +
        "answers per-key (json_keys = 1, value rounds to 4), and a valid " +
        "non-object ('[1,2]') is NULL map vs len 0 — so both engines " +
        "answer NULL for every out-of-contract row instead (r14 sweep).",
      (s, dir) => {
        // \A/\z anchors (end-of-text in BOTH regex engines — Java's $
        // tolerates a final '\n' that RE2's does not, r14 diff review).
        // The regex is the SHARED contract; the oracle additionally nests
        // json_valid because a regex-passing-but-invalid shape (leading-zero
        // int '007': Spark's from_json nulls the map) would ERROR DuckDB's
        // json_keys instead of answering NULL.
        val pat = "\\A\\{\\s*\\}\\z|\\A\\{\\s*\"[^\"]*\"\\s*:\\s*-?[0-9]{1,9}\\s*" +
          "(,\\s*\"[^\"]*\"\\s*:\\s*-?[0-9]{1,9}\\s*)*\\}\\z"
        val valid = col("props").rlike(pat)
        val m = from_json(col("props"), MapType(StringType, IntegerType))
        table(s, dir, "events")
          .orderBy("event_id")
          .limit(1000)
          .select(
            col("event_id"),
            when(valid, size(map_keys(m))).as("n_keys"),
            when(valid, element_at(m, "k")).as("k"))
      },
      Some {
        val pat = "\\A\\{\\s*\\}\\z|\\A\\{\\s*\"[^\"]*\"\\s*:\\s*-?[0-9]{1,9}\\s*" +
          "(,\\s*\"[^\"]*\"\\s*:\\s*-?[0-9]{1,9}\\s*)*\\}\\z"
        s"SELECT event_id, CASE WHEN regexp_matches(props, '$pat') THEN " +
          "CASE WHEN json_valid(props) THEN CAST(len(json_keys(props)) AS INT) END END AS n_keys, " +
          s"CASE WHEN regexp_matches(props, '$pat') THEN " +
          "CASE WHEN json_valid(props) THEN TRY_CAST(json_extract_string(props, '$.k') AS INT) END END AS k " +
          "FROM events ORDER BY event_id LIMIT 1000"
      }),

    GraftQuery(
      "q_str_split_tokens",
      "Whitespace tokenize + count. Spark split pattern is a regex — single space is literal-safe.",
      (s, dir) =>
        table(s, dir, "documents")
          .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"))
          .orderBy("doc_id"),
      Some(
        "SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_tokens " +
          "FROM documents ORDER BY doc_id")),

    GraftQuery(
      "q_str_levenshtein",
      "Edit distance between each nation name and its region name (integer DP " +
        "metric — deterministic cross-engine, unlike similarity scores) — the " +
        "fuzzy-matching primitive for entity resolution.",
      (s, dir) =>
        table(s, dir, "nation")
          .join(broadcast(table(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .select(
            col("n_name"),
            col("r_name"),
            levenshtein(col("n_name"), col("r_name")).as("dist"))
          .orderBy("n_name"),
      Some(
        "SELECT n_name, r_name, CAST(levenshtein(n_name, r_name) AS INT) AS dist " +
          "FROM nation JOIN region ON n_regionkey = r_regionkey ORDER BY n_name"))
    ,

    GraftQuery(
      "q_array_hof",
      "The higher-order-function surface as a first-class battery — " +
        "transform / filter / exists / aggregate(fold) / array_sort over " +
        "per-document token arrays, the lambda-expression API users reach " +
        "for before dropping to UDFs (and the reason they never need to): " +
        "long-token count (filter), leading-capital detection (exists), " +
        "total character fold (aggregate with an explicit zero — a " +
        "sequential left fold, deterministic by definition), longest " +
        "token (array_max∘transform), and the lexicographically first " +
        "token (array_sort). All integer/boolean/string outputs — " +
        "nothing to drift. One map pass; the arrays never leave their " +
        "row.",
      (s, dir) => {
        val toks = split(col("text"), " ")
        table(s, dir, "documents")
          // NULL text is excluded symmetrically (oracle WHERE mirrors):
          // Spark's aggregate(NULL, 0, ...) folds to NULL while the
          // oracle's list_concat([0], NULL) swallows the NULL list into
          // [0] and folds to 0 — the exclusion is the explicit
          // cross-engine contract (r14 sweep, NULL-symmetry discipline)
          .filter(col("text").isNotNull)
          .select(col("doc_id"),
            size(filter(toks, t => length(t) > 5)).cast(LongType)
              .as("n_long"),
            exists(toks, t => t.rlike("^[A-Z]")).as("has_cap"),
            aggregate(toks, lit(0L), (acc, t) => acc + length(t))
              .as("total_chars"),
            array_max(transform(toks, t => length(t))).cast(LongType)
              .as("max_len"),
            element_at(array_sort(toks), 1).as("first_tok"))
          .orderBy("doc_id")
          .limit(500)
      },
      Some(
        """SELECT doc_id,
          |  CAST(len(list_filter(string_split(text, ' '), t -> len(t) > 5))
          |    AS BIGINT) AS n_long,
          |  len(list_filter(string_split(text, ' '),
          |    t -> regexp_matches(t, '^[A-Z]'))) > 0 AS has_cap,
          |  CAST(list_reduce(list_concat([CAST(0 AS BIGINT)],
          |    list_transform(string_split(text, ' '),
          |      t -> CAST(len(t) AS BIGINT))), (a, b) -> a + b) AS BIGINT)
          |    AS total_chars,
          |  CAST(list_max(list_transform(string_split(text, ' '),
          |    t -> len(t))) AS BIGINT) AS max_len,
          |  list_sort(string_split(text, ' '))[1] AS first_tok
          |FROM documents WHERE text IS NOT NULL
          |ORDER BY doc_id LIMIT 500""".stripMargin))
  )
}
