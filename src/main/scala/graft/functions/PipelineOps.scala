package graft.functions

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline composition operators (SURVEY.md §2.11 stretch
  * set, round 7): repetition scoring, deterministic stratified sampling,
  * context-window sequence packing, unigram-LM surprisal, and the end-to-end
  * curation funnel that chains the quality gates.
  *
  * Scale notes:
  *  - Every operator is one token explode (map-side Generator) plus one or
  *    two hash aggregations — no self-joins, nothing corpus-quadratic.
  *  - q_pack_sequences is the one op that needs a GLOBAL running sum; it uses
  *    the two-pass chunked prefix-sum (the q_win_global_rank_2pass technique)
  *    instead of a single-partition window, so the token stream never
  *    serializes through one task.
  *  - Sampling and splitting are content-hash-deterministic (md5), so the
  *    same document lands in the same sample on any engine at any
  *    partitioning — reshuffling or re-running a 100 TB job cannot change
  *    the selected set.
  */
object PipelineOps {
  import Tables.table

  /** Tokens-per-doc relation used by packing: exact split on single spaces
    * matches the generator and the oracle's string_split. */
  private def tokCounts(s: org.apache.spark.sql.SparkSession, dir: String) =
    table(s, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))

  val all: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q_text_repetition",
      "Gopher-style repetition signals per document: top-token fraction " +
        "(share of the doc taken by its most frequent token) and type-token " +
        "ratio, aggregated per language with a repetitive-doc count " +
        "(top fraction > 0.1). One explode → (doc, token) counts → two hash " +
        "aggs; the per-doc fractions are single IEEE divisions of exact " +
        "integers, so the > 0.1 gate is cross-engine deterministic. " +
        "Spark shape: the per-doc counts come from the codegen'd TokenStats " +
        "(one compiled hash-map pass per row) — NO explode and NO (doc, w) " +
        "exchange; the only shuffle is the 5-row language rollup. The oracle " +
        "keeps the explode+GROUP BY spelling and the gate pins equality.",
      (s, dir) => {
        val perDoc = Tables.spread(s, table(s, dir, "documents"))
          .select(col("lang"), VectorExpr.tokenStats(split(col("text"), " ")).as("st"))
          .select(col("lang"),
            (col("st.top_cnt").cast("double") / col("st.n_tok").cast("double")).as("top_frac"),
            (col("st.n_distinct").cast("double") / col("st.n_tok").cast("double")).as("ttr"))
        perDoc.groupBy("lang").agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("top_frac") > 0.1, 1L).otherwise(0L)).as("n_repetitive"),
          round(avg(col("top_frac")), 4).as("avg_top_frac"),
          round(avg(col("ttr")), 4).as("avg_ttr"))
          .orderBy("lang")
      },
      Some(
        """WITH tf AS (
          |  SELECT doc_id, lang, w, count(*) AS c FROM (
          |    SELECT doc_id, lang, unnest(string_split(text,' ')) AS w FROM documents)
          |  GROUP BY doc_id, lang, w),
          |per_doc AS (
          |  SELECT doc_id, lang,
          |         CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_frac,
          |         CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS ttr
          |  FROM tf GROUP BY doc_id, lang)
          |SELECT lang, count(*) AS n_docs,
          |       CAST(sum(CASE WHEN top_frac > 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive,
          |       round(avg(top_frac), 4) AS avg_top_frac,
          |       round(avg(ttr), 4) AS avg_ttr
          |FROM per_doc GROUP BY lang ORDER BY lang""".stripMargin)),

    GraftQuery(
      "q_text_top_bigram",
      "Gopher-style n-gram repetition: fraction of each document occupied by " +
        "its most frequent BIGRAM, per-language aggregate with a flagged-doc " +
        "count (top bigram fraction > 0.05) — catches templated/boilerplate " +
        "text that unigram stats miss. Spark shape: the codegen'd " +
        "StringShingles(2) builds bigrams and TokenStats counts them in the " +
        "same map-side projection — NO explode, NO (doc, bigram) exchange; " +
        "the only shuffle is the 5-row language rollup. The oracle spells " +
        "the full unnest+GROUP BY form; the gate pins equality.",
      (s, dir) => {
        val toks = split(col("text"), " ")
        val perDoc = Tables.spread(s, table(s, dir, "documents"))
          .filter(size(toks) >= 2)
          .select(col("lang"),
            VectorExpr.tokenStats(VectorExpr.shingles(toks, 2)).as("st"))
          .select(col("lang"),
            (col("st.top_cnt").cast("double") / col("st.n_tok").cast("double")).as("top_bg"))
        perDoc.groupBy("lang").agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("top_bg") > 0.05, 1L).otherwise(0L)).as("n_flagged"),
          round(avg(col("top_bg")), 4).as("avg_top_bigram"))
          .orderBy("lang")
      },
      Some(
        """WITH t AS (SELECT doc_id, lang, string_split(text,' ') AS l FROM documents
          |           WHERE len(string_split(text,' ')) >= 2),
          |bg AS (SELECT doc_id, lang,
          |  list_transform(list_zip(l[1:len(l)-1], l[2:]), z -> z[1] || ' ' || z[2]) AS bigrams
          |  FROM t),
          |tf AS (SELECT doc_id, lang, b, count(*) AS c FROM (
          |    SELECT doc_id, lang, unnest(bigrams) AS b FROM bg)
          |  GROUP BY doc_id, lang, b),
          |per_doc AS (SELECT doc_id, lang,
          |    CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_bg
          |  FROM tf GROUP BY doc_id, lang)
          |SELECT lang, count(*) AS n_docs,
          |  CAST(sum(CASE WHEN top_bg > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
          |  round(avg(top_bg), 4) AS avg_top_bigram
          |FROM per_doc GROUP BY lang ORDER BY lang""".stripMargin)),

    GraftQuery(
      "q_sample_topk_hash",
      "Fixed-SIZE stratified sampling (the deterministic reservoir): the 20 " +
        "docs per language with the smallest (md5(doc_id), doc_id) sort key. " +
        "Unlike the rate-based q_sample_stratified, every stratum yields " +
        "exactly min(20, |stratum|) docs — the eval-set carve-out shape — " +
        "and the hash order makes the choice engine- and partitioning-" +
        "independent. One windowed rank per stratum, then a 5-row rollup.",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("lang")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        table(s, dir, "documents")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 20)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_sampled"), sum(col("n_chars")).as("sampled_chars"))
          .orderBy("lang")
      },
      Some(
        """SELECT lang, count(*) AS n_sampled,
          |  CAST(sum(n_chars) AS BIGINT) AS sampled_chars
          |FROM (SELECT lang, n_chars, row_number() OVER (
          |    PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
          |  FROM documents)
          |WHERE rn <= 20 GROUP BY lang ORDER BY lang""".stripMargin)),

    GraftQuery(
      "q_sample_stratified",
      "Deterministic stratified sampling: keep a document iff the first hex " +
        "digit of md5(doc_id) is 0 or 1 (expected 12.5% rate), reported per " +
        "language stratum with the exact char mass of the sample. " +
        "Content-free-id hashing means the sample is reproducible across " +
        "engines, partitionings, and reruns — the dataset-card staple for " +
        "eval-split carve-outs at 100 TB.",
      (s, dir) => {
        val sampled = substring(md5(col("doc_id").cast("string")), 1, 1).isin("0", "1")
        table(s, dir, "documents")
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_total"),
            sum(when(sampled, 1L).otherwise(0L)).as("n_sampled"),
            sum(when(sampled, col("n_chars")).otherwise(0L)).as("sampled_chars"))
          .orderBy("lang")
      },
      Some(
        """SELECT lang, count(*) AS n_total,
          |  CAST(sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,1) IN ('0','1') THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
          |  CAST(sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,1) IN ('0','1') THEN n_chars ELSE 0 END) AS BIGINT) AS sampled_chars
          |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    GraftQuery(
      "q_pack_sequences",
      "Context-window sequence packing (concat-then-chop): documents ordered " +
        "by doc_id are laid end to end and each starts in bin " +
        "floor(preceding_tokens / 2048) — per-bin doc and token counts. The " +
        "global prefix sum is TWO-PASS (per-chunk subtotals + a window over " +
        "the tiny chunk relation, then a within-chunk window), so no stage " +
        "ever sees the whole corpus in one partition; at 100 TB the chunk " +
        "relation is ~n_docs/512 rows and the second pass is fully parallel " +
        "per chunk.",
      (s, dir) => {
        // the explicit chunk repartition is the ONE exchange both passes
        // share (ReuseExchange): the within-chunk running sums come FIRST,
        // each chunk's subtotal is its end row's running value, and the
        // offsets branch reads those band-end rows THROUGH the same window
        // subtree — an aggregate of the pre-window relation would prune
        // doc_id out of its exchange copy and break the sharing. <=> keeps
        // the join from inferring IsNotNull into one branch. The corpus is
        // tokenized exactly once; the chunk-grain offset window (512x
        // smaller than docs) stays acceptable single-partition work,
        // hierarchical at extreme scale.
        val toks = tokCounts(s, dir).withColumn("chunk", expr("doc_id div 512"))
          .repartition(col("chunk"))
        val wLo = Window.partitionBy("chunk").orderBy("doc_id")
        val win = toks
          .withColumn("run", sum(col("n_tok")).over(
            wLo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("rk_loc", row_number().over(wLo))
          .withColumn("nc", count(lit(1)).over(Window.partitionBy("chunk")))
        val offsets = win.filter(col("rk_loc") === col("nc"))
          .select(col("chunk").as("chunk2"), col("run").as("cs"))
          .withColumn("off",
            sum(col("cs")).over(Window.orderBy("chunk2")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - col("cs"))
          .select(col("chunk2"), col("off"))
        // pass 2: the local running sum shifted by the chunk offset
        val cum = win
          .join(broadcast(offsets), col("chunk") <=> col("chunk2"))
          .withColumn("cum", col("off") + col("run"))
        cum.withColumn("bin", expr("(cum - n_tok) div 2048"))
          .groupBy("bin")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
          .orderBy("bin")
      },
      Some(
        """WITH t AS (
          |  SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok FROM documents),
          |c AS (
          |  SELECT doc_id, n_tok, sum(n_tok) OVER (
          |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t)
          |SELECT CAST((cum - n_tok) // 2048 AS BIGINT) AS bin, count(*) AS n_docs,
          |       CAST(sum(n_tok) AS BIGINT) AS n_tokens
          |FROM c GROUP BY bin ORDER BY bin""".stripMargin)),

    GraftQuery(
      "q_text_surprisal",
      "Unigram-LM surprisal: train token probabilities on the corpus itself " +
        "(cf/total), score each doc by mean negative log-likelihood per " +
        "token, return the 10 most surprising docs. The corpus-frequency leg " +
        "is derived FROM the tf relation as a SUM WINDOW over the term — the " +
        "corpus is tokenized and shuffled exactly once, structurally (no " +
        "duplicate subtree for ReuseExchange to find, so the physical plan " +
        "stays clone-safe for re-execution harnesses). The total-token count " +
        "is one exchange-free map pass over documents (size(split), no " +
        "explode) broadcast as a single row.",
      (s, dir) => {
        // map-side tf via the codegen'd TokenCounts — see q_text_tfidf
        val tf = Tables.spread(s, table(s, dir, "documents"))
          .select(col("doc_id"),
            explode(VectorExpr.tokenCounts(split(col("text"), " "))).as("kv"))
          .select(col("doc_id"), col("kv.w").as("w"), col("kv.c").as("tf"))
        val tot = table(s, dir, "documents")
          .select(size(split(col("text"), " ")).cast("long").as("n"))
          .agg(sum(col("n")).as("total"))
        tf.withColumn("cf",
            sum(col("tf")).over(org.apache.spark.sql.expressions.Window.partitionBy("w")))
          .crossJoin(broadcast(tot))
          .groupBy("doc_id")
          .agg(round(
            sum(col("tf") * -log(col("cf").cast("double") / col("total").cast("double")))
              / sum(col("tf")), 6).as("avg_nll"))
          .orderBy(col("avg_nll").desc, col("doc_id"))
          .limit(10)
      },
      Some(
        """WITH tf AS (SELECT doc_id, w, count(*) AS tf FROM (
          |    SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents)
          |  GROUP BY doc_id, w),
          |cf AS (SELECT w, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY w),
          |tot AS (SELECT CAST(sum(cf) AS BIGINT) AS total FROM cf)
          |SELECT doc_id,
          |  round(sum(tf * -ln(CAST(cf AS DOUBLE) / CAST(total AS DOUBLE))) / sum(tf), 6) AS avg_nll
          |FROM tf JOIN cf USING (w) CROSS JOIN tot
          |GROUP BY doc_id ORDER BY avg_nll DESC, doc_id LIMIT 10""".stripMargin)),

    GraftQuery(
      "q_text_keywords",
      "Distinctive vocabulary per language — smoothed frequency-ratio keyword " +
        "extraction (the log-odds/keyness family): score(w, L) = " +
        "(count in L + 1) / (count outside L + 1), top-3 terms per language. " +
        "Exact integer counts and one IEEE division keep the ranking " +
        "cross-engine deterministic. Spark shape: the (lang, term) counts " +
        "explode pre-reduced TokenCounts pairs, the out-of-language count " +
        "comes from a SUM WINDOW over the term (same structural single-" +
        "tokenize as tfidf), and the per-language top-3 is one windowed rank " +
        "over the vocabulary-sized score relation.",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val tf = Tables.spread(s, table(s, dir, "documents"))
          .select(col("lang"),
            explode(VectorExpr.tokenCounts(split(col("text"), " "))).as("kv"))
          .groupBy(col("lang"), col("kv.w").as("w"))
          .agg(sum(col("kv.c")).as("cl"))
        val scored = tf
          .withColumn("ct", sum(col("cl")).over(Window.partitionBy("w")))
          .select(col("lang"), col("w").as("term"),
            round((col("cl") + 1).cast("double") / (col("ct") - col("cl") + 1).cast("double"), 6)
              .as("score"))
        scored
          .withColumn("rn", row_number().over(
            Window.partitionBy("lang").orderBy(col("score").desc, col("term"))))
          .filter(col("rn") <= 3)
          .select("lang", "term", "score")
          .orderBy("lang", "term")
      },
      Some(
        """WITH tf AS (SELECT lang, w, count(*) AS cl FROM (
          |    SELECT lang, unnest(string_split(text,' ')) AS w FROM documents)
          |  GROUP BY lang, w),
          |t AS (SELECT lang, w, cl, sum(cl) OVER (PARTITION BY w) AS ct FROM tf),
          |s AS (SELECT lang, w AS term,
          |    round(CAST(cl + 1 AS DOUBLE) / CAST(ct - cl + 1 AS DOUBLE), 6) AS score
          |  FROM t),
          |r AS (SELECT lang, term, score, row_number() OVER (
          |    PARTITION BY lang ORDER BY score DESC, term) AS rn FROM s)
          |SELECT lang, term, score FROM r WHERE rn <= 3 ORDER BY lang, term""".stripMargin)),

    GraftQuery(
      "q_quality_pipeline",
      "End-to-end curation funnel: token-length gate (20..400) → exact-dup " +
        "removal keeping the first doc per content hash → language gate (en) " +
        "→ survivors per source. The composition query — each stage is an " +
        "operator gated elsewhere; this pins that chaining them preserves " +
        "semantics. One explode-free pass: length from size(split), dedup " +
        "via the md5-window, both before the cheap final agg.",
      (s, dir) => {
        val docs = table(s, dir, "documents")
          .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
          .filter(col("n_tok") >= 20 && col("n_tok") <= 400)
        val rep = docs.withColumn("rn",
          row_number().over(Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
          .filter(col("rn") === 1)
        rep.filter(col("lang") === "en")
          .groupBy("source")
          .agg(count(lit(1)).as("n"), sum(col("n_tok")).as("tokens"))
          .orderBy("source")
      },
      Some(
        """WITH lengate AS (
          |  SELECT *, CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok
          |  FROM documents
          |  WHERE len(string_split(text,' ')) BETWEEN 20 AND 400),
          |rep AS (
          |  SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
          |  FROM lengate)
          |SELECT source, count(*) AS n, CAST(sum(n_tok) AS BIGINT) AS tokens
          |FROM rep WHERE rn = 1 AND lang = 'en'
          |GROUP BY source ORDER BY source""".stripMargin)),

    GraftQuery(
      "q_text_pii_scrub",
      "PII redaction — the curation stage every released corpus runs: global " +
        "regexp replacement of emails and phone-shaped spans with typed " +
        "placeholders, plus per-author found-span counts and the exact char " +
        "mass of the scrubbed text. The synthetic corpus carries no PII, so " +
        "PII-bearing text is RENDERED deterministically from the events " +
        "integers (the q_geo_* discipline) and the oracle runs the IDENTICAL " +
        "portable regexes in DuckDB — the gate pins both engines' regex " +
        "semantics (greedy classes only, no engine-specific syntax) and the " +
        "byte-exact replacement. Scale shape: render + scrub + count are all " +
        "map-side behind the spread; one author-keyed hash agg shuffles four " +
        "integers per author.",
      (s, dir) => {
        val e = table(s, dir, "events")
          .filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"))
        val text = concat(
          lit("user "), col("user_id").cast("string"),
          lit(" mail u"), col("user_id").cast("string"),
          lit("@ex"), pmod(col("event_id"), lit(10L)).cast("string"),
          lit(".com tel "),
          lpad(pmod(col("event_id"), lit(1000L)).cast("string"), 3, "0"), lit("-"),
          lpad(pmod(col("event_id") * 7, lit(10000L)).cast("string"), 4, "0"),
          when(pmod(col("event_id"), lit(3L)) === 0,
            concat(lit(" alt u"), (col("user_id") + 1).cast("string"), lit("@ex0.com")))
            .otherwise(lit("")),
          lit(" end"))
        val email = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
        val phone = "[0-9]{3}-[0-9]{4}"
        Tables.spread(s, e.select(col("user_id"), text.as("text")))
          .select(col("user_id"),
            expr(s"regexp_count(text, '$email')").as("ne"),
            expr(s"regexp_count(text, '$phone')").as("np"),
            regexp_replace(
              regexp_replace(col("text"), email, "<EMAIL>"),
              phone, "<PHONE>").as("scrubbed"))
          .groupBy(concat(lit("U"), col("user_id").cast("string")).as("who"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("ne")).as("n_email"),
            sum(col("np")).as("n_phone"),
            sum(length(col("scrubbed")).cast("long")).as("scrubbed_chars"))
          .orderBy("who")
      },
      Some(
        """WITH t AS (
          |  SELECT event_id, user_id,
          |    'user ' || CAST(user_id AS VARCHAR) || ' mail u' || CAST(user_id AS VARCHAR) ||
          |    '@ex' || CAST(event_id % 10 AS VARCHAR) || '.com tel ' ||
          |    lpad(CAST(event_id % 1000 AS VARCHAR), 3, '0') || '-' ||
          |    lpad(CAST((event_id * 7) % 10000 AS VARCHAR), 4, '0') ||
          |    CASE WHEN event_id % 3 = 0
          |         THEN ' alt u' || CAST(user_id + 1 AS VARCHAR) || '@ex0.com' ELSE '' END || ' end'
          |    AS text
          |  FROM events WHERE event_type = 'click'),
          |s AS (
          |  SELECT user_id,
          |    len(regexp_extract_all(text, '[a-z0-9]+@[a-z0-9]+\.[a-z]+')) AS ne,
          |    len(regexp_extract_all(text, '[0-9]{3}-[0-9]{4}')) AS np,
          |    regexp_replace(regexp_replace(text, '[a-z0-9]+@[a-z0-9]+\.[a-z]+', '<EMAIL>', 'g'),
          |                   '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS scrubbed
          |  FROM t)
          |SELECT 'U' || CAST(user_id AS VARCHAR) AS who,
          |  count(*) AS n_docs,
          |  CAST(sum(ne) AS BIGINT) AS n_email,
          |  CAST(sum(np) AS BIGINT) AS n_phone,
          |  CAST(sum(length(scrubbed)) AS BIGINT) AS scrubbed_chars
          |FROM s GROUP BY who ORDER BY who""".stripMargin)),

    GraftQuery(
      "q_text_url_stats",
      "URL extraction + per-domain roll-up — the web-corpus provenance stage: " +
        "pull every URL out of rendered text (regexp_extract_all → explode), " +
        "derive the domain, count and mass per domain. Text is rendered " +
        "deterministically from the events integers and the oracle runs the " +
        "IDENTICAL portable regexes (greedy classes, no lazy ops) — the gate " +
        "pins extraction, the multi-URL-per-row fan-out, and the domain " +
        "derivation across engines. Map-side extract behind the spread; one " +
        "10-domain hash agg.",
      (s, dir) => {
        val e = table(s, dir, "events")
          .filter(col("event_type") === "view")
          .select(col("event_id"))
        val text = concat(
          lit("see https://site"), pmod(col("event_id"), lit(7L)).cast("string"),
          lit(".example/p/"), col("event_id").cast("string"),
          when(pmod(col("event_id"), lit(2L)) === 0,
            concat(lit(" and http://cdn"), pmod(col("event_id"), lit(3L)).cast("string"),
              lit(".example/img"))).otherwise(lit("")))
        val urlPat = "https?://[a-z0-9.]+[a-z0-9./]*"
        Tables.spread(s, e.select(text.as("text")))
          .select(explode(expr(s"regexp_extract_all(text, '$urlPat', 0)")).as("url"))
          .select(
            regexp_extract(col("url"), "^https?://([a-z0-9.]+)", 1).as("domain"),
            length(col("url")).cast("long").as("l"))
          .groupBy("domain")
          .agg(count(lit(1)).as("n_urls"), sum(col("l")).as("url_chars"))
          .orderBy("domain")
      },
      Some(
        """WITH t AS (
          |  SELECT event_id,
          |    'see https://site' || CAST(event_id % 7 AS VARCHAR) || '.example/p/' ||
          |    CAST(event_id AS VARCHAR) ||
          |    CASE WHEN event_id % 2 = 0
          |         THEN ' and http://cdn' || CAST(event_id % 3 AS VARCHAR) || '.example/img' ELSE '' END
          |    AS text
          |  FROM events WHERE event_type = 'view'),
          |u AS (SELECT unnest(regexp_extract_all(text, 'https?://[a-z0-9.]+[a-z0-9./]*')) AS url FROM t)
          |SELECT regexp_extract(url, '^https?://([a-z0-9.]+)', 1) AS domain,
          |  count(*) AS n_urls,
          |  CAST(sum(length(url)) AS BIGINT) AS url_chars
          |FROM u GROUP BY domain ORDER BY domain""".stripMargin)),

    GraftQuery(
      "q_dedup_url_canonical",
      "URL canonicalization dedup — the crawl-frontier stage that collapses " +
        "tracking-parameter/fragment/trailing-slash variants of the same " +
        "resource: strip '?…'/'#…' then the trailing slash, count raw vs " +
        "distinct-raw vs canonical per domain. URLs are rendered " +
        "deterministically from the events integers WITH variant noise " +
        "(utm params, fragments, optional trailing slash), and the oracle " +
        "runs the IDENTICAL portable regexes — the gate pins the " +
        "canonicalization rules and both distinct cardinalities. Scale " +
        "shape: render + canonicalize map-side; the two DISTINCT legs plan " +
        "one Expand + two-phase agg over slim (domain, url, canon) rows — " +
        "at crawl scale the same query keyed by canon IS the frontier dedup.",
      (s, dir) => {
        val e = table(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .select(col("event_id"))
        val url = concat(
          lit("https://site"), pmod(col("event_id"), lit(5L)).cast("string"),
          lit(".example/p/"), pmod(col("event_id"), lit(40L)).cast("string"),
          when(pmod(col("event_id"), lit(3L)) === 0, "/").otherwise(""),
          when(pmod(col("event_id"), lit(2L)) === 0,
            concat(lit("?utm="), pmod(col("event_id"), lit(7L)).cast("string"))).otherwise(""),
          when(pmod(col("event_id"), lit(4L)) === 0,
            concat(lit("#s"), pmod(col("event_id"), lit(3L)).cast("string"))).otherwise(""))
        Tables.spread(s, e.select(url.as("url")))
          .select(col("url"),
            regexp_replace(regexp_replace(col("url"), "[?#].*$", ""), "/$", "").as("canon"))
          .groupBy(regexp_extract(col("canon"), "^https?://([a-z0-9.]+)", 1).as("domain"))
          .agg(
            count(lit(1)).as("n_raw"),
            countDistinct(col("url")).as("n_distinct_raw"),
            countDistinct(col("canon")).as("n_canonical"),
            (countDistinct(col("url")) - countDistinct(col("canon"))).as("n_collapsed"))
          .orderBy("domain")
      },
      Some(
        """WITH t AS (
          |  SELECT event_id,
          |    'https://site' || CAST(event_id % 5 AS VARCHAR) || '.example/p/' ||
          |    CAST(event_id % 40 AS VARCHAR) ||
          |    CASE WHEN event_id % 3 = 0 THEN '/' ELSE '' END ||
          |    CASE WHEN event_id % 2 = 0 THEN '?utm=' || CAST(event_id % 7 AS VARCHAR) ELSE '' END ||
          |    CASE WHEN event_id % 4 = 0 THEN '#s' || CAST(event_id % 3 AS VARCHAR) ELSE '' END
          |    AS url
          |  FROM events WHERE event_type = 'purchase'),
          |c AS (SELECT url,
          |    regexp_replace(regexp_replace(url, '[?#].*$', ''), '/$', '') AS canon
          |  FROM t)
          |SELECT regexp_extract(canon, '^https?://([a-z0-9.]+)', 1) AS domain,
          |  count(*) AS n_raw,
          |  count(DISTINCT url) AS n_distinct_raw,
          |  count(DISTINCT canon) AS n_canonical,
          |  CAST(count(DISTINCT url) - count(DISTINCT canon) AS BIGINT) AS n_collapsed
          |FROM c GROUP BY domain ORDER BY domain""".stripMargin)),

    GraftQuery(
      "q_sample_weighted",
      "Weighted sampling without replacement, Efraimidis–Spirakis A-ES " +
        "(exponential-jumps form): per source stratum keep the 5 docs with " +
        "the smallest key = -ln(u)/w, where w = n_chars and u is a " +
        "DETERMINISTIC uniform built from the first 52 bits of md5(doc_id) " +
        "— the md5-order discipline of q_sample_topk_hash extended to " +
        "WEIGHTED inclusion probability (the data-mixing primitive: sample " +
        "proportional to token mass, reproducible across engines, runs, and " +
        "partitionings; no RNG, so a task retry cannot resample). Scale " +
        "shape: key is map-side arithmetic, selection is one per-stratum " +
        "top-k window — no shuffle beyond the stratum key. The key itself " +
        "stays OUT of the output: both engines' ln() agree to ~1 ulp while " +
        "the fixture's rank-5/6 key margins are ≥ 2e-7, so the SELECTION is " +
        "engine-stable even though the raw doubles might differ in the last " +
        "bit.",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
          .cast("double") / lit(9007199254740992d)) + lit(5.551115123125783e-17)
        val key = -log(u) / col("n_chars").cast("double")
        val w = Window.partitionBy("source").orderBy(col("key"), col("doc_id"))
        table(s, dir, "documents")
          .filter(col("n_chars") > 0)
          .select(col("doc_id"), col("source"), col("n_chars"), key.as("key"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5)
          .select(col("source"), col("rk"), col("doc_id"), col("n_chars"))
          .orderBy("source", "rk")
      },
      Some(
        """WITH k AS (SELECT doc_id, source, n_chars,
          |    -ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13) AS UBIGINT) / 9007199254740992.0)
          |        + 5.551115123125783e-17) / CAST(n_chars AS DOUBLE) AS key
          |  FROM documents WHERE n_chars > 0),
          |r AS (SELECT doc_id, source, n_chars, key,
          |    row_number() OVER (PARTITION BY source ORDER BY key, doc_id) AS rk FROM k)
          |SELECT source, rk, doc_id, n_chars FROM r WHERE rk <= 5
          |ORDER BY source, rk""".stripMargin)),

    GraftQuery(
      "q_text_perplexity",
      "Bigram-LM document scoring with Laplace smoothing — the CCNet-style " +
        "quality filter, and the SEQUENCE model q_text_surprisal's unigram " +
        "bag cannot express: train P(w2|w1) = (B(w1,w2)+1)/(U(w1)+V) on the " +
        "corpus itself, score each doc by mean negative log-likelihood over " +
        "its bigram INSTANCES, surface the 10 least-fluent docs. Scale " +
        "shape: the slim (doc, bigram-hash, prefix-hash) instance relation " +
        "is materialized ONCE (eager checkpoint — the write-once posture; " +
        "text and token strings never shuffle, 8-byte hashes do), then B " +
        "and U are COUNT WINDOWS over the two hash keys (the tfidf window-" +
        "form df discipline: counts flow back to instances without a self-" +
        "join), the vocabulary size is one distinct-count over the same " +
        "checkpoint broadcast as a scalar, and the per-doc mean is the " +
        "final slim agg. Double-sum accumulation sits under round(6) with " +
        "~1e-13 partition-order noise (the surprisal precedent).",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val inst = Tables.spread(s, table(s, dir, "documents"))
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .filter(size(col("toks")) >= 2)
          .select(col("doc_id"), explode(expr(
            "transform(slice(toks, 1, size(toks)-1), " +
              "(x, i) -> struct(x AS w1, element_at(toks, i+2) AS w2))")).as("p"))
          .select(col("doc_id"),
            xxhash64(col("p.w1"), col("p.w2")).as("bgh"),
            xxhash64(col("p.w1")).as("w1h"))
          .localCheckpoint(true)
        val vocab = inst.agg(countDistinct(col("w1h")).as("vocab"))
        inst
          .withColumn("bc", count(lit(1)).over(Window.partitionBy("bgh")))
          .withColumn("uc", count(lit(1)).over(Window.partitionBy("w1h")))
          .crossJoin(broadcast(vocab))
          .groupBy("doc_id")
          .agg(round(
            sum(-log((col("bc") + lit(1L)).cast("double") /
              (col("uc") + col("vocab")).cast("double"))) / count(lit(1)), 6)
            .as("bigram_nll"))
          .orderBy(col("bigram_nll").desc, col("doc_id"))
          .limit(10)
      },
      Some(
        """WITH d AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
          |inst AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
          |    i -> toks[i] || chr(31) || toks[i+1])) AS bg
          |  FROM d WHERE len(toks) >= 2),
          |b AS (SELECT bg, count(*) AS bc FROM inst GROUP BY bg),
          |u AS (SELECT split_part(bg, chr(31), 1) AS w1, CAST(sum(bc) AS BIGINT) AS uc
          |  FROM b GROUP BY 1),
          |v AS (SELECT count(*) AS vocab FROM (SELECT DISTINCT split_part(bg, chr(31), 1) FROM b)),
          |s AS (SELECT i.doc_id,
          |    -ln((b.bc + 1) / CAST(u.uc + v.vocab AS DOUBLE)) AS nll
          |  FROM inst i JOIN b ON i.bg = b.bg
          |  JOIN u ON split_part(i.bg, chr(31), 1) = u.w1 CROSS JOIN v)
          |SELECT doc_id, round(sum(nll) / count(*), 6) AS bigram_nll
          |FROM s GROUP BY doc_id ORDER BY bigram_nll DESC, doc_id LIMIT 10""".stripMargin)),

    GraftQuery(
      "q_clean_winsorize",
      "Winsorized aggregation — outlier clipping at exact DISCRETE " +
        "percentiles (p1/p99 as order statistics, k = ceil(0.01·n), no " +
        "interpolation arithmetic anywhere): thresholds are the max of the " +
        "k smallest / min of the k largest order totals, computed via " +
        "orderBy(...).limit(k) which Spark plans as TakeOrderedAndProject " +
        "— the distributed top-k heap, never a full sort. Clip = " +
        "greatest(least(v, hi), lo) — values COPIED from data, so the " +
        "thresholds and clip are float-exact by construction; the " +
        "winsorized exact money sum and clip counts face the gate. Ties " +
        "at the rank boundary are value-deterministic (equal values ⇒ " +
        "same threshold whichever tie takes rank k). At 100 TB with " +
        "growing k, swap the top-k legs for the q_hist_equidepth 2-pass " +
        "rank — same thresholds, one range exchange.",
      (s, dir) => {
        val o = table(s, dir, "orders").select(col("o_totalprice").as("v"))
        val n = o.count()
        val k = ((n + 99) / 100).toInt
        val loThr = o.orderBy(col("v").asc).limit(k).agg(max(col("v"))).head.getDouble(0)
        val hiThr = o.orderBy(col("v").desc).limit(k).agg(min(col("v"))).head.getDouble(0)
        o.agg(
          lit(loThr).as("lo_thr"),
          lit(hiThr).as("hi_thr"),
          count(when(col("v") < loThr, 1)).as("n_clip_lo"),
          count(when(col("v") > hiThr, 1)).as("n_clip_hi"),
          graft.Exact.moneySum(greatest(least(col("v"), lit(hiThr)), lit(loThr))).as("wsum"),
          count(lit(1)).as("n"))
      },
      Some(
        """WITH k AS (SELECT CAST(ceil(count(*) * 0.01) AS BIGINT) AS k FROM orders),
          |r AS (SELECT o_totalprice AS v,
          |  row_number() OVER (ORDER BY o_totalprice) AS rn_a,
          |  row_number() OVER (ORDER BY o_totalprice DESC) AS rn_d
          | FROM orders),
          |lo AS (SELECT max(v) AS t FROM r, k WHERE rn_a <= k.k),
          |hi AS (SELECT min(v) AS t FROM r, k WHERE rn_d <= k.k)
          |SELECT lo.t AS lo_thr, hi.t AS hi_thr,
          |  count(*) FILTER (o_totalprice < lo.t) AS n_clip_lo,
          |  count(*) FILTER (o_totalprice > hi.t) AS n_clip_hi,
          |  """.stripMargin +
          graft.Exact.moneySumSql("greatest(least(o_totalprice, hi.t), lo.t)") +
          """ AS wsum, count(*) AS n
          |FROM orders, lo, hi GROUP BY lo.t, hi.t""".stripMargin)),

    GraftQuery(
      "q_stats_ks",
      "Two-sample Kolmogorov–Smirnov drift statistic between the English " +
        "and non-English document-length distributions — the distribution-" +
        "shift monitor a training-data pipeline runs between corpus " +
        "snapshots: D = max |F1(v) − F2(v)| over observed lengths, plus " +
        "the length where the gap peaks (earliest on ties). The ECDFs " +
        "never materialize per-document: one hash agg collapses to the " +
        "distinct-VALUE relation (bounded by the length domain, not the " +
        "corpus), running counts come from two windows sharing one sort " +
        "of that tiny relation, and the per-row |F1−F2| is a single IEEE " +
        "division pair of exact BIGINT counts — cross-engine identical. " +
        "The 1-row totals broadcast back; argmax via min(struct) on " +
        "(−gap, value) — no second window, no subquery.",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val d = table(s, dir, "documents")
          .select((col("lang") === "en").as("g1"), col("n_chars"))
        val byVal = d.groupBy("n_chars").agg(
          sum(when(col("g1"), 1L).otherwise(0L)).as("c1"),
          sum(when(!col("g1"), 1L).otherwise(0L)).as("c2"))
        val w = Window.orderBy("n_chars")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = byVal
          .withColumn("f1", sum(col("c1")).over(w))
          .withColumn("f2", sum(col("c2")).over(w))
        val tot = cum.agg(max(col("f1")).as("n1"), max(col("f2")).as("n2"))
        cum.crossJoin(broadcast(tot))
          .select(col("n_chars"),
            abs(col("f1").cast("double") / col("n1").cast("double")
              - col("f2").cast("double") / col("n2").cast("double")).as("gap"),
            col("n1"), col("n2"))
          .agg(
            max(col("n1")).as("n1"),
            max(col("n2")).as("n2"),
            round(max(col("gap")), 6).as("ks_d"),
            min(struct((-col("gap")).as("ng"), col("n_chars").as("v")))
              .getField("v").as("at_len"))
      },
      Some(
        """WITH d AS (SELECT lang = 'en' AS g1, n_chars FROM documents),
          |v AS (SELECT n_chars,
          |    CAST(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
          |    CAST(sum(CASE WHEN NOT g1 THEN 1 ELSE 0 END) AS BIGINT) AS c2
          |  FROM d GROUP BY n_chars),
          |c AS (SELECT n_chars,
          |    sum(c1) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS f1,
          |    sum(c2) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS f2
          |  FROM v),
          |t AS (SELECT max(f1) AS n1, max(f2) AS n2 FROM c),
          |g AS (SELECT n_chars,
          |    abs(CAST(f1 AS DOUBLE) / CAST(t.n1 AS DOUBLE)
          |      - CAST(f2 AS DOUBLE) / CAST(t.n2 AS DOUBLE)) AS gap,
          |    t.n1 AS n1, t.n2 AS n2
          |  FROM c, t)
          |SELECT CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2,
          |  round(max(gap), 6) AS ks_d,
          |  CAST((min({'ng': -gap, 'v': n_chars})).v AS BIGINT) AS at_len
          |FROM g""".stripMargin)),

    GraftQuery(
      "q_sample_mixture",
      "Temperature-flattened mixture sampling across sources — the data-" +
        "mixing step that UP-weights small domains: each source's target " +
        "is ceil(sqrt(n_s)) (α = 0.5 temperature; sqrt is IEEE-correctly-" +
        "rounded on BOTH engines, unlike pow, so the ceil boundary can " +
        "never diverge), and the selected docs are the md5-order first " +
        "target_s of each stratum — the q_sample_topk_hash determinism " +
        "discipline under a per-stratum DERIVED quota instead of a " +
        "constant. One window pass computes the stratum size and the hash " +
        "rank together (count over the partition + row_number share the " +
        "sort), so there is no separate counts join; output is the per-" +
        "source funnel (corpus size, target, sampled chars).",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val byHash = Window.partitionBy("source")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        val whole = Window.partitionBy("source")
        table(s, dir, "documents")
          .select(col("source"), col("doc_id"), col("n_chars"))
          .withColumn("rn", row_number().over(byHash))
          .withColumn("n_total", count(lit(1)).over(whole))
          .withColumn("target", ceil(sqrt(col("n_total").cast("double"))).cast("long"))
          .filter(col("rn") <= col("target"))
          .groupBy("source")
          .agg(
            max(col("n_total")).as("n_total"),
            max(col("target")).as("target"),
            count(lit(1)).as("n_sampled"),
            sum(col("n_chars")).as("sampled_chars"))
          .orderBy("source")
      },
      Some(
        """WITH r AS (
          |  SELECT source, doc_id, n_chars,
          |    row_number() OVER (PARTITION BY source
          |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
          |    count(*) OVER (PARTITION BY source) AS n_total,
          |    CAST(ceil(sqrt(count(*) OVER (PARTITION BY source))) AS BIGINT) AS target
          |  FROM documents)
          |SELECT source, CAST(max(n_total) AS BIGINT) AS n_total,
          |  max(target) AS target, count(*) AS n_sampled,
          |  CAST(sum(n_chars) AS BIGINT) AS sampled_chars
          |FROM r WHERE rn <= target
          |GROUP BY source ORDER BY source""".stripMargin)),

    GraftQuery(
      "q_export_shards",
      "Token-balanced shard assignment for training-data export: docs " +
        "ranked by (tokens DESC, doc_id) deal round-robin into 8 shards — " +
        "longest-first dealing bounds any shard's token mass within one " +
        "max-doc of the mean, deterministically (no greedy bin state). " +
        "The global rank does NOT use a global window: token-count BANDS " +
        "(n_tok div 64) are the chunk relation — per-band offsets come " +
        "from one window over the tiny band relation (the two-pass " +
        "q_win_global_rank_2pass / pack_sequences discipline), and the " +
        "within-band row_number partitions by band. No stage sees the " +
        "corpus in one task; the oracle computes the same rank with the " +
        "naive single global window, so the gate proves the decomposition.",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // shared band exchange (ReuseExchange): the within-band rank comes
        // FIRST and the offsets branch reads one row per band THROUGH the
        // same window subtree (rk_loc = 1 carries the band's count from a
        // whole-band count window) — an aggregate of the pre-window
        // relation would prune doc_id out of its exchange copy and break
        // the sharing; <=> keeps the join from inferring IsNotNull into
        // one branch. Tokenize once, both passes read one materialization.
        val toks = tokCounts(s, dir).withColumn("band", expr("n_tok div 64"))
          .repartition(col("band"))
        val wLo = Window.partitionBy("band")
          .orderBy(col("n_tok").desc, col("doc_id"))
        val win = toks
          .withColumn("rk_loc", row_number().over(wLo))
          .withColumn("bn", count(lit(1)).over(Window.partitionBy("band")))
        // pass 1: offsets = rows in HIGHER bands
        val offsets = win.filter(col("rk_loc") === 1)
          .select(col("band").as("band2"), col("bn").as("bn2"))
          .withColumn("off",
            coalesce(sum(col("bn2")).over(
              Window.orderBy(col("band2").desc)
                .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("band2"), col("off"))
        // pass 2: within-band rank, shifted by the band offset
        val ranked = win
          .join(broadcast(offsets), col("band") <=> col("band2"))
          .withColumn("rk", col("off") + col("rk_loc"))
        ranked
          .withColumn("shard", (col("rk") - 1) % 8)
          .groupBy("shard")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tok")).as("tok_sum"),
            max(col("n_tok")).as("max_tok"))
          .orderBy("shard")
      },
      Some(
        """WITH t AS (
          |  SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok
          |  FROM documents),
          |r AS (SELECT n_tok,
          |  row_number() OVER (ORDER BY n_tok DESC, doc_id) AS rk FROM t)
          |SELECT (rk - 1) % 8 AS shard, count(*) AS n_docs,
          |  CAST(sum(n_tok) AS BIGINT) AS tok_sum, max(n_tok) AS max_tok
          |FROM r GROUP BY 1 ORDER BY 1""".stripMargin)),

    GraftQuery(
      "q_stats_chi2",
      "Chi-square independence test of event type × day-of-week, with " +
        "Cramér's V — the CATEGORICAL-drift monitor completing the panel " +
        "(q_stats_ks: numeric lengths, q_text_js_divergence: content): " +
        "does traffic composition depend on weekday? The corpus " +
        "collapses to the R×C observed-cell relation in one hash agg; " +
        "margins come from two keyed aggs of that 35-row relation (never " +
        "the corpus), and the ZERO cells the contingency algebra needs " +
        "are restored by the margins' cross join — a missing cell still " +
        "contributes o=0 against e=rt·ct/N. Day-of-week is arithmetic on " +
        "epoch days ((d+3) mod 7 — the q_ts_calendar device, immune to " +
        "engine dayofweek numbering/locale); expected counts and " +
        "(o−e)²/e run the SAME double tree on both engines over exact " +
        "BIGINT margins; the cell contributions accumulate in ONE " +
        "ordered window over the grid (the zipf float-determinism " +
        "device). dof and V read off the same margin counts.",
      (s, dir) => {
        import org.apache.spark.sql.{Column}
        import org.apache.spark.sql.types.{DoubleType, LongType}
        val cells = table(s, dir, "events")
          .select(col("event_type"),
            pmod(graft.Ts.dayBucket(col("ts"))
              + lit(3L), lit(7L)).as("dow"))
          .groupBy("event_type", "dow").agg(count(lit(1)).as("o"))
        val rm = cells.groupBy("event_type").agg(sum(col("o")).as("rt"))
        val cm = cells.groupBy("dow").agg(sum(col("o")).as("ct"))
        val tot = rm.agg(sum(col("rt")).as("n"), count(lit(1)).as("nr"))
          .crossJoin(broadcast(cm.agg(count(lit(1)).as("nc"))))
        def D(c: Column) = c.cast(DoubleType)
        val e = D(col("rt")) * D(col("ct")) / D(col("n"))
        val contrib = (D(col("o")) - e) * (D(col("o")) - e) / e
        val ord = Window.orderBy("event_type", "dow")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        rm.crossJoin(broadcast(cm))
          .join(cells, Seq("event_type", "dow"), "left")
          .withColumn("o", coalesce(col("o"), lit(0L)))
          .crossJoin(broadcast(tot))
          .withColumn("chi_cum", sum(contrib).over(ord))
          .withColumn("rk",
            row_number().over(Window.orderBy("event_type", "dow")).cast(LongType))
          .filter(col("rk") === col("nr") * col("nc"))
          .select(col("n"),
            ((col("nr") - 1) * (col("nc") - 1)).as("dof"),
            round(col("chi_cum"), 6).as("chi2"),
            round(sqrt(col("chi_cum") /
              (D(col("n")) * D(least(col("nr"), col("nc")) - lit(1L)))), 6)
              .as("cramers_v"))
      },
      Some(
        """WITH ev AS (SELECT event_type,
          |    (((CAST(floor(epoch(ts) / 86400) AS BIGINT) + 3) % 7) + 7) % 7 AS dow
          |  FROM events),
          |cells AS (SELECT event_type, dow, count(*) AS o FROM ev GROUP BY 1, 2),
          |rm AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt
          |  FROM cells GROUP BY 1),
          |cm AS (SELECT dow, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
          |t AS (SELECT (SELECT CAST(sum(rt) AS BIGINT) FROM rm) AS n,
          |    (SELECT count(*) FROM rm) AS nr, (SELECT count(*) FROM cm) AS nc),
          |g AS (SELECT rm.event_type, cm.dow, rm.rt, cm.ct,
          |    COALESCE(cells.o, 0) AS o
          |  FROM rm CROSS JOIN cm LEFT JOIN cells
          |    ON cells.event_type = rm.event_type AND cells.dow = cm.dow),
          |k AS (SELECT t.n, t.nr, t.nc,
          |    sum((CAST(o AS DOUBLE)
          |          - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(t.n AS DOUBLE))
          |        * (CAST(o AS DOUBLE)
          |          - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(t.n AS DOUBLE))
          |        / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(t.n AS DOUBLE)))
          |      OVER (ORDER BY event_type, dow ROWS UNBOUNDED PRECEDING) AS chi_cum,
          |    row_number() OVER (ORDER BY event_type, dow) AS rk
          |  FROM g, t)
          |SELECT n, (nr - 1) * (nc - 1) AS dof, round(chi_cum, 6) AS chi2,
          |  round(sqrt(chi_cum
          |    / (CAST(n AS DOUBLE) * CAST(least(nr, nc) - 1 AS DOUBLE))), 6)
          |    AS cramers_v
          |FROM k WHERE rk = nr * nc""".stripMargin)),

    GraftQuery(
      "q_stats_ttest",
      "Welch's two-sample t-test between English and non-English " +
        "document lengths (unequal variances — the honest default), " +
        "with the Welch–Satterthwaite degrees of freedom: the " +
        "significance companion to q_stats_ks's distribution distance. " +
        "ONE conditional-sum hash agg collapses the corpus to six exact " +
        "BIGINT sufficient statistics (n, Σx, Σx² per group — " +
        "associative, partition-order-free, bounded by 2^63 to ~1e9 " +
        "docs at 1e5 chars); every downstream value (means, sample " +
        "variances, t, df) is closed-form double arithmetic on the " +
        "SAME expression tree both engines, sqrt-only (correctly " +
        "rounded). No window, no join, nothing after the 1-row agg.",
      (s, dir) => {
        import org.apache.spark.sql.types.DoubleType
        val en = col("lang") === "en"
        def D(c: String) = col(c).cast(DoubleType)
        // class-22 guards at every division that can hit zero on real data:
        // an EMPTY group (n=0 — a corpus with no/only 'en' docs), a
        // single-row group (n−1=0), constant groups (pooled variance 0,
        // plus the sqrt of a −ε-rounded variance, which DuckDB raises on).
        // Undefined statistics are NULL on both engines.
        import graft.Exact.{divNZ, sqrtNN}
        val m1 = divNZ(D("sx1"), D("n1")); val m2 = divNZ(D("sx2"), D("n2"))
        val v1 = divNZ(D("sxx1") - D("sx1") * m1, D("n1") - lit(1d))
        val v2 = divNZ(D("sxx2") - D("sx2") * m2, D("n2") - lit(1d))
        val q1 = v1 / D("n1"); val q2 = v2 / D("n2")
        table(s, dir, "documents")
          .agg(
            sum(when(en, 1L).otherwise(0L)).as("n1"),
            sum(when(en, col("n_chars")).otherwise(0L)).as("sx1"),
            sum(when(en, col("n_chars") * col("n_chars")).otherwise(0L)).as("sxx1"),
            sum(when(!en, 1L).otherwise(0L)).as("n2"),
            sum(when(!en, col("n_chars")).otherwise(0L)).as("sx2"),
            sum(when(!en, col("n_chars") * col("n_chars")).otherwise(0L)).as("sxx2"))
          .select(col("n1"), col("n2"),
            round(m1 - m2, 6).as("mean_diff"),
            round(divNZ(m1 - m2, sqrtNN(q1 + q2)), 6).as("t_stat"),
            round(divNZ((q1 + q2) * (q1 + q2),
              divNZ(q1 * q1, D("n1") - lit(1d)) +
                divNZ(q2 * q2, D("n2") - lit(1d))), 4)
              .as("welch_df"))
      },
      Some(
        s"""WITH a AS (SELECT
          |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
          |    CAST(sum(CASE WHEN lang = 'en' THEN n_chars ELSE 0 END)
          |      AS BIGINT) AS sx1,
          |    CAST(sum(CASE WHEN lang = 'en' THEN n_chars * n_chars ELSE 0 END)
          |      AS BIGINT) AS sxx1,
          |    CAST(sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
          |    CAST(sum(CASE WHEN lang <> 'en' THEN n_chars ELSE 0 END)
          |      AS BIGINT) AS sx2,
          |    CAST(sum(CASE WHEN lang <> 'en' THEN n_chars * n_chars ELSE 0 END)
          |      AS BIGINT) AS sxx2
          |  FROM documents),
          |m AS (SELECT n1, n2, sx1, sxx1, sx2, sxx2,
          |    ${graft.Exact.divNZSql("CAST(sx1 AS DOUBLE)", "CAST(n1 AS DOUBLE)")} AS m1,
          |    ${graft.Exact.divNZSql("CAST(sx2 AS DOUBLE)", "CAST(n2 AS DOUBLE)")} AS m2
          |  FROM a),
          |v AS (SELECT n1, n2, m1, m2,
          |    ${graft.Exact.divNZSql("CAST(sxx1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * m1",
               "CAST(n1 AS DOUBLE) - 1.0")} AS v1,
          |    ${graft.Exact.divNZSql("CAST(sxx2 AS DOUBLE) - CAST(sx2 AS DOUBLE) * m2",
               "CAST(n2 AS DOUBLE) - 1.0")} AS v2
          |  FROM m),
          |q AS (SELECT n1, n2, m1, m2,
          |    v1 / CAST(n1 AS DOUBLE) AS q1, v2 / CAST(n2 AS DOUBLE) AS q2
          |  FROM v)
          |SELECT n1, n2, round(m1 - m2, 6) AS mean_diff,
          |  round(${graft.Exact.divNZSql("m1 - m2",
             graft.Exact.sqrtNNSql("q1 + q2"))}, 6) AS t_stat,
          |  round(${graft.Exact.divNZSql("(q1 + q2) * (q1 + q2)",
             graft.Exact.divNZSql("q1 * q1", "CAST(n1 AS DOUBLE) - 1.0") + " + " +
               graft.Exact.divNZSql("q2 * q2", "CAST(n2 AS DOUBLE) - 1.0"))}, 4) AS welch_df
          |FROM q""".stripMargin)),

    GraftQuery(
      "q_stats_abtest",
      "Two-proportion z-test on a deterministic hash experiment: users " +
        "split into arms by the q_split_assign id-hash device (md5 " +
        "prefix mod 2 — same user, same arm, on any engine at any " +
        "partitioning), conversion = the user ever purchased, and the " +
        "pooled z-statistic scores the (null-true, so z ≈ 0) rate gap — " +
        "conversion = any purchase ≥ 150 (≈ the median-converting user, " +
        "so both arms sit far from the 0/1 rate poles where se " +
        "degenerates) — " +
        "the experimentation readout primitive. One keyed agg collapses " +
        "events to user grain (conversion is max-of-flag, associative), " +
        "one 1-row agg produces four exact BIGINT counts, and the " +
        "pooled-variance closed form is the SAME double tree on both " +
        "engines, sqrt-only. Nothing after user grain scales with the " +
        "corpus.",
      (s, dir) => {
        import org.apache.spark.sql.types.DoubleType
        def D(c: String) = col(c).cast(DoubleType)
        // class-22 guards: an empty arm (n=0 — every user hashing to one
        // arm) and an all-or-none pooled outcome (pp ∈ {0,1} → zero
        // standard error) make z undefined → NULL on both engines
        val p1 = graft.Exact.divNZ(D("c1"), D("n1"))
        val p2 = graft.Exact.divNZ(D("c2"), D("n2"))
        val pp = graft.Exact.divNZ(D("c1") + D("c2"), D("n1") + D("n2"))
        val se = sqrt(pp * (lit(1d) - pp) * (lit(1d) / D("n1") + lit(1d) / D("n2")))
        table(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(max(when(col("event_type") === "purchase"
              && col("value") >= 150d, 1L).otherwise(0L)).as("conv"))
          .withColumn("arm",
            pmod(conv(substring(md5(col("user_id").cast("string")), 1, 4), 16, 10)
              .cast("int"), lit(2)))
          .agg(
            sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n1"),
            sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("c1"),
            sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n2"),
            sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("c2"))
          .select(col("n1"), col("c1"), col("n2"), col("c2"),
            round(p1 - p2, 6).as("rate_diff"),
            round(graft.Exact.divNZ(p1 - p2, se), 6).as("z_stat"))
      },
      Some(
        s"""WITH u AS (SELECT user_id,
          |    max(CASE WHEN event_type = 'purchase' AND value >= 150
          |      THEN 1 ELSE 0 END) AS conv
          |  FROM events GROUP BY user_id),
          |a AS (SELECT
          |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4)
          |      AS INTEGER) % 2 AS arm, conv
          |  FROM u),
          |c AS (SELECT
          |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
          |    CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS c1,
          |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
          |    CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS c2
          |  FROM a),
          |d AS (SELECT n1, c1, n2, c2,
          |    ${graft.Exact.divNZSql("CAST(c1 AS DOUBLE)", "CAST(n1 AS DOUBLE)")} AS p1,
          |    ${graft.Exact.divNZSql("CAST(c2 AS DOUBLE)", "CAST(n2 AS DOUBLE)")} AS p2,
          |    ${graft.Exact.divNZSql("CAST(c1 AS DOUBLE) + CAST(c2 AS DOUBLE)",
               "CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)")} AS pp
          |  FROM c)
          |SELECT n1, c1, n2, c2, round(p1 - p2, 6) AS rate_diff,
          |  round(${graft.Exact.divNZSql("p1 - p2", "sqrt(pp * (1.0 - pp)" +
             " * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE)))")}, 6)
          |    AS z_stat
          |FROM d""".stripMargin)),

    GraftQuery(
      "q_stats_benford",
      "Benford first-digit audit of order values — the fraud/synthetic-" +
        "data smell test a pipeline runs on money and count columns: " +
        "observed share of each leading cent digit vs the Benford " +
        "expectation log10(1+1/d), with the signed deviation. The first " +
        "digit comes from the decimal STRING of exact integer cents " +
        "(both engines print a BIGINT identically — no float log10/" +
        "power-of-ten arithmetic anywhere near the bucketing); counts " +
        "are one 9-bucket hash agg, the 1-row total broadcasts back, " +
        "and share/expectation are single IEEE divisions and one ln " +
        "pair per digit on identical operands — no float accumulation " +
        "at all, so no ordering device is even needed.",
      (s, dir) => {
        import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
        val cents = floor(col("o_totalprice") * 100 + 0.5).cast(LongType)
        val dd = col("digit").cast(DoubleType)
        val d = table(s, dir, "orders")
          .select(substring(cents.cast(StringType), 1, 1).cast(LongType).as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("n"))
        val t = d.agg(sum(col("n")).as("tot"))
        d.crossJoin(broadcast(t))
          .select(col("digit"), col("n"),
            round(col("n").cast(DoubleType) / col("tot").cast(DoubleType), 6)
              .as("share"),
            round(log((dd + lit(1d)) / dd) / log(lit(10d)), 6).as("benford"),
            round(col("n").cast(DoubleType) / col("tot").cast(DoubleType)
              - log((dd + lit(1d)) / dd) / log(lit(10d)), 6).as("dev"))
          .orderBy("digit")
      },
      Some(
        """WITH s AS (SELECT CAST(substr(CAST(
          |      CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR),
          |      1, 1) AS BIGINT) AS digit FROM orders),
          |d AS (SELECT digit, count(*) AS n FROM s GROUP BY 1),
          |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM d)
          |SELECT digit, n,
          |  round(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share,
          |  round(ln((CAST(digit AS DOUBLE) + 1.0) / CAST(digit AS DOUBLE))
          |    / ln(10.0), 6) AS benford,
          |  round(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)
          |    - ln((CAST(digit AS DOUBLE) + 1.0) / CAST(digit AS DOUBLE))
          |    / ln(10.0), 6) AS dev
          |FROM d, t ORDER BY digit""".stripMargin)),

    GraftQuery(
      "q_stats_mannwhitney",
      "Mann–Whitney U (rank-sum) test between English and non-English " +
        "document lengths — the nonparametric companion to " +
        "q_stats_ttest that survives the heavy-tailed length " +
        "distributions real corpora have. Ranking never touches the " +
        "document grain: lengths collapse to the VALUE-grain relation " +
        "(distinct n_chars, bounded vocabulary however large the " +
        "corpus), average tie ranks are computed in exact HALF-RANK " +
        "integers (2·avgrank = 2·cum_before + t + 1 — no /2 float " +
        "anywhere), and the doubled rank-sum, tie-correction term " +
        "Σ(t³−t), and 2·U1 are all exact BIGINT. The one ordered " +
        "window runs over the value-grain relation only (the zipf " +
        "device); z with tie correction is closed-form doubles on the " +
        "SAME tree both engines, sqrt-only.",
      (s, dir) => {
        import org.apache.spark.sql.types.DoubleType
        def D(c: String) = col(c).cast(DoubleType)
        val byv = table(s, dir, "documents")
          .groupBy(col("n_chars").as("v"))
          .agg(count(lit(1)).as("t"),
            sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n1v"))
        val cumw = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
        val ranked = byv
          .withColumn("cum", coalesce(sum(col("t")).over(cumw), lit(0L)))
          .withColumn("rank2", lit(2L) * col("cum") + col("t") + lit(1L))
        val a = ranked.agg(
          sum(col("n1v")).as("n1"), sum(col("t")).as("n"),
          sum(col("n1v") * col("rank2")).as("r1x2"),
          sum(col("t") * col("t") * col("t") - col("t")).as("ties"))
        val u1x2 = col("r1x2") - col("n1") * (col("n1") + lit(1L))
        val n2 = col("n") - col("n1")
        val sig2 = D("n1") * n2.cast(DoubleType) / lit(12d) *
          ((D("n") + lit(1d)) -
            D("ties") / (D("n") * (D("n") - lit(1d))))
        a.select(col("n1"), n2.as("n2"),
            u1x2.as("u1_x2"),
            round((u1x2.cast(DoubleType) - D("n1") * n2.cast(DoubleType)) /
              (lit(2d) * sqrt(sig2)), 6).as("z"))
      },
      Some(
        """WITH byv AS (SELECT n_chars AS v, count(*) AS t,
          |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
          |      AS n1v
          |  FROM documents GROUP BY 1),
          |r AS (SELECT v, t, n1v,
          |    COALESCE(CAST(sum(t) OVER (ORDER BY v
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
          |      0) AS cum
          |  FROM byv),
          |a AS (SELECT CAST(sum(n1v) AS BIGINT) AS n1,
          |    CAST(sum(t) AS BIGINT) AS n,
          |    CAST(sum(n1v * (2 * cum + t + 1)) AS BIGINT) AS r1x2,
          |    CAST(sum(t * t * t - t) AS BIGINT) AS ties
          |  FROM r),
          |k AS (SELECT n1, n - n1 AS n2, n, ties,
          |    r1x2 - n1 * (n1 + 1) AS u1_x2
          |  FROM a)
          |SELECT n1, n2, u1_x2,
          |  round((CAST(u1_x2 AS DOUBLE)
          |      - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
          |    / (2.0 * sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
          |      * ((CAST(n AS DOUBLE) + 1.0)
          |        - CAST(ties AS DOUBLE)
          |          / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))))),
          |    6) AS z
          |FROM k""".stripMargin)),

    GraftQuery(
      "q_stats_mutual_info",
      "Mutual information between event type and day-of-week — the " +
        "information-theoretic strength reading next to q_stats_chi2's " +
        "significance test, on the same R×C cell machinery. Only " +
        "OBSERVED cells enter (zero cells contribute 0 to MI, so no " +
        "margin cross-join is needed, unlike chi-square); margins come " +
        "from three frame-free windows over the ≤R·C cell relation, and " +
        "the per-cell float terms accumulate in ONE ordered window " +
        "(the zipf device: deterministic left-to-right sum, identical " +
        "on both engines) with the last row carrying the total. " +
        "Day-of-week is the (epoch_day + 3) mod 7 calendar device. " +
        "Corpus touches only the first count; everything after is " +
        "cell-grain.",
      (s, dir) => {
        import org.apache.spark.sql.types.{DoubleType, LongType}
        def D(c: String) = col(c).cast(DoubleType)
        val cells = table(s, dir, "events")
          .groupBy(col("event_type"),
            pmod(graft.Ts.dayBucket(col("ts")) + lit(3L), lit(7L)).as("dow"))
          .agg(count(lit(1)).as("o"))
        val term = D("o") / D("n") *
          log(D("o") * D("n") / (D("rt") * D("ct")))
        val ord = Window.orderBy("event_type", "dow")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val whole = Window.partitionBy(lit(1))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        cells
          .withColumn("rt", sum(col("o")).over(Window.partitionBy("event_type")))
          .withColumn("ct", sum(col("o")).over(Window.partitionBy("dow")))
          .withColumn("n", sum(col("o")).over(whole))
          .withColumn("nc", count(lit(1)).over(whole))
          .withColumn("mi_cum", sum(term).over(ord))
          .withColumn("rk", row_number().over(Window.orderBy("event_type", "dow"))
            .cast(LongType))
          .filter(col("rk") === col("nc"))
          .select(col("n"), col("nc").as("n_cells"),
            round(col("mi_cum"), 6).as("mi_nats"),
            round(col("mi_cum") / log(lit(2d)), 6).as("mi_bits"))
      },
      Some(
        """WITH ev AS (SELECT event_type,
          |    (((CAST(floor(epoch(ts) / 86400) AS BIGINT) + 3) % 7) + 7) % 7 AS dow
          |  FROM events),
          |cells AS (SELECT event_type, dow, count(*) AS o FROM ev GROUP BY 1, 2),
          |m AS (SELECT event_type, dow, o,
          |    CAST(sum(o) OVER (PARTITION BY event_type) AS BIGINT) AS rt,
          |    CAST(sum(o) OVER (PARTITION BY dow) AS BIGINT) AS ct,
          |    CAST(sum(o) OVER () AS BIGINT) AS n,
          |    CAST(count(*) OVER () AS BIGINT) AS nc
          |  FROM cells),
          |k AS (SELECT n, nc,
          |    sum(CAST(o AS DOUBLE) / CAST(n AS DOUBLE)
          |        * ln(CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
          |          / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))))
          |      OVER (ORDER BY event_type, dow ROWS UNBOUNDED PRECEDING)
          |      AS mi_cum,
          |    row_number() OVER (ORDER BY event_type, dow) AS rk
          |  FROM m)
          |SELECT n, nc AS n_cells, round(mi_cum, 6) AS mi_nats,
          |  round(mi_cum / ln(2.0), 6) AS mi_bits
          |FROM k WHERE rk = nc""".stripMargin)),

    GraftQuery(
      "q_stats_runs",
      "Wald–Wolfowitz runs test per event type: is the above/below-mean " +
        "sign sequence of the money stream random, or does it cluster " +
        "(trending / regime-switching values)? The threshold is the " +
        "type's EXACT mean spelled integer: row i is above iff " +
        "n·cents_i > Σcents — no float mean, no tie ambiguity (exact " +
        "equals are excluded, the standard treatment). Runs are counted " +
        "by one lag() over the (ts, event_id)-ordered keyed window; n1, " +
        "n2, R are exact BIGINT, and the normal-approximation z is the " +
        "closed form on the same double tree both engines. Scale shape: " +
        "the per-type totals broadcast back (tiny dim), each type's " +
        "sequence sorts within its own partition — segment by day like " +
        "q_ts_cusum when a single key's timeline outgrows a task.",
      (s, dir) => {
        import org.apache.spark.sql.types.{DoubleType, LongType}
        def D(c: String) = col(c).cast(DoubleType)
        val e = table(s, dir, "events")
          .select(col("event_type"), col("ts"), col("event_id"),
            floor(col("value") * 100 + 0.5).cast(LongType).as("cents"))
        val tot = e.groupBy("event_type")
          .agg(sum(col("cents")).as("tc"), count(lit(1)).as("nall"))
        val w = Window.partitionBy("event_type").orderBy("ts", "event_id")
        val signed = e.join(broadcast(tot), "event_type")
          .filter(col("nall") * col("cents") =!= col("tc"))
          .withColumn("above",
            when(col("nall") * col("cents") > col("tc"), 1L).otherwise(0L))
          .withColumn("chg",
            when(lag(col("above"), 1).over(w).isNull ||
              lag(col("above"), 1).over(w) =!= col("above"), 1L).otherwise(0L))
        val twoN1N2 = lit(2d) * D("n1") * D("n2")
        val nD = D("n1") + D("n2")
        val mu = twoN1N2 / nD + lit(1d)
        // class-22 guards: a SINGLE-CLASS sequence (n1=0 or n2=0 — every
        // off-mean value on one side) zeroes the variance, and a 1-element
        // sequence zeroes its denominator — z undefined, NULL both engines
        val sig2 = graft.Exact.divNZ(twoN1N2 * (twoN1N2 - nD),
          nD * nD * (nD - lit(1d)))
        signed.groupBy("event_type")
          .agg(sum(col("above")).as("n1"),
            sum(lit(1L) - col("above")).as("n2"),
            sum(col("chg")).as("runs"))
          .select(col("event_type"), col("n1"), col("n2"), col("runs"),
            round(graft.Exact.divNZ(D("runs") - mu, sqrt(sig2)), 6).as("z"))
          .orderBy("event_type")
      },
      Some(
        s"""WITH e AS (SELECT event_type, ts, event_id,
          |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          |  FROM events),
          |t AS (SELECT event_type, CAST(sum(cents) AS BIGINT) AS tc,
          |    count(*) AS nall
          |  FROM e GROUP BY 1),
          |s AS (SELECT e.event_type, e.ts, e.event_id,
          |    CASE WHEN t.nall * e.cents > t.tc THEN 1 ELSE 0 END AS above
          |  FROM e JOIN t ON e.event_type = t.event_type
          |  WHERE t.nall * e.cents <> t.tc),
          |c AS (SELECT event_type, above,
          |    CASE WHEN lag(above) OVER (PARTITION BY event_type
          |        ORDER BY ts, event_id) IS DISTINCT FROM above
          |      THEN 1 ELSE 0 END AS chg
          |  FROM s),
          |a AS (SELECT event_type,
          |    CAST(sum(above) AS BIGINT) AS n1,
          |    CAST(sum(1 - above) AS BIGINT) AS n2,
          |    CAST(sum(chg) AS BIGINT) AS runs
          |  FROM c GROUP BY 1),
          |d AS (SELECT event_type, n1, n2, runs,
          |    CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,
          |    CAST(runs AS DOUBLE) AS rd
          |  FROM a)
          |SELECT event_type, n1, n2, runs,
          |  round(${graft.Exact.divNZSql(
             "rd - (2.0 * n1d * n2d / (n1d + n2d) + 1.0)",
             "sqrt(" + graft.Exact.divNZSql(
               "2.0 * n1d * n2d * (2.0 * n1d * n2d - (n1d + n2d))",
               "(n1d + n2d) * (n1d + n2d) * ((n1d + n2d) - 1.0)") + ")")}, 6) AS z
          |FROM d ORDER BY event_type""".stripMargin)),

    GraftQuery(
      "q_stats_simpson",
      "Simpson diversity index of the language mix per source — the " +
        "collision-probability diversity measure next to q_text_entropy's " +
        "Shannon form: D = 1 − Σnᵢ(nᵢ−1)/(N(N−1)) is the chance two " +
        "random documents differ in language, and UNLIKE entropy it is a " +
        "pure RATIONAL of exact integers — the only float op is the one " +
        "final division, so no ordering device is needed at all (the " +
        "entropy form needs the ordered-window sum for its ln terms). " +
        "Also reports effective language count 1/(1−D) = N(N−1)/Σnᵢ(nᵢ−1). " +
        "One cell-grain agg over (source, lang); the corpus is touched by " +
        "one count.",
      (s, dir) => {
        import org.apache.spark.sql.types.DoubleType
        def D(c: String) = col(c).cast(DoubleType)
        table(s, dir, "documents")
          .groupBy("source", "lang")
          .agg(count(lit(1)).as("ni"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_langs"), sum(col("ni")).as("n"),
            sum(col("ni") * (col("ni") - 1)).as("coll"))
          .select(col("source"), col("n_langs"), col("n"),
            round(lit(1d) - D("coll") / (D("n") * (D("n") - lit(1d))), 6)
              .as("simpson"),
            round(D("n") * (D("n") - lit(1d)) / D("coll"), 6).as("eff_langs"))
          .orderBy("source")
      },
      Some(
        """WITH c AS (SELECT source, lang, count(*) AS ni
          |  FROM documents GROUP BY 1, 2),
          |a AS (SELECT source, count(*) AS n_langs,
          |    CAST(sum(ni) AS BIGINT) AS n,
          |    CAST(sum(ni * (ni - 1)) AS BIGINT) AS coll
          |  FROM c GROUP BY 1)
          |SELECT source, n_langs, n,
          |  round(1.0 - CAST(coll AS DOUBLE)
          |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 6)
          |    AS simpson,
          |  round(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
          |    / CAST(coll AS DOUBLE), 6) AS eff_langs
          |FROM a ORDER BY source""".stripMargin)),

    GraftQuery(
      "q_stats_anova",
      "One-way ANOVA of daily event counts across day-of-week groups per " +
        "type — the F-test that quantifies weekly seasonality (and the " +
        "missing classical test next to t/chi²/U/runs): eta² = SSB/SST " +
        "is the seasonality-strength reading, F = (SSB/(k−1)) / " +
        "(SSW/(n−k)) the significance. Sufficient statistics (c, Σx, " +
        "Σx² per dow cell; totals per type) are exact BIGINT from the " +
        "day-grain relation; the one float SUM — Σ_d sx_d²/c_d over the " +
        "≤7 cells — runs in the dow-ordered window (the zipf device), " +
        "so both engines fold identically. Everything after the first " +
        "count is cell-grain.",
      (s, dir) => {
        import org.apache.spark.sql.types.{DoubleType, LongType}
        import org.apache.spark.sql.expressions.Window
        def D(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
        val daily = table(s, dir, "events")
          .groupBy(col("event_type"),
            graft.Ts.dayBucket(col("ts"))
              .as("day"))
          .agg(count(lit(1)).as("x"))
          .withColumn("dow", pmod(col("day") + lit(3L), lit(7L)))
        val cells = daily.groupBy("event_type", "dow")
          .agg(count(lit(1)).as("c"), sum(col("x")).as("sx"),
            sum(col("x") * col("x")).as("sxx"))
        val wt = Window.partitionBy("event_type")
        val ordw = Window.partitionBy("event_type").orderBy("dow")
        val ssb = col("bcum") - D(col("s")) * D(col("s")) / D(col("n"))
        val sst = D(col("sxx_t")) - D(col("s")) * D(col("s")) / D(col("n"))
        cells
          .withColumn("n", sum(col("c")).over(wt))
          .withColumn("s", sum(col("sx")).over(wt))
          .withColumn("sxx_t", sum(col("sxx")).over(wt))
          .withColumn("k", count(lit(1)).over(wt))
          .withColumn("bcum", sum(D(col("sx")) * D(col("sx")) / D(col("c")))
            .over(ordw.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("rk", row_number().over(ordw).cast(LongType))
          .filter(col("rk") === col("k"))
          .select(col("event_type"), col("n").as("n_days"), col("k"),
            round(ssb / sst, 6).as("eta2"),
            round((ssb / D(col("k") - lit(1L))) /
              ((sst - ssb) / D(col("n") - col("k"))), 6).as("f_stat"))
          .orderBy("event_type")
      },
      Some(
        """WITH d AS (SELECT event_type,
          |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day, count(*) AS x
          |  FROM events GROUP BY 1, 2),
          |g AS (SELECT event_type, (((day + 3) % 7) + 7) % 7 AS dow, x FROM d),
          |cells AS (SELECT event_type, dow, count(*) AS c,
          |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx
          |  FROM g GROUP BY 1, 2),
          |w AS (SELECT event_type, dow, c, sx, sxx,
          |    CAST(sum(c) OVER p AS BIGINT) AS n,
          |    CAST(sum(sx) OVER p AS BIGINT) AS s,
          |    CAST(sum(sxx) OVER p AS BIGINT) AS sxx_t,
          |    CAST(count(*) OVER p AS BIGINT) AS k,
          |    sum(CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(c AS DOUBLE))
          |      OVER (PARTITION BY event_type ORDER BY dow
          |        ROWS UNBOUNDED PRECEDING) AS bcum,
          |    row_number() OVER (PARTITION BY event_type ORDER BY dow) AS rk
          |  FROM cells WINDOW p AS (PARTITION BY event_type)),
          |f AS (SELECT event_type, n, k,
          |    bcum - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
          |      AS ssb,
          |    CAST(sxx_t AS DOUBLE)
          |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
          |      AS sst
          |  FROM w WHERE rk = k)
          |SELECT event_type, n AS n_days, k,
          |  round(ssb / sst, 6) AS eta2,
          |  round((ssb / CAST(k - 1 AS DOUBLE))
          |    / ((sst - ssb) / CAST(n - k AS DOUBLE)), 6) AS f_stat
          |FROM f ORDER BY event_type""".stripMargin)),

    GraftQuery(
      "q_stats_median_ci",
      "Distribution-free 95% confidence interval for the median of order " +
        "cents per priority — the order-statistic (binomial) interval: " +
        "rank bounds ⌊(n − 1.96√n)/2⌋ and ⌈1 + (n + 1.96√n)/2⌉ index " +
        "into the sorted sample, so the bounds are ACTUAL data values " +
        "with no distributional assumption (the honest report next to a " +
        "bare median). Ranks come from one identical IEEE expression on " +
        "both engines; all three lookups (lo, median, hi) ride ONE " +
        "value-grain cumulative window via the 2·cum ≥ r device — the " +
        "row grain never sorts.",
      (s, dir) => {
        import org.apache.spark.sql.types.{DoubleType, LongType}
        import org.apache.spark.sql.expressions.Window
        val byv = table(s, dir, "orders")
          .groupBy(col("o_orderpriority"),
            floor(col("o_totalprice") * 100 + 0.5).cast(LongType).as("c"))
          .agg(count(lit(1)).as("w"))
        val ord = Window.partitionBy("o_orderpriority").orderBy("c")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        def D(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
        val half = lit(1.96d) * sqrt(D(col("n")))
        val loRank = floor((D(col("n")) - half) / lit(2d)).cast(LongType)
        val hiRank = ceil(lit(1d) + (D(col("n")) + half) / lit(2d)).cast(LongType)
        byv
          .withColumn("cum", sum(col("w")).over(ord))
          .withColumn("n", sum(col("w")).over(Window.partitionBy("o_orderpriority")))
          .groupBy("o_orderpriority")
          .agg(max(col("n")).as("n_rows"),
            min(when(col("cum") * 2 >= col("n"), col("c"))).as("median_cents"),
            min(when(col("cum") >= loRank, col("c"))).as("lo_cents"),
            min(when(col("cum") >= hiRank, col("c"))).as("hi_cents"))
          .orderBy("o_orderpriority")
      },
      Some(
        """WITH byv AS (SELECT o_orderpriority,
          |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c,
          |    count(*) AS w
          |  FROM orders GROUP BY 1, 2),
          |r AS (SELECT o_orderpriority, c, w,
          |    CAST(sum(w) OVER (PARTITION BY o_orderpriority ORDER BY c
          |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
          |    CAST(sum(w) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n
          |  FROM byv),
          |k AS (SELECT o_orderpriority, c, cum, n,
          |    CAST(floor((CAST(n AS DOUBLE) - 1.96 * sqrt(CAST(n AS DOUBLE)))
          |      / 2.0) AS BIGINT) AS lo_rank,
          |    CAST(ceil(1.0 + (CAST(n AS DOUBLE)
          |      + 1.96 * sqrt(CAST(n AS DOUBLE))) / 2.0) AS BIGINT) AS hi_rank
          |  FROM r)
          |SELECT o_orderpriority, max(n) AS n_rows,
          |  CAST(min(CASE WHEN cum * 2 >= n THEN c END) AS BIGINT)
          |    AS median_cents,
          |  CAST(min(CASE WHEN cum >= lo_rank THEN c END) AS BIGINT)
          |    AS lo_cents,
          |  CAST(min(CASE WHEN cum >= hi_rank THEN c END) AS BIGINT)
          |    AS hi_cents
          |FROM k GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    GraftQuery(
      "q_stats_hill",
      "Hill tail-index estimator over document lengths (k = 100): " +
        "α̂ = k / Σ ln(x_(i)/x_(k+1)) over the k largest order statistics " +
        "— the principled MLE the q_text_zipf rank-frequency OLS " +
        "approximates, and the heavy-tail gate run before trusting any " +
        "mean-based length statistic. The top-(k+1) slice comes from the " +
        "distributed top-k heap (TakeOrderedAndProject — never a global " +
        "sort), the reference value x_(k+1) broadcasts back, and the ln " +
        "terms accumulate in the value-ordered window (equal values " +
        "contribute identical addends, so tie order cannot change the " +
        "float sum).",
      (s, dir) => {
        import org.apache.spark.sql.types.{DoubleType, LongType}
        import org.apache.spark.sql.expressions.Window
        def D(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
        val top = table(s, dir, "documents")
          .select(col("n_chars"), col("doc_id"))
          .orderBy(col("n_chars").desc, col("doc_id"))
          .limit(101)
        val ord = Window.orderBy(col("n_chars").desc, col("doc_id"))
        top
          .withColumn("rk", row_number().over(ord).cast(LongType))
          .withColumn("x_ref", min(when(col("rk") === 101L, col("n_chars")))
            .over(Window.partitionBy(lit(1))
              .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
          .filter(col("rk") <= 100L)
          // class-22 guards: a zero x_ref (top-101 all empty docs) makes
          // the ratio Spark-Inf vs oracle-NULL, and a LENGTH-CAPPED corpus
          // whose 101 largest docs all tie makes lncum exactly 0 (sum of
          // ln(1)) — alpha undefined, NULL both engines
          .withColumn("lncum",
            sum(log(graft.Exact.divNZ(D(col("n_chars")), D(col("x_ref")))))
              .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .filter(col("rk") === 100L)
          .select(lit(100L).as("k"), col("x_ref").as("x_k1"),
            round(graft.Exact.divNZ(lit(100d), col("lncum")), 6).as("hill_alpha"))
      },
      Some(
        s"""WITH top AS (SELECT n_chars, doc_id FROM documents
          |  ORDER BY n_chars DESC, doc_id LIMIT 101),
          |rk AS (SELECT n_chars,
          |    CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id)
          |      AS BIGINT) AS rk
          |  FROM top),
          |xr AS (SELECT rk, n_chars,
          |    min(CASE WHEN rk = 101 THEN n_chars END) OVER () AS x_ref
          |  FROM rk),
          |s AS (SELECT rk, x_ref,
          |    sum(ln(${graft.Exact.divNZSql("CAST(n_chars AS DOUBLE)",
               "CAST(x_ref AS DOUBLE)")}))
          |      OVER (ORDER BY rk ROWS UNBOUNDED PRECEDING) AS lncum
          |  FROM xr WHERE rk <= 100)
          |SELECT CAST(100 AS BIGINT) AS k, CAST(x_ref AS BIGINT) AS x_k1,
          |  round(${graft.Exact.divNZSql("100.0", "lncum")}, 6) AS hill_alpha
          |FROM s WHERE rk = 100""".stripMargin)),

    GraftQuery(
      "q_stats_levene",
      "Brown–Forsythe/Levene variance-homogeneity test across day-of-week " +
        "groups per type — the assumption check run BEFORE trusting " +
        "q_stats_anova's F (ANOVA assumes equal group variances; Levene " +
        "tests exactly that): one-way ANOVA on the absolute deviations " +
        "z = |x − group MEDIAN|. The median variant (Brown–Forsythe) " +
        "keeps everything integral: each dow cell's lower median is an " +
        "actual data value (2·rank ≥ n over the ≤days-per-dow cell — " +
        "tiny keyed windows), so every z is an exact BIGINT and the " +
        "ANOVA sufficient statistics stay integer to the closed-form " +
        "doubles; the one float sum (Σ sz²/c over ≤7 cells) runs in the " +
        "dow-ordered window. Day-grain only.",
      (s, dir) => {
        import org.apache.spark.sql.types.{DoubleType, LongType}
        import org.apache.spark.sql.expressions.Window
        def D(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
        val daily = table(s, dir, "events")
          .groupBy(col("event_type"),
            graft.Ts.dayBucket(col("ts"))
              .as("day"))
          .agg(count(lit(1)).as("x"))
          .withColumn("dow", pmod(col("day") + lit(3L), lit(7L)))
        val cw = Window.partitionBy("event_type", "dow").orderBy("x", "day")
        val med = daily
          .withColumn("rk", row_number().over(cw).cast(LongType))
          .withColumn("cn", count(lit(1)).over(
            Window.partitionBy("event_type", "dow")))
          .filter(col("rk") * 2 >= col("cn"))
          .groupBy("event_type", "dow")
          .agg(min(col("x")).as("med"))
        val z = daily.join(med, Seq("event_type", "dow"))
          .select(col("event_type"), col("dow"), abs(col("x") - col("med")).as("z"))
        val cells = z.groupBy("event_type", "dow")
          .agg(count(lit(1)).as("c"), sum(col("z")).as("sz"),
            sum(col("z") * col("z")).as("szz"))
        val wt = Window.partitionBy("event_type")
        val ordw = Window.partitionBy("event_type").orderBy("dow")
        val ssb = col("bcum") - D(col("st")) * D(col("st")) / D(col("n"))
        val sst = D(col("szz_t")) - D(col("st")) * D(col("st")) / D(col("n"))
        cells
          .withColumn("n", sum(col("c")).over(wt))
          .withColumn("st", sum(col("sz")).over(wt))
          .withColumn("szz_t", sum(col("szz")).over(wt))
          .withColumn("k", count(lit(1)).over(wt))
          .withColumn("bcum", sum(D(col("sz")) * D(col("sz")) / D(col("c")))
            .over(ordw.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("rk", row_number().over(ordw).cast(LongType))
          .filter(col("rk") === col("k"))
          .select(col("event_type"), col("n").as("n_days"), col("k"),
            round((ssb / D(col("k") - lit(1L))) /
              ((sst - ssb) / D(col("n") - col("k"))), 6).as("levene_w"))
          .orderBy("event_type")
      },
      Some(
        """WITH d AS (SELECT event_type,
          |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day, count(*) AS x
          |  FROM events GROUP BY 1, 2),
          |g AS (SELECT event_type, day, (((day + 3) % 7) + 7) % 7 AS dow, x FROM d),
          |r AS (SELECT event_type, dow, x,
          |    CAST(row_number() OVER (PARTITION BY event_type, dow
          |      ORDER BY x, day) AS BIGINT) AS rk,
          |    CAST(count(*) OVER (PARTITION BY event_type, dow) AS BIGINT)
          |      AS cn
          |  FROM g),
          |m AS (SELECT event_type, dow, min(x) AS med
          |  FROM r WHERE rk * 2 >= cn GROUP BY 1, 2),
          |z AS (SELECT g.event_type, g.dow, abs(g.x - m.med) AS z
          |  FROM g JOIN m ON g.event_type = m.event_type AND g.dow = m.dow),
          |cells AS (SELECT event_type, dow, count(*) AS c,
          |    CAST(sum(z) AS BIGINT) AS sz, CAST(sum(z * z) AS BIGINT) AS szz
          |  FROM z GROUP BY 1, 2),
          |w AS (SELECT event_type, dow, c, sz, szz,
          |    CAST(sum(c) OVER p AS BIGINT) AS n,
          |    CAST(sum(sz) OVER p AS BIGINT) AS st,
          |    CAST(sum(szz) OVER p AS BIGINT) AS szz_t,
          |    CAST(count(*) OVER p AS BIGINT) AS k,
          |    sum(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) / CAST(c AS DOUBLE))
          |      OVER (PARTITION BY event_type ORDER BY dow
          |        ROWS UNBOUNDED PRECEDING) AS bcum,
          |    row_number() OVER (PARTITION BY event_type ORDER BY dow) AS rk
          |  FROM cells WINDOW p AS (PARTITION BY event_type)),
          |f AS (SELECT event_type, n, k,
          |    bcum - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
          |      / CAST(n AS DOUBLE) AS ssb,
          |    CAST(szz_t AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
          |      / CAST(n AS DOUBLE) AS sst
          |  FROM w WHERE rk = k)
          |SELECT event_type, n AS n_days, k,
          |  round((ssb / CAST(k - 1 AS DOUBLE))
          |    / ((sst - ssb) / CAST(n - k AS DOUBLE)), 6) AS levene_w
          |FROM f ORDER BY event_type""".stripMargin)),

    GraftQuery(
      "q_clean_impute",
      "Median imputation — the fill-missing-with-group-median cleaning " +
        "leg next to q_clean_winsorize's clipping: a deterministic tenth " +
        "of rows (event_id ≡ 0 mod 10) have their value nulled, each " +
        "type's LOWER MEDIAN of the surviving cents is found on the " +
        "value-grain relation with the integer 2·cum ≥ W test (no " +
        "interpolation float — the imputed value is always a real data " +
        "value), and the post-imputation ledger Σcents + n_null·median " +
        "is EXACT BIGINT, so the gate proves conservation, not just the " +
        "median. Value-grain window per type, medians broadcast back; " +
        "the corpus is touched by one agg and one map pass.",
      (s, dir) => {
        import org.apache.spark.sql.types.LongType
        import org.apache.spark.sql.expressions.Window
        val cents0 = when(col("event_id") % 10 =!= 0,
          floor(col("value") * 100 + 0.5).cast(LongType))
        val e = table(s, dir, "events")
          .select(col("event_type"), col("event_id"), cents0.as("c0"))
        val byv = e.filter(col("c0").isNotNull)
          .groupBy(col("event_type"), col("c0").as("c"))
          .agg(count(lit(1)).as("w"))
        val ord = Window.partitionBy("event_type").orderBy("c")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val med = byv
          .withColumn("cum", sum(col("w")).over(ord))
          .withColumn("tw", sum(col("w")).over(Window.partitionBy("event_type")))
          .filter(col("cum") * 2 >= col("tw"))
          .groupBy("event_type")
          .agg(min(col("c")).as("median_cents"))
        e.groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(when(col("c0").isNull, 1L).otherwise(0L)).as("n_imputed"),
            sum(col("c0")).as("s"))
          .join(broadcast(med), "event_type")
          .select(col("event_type"), col("n"), col("n_imputed"),
            col("median_cents"),
            (col("s") + col("n_imputed") * col("median_cents"))
              .as("total_cents"))
          .orderBy("event_type")
      },
      Some(
        """WITH e AS (SELECT event_type, event_id,
          |    CASE WHEN event_id % 10 <> 0
          |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END AS c0
          |  FROM events),
          |byv AS (SELECT event_type, c0 AS c, count(*) AS w FROM e
          |  WHERE c0 IS NOT NULL GROUP BY 1, 2),
          |r AS (SELECT event_type, c, w,
          |    CAST(sum(w) OVER (PARTITION BY event_type ORDER BY c
          |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
          |    CAST(sum(w) OVER (PARTITION BY event_type) AS BIGINT) AS tw
          |  FROM byv),
          |m AS (SELECT event_type, min(c) AS median_cents
          |  FROM r WHERE cum * 2 >= tw GROUP BY 1),
          |a AS (SELECT event_type, count(*) AS n,
          |    CAST(sum(CASE WHEN c0 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          |      AS n_imputed,
          |    CAST(sum(c0) AS BIGINT) AS s
          |  FROM e GROUP BY 1)
          |SELECT a.event_type, a.n, a.n_imputed, m.median_cents,
          |  a.s + a.n_imputed * m.median_cents AS total_cents
          |FROM a JOIN m ON a.event_type = m.event_type
          |ORDER BY a.event_type""".stripMargin))
  )
}
