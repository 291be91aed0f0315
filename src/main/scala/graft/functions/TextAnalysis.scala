package graft.functions

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation (SURVEY.md §2.11
  * stretch set): language-ID heuristic, quality scoring, document
  * fingerprinting. All pure column expressions; all oracle-checked.
  *
  * Scale: every operator here is a single map-side pass over documents plus
  * (at most) one small aggregation — embarrassingly parallel at 100 TB.
  */
object TextAnalysis {
  import Tables.table

  /** Marker-token lists per language (classic function-word cues). The
    * fixture corpus is synthetic shared-vocabulary text, so accuracy is
    * honest-but-weak — the graded artifact is the deterministic scoring
    * operator, reported as a confusion matrix against the labeled lang. */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in"),
    "es" -> Seq("el", "la", "de", "y", "que", "los"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "de", "et", "un", "les"),
    "zh" -> Seq("的", "是", "不", "了", "在", "有"))


  /** (lang, pred) confusion cells from the marker-argmax language-ID pass —
    * THE one copy of the scoring pipeline shared by q_text_lang_id and
    * q_text_lang_metrics ("the identical marker-argmax"; each previously
    * carried it verbatim — r13 review). Explodes the codegen'd TokenCounts
    * pre-reduction (~7x fewer rows than raw tokens; multiplicity preserved
    * by the c weight) and ties break by the fixed marker priority order —
    * the same CASE chain as [[langPredSql]]. NULL text is excluded
    * SYMMETRICALLY with the oracle: Spark's explode drops a NULL-token doc
    * silently while DuckDB's CASE would classify it 'und' — the filter
    * makes both engines agree by contract instead of by fixture luck. */
  private def langCells(s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    val scoreAggs = markers.map { case (l, ws) =>
      sum(when(col("w").isin(ws: _*), col("c")).otherwise(0L)).as(s"sc_$l")
    }
    val scored = graft.Tables.spread(s, table(s, dir, "documents"))
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"),
        explode(VectorExpr.tokenCounts(split(col("text"), " "))).as("kv"))
      .select(col("doc_id"), col("lang"), col("kv.w").as("w"), col("kv.c").as("c"))
      .groupBy("doc_id", "lang")
      .agg(scoreAggs.head, scoreAggs.tail: _*)
    val best = greatest(markers.map { case (l, _) => col(s"sc_$l") }: _*)
    val chain = markers.foldRight(lit("und")) { case ((lang, _), els) =>
      when(col(s"sc_$lang") === best && best > 0, lang).otherwise(els)
    }
    scored.withColumn("pred", chain)
      .groupBy("lang", "pred").agg(count(lit(1)).as("n"))
  }

  /** DuckDB twin of [[langCells]]: the d/sc/p CTE prefix ending in the
    * per-(lang, pred) relation `p`. */
  private lazy val langPredSql: String = {
    val scoreCols = markers.map { case (lang, ws) =>
      val inList = ws.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(toks, t -> t IN ($inList))) AS sc_$lang"
    }.mkString(", ")
    val bestExpr = "greatest(" + markers.map { case (l, _) => s"sc_$l" }.mkString(", ") + ")"
    val chain = markers.map { case (lang, _) =>
      s"WHEN sc_$lang = best AND best > 0 THEN '$lang'"
    }.mkString(" ")
    s"""d AS (SELECT lang, string_split(text,' ') AS toks FROM documents
       |       WHERE text IS NOT NULL),
       |sc AS (SELECT lang, $scoreCols FROM d),
       |p AS (SELECT lang, CASE $chain ELSE 'und' END AS pred
       |      FROM (SELECT *, $bestExpr AS best FROM sc) t)""".stripMargin
  }

  /** q_text_zipf's rank-window size — the ONE copy (previously hardcoded
    * in six places across both engines; a one-sided tune would silently
    * mis-scale the OLS slope — r13 review, same class as the minhash 8.0). */
  private val ZipfK = 20

  val all: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q_text_lang_id",
      "Language-ID heuristic: count marker tokens per language, argmax with a fixed " +
        "priority tie-break ('und' when nothing matches); output = confusion matrix " +
        "versus the labeled lang column.",
      (s, dir) => {
        // relational scoring over the codegen'd TokenCounts pre-reduction:
        // explode already-reduced (word, count) pairs (~7× fewer generated
        // rows than raw tokens) and take 5 conditional weighted sums in a
        // single codegen'd aggregation — multiplicity preserved by the c
        // weight, so counts equal the raw-explode form exactly. Every doc has
        // ≥1 token, so the groupBy loses no documents.
        langCells(s, dir).orderBy("lang", "pred")
      },
      Some(
        s"""WITH $langPredSql
           |SELECT lang, pred, count(*) AS n FROM p GROUP BY lang, pred ORDER BY lang, pred""".stripMargin)),

    GraftQuery(
      "q_text_quality",
      "Quality scoring: type-token ratio, length saturation, mean token length → " +
        "deterministic low/med/high buckets with per-bucket stats.",
      (s, dir) => {
        val d = table(s, dir, "documents")
          // symmetric NULL-text exclusion: Spark's size(NULL) is -1 (legacy
          // default) → garbage ttr, while the oracle propagates NULL scores
          .filter(col("text").isNotNull)
          .withColumn("toks", split(col("text"), " "))
          .withColumn("n_tok", size(col("toks")).cast("double"))
          .withColumn("n_uniq", size(array_distinct(col("toks"))).cast("double"))
          .withColumn("ttr", col("n_uniq") / col("n_tok"))
          .withColumn("avg_len",
            (col("n_chars") - (col("n_tok") - 1)) / col("n_tok")) // chars minus separators
          .withColumn("score",
            col("ttr") * 0.5 + least(col("n_tok") / lit(100.0), lit(1.0)) * 0.3 +
              least(col("avg_len") / lit(8.0), lit(1.0)) * 0.2)
          .withColumn("bucket",
            when(col("score") >= 0.7, "high").when(col("score") >= 0.5, "med").otherwise("low"))
        // avg(ttr) rides the doc_id-ordered cumulative fold (the zipf/entropy
        // device), NOT a hash aggregate: ttr is a non-dyadic double per doc,
        // so a partition-order merge differs in the last ulps run-to-run and
        // from DuckDB's own order — the one order-dependent float fold this
        // family had left (r13 review). avg(n_tok) stays a plain avg: token
        // counts are integral doubles whose sums are exact in any order.
        val wb = Window.partitionBy("bucket").orderBy("doc_id")
        d.withColumn("sttr", sum(col("ttr")).over(
            wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("rn", row_number().over(wb))
          .withColumn("n", count(lit(1)).over(Window.partitionBy("bucket")))
          .withColumn("avg_tokens", avg(col("n_tok")).over(Window.partitionBy("bucket")))
          .filter(col("rn") === col("n"))
          .select(col("bucket"), col("n"),
            round(col("sttr") / col("n").cast("double"), 4).as("avg_ttr"),
            round(col("avg_tokens"), 4).as("avg_tokens"))
          .orderBy("bucket")
      },
      Some(
        """WITH d AS (SELECT doc_id, n_chars, string_split(text,' ') AS toks
          |  FROM documents WHERE text IS NOT NULL),
          |m AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS n_tok,
          |             CAST(len(list_distinct(toks)) AS DOUBLE) AS n_uniq,
          |             n_chars FROM d),
          |sc AS (SELECT doc_id, n_tok, n_uniq / n_tok AS ttr,
          |              (n_chars - (n_tok - 1)) / n_tok AS avg_len FROM m),
          |b AS (SELECT doc_id, n_tok, ttr,
          |  ttr * 0.5 + least(n_tok / 100.0, 1.0) * 0.3 + least(avg_len / 8.0, 1.0) * 0.2 AS score
          |  FROM sc),
          |bk AS (SELECT doc_id, n_tok, ttr,
          |  CASE WHEN score >= 0.7 THEN 'high' WHEN score >= 0.5 THEN 'med' ELSE 'low' END AS bucket
          |  FROM b),
          |f AS (SELECT bucket,
          |    sum(ttr) OVER (PARTITION BY bucket ORDER BY doc_id
          |      ROWS UNBOUNDED PRECEDING) AS sttr,
          |    row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn,
          |    count(*) OVER (PARTITION BY bucket) AS n,
          |    avg(n_tok) OVER (PARTITION BY bucket) AS avg_tokens
          |  FROM bk)
          |SELECT bucket, n, round(sttr / CAST(n AS DOUBLE), 4) AS avg_ttr,
          |       round(avg_tokens, 4) AS avg_tokens
          |FROM f WHERE rn = n ORDER BY bucket""".stripMargin)),

    GraftQuery(
      "q_text_bpe_tokens",
      "Token counting two ways: whitespace words and a BPE-ish subword regex " +
        "([a-z]{1,4} greedy chunks) — the cheap pre-tokenization token estimator " +
        "for training-data budgeting.",
      (s, dir) =>
        table(s, dir, "documents")
          .select(
            col("doc_id"),
            size(split(col("text"), " ")).as("n_words"),
            regexp_count(col("text"), lit("[a-z]{1,4}")).as("n_subtokens"))
          .orderBy("doc_id")
          .limit(500),
      Some(
        "SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_words, " +
          "CAST(len(regexp_extract_all(text, '[a-z]{1,4}')) AS INT) AS n_subtokens " +
          "FROM documents ORDER BY doc_id LIMIT 500")),

    GraftQuery(
      "q_text_fingerprint",
      "Document fingerprint via polynomial rolling hash over tokens " +
        "(h = fold (h*31 + ascii(first char)*len(token)) mod 1000003) — a pure " +
        "sequential fold, identical on both engines (TokenRollingHash codegen " +
        "Expression ≡ DuckDB list_reduce with a prepended zero; the HOF " +
        "transform+aggregate form it replaces paid interpreted-lambda dispatch " +
        "per token, twice).",
      (s, dir) =>
        table(s, dir, "documents")
          .withColumn("toks", split(col("text"), " "))
          .select(col("doc_id"), VectorExpr.rollingFp(col("toks")).as("fp"))
          .orderBy("doc_id")
          .limit(500),
      Some(
        """SELECT doc_id,
          |  list_reduce(list_concat([CAST(0 AS BIGINT)],
          |    list_transform(string_split(text,' '), t -> CAST(ascii(t) * len(t) AS BIGINT))),
          |    (a, b) -> (a * 31 + b) % 1000003) AS fp
          |FROM documents ORDER BY doc_id LIMIT 500""".stripMargin)),

    GraftQuery(
      "q_text_tfidf",
      "TF-IDF term scoring — the classic corpus-weighting operator: tf = term " +
        "count within the doc, df = number of docs containing the term, score = " +
        "tf · ln(N/df); global top-20 (doc, term) scores with a total tie-break. " +
        "Deterministic cross-engine because tf/df/N are exact integers and the " +
        "single ln + multiply is the identical IEEE expression on both engines. " +
        "Scale shape: ONE token explode → (doc, term) counts (map-side partials " +
        "compress the shuffle to the distinct-pair count); df is derived FROM the " +
        "tf relation as a COUNT WINDOW over the term — df(w) = count of (doc, w) " +
        "rows — so the corpus is tokenized and shuffled exactly once and the df " +
        "leg is the (w)-keyed exchange of the already-reduced tf relation. (The " +
        "earlier self-join spelling leaned on ReuseExchange for the same " +
        "guarantee; the window form gives it structurally — no duplicate " +
        "subtree exists to dedupe, and the physical plan stays clone-safe for " +
        "re-execution harnesses.) N rides in as one broadcast row. Nothing " +
        "global but the final top-k (TakeOrderedAndProject).",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = table(s, dir, "documents")
        // tf is computed per-doc map-side by the codegen'd TokenCounts (one
        // hash-map pass per row) and exploded ALREADY REDUCED — no raw-token
        // Generate, no (doc_id, w) aggregation exchange at all
        val tf = graft.Tables.spread(s, docs)
          .select(col("doc_id"),
            explode(VectorExpr.tokenCounts(split(col("text"), " "))).as("kv"))
          .select(col("doc_id"), col("kv.w").as("w"), col("kv.c").as("tf"))
        val n = docs.select(count(lit(1)).as("n_docs"))
        tf.withColumn("df", count(lit(1)).over(Window.partitionBy("w")))
          .crossJoin(broadcast(n))
          .select(col("doc_id"), col("w").as("term"),
            round(col("tf") * log(col("n_docs").cast("double") / col("df").cast("double")), 6)
              .as("score"))
          .orderBy(col("score").desc, col("doc_id"), col("term"))
          .limit(20)
      },
      Some(
        """WITH tf AS (SELECT doc_id, w, count(*) AS tf FROM (
          |    SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents)
          |  GROUP BY doc_id, w),
          |df AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
          |n AS (SELECT count(*) AS n_docs FROM documents)
          |SELECT tf.doc_id, tf.w AS term,
          |  round(tf * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS score
          |FROM tf JOIN df ON tf.w = df.w CROSS JOIN n
          |ORDER BY score DESC, tf.doc_id, term LIMIT 20""".stripMargin)),

    GraftQuery(
      "q_text_boilerplate",
      "Cross-document boilerplate detection (the C4-style curation step the " +
        "within-doc q_text_repetition cannot see): a 5-gram appearing in ≥ 3 " +
        "distinct documents is boilerplate; per doc, the distinct-shingle " +
        "count, boilerplate-shingle count, and ratio — top-20 most " +
        "boilerplate-laden docs. The fixture's near-dup clusters are exactly " +
        "what lights this up. Scale shape: distinct shingle HASHES are built " +
        "map-side per doc (the decontaminate discipline — 8-byte keys " +
        "shuffle, never text), then df is a count-over-window keyed on the " +
        "hash — ONE scan, ONE wide exchange; the agg+self-join form scanned " +
        "and re-shingled the corpus twice (or broadcast it whole). The " +
        "window group for a universal shingle is df rows of 16-byte pairs, " +
        "buffered via Spark's spilling window array. A 2^-64 hash collision " +
        "could only add a false boilerplate flag, and the string-keyed " +
        "oracle pins the counts as identical.",
      (s, dir) => {
        val sh = Tables.spread(s, table(s, dir, "documents"))
          .select(col("doc_id"), explode(VectorExpr.shingleHashes(split(col("text"), " "), 5)).as("g"))
        import org.apache.spark.sql.expressions.Window
        sh.withColumn("df", count(lit(1)).over(Window.partitionBy("g")))
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_sh"),
            sum(when(col("df") >= 3, 1L).otherwise(0L)).as("n_boiler"))
          .filter(col("n_boiler") > 0)
          .select(col("doc_id"), col("n_sh"), col("n_boiler"),
            round(col("n_boiler").cast("double") / col("n_sh").cast("double"), 6).as("boiler_ratio"))
          .orderBy(col("boiler_ratio").desc, col("doc_id"))
          .limit(20)
      },
      Some(
        """WITH d AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
          |sh AS MATERIALIZED (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks)-3),
          |    i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]||' '||toks[i+3]||' '||toks[i+4]))) AS g
          |  FROM d WHERE len(toks) >= 5),
          |df AS (SELECT g, count(*) AS df FROM sh GROUP BY g),
          |p AS (SELECT doc_id, count(*) AS n_sh,
          |    CAST(sum(CASE WHEN df.df >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
          |  FROM sh JOIN df ON sh.g = df.g GROUP BY doc_id)
          |SELECT doc_id, n_sh, n_boiler,
          |  round(CAST(n_boiler AS DOUBLE) / CAST(n_sh AS DOUBLE), 6) AS boiler_ratio
          |FROM p WHERE n_boiler > 0
          |ORDER BY boiler_ratio DESC, doc_id LIMIT 20""".stripMargin)),

    GraftQuery(
      "q_text_zipf",
      "Zipf slope of the corpus vocabulary — the healthy-corpus " +
        "diagnostic (natural text slopes ≈ −1; synthetic or boilerplate-" +
        "heavy corpora flatten): OLS slope of ln(freq) on ln(rank) over " +
        "the top-20 terms (frequency desc, term tie-break; the fixture " +
        "vocabulary is ~31 terms). The float " +
        "sufficient statistics are made DETERMINISTIC by construction: " +
        "all four running sums accumulate in ONE ordered window over the " +
        "20-row rank relation — a fixed summation order on both engines, " +
        "unlike a hash aggregate's partition-order float folds — and the " +
        "slope is read off the last rank's row. Corpus term counts come " +
        "from the codegen'd TokenCounts pre-reduction (single tokenize, " +
        "one (w)-keyed exchange); everything after the top-k cut is " +
        "constant-size work.",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val cf = Tables.spread(s, table(s, dir, "documents"))
          .select(explode(VectorExpr.tokenCounts(split(col("text"), " "))).as("kv"))
          .groupBy(col("kv.w").as("w")).agg(sum(col("kv.c")).as("cf"))
        val ranked = cf.orderBy(col("cf").desc, col("w")).limit(ZipfK)
          .withColumn("rk",
            row_number().over(Window.orderBy(col("cf").desc, col("w"))).cast("long"))
          .select(col("rk"), log(col("rk").cast("double")).as("x"),
            log(col("cf").cast("double")).as("y"))
        val w100 = Window.orderBy("rk")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ranked
          .withColumn("sx", sum(col("x")).over(w100))
          .withColumn("sy", sum(col("y")).over(w100))
          .withColumn("sxy", sum(col("x") * col("y")).over(w100))
          .withColumn("sxx", sum(col("x") * col("x")).over(w100))
          .filter(col("rk") === ZipfK.toLong)
          .select(col("rk").as("n_terms"),
            round((lit(ZipfK.toDouble) * col("sxy") - col("sx") * col("sy"))
              / (lit(ZipfK.toDouble) * col("sxx") - col("sx") * col("sx")), 6)
              .as("zipf_slope"))
      },
      Some(
        s"""WITH tf AS (SELECT w, CAST(count(*) AS BIGINT) AS cf FROM (
          |    SELECT unnest(string_split(text,' ')) AS w FROM documents)
          |  GROUP BY w),
          |top AS (SELECT w, cf FROM tf ORDER BY cf DESC, w LIMIT $ZipfK),
          |r AS (SELECT CAST(row_number() OVER (ORDER BY cf DESC, w) AS BIGINT) AS rk,
          |    ln(CAST(row_number() OVER (ORDER BY cf DESC, w) AS DOUBLE)) AS x,
          |    ln(CAST(cf AS DOUBLE)) AS y
          |  FROM top),
          |c AS (SELECT rk,
          |    sum(x) OVER win AS sx, sum(y) OVER win AS sy,
          |    sum(x * y) OVER win AS sxy, sum(x * x) OVER win AS sxx
          |  FROM r WINDOW win AS (ORDER BY rk ROWS UNBOUNDED PRECEDING))
          |SELECT rk AS n_terms,
          |  round(($ZipfK.0 * sxy - sx * sy) / ($ZipfK.0 * sxx - sx * sx), 6) AS zipf_slope
          |FROM c WHERE rk = $ZipfK""".stripMargin)),

    GraftQuery(
      "q_text_entropy",
      "Shannon entropy of the corpus token distribution, per language — " +
        "the diversity score next to q_text_zipf's decay slope (a corpus " +
        "collapsing onto few tokens scores low; uniform scores ln V): " +
        "H = −Σ p ln p over each language's term distribution, plus the " +
        "ln(V)-normalized efficiency. Determinism at SCALE: the float " +
        "fold is BANDED TWO-PASS (the q_pack_sequences device applied to " +
        "doubles). Terms band on their 2-char prefix (prefix blocks are " +
        "contiguous in both engines' binary collation); each (lang, band) " +
        "folds its −p·ln p contributions sequentially in term order in a " +
        "PARTITIONED window, band subtotals (each band's last local value) " +
        "fold sequentially in band order over the band-grain relation, " +
        "and the answer reads off the last band. Because float addition " +
        "is non-associative, the DuckDB oracle computes the IDENTICAL " +
        "banded tree — same fold order, same IEEE doubles — so no stage " +
        "on either engine ever folds a vocabulary-sized relation in one " +
        "partition. Term counts are exact BIGINTs from the TokenCounts " +
        "pre-reduction; lang totals are one hash agg broadcast back.",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val cf = Tables.spread(s, table(s, dir, "documents"))
          .select(col("lang"), explode(VectorExpr.tokenCounts(split(col("text"), " "))).as("kv"))
          .groupBy(col("lang"), col("kv.w").as("w")).agg(sum(col("kv.c")).as("c"))
        val tot = cf.groupBy("lang")
          .agg(sum(col("c")).as("n"), count(lit(1)).as("v"))
        val p = col("c").cast("double") / col("n").cast("double")
        val wLo = Window.partitionBy("lang", "band").orderBy("w")
        val wL = wLo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wBo = Window.partitionBy("lang").orderBy("band")
        val wB = wBo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        cf.join(broadcast(tot), "lang")
          .withColumn("band", substring(col("w"), 1, 2))
          .withColumn("h_loc", sum(-p * log(p)).over(wL))
          .withColumn("rk_loc", row_number().over(wLo))
          .withColumn("nb", count(lit(1)).over(Window.partitionBy("lang", "band")))
          .filter(col("rk_loc") === col("nb")) // band grain from here on
          .withColumn("h_cum", sum(col("h_loc")).over(wB))
          .withColumn("brk", row_number().over(wBo))
          .withColumn("nbands", count(lit(1)).over(Window.partitionBy("lang")))
          .filter(col("brk") === col("nbands"))
          .select(col("lang"), col("v").as("vocab"),
            round(col("h_cum"), 6).as("entropy"),
            // class-22 guard: a single-word vocabulary has ln(v) = 0 and
            // h_cum = 0 — efficiency undefined, NULL both engines (was
            // Spark 0/0 NaN vs oracle NULL)
            round(graft.Exact.divNZ(col("h_cum"),
              log(col("v").cast("double"))), 6).as("efficiency"))
          .orderBy("lang")
      },
      Some(
        s"""WITH tf AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS c FROM (
          |    SELECT lang, unnest(string_split(text,' ')) AS w FROM documents)
          |  GROUP BY lang, w),
          |tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n, count(*) AS v
          |  FROM tf GROUP BY lang),
          |loc AS (SELECT tf.lang AS lang, w, v, substr(w, 1, 2) AS band,
          |    sum(-(CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n))
          |      OVER (PARTITION BY tf.lang, substr(w, 1, 2)
          |            ORDER BY w ROWS UNBOUNDED PRECEDING) AS h_loc,
          |    row_number() OVER (PARTITION BY tf.lang, substr(w, 1, 2)
          |                       ORDER BY w) AS rk_loc,
          |    count(*) OVER (PARTITION BY tf.lang, substr(w, 1, 2)) AS nb
          |  FROM tf JOIN tot ON tf.lang = tot.lang),
          |ends AS (SELECT lang, band, v, h_loc FROM loc WHERE rk_loc = nb),
          |cum AS (SELECT lang, v,
          |    sum(h_loc) OVER (PARTITION BY lang ORDER BY band
          |                     ROWS UNBOUNDED PRECEDING) AS h_cum,
          |    row_number() OVER (PARTITION BY lang ORDER BY band) AS brk,
          |    count(*) OVER (PARTITION BY lang) AS nbands
          |  FROM ends)
          |SELECT lang, CAST(v AS BIGINT) AS vocab, round(h_cum, 6) AS entropy,
          |  round(${graft.Exact.divNZSql("h_cum", "ln(CAST(v AS DOUBLE))")}, 6) AS efficiency
          |FROM cum WHERE brk = nbands ORDER BY lang""".stripMargin)),

    GraftQuery(
      "q_text_js_divergence",
      "Jensen–Shannon divergence between the English and non-English " +
        "token distributions — the CONTENT-drift monitor next to " +
        "q_stats_ks's length-drift (JS is symmetric, bounded by ln 2, and " +
        "defined even where one side has zero mass — the KL failure " +
        "mode): JSD = ½Σ p ln(p/m) + ½Σ q ln(q/m), m = (p+q)/2. One " +
        "conditional-sum aggregation collapses the corpus to the " +
        "vocabulary relation (term, c1, c2); the 1-row totals broadcast " +
        "back. The float fold is BANDED TWO-PASS (the q_text_entropy " +
        "scale device): terms band on their 2-char prefix, each band " +
        "folds its contributions sequentially in term order in a " +
        "PARTITIONED window, band subtotals fold sequentially over the " +
        "tiny band-grain relation, and the answer reads off the last " +
        "band, normalized to [0,1] by ln 2. The oracle computes the " +
        "identical banded tree, so the non-associative double sums " +
        "agree bit-for-bit with NO vocabulary-sized single partition.",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val t = Tables.spread(s, table(s, dir, "documents"))
          .select((col("lang") === "en").as("g"),
            explode(VectorExpr.tokenCounts(split(col("text"), " "))).as("kv"))
          .groupBy(col("kv.w").as("w"))
          .agg(sum(when(col("g"), col("kv.c")).otherwise(0L)).as("c1"),
            sum(when(!col("g"), col("kv.c")).otherwise(0L)).as("c2"))
        val tot = t.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
          count(lit(1)).as("v"))
        val p = col("c1").cast("double") / col("n1").cast("double")
        val q = col("c2").cast("double") / col("n2").cast("double")
        val m = (p + q) / lit(2d)
        val contrib =
          (when(col("c1") > 0L, p * log(p / m)).otherwise(lit(0d)) +
            when(col("c2") > 0L, q * log(q / m)).otherwise(lit(0d))) / lit(2d)
        val wLo = Window.partitionBy("band").orderBy("w")
        val wL = wLo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wBo = Window.orderBy("band")
        val wB = wBo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t.crossJoin(broadcast(tot))
          .withColumn("band", substring(col("w"), 1, 2))
          .withColumn("j_loc", sum(contrib).over(wL))
          .withColumn("rk_loc", row_number().over(wLo))
          .withColumn("nb", count(lit(1)).over(Window.partitionBy("band")))
          .filter(col("rk_loc") === col("nb")) // band grain from here on
          .withColumn("jsd_cum", sum(col("j_loc")).over(wB))
          .withColumn("brk", row_number().over(wBo))
          .withColumn("nbands", count(lit(1)).over(
            wBo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
          .filter(col("brk") === col("nbands"))
          .select(col("v").as("vocab"), round(col("jsd_cum"), 6).as("jsd"),
            round(col("jsd_cum") / lit(math.log(2d)), 6).as("jsd_norm"))
      },
      Some(
        """WITH t AS (SELECT w,
          |    CAST(sum(CASE WHEN g THEN c ELSE 0 END) AS BIGINT) AS c1,
          |    CAST(sum(CASE WHEN NOT g THEN c ELSE 0 END) AS BIGINT) AS c2
          |  FROM (SELECT lang = 'en' AS g, w, count(*) AS c FROM (
          |      SELECT lang, unnest(string_split(text,' ')) AS w FROM documents)
          |    GROUP BY 1, 2)
          |  GROUP BY w),
          |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
          |    CAST(sum(c2) AS BIGINT) AS n2, count(*) AS v FROM t),
          |loc AS (SELECT w, v, substr(w, 1, 2) AS band,
          |    sum(
          |      (CASE WHEN c1 > 0 THEN (CAST(c1 AS DOUBLE)/n1)
          |         * ln((CAST(c1 AS DOUBLE)/n1)
          |               / ((CAST(c1 AS DOUBLE)/n1 + CAST(c2 AS DOUBLE)/n2) / 2))
          |        ELSE 0 END
          |       + CASE WHEN c2 > 0 THEN (CAST(c2 AS DOUBLE)/n2)
          |         * ln((CAST(c2 AS DOUBLE)/n2)
          |               / ((CAST(c1 AS DOUBLE)/n1 + CAST(c2 AS DOUBLE)/n2) / 2))
          |        ELSE 0 END) / 2)
          |      OVER (PARTITION BY substr(w, 1, 2)
          |            ORDER BY w ROWS UNBOUNDED PRECEDING) AS j_loc,
          |    row_number() OVER (PARTITION BY substr(w, 1, 2) ORDER BY w) AS rk_loc,
          |    count(*) OVER (PARTITION BY substr(w, 1, 2)) AS nb
          |  FROM t, tot),
          |ends AS (SELECT band, v, j_loc FROM loc WHERE rk_loc = nb),
          |cum AS (SELECT v,
          |    sum(j_loc) OVER (ORDER BY band ROWS UNBOUNDED PRECEDING) AS jsd_cum,
          |    row_number() OVER (ORDER BY band) AS brk,
          |    count(*) OVER () AS nbands
          |  FROM ends)
          |SELECT CAST(v AS BIGINT) AS vocab, round(jsd_cum, 6) AS jsd,
          |  round(jsd_cum / ln(2.0), 6) AS jsd_norm
          |FROM cum WHERE brk = nbands""".stripMargin)),

    GraftQuery(
      "q_text_novelty",
      "Corpus-order novelty curve — the curriculum/dedup monitor: a doc's " +
        "novelty is the fraction of its distinct 5-gram shingles whose " +
        "FIRST corpus occurrence (min doc_id over the shingle) is the doc " +
        "itself; the 20 most derivative docs (lowest novelty) surface " +
        "near-copies that exact dedup missed, ordered before limit so ties " +
        "are stable. Same one-scan-one-exchange shape as q_text_" +
        "boilerplate: 8-byte shingle HASHES built map-side (never text " +
        "through the exchange), first-occurrence as min-over-window keyed " +
        "on the hash, then one doc rollup. A 2^-64 collision could only " +
        "mark a novel shingle as seen; the string-keyed oracle pins the " +
        "counts as identical.",
      (s, dir) => {
        val sh = Tables.spread(s, table(s, dir, "documents"))
          .select(col("doc_id"),
            explode(VectorExpr.shingleHashes(split(col("text"), " "), 5)).as("g"))
        import org.apache.spark.sql.expressions.Window
        sh.withColumn("first_doc", min(col("doc_id")).over(Window.partitionBy("g")))
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_sh"),
            sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
          .select(col("doc_id"), col("n_sh"), col("n_novel"),
            round(col("n_novel").cast("double") / col("n_sh").cast("double"), 6)
              .as("novelty"))
          .orderBy(col("novelty"), col("doc_id"))
          .limit(20)
      },
      Some(
        """WITH d AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
          |sh AS MATERIALIZED (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks)-3),
          |    i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]||' '||toks[i+3]||' '||toks[i+4]))) AS g
          |  FROM d WHERE len(toks) >= 5),
          |f AS (SELECT g, min(doc_id) AS first_doc FROM sh GROUP BY g),
          |p AS (SELECT sh.doc_id, count(*) AS n_sh,
          |    CAST(sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
          |  FROM sh JOIN f ON sh.g = f.g GROUP BY sh.doc_id)
          |SELECT doc_id, n_sh, n_novel,
          |  round(CAST(n_novel AS DOUBLE) / CAST(n_sh AS DOUBLE), 6) AS novelty
          |FROM p ORDER BY novelty, doc_id LIMIT 20""".stripMargin)),

    GraftQuery(
      "q_text_heaps",
      "Heaps'-law vocabulary growth: OLS slope of ln(cumulative vocab) " +
        "on ln(cumulative tokens) in corpus (doc_id) order — the " +
        "saturation diagnostic next to q_text_zipf's decay slope " +
        "(natural corpora grow V ≈ K·nᵝ with β ≈ 0.4–0.6; a saturated " +
        "or templated corpus flattens toward 0, as this ~31-term " +
        "fixture does). Per-token first occurrence is ONE min(doc_id) " +
        "keyed agg (vocabulary-bounded, the q_text_novelty device); " +
        "new-vocab counts land back on the doc-grain relation. BOTH " +
        "cumulative layers run BANDED TWO-PASS over band = doc_id div " +
        "1024 (the q_pack_sequences device, extended to doubles): the " +
        "integer token/vocab prefix sums shift per-band local windows " +
        "by band offsets (exact — integer addition is associative), " +
        "and the four float OLS sufficient sums over ln(ct), ln(cv) " +
        "fold sequentially per band with band subtotals folded over " +
        "the tiny band-grain relation. The oracle computes the " +
        "IDENTICAL banded float tree (non-associative doubles need the " +
        "same fold order, not just the same order of terms), so the " +
        "corpus-grain relation is never sorted into one partition on " +
        "either engine; the corpus itself is touched once.",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.types.{DoubleType, LongType}
        val docs = Tables.spread(s, table(s, dir, "documents"))
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
        val perDoc = docs.select(col("doc_id"),
          size(col("toks")).cast(LongType).as("ntok"))
        val firstNew = docs
          .select(col("doc_id"), explode(col("toks")).as("w"))
          .groupBy("w").agg(min(col("doc_id")).as("fd"))
          .groupBy(col("fd").as("doc_id")).agg(count(lit(1)).as("vnew"))
        def D(c: String) = col(c).cast(DoubleType)
        // the explicit band repartition is the SHARED exchange both passes
        // consume (ReuseExchange): the offsets aggregation and the window
        // cascade read one materialization of the doc-grain relation, and
        // neither needs a further exchange (agg and windows are both
        // band-keyed)
        val base = perDoc.join(firstNew, Seq("doc_id"), "left")
          .withColumn("vnew", coalesce(col("vnew"), lit(0L)))
          .withColumn("band", expr("doc_id div 1024"))
          .repartition(col("band"))
        val wLo = Window.partitionBy("band").orderBy("doc_id")
        val wL = wLo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wBo = Window.orderBy("band")
        val wB = wBo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // The band-LOCAL integer prefix sums come first (one in-partition
        // window pass over the shared exchange); each band's TOTAL is its
        // end row's running value, so pass 1's offsets read off the
        // band-end rows instead of a separate aggregation of the pre-window
        // relation — that aggregation pruned doc_id out of its copy of the
        // exchange subtree, making the two subtrees non-canonical and
        // killing the ReuseExchange sharing the repartition exists for.
        // Both branches now ride through the SAME window subtree (identical
        // pruning), the offsets join is null-safe (<=>, no inferred
        // IsNotNull on one side only), and the corpus is scanned and
        // tokenized exactly once. Cross-band sums are integers
        // (associative), so the fold tree the oracle mirrors is unchanged.
        val win = base
          .withColumn("rk_loc", row_number().over(wLo).cast(LongType))
          .withColumn("ct_loc", sum(col("ntok")).over(wL))
          .withColumn("cv_loc", sum(col("vnew")).over(wL))
          .withColumn("nb", count(lit(1)).over(Window.partitionBy("band")))
        val wB2 = Window.orderBy("band2")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val offsets = win.filter(col("rk_loc") === col("nb"))
          .select(col("band").as("band2"), col("ct_loc").as("ts"),
            col("cv_loc").as("vs"), col("nb").as("nbe"))
          .withColumn("ct_off", sum(col("ts")).over(wB2) - col("ts"))
          .withColumn("cv_off", sum(col("vs")).over(wB2) - col("vs"))
          .withColumn("rk_off", sum(col("nbe")).over(wB2) - col("nbe"))
          .select(col("band2"), col("ct_off"), col("cv_off"), col("rk_off"))
        // pass 2: the local prefix sums shifted by the band offsets give
        // exact global ct/cv/rk at every row; the float OLS folds stay
        // band-local and only their band-end values survive
        val ends = win.join(broadcast(offsets), col("band") <=> col("band2"))
          .drop("band2")
          .withColumn("ct", col("ct_off") + col("ct_loc"))
          .withColumn("cv", col("cv_off") + col("cv_loc"))
          .withColumn("rk", col("rk_off") + col("rk_loc"))
          .withColumn("x", log(D("ct")))
          .withColumn("y", log(D("cv")))
          .withColumn("sx", sum(col("x")).over(wL))
          .withColumn("sy", sum(col("y")).over(wL))
          .withColumn("sxy", sum(col("x") * col("y")).over(wL))
          .withColumn("sxx", sum(col("x") * col("x")).over(wL))
          .filter(col("rk_loc") === col("nb")) // band grain from here on
        val slope = (D("rk") * col("gsxy") - col("gsx") * col("gsy")) /
          (D("rk") * col("gsxx") - col("gsx") * col("gsx"))
        ends
          .withColumn("gsx", sum(col("sx")).over(wB))
          .withColumn("gsy", sum(col("sy")).over(wB))
          .withColumn("gsxy", sum(col("sxy")).over(wB))
          .withColumn("gsxx", sum(col("sxx")).over(wB))
          .withColumn("brk", row_number().over(wBo))
          .withColumn("nbands", count(lit(1)).over(
            wBo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
          .filter(col("brk") === col("nbands")) // rk here = total doc count nd
          .select(col("rk").as("n_docs"), col("cv").as("vocab"),
            col("ct").as("tokens"),
            round(slope, 6).as("heaps_beta"),
            round((col("gsy") - slope * col("gsx")) / D("rk"), 6).as("heaps_b0"))
      },
      Some(
        """WITH d AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
          |pd AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS ntok FROM d),
          |fw AS (SELECT w, min(doc_id) AS fd FROM (
          |    SELECT doc_id, unnest(toks) AS w FROM d) GROUP BY w),
          |nv AS (SELECT fd AS doc_id, count(*) AS vnew FROM fw GROUP BY fd),
          |b AS (SELECT pd.doc_id, ntok, COALESCE(vnew, 0) AS vnew,
          |    pd.doc_id // 1024 AS band
          |  FROM pd LEFT JOIN nv ON pd.doc_id = nv.doc_id),
          |ba AS (SELECT band, CAST(sum(ntok) AS BIGINT) AS ts,
          |    CAST(sum(vnew) AS BIGINT) AS vs, count(*) AS nb
          |  FROM b GROUP BY band),
          |bo AS (SELECT band, nb,
          |    CAST(sum(ts) OVER wb - ts AS BIGINT) AS ct_off,
          |    CAST(sum(vs) OVER wb - vs AS BIGINT) AS cv_off,
          |    CAST(sum(nb) OVER wb - nb AS BIGINT) AS rk_off
          |  FROM ba WINDOW wb AS (ORDER BY band ROWS UNBOUNDED PRECEDING)),
          |c AS (SELECT b.doc_id AS doc_id, b.band AS band, nb,
          |    row_number() OVER wo AS rk_loc,
          |    ct_off + sum(ntok) OVER wl AS ct,
          |    cv_off + sum(vnew) OVER wl AS cv,
          |    rk_off + row_number() OVER wo AS rk
          |  FROM b JOIN bo ON b.band = bo.band
          |  WINDOW wl AS (PARTITION BY b.band ORDER BY b.doc_id
          |                ROWS UNBOUNDED PRECEDING),
          |         wo AS (PARTITION BY b.band ORDER BY b.doc_id)),
          |xy AS (SELECT doc_id, band, nb, rk_loc, ct, cv, rk,
          |    ln(CAST(ct AS DOUBLE)) AS x, ln(CAST(cv AS DOUBLE)) AS y FROM c),
          |e AS (SELECT band, nb, rk_loc, ct, cv, rk,
          |    sum(x) OVER wl AS sx, sum(y) OVER wl AS sy,
          |    sum(x * y) OVER wl AS sxy, sum(x * x) OVER wl AS sxx
          |  FROM xy WINDOW wl AS (PARTITION BY band ORDER BY doc_id
          |                        ROWS UNBOUNDED PRECEDING)),
          |en AS (SELECT band, ct, cv, rk, sx, sy, sxy, sxx
          |  FROM e WHERE rk_loc = nb),
          |g AS (SELECT ct, cv, rk,
          |    sum(sx) OVER wb AS gsx, sum(sy) OVER wb AS gsy,
          |    sum(sxy) OVER wb AS gsxy, sum(sxx) OVER wb AS gsxx,
          |    row_number() OVER (ORDER BY band) AS brk,
          |    count(*) OVER () AS nbands
          |  FROM en WINDOW wb AS (ORDER BY band ROWS UNBOUNDED PRECEDING))
          |SELECT CAST(rk AS BIGINT) AS n_docs, CAST(cv AS BIGINT) AS vocab,
          |  CAST(ct AS BIGINT) AS tokens,
          |  round((CAST(rk AS DOUBLE) * gsxy - gsx * gsy)
          |    / (CAST(rk AS DOUBLE) * gsxx - gsx * gsx), 6) AS heaps_beta,
          |  round((gsy - ((CAST(rk AS DOUBLE) * gsxy - gsx * gsy)
          |    / (CAST(rk AS DOUBLE) * gsxx - gsx * gsx)) * gsx)
          |    / CAST(rk AS DOUBLE), 6) AS heaps_b0
          |FROM g WHERE brk = nbands""".stripMargin)),

    GraftQuery(
      "q_text_readability",
      "Flesch reading-ease panel per language: words, sentences, and a " +
        "vowel-group syllable proxy summed exactly per language, then " +
        "the Flesch formula (206.835 − 1.015·w/s − 84.6·y/w) as closed-" +
        "form doubles — the readability gate a curation pipeline runs " +
        "next to q_text_quality's surface stats. Group COUNTING uses the " +
        "marker device: regexp-replace each vowel group / sentence-" +
        "terminator run with one control char (absent from any text) and " +
        "count markers by length difference — both engines count " +
        "occurrences without any regex-extract-all materialization. All " +
        "per-document counts are exact integers; sums are associative " +
        "BIGINT; sentences are floor-smoothed to ≥1 per doc so the " +
        "ratio can never divide by zero. One map pass + one 5-group agg.",
      (s, dir) => {
        import org.apache.spark.sql.types.{DoubleType, LongType}
        val mark = "\u0007"
        def groups(c: org.apache.spark.sql.Column, pat: String) = {
          val g = regexp_replace(c, pat, mark)
          (length(g) - length(translate(g, mark, ""))).cast(LongType)
        }
        def D(c: String) = col(c).cast(DoubleType)
        val d = table(s, dir, "documents")
          .select(col("lang"),
            size(split(col("text"), " ")).cast(LongType).as("w"),
            greatest(groups(col("text"), "[.!?]+"), lit(1L)).as("sen"),
            greatest(groups(lower(col("text")), "[aeiou]+"), lit(1L)).as("syl"))
        d.groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("w")).as("words"), sum(col("sen")).as("sentences"),
            sum(col("syl")).as("syllables"))
          .select(col("lang"), col("n_docs"), col("words"), col("sentences"),
            col("syllables"),
            round(lit(206.835d) - lit(1.015d) * (D("words") / D("sentences"))
              - lit(84.6d) * (D("syllables") / D("words")), 6).as("flesch"))
          .orderBy("lang")
      },
      Some(
        """WITH d AS (SELECT lang,
          |    CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
          |    greatest(CAST(
          |      length(regexp_replace(text, '[.!?]+', chr(7), 'g'))
          |      - length(replace(regexp_replace(text, '[.!?]+', chr(7), 'g'),
          |        chr(7), '')) AS BIGINT), 1) AS sen,
          |    greatest(CAST(
          |      length(regexp_replace(lower(text), '[aeiou]+', chr(7), 'g'))
          |      - length(replace(regexp_replace(lower(text), '[aeiou]+',
          |        chr(7), 'g'), chr(7), '')) AS BIGINT), 1) AS syl
          |  FROM documents),
          |a AS (SELECT lang, count(*) AS n_docs,
          |    CAST(sum(w) AS BIGINT) AS words,
          |    CAST(sum(sen) AS BIGINT) AS sentences,
          |    CAST(sum(syl) AS BIGINT) AS syllables
          |  FROM d GROUP BY 1)
          |SELECT lang, n_docs, words, sentences, syllables,
          |  round(206.835 - 1.015 * (CAST(words AS DOUBLE)
          |      / CAST(sentences AS DOUBLE))
          |    - 84.6 * (CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE)),
          |    6) AS flesch
          |FROM a ORDER BY lang""".stripMargin)),

    GraftQuery(
      "q_text_lang_metrics",
      "Per-class precision / recall / F1 of the language-ID heuristic — " +
        "the classifier-evaluation operator over q_text_lang_id's " +
        "confusion relation (every retrieval/quality-filter model ships " +
        "with this scorecard). The prediction pass is the identical " +
        "marker-argmax; the metrics collapse the confusion cells to " +
        "per-class tp/fp/fn EXACT counts via three conditional sums, " +
        "and precision/recall/F1 are closed IEEE trees with the " +
        "zero-denominator convention 0.0 (a class never predicted has " +
        "precision 0, not NULL — both engines spell the same CASE). " +
        "Cell relation is ≤(langs+1)² rows; the corpus is touched once.",
      (s, dir) => {
        import org.apache.spark.sql.types.DoubleType
        def D(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
        val cells = langCells(s, dir)
        val classes = cells.select(col("lang").as("cls")).distinct()
        val m = classes
          .join(cells, col("cls") === col("lang") || col("cls") === col("pred"),
            "left")
          .groupBy("cls")
          .agg(
            sum(when(col("lang") === col("cls") && col("pred") === col("cls"),
              col("n")).otherwise(0L)).as("tp"),
            sum(when(col("pred") === col("cls") && col("lang") =!= col("cls"),
              col("n")).otherwise(0L)).as("fp"),
            sum(when(col("lang") === col("cls") && col("pred") =!= col("cls"),
              col("n")).otherwise(0L)).as("fn"))
        val prec = when(col("tp") + col("fp") === 0L, lit(0d))
          .otherwise(D(col("tp")) / D(col("tp") + col("fp")))
        val rec = when(col("tp") + col("fn") === 0L, lit(0d))
          .otherwise(D(col("tp")) / D(col("tp") + col("fn")))
        m.select(col("cls").as("lang"), col("tp"), col("fp"), col("fn"),
            round(prec, 6).as("precision"), round(rec, 6).as("recall"),
            when(col("tp") === 0L, lit(0d))
              .otherwise(round(lit(2d) * prec * rec / (prec + rec), 6))
              .as("f1"))
          .orderBy("lang")
      },
      Some {
        s"""WITH $langPredSql,
           |cells AS (SELECT lang, pred, count(*) AS n FROM p GROUP BY 1, 2),
           |cls AS (SELECT DISTINCT lang AS cls FROM cells),
           |m AS (SELECT cls,
           |    CAST(sum(CASE WHEN c.lang = cls AND c.pred = cls THEN n ELSE 0 END) AS BIGINT) AS tp,
           |    CAST(sum(CASE WHEN c.pred = cls AND c.lang <> cls THEN n ELSE 0 END) AS BIGINT) AS fp,
           |    CAST(sum(CASE WHEN c.lang = cls AND c.pred <> cls THEN n ELSE 0 END) AS BIGINT) AS fn
           |  FROM cls LEFT JOIN cells c ON c.lang = cls OR c.pred = cls
           |  GROUP BY 1)
           |SELECT cls AS lang, tp, fp, fn,
           |  CASE WHEN tp + fp = 0 THEN 0.0
           |    ELSE round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6) END
           |    AS precision,
           |  CASE WHEN tp + fn = 0 THEN 0.0
           |    ELSE round(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE), 6) END
           |    AS recall,
           |  CASE WHEN tp = 0 THEN 0.0
           |    ELSE round(2.0 * (CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE))
           |      * (CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE))
           |      / ((CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE))
           |        + (CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE))), 6) END
           |    AS f1
           |FROM m ORDER BY lang""".stripMargin
      })
  )
}
