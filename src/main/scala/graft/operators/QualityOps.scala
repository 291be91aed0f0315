package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Data-quality operators (round 12): the declarative constraint ledger
  * (the dbt-test / expectations primitive every warehouse migration runs
  * first) and blocked fuzzy near-duplicate detection by edit distance.
  *
  * Scale notes: every constraint is a count over one scan, one hash agg, or
  * one anti join — the three shapes that parallelize trivially; the ledger
  * union is rows-of-one. The fuzzy pairs are block-bounded (lang × length
  * bucket), never corpus-quadratic, and the edit distance runs on a fixed
  * 40-char prefix so the per-pair cost is O(40²) regardless of document
  * length.
  */
object QualityOps {
  import Tables.table

  val all: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q_quality_constraints",
      "Declarative constraint census over the star schema — the " +
        "data-quality assertion battery (primary-key uniqueness, two " +
        "foreign-key orphan checks, a domain range, a sign rule, a " +
        "cross-table date ordering) evaluated in ONE pass each and " +
        "unioned into the (constraint, n_checked, n_violations) ledger " +
        "that CI gates read. PK duplication counts Σ(c−1) over duplicated " +
        "keys (0 rows lost to sampling); orphan checks are LEFT joins " +
        "counting null hits — one pass yields BOTH n_checked and the " +
        "violation count (an anti join would need a second scan for the " +
        "denominator) — broadcast for the dim side, shuffle for " +
        "fact-fact; the date-order check joins lineitem to orders once. " +
        "All-integer counts; each leg is scan→agg or scan→join→agg, " +
        "nothing quadratic.",
      (s, dir) => {
        val orders = table(s, dir, "orders")
        val lineitem = table(s, dir, "lineitem")
        val customer = table(s, dir, "customer")
        def ledger(name: String, checked: org.apache.spark.sql.DataFrame,
                   violations: org.apache.spark.sql.Column) =
          checked.agg(count(lit(1)).as("n_checked"),
              coalesce(violations, lit(0L)).as("n_violations"))
            .select(lit(name).as("constraint_name"), col("n_checked"),
              col("n_violations"))
        val pkDup = orders.groupBy("o_orderkey").agg(count(lit(1)).as("c"))
          .agg(count(lit(1)).as("n_checked"),
            sum(col("c") - 1).as("n_violations"))
          .select(lit("orders.pk_unique").as("constraint_name"),
            col("n_checked"), col("n_violations"))
        val lineChecked = lineitem
          .join(orders.select(col("o_orderkey").as("k"), lit(1L).as("hit")),
            col("l_orderkey") === col("k"), "left")
          .agg(count(lit(1)).as("n_checked"),
            sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_violations"))
          .select(lit("lineitem.order_fk").as("constraint_name"),
            col("n_checked"), col("n_violations"))
        val custChecked = orders
          .join(broadcast(customer.select(col("c_custkey").as("k"),
            lit(1L).as("hit"))), col("o_custkey") === col("k"), "left")
          .agg(count(lit(1)).as("n_checked"),
            sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_violations"))
          .select(lit("orders.customer_fk").as("constraint_name"),
            col("n_checked"), col("n_violations"))
        val qtyRange = ledger("lineitem.qty_range", lineitem,
          sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
            .otherwise(0L)))
        val pricePos = ledger("orders.totalprice_positive", orders,
          sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)))
        val dateOrder = lineitem
          .join(orders.select(col("o_orderkey").as("k"), col("o_orderdate")),
            col("l_orderkey") === col("k"))
          .agg(count(lit(1)).as("n_checked"),
            sum(when(col("l_shipdate") < col("o_orderdate"), 1L).otherwise(0L))
              .as("n_violations"))
          .select(lit("lineitem.ship_after_order").as("constraint_name"),
            col("n_checked"), col("n_violations"))
        pkDup.unionByName(lineChecked).unionByName(custChecked)
          .unionByName(qtyRange).unionByName(pricePos).unionByName(dateOrder)
          .orderBy("constraint_name")
      },
      Some(
        """SELECT * FROM (
          |  SELECT 'orders.pk_unique' AS constraint_name,
          |    count(*) AS n_checked,
          |    CAST(sum(c - 1) AS BIGINT) AS n_violations
          |  FROM (SELECT o_orderkey, count(*) AS c FROM orders GROUP BY 1)
          |  UNION ALL
          |  SELECT 'lineitem.order_fk', count(*),
          |    CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
          |  UNION ALL
          |  SELECT 'orders.customer_fk', count(*),
          |    CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
          |  UNION ALL
          |  SELECT 'lineitem.qty_range', count(*),
          |    CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT)
          |  FROM lineitem
          |  UNION ALL
          |  SELECT 'orders.totalprice_positive', count(*),
          |    CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
          |  FROM orders
          |  UNION ALL
          |  SELECT 'lineitem.ship_after_order', count(*),
          |    CAST(sum(CASE WHEN l.l_shipdate < o.o_orderdate THEN 1 ELSE 0 END) AS BIGINT)
          |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          |) ORDER BY constraint_name""".stripMargin)),

    GraftQuery(
      "q_dedup_fuzzy_block",
      "Blocked fuzzy near-duplicate detection by EDIT distance — the " +
        "typo-tolerant dedup the token/shingle family (exact, minhash, " +
        "simhash, jaccard) cannot see: Levenshtein over the 40-char " +
        "prefix, candidate pairs restricted to (lang, ⌊n_chars/32⌋) " +
        "blocks so the comparison count is Σ(block size)² — " +
        "length-and-language blocking is the classical entity-resolution " +
        "move, and a true near-dup pair can only cross one length-bucket " +
        "boundary, which the census tolerates by design (it reports " +
        "closest-pair structure, not a closed dedup set). Reports the 10 " +
        "closest ordered pairs, fully tie-broken; the prefix cap makes " +
        "the per-pair cost O(40²) at any document length. Both engines " +
        "implement standard Levenshtein — an integer dynamic program " +
        "with no float anywhere.",
      (s, dir) => {
        // spreadWide (full defaultParallelism), not the data-sized spread:
        // this relation's partitioning decides the PAIR join's probe-side
        // parallelism, and the Σ(block²) Levenshtein DP work downstream
        // dwarfs per-row costs (r16 ConfProbe: 0.19 s wide vs 0.45 s at
        // the parse width); the checkpoint also keeps the plan from
        // re-deriving the prefix relation per side
        val d = graft.Tables.spreadWide(s, table(s, dir, "documents")
            .select(col("doc_id"), col("lang"),
              call_function("div", col("n_chars"), lit(32L)).as("blk"),
              substring(col("text"), 1, 40).as("pfx")))
          .localCheckpoint(true)
        val a = d.select(col("lang"), col("blk"), col("doc_id").as("ida"),
          col("pfx").as("pa"))
        val b = d.select(col("lang").as("lang_b"), col("blk").as("blk_b"),
          col("doc_id").as("idb"), col("pfx").as("pb"))
        a.join(b, col("lang") === col("lang_b") && col("blk") === col("blk_b")
            && col("ida") < col("idb"))
          .select(col("ida"), col("idb"),
            levenshtein(col("pa"), col("pb")).cast(LongType).as("dist"))
          .orderBy(col("dist"), col("ida"), col("idb"))
          .limit(10)
      },
      Some(
        """WITH d AS (SELECT doc_id, lang, n_chars // 32 AS blk,
          |    substr(text, 1, 40) AS pfx FROM documents),
          |p AS (SELECT a.doc_id AS ida, b.doc_id AS idb,
          |    CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS dist
          |  FROM d a JOIN d b
          |    ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id)
          |SELECT ida, idb, dist FROM p
          |ORDER BY dist, ida, idb LIMIT 10""".stripMargin)),

    GraftQuery(
      "q_profile_columns",
      "ANALYZE-style column profile of the orders table — per column: " +
        "row count, null count, EXACT distinct count, min/max, mean " +
        "string length — the statistics every catalog/optimizer ingest " +
        "job and every data-discovery UI runs first. One pruned scan per " +
        "column leg (each leg's parquet read touches exactly its own " +
        "column; the fused 5-way multi-distinct alternative plans " +
        "through a 5× Expand into ONE wide aggregation and measured 3× " +
        "slower here — per-column passes also match how profilers " +
        "schedule at scale: column legs parallelize as independent " +
        "jobs). Exact NDV via count(distinct) (the approximate twin is " +
        "the q_agg_approx_distinct family); money profiled in integer " +
        "CENTS so min/max render identically on both engines; the " +
        "ledger union is rows-of-one.",
      (s, dir) => {
        def D(c: org.apache.spark.sql.Column) = c.cast("double")
        val o = table(s, dir, "orders")
        def leg(name: String, c: org.apache.spark.sql.Column,
                strLen: Boolean) =
          o.agg(count(lit(1)).as("n_rows"),
              sum(when(c.isNull, 1L).otherwise(0L)).as("n_null"),
              countDistinct(c).as("ndv"),
              min(c).cast("string").as("min_s"),
              max(c).cast("string").as("max_s"),
              (if (strLen) round(sum(length(c.cast("string"))).cast("double") /
                D(count(c)), 6) else lit(null).cast("double")).as("avg_len"))
            .select(lit(name).as("col_name"), col("n_rows"), col("n_null"),
              col("ndv"), col("min_s"), col("max_s"), col("avg_len"))
        leg("o_orderkey", col("o_orderkey"), strLen = false)
          .unionByName(leg("o_custkey", col("o_custkey"), strLen = false))
          .unionByName(leg("o_totalprice_cents",
            floor(col("o_totalprice") * 100 + lit(0.5d)).cast(LongType),
            strLen = false))
          .unionByName(leg("o_orderstatus", col("o_orderstatus"), strLen = true))
          .unionByName(leg("o_orderpriority", col("o_orderpriority"),
            strLen = true))
          .orderBy("col_name")
      },
      Some(
        """SELECT * FROM (
          |  SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
          |    CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
          |    count(DISTINCT o_orderkey) AS ndv,
          |    CAST(min(o_orderkey) AS VARCHAR) AS min_s,
          |    CAST(max(o_orderkey) AS VARCHAR) AS max_s,
          |    CAST(NULL AS DOUBLE) AS avg_len
          |  FROM orders
          |  UNION ALL
          |  SELECT 'o_custkey', count(*),
          |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          |    count(DISTINCT o_custkey),
          |    CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR),
          |    CAST(NULL AS DOUBLE)
          |  FROM orders
          |  UNION ALL
          |  SELECT 'o_totalprice_cents', count(*),
          |    CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          |    count(DISTINCT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)),
          |    CAST(min(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS VARCHAR),
          |    CAST(max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS VARCHAR),
          |    CAST(NULL AS DOUBLE)
          |  FROM orders
          |  UNION ALL
          |  SELECT 'o_orderstatus', count(*),
          |    CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          |    count(DISTINCT o_orderstatus),
          |    min(o_orderstatus), max(o_orderstatus),
          |    round(CAST(sum(length(o_orderstatus)) AS DOUBLE)
          |      / CAST(count(o_orderstatus) AS DOUBLE), 6)
          |  FROM orders
          |  UNION ALL
          |  SELECT 'o_orderpriority', count(*),
          |    CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          |    count(DISTINCT o_orderpriority),
          |    min(o_orderpriority), max(o_orderpriority),
          |    round(CAST(sum(length(o_orderpriority)) AS DOUBLE)
          |      / CAST(count(o_orderpriority) AS DOUBLE), 6)
          |  FROM orders
          |) ORDER BY col_name""".stripMargin)),

    GraftQuery(
      "q_text_feature_hash",
      "Hashing-trick featurization per language — the fixed-width " +
        "vocabulary-free featurizer (256 signed buckets) every scale " +
        "text pipeline reaches for when the vocabulary won't fit a " +
        "dictionary: bucket = md5₅₂(token) mod 256, sign from the next " +
        "hash bit, mass = signed token-count sum. Hashing runs on the " +
        "VOCABULARY-grain (lang, token, count) relation — the single-" +
        "tokenize discipline — so the md5 cost is vocabulary-sized, not " +
        "corpus-sized, and the signed masses are exact BIGINTs. Reports " +
        "each language's 5 heaviest buckets by |mass|, fully tie-broken. " +
        "No RNG, no engine-specific hash: the same feature vector " +
        "materializes anywhere.",
      (s, dir) => {
        val vocab = table(s, dir, "documents")
          .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
          .groupBy("lang", "tok").agg(count(lit(1)).as("c"))
        val h = conv(substring(md5(col("tok")), 1, 13), 16, 10).cast(LongType)
        val scored = vocab
          .select(col("lang"), pmod(h, lit(256L)).as("bucket"),
            (when(pmod(call_function("div", h, lit(256L)), lit(2L)) === 0L,
              lit(1L)).otherwise(lit(-1L)) * col("c")).as("m"))
          .groupBy("lang", "bucket").agg(sum(col("m")).as("mass"))
        scored
          .withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("lang")
              .orderBy(abs(col("mass")).desc, col("bucket"))).cast(LongType))
          .filter(col("rk") <= 5)
          .select(col("lang"), col("rk"), col("bucket"), col("mass"))
          .orderBy("lang", "rk")
      },
      Some(
        """WITH vocab AS (
          |  SELECT lang, tok, count(*) AS c FROM (
          |    SELECT lang, unnest(string_split(text, ' ')) AS tok
          |    FROM documents)
          |  GROUP BY 1, 2),
          |h AS (SELECT lang,
          |    CAST(CAST('0x' || substr(md5(tok), 1, 13) AS UBIGINT) AS BIGINT) AS hv,
          |    c
          |  FROM vocab),
          |b AS (SELECT lang, hv % 256 AS bucket,
          |    CAST(sum(CASE WHEN (hv // 256) % 2 = 0 THEN c ELSE -c END) AS BIGINT)
          |      AS mass
          |  FROM h GROUP BY 1, 2),
          |r AS (SELECT lang, bucket, mass,
          |    CAST(row_number() OVER (PARTITION BY lang
          |      ORDER BY abs(mass) DESC, bucket) AS BIGINT) AS rk
          |  FROM b)
          |SELECT lang, rk, bucket, mass FROM r WHERE rk <= 5
          |ORDER BY lang, rk""".stripMargin)),

    GraftQuery(
      "q_text_bm25",
      "BM25 retrieval scoring (k1=1.2, b=0.75, Lucene idf) for the " +
        "3-term query {join, hash, vector} — the ranking function " +
        "standing behind every lexical search index, next to q_text_tfidf's " +
        "weighting. All inputs are exact integers (tf, df, N, doc " +
        "length); avgdl is one division; each term's score is a closed " +
        "IEEE tree, and the 3-term sum is an EXPLICIT fixed-order " +
        "addition of three pivoted columns (a float SUM over join rows " +
        "would fold in partition order). Corpus stats ride broadcast " +
        "1-row scalars; the tf relation is term-filtered BEFORE the " +
        "aggregation, so the scoring pass touches only matching " +
        "postings — the inverted-index access pattern. Top-10 by " +
        "(score, doc_id), fully tie-broken.",
      (s, dir) => {
        import org.apache.spark.sql.types.DoubleType
        def D(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
        val terms = Seq("join", "hash", "vector")
        val docs = table(s, dir, "documents")
        val dl = docs.select(col("doc_id"),
          size(split(col("text"), " ")).cast(LongType).as("dl"))
        val stats = dl.agg(count(lit(1)).as("n_docs"),
          (sum(col("dl")).cast(DoubleType) /
            count(lit(1)).cast(DoubleType)).as("avgdl"))
        val tf = docs
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .filter(col("tok").isin(terms: _*))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
        val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
        val idf = log(lit(1d) + (D(col("n_docs")) - D(col("df")) + lit(0.5d)) /
          (D(col("df")) + lit(0.5d)))
        val termScore = idf * D(col("tf")) * lit(2.2d) /
          (D(col("tf")) + lit(1.2d) *
            (lit(0.25d) + lit(0.75d) * D(col("dl")) / col("avgdl")))
        val scored = tf
          .join(broadcast(df), "tok")
          .join(dl, "doc_id")
          .join(broadcast(stats))
          .select(col("doc_id"), col("tok"), termScore.as("s"))
        scored.groupBy("doc_id")
          .agg(min(when(col("tok") === "join", col("s"))).as("s1"),
            min(when(col("tok") === "hash", col("s"))).as("s2"),
            min(when(col("tok") === "vector", col("s"))).as("s3"))
          .select(col("doc_id"),
            round(coalesce(col("s1"), lit(0d)) + coalesce(col("s2"), lit(0d)) +
              coalesce(col("s3"), lit(0d)), 6).as("bm25"))
          .orderBy(col("bm25").desc, col("doc_id"))
          .limit(10)
      },
      Some(
        """WITH dl AS (SELECT doc_id,
          |    CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
          |  FROM documents),
          |st AS (SELECT count(*) AS n_docs,
          |    CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
          |  FROM dl),
          |tf AS (SELECT doc_id, tok, count(*) AS tf FROM (
          |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          |    FROM documents)
          |  WHERE tok IN ('join', 'hash', 'vector') GROUP BY 1, 2),
          |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
          |sc AS (SELECT t.doc_id, t.tok,
          |    ln(1.0 + (CAST(st.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5)
          |      / (CAST(d.df AS DOUBLE) + 0.5))
          |    * CAST(t.tf AS DOUBLE) * 2.2
          |    / (CAST(t.tf AS DOUBLE)
          |      + 1.2 * (0.25 + 0.75 * CAST(l.dl AS DOUBLE) / st.avgdl)) AS s
          |  FROM tf t JOIN df d ON t.tok = d.tok
          |  JOIN dl l ON t.doc_id = l.doc_id CROSS JOIN st),
          |p AS (SELECT doc_id,
          |    min(CASE WHEN tok = 'join' THEN s END) AS s1,
          |    min(CASE WHEN tok = 'hash' THEN s END) AS s2,
          |    min(CASE WHEN tok = 'vector' THEN s END) AS s3
          |  FROM sc GROUP BY 1)
          |SELECT doc_id,
          |  round(coalesce(s1, 0.0) + coalesce(s2, 0.0) + coalesce(s3, 0.0), 6)
          |    AS bm25
          |FROM p ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin)),

    GraftQuery(
      "q_text_chunk_plan",
      "Context-window chunking plan per language — the RAG/pretraining " +
        "chunker's ledger for 64-token windows at stride 48 (16-token " +
        "overlap): documents, token mass, chunk count " +
        "⌈max(n−64,0)/48⌉+1, overlap mass 16·(chunks−1), and padding " +
        "mass 64·chunks − tokens − overlap (what the last partial window " +
        "wastes). Everything is per-doc integer arithmetic folded by one " +
        "hash aggregation — the whole plan costs one tokenize-count " +
        "pass; the one division (chunks per doc) is the final IEEE op. " +
        "Sister to q_pack_sequences, which actually materializes packed " +
        "sequences — this is the planner that sizes that job.",
      (s, dir) => {
        def D(c: org.apache.spark.sql.Column) = c.cast("double")
        val nTok = size(split(col("text"), " ")).cast(LongType)
        val over = greatest(nTok - 64L, lit(0L))
        val nChunks = call_function("div", over + 47L, lit(48L)) + 1L
        table(s, dir, "documents")
          .select(col("lang"), nTok.as("n_tok"), nChunks.as("n_chunks"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok")).as("tokens"),
            sum(col("n_chunks")).as("chunks"),
            sum((col("n_chunks") - 1) * 16).as("overlap_tokens"),
            sum(col("n_chunks") * 64 - col("n_tok") -
              (col("n_chunks") - 1) * 16).as("pad_tokens"))
          .select(col("lang"), col("n_docs"), col("tokens"), col("chunks"),
            col("overlap_tokens"), col("pad_tokens"),
            round(D(col("chunks")) / D(col("n_docs")), 6).as("chunks_per_doc"))
          .orderBy("lang")
      },
      Some(
        """WITH d AS (SELECT lang,
          |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
          |  FROM documents),
          |c AS (SELECT lang, n_tok,
          |    (CASE WHEN n_tok > 64 THEN n_tok - 64 ELSE 0 END + 47) // 48 + 1
          |      AS n_chunks
          |  FROM d),
          |a AS (SELECT lang, count(*) AS n_docs,
          |    CAST(sum(n_tok) AS BIGINT) AS tokens,
          |    CAST(sum(n_chunks) AS BIGINT) AS chunks,
          |    CAST(sum((n_chunks - 1) * 16) AS BIGINT) AS overlap_tokens,
          |    CAST(sum(n_chunks * 64 - n_tok - (n_chunks - 1) * 16) AS BIGINT)
          |      AS pad_tokens
          |  FROM c GROUP BY 1)
          |SELECT lang, n_docs, tokens, chunks, overlap_tokens, pad_tokens,
          |  round(CAST(chunks AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
          |    AS chunks_per_doc
          |FROM a ORDER BY lang""".stripMargin))
  )
}
