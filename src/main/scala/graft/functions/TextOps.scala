package graft.functions

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text / dedup operators for the LLM-data-pipeline surface (SURVEY.md §2.11).
  *
  * Scale notes:
  *  - q_dedup_exact dedups on the full text value — at 100 TB you dedup on a
  *    content hash instead; q_dedup_first_per_key is exactly that shape
  *    (md5 → keep one representative per hash via a windowed row_number).
  *  - q_word_count's explode is a Generator (the UDTF surface): rows fan out
  *    map-side, then two-phase hash agg + TakeOrdered — no global sort.
  */
object TextOps {
  import Tables.table

  val all: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q_dedup_exact",
      "Exact dedup by full text, reduced to the unique count.",
      (s, dir) =>
        table(s, dir, "documents")
          .select("text")
          .distinct()
          .agg(count(lit(1)).as("n_unique")),
      Some("SELECT count(*) AS n_unique FROM (SELECT DISTINCT text FROM documents)")),

    GraftQuery(
      "q_dedup_first_per_key",
      "Keep the first doc per content hash (md5) — the scalable keep-one-representative dedup.",
      (s, dir) => {
        val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
        table(s, dir, "documents")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .agg(count(lit(1)).as("n"))
      },
      Some(
        "SELECT count(*) AS n FROM (SELECT doc_id, row_number() OVER " +
          "(PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM documents) WHERE rn = 1")),

    GraftQuery(
      "q_text_stats",
      "Per-language corpus stats (count / avg / max over n_chars).",
      (s, dir) =>
        table(s, dir, "documents")
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            round(avg(col("n_chars")), 4).as("avg_chars"),
            max(col("n_chars")).as("max_chars"))
          .orderBy("lang"),
      Some(
        "SELECT lang, count(*) AS n_docs, round(avg(n_chars),4) AS avg_chars, " +
          "max(n_chars) AS max_chars FROM documents GROUP BY lang ORDER BY lang")),

    GraftQuery(
      "q_word_count",
      "Top-20 token frequencies: explode (Generator/UDTF surface) → hash agg → top-k.",
      (s, dir) =>
        table(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("word"))
          .groupBy("word")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("word"))
          .limit(20),
      Some(
        "SELECT w AS word, count(*) AS n FROM (SELECT unnest(string_split(text,' ')) AS w " +
          "FROM documents) GROUP BY w ORDER BY n DESC, w LIMIT 20")),

    GraftQuery(
      "q_str_posexplode",
      "Positional explode (posexplode Generator): tokens with their 0-based " +
        "ordinal — the UDTF-with-ordinality surface. Oracle uses DuckDB's " +
        "aligned multi-unnest (range zips with the token list).",
      (s, dir) =>
        table(s, dir, "documents")
          .select(col("doc_id"), posexplode(split(col("text"), " ")))
          .toDF("doc_id", "pos", "w")
          .orderBy("doc_id", "pos")
          .limit(1000),
      Some(
        "SELECT doc_id, pos, w FROM (SELECT doc_id, " +
          "CAST(unnest(range(len(string_split(text,' ')))) AS INT) AS pos, " +
          "unnest(string_split(text,' ')) AS w FROM documents) " +
          "ORDER BY doc_id, pos LIMIT 1000")),

    GraftQuery(
      "q_split_assign",
      "Deterministic train/val/test split assignment (90/5/5) by content-free id " +
        "hash (md5 prefix mod 100) — the reproducible dataset-split staple: same " +
        "doc always lands in the same split, on any engine, at any partitioning, " +
        "with no stored split column. Output = per-(lang, split) counts.",
      (s, dir) =>
        table(s, dir, "documents")
          .withColumn("b",
            pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
              .cast("int"), lit(100)))
          .withColumn("split",
            when(col("b") < 90, "train").when(col("b") < 95, "val").otherwise("test"))
          .groupBy("lang", "split")
          .agg(count(lit(1)).as("n"))
          .orderBy("lang", "split"),
      Some(
        """SELECT lang, split, count(*) AS n FROM (
          |  SELECT lang, CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split
          |  FROM (SELECT lang, CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,4) AS INTEGER) % 100 AS b
          |        FROM documents))
          |GROUP BY lang, split ORDER BY lang, split""".stripMargin))
  )
}
