package graft.sources

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Non-parquet batch sources under the ORACLE gate (SURVEY.md §2.1): the
  * documents table is exported once per (session, sf-dir) to CSV and JSON
  * scratch directories, and the gated queries aggregate over a read of THAT
  * export — so the driver's DuckDB compare (which reads the original parquet)
  * verifies the full write→read round-trip of each format, not just that the
  * reader doesn't throw. SourcesSpec covers schema fidelity; these cover
  * value fidelity end-to-end.
  *
  * Scale note: CSV/JSON are ingest/interchange formats here, not the storage
  * layer — both are row-major and schema-on-read. The engine's storage answer
  * remains columnar parquet (pushdown, pruning, bucketing).
  */
object FormatSources {

  /** Avro datasource provider by class name — see the export-side comment. */
  val AvroProvider = "org.apache.spark.sql.avro.AvroFileFormat"

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** One export per (session, dir, format) — memoized like the streaming
    * drop-dir so bench samples time the read, not a redundant re-export. */
  private val exports =
    graft.Tables.registerSessionScoped(new java.util.concurrent.ConcurrentHashMap[(Long, String, String), String]())

  private def exportDir(s: SparkSession, dir: String, fmt: String): String =
    exports.computeIfAbsent((Tables.sessionId(s), dir, fmt), _ => {
      val out = graft.TempReaper.add(
        graft.Scratch.dir(s"graft_src_$fmt"))
      val docs = Tables.table(s, dir, "documents")
      fmt match {
        // escape pinned to '"' (RFC-4180 doubled quotes) on BOTH write and
        // read, and the read side is multiLine-capable: without these, text
        // containing an embedded newline or a backslash-quote sequence would
        // round-trip through the default writer into sheared/regrouped rows.
        // The current fixtures contain neither — the options make the query
        // robust to fixture changes instead of relying on that invariant.
        case "csv" => docs.write.mode("overwrite")
          .option("header", "true").option("escape", "\"").csv(out)
        case "json" => docs.write.mode("overwrite").json(out)
        // columnar-but-not-parquet: schema travels in the file, no options
        case "orc" => docs.write.mode("overwrite").orc(out)
        // row-major with an embedded schema — the streaming-interchange
        // format (Kafka payloads, schema-registry pipelines). FQCN provider:
        // this distribution bundles the avro classes in spark-sql but not
        // the service-loader shortname registration, so format("avro")
        // resolves only through the class name.
        case "avro" => docs.write.mode("overwrite").format(AvroProvider).save(out)
        // document-markup interchange (feeds/exports); built into Spark 4
        // core — rowTag is mandatory on write, and values round-trip
        // through XML entity escaping
        case "xml" => docs.write.mode("overwrite")
          .option("rootTag", "docs").option("rowTag", "doc").format("xml").save(out)
      }
      out
    })

  /** Raw-file drop directory for the binaryFile source: the first 20
    * documents written as individual `doc_<id>.bin` files (UTF-8 bytes),
    * once per (session, dir) — the ingest layout multimodal corpora
    * actually arrive in (one object per image/audio/page), read back
    * through Spark's binaryFile source. The export is a driver-side loop
    * over a 20-row fixture slice; production exports land via a
    * distributed writer, but the SOURCE under test is the read path. */
  private def binaryDir(s: SparkSession, dir: String): String =
    exports.computeIfAbsent((Tables.sessionId(s), dir, "bin"), _ => {
      val out = graft.TempReaper.add(graft.Scratch.dir("graft_src_bin"))
      Tables.table(s, dir, "documents")
        .filter(col("doc_id") < 20)
        .select(col("doc_id"), col("text"))
        .collect()
        .foreach { r =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(out, f"doc_${r.getLong(0)}%05d.bin"),
            r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
      out
    })

  /** Build (or confirm) every format export for this (session, dir) — the
    * hook Bench uses to time the one-time exports as a separately reported
    * artifact step. */
  private[graft] def ensureExports(s: SparkSession, dir: String): Unit = {
    Seq("csv", "json", "orc", "avro", "xml").foreach(exportDir(s, dir, _))
    partitionedDir(s, dir)
    timePartitionedDir(s, dir)
    compactedDir(s, dir)
    evolutionDir(s, dir)
    malformedDir(s, dir)
    binaryDir(s, dir); ()
  }

  /** Two-generation parquet lake with SCHEMA DRIFT, written once per
    * (session, dir): generation 1 (even doc_ids) predates the `source`
    * column; generation 2 (odd doc_ids) carries the full schema. The layout
    * every long-lived archive grows into — old files are never rewritten
    * when a column lands. */
  private def evolutionDir(s: SparkSession, dir: String): String =
    exports.computeIfAbsent((Tables.sessionId(s), dir, "evo"), _ => {
      val out = graft.TempReaper.add(
        graft.Scratch.dir("graft_src_evo"))
      val docs = Tables.table(s, dir, "documents")
      docs.filter(pmod(col("doc_id"), lit(2)) === 0)
        .select("doc_id", "text", "lang", "n_chars")
        .write.mode("overwrite").parquet(out + "/gen=1")
      docs.filter(pmod(col("doc_id"), lit(2)) === 1)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(out + "/gen=2")
      out
    })

  /** CSV with deterministically injected malformed lines (doc_id % 10 == 3
    * rows rendered as a single unparseable token), written once per
    * (session, dir) — the PERMISSIVE-ingest fixture. Real feeds carry bad
    * rows; an engine that can only FAILFAST on them cannot ingest at all. */
  private def malformedDir(s: SparkSession, dir: String): String =
    exports.computeIfAbsent((Tables.sessionId(s), dir, "bad"), _ => {
      val out = graft.TempReaper.add(
        graft.Scratch.dir("graft_src_bad"))
      // the corruption hits a REQUIRED column's cast (n_chars = 'x'): with
      // CSV column pruning, missing TRAILING tokens alone are not flagged
      // as malformed, but an uncastable required field always is
      Tables.table(s, dir, "documents")
        .select(when(pmod(col("doc_id"), lit(10)) === 3,
            concat(lit("bad_"), col("doc_id"), lit(",??,x")))
          .otherwise(concat_ws(",",
            col("doc_id"), col("lang"), col("n_chars"))).as("value"))
        .write.mode("overwrite").text(out)
      out
    })

  /** Hive-partitioned parquet copy of documents, written once per
    * (session, dir) — shared by q_source_partitioned and ensureExports. */
  private def partitionedDir(s: SparkSession, dir: String): String =
    exports.computeIfAbsent((Tables.sessionId(s), dir, "part"), _ => {
      val out = graft.TempReaper.add(
        graft.Scratch.dir("graft_src_part"))
      Tables.table(s, dir, "documents")
        .write.mode("overwrite").partitionBy("lang").parquet(out)
      out
    })

  /** Day-partitioned events archive (day=YYYY-MM-DD directories) — the
    * on-disk shape of a production packet/event archive (docs/SCALE.md
    * "partitioned by time"); write-once like every export. */
  private def timePartitionedDir(s: SparkSession, dir: String): String =
    exports.computeIfAbsent((Tables.sessionId(s), dir, "tpart"), _ => {
      val out = graft.TempReaper.add(
        graft.Scratch.dir("graft_src_tpart"))
      Tables.table(s, dir, "events")
        .withColumn("day", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("day").parquet(out)
      out
    })

  /** Retention + compaction pass over the day-partitioned archive: keep the
    * last 15 days, rewrite each surviving day into ONE file (repartition on
    * the partition column before the partitioned write). Write-once like
    * every export — in production this is the nightly maintenance job
    * (expire old partitions, defragment small ingest files); the gated
    * query proves the rewrite lost and duplicated nothing. */
  private[graft] def compactedDir(s: SparkSession, dir: String): String =
    exports.computeIfAbsent((Tables.sessionId(s), dir, "compact"), _ => {
      val out = graft.TempReaper.add(
        graft.Scratch.dir("graft_src_compact"))
      s.read.parquet(timePartitionedDir(s, dir))
        .filter(col("day") >= lit("2024-01-16"))
        .repartition(col("day"))
        .write.mode("overwrite").partitionBy("day").parquet(out)
      out
    })

  /** Shared aggregation over whichever reader produced `docs` — counts and an
    * exact integral sum per language. The oracle's sum(BIGINT) is cast back
    * to BIGINT (DuckDB widens integer sums to HUGEINT, the q_ts_session
    * lesson). */
  private def langStats(docs: org.apache.spark.sql.DataFrame) =
    docs.groupBy("lang")
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"),
        // TEXT-derived aggregate: without it the round-trip gate never read
        // the one column with escaping/trimming hazards, so a reader that
        // sheared or trimmed text while preserving rows and n_chars passed
        // as "value-exact" (r13 review)
        sum(length(col("text"))).as("text_chars"))
      .orderBy("lang")

  private val langStatsSql =
    "SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars, " +
      "CAST(sum(length(text)) AS BIGINT) AS text_chars " +
      "FROM documents GROUP BY lang ORDER BY lang"

  val all: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q_source_csv",
      "Aggregate over a CSV export of documents (explicit schema, quoted text) — " +
        "oracle compares against the original parquet, verifying the CSV " +
        "write→read round-trip value-exactly.",
      (s, dir) =>
        langStats(s.read.schema(docSchema).option("header", "true")
          .option("escape", "\"").option("multiLine", "true")
          .csv(exportDir(s, dir, "csv"))),
      Some(langStatsSql)),

    GraftQuery(
      "q_source_json",
      "Aggregate over a JSON-lines export of documents (explicit schema) — " +
        "oracle compares against the original parquet.",
      (s, dir) =>
        langStats(s.read.schema(docSchema).json(exportDir(s, dir, "json"))),
      Some(langStatsSql)),

    GraftQuery(
      "q_source_orc",
      "Aggregate over an ORC export of documents — the second columnar " +
        "format (vectorized reader, embedded schema, predicate pushdown like " +
        "parquet); oracle compares against the original parquet, verifying " +
        "the ORC write→read round-trip value-exactly.",
      (s, dir) => langStats(s.read.orc(exportDir(s, dir, "orc"))),
      Some(langStatsSql)),

    GraftQuery(
      "q_source_avro",
      "Aggregate over an Avro export of documents — the row-major interchange " +
        "format with an embedded schema (Kafka/schema-registry pipelines); " +
        "oracle compares against the original parquet, verifying the Avro " +
        "write→read round-trip value-exactly. Same write-once export " +
        "discipline as CSV/JSON/ORC.",
      (s, dir) => langStats(s.read.format(AvroProvider).load(exportDir(s, dir, "avro"))),
      Some(langStatsSql)),

    GraftQuery(
      "q_source_xml",
      "Aggregate over an XML export of documents (rowTag records) — the " +
        "document-markup interchange format, built into Spark 4 core; " +
        "values round-trip through entity escaping, and the read supplies " +
        "the explicit schema (no inference scan). Oracle compares against " +
        "the original parquet, verifying the XML write→read round-trip " +
        "value-exactly — same write-once export discipline as CSV/JSON/" +
        "ORC/Avro.",
      (s, dir) => langStats(s.read.schema(docSchema)
        .option("rowTag", "doc").format("xml").load(exportDir(s, dir, "xml"))),
      Some(langStatsSql)),

    GraftQuery(
      "q_source_time_partitioned",
      "Time-bounded query over the day-partitioned events archive " +
        "(day=YYYY-MM-DD directories — the production packet-archive " +
        "layout): a 3-day range predicate on the partition column is " +
        "satisfied by DIRECTORY pruning, zero non-matching files opened " +
        "(PartitionFilters, pinned in PlanShapeSpec) — the dominant " +
        "predicate shape in time-series archives, where at 100 TB this is " +
        "the difference between scanning 3 days and scanning 10 years. " +
        "Exact integer-cent money mass per event_type; the oracle derives " +
        "the same range from raw ts.",
      (s, dir) => {
        s.read.parquet(timePartitionedDir(s, dir))
          .filter(col("day") >= lit("2024-01-05") && col("day") <= lit("2024-01-07"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents_sum"))
          .orderBy("event_type")
      },
      Some(
        """SELECT event_type, count(*) AS n,
          |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents_sum
          |FROM events
          |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-05' AND DATE '2024-01-07'
          |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    GraftQuery(
      "q_maintain_compact",
      "Retention + compaction maintenance gated end-to-end: the archive's " +
        "last 15 days survive a rewrite that defragments every day " +
        "partition into one file (repartition on the partition column " +
        "before the partitioned write — at 100 TB this is the nightly job " +
        "that keeps file counts sane and scan setup O(days), and the " +
        "retention filter is a directory-level delete, no data scan). The " +
        "gate aggregates the COMPACTED archive and the oracle recomputes " +
        "from raw events — any row lost, duplicated, or mis-partitioned " +
        "by the rewrite breaks the hash. Per-day exact fingerprints plus " +
        "the retained-day count.",
      (s, dir) => {
        val c = s.read.parquet(compactedDir(s, dir))
        c.groupBy("day")
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"),
            sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents_sum"))
          .orderBy("day")
      },
      Some(
        """SELECT CAST(ts AS DATE) AS day, count(*) AS n,
          |  count(DISTINCT user_id) AS n_users,
          |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents_sum
          |FROM events
          |WHERE CAST(ts AS DATE) >= DATE '2024-01-16'
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    GraftQuery(
      "q_source_dpp",
      "DYNAMIC partition pruning over the day-partitioned archive: the " +
        "busiest-5 purchase days (a dim relation only known at runtime) " +
        "broadcast-join the partitioned fact on the partition column, and " +
        "Catalyst injects a dynamicpruning subquery into the fact scan — " +
        "only the 5 matching day directories are read, decided AT RUN " +
        "TIME (pinned in PlanShapeSpec). This is the star-schema date-dim " +
        "pattern every warehouse query at 100 TB depends on: static " +
        "pruning can't help when the day set comes from data. Exact " +
        "per-day fingerprints; fully tie-broken dim selection.",
      (s, dir) => {
        val archive = s.read.parquet(timePartitionedDir(s, dir))
        val busiest = Tables.table(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("np"))
          .orderBy(col("np").desc, col("d"))
          .limit(5)
          .select(col("d"), col("np"))
        archive.join(broadcast(busiest), archive("day") === busiest("d"))
          .groupBy("day")
          .agg(count(lit(1)).as("n_events"),
            max(col("np")).as("n_purchases"),
            sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents_sum"))
          .orderBy("day")
      },
      Some(
        """WITH busiest AS (
          |  SELECT CAST(ts AS DATE) AS d, count(*) AS np
          |  FROM events WHERE event_type = 'purchase'
          |  GROUP BY 1 ORDER BY np DESC, d LIMIT 5)
          |SELECT CAST(e.ts AS DATE) AS day, count(*) AS n_events,
          |  CAST(max(b.np) AS BIGINT) AS n_purchases,
          |  CAST(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents_sum
          |FROM events e JOIN busiest b ON CAST(e.ts AS DATE) = b.d
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    GraftQuery(
      "q_source_partitioned",
      "Hive-style partitioned parquet layout (partitionBy lang on write) with a " +
        "partition-pruned read: the lang predicate is satisfied by DIRECTORY " +
        "pruning — zero non-matching files opened. The on-disk shape of every " +
        "time/key-partitioned archive at 100 TB (PartitionFilters in .explain, " +
        "pinned in PlanShapeSpec).",
      (s, dir) => {
        s.read.parquet(partitionedDir(s, dir))
          .filter(col("lang") === "en")
          .groupBy("source")
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
          .orderBy("source")
      },
      Some(
        "SELECT source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars " +
          "FROM documents WHERE lang = 'en' GROUP BY source ORDER BY source")),

    GraftQuery(
      "q_source_evolution",
      "Schema-evolution read over a two-generation parquet lake (generation " +
        "1 written before the `source` column existed, generation 2 with " +
        "it): mergeSchema unifies the footers and the old files surface " +
        "source as NULL — counted per language next to the total, so the " +
        "oracle (which sees the original table and simulates the drift by " +
        "generation parity) pins both the merge and the null semantics. " +
        "The schema-drift read every archive that never rewrites old files " +
        "eventually depends on; generation is also a partition column, so " +
        "generation-targeted reads prune directories.",
      (s, dir) =>
        s.read.option("mergeSchema", "true").parquet(evolutionDir(s, dir))
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n"),
            count(col("source")).as("n_sourced"),
            sum(col("n_chars")).as("chars"))
          .orderBy("lang"),
      Some(
        "SELECT lang, count(*) AS n, " +
          "count(CASE WHEN doc_id % 2 = 1 THEN source END) AS n_sourced, " +
          "CAST(sum(n_chars) AS BIGINT) AS chars " +
          "FROM documents GROUP BY lang ORDER BY lang")),

    GraftQuery(
      "q_source_csv_malformed",
      "PERMISSIVE ingest of a CSV feed with deterministically injected " +
        "malformed lines (doc_id % 10 == 3 rows rendered as one unparseable " +
        "token): corrupt rows are captured via columnNameOfCorruptRecord and " +
        "rolled up under a '__corrupt' bucket next to the per-language " +
        "stats of the rows that DID parse. The oracle reads the original " +
        "parquet and simulates the corruption rule, so the gate pins the " +
        "parse/capture split value-exactly — the ingest-robustness surface " +
        "(FAILFAST-only engines cannot read real feeds; silently dropping " +
        "bad rows loses the signal this query surfaces).",
      (s, dir) => {
        val schema = StructType(Seq(
          StructField("doc_id", LongType), StructField("lang", StringType),
          StructField("n_chars", LongType), StructField("_bad", StringType)))
        s.read.schema(schema)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_bad")
          .csv(malformedDir(s, dir))
          .groupBy(when(col("_bad").isNotNull, lit("__corrupt"))
            .otherwise(col("lang")).as("lang"))
          .agg(count(lit(1)).as("n"),
            coalesce(sum(col("n_chars")), lit(0L)).as("chars"))
          .orderBy("lang")
      },
      Some(
        "SELECT CASE WHEN doc_id % 10 = 3 THEN '__corrupt' ELSE lang END AS lang, " +
          "count(*) AS n, " +
          "CAST(sum(CASE WHEN doc_id % 10 = 3 THEN 0 ELSE n_chars END) AS BIGINT) AS chars " +
          "FROM documents GROUP BY 1 ORDER BY 1")),

    GraftQuery(
      "q_source_binaryfile",
      "The binaryFile source — Spark's raw-object ingest path (one file " +
        "per image/audio/page, exactly how multimodal corpora land in " +
        "object storage): 20 fixture documents exported once as " +
        "individual .bin files, read back as (path, length, content) " +
        "rows, identified by filename, and content-proven by byte length " +
        "AND md5 digest against the source table (DuckDB's md5(VARCHAR) " +
        "hashes UTF-8 bytes — the same bytes the export wrote). This is " +
        "the ingest stage in front of graft.functions.Multimodal's " +
        "decode pipeline; at 100 TB binaryFile partitions by file and " +
        "streams content lazily, so the scan parallelizes per object.",
      (s, dir) => {
        val bin = binaryDir(s, dir)
        s.read.format("binaryFile").load(bin)
          .select(
            regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1)
              .cast(LongType).as("doc_id"),
            length(col("content")).cast(LongType).as("n_bytes"),
            md5(col("content")).as("digest"))
          .orderBy("doc_id")
      },
      Some(
        """SELECT doc_id,
          |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
          |  md5(text) AS digest
          |FROM documents WHERE doc_id < 20 ORDER BY doc_id""".stripMargin))
  )
}
