package graft.streaming

import java.nio.file.Files
import graft.{GraftQuery, Tables}
import org.apache.spark.sql.functions._

/** Streaming under the oracle gate: these queries execute a REAL Structured
  * Streaming pipeline (file source → watermarked stateful aggregation →
  * checkpointed parquet sink, Trigger.AvailableNow) and return its output as
  * the query result. Possible because AvailableNow semantics are
  * deterministic on static input: a window is emitted in append mode iff
  * `window.end <= watermark` where the final watermark is `max(ts) - 2h`
  * (boundary verified empirically this round) — which is expressible as a
  * HAVING clause in the DuckDB oracle.
  *
  * The stream reads a normalized copy of the events fixture (micros
  * timestamps — the raw fixture is TIMESTAMP(NANOS), see Tables.table).
  */
object StreamQueries {

  val all: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q_stream_tumbling",
      "Structured Streaming per-hour tumbling aggregation executed end-to-end " +
        "(source→watermark→state→sink); result = the watermark-closed windows.",
      (spark, dir) => {
        val drop = Files.createTempDirectory("graft_sq_in").toString
        Tables.table(spark, dir, "events").write.mode("overwrite").parquet(drop)
        val out = Files.createTempDirectory("graft_sq_out").toString
        val ckpt = Files.createTempDirectory("graft_sq_ck").toString
        EventStream.writeParquet(
          EventStream.tumblingCounts(EventStream.readEvents(spark, drop)), out, ckpt)
          .awaitTermination()
        spark.read.parquet(out)
          .select(col("window.start").as("w"), col("event_type"), col("n"), col("s"))
          .orderBy("w", "event_type")
      },
      Some(
        """SELECT * FROM (
          |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS w, event_type,
          |         count(*) AS n, round(sum(value),2) AS s
          |  FROM events GROUP BY 1, 2)
          |WHERE w + INTERVAL 1 HOUR <= (SELECT max(ts) FROM events) - INTERVAL 2 HOUR
          |ORDER BY w, event_type""".stripMargin))
  )
}
