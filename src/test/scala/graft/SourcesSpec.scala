package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format coverage beyond parquet (SURVEY §2.1 notes CSV/JSON
  * come with Spark): schema-stable round-trips and a query over each format.
  * Timestamps are excluded from the CSV round-trip comparison only where the
  * format itself is lossy — the point is the reader/writer wiring. */
class SourcesSpec extends SparkSuite {

  private lazy val docs = Tables.table(spark, sf, "documents")

  test("CSV round-trip preserves rows and schema (explicit schema, header)") {
    val dir = Files.createTempDirectory("graft_csv").toString
    docs.write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val back = spark.read.schema(schema).option("header", "true").csv(dir)
    assert(back.count() == docs.count())
    val a = docs.select("doc_id", "lang", "n_chars")
    val b = back.select("doc_id", "lang", "n_chars")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("JSON round-trip preserves rows; query runs over the JSON source") {
    val dir = Files.createTempDirectory("graft_json").toString
    docs.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
    assert(back.count() == docs.count())
    // run a real aggregation over the non-parquet source
    val stats = back.groupBy("lang").agg(count(lit(1)).as("n")).collect()
    assert(stats.map(_.getAs[Long]("n")).sum == docs.count())
  }

  test("ORC round-trip preserves rows and exact values") {
    val dir = Files.createTempDirectory("graft_orc").toString
    val emb = Tables.table(spark, sf, "embeddings")
    emb.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() == emb.count())
    assert(back.except(emb).isEmpty && emb.except(back).isEmpty)
  }

  test("Avro round-trip preserves rows and exact values (incl. float arrays)") {
    val dir = Files.createTempDirectory("graft_avro").toString
    val emb = Tables.table(spark, sf, "embeddings")
    emb.write.mode("overwrite").format(sources.FormatSources.AvroProvider).save(dir)
    val back = spark.read.format(sources.FormatSources.AvroProvider).load(dir)
    assert(back.count() == emb.count())
    assert(back.except(emb).isEmpty && emb.except(back).isEmpty)
  }
}
