package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.UpsertSink

/** Exactly-once gates for the foreachBatch upsert sink: end-to-end vs batch
  * aggregation, idempotent re-delivery, partial-commit crash replay, stream
  * restart, and vacuum safety. */
class UpsertSinkSpec extends SparkSuite {

  private val buckets = 4

  /** Micros-normalized events drop dir (2 files → 2 micro-batches under
    * maxFilesPerTrigger=1). */
  private lazy val dropDir: String = {
    val d = Files.createTempDirectory("graft_ups_in").toString
    Tables.table(spark, sf, "events").coalesce(2).write
      .mode("overwrite").parquet(d)
    d
  }

  private def batchTruth = Tables.table(spark, sf, "events")
    .groupBy("user_id")
    .agg(count(lit(1)).as("n_events"),
      sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"),
      max(graft.Ts.epochMicros(col("ts"))).as("last_us"))

  private def tableSet(target: String): Set[(Long, Long, Long, Long)] =
    UpsertSink.readTable(spark, target).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Long]("cents"), r.getAs[Long]("last_us"))).toSet

  private def truthSet: Set[(Long, Long, Long, Long)] =
    batchTruth.collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Long]("cents"), r.getAs[Long]("last_us"))).toSet

  test("end-to-end stream upsert == one batch aggregation (multi-batch commits)") {
    val target = Files.createTempDirectory("graft_ups_t1").toString
    val ckpt = Files.createTempDirectory("graft_ups_c1").toString
    UpsertSink.run(spark, dropDir, target, ckpt, buckets).awaitTermination()
    assert(tableSet(target) == truthSet)
  }

  test("re-delivering a committed batch is a no-op (idempotent replay guard)") {
    val target = Files.createTempDirectory("graft_ups_t2").toString
    val ev = Tables.table(spark, sf, "events")
    UpsertSink.upsertBatch(spark, target, buckets)(ev, 0L)
    val after1 = tableSet(target)
    UpsertSink.upsertBatch(spark, target, buckets)(ev, 0L) // exact replay
    assert(tableSet(target) == after1)
    assert(after1 == truthSet)
  }

  test("crash between bucket commits: replaying the batch completes exactly-once") {
    val target = Files.createTempDirectory("graft_ups_t3").toString
    val ev = Tables.table(spark, sf, "events")
    val half = ev.filter(pmod(col("event_id"), lit(2L)) === 0)
    val rest = ev.filter(pmod(col("event_id"), lit(2L)) === 1)
    UpsertSink.upsertBatch(spark, target, buckets)(half, 0L)
    // simulate a crash mid-batch-1: only the keys hashing to bucket 1
    // committed before the kill (their _meta now carries batchId=1)
    UpsertSink.upsertBatch(spark, target, buckets)(
      rest.filter(pmod(col("user_id"), lit(buckets.toLong)) === 1), 1L)
    // restart re-delivers the FULL batch 1: bucket 1 must skip (already at
    // batchId 1), every other bucket must apply — nothing double-counted
    UpsertSink.upsertBatch(spark, target, buckets)(rest, 1L)
    assert(tableSet(target) == truthSet)
  }

  test("an orphaned (uncommitted) version dir is invisible and vacuumable") {
    val target = Files.createTempDirectory("graft_ups_t4").toString
    val ev = Tables.table(spark, sf, "events")
    UpsertSink.upsertBatch(spark, target, buckets)(ev, 0L)
    val before = tableSet(target)
    // a crash AFTER writing v=99 but BEFORE the _meta swap leaves this dir:
    spark.range(1).select(lit(7L).as("user_id"), lit(999L).as("n_events"),
        lit(0L).as("cents"), lit(0L).as("last_us"))
      .write.parquet(s"$target/bucket=0/v=99")
    assert(tableSet(target) == before, "uncommitted version leaked into reads")
    // default min-age guard: a FRESH orphan could be an in-flight commit
    // racing this vacuum (written before its _meta swap) — it must survive
    UpsertSink.vacuum(target)
    assert(Files.isDirectory(java.nio.file.Paths.get(s"$target/bucket=0/v=99")),
      "vacuum reclaimed a version dir younger than the min-age guard")
    // offline contract (no live writer): age 0 reclaims the orphan
    UpsertSink.vacuum(target, minAgeMs = 0L)
    assert(!Files.isDirectory(java.nio.file.Paths.get(s"$target/bucket=0/v=99")))
    assert(tableSet(target) == before, "vacuum touched a live version")
  }

  test("a failing bucket commit fails the batch without corrupting siblings; replay completes") {
    // the r14 parallel commit awaits EVERY bucket to completion before
    // rethrowing the first failure — this injects a failure into one
    // bucket (its _meta path is made a DIRECTORY, so readMeta's
    // readString throws) and proves (a) the batch fails loudly, (b) the
    // sibling buckets are each either fully committed or untouched, and
    // (c) replaying after repair converges to exactly-once truth
    val target = Files.createTempDirectory("graft_ups_t7").toString
    val ev = Tables.table(spark, sf, "events")
    val poisoned = java.nio.file.Paths.get(s"$target/bucket=2/_meta")
    Files.createDirectories(poisoned) // _meta as a DIR: readString throws
    intercept[Exception] {
      UpsertSink.upsertBatch(spark, target, buckets)(ev, 0L)
    }
    // siblings must be consistent: any committed bucket's table slice
    // equals the batch truth for exactly that bucket's keys
    val committed = UpsertSink.readTable(spark, target).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Long]("cents"), r.getAs[Long]("last_us"))).toSet
    assert(committed.subsetOf(truthSet),
      "a partially-failed batch wrote rows that disagree with batch truth")
    // repair the poisoned bucket and replay the SAME batch: buckets that
    // committed skip (batchId guard), the rest apply — exactly-once
    graft.TempReaper.deleteRecursively(poisoned.toString)
    UpsertSink.upsertBatch(spark, target, buckets)(ev, 0L)
    assert(tableSet(target) == truthSet)
  }

  test("a DIFFERENT stream run against an existing target fails loudly, never silent-drops") {
    // fresh checkpoint ⇒ batchIds restart at 0 ⇒ the bare `batchId >= B`
    // guard would classify every new batch as already-committed and drop
    // all new data forever with no signal (r13 review finding). The run
    // token scopes the guard: same run replays idempotently, a foreign
    // run throws instead of no-op'ing.
    val target = Files.createTempDirectory("graft_ups_t6").toString
    val ev = Tables.table(spark, sf, "events")
    UpsertSink.upsertBatch(spark, target, buckets, token = "run-A")(ev, 3L)
    val after = tableSet(target)
    // same run, replayed batch: idempotent skip, no error
    UpsertSink.upsertBatch(spark, target, buckets, token = "run-A")(ev, 3L)
    assert(tableSet(target) == after)
    // different run, batchId restarted at 0: must throw, not silently skip
    val e = intercept[IllegalStateException] {
      UpsertSink.upsertBatch(spark, target, buckets, token = "run-B")(ev, 0L)
    }
    assert(e.getMessage.contains("run-A"), e.getMessage)
    assert(tableSet(target) == after, "foreign run mutated the target")
  }

  test("restarting the stream with the same checkpoint adds nothing; new files apply incrementally") {
    val target = Files.createTempDirectory("graft_ups_t5").toString
    val ckpt = Files.createTempDirectory("graft_ups_c5").toString
    UpsertSink.run(spark, dropDir, target, ckpt, buckets).awaitTermination()
    val after1 = tableSet(target)
    // restart, no new input: committed batchIds + the checkpoint make this a no-op
    UpsertSink.run(spark, dropDir, target, ckpt, buckets).awaitTermination()
    assert(tableSet(target) == after1)
    // drop one more file: only its delta may apply
    val extra = Tables.table(spark, sf, "events").limit(50)
    extra.coalesce(1).write.mode("append").parquet(dropDir)
    try {
      UpsertSink.run(spark, dropDir, target, ckpt, buckets).awaitTermination()
      val expected = Tables.table(spark, sf, "events")
        .select(col("user_id"), col("value"), col("ts"))
        .unionByName(extra.select(col("user_id"), col("value"), col("ts")))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"),
          max(graft.Ts.epochMicros(col("ts"))).as("last_us"))
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
          r.getAs[Long]("cents"), r.getAs[Long]("last_us"))).toSet
      assert(tableSet(target) == expected)
    } finally {
      // dropDir is shared with the other tests — restore it
      Tables.table(spark, sf, "events").coalesce(2).write
        .mode("overwrite").parquet(dropDir)
    }
  }
}
