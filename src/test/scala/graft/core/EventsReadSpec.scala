package graft.core

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scoped events reading: the engine reads a possibly-nanos events
  * file without EVER mutating the shared session's conf — the
  * nanos-as-long legacy flag lives only in a child session whose
  * plans carry it for their own lifetime. Both physical `ts` types
  * the driver has shipped (TIMESTAMP(NANOS) early rounds,
  * TIMESTAMP(MICROS) since) must normalize to identical
  * (`ts` timestamp-µs, `version` epoch-millis) columns.
  *
  * The nanos fixture (`src/test/resources/events_nanos.parquet`)
  * is pre-generated: Spark itself cannot write TIMESTAMP(NANOS),
  * which is exactly why the read path needs the adaptation.
  */
class EventsReadSpec extends SparkSpec {
  import spark.implicits._

  private val flag = "spark.sql.legacy.parquet.nanosAsLong"

  private def nanosDir(): String = {
    val dir = Files.createTempDirectory("graft-evnanos").toString
    val tgt = Paths.get(dir, "events.parquet")
    Files.createDirectories(tgt)
    Files.copy(Paths.get("src/test/resources/events_nanos.parquet"),
      tgt.resolve("part-00000.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir
  }

  // the same three rows with a micros-typed ts (Spark's native write)
  private def microsDir(): String = {
    val dir = Files.createTempDirectory("graft-evmicros").toString
    Seq(
      (10L, 1L, "click", 1699999999123456L),
      (11L, 2L, "view", 1700000001123456L),
      (12L, 1L, "click", 1700086400500000L))
      .toDF("event_id", "user_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    dir
  }

  test("micros events read on the parent session; no shared-conf mutation") {
    spark.conf.unset(flag)
    val df = Tables.loadEvents(spark, microsDir())
    assert(df.sparkSession eq spark, "micros read must stay parent-session")
    df.count() shouldBe 3
    spark.conf.get(flag, "false") shouldBe "false"
  }

  test("nanos events read through a scoped child session; parent conf untouched") {
    spark.conf.unset(flag)
    val df = Tables.loadEvents(spark, nanosDir())
    assert(!(df.sparkSession eq spark), "nanos read must be child-scoped")
    df.sparkSession.conf.get(flag) shouldBe "true"
    spark.conf.get(flag, "false") shouldBe "false"
    // child session inherits the parent's conventions
    df.sparkSession.conf.get("spark.sql.session.timeZone") shouldBe
      spark.conf.get("spark.sql.session.timeZone")
  }

  test("nanos and micros fixtures normalize to identical version/ts columns") {
    spark.conf.unset(flag)
    def normed(dir: String): Set[(Long, Long, Long)] =
      Tables.loadEvents(spark, dir)
        .select(col("event_id"), col("version"), unix_micros(col("ts")))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val n = normed(nanosDir())
    val m = normed(microsDir())
    n shouldBe m
    // spot-check the arithmetic: 1699999999123456789 ns -> 1699999999123 ms
    n should contain((10L, 1699999999123L, 1699999999123456L))
    spark.conf.get(flag, "false") shouldBe "false"
  }

  test("EventSketchStore serves a nanos corpus without touching the shared conf") {
    spark.conf.unset(flag)
    val sf = nanosDir()
    val regs = graft.sketch.EventSketchStore.dayRegisters(spark, sf)
    // two distinct days (1699999999123 and 1700086400500 epoch-ms)
    regs.select("day").distinct().count() shouldBe 2
    spark.conf.get(flag, "false") shouldBe "false"
  }
}
