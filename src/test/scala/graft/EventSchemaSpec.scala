package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType
import graft.operators.EventQueries
import graft.sources.Tables

/** Events-table schema robustness: the testdata's physical `ts`
  * encoding has silently changed between rounds (ns-precision parquet
  * → µs TIMESTAMP_NTZ), breaking every `ts` arithmetic site. This spec
  * pins the contract that makes the next regeneration a non-event: the
  * SAME event history written under all three physical encodings —
  * legacy nanos BIGINT, TIMESTAMP, TIMESTAMP_NTZ — must produce
  * IDENTICAL rows from every events query, and each must also match
  * the live testdata dir (whatever encoding it currently ships).
  * The dispatch under test is Tables.epochMicros. */
class EventSchemaSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = SparkFixture.Sf0001

  /** One temp table dir per physical encoding, same logical rows. */
  private lazy val legs: Seq[(String, String)] = {
    val base = Tables.events(spark, dir)
    def write(name: String, ts: org.apache.spark.sql.Column): (String, String) = {
      val d = java.nio.file.Files
        .createTempDirectory(s"graft-evschema-$name").toString
      base.select(col("event_id"), ts.as("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
        .write.mode("overwrite").parquet(s"$d/events.parquet")
      name -> d
    }
    Seq(
      write("nanos_long", col("ts_us") * 1000L),
      write("timestamp", timestamp_micros(col("ts_us"))),
      write("timestamp_ntz",
        timestamp_micros(col("ts_us")).cast(TimestampNTZType)))
  }

  private val queries: Seq[(String, (SparkSession, String) => DataFrame)] =
    Seq[(String, (SparkSession, String) => DataFrame)](
      "events_hourly" -> (EventQueries.eventsHourly _),
      "events_sessionize" -> (EventQueries.eventsSessionize _),
      "events_asof" -> (EventQueries.eventsAsof _),
      "events_attribution" -> (EventQueries.eventsAttribution _),
      "events_funnel" -> (EventQueries.eventsFunnel _),
      "events_retention" -> (EventQueries.eventsRetention _),
      "events_wau" -> (EventQueries.eventsWau _),
      "events_cube" -> (EventQueries.eventsCube _),
      "events_gap_stats" -> (EventQueries.eventsGapStats _),
      "events_moving_avg" -> (EventQueries.eventsMovingAvg _))

  test("every physical ts encoding reads back with the declared dispatch leg") {
    val types = legs.map { case (name, d) =>
      name -> spark.read.parquet(s"$d/events.parquet").schema("ts").dataType
    }.toMap
    assert(types("nanos_long").typeName == "long")
    assert(types("timestamp").typeName == "timestamp")
    assert(types("timestamp_ntz").typeName == "timestamp_ntz")
  }

  queries.foreach { case (qname, q) =>
    test(s"$qname returns identical rows under all ts encodings") {
      val want = q(spark, dir).collect().map(_.toString).toSeq
      assert(want.nonEmpty)
      legs.foreach { case (leg, d) =>
        val got = q(spark, d).collect().map(_.toString).toSeq
        assert(got == want, s"$qname diverges on encoding $leg")
      }
    }
  }

  test("ts_us projection is session-timezone independent on every encoding") {
    // materialize the legs FIRST — they must be written under the
    // fixture's UTC session (the NTZ leg's cast is TZ-sensitive at
    // WRITE time by design; the claim under test is READ-side only)
    val materialized = legs
    val tz = spark.conf.get("spark.sql.session.timeZone")
    val want = Tables.events(spark, dir)
      .agg(org.apache.spark.sql.functions.sum("ts_us")).head().getLong(0)
    try {
      // a library caller's pre-existing session may run any timezone —
      // the epoch-micros projection must not shift with it
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      (("live", dir) +: materialized).foreach { case (leg, d) =>
        val got = Tables.events(spark, d)
          .agg(org.apache.spark.sql.functions.sum("ts_us")).head().getLong(0)
        assert(got == want,
          s"encoding $leg: ts_us shifted under a non-UTC session " +
            s"($got != $want)")
      }
    } finally spark.conf.set("spark.sql.session.timeZone", tz)
  }
}
