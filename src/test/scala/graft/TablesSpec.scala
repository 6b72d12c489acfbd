package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Pins the `events.ts` normalization contract in [[Tables.loadEvents]].
  *
  * The driver's testdata generator has shipped `ts` in three different
  * parquet encodings across regenerations (INT64 TIMESTAMP(NANOS),
  * TIMESTAMP_NTZ via isAdjustedToUTC=false, plain LTZ TIMESTAMP). Each
  * change silently broke every event-time query at analysis until
  * caught; this spec makes the loader's output type a hard contract so
  * the next regeneration fails here, loudly, instead of in the
  * correctness gate.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Write a single-encoding events table under a temp sf dir and load
    * it through the real entry point. */
  private def roundTrip(writer: String => Unit): DataType = {
    val dir = Files.createTempDirectory("graft-events").toString
    writer(dir)
    Tables.events(spark, dir).schema("ts").dataType
  }

  private type DataType = org.apache.spark.sql.types.DataType

  test("LTZ timestamp passes through as TimestampType") {
    val dt = roundTrip { dir =>
      Seq((1L, "a"))
        .toDF("event_id", "kind")
        .withColumn("ts", timestamp_micros(lit(1700000000000000L)))
        .write.parquet(s"$dir/events.parquet")
    }
    assert(dt === TimestampType)
  }

  test("TIMESTAMP_NTZ is cast to TimestampType, instant-preserving under UTC") {
    val dir = Files.createTempDirectory("graft-events").toString
    Seq((1L, "a"))
      .toDF("event_id", "kind")
      .withColumn("ts",
        timestamp_micros(lit(1700000000000000L)).cast(TimestampNTZType))
      .write.parquet(s"$dir/events.parquet")
    val loaded = Tables.events(spark, dir)
    assert(loaded.schema("ts").dataType === TimestampType)
    // Under the UTC session timezone the NTZ→LTZ cast preserves the
    // instant; unix_micros must both analyze and return the original.
    val micros = loaded.select(unix_micros(col("ts"))).as[Long].head()
    assert(micros === 1700000000000000L)
  }

  test("INT64 nanos-as-long is converted exactly to micros") {
    val dt = roundTrip { dir =>
      // Raw long column named ts, as the nanos-encoded parquet reads
      // under spark.sql.legacy.parquet.nanosAsLong.
      Seq((1L, "a", 1700000000000000123L))
        .toDF("event_id", "kind", "ts")
        .write.parquet(s"$dir/events.parquet")
    }
    assert(dt === TimestampType)
  }

  test("current testdata events.ts loads as TimestampType and unix_micros analyzes") {
    val sf = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType === TimestampType)
    val n = ev.select(unix_micros(col("ts"))).limit(5).count()
    assert(n > 0)
  }
}
