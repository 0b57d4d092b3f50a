package graft

import java.sql.Timestamp
import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins [[Testbed.normalizeTs]]: the events `ts` column must land on
  * session-zone TIMESTAMP with the SAME instant values for every encoding
  * the driver's testdata generator has produced — epoch nanos read as long
  * (the legacy nanosAsLong path) and native timestamp[us] (TIMESTAMP_NTZ).
  * The unconditional long rebuild this replaced threw AnalysisException on
  * NTZ input before any per-query error handling, zeroing two full rounds
  * of correctness and bench artifacts. */
class TestbedSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  // 2024-03-01 12:34:56.789 UTC, as epoch micros
  private val micros = 1709296496789000L

  test("normalizeTs rebuilds a nanos-as-long ts into the same timestamp " +
      "an NTZ read yields (UTC session)") {
    val fromLong = Testbed.normalizeTs(
      Seq((1L, micros * 1000L)).toDF("event_id", "ts"))
    val fromNtz = Testbed.normalizeTs(spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(2L,
        LocalDateTime.ofEpochSecond(micros / 1000000L,
          ((micros % 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC))),
      StructType(Seq(StructField("event_id", LongType),
        StructField("ts", TimestampNTZType)))))
    assert(fromLong.schema("ts").dataType == TimestampType)
    assert(fromNtz.schema("ts").dataType == TimestampType)
    val a = fromLong.select(unix_micros(col("ts"))).as[Long].head()
    val b = fromNtz.select(unix_micros(col("ts"))).as[Long].head()
    assert(a == micros && b == micros,
      s"instants diverge across encodings: long->$a ntz->$b expect $micros")
  }

  test("normalizeTs leaves an already-TIMESTAMP ts untouched") {
    val df = Seq((1L, new Timestamp(micros / 1000L))).toDF("event_id", "ts")
    val out = Testbed.normalizeTs(df)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros(col("ts"))).as[Long].head() ==
      micros / 1000L * 1000L)
  }
}
