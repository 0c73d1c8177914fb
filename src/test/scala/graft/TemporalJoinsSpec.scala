package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TemporalJoins

class TemporalJoinsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("as-of join: inclusive bound, latest-wins, null when no prior row") {
    val left = Seq(
      (1L, 100L, 10L), // t=100: right rows at 50 and 100 → 100 (inclusive)
      (1L, 99L, 11L),  // t=99: only the row at 50 qualifies
      (1L, 10L, 12L),  // t=10: nothing prior → null
      (2L, 500L, 13L), // other key: isolated
    ).toDF("user_id", "ts_us", "event_id")
    val right = Seq(
      (1L, 50L, 100L, 5.0),
      (1L, 100L, 101L, 6.0),
      (1L, 100L, 102L, 7.0), // same (key, ts): larger id wins the dedup
      (1L, 101L, 103L, 8.0), // later than every left row → never matched
      (2L, 400L, 104L, 9.0),
    ).toDF("user_id", "ts_us", "p_id", "p_value")
    val got = TemporalJoins.asOfJoin(left, right, "user_id", "ts_us",
        Seq("p_id", "p_value"))
      .select("event_id", "r_p_id", "r_p_value").collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(got(10L) === (Some(102L), Some(7.0))) // inclusive + tie dedup
    assert(got(11L) === (Some(100L), Some(5.0)))
    assert(got(12L) === (None, None))
    assert(got(13L) === (Some(104L), Some(9.0)))
  }

  test("bucketed range join: [t-w, t) bounds, cross-bucket matches, zero counts") {
    val w = 100L
    val left = Seq(
      (1L, 250L, 1L), // window [150, 250): rows at 150(in), 249(in), 250(out)
      (1L, 90L, 2L),  // window [-10, 90): row at 0 is in
      (3L, 500L, 3L), // no right rows at all → 0
    ).toDF("user_id", "ts_us", "event_id")
    val right = Seq(
      (1L, 150L), // exactly t-w → included (>=), lives in bucket 1 vs left bucket 2
      (1L, 249L),
      (1L, 250L), // exactly t → excluded (<)
      (1L, 0L),
      (1L, 400L), // after every left row
    ).toDF("user_id", "ts_us")
    val got = TemporalJoins.priorWindowCount(left, right, "user_id", "ts_us", w)
      .select("event_id", "prior_events").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 2L -> 1L, 3L -> 0L))
  }
}
