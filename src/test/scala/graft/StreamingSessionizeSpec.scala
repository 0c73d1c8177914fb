package graft

import java.sql.Timestamp

import graft.streaming.StreamingSessionize
import graft.streaming.StreamingSessionize.{SessionEvent, SessionRow}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingSessionizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val Base = 1700000000000L // fixed epoch ms

  private def ev(offsetSec: Long, uid: Long, eid: Long, v: Double) =
    SessionEvent(new Timestamp(Base + offsetSec * 1000L), uid, eid, v)

  private def replay(batches: Seq[Seq[SessionEvent]],
      flushOffsetSec: Long): Seq[SessionRow] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val sink = s"sessionize_spec_sink_${System.nanoTime()}"
    val q = StreamingSessionize.sessionizeStream(mem.toDS())
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation",
        s"${BenchDirs.scratchDir("sessionize-spec")}/${System.nanoTime()}")
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      mem.addData(Seq(ev(flushOffsetSec, -1L, 0L, 0.0)))
      q.processAllAvailable()
      spark.table(sink).as[SessionRow].collect().toSeq
        .filter(_.user_id >= 0).sortBy(r => (r.user_id, r.session_id))
    } finally {
      q.stop()
      spark.catalog.dropTempView(sink)
    }
  }

  test("gap splits, cross-batch continuation, timeout flush, ordinals") {
    // user 1: events at 0 s and 600 s (one session), then 600+1801 s — past
    // the 1800 s gap → second session. The second batch CONTINUES session 2
    // (2460 s is 59 s after 2401 s). user 2: a single event.
    val got = replay(Seq(
      Seq(ev(0, 1, 10, 1.25), ev(600, 1, 11, 2.0), ev(2401, 1, 12, 0.5)),
      Seq(ev(2460, 1, 13, 4.0), ev(2460, 2, 14, 7.75)),
    ), flushOffsetSec = 1000000L)
    assert(got.map(r => (r.user_id, r.session_id, r.n_events)) ===
      Seq((1L, 1L, 2L), (1L, 2L, 2L), (2L, 1L, 1L)))
    val s11 = got.head
    assert(s11.start_us === Base * 1000L)
    assert(s11.end_us === (Base + 600000L) * 1000L)
    assert(s11.total_value === 3.25)
    assert(s11.duration_us === 600000000L)
    assert(got(1).total_value === 4.5)
    // gap boundary: exactly 1800 s stays IN the session (batch twin's >)
    val boundary = replay(Seq(
      Seq(ev(0, 5, 1, 1.0), ev(1800, 5, 2, 1.0))), 1000000L)
    assert(boundary.map(r => (r.user_id, r.n_events)) === Seq((5L, 2L)))
  }

  test("stream rollups are bit-identical to the batch sessionizer at sf0.001") {
    val streamed = SparkEntry.queries("q_stream_sessionize_replay")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getLong(6)))
    val batch = SparkEntry.queries("q_sessionize")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getLong(6)))
    assert(streamed.nonEmpty)
    assert(streamed.toSeq === batch.toSeq)
  }
}
