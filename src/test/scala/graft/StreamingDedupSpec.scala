package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.DocEvent

/** Streaming exact dedup: first-wins verdicts must match the batch
  * `DedupOps.exactDedup` over the same rows, INCREMENTALLY — duplicates
  * arriving in later micro-batches are caught by persisted state, not a
  * rescan; and the TTL variant evicts a hash once the watermark passes
  * its horizon, re-admitting a later copy as unique.
  */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  // base offset: an event AT the initial watermark (epoch 0) is dropped
  // as late by the TTL variant's watermark, so the test clock starts at
  // t=1000 s
  private def ts(sec: Int) = new Timestamp((1000L + sec) * 1000L)

  test("cross-micro-batch first-wins verdicts match the batch twin") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[DocEvent]
    val q = StreamingDedup.exactDedupStream(mem.toDS())
      .writeStream.format("memory").queryName("dedup_verdicts")
      .outputMode("append").start()
    try {
      // batch 1: a, b, and an in-batch dup of a
      mem.addData(Seq(
        DocEvent(ts(0), "d1", "alpha text"),
        DocEvent(ts(1), "d2", "beta text"),
        DocEvent(ts(2), "d3", "alpha text")))
      q.processAllAvailable()
      // batch 2: cross-batch dups of a and b + one new doc
      mem.addData(Seq(
        DocEvent(ts(10), "d4", "alpha text"),
        DocEvent(ts(11), "d5", "gamma text"),
        DocEvent(ts(12), "d6", "beta text")))
      q.processAllAvailable()

      val got = spark.table("dedup_verdicts")
        .select("docId", "unique", "keepId")
        .collect().map(r => (r.getString(0), r.getBoolean(1), r.getString(2)))
        .sortBy(_._1)
      val expect = Seq(
        ("d1", true, "d1"), ("d2", true, "d2"), ("d3", false, "d1"),
        ("d4", false, "d1"), ("d5", true, "d5"), ("d6", false, "d2"))
      assert(got.toSeq === expect)

      // agreement with the batch operator over the union of all rows:
      // same unique set, same keep ids
      val all = Seq(
        ("d1", "alpha text"), ("d2", "beta text"), ("d3", "alpha text"),
        ("d4", "alpha text"), ("d5", "gamma text"), ("d6", "beta text"))
        .toDF("doc_id", "text")
      val batch = graft.operators.DedupOps
        .exactDedup(all, "text", "doc_id")
        .select("keep_id").as[String].collect().toSet
      val streamedKeeps = got.filter(_._2).map(_._1).toSet
      assert(streamedKeeps === batch)
    } finally q.stop()
  }

  test("ttl horizon: an evicted hash re-admits as unique") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[DocEvent]
    // ttl 5 s of event time; watermark delay is 10 s inside the operator,
    // so eviction of a hash last seen at t needs watermark > t + 5, i.e.
    // max event time > t + 15
    val q = StreamingDedup.exactDedupStream(mem.toDS(), ttlMs = Some(5000L))
      .writeStream.format("memory").queryName("dedup_ttl")
      .outputMode("append").start()
    try {
      mem.addData(Seq(DocEvent(ts(0), "d1", "alpha text")))
      q.processAllAvailable()
      // push the watermark far past d1's horizon, then replay the text
      mem.addData(Seq(DocEvent(ts(100), "d2", "unrelated text")))
      q.processAllAvailable()
      mem.addData(Seq(DocEvent(ts(101), "d3", "alpha text")))
      q.processAllAvailable()

      val got = spark.table("dedup_ttl")
        .select("docId", "unique").as[(String, Boolean)]
        .collect().toMap
      assert(got("d1"), "first copy unique")
      assert(got("d3"), "copy after TTL eviction re-admits as unique")

      // within the horizon the dup is still caught
      mem.addData(Seq(DocEvent(ts(102), "d4", "alpha text")))
      q.processAllAvailable()
      val got2 = spark.table("dedup_ttl")
        .select("docId", "unique").as[(String, Boolean)]
        .collect().toMap
      assert(!got2("d4"), "copy inside the horizon is a duplicate")
    } finally q.stop()
  }
}
