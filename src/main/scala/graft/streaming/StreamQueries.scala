package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{QueryEntry, Tables}
import graft.streaming.StreamingDedup.DocEvent

/** Driver-visible correctness artifact for the streaming surface: replay a
  * deterministic event table through the REAL streaming engine
  * (`MemoryStream` micro-batches + `processAllAvailable`) and hand the
  * verdict table to the DuckDB oracle — streaming output becomes a hashed
  * CORRECTNESS row instead of trust-the-spec.
  *
  * Reference semantics anchor: cumulative first-wins membership
  * (download_files.py:142-187), the same rule `DedupOps.exactDedup`
  * checks in batch.
  *
  * This is a replay HARNESS, not a scale path: the sf table is collected
  * to the driver once to feed MemoryStream (the only way to drive
  * deterministic micro-batch boundaries), so it stays out of Bench's
  * headline set. The operator under test ([[StreamingDedup
  * .exactDedupStream]]) is the scale path — state on the shuffle key,
  * one record per distinct hash.
  */
/** Oracle-facing projection of [[StreamingDedup.DedupVerdict]] (snake_case
  * names so the SQL side needs no quoting; `unique` is a keyword). Top
  * level — a private nested class makes janino's codegen fall back to
  * interpreted mode on the createDataset encoder. */
final case class ReplayVerdict(doc_id: String, content_hash: String,
    is_unique: Boolean, keep_id: String)

object StreamQueries {

  /** Fixed epoch base so event times are bit-deterministic. */
  private val EpochBaseMs = 1700000000000L

  def entries: Seq[QueryEntry] = Seq(
    QueryEntry(
      "q_stream_dedup_replay",
      (s, dir) => {
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        // deterministic event stream: ts = base + (doc_id % 100) s, fed in
        // five ts-ordered micro-batches (20 s buckets) so cross-batch
        // arrival order == global (ts, docId) order and the SQL oracle's
        // window rank reproduces first-wins exactly
        val events = Tables.t(s, dir, "documents")
          .select(col("doc_id").cast("long"), col("text"))
          .collect()
          .map { r =>
            val id = r.getLong(0)
            DocEvent(new Timestamp(EpochBaseMs + (id % 100) * 1000L),
              id.toString, r.getString(1))
          }
        val batches = events
          .groupBy(e => (e.ts.getTime - EpochBaseMs) / 20000L)
          .toSeq.sortBy(_._1).map(_._2.toSeq)

        val mem = MemoryStream[DocEvent]
        val sinkName = "q_stream_dedup_replay_sink"
        s.catalog.dropTempView(sinkName)
        val q = StreamingDedup.exactDedupStream(mem.toDS())
          .writeStream.format("memory").queryName(sinkName)
          .outputMode("append").start()
        val verdicts =
          try {
            batches.foreach { b => mem.addData(b); q.processAllAvailable() }
            s.table(sinkName).collect().map(r => ReplayVerdict(
              r.getString(0), r.getString(1), r.getBoolean(2), r.getString(3)))
          } finally {
            q.stop()
            s.catalog.dropTempView(sinkName)
          }
        // detach from the stopped stream: a plain local Dataset goes to
        // the driver's parquet dump
        s.createDataset(verdicts.toSeq).toDF().orderBy("doc_id")
      },
      Some("""WITH ev AS (
            SELECT CAST(doc_id AS VARCHAR) AS did, md5(text) AS h,
                   doc_id % 100 AS tsec
            FROM documents),
          ranked AS (
            SELECT did, h,
              row_number() OVER (PARTITION BY h ORDER BY tsec, did) AS rn,
              first_value(did) OVER (PARTITION BY h ORDER BY tsec, did) AS keeper
            FROM ev)
          SELECT did AS doc_id, h AS content_hash, rn = 1 AS is_unique,
                 keeper AS keep_id
          FROM ranked ORDER BY doc_id"""),
    ),
  )
}
