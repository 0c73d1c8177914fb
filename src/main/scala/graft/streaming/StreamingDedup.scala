package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact dedup — the unbounded twin of
  * `operators/DedupOps.exactDedup` (reference semantics: cumulative
  * first-wins membership, download_files.py:142-187). A training-data
  * ingest tail dedupes documents AS THEY ARRIVE instead of re-scanning
  * the corpus per batch: content-hash state lives on the shuffle key via
  * `flatMapGroupsWithState`, every document gets an Append-mode verdict
  * (unique, or duplicate-of the kept id), and duplicates across
  * micro-batches are caught by the persisted state, not a join.
  *
  * Scale: state is ONE small record per distinct content hash, hash-
  * partitioned across executors (RocksDB state store in production) —
  * the same sharded-membership shape as the crawl's URL-seen set
  * ([[graft.crawl.SeenSet]]), with the same "state on the shuffle key,
  * never on the driver" rule. Exact dedup needs unbounded state by
  * definition; `ttl` bounds it instead to a dedup-within-horizon
  * (standard production trade: a hash unseen for `ttl` of event time is
  * evicted once the watermark passes, and a later copy re-admits as
  * unique). The text itself never enters state — only its hash and the
  * kept id.
  */
object StreamingDedup {

  /** One arriving document (ts = event time for watermark/TTL). */
  final case class DocEvent(ts: Timestamp, docId: String, text: String)

  /** Per-hash state: the kept (first-arrival) doc and how many dups. */
  final case class HashState(keepId: String, dups: Long)

  /** Append-mode verdict for every input document. */
  final case class DedupVerdict(docId: String, contentHash: String,
      unique: Boolean, keepId: String)

  /** Internal: the hashed projection that enters the stateful group. */
  final case class Hashed(ts: Timestamp, docId: String, contentHash: String)

  /** First-wins exact dedup over a stream. Arrival order within a
    * micro-batch is made deterministic by (ts, docId) — verdicts must
    * not depend on partition iteration order. `ttlMs`: event-time state
    * eviction horizon in ms; None = exact/unbounded.
    *
    * When `ttlMs` is set a watermark of `watermarkDelayMs` is attached to
    * `ts` (TTL eviction needs event-time progress). CAVEAT that implies:
    * an event arriving more than `watermarkDelayMs` of event time behind
    * the stream's max-seen `ts` is dropped by the engine BEFORE dedup —
    * no verdict row is emitted for it at all. Size the delay to the
    * ingest tail's real out-of-orderness; the unbounded (None) path has
    * no watermark and never drops.
    */
  def exactDedupStream(docs: Dataset[DocEvent], ttlMs: Option[Long] = None,
      watermarkDelayMs: Long = 10000L): Dataset[DedupVerdict] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.functions._
    val hashed = {
      val base = docs
        .select($"ts", $"docId", md5($"text").as("contentHash"))
      (ttlMs match {
        case Some(_) => base.withWatermark("ts", s"$watermarkDelayMs milliseconds")
        case None    => base
      }).as[Hashed]
    }
    val timeout = ttlMs match {
      case Some(_) => GroupStateTimeout.EventTimeTimeout()
      case None    => GroupStateTimeout.NoTimeout()
    }
    hashed
      .groupByKey(_.contentHash)
      .flatMapGroupsWithState(OutputMode.Append(), timeout) {
        (hash: String, it: Iterator[Hashed], state: GroupState[HashState]) =>
          if (state.hasTimedOut) {
            // TTL eviction: drop the hash; a later copy re-admits as unique
            state.remove()
            Iterator.empty
          } else {
            var s = state.getOption.orNull
            val out = Seq.newBuilder[DedupVerdict]
            it.toSeq.sortBy(e => (e.ts.getTime, e.docId)).foreach { e =>
              if (s == null) {
                s = HashState(e.docId, 0L)
                out += DedupVerdict(e.docId, hash, unique = true, e.docId)
              } else {
                s = s.copy(dups = s.dups + 1)
                out += DedupVerdict(e.docId, hash, unique = false, s.keepId)
              }
            }
            if (s != null) {
              state.update(s)
              ttlMs.foreach(ms =>
                state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + ms))
            }
            out.result().iterator
          }
      }
  }
}
