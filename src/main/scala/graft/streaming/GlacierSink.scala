package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.tables.Glacier

/** Exactly-once streaming ingestion into the snapshot layer: a
  * `foreachBatch` body that appends each micro-batch to a Glacier table
  * with the batch id recorded in a one-row state table inside the SAME
  * atomic commit.
  *
  * Why this is exactly-once (with a replayable source + deterministic
  * transforms): Structured Streaming re-delivers a failed micro-batch
  * with the SAME `batchId`. Here either the commit flipped — and the
  * state table shows that id, so the replay is skipped — or the crash
  * landed before the flip and neither the data nor the state is visible,
  * so the replay appends cleanly. Data and state can never diverge
  * because they ride one manifest swap (the same CAS flip
  * `GlacierPipelineSpec` kill-point-tests).
  *
  * The state table is carried across commits by the manifest chain (it is
  * a regular table, immune to `expireSnapshots` dropping old manifests),
  * and the read-back is one single-row parquet file — a trivial
  * one-partition job per micro-batch. A production sink
  * holds the Glacier handle per query; batch order within one stream is
  * serial by contract, so no extra locking is needed beyond commit's own.
  */
object GlacierSink {

  private def stateTable(table: String): String = s"${table}__sink_state"

  /** Highest batch id already committed for `table`, if any — one tiny
    * single-file parquet read pinned by the current manifest. */
  def lastCommittedBatch(g: Glacier, table: String,
      spark: org.apache.spark.sql.SparkSession): Option[Long] =
    g.read(spark, stateTable(table))
      .map(_.agg(max(col("batch_id"))).collect()(0).getLong(0))

  /** `foreachBatch` body: idempotent append of (df, batchId) to `table`. */
  def appendBatch(g: Glacier, table: String)(df: DataFrame, batchId: Long): Unit = {
    val spark = df.sparkSession
    val st = stateTable(table)
    val last = lastCommittedBatch(g, table, spark)
    if (!last.exists(_ >= batchId)) {
      import spark.implicits._
      val state = Seq(batchId).toDF("batch_id").coalesce(1)
      g.commit(spark, Seq(
        g.TableWrite(table, df, g.Append),
        g.TableWrite(st, state, g.Replace)))
    }
  }
}
