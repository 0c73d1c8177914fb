package graft.crawl

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** The URL-seen membership state: an exact, authoritative Parquet table of
  * every URL ever enqueued, fronted by per-shard Bloom filters as the fast
  * path. The Bloom may say "maybe seen" for a new URL (false positive) but
  * never "new" for a seen one — so candidates that miss every Bloom are
  * *definitely new* and skip the expensive exact anti-join entirely; only
  * Bloom hits get confirmed against the exact table. The north rule demands
  * exact URL-seen equality: the Bloom can only route, never drop.
  *
  * Sharding: `shard = pmod(xxhash64(url), nShards)`. Per-shard filters keep
  * each filter's size bounded at 10^10-URL scale (a single 10^10-entry 1%
  * filter would be ~12 GB; 4096 shards of ~2.4M entries are ~3 MB each, one
  * per state-table row). The probe cogroups candidates with the state table
  * on the shard hash, so each task touches only its shard's filter bytes —
  * fully distributed, no driver collect, no broadcast. The state table is
  * delta-appended (one small row set per round) and merged per shard inside
  * the probe; Glacier compaction folds deltas back to one row per shard.
  *
  * The reference's analog is the pooch download cache / cumulative dedup
  * (download_files.py:142-187, toolbox.py:192-209) — an O(n²) in-memory
  * list scan whose *semantics* (exact first-wins membership) we keep and
  * whose implementation we replace (SURVEY.md §4).
  */
object SeenSet {

  /** Custom typed aggregate: per-group Bloom filter over a string column —
    * the one genuinely custom Aggregator in the engine (SURVEY.md §2.10).
    */
  final class BloomAgg(expectedPerShard: Long, fpp: Double)
      extends Aggregator[String, BloomFilter, Array[Byte]] {
    def zero: BloomFilter = BloomFilter.create(expectedPerShard, fpp)
    def reduce(b: BloomFilter, url: String): BloomFilter = { b.putString(url); b }
    def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
      a.mergeInPlace(b); a
    }
    def finish(b: BloomFilter): Array[Byte] = serialize(b)
    def bufferEncoder: Encoder[BloomFilter] =
      Encoders.javaSerialization[BloomFilter]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  def serialize(b: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    b.writeTo(out)
    out.toByteArray
  }

  def shardCol(url: org.apache.spark.sql.Column, nShards: Int) =
    pmod(xxhash64(url), lit(nShards.toLong)).cast("int")

  /** Build per-shard Bloom filters for a batch of URLs → (shard, bloom).
    * One shuffle of the raw urls, then one filter built per shard in a
    * single pass (`groupByKey.mapGroups`). Deliberately NOT the [[BloomAgg]]
    * aggregator: hash-partial aggregation would materialize a java-
    * serialized filter buffer per (task × shard) — measured to collapse
    * scaling at high core counts. BloomAgg remains the typed-aggregate API
    * for ad-hoc use and is covered by its own spec.
    */
  def buildShards(urls: DataFrame, nShards: Int, expectedPerShard: Long,
                  fpp: Double): DataFrame = {
    val spark = urls.sparkSession
    import spark.implicits._
    urls.select(shardCol(col("url"), nShards).as("shard"), col("url"))
      .as[(Int, String)]
      .groupByKey(_._1)
      .mapGroups { (shard, it) =>
        val f = BloomFilter.create(expectedPerShard, fpp)
        it.foreach(t => f.putString(t._2))
        (shard, serialize(f))
      }
      .toDF("shard", "bloom")
  }

  /** Fold a (shard, bloom) state with multiple rows per shard (delta
    * appends) down to one merged row per shard — the compaction transform
    * (`Glacier.compact(spark, "bloom", transformFn = SeenSet.foldShards)`).
    */
  def foldShards(state: DataFrame): DataFrame = {
    val spark = state.sparkSession
    import spark.implicits._
    state.select("shard", "bloom")
      .as[(Int, Array[Byte])]
      .groupByKey(_._1)
      .mapGroups { (shard, it) =>
        val merged = it.map(t => BloomFilter.readFrom(t._2))
          .reduce((a, b) => a.mergeInPlace(b))
        (shard, serialize(merged))
      }
      .toDF("shard", "bloom")
  }

  /** Merge an existing shard table with a delta batch's shards. */
  def mergeShards(old: DataFrame, delta: DataFrame): DataFrame =
    foldShards(old.select("shard", "bloom")
      .unionByName(delta.select("shard", "bloom")))

  /** Split `candidates` (must have a `url` column) into definitely-new rows
    * (Bloom miss) and rows needing exact confirmation, then anti-join only
    * the latter against the exact seen table. Returns the exactly-new rows.
    *
    * Shard-partitioned probe: candidates are cogrouped with the bloom state
    * table on the shard hash — each task deserializes only its own shard's
    * filter(s), merged locally when the state is delta-appended (one row per
    * shard per committed round). NOTHING is collected to the driver or
    * broadcast: at the 10^10-URL design point (4096 shards × ~3 MB) the
    * state stays distributed; a driver collect+broadcast would move ~12 GB
    * through the driver every round.
    */
  def filterNew(candidates: DataFrame, bloom: DataFrame,
                seenExact: DataFrame, nShards: Int): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val tagged = candidates.withColumn("__shard", shardCol(col("url"), nShards))
    val outSchema = tagged.schema
      .add("__maybe", org.apache.spark.sql.types.BooleanType)
    implicit val rowEnc: Encoder[Row] = Encoders.row(outSchema)
    val shardIdx = tagged.schema.fieldIndex("__shard")
    val urlIdx = tagged.schema.fieldIndex("url")
    val candByShard = tagged.groupByKey(_.getInt(shardIdx))
    val bloomByShard = bloom.select(col("shard").cast("int"), col("bloom"))
      .as[(Int, Array[Byte])].groupByKey(_._1)
    val flagged = candByShard.cogroup(bloomByShard) { (_, cands, blooms) =>
      val filter = blooms.map(b => BloomFilter.readFrom(b._2))
        .reduceOption { (a, b) => a.mergeInPlace(b); a }
      filter match {
        case None    => cands.map(r => Row.fromSeq(r.toSeq :+ false))
        case Some(f) => cands.map(r =>
          Row.fromSeq(r.toSeq :+ f.mightContainString(r.getString(urlIdx))))
      }
    }
    val definitelyNew = flagged.filter(!col("__maybe"))
    val confirmed = flagged.filter(col("__maybe"))
      .join(seenExact.select(col("url").as("__seen_url")),
        col("url") === col("__seen_url"), "left_anti")
    definitelyNew.unionByName(confirmed).drop("__shard", "__maybe")
  }
}
