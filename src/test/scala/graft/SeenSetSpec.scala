package graft

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import org.scalatest.funsuite.AnyFunSuite

import graft.crawl.SeenSet

/** The URL-seen membership layer: Bloom shards route, the exact table is
  * authoritative — a Bloom false positive must never drop a URL (north-rule
  * exactness). The last test FORCES false positives with a tiny
  * over-saturated filter and asserts exactness anyway.
  */
class SeenSetSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val nShards = 4

  test("BloomAgg custom aggregator builds per-shard filters") {
    val urls = (0 until 500).map(i => s"u://$i").toDF("url")
    val agg = udaf(new SeenSet.BloomAgg(1000, 0.01))
    val shards = urls
      .select(SeenSet.shardCol(col("url"), nShards).as("shard"), col("url"))
      .groupBy($"shard").agg(agg($"url").as("bloom"))
      .as[(Int, Array[Byte])].collect().toMap
    assert(shards.nonEmpty)
    val merged = shards.values.map(BloomFilter.readFrom)
    // every inserted url hits its shard's filter (no false negatives)
    val all = BloomFilter.create(1000, 0.01)
    merged.foreach(all.mergeInPlace)
    (0 until 500).foreach(i => assert(all.mightContainString(s"u://$i")))
  }

  test("buildShards + filterNew: exact split of new vs seen") {
    val seen = (0 until 300).map(i => s"u://$i").toDF("url")
    val shards = SeenSet.buildShards(seen, nShards, 1000, 0.01)
    val candidates = (200 until 600).map(i => s"u://$i").toDF("url")
    val fresh = SeenSet.filterNew(candidates, shards, seen, nShards)
      .select("url").as[String].collect().toSet
    assert(fresh === (300 until 600).map(i => s"u://$i").toSet)
  }

  test("over-saturated Bloom (many false positives) still yields exact results") {
    // 5000 urls into filters sized for 50 → fpp ≈ 1; exact confirm must save us
    val seen = (0 until 5000).map(i => s"u://$i").toDF("url")
    val shards = SeenSet.buildShards(seen, nShards, 50, 0.01)
    val candidates = (4000 until 9000).map(i => s"u://$i").toDF("url")
    val fresh = SeenSet.filterNew(candidates, shards, seen, nShards)
      .select("url").as[String].collect().toSet
    assert(fresh === (5000 until 9000).map(i => s"u://$i").toSet)
  }

  test("filterNew merges delta-appended shard rows (multiple rows per shard)") {
    // bloom state as the crawl commits it: one delta row-set per round
    val seenA = (0 until 200).map(i => s"u://$i").toDF("url")
    val seenB = (200 until 400).map(i => s"u://$i").toDF("url")
    val deltas = SeenSet.buildShards(seenA, nShards, 1000, 0.01)
      .unionByName(SeenSet.buildShards(seenB, nShards, 1000, 0.01))
    val seenAll = seenA.unionByName(seenB)
    val candidates = (0 until 600).map(i => s"u://$i").toDF("url")
    val fresh = SeenSet.filterNew(candidates, deltas, seenAll, nShards)
      .select("url").as[String].collect().toSet
    assert(fresh === (400 until 600).map(i => s"u://$i").toSet)
  }

  test("mergeShards accumulates membership across deltas") {
    val a = SeenSet.buildShards((0 until 100).map(i => s"a$i").toDF("url"),
      nShards, 500, 0.01)
    val b = SeenSet.buildShards((0 until 100).map(i => s"b$i").toDF("url"),
      nShards, 500, 0.01)
    val merged = SeenSet.mergeShards(a, b)
      .select("shard", "bloom").as[(Int, Array[Byte])].collect().toMap
    val f = merged.values.map(BloomFilter.readFrom)
      .reduce { (x, y) => x.mergeInPlace(y); x }
    (0 until 100).foreach { i =>
      assert(f.mightContainString(s"a$i"))
      assert(f.mightContainString(s"b$i"))
    }
  }

  test("inserted counts ride the state: build totals, fold sums per shard") {
    val urls = (0 until 500).map(i => s"u://$i").toDF("url")
    val built = SeenSet.buildShards(urls, nShards, 1000, 0.01)
    val counts = built.select("shard", "inserted")
      .as[(Int, Long)].collect().toMap
    assert(counts.values.sum === 500L)
    assert(counts.values.forall(_ > 0)) // xxhash spreads across 4 shards

    // two deltas folded: per-shard counts are the sums of the delta counts
    val d2 = SeenSet.buildShards(
      (500 until 700).map(i => s"u://$i").toDF("url"), nShards, 1000, 0.01)
    val folded = SeenSet.foldShards(built.unionByName(d2))
      .select("shard", "inserted").as[(Int, Long)].collect().toMap
    assert(folded.values.sum === 700L)
    val c2 = d2.select("shard", "inserted").as[(Int, Long)].collect().toMap
    folded.foreach { case (s, n) =>
      assert(n === counts.getOrElse(s, 0L) + c2.getOrElse(s, 0L))
    }
  }

  test("pre-upgrade state (no inserted column) folds and forgets without error") {
    // a Glacier root written before fill accounting: 2-column state rows
    val legacy = SeenSet.buildShards(
      (0 until 200).map(i => s"u://$i").toDF("url"), nShards, 500, 0.01)
      .select("shard", "bloom")
    val folded = SeenSet.foldShards(legacy)
    assert(folded.columns.toSeq === Seq("shard", "bloom", "inserted"))
    // baseline unknown → 0, never a crash
    assert(folded.select("inserted").as[Long].collect().forall(_ === 0L))

    // mixed-era merge: legacy rows + new counted rows sum the known part
    val fresh = SeenSet.buildShards(
      (200 until 300).map(i => s"u://$i").toDF("url"), nShards, 500, 0.01)
    val merged = SeenSet.mergeShards(legacy, fresh)
    assert(merged.select("inserted").as[Long].collect().sum === 100L)

    // mixed-era SINGLE table: one parquet read where pre-column part-files
    // surface as NULL inserted next to counted rows — fold must not NPE
    // and must sum the known part
    val mixed = legacy.withColumn("inserted", lit(null).cast("long"))
      .unionByName(fresh)
    val foldedMixed = SeenSet.foldShards(mixed)
    assert(foldedMixed.select("inserted").as[Long].collect().sum === 100L)

    // forget on a legacy bloom state rebuilds touched shards (and the
    // rebuild recomputes real counts for them)
    val seen = (0 until 200).map(i => s"u://$i").toDF("url")
    val (newSeen, newState) = SeenSet.forgetUrls(
      seen, legacy, Seq("u://5").toDF("url"), nShards,
      SeenSet.BloomSeen(500, 0.01))
    assert(newSeen.count() === 199L)
    assert(newState.columns.contains("inserted"))
  }

  test("forgetUrls (cuckoo) decrements the forgotten shard's inserted count") {
    val sk = SeenSet.CuckooSeen(1 << 10)
    val seen = (0 until 300).map(i => s"u://$i").toDF("url")
    val state = SeenSet.buildShardsWith(seen, nShards, sk)
    val before = state.select("shard", "inserted")
      .as[(Int, Long)].collect().toMap
    val forget = Seq("u://7", "u://8", "u://absent").toDF("url")
    val (_, newState) = SeenSet.forgetUrls(seen, state, forget, nShards, sk)
    val after = newState.select("shard", "inserted")
      .as[(Int, Long)].collect().toMap
    assert(before.values.sum - after.values.sum === 2L) // absent url ignored
    assert(after.values.forall(_ >= 0L))
  }
}
