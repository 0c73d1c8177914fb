package graft.crawl

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model._
import graft.tables.Glacier

/** The distributed crawl engine: BSP rounds over a Glacier-checkpointed
  * frontier, implementing [[CrawlSpec]] exactly (every parity test compares
  * against [[ReferenceCrawl]]). One round =
  *
  *   drain priority queue (per-host budget, two-phase salted ranking)
  *   → fetch (`mapPartitions`, salted-host partitioning — no hot-host
  *     straggler partitions)
  *   → parse spans → validate (quarantine counts, drop-and-log semantics)
  *   → discovered links: robots gate → first-wins in-round dedup (window
  *     over url ordered by discovery seq) → URL-seen check (per-shard
  *     Bloom fast path + exact anti-join confirm)
  *   → commit ONE atomic Glacier snapshot: frontier (Replace), seen/bloom,
  *     crawl-order log, docs, datasets, files (Append) + round metrics.
  *
  * Determinism: all order-sensitive results key on the minted discovery
  * sequence (round, queryIdx, pageIdx, hitIdx), never on partition
  * iteration order — the same config produces an identical crawl-order log,
  * seen set and span documents at local[1], local[8] or a 1000-executor
  * cluster. Resumability: any kill lands on the previous snapshot; rerun
  * continues from round N+1 with identical final state (tested).
  *
  * Scale notes (10^10-URL design):
  *  - Frontier drain sorts only O(salts × budget) candidates per host, not
  *    the whole pending set: phase 1 ranks within (host, salt) partitions
  *    — parallel, skew-free — and keeps `rank ≤ budget`; phase 2 ranks the
  *    surviving ≤ salts×budget rows per host exactly. A hot host (Zenodo
  *    with 10^9 pending) never serializes a sort on one partition.
  *  - The global `seqInRound` window orders ≤ Σ budget rows per round —
  *    politeness-bounded, so bounded regardless of frontier size.
  *  - Seen-set: Bloom shards route; the exact table is authoritative
  *    (SeenSet docs). Both are hash-sharded by url so the confirm
  *    anti-join co-locates.
  *  - Docs/datasets/files are append-only Parquet via Glacier snapshots —
  *    immutable files, per-partition lineage in the manifest.
  */
object CrawlLoop {

  final case class CrawlConfig(
      repo: RepoConfig,
      hostBudget: Map[String, Int],
      maxRounds: Int,
      glacierRoot: String,
      /** salts per host for the drain/fetch partitioning */
      salts: Int = 8,
      bloomShards: Int = 64,
      bloomExpectedPerShard: Long = 1L << 16,
      bloomFpp: Double = 0.03,
  )

  private val seqCols = Seq("round", "queryIdx", "pageIdx", "hitIdx")
  private def priority = col("score").desc +: seqCols.map(c => col(c).asc)

  /** Run (or resume) the crawl to completion; returns the Glacier handle. */
  def run(spark: SparkSession, cfg: CrawlConfig): Glacier = {
    import spark.implicits._
    val g = new Glacier(cfg.glacierRoot)

    // ---- bootstrap or resume ----------------------------------------------
    var round: Int = g.currentManifest
      .map(_.metrics.getOrElse("round", 0L).toInt + 1).getOrElse {
        val seeds = SyntheticRepo.seedTasks(cfg.repo)
          .filter(t => Robots.allowed(t.url))
        val seedDs = spark.createDataset(seeds)
        val seedUrls = seedDs.select($"url", lit(0).as("round_seen"))
        val bloom = SeenSet.buildShards(seedUrls, cfg.bloomShards,
          cfg.bloomExpectedPerShard, cfg.bloomFpp)
        g.commit(spark, Seq(
          g.TableWrite("frontier", seedDs.toDF(), g.Replace),
          g.TableWrite("seen", seedUrls, g.Append),
          g.TableWrite("bloom", bloom, g.Replace),
        ), Map("round" -> 0L), note = "bootstrap")
        1
      }

    var pending = g.rowCount("frontier")
    while (pending > 0 && round <= cfg.maxRounds) {
      runRound(spark, g, cfg, round)
      pending = g.rowCount("frontier")
      round += 1
    }
    g
  }

  /** One BSP round: drain → fetch → parse → dedup → snapshot. */
  def runRound(spark: SparkSession, g: Glacier, cfg: CrawlConfig,
               round: Int): Unit = {
    import spark.implicits._

    val frontier = g.read(spark, "frontier").get
    val budgetMap = typedLit(cfg.hostBudget)
    val budget = coalesce(element_at(budgetMap, col("host")), lit(0))

    // ---- phase 1: salt-local rank (parallel, prunes to salts×budget) ------
    val salted = frontier.withColumn("salt",
      pmod(xxhash64(col("url")), lit(cfg.salts.toLong)).cast("int"))
    val w1 = Window.partitionBy(col("host"), col("salt")).orderBy(priority: _*)
    val cand = salted.withColumn("r1", row_number().over(w1))
      .filter(col("r1") <= budget)
    // ---- phase 2: exact per-host rank on the pruned candidates ------------
    val w2 = Window.partitionBy(col("host")).orderBy(priority: _*)
    val ranked = cand.withColumn("rk", row_number().over(w2))
    val selected = ranked.filter(col("rk") <= budget)
      .drop("salt", "r1", "rk")
    // ---- global logical order of the round (≤ Σ budget rows) --------------
    val wSeq = Window.orderBy(priority: _*)
    val withSeq = selected.withColumn("seqInRound", row_number().over(wSeq))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // ---- fetch: salted-host partitioning, executor-pure -------------------
    val repo = cfg.repo
    val parallelism = spark.sparkContext.defaultParallelism
    val fetched: Dataset[RoundFetch] = withSeq
      .repartition(parallelism, col("host"),
        pmod(xxhash64(col("url")), lit(cfg.salts.toLong)))
      .as[SelectedTask]
      .mapPartitions { it =>
        it.map { t =>
          val p = SyntheticRepo.fetch(repo, t.url)
          RoundFetch(t.url, t.host, t.depth, t.seqInRound, p.status,
            p.doc, p.links)
        }
      }
      .persist(StorageLevel.MEMORY_AND_DISK)

    val nFetched = withSeq.count()
    val nOk = fetched.filter($"status" === 200).count()

    // ---- crawl-order log (the parity artifact) ----------------------------
    val log = fetched.select(lit(round).as("round"), $"seqInRound",
      $"url", $"host", $"depth", $"status", size($"links").as("nLinks"))

    // ---- docs: interleaved span documents of fetched pages ----------------
    val docs = fetched.filter($"status" === 200)
      .select(lit(round).as("round"), $"seqInRound",
        $"doc.doc_id".as("doc_id"), $"doc.spans".as("spans"))

    // ---- records: parse + validate (quarantine = drop-and-log) ------------
    val parsedDs = fetched.filter($"status" === 200).flatMap { f =>
      PageParser.parseDatasets(f.host, f.doc)
        .map(Validators.validateDataset)
        .zipWithIndex.map { case (e, i) => (f.seqInRound, i, e.toOption, e.isLeft) }
    }.persist(StorageLevel.MEMORY_AND_DISK)
    val dsQuarantined = parsedDs.filter(_._4).count()
    val datasets = parsedDs.filter(_._3.isDefined)
      .map { case (seq, i, r, _) => (seq, i, r.get) }
      .select(lit(round).as("round"), $"_1".as("seqInRound"),
        $"_2".as("ordinal"), $"_3.*")

    val parsedF = fetched.filter($"status" === 200).flatMap { f =>
      PageParser.parseFiles(f.host, f.doc)
        .map(Validators.validateFile)
        .zipWithIndex.map { case (e, i) => (f.seqInRound, i, e.toOption, e.isLeft) }
    }.persist(StorageLevel.MEMORY_AND_DISK)
    val filesQuarantined = parsedF.filter(_._4).count()
    val files = parsedF.filter(_._3.isDefined)
      .map { case (seq, i, r, _) => (seq, i, r.get) }
      .select(lit(round).as("round"), $"_1".as("seqInRound"),
        $"_2".as("ordinal"), $"_3.*")

    // ---- discovered links → frontier candidates ---------------------------
    val robotsOk = udf((u: String) => Robots.allowed(u))
    val links = fetched.filter($"status" === 200)
      .select($"seqInRound", $"depth", explode($"links").as("l"))
      .select($"seqInRound", $"depth", $"l.url".as("url"),
        $"l.ordinal".as("ordinal"), $"l.score".as("score"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nLinks = links.count()
    val allowedLinks = links.filter(robotsOk($"url"))
    val nRobotsExcluded = nLinks - allowedLinks.count()

    // first-wins within the round: earliest (seqInRound, ordinal) per url
    val wUrl = Window.partitionBy($"url")
      .orderBy($"seqInRound".asc, $"ordinal".asc)
    val firstWins = allowedLinks
      .withColumn("rn", row_number().over(wUrl)).filter($"rn" === 1).drop("rn")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nFirstWins = firstWins.count()

    // seen check: Bloom fast path + exact confirm
    val seenExact = g.read(spark, "seen").get
    val bloomShards: Map[Int, Array[Byte]] =
      g.read(spark, "bloom").get.as[(Int, Array[Byte])].collect().toMap
    val newLinks = SeenSet.filterNew(firstWins, bloomShards, seenExact,
      cfg.bloomShards).persist(StorageLevel.MEMORY_AND_DISK)
    val nEnqueued = newLinks.count()

    val newTasks = newLinks.select(
      $"url",
      substring_index($"url", ":", 1).as("host"),
      ($"depth" + 1).as("depth"),
      $"score",
      lit(round).as("round"),
      $"seqInRound".as("queryIdx"),
      lit(0).as("pageIdx"),
      $"ordinal".as("hitIdx"))

    val remaining = frontier.join(withSeq.select($"url".as("__sel")),
      $"url" === $"__sel", "left_anti")
    val newFrontier = remaining.select(frontierCols: _*)
      .unionByName(newTasks.select(frontierCols: _*))

    val newSeenUrls = newLinks.select($"url", lit(round).as("round_seen"))
    val deltaBloom = SeenSet.buildShards(newSeenUrls, cfg.bloomShards,
      cfg.bloomExpectedPerShard, cfg.bloomFpp)
    val mergedBloom = SeenSet.mergeShards(
      g.read(spark, "bloom").get, deltaBloom)

    val metrics = Map(
      "round" -> round.toLong,
      "fetched" -> nFetched,
      "ok" -> nOk,
      "robots_excluded" -> nRobotsExcluded,
      "dup_in_round" -> (allowedLinks.count() - nFirstWins),
      "seen_hits" -> (nFirstWins - nEnqueued),
      "enqueued" -> nEnqueued,
      "datasets_quarantined" -> dsQuarantined,
      "files_quarantined" -> filesQuarantined,
    )

    g.commit(spark, Seq(
      g.TableWrite("frontier", newFrontier, g.Replace),
      g.TableWrite("seen", newSeenUrls, g.Append),
      g.TableWrite("bloom", mergedBloom, g.Replace),
      g.TableWrite("crawl_log", log, g.Append),
      g.TableWrite("docs", docs, g.Append),
      g.TableWrite("datasets", datasets, g.Append),
      g.TableWrite("files", files, g.Append),
    ), metrics, note = s"round $round")

    Seq(withSeq, fetched, parsedDs, parsedF, links, firstWins, newLinks)
      .foreach(_.unpersist(blocking = false))
  }

  private val frontierCols =
    Seq("url", "host", "depth", "score", "round", "queryIdx", "pageIdx", "hitIdx")
      .map(col)

  final case class SelectedTask(url: String, host: String, depth: Int,
      score: Double, round: Int, queryIdx: Int, pageIdx: Int, hitIdx: Int,
      seqInRound: Int)

  final case class RoundFetch(url: String, host: String, depth: Int,
      seqInRound: Int, status: Int, doc: Doc, links: Seq[DiscoveredLink])
}
