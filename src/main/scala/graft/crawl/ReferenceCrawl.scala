package graft.crawl

import scala.collection.mutable
import graft.model._

/** Crawl semantics, shared by the sequential oracle and the Spark engine.
  *
  * The logical crawl is BSP rounds over a priority frontier:
  *  - A task's identity for ordering is its discovery sequence
  *    (round, queryIdx, pageIdx, hitIdx) — minted once, never recomputed.
  *  - Priority: score DESC, then discovery sequence ASC (FIFO among equal
  *    scores) — the north rule's host-budget + depth + dataset-type score
  *    queue, with the score encoding dataset-type and the budget applied
  *    per host per round.
  *  - Each round: per host, drain the top `hostBudget(host)` tasks (the
  *    politeness token bucket in simulated time — one round = one budget
  *    refill interval, mirroring Zenodo's 100 req/min / Figshare's 1 req/s
  *    limits, docs/zenodo.md:31-35, figshare_api.py:69-73).
  *  - The round's *logical fetch order* = all selected tasks sorted by
  *    priority globally; `seqInRound` (1-based) indexes it. The crawl-order
  *    log is the parity artifact.
  *  - Discovered links are processed in (parent seqInRound, in-page
  *    ordinal) order: robots gate → first-wins dedup within the round →
  *    URL-seen check (seen = every URL ever *enqueued*, exact membership)
  *    → enqueue as (round=r, queryIdx=parentSeq, pageIdx=0, hitIdx=ordinal).
  */
object CrawlSpec {
  /** Priority ordering: score desc, discovery sequence asc. */
  val taskOrder: Ordering[FetchTask] =
    Ordering.by((t: FetchTask) => (-t.score, t.round, t.queryIdx, t.pageIdx, t.hitIdx))

  def childTask(url: String, parentDepth: Int, round: Int,
                parentSeq: Int, ordinal: Int): FetchTask =
    FetchTask(url, url.takeWhile(_ != ':'), parentDepth + 1,
      PageParser.scoreOf(url), round, parentSeq, 0, ordinal)

  /** Fixed-two-round OSF node-graph closure (S12): the reference expands
    * children+parents exactly TWICE over the search-found set
    * (scrape_osf.py:493-494 calls add_children_parent_datasets back to
    * back) — nodes reached by the second expansion are still fetched, but
    * their own node links are never followed. Depths here: search page 0,
    * search-found nodes 1, expansion rounds land at 2 and 3; node links
    * minted by a depth-3 node would be a third expansion → dropped before
    * any other gate (the reference never generates them at all).
    */
  def linkAllowed(parentDepth: Int, url: String): Boolean =
    !(url.startsWith("osf://node/") && parentDepth >= 3)
}

final case class LogEntry(round: Int, seqInRound: Int, url: String,
                          host: String, depth: Int, status: Int, nLinks: Int,
                          attempts: Int, schedSec: Double)

final case class CrawlResult(
    log: Vector[LogEntry],
    seen: Set[String],
    docs: Map[String, Seq[Span]],
    datasets: Vector[DatasetRecord],
    files: Vector[FileRecord],
    metrics: Vector[Map[String, Long]],
    /** post-pass outputs (exclusion filter → false-positive removal,
      * zenodo.py:625-639): cleaned tables in original order, per-pattern
      * exclusion counts, removed dataset ids. */
    datasetsClean: Vector[DatasetRecord] = Vector.empty,
    filesClean: Vector[FileRecord] = Vector.empty,
    exclusionCounts: Map[String, Long] = Map.empty,
    falsePositiveIds: Set[String] = Set.empty,
)

/** The sequential oracle: a straightforward single-threaded implementation
  * of [[CrawlSpec]] (mutable queue + LinkedHashSet), playing the role the
  * single-threaded reference plays for the Spark engine. Every parity test
  * asserts the distributed engine reproduces this byte-for-byte at any
  * parallelism.
  */
object ReferenceCrawl {

  /** Post-pass (toolbox.py:265-325 + 328-466, run on every scrape's
    * output): exclusion filter with first-match-wins per-pattern counts
    * (path containment before basename prefix), then false-positive
    * removal — datasets whose remaining files carry no MD file type are
    * dropped from BOTH tables. Datasets with zero file rows are kept (the
    * reference only inspects datasets present in the files frame).
    */
  def clean(cu: CleanupConfig, datasets: Vector[DatasetRecord],
            files: Vector[FileRecord])
      : (Vector[DatasetRecord], Vector[FileRecord], Map[String, Long], Set[String]) = {
    val counts = mutable.LinkedHashMap.empty[String, Long]
    val kept = files.filter { f =>
      cu.excludedPathPatterns.find(p => f.file_name.contains(p)) match {
        case Some(p) =>
          val k = s"in path: $p"; counts(k) = counts.getOrElse(k, 0L) + 1; false
        case None =>
          val base = f.file_name.substring(f.file_name.lastIndexOf('/') + 1)
          cu.excludedFilePatterns.find(base.startsWith) match {
            case Some(p) =>
              val k = s"starting with: $p"
              counts(k) = counts.getOrElse(k, 0L) + 1; false
            case None => true
          }
      }
    }
    val md = cu.mdFileTypes.toSet
    val fp = kept.groupBy(_.dataset_id_in_repository).collect {
      case (id, fs) if !fs.exists(f => md.contains(f.file_type)) => id
    }.toSet
    (datasets.filterNot(d => fp(d.dataset_id_in_repository)),
      kept.filterNot(f => fp(f.dataset_id_in_repository)), counts.toMap, fp)
  }

  def run(cfg: RepoConfig, hostBudget: Map[String, Int],
          maxRounds: Int,
          cleanup: CleanupConfig = CleanupConfig(),
          client: Option[FetchClient] = None): CrawlResult = {
    val fetchClient: FetchClient = client.getOrElse(SyntheticFetchClient(cfg))
    val frontier = mutable.ArrayBuffer.empty[FetchTask]
    val seen = mutable.LinkedHashSet.empty[String]
    val headSizes = mutable.HashMap.empty[String, Long]
    val log = Vector.newBuilder[LogEntry]
    val docs = mutable.LinkedHashMap.empty[String, Seq[Span]]
    val datasets = Vector.newBuilder[DatasetRecord]
    val files = Vector.newBuilder[FileRecord]
    val metrics = Vector.newBuilder[Map[String, Long]]

    SyntheticRepo.seedTasks(cfg).foreach { t =>
      if (Robots.allowed(t.url) && seen.add(t.url)) frontier += t
    }

    var round = 1
    while (frontier.nonEmpty && round <= maxRounds) {
      // per-host budget drain
      val byHost = frontier.groupBy(_.host)
      val selected = byHost.toSeq.flatMap { case (host, ts) =>
        ts.sorted(CrawlSpec.taskOrder).take(hostBudget.getOrElse(host, 0))
      }.sorted(CrawlSpec.taskOrder)
      val selectedUrls = selected.map(_.url).toSet
      frontier.filterInPlace(t => !selectedUrls.contains(t.url))

      var robotsExcluded = 0L; var dupInRound = 0L; var seenHits = 0L
      var enqueued = 0L; var ok = 0L; var dsQuarantine = 0L; var fileQuarantine = 0L
      var attempts = 0L; var depthGated = 0L
      val roundNew = mutable.HashSet.empty[String]
      // politeness schedule lineage: the k-th fetch a host performs this
      // round is stamped at roundStart + k·(60/rate) simulated seconds
      val hostK = mutable.HashMap.empty[String, Int]
      val roundStart = (round - 1) * Politeness.RoundSeconds

      selected.zipWithIndex.foreach { case (task, i) =>
        val seq = i + 1
        val page = fetchClient.fetch(task.url)
        attempts += page.attempts
        val k = hostK.getOrElse(task.host, 0)
        hostK(task.host) = k + 1
        log += LogEntry(round, seq, task.url, task.host, task.depth,
          page.status, page.links.size, page.attempts,
          Politeness.scheduledSecond(Politeness.policyOf(task.host),
            roundStart, k))
        if (page.status == 200) {
          ok += 1
          docs(page.doc.doc_id) = page.doc.spans
          PageParser.parseDatasets(task.host, page.doc).foreach { d =>
            Validators.validateDataset(d) match {
              case Right(v) => datasets += v
              case Left(_)  => dsQuarantine += 1
            }
          }
          PageParser.parseFiles(task.host, page.doc).foreach { f =>
            Validators.validateFile(f) match {
              case Right(v) => files += v
              case Left(_)  => fileQuarantine += 1
            }
          }
          PageParser.parseHeadSizes(page.doc).foreach(h =>
            headSizes(h.file_url) = h.file_size_in_bytes)
          // accounting order = engine order: robots gate, then first-wins
          // within the round (counts every later occurrence as dup), then
          // the URL-seen check (counts once per distinct url)
          page.links.foreach { l =>
            if (!CrawlSpec.linkAllowed(task.depth, l.url)) depthGated += 1
            else if (!Robots.allowed(l.url)) robotsExcluded += 1
            else if (roundNew.contains(l.url)) dupInRound += 1
            else {
              roundNew += l.url
              if (seen.contains(l.url)) seenHits += 1
              else {
                seen += l.url
                frontier += CrawlSpec.childTask(l.url, task.depth, round, seq, l.ordinal)
                enqueued += 1
              }
            }
          }
        }
      }
      metrics += Map(
        "round" -> round.toLong, "fetched" -> selected.size.toLong,
        "ok" -> ok, "attempts" -> attempts,
        "robots_excluded" -> robotsExcluded, "depth_gated" -> depthGated,
        "dup_in_round" -> dupInRound, "seen_hits" -> seenHits,
        "enqueued" -> enqueued, "frontier_pending" -> frontier.size.toLong,
        "datasets_quarantined" -> dsQuarantine,
        "files_quarantined" -> fileQuarantine)
      round += 1
    }
    val ds = datasets.result(); val fs = files.result()
    val (dsClean, fsClean0, exclCounts, fp) = clean(cleanup, ds, fs)
    // HEAD-probe size fill (post-pass, engine parity)
    val fsClean = fsClean0.map(f =>
      if (f.file_size_in_bytes.isDefined) f
      else f.copy(file_size_in_bytes =
        headSizes.get(f.file_url_in_repository)))
    CrawlResult(log.result(), seen.toSet, docs.toMap, ds, fs,
      metrics.result(), dsClean, fsClean, exclCounts, fp)
  }
}
