package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.crawl._
import graft.crawl.CrawlLoop.CrawlConfig
import graft.operators.AnalyzeOps

/** Capstone: the full mdws user journey composed end-to-end on the engine —
  * crawl all six sources → exclusion/false-positive post-pass → download +
  * zip extraction → .gro/.mdp parameter parsing → analysis rollups — with
  * the final analysis numbers recomputed independently from the sequential
  * oracle + the deterministic file bodies. A reference user switching to
  * this library runs exactly this chain (run_all.sh:1-56 → analyze.py).
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private val repo = RepoConfig(seed = 99L, universe = 200,
    fileTypes = Seq("gro", "mdp"), pageSize = 20, maxHitsPerQuery = 80,
    cursorPages = 3, gpcrmdCount = 15, mddbCount = 20)
  private val budget = Map("zenodo" -> 40, "figshare" -> 25, "osf" -> 25,
    "nomad" -> 5, "gpcrmd" -> 15, "mddb" -> 12)

  test("crawl → clean → download → parse → analyze, checked against the oracle") {
    val root = Files.createTempDirectory("pipeline").toString
    val g = CrawlLoop.run(spark, CrawlConfig(repo, budget, maxRounds = 7,
      root, salts = 4, bloomShards = 8, bloomExpectedPerShard = 1 << 12))
    DownloadStage.run(spark, g, repo, Seq("gro", "mdp"), withZipFiles = true)
    val oracle = ReferenceCrawl.run(repo, budget, maxRounds = 7)

    // --- every parsed parameter row traces back to a downloaded body -----
    val cacheUrls = g.read(spark, "download_cache").get
      .select("file_url").collect().map(_.getString(0)).toSet
    val mdp = g.read(spark, "mdp_params").get.collect()
    val gro = g.read(spark, "gro_params").get.collect()
    assert(mdp.nonEmpty && gro.nonEmpty)
    (mdp ++ gro).foreach(r =>
      assert(cacheUrls.contains(r.getAs[String]("file_url"))))

    // --- engine classification over the CLEANED files table matches a
    // pure recomputation from the oracle's cleaned rows -------------------
    val engineCounts = g.read(spark, "files_clean").get
      .groupBy(AnalyzeOps.extEngine(col("file_type")).as("engine")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expectedCounts = oracle.filesClean
      .groupBy { f =>
        val e = f.file_type.toLowerCase
        if (AnalyzeOps.gromacsExts.contains(e)) "gromacs"
        else if (AnalyzeOps.namdExts.contains(e)) "namd"
        else if (AnalyzeOps.amberExts.contains(e)) "amber"
        else "other"
      }.view.mapValues(_.size.toLong).toMap
    assert(engineCounts === expectedCounts)

    // --- thermostat distribution from the parsed mdp table matches a
    // direct parse of the same deterministic bodies -----------------------
    val engineTherm = mdp
      .groupBy(_.getAs[String]("thermostat"))
      .view.mapValues(_.size).toMap
    val tcRe = "(?i)tcoupl\\s*=\\s*([^\\s\\n]+)".r
    val norm = Map("no" -> "no", "berendsen" -> "Berendsen",
      "nosehoover" -> "Nose-Hoover", "andersen" -> "Andersen",
      "vrescale" -> "V-rescale")
    val expectedTherm = mdp.map { r =>
      val body = SyntheticRepo.fileContent(repo, r.getAs[String]("file_url"))
      val raw = tcRe.findAllMatchIn(body).toSeq.last.group(1)
      norm.getOrElse(raw.toLowerCase.replace("-", "").replace("_", ""),
        "unknown")
    }.groupBy(identity).view.mapValues(_.size).toMap
    assert(engineTherm === expectedTherm)
    assert(engineTherm.keySet.size >= 3) // distribution is non-degenerate
  }
}
