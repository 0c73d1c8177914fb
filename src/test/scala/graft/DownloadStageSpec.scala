package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.crawl._
import graft.crawl.CrawlLoop.CrawlConfig
import graft.model.FileRecord

/** The post-crawl download + zip-extraction + parse stage
  * (scripts/download_files.py + parse_{gro,mdp}_files.py): selection-mode
  * equivalence against a straight re-implementation of the pandas logic,
  * pooch cache semantics (second run downloads nothing), and parse
  * correctness of the committed gro/mdp parameter tables.
  */
class DownloadStageSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private val repo = RepoConfig(seed = 77L, universe = 150,
    fileTypes = Seq("gro", "mdp"), pageSize = 20, maxHitsPerQuery = 60)
  private val budget = Map("zenodo" -> 30, "figshare" -> 20, "osf" -> 15)
  private val types = Seq("gro", "mdp")

  private lazy val (g, oracle) = {
    val root = Files.createTempDirectory("dl-stage").toString
    val gl = CrawlLoop.run(spark, CrawlConfig(repo, budget, maxRounds = 8,
      root, salts = 4, bloomShards = 8, bloomExpectedPerShard = 1 << 12))
    (gl, ReferenceCrawl.run(repo, budget, maxRounds = 8))
  }

  /** select_files_to_download re-implemented verbatim on the oracle's
    * cleaned files frame (download_files.py:68-139). */
  private def referenceSelect(files: Vector[FileRecord], mode: String): Vector[FileRecord] =
    mode match {
      case "no"  => files.filter(f =>
        f.containing_archive_file_name.isEmpty && types.contains(f.file_type))
      case "yes" => files.filter(f =>
        f.containing_archive_file_name.isDefined && types.contains(f.file_type))
      case "zip" =>
        val zips = files.filter(f => f.containing_archive_file_name.isDefined &&
          types.contains(f.file_type))
          .map(f => (f.dataset_id_in_repository, f.containing_archive_file_name.get))
          .distinct.toSet
        files.filter(f =>
          zips.contains((f.dataset_id_in_repository, f.file_name)))
    }

  private def urls(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select("file_url_in_repository").collect().map(_.getString(0)).toSet

  test("selection modes match the reference logic on the cleaned files table") {
    val files = g.read(spark, "files_clean").get
    assert(urls(DownloadStage.selectFiles(files, types, DownloadStage.DirectFiles))
      === referenceSelect(oracle.filesClean, "no").map(_.file_url_in_repository).toSet)
    assert(urls(DownloadStage.selectFiles(files, types, DownloadStage.InZipFiles))
      === referenceSelect(oracle.filesClean, "yes").map(_.file_url_in_repository).toSet)
    assert(urls(DownloadStage.selectFiles(files, types, DownloadStage.ZipArchives))
      === referenceSelect(oracle.filesClean, "zip").map(_.file_url_in_repository).toSet)
    // non-degenerate: all three selections non-empty, zip archives are zips
    assert(referenceSelect(oracle.filesClean, "no").nonEmpty)
    assert(referenceSelect(oracle.filesClean, "yes").nonEmpty)
    assert(referenceSelect(oracle.filesClean, "zip").forall(_.file_type == "zip"))
  }

  test("pooch cache: first run fetches, second run is all cache hits") {
    val m1 = DownloadStage.run(spark, g, repo, types, withZipFiles = true)
    assert(m1("dl_downloaded") > 0)
    assert(m1("dl_extracted") > 0)
    assert(m1("dl_cache_hits") === 0)
    // retry envelope exercised: some downloads needed a second attempt
    assert(m1("dl_attempts") > m1("dl_downloaded"))

    val m2 = DownloadStage.run(spark, g, repo, types, withZipFiles = true)
    assert(m2("dl_downloaded") === 0)
    assert(m2("dl_extracted") === 0)
    assert(m2("dl_cache_hits") === m2("dl_targets"))
    // the second run's store is identical — same cache row count
    val cacheRows = g.read(spark, "download_cache").get.count()
    assert(cacheRows === m1("dl_downloaded") + m1("dl_extracted"))
  }

  test("parsed mdp/gro parameter tables decode the downloaded bodies") {
    DownloadStage.run(spark, g, repo, types, withZipFiles = true)
    val mdp = g.read(spark, "mdp_params").get.collect()
    val gro = g.read(spark, "gro_params").get.collect()
    assert(mdp.nonEmpty && gro.nonEmpty)

    // spot-check every mdp row against a direct parse of the same body
    mdp.foreach { r =>
      val url = r.getAs[String]("file_url")
      val body = SyntheticRepo.fileContent(repo, url)
      val dtExpected = "(?i)dt\\s*=\\s*([^\\s\\n]+)".r
        .findAllMatchIn(body).toSeq.last.group(1).toDouble
      assert(r.getAs[Double]("dt") === dtExpected, url)
      assert(r.getAs[Long]("nsteps") ===
        "(?i)nsteps\\s*=\\s*([^\\s\\n]+)".r
          .findAllMatchIn(body).toSeq.last.group(1).toLong, url)
      assert(r.getAs[String]("thermostat") !== null)
    }
    // last-match-wins: bodies with the duplicated dt line parse to 0.009
    assert(mdp.exists(_.getAs[Double]("dt") == 0.009))

    gro.foreach { r =>
      val url = r.getAs[String]("file_url")
      val body = SyntheticRepo.fileContent(repo, url)
      val lines = body.split("\n")
      assert(r.getAs[Int]("atom_number") === lines(1).trim.toInt, url)
      val resnames = lines.drop(2).map(l => l.slice(5, 10).trim).toSet
      assert(r.getAs[Boolean]("has_lipid") ===
        resnames.exists(Seq("DPPC", "POPC", "DOPC").contains), url)
    }
    // zip members made it into the parse tables (extraction worked)
    assert(mdp.exists(_.getAs[String]("file_url").startsWith("zip://")) ||
      gro.exists(_.getAs[String]("file_url").startsWith("zip://")))
  }
}
