package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ResidueCatalog

class ResidueCatalogSpec extends AnyFunSuite {

  test("full catalog loaded: 5 classes, published cardinalities") {
    // raw file: protein 52, lipid 115, nucleic 79, water_ion 36, glucid 37
    // (params/residue_names.yml; `ligand` exists there but is never loaded,
    // parse_gro_files.py:103-110). Post dual-class removal, nucleic and
    // glucid each lose one member.
    assert(ResidueCatalog.proteinSet.size === 52)
    assert(ResidueCatalog.lipidSet.size === 115)
    assert(ResidueCatalog.nucleicSet.size === 78)
    assert(ResidueCatalog.waterIonSet.size === 36)
    assert(ResidueCatalog.glucidSet.size === 36)
  }

  test("dual-class residue 2MA removed from BOTH classes (D4)") {
    // 2MA is the one residue of the published file present in two loaded
    // classes (nucleic ∩ glucid); read_residue_file removes it from both
    // (parse_gro_files.py:112-121)
    assert(!ResidueCatalog.nucleicSet.contains("2MA"))
    assert(!ResidueCatalog.glucidSet.contains("2MA"))
    assert(ResidueCatalog.classes.values.forall(!_.contains("2MA")))
    // near neighbors that do NOT collide stay put
    assert(ResidueCatalog.glucidSet.contains("0MA"))
    assert(ResidueCatalog.nucleicSet.contains("1MA"))
  }

  test("classes are pairwise disjoint after removal") {
    val names = ResidueCatalog.classes.keys.toSeq
    for {
      i <- names.indices
      j <- (i + 1) until names.size
    } assert(
      (ResidueCatalog.classes(names(i)) intersect
        ResidueCatalog.classes(names(j))).isEmpty,
      s"${names(i)} ∩ ${names(j)} non-empty")
  }

  test("a gro body carrying ONLY 2MA classifies false on every class") {
    val spark = SparkTestSession.get
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val body = "2ma only\n    1\n    1 2MA    C1   1   1.000   2.000   3.000"
    val store = Seq(("u://x.gro", "m", "x.gro", "d", "gro", body, 1))
      .toDF("file_url", "file_md5", "file_name", "dataset_id", "file_type",
        "content", "attempts")
    val row = graft.crawl.DownloadStage.parseGroParams(store).collect()(0)
    Seq("has_protein", "has_nucleic", "has_lipid", "has_glucid",
      "has_water_ion").foreach { c =>
      assert(!row.getAs[Boolean](c), s"$c must be false for a 2MA-only body")
    }
  }
}
