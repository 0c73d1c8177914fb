package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model._

/** Nested simulation-metadata validation (reference
  * models/simulation.py:23-278): URL computation, value-with-unit positive
  * checks, temperature normalization, quarantine on invalid payloads.
  */
class SimulationSpec extends AnyFunSuite {

  test("temperatureToKelvin: K, C, bare, negative (simulation.py:230-278)") {
    assert(Validators.temperatureToKelvin("300K") === Some(300.0))
    assert(Validators.temperatureToKelvin("27C") === Some(300.15))
    assert(Validators.temperatureToKelvin("27°C") === Some(300.15))
    assert(Validators.temperatureToKelvin("310") === Some(310.0))
    assert(Validators.temperatureToKelvin("-10") === Some(263.15))
    assert(Validators.temperatureToKelvin("hot") === None)
  }

  test("externalUrl computed only for known databases (simulation.py:47-70)") {
    assert(Validators.externalUrl("PDB", "1ABC") ===
      Some("https://www.rcsb.org/structure/1ABC"))
    assert(Validators.externalUrl("UNIPROT", "P12345") ===
      Some("https://www.uniprot.org/uniprotkb/P12345"))
    assert(Validators.externalUrl("OTHER", "x") === None)
  }

  test("parseSimulation: valid payload, URLs computed, units normalized") {
    val json =
      """{"software":[{"name":"gromacs","version":"2023.1"}],
         "total_number_of_atoms":5000,
         "molecules":[{"name":"popc","type":"LIPID","number_of_molecules":128,
           "external_identifiers":[{"database_name":"PDB","identifier":"1ABC"}]}],
         "forcefields_models":[{"name":"charmm36"}],
         "simulation_timesteps_in_fs":["2fs",0.5],
         "simulation_temperatures":["300K","27C",310]}"""
    val sim = Validators.parseSimulation(json).toOption.get
    assert(sim.software === Seq(Software("gromacs", Some("2023.1"))))
    assert(sim.total_number_of_atoms === Some(5000L))
    assert(sim.molecules.head.external_identifiers.head.url ===
      Some("https://www.rcsb.org/structure/1ABC"))
    assert(sim.simulation_timesteps_in_fs === Seq(2.0, 0.5))
    assert(sim.simulation_temperatures_in_kelvin === Seq(300.0, 300.15, 310.0))
  }

  test("parseSimulation: invalid values quarantine the record") {
    assert(Validators.parseSimulation(
      """{"simulation_timesteps_in_fs":["-1fs"]}""").isLeft)
    assert(Validators.parseSimulation(
      """{"simulation_timesteps_in_fs":[0]}""").isLeft)
    assert(Validators.parseSimulation(
      """{"total_number_of_atoms":-5}""").isLeft)
    assert(Validators.parseSimulation(
      """{"molecules":[{"name":"x","number_of_molecules":-1}]}""").isLeft)
    assert(Validators.parseSimulation("""not json at all""").isLeft)
    assert(Validators.parseSimulation(
      """{"simulation_temperatures":["hot"]}""").isLeft)
  }

  test("6-case protein assembly (mddb.py:303-439)") {
    import Validators.{extractProteins => ep}
    val pdb = Seq(ExternalIdentifier("PDB", "1ABC",
      Some("https://www.rcsb.org/structure/1ABC")))
    // case 1: nothing → anonymous protein only when PDB-anchored
    assert(ep(Seq.empty, Nil, Nil) === Seq.empty)
    assert(ep(pdb, Nil, Nil).map(_.name) === Seq("Protein"))
    // case 2: sequences only → one anonymous protein per sequence
    val c2 = ep(pdb, Nil, Seq("MKV", "MKW"))
    assert(c2.map(_.sequence) === Seq(Some("MKV"), Some("MKW")))
    assert(c2.forall(_.name == "Protein"))
    // case 3: accessions only → named, UniProt id first among identifiers
    val c3 = ep(pdb, Seq("P12345"), Nil)
    assert(c3.map(_.name) === Seq("Protein P12345"))
    assert(c3.head.external_identifiers.head.database_name === "UNIPROT")
    assert(c3.head.external_identifiers.head.url ===
      Some("https://www.uniprot.org/uniprotkb/P12345"))
    // case 4: ONE accession, many sequences → all share the accession
    val c4 = ep(Seq.empty, Seq("P1"), Seq("A", "B", "C"))
    assert(c4.size === 3 && c4.forall(_.name == "Protein P1"))
    // case 5: cardinality mismatch → single Unknown protein iff PDB ids
    assert(ep(Seq.empty, Seq("P1", "P2"), Seq("A", "B", "C")) === Seq.empty)
    assert(ep(pdb, Seq("P1", "P2"), Seq("A", "B", "C")).map(_.name) ===
      Seq("Unknown protein"))
    // case 6: 1:1 zip
    val c6 = ep(Seq.empty, Seq("P1", "noref"), Seq("A", "B"))
    assert(c6.map(_.name) === Seq("Protein P1", "Unknown protein"))
    assert(c6.map(_.sequence.get) === Seq("A", "B"))
  }

  test("parseMddbMeta: flat MDposit envelope (mddb.py:159-713)") {
    val json = """{"PROGRAM":" gromacs ","VERSION":"2023.1",
      "FF":["charmm36"],"WAT":"tip3p","PDBIDS":["1ABC"],
      "REFERENCES":["P12345"],"PROTSEQ":[],"NUCLSEQ":["ACGT"],
      "SOL":1200,"NA":14,"CL":0,"INCHIKEYS":["XYZ-KEY"],
      "TIMESTEP":2,"TEMP":300,"mdAtoms":50000}"""
    val sim = Validators.parseMddbMeta(json).toOption.get
    assert(sim.software === Seq(Software("gromacs", Some("2023.1"))))
    assert(sim.forcefields_models.map(_.name) === Seq("charmm36", "tip3p"))
    // case 3 protein + nucleic + SOL/NA (CL=0 skipped) + inchikey molecule
    assert(sim.molecules.map(_.name) === Seq("Protein P12345",
      "Nucleic acid", "SOL", "NA", "Small molecule"))
    assert(sim.molecules.last.inchikey === Some("XYZ-KEY"))
    assert(sim.simulation_timesteps_in_fs === Seq(2.0))
    assert(sim.simulation_temperatures_in_kelvin === Seq(300.0))
    assert(sim.total_number_of_atoms === Some(50000L))
    // a NEGATIVE timestep quarantines (shared simulation contract), but a
    // FALSY one (0) is `[time_step] if time_step else None` (mddb.py:694):
    // treated as absent, record kept
    assert(Validators.parseMddbMeta("""{"TIMESTEP":-1}""").isLeft)
    val zeroTs = Validators.parseMddbMeta("""{"TIMESTEP":0,"TEMP":300}""")
    assert(zeroTs.isRight)
    assert(zeroTs.toOption.get.simulation_timesteps_in_fs.isEmpty)
    assert(zeroTs.toOption.get.simulation_temperatures_in_kelvin === Seq(300.0))
  }

  test("validateDataset populates simulation from the raw json or quarantines") {
    val base = graft.crawl.PageParser
      .parseDatasets("nomad",
        Doc("nomad://cursor/1-x", graft.crawl.SyntheticRepo
          .recordSpans(graft.crawl.RepoConfig(seed = 5L, universe = 50),
            "nomad", 7, detail = false)))
      .head
    assert(base.simulation_json.isDefined)
    Validators.validateDataset(base) match {
      case Right(v)  => assert(v.simulation.isDefined)
      case Left(msg) => assert(msg.contains("timestep")) // deterministic bad-ts
    }
  }
}
