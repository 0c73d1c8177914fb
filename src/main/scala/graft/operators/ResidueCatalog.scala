package graft.operators

/** The FULL residue catalog of the reference's
  * `params/residue_names.yml`, with `read_residue_file`'s dual-class
  * removal applied at build time (scripts/parse_gro_files.py:86-121):
  * the reference loads exactly five classes (protein, lipid, nucleic,
  * water_ion, glucid — `ligand` is present in the file but never loaded,
  * parse_gro_files.py:103-110), then walks `itertools.combinations` over
  * the dict insertion order and removes any residue found in two classes
  * from BOTH (D4). In the published file exactly one residue collides:
  * `2MA` (nucleic ∩ glucid) — post-removal it classifies as NEITHER.
  *
  * The removal is ORDER-sensitive by construction (a residue in three
  * classes would be removed from the first pair and survive in the third),
  * so the fold below replays the combinations in the reference's exact
  * class order rather than computing a symmetric difference.
  */
object ResidueCatalog {

  private val proteinRaw: Seq[String] = Seq(
    "ALA", "ARG", "ASN", "ASP", "ASH", "CYS", "CYS2", "GLN", "GLU", "GLH",
    "GLY", "HIS", "HSD", "HSE", "ILE", "LEU", "LYS", "LYSH", "MET", "PHE",
    "PRO", "SER", "PYL", "THR", "TRP", "TYR", "VAL", "ACE", "NME", "sG",
    "sA", "sV", "sL", "sI", "sP", "sF", "sW", "sD", "sK", "sR", "sC", "sM",
    "sS", "sT", "sN", "sQ", "sHe", "sY", "sE", "HID", "HIE", "HIP")

  private val lipidRaw: Seq[String] = Seq(
    "POPC", "DPPC", "SDPC", "SDPE", "DLPC", "DIPC", "DUPC", "DUPE", "DUPS",
    "DMPC", "DSPC", "DGPC", "SOPC", "POPE", "PPCS", "DPPE", "DLPE", "DIPE",
    "DMPE", "DSPE", "SOPE", "SOPS", "SPCE", "POPS", "POGS", "POSM", "PODG",
    "POGL", "POCE", "OIPC", "DPCE", "POG3", "PNG1", "PNG3", "PAPS", "PUPE",
    "PDOPE", "PUPI", "SAPS", "PAPC", "PIPC", "DPG3", "PIPI", "PIDG",
    "PAPE", "PIPE", "PIP3", "POP3", "PIPS", "PAPI", "POPI", "POP1", "POP2",
    "POPA", "PIPA", "PAPA", "PUPA", "PLPC", "PVPE", "PVPG", "PVCL2",
    "PSUA", "PEUA", "PPPE", "PCUA", "PZPC", "DEPC", "DOPC", "DOPS", "DAPC",
    "DDPC", "DOPE", "DSUA", "POPG", "PADG", "PEPC", "PQPE", "PQPS", "DOPG",
    "DIPS", "DAPS", "DBSM", "DXSM", "BNSM", "DPSM", "PGSM", "PNSM", "SM16",
    "SM18", "SM24", "CHOL", "CHL1", "CLs", "CER16", "PSM", "PLA", "DPP",
    "OPC", "SDS", "LAL", "MY", "PA", "SA", "OL", "ST", "AR", "DHA", "PC",
    "PE", "PS", "PGR", "PGS", "PH", "SPM", "CHL")

  private val nucleicRaw: Seq[String] = Seq(
    "RA5", "RA3", "RAN", "RU5", "RU3", "RUN", "RG5", "RG3", "RGN", "RC5",
    "RC3", "RCN", "DA5", "DA3", "DAN", "DT5", "DT3", "DTN", "DG5", "DG3",
    "DGN", "DC5", "DC3", "DCN", "RA", "RU", "RC", "DA", "DT", "DG", "DC",
    "G5", "A", "U", "G", "C", "rA", "A3", "A5", "rC", "C3", "C5", "rG",
    "RG", "G3", "rU", "U3", "U5", "T", "dT", "dA", "dC", "dG", "1MA",
    "5AA", "P5P", "2MA", "OMC", "5MC", "CBV", "2MG", "YG", "7MG", "OMG",
    "1MG", "M2G", "H2U", "PSU", "OMU", "UR3", "5MU", "5BU", "4SU", "6MA",
    "6AH", "DAX", "DGX", "DTX", "DCX")

  private val waterIonRaw: Seq[String] = Seq(
    "SOL", "TIP3", "TIP", "W", "WF", "WAT", "HOH", "K", "Cl", "CL", "Cl-",
    "CL-", "CA", "CAL", "Cal", "Na", "NA", "Na+", "NA+", "MG", "SOD",
    "CLA", "POT", "K+", "ZN", "ION", "NaW", "KW", "ClW", "CaX", "MgX",
    "ZnX", "WT4", "WLS", "SUL", "SO4")

  private val glucidRaw: Seq[String] = Seq(
    "0ZB", "3YB", "4YB", "UYB", "4ZB", "0GB", "4GB", "0MA", "2MA", "3MA",
    "3MB", "VMB", "0LB", "1LB", "2LB", "3LB", "4LB", "6LB", "ZLB", "YLB",
    "XLB", "WLB", "VLB", "ULB", "TLB", "SLB", "RLB", "QLB", "PLB", "0MU",
    "1MU", "2MU", "3MU", "4MU", "0SA", "0FA", "3VA")

  /** The reference's dict insertion order — the order
    * `itertools.combinations` walks. */
  private val classOrder: Seq[(String, Set[String])] = Seq(
    "protein" -> proteinRaw.toSet, "lipid" -> lipidRaw.toSet,
    "nucleic" -> nucleicRaw.toSet, "water_ion" -> waterIonRaw.toSet,
    "glucid" -> glucidRaw.toSet)

  /** Post-removal class sets, keyed by class name. */
  val classes: Map[String, Set[String]] = {
    val m = scala.collection.mutable.LinkedHashMap(classOrder: _*)
    val names = m.keys.toSeq
    for {
      i <- names.indices
      j <- (i + 1) until names.size
    } {
      val common = m(names(i)) intersect m(names(j))
      if (common.nonEmpty) {
        m(names(i)) = m(names(i)) -- common
        m(names(j)) = m(names(j)) -- common
      }
    }
    m.toMap
  }

  /** Sorted Seq views (deterministic order for typedLit / oracle SQL). */
  val proteinSet: Seq[String] = classes("protein").toSeq.sorted
  val lipidSet: Seq[String] = classes("lipid").toSeq.sorted
  val nucleicSet: Seq[String] = classes("nucleic").toSeq.sorted
  val waterIonSet: Seq[String] = classes("water_ion").toSeq.sorted
  val glucidSet: Seq[String] = classes("glucid").toSeq.sorted

  /** DuckDB list literal of a class set — the oracle SQL embeds the SAME
    * post-removal sets the Spark side uses (single source of truth). */
  def sqlList(set: Seq[String]): String =
    set.map(r => s"'$r'").mkString("[", ",", "]")
}
