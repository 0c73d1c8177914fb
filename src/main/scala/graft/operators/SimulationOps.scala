package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deep nested-JSON extraction + simulation-metadata validation — the
  * NOMAD/MDDB surface (reference scrapers/nomad.py:248-372,
  * models/simulation.py:140-278): a 4-level JSON document is synthesized
  * deterministically per row, then deep paths are extracted and validated
  * (value-with-unit timestep parse, temperature normalization to Kelvin,
  * PDB URL computation) with codegen'd column expressions — no UDF.
  *
  * Scale: the JSON build + extraction is a narrow per-row map over a
  * single-column scan; at 100 TB this pipelines entirely inside
  * whole-stage codegen with no shuffle.
  */
object SimulationOps {
  import Tables.t

  private val NumPat = "([-+]?\\d*\\.?\\d+)"

  /** Normalize a temperature-with-unit string column to Kelvin
    * (simulation.py:230-278): trailing C or negative → +273.15. */
  def tempToKelvin(raw: Column): Column = {
    val num = regexp_extract(raw, NumPat, 1).cast("double")
    when(instr(raw, "C") > 0 || num < 0, num + 273.15).otherwise(num)
  }

  def entries: Seq[QueryEntry] = Seq(
    QueryEntry(
      "q_simulation_parse",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"))
        val sw = element_at(
          array(lit("gromacs"), lit("namd"), lit("openmm")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int"))
        val tsFs = (pmod(col("doc_id"), lit(4)) + 1).cast("string")
        val atoms = (pmod(col("doc_id") * 37, lit(999000)) + 1000).cast("string")
        val m3 = pmod(col("doc_id"), lit(3))
        val temp = when(m3 === 0,
            concat((pmod(col("doc_id"), lit(40)) + 280).cast("string"), lit("K")))
          .when(m3 === 1,
            concat((pmod(col("doc_id"), lit(40)) + 5).cast("string"), lit("C")))
          .otherwise((pmod(col("doc_id"), lit(40)) + 290).cast("string"))
        val pdb = lpad(pmod(col("doc_id"), lit(9999)).cast("string"), 4, "0")
        val j = concat(
          lit("""{"results":{"method":{"simulation":{"program_name":""""), sw,
          lit("""","integration_timestep":""""), tsFs, lit("""fs"}},"""),
          lit(""""properties":{"structures":{"structure_original":{"n_atoms":"""),
          atoms, lit(""","temperature":""""), temp, lit(""""}}}},"""),
          lit(""""material":{"topology":[{"label":"mol","pdb_id":""""), pdb,
          lit(""""}]}}"""))
        val withJ = d.withColumn("j", j)
        val tRaw = get_json_object(col("j"),
          "$.results.properties.structures.structure_original.temperature")
        val ts = regexp_extract(
          get_json_object(col("j"),
            "$.results.method.simulation.integration_timestep"),
          NumPat, 1).cast("double")
        withJ.select(
          col("doc_id"),
          get_json_object(col("j"),
            "$.results.method.simulation.program_name").as("program_name"),
          get_json_object(col("j"),
            "$.results.properties.structures.structure_original.n_atoms")
            .cast("long").as("n_atoms"),
          tempToKelvin(tRaw).as("temp_kelvin"),
          ts.as("timestep_fs"),
          concat(lit("https://www.rcsb.org/structure/"),
            get_json_object(col("j"), "$.material.topology[0].pdb_id"))
            .as("pdb_url"))
          .filter(col("timestep_fs") > 0) // positive-check validator
          .orderBy("doc_id")
      },
      Some(s"""WITH src AS (
          SELECT doc_id,
            '{"results":{"method":{"simulation":{"program_name":"'
            || (CASE doc_id % 3 WHEN 0 THEN 'gromacs' WHEN 1 THEN 'namd'
                ELSE 'openmm' END)
            || '","integration_timestep":"' || CAST(doc_id % 4 + 1 AS VARCHAR)
            || 'fs"}},"properties":{"structures":{"structure_original":{"n_atoms":'
            || CAST((doc_id * 37) % 999000 + 1000 AS VARCHAR)
            || ',"temperature":"'
            || (CASE doc_id % 3
                WHEN 0 THEN CAST(doc_id % 40 + 280 AS VARCHAR) || 'K'
                WHEN 1 THEN CAST(doc_id % 40 + 5 AS VARCHAR) || 'C'
                ELSE CAST(doc_id % 40 + 290 AS VARCHAR) END)
            || '"}}}},"material":{"topology":[{"label":"mol","pdb_id":"'
            || lpad(CAST(doc_id % 9999 AS VARCHAR), 4, '0') || '"}]}}' AS j
          FROM documents),
        ex AS (
          SELECT doc_id,
            json_extract_string(j, '$$.results.method.simulation.program_name')
              AS program_name,
            CAST(json_extract_string(j,
              '$$.results.properties.structures.structure_original.n_atoms')
              AS BIGINT) AS n_atoms,
            json_extract_string(j,
              '$$.results.properties.structures.structure_original.temperature')
              AS traw,
            CAST(regexp_extract(json_extract_string(j,
              '$$.results.method.simulation.integration_timestep'),
              '$NumPat', 1) AS DOUBLE) AS timestep_fs,
            json_extract_string(j, '$$.material.topology[0].pdb_id') AS pdb
          FROM src)
        SELECT doc_id, program_name, n_atoms,
          CASE WHEN contains(traw, 'C')
                 OR CAST(regexp_extract(traw, '$NumPat', 1) AS DOUBLE) < 0
               THEN CAST(regexp_extract(traw, '$NumPat', 1) AS DOUBLE) + 273.15
               ELSE CAST(regexp_extract(traw, '$NumPat', 1) AS DOUBLE)
          END AS temp_kelvin,
          timestep_fs,
          'https://www.rcsb.org/structure/' || pdb AS pdb_url
        FROM ex WHERE timestep_fs > 0 ORDER BY doc_id"""),
    ),
  )
}
