package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryEntry, Tables}

/** NMRLipids Databank ingest (S15, reference
  * `scripts/scrape_nmrlipids.py`): a RECURSIVE local-filesystem scan for
  * `README.yaml` files under a Simulations tree (find_all_readmes, :127-131
  * `rglob`), each parsed as flat `KEY: value` YAML into the 15-field record
  * (FIELDS :60-76), numerics normalized to strings
  * (normalize_to_string_or_none, :108-120), `ID` renamed `source_ID` and
  * mandatory — a README without it fails validation and is dropped
  * (:146-159 pydantic try/except).
  *
  * Spark-first shape: ONE `spark.read.text` with recursiveFileLookup +
  * wholetext — the directory walk is the data source's own distributed
  * file listing, not a driver-side glob — then pure regexp column
  * extraction (codegen'd, no UDF). At 100 TB-scale trees the scan
  * parallelizes over files; everything after is narrow.
  */
object NmrLipidsSource {

  /** The reference's FIELDS list (scrape_nmrlipids.py:60-76), minus ID
    * which becomes source_ID. */
  val Fields: Seq[String] = Seq("DOI", "SOFTWARE", "PUBLICATION",
    "AUTHORS_CONTACT", "TYPEOFSYSTEM", "SOFTWARE_VERSION", "FF", "FF_SOURCE",
    "TRAJECTORY_SIZE", "TRJLENGTH", "TEMPERATURE", "NUMBER_OF_ATOMS",
    "DATEOFRUNNING")

  /** All README.yaml files under `root`, one row per file with its path
    * and whole text. */
  def scanReadmes(spark: SparkSession, root: String): DataFrame =
    spark.read
      .option("recursiveFileLookup", "true")
      // prune at LISTING time — a real Simulations tree keeps multi-GB
      // trajectories next to the READMEs, and a post-read filter would
      // wholetext-load every one of them (a >2 GB file doesn't even fit a
      // single wholetext row)
      .option("pathGlobFilter", "README.yaml")
      .option("wholetext", "true")
      .text(root)
      .select(input_file_name().as("path"), col("value").as("content"))
      .filter(col("path").endsWith("/README.yaml"))

  /** LAST `KEY: value` line of a flat YAML body → trimmed value, NULL when
    * the key is absent. yaml.safe_load resolves duplicate keys to the LAST
    * occurrence, so a README with a repeated key must parse to the final
    * value (same last-match-wins rule as FileParsers.mdpField). */
  def yamlField(content: Column, key: String): Column = {
    val all = regexp_extract_all(content,
      lit(s"(?m)^$key:[ \\t]*(.*?)[ \\t]*$$"), lit(1))
    when(size(all) > 0, element_at(all, -1))
  }

  /** Parse + validate scanned READMEs into NMRLipidsRecord rows
    * (scrape_nmrlipids.py:134-159): every field a string-or-null, the
    * mandatory trio injected, records without an ID dropped. */
  def parseReadmes(scanned: DataFrame, crawlingDate: String): DataFrame = {
    val cols = Seq(
      col("path"),
      lit("NMRLipids").as("source"),
      yamlField(col("content"), "ID").as("source_ID"),
      lit(crawlingDate).as("crawling_date"),
      lit("CC-BY 4.0").as("licence"),
    ) ++ Fields.map(f => yamlField(col("content"), f).as(f))
    // an `ID:` line with no value parses to "" — yaml.safe_load gives the
    // reference None there, and the mandatory-ID validation drops the
    // record (scrape_nmrlipids.py:146-159); match that
    scanned.select(cols: _*)
      .filter(col("source_ID").isNotNull && col("source_ID") =!= "")
  }

  def entries: Seq[QueryEntry] = Seq(
    // flat-YAML field extraction as an oracle-checked scalar pipeline:
    // README bodies synthesized per doc_id (optional fields genuinely
    // absent on some rows), the same extraction semantics as parseReadmes
    QueryEntry(
      "q_yaml_parse",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents").select(col("doc_id"))
        val sw = element_at(
          array(lit("gromacs"), lit("namd"), lit("openmm")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int"))
        val content = concat(
          lit("# NMRLipids README\n"),
          lit("ID: "), col("doc_id"), lit("\n"),
          lit("DOI: 10.5281/zenodo."), pmod(col("doc_id"), lit(10000)), lit("\n"),
          lit("SOFTWARE: "), sw, lit("\n"),
          // duplicate key on every 7th doc — pins yaml.safe_load's
          // last-occurrence-wins duplicate-key resolution in the oracle
          when(pmod(col("doc_id"), lit(7)) === 0,
            lit("SOFTWARE: gromacs-2023\n")).otherwise(lit("")),
          when(pmod(col("doc_id"), lit(5)) === 0,
            concat(lit("TEMPERATURE: "), pmod(col("doc_id"), lit(40)) + 290,
              lit("\n"))).otherwise(lit("")),
          lit("NUMBER_OF_ATOMS: "), pmod(col("doc_id") * 31, lit(900000)) + 1000,
          lit("\nTRJLENGTH: "), pmod(col("doc_id"), lit(500)) + 10)
        val withC = d.withColumn("content", content)
        withC.select(
            col("doc_id"),
            yamlField(col("content"), "ID").as("source_id"),
            yamlField(col("content"), "SOFTWARE").as("software"),
            yamlField(col("content"), "TEMPERATURE").as("temperature"),
            yamlField(col("content"), "NUMBER_OF_ATOMS").as("number_of_atoms"),
            yamlField(col("content"), "TRJLENGTH").as("trjlength"),
            yamlField(col("content"), "FF").as("ff"))
          .orderBy("doc_id")
      },
      Some {
        def last(key: String): String =
          s"""list_extract(regexp_extract_all(content,
             '(?m)^$key:[ \t]*(.*?)[ \t]*$$', 1), -1)"""
        s"""WITH src AS (
          SELECT doc_id,
            '# NMRLipids README' || chr(10) ||
            'ID: ' || doc_id || chr(10) ||
            'DOI: 10.5281/zenodo.' || (doc_id % 10000) || chr(10) ||
            'SOFTWARE: ' || (CASE doc_id % 3 WHEN 0 THEN 'gromacs'
              WHEN 1 THEN 'namd' ELSE 'openmm' END) || chr(10) ||
            (CASE WHEN doc_id % 7 = 0
              THEN 'SOFTWARE: gromacs-2023' || chr(10) ELSE '' END) ||
            (CASE WHEN doc_id % 5 = 0
              THEN 'TEMPERATURE: ' || (doc_id % 40 + 290) || chr(10)
              ELSE '' END) ||
            'NUMBER_OF_ATOMS: ' || ((doc_id * 31) % 900000 + 1000) || chr(10) ||
            'TRJLENGTH: ' || (doc_id % 500 + 10) AS content
          FROM documents)
        SELECT doc_id,
          ${last("ID")} AS source_id,
          ${last("SOFTWARE")} AS software,
          ${last("TEMPERATURE")} AS temperature,
          ${last("NUMBER_OF_ATOMS")} AS number_of_atoms,
          ${last("TRJLENGTH")} AS trjlength,
          ${last("FF")} AS ff
        FROM src ORDER BY doc_id"""
      },
    ),
  )
}
