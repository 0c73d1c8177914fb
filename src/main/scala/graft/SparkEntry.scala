package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every operator suite's QueryEntry list into the
  * `queries` / `oracleSql` maps the driver's Verify/Bench mains consume.
  */
object SparkEntry {

  /** All operator suites. Order is cosmetic (maps are keyed by name). */
  def allEntries: Seq[QueryEntry] =
    operators.Relational.entries ++
      operators.ScalarQueries.entries ++
      operators.DedupOps.entries ++
      operators.SimilarityOps.entries ++
      operators.TextAnalysis.entries ++
      operators.TemporalJoins.entries ++
      operators.SpanOps.entries ++
      operators.MultimodalOps.entries ++
      operators.FileParsers.entries ++
      operators.SimulationOps.entries ++
      operators.AnalyzeOps.entries ++
      operators.GraphOps.entries ++
      operators.BucketedOps.entries ++
      sources.NmrLipidsSource.entries ++
      sources.JsonlStore.entries ++
      plans.TopKPerKey.entries ++
      streaming.StreamQueries.entries ++
      operators.CrawlQueries.entries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_pricing")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allEntries.map(e => e.name -> e.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allEntries.flatMap(e => e.oracle.map(e.name -> _)).toMap
}
