package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark implementation plus (optionally) an
  * equivalent ANSI SQL string the driver runs in DuckDB over the same parquet
  * tables. Entries without `oracle` get a weaker rows-only check.
  */
final case class QueryEntry(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
)

object Tables {
  /** Read one of the driver-generated parquet tables under `dir`. Plain
    * `spark.read.parquet` so Catalyst keeps full pushdown/pruning freedom.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
