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

  /** 32-bit md5 prefix as an exact long — THE engine-portable checksum /
    * draw primitive (DuckDB mirror:
    * `CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT)`;
    * `Glacier.bloomPositions` carries the driver-side twin). One shared
    * definition so the oracle contracts can't silently desynchronize.
    */
  def h32(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{conv, md5, substring}
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")
  }
}
