package graft.operators

import graft.{BenchDirs, QueryEntry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed (co-located) joins — the 100 TB answer to "this join key is hit
  * every day": write both sides bucketed AND sorted by the key once, and
  * every subsequent equi-join on that key is planned as a SortMergeJoin
  * with NO shuffle exchange and NO sort on either side (bucket i joins
  * bucket i in place). On a 1000-executor cluster this turns the pipeline's
  * recurring fact⋈fact join from a full-network shuffle into a local merge
  * — the single biggest repeated-cost lever the storage layout owns
  * (Glacier's snapshot dirs would carry the bucket spec in the manifest).
  *
  * The entry measures the WHOLE story end-to-end: bucketed write of both
  * tables + the exchange-free join. `BucketedOpsSpec` pins the plan shape
  * (exactly one exchange — the final groupBy — and none between the scans
  * and the join).
  */
object BucketedOps {

  /** Write `df` as a bucketed, per-bucket-sorted external parquet table
    * (in-memory catalog — no Hive needed), replacing any previous
    * registration of `table`. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    buckets: Int, key: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // Pre-partition by the bucket key into `buckets` partitions: hash
    // repartitioning and bucket assignment share the same
    // pmod(murmur3(key), n), so each write task holds exactly one
    // bucket's rows — the sort+write runs `buckets`-way parallel and
    // still emits ONE file per bucket. Without this, a single-split
    // input writes every bucket from one task (the sf tables are one
    // row group — see Tables.fanOut), and a many-partition input at
    // scale would emit partitions×buckets files. Read side and join
    // plan are unchanged (BucketedOpsSpec pins the exchange-free shape).
    df.repartition(buckets, col(key)).write.mode("overwrite")
      .format("parquet").option("path", path)
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)
  }

  /** Bucketed orders ⋈ lineitem by order key + rollup by priority. */
  def bucketedOrdersJoin(spark: SparkSession, dir: String): DataFrame = {
    val scratch = BenchDirs.scratchDir("bucketed")
    writeBucketed(Tables.t(spark, dir, "orders")
        .select("o_orderkey", "o_orderpriority"),
      "graft_b_orders", s"$scratch/orders", 8, "o_orderkey")
    writeBucketed(Tables.t(spark, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice"),
      "graft_b_lineitem", s"$scratch/lineitem", 8, "l_orderkey")
    joinBucketed(spark)
  }

  /** The recurring query against the bucketed layout (exchange-free join).
    * The merge hint pins the 100 TB fact⋈fact shape — at test scale AQE
    * would otherwise broadcast the small side and never exercise the
    * bucket-aligned SortMergeJoin this layout exists for. */
  def joinBucketed(spark: SparkSession): DataFrame =
    spark.table("graft_b_orders").hint("merge")
      .join(spark.table("graft_b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_extendedprice").cast("decimal(28,6)")).cast("double")
          .as("revenue"))
      .orderBy("o_orderpriority")

  def entries: Seq[QueryEntry] = Seq(
    QueryEntry(
      "q_bucketed_join",
      (s, dir) => bucketedOrdersJoin(s, dir),
      Some("""SELECT o_orderpriority, count(*) AS n_lines,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
            AS revenue
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          GROUP BY 1 ORDER BY 1"""),
    ),
  )
}
