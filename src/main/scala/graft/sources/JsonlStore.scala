package graft.sources

import graft.{BenchDirs, QueryEntry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL (newline-delimited JSON) sink + source — THE interchange format
  * for LLM training corpora. The writer emits one JSON object per line
  * (splittable, schema carried per record); the reader takes an EXPLICIT
  * schema so ingestion never depends on Spark's sampling-based inference
  * (which can flip types between runs on dirty corpora and forces an extra
  * pass over the data at 100 TB).
  *
  * The roundtrip entry proves byte fidelity through the format: every text
  * byte and the (doc_id ↔ text) association must survive write+read, or
  * the md5-derived checksum sums diverge from the oracle (which reads the
  * original parquet — the JSONL hop exists only on the Spark side).
  */
object JsonlStore {

  /** One JSON object per line, Spark's native JSON datasource (codegen'd
    * Jackson per partition — no driver involvement, no UDFs). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Schema-first JSONL read (no inference pass — see object scaladoc). */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("n_chars", LongType)))

  private def h32(c: org.apache.spark.sql.Column) = Tables.h32(c)

  def entries: Seq[QueryEntry] = Seq(
    QueryEntry(
      "q_jsonl_roundtrip",
      (s, dir) => {
        val docs = Tables.t(s, dir, "documents")
          .select("doc_id", "text", "lang", "n_chars")
        val path = BenchDirs.scratchDir("jsonl") + "/documents"
        writeJsonl(docs, path)
        readJsonl(s, path, docSchema)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"),
            sum(h32(col("text"))).as("text_hash_sum"),
            sum(h32(concat(col("doc_id").cast("string"), lit(":"),
              col("text")))).as("pair_hash_sum"))
          .orderBy("lang")
      },
      Some("""SELECT lang, count(*) AS n_docs,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars,
          CAST(sum(CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT))
            AS BIGINT) AS text_hash_sum,
          CAST(sum(CAST(('0x' || substr(md5(doc_id || ':' || text), 1, 8))
            AS BIGINT)) AS BIGINT) AS pair_hash_sum
          FROM documents GROUP BY lang ORDER BY lang"""),
    ),
  )
}
