package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over the `embeddings`
  * table (`vec_id`, `embedding: array<float>`, `label`).
  *
  * Scale design:
  *  - brute-force top-k: the query vector is a 1-row broadcast cross join;
  *    the scan side stays narrow (one codegen'd higher-order-function pass
  *    per row, no shuffle until the final top-k `orderBy ... limit`, which
  *    Spark executes as TakeOrderedAndProject — per-partition heaps + a
  *    driver merge, NOT a global sort);
  *  - IVF: coarse centroids (here: per-label means, i.e. k-means with given
  *    assignments) are a tiny broadcast table; the probe prunes to nprobe
  *    partitions before any distance work. At 100 TB the data would be
  *    written partitioned by centroid id so the probe becomes partition
  *    pruning at the parquet scan.
  */
object SimilarityOps {
  import Tables.t

  /** Cosine similarity of two array<double> columns, computed as
    * dot / (sqrt(na) * sqrt(nb)) with sequential left-to-right accumulation
    * (bit-identical in DuckDB's scalar evaluation).
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), _ + _)
    val na = aggregate(transform(a, x => x * x), lit(0.0), _ + _)
    val nb = aggregate(transform(b, x => x * x), lit(0.0), _ + _)
    dot / (sqrt(na) * sqrt(nb))
  }

  private val sqlCosine = (a: String, b: String) =>
    s"""(list_aggregate(list_transform(list_zip($a, $b), p -> p[1]*p[2]), 'sum') /
        (sqrt(list_aggregate(list_transform($a, x -> x*x), 'sum')) *
         sqrt(list_aggregate(list_transform($b, x -> x*x), 'sum'))))"""

  /** Brute-force cosine top-k against one query vector. */
  def bruteForceTopK(emb: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    val e = emb.select(col("vec_id"), col("label"),
      transform(col("embedding"), _.cast("double")).as("v"))
    val q = e.filter(col("vec_id") === queryVecId).select(col("v").as("qv"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"), col("label"), cosine(col("v"), col("qv")).as("cos_sim"))
      .orderBy(desc("cos_sim"), asc("vec_id"))
      .limit(k)
  }

  /** IVF search: per-label centroids (exact decimal means → bit-stable),
    * probe the `nprobe` centroids nearest to the query, then brute-force
    * only within the probed labels.
    */
  def ivfTopK(emb: DataFrame, queryVecId: Long, nprobe: Int, k: Int): DataFrame = {
    val e = emb.select(col("vec_id"), col("label"),
      transform(col("embedding"), _.cast("double")).as("v"))
    // exact per-dimension means: decimal sums are order-independent
    val cent = e.select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg((sum(col("x").cast("decimal(38,18)")).cast("double") /
            count(lit(1))).as("m"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("cv"))
    val q = e.filter(col("vec_id") === queryVecId).select(col("v").as("qv"))
    val probed = cent.crossJoin(broadcast(q))
      .select(col("label"), cosine(col("cv"), col("qv")).as("ccos"))
      .orderBy(desc("ccos"), asc("label"))
      .limit(nprobe)
      .select(col("label"))
    e.join(broadcast(probed), Seq("label"), "left_semi")
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"), col("label"), cosine(col("v"), col("qv")).as("cos_sim"))
      .orderBy(desc("cos_sim"), asc("vec_id"))
      .limit(k)
  }

  def entries: Seq[QueryEntry] = Seq(
    QueryEntry(
      "q_cosine_topk",
      (s, dir) => bruteForceTopK(t(s, dir, "embeddings"), 0L, 10),
      Some(s"""WITH e AS (SELECT vec_id, label,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings),
          q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
          SELECT vec_id, label, ${sqlCosine("v", "qv")} AS cos_sim
          FROM e, q WHERE vec_id <> 0
          ORDER BY cos_sim DESC, vec_id LIMIT 10"""),
    ),
    QueryEntry(
      "q_ann_ivf",
      (s, dir) => ivfTopK(t(s, dir, "embeddings"), 0L, 3, 10),
      Some(s"""WITH e AS (SELECT vec_id, label,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings),
          q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
          flat AS (SELECT label, generate_subscripts(v, 1) AS pos,
                          unnest(v) AS x FROM e),
          cm AS (SELECT label, pos,
                   CAST(sum(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS m
                 FROM flat GROUP BY label, pos),
          cent AS (SELECT label, list(m ORDER BY pos) AS cv FROM cm GROUP BY label),
          probed AS (SELECT label FROM cent, q
                     ORDER BY ${sqlCosine("cv", "qv")} DESC, label LIMIT 3)
          SELECT vec_id, label, ${sqlCosine("v", "qv")} AS cos_sim
          FROM e, q
          WHERE vec_id <> 0 AND label IN (SELECT label FROM probed)
          ORDER BY cos_sim DESC, vec_id LIMIT 10"""),
    ),
    // near-duplicate pairs by embedding cosine within a label block
    QueryEntry(
      "q_embedding_neardup",
      (s, dir) => {
        val e = t(s, dir, "embeddings").select(col("vec_id"), col("label"),
          transform(col("embedding"), _.cast("double")).as("v"))
        val a = e.as("a")
        val b = e.as("b")
        a.join(b, col("a.label") === col("b.label")
            && col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
                  cosine(col("a.v"), col("b.v")).as("cos_sim"))
          .filter(col("cos_sim") > 0.25)
          .orderBy("vec_a", "vec_b")
      },
      Some(s"""WITH e AS (SELECT vec_id, label,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings)
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                 ${sqlCosine("a.v", "b.v")} AS cos_sim
          FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
          WHERE ${sqlCosine("a.v", "b.v")} > 0.25
          ORDER BY vec_a, vec_b"""),
    ),
  )
}
