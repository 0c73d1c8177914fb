package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph operators. PageRank-style authority ranking is the crawl
  * scheduler's priority signal at web scale (rank hosts/pages by in-link
  * mass to order the frontier — the priority-queue score's "dataset-type /
  * authority" term); here it runs over a deterministic synthetic link graph
  * derived from the documents table (three affine out-links per node mod N)
  * so the DuckDB oracle can replay the whole computation exactly.
  *
  * Determinism: a grouped double sum is visit-order-dependent, so each
  * iteration quantizes the contribution mass to integral picounits
  * (`floor(r/outdeg · 1e12)`) and sums them exactly in decimal(38,0) — the
  * [[SimilarityOps.labelCentroidsQuantized]] pattern — making every
  * iteration bit-reproducible under any partitioning in both engines.
  *
  * Scale shape: one iteration = edges⋈outdeg⋈ranks on src (edges and
  * outdeg share the cached edge partitioning), ONE partial-agg'd shuffle of
  * the summed mass keyed on dst (grain = in-linked nodes, map-side
  * combined), and a node-keyed left join for the damping term. Edges and
  * nodes are persisted across iterations — at 100 TB the edge table would
  * live pre-bucketed by src and each iteration's ranks would be
  * checkpointed to cut lineage (the `DedupOps` connected-components
  * pattern); with a fixed 3 iterations the lineage stays shallow.
  */
object GraphOps {
  import Tables.t

  private val Quant = 1e12

  /** Deterministic synthetic out-links: node → (a·node + b) mod N for
    * (a,b) ∈ {(7,1), (13,5), (31,11)}, self-loops dropped, deduplicated. */
  def syntheticEdges(nodes: DataFrame, nDf: DataFrame): DataFrame = {
    val dsts = Seq((7L, 1L), (13L, 5L), (31L, 11L)).map { case (a, b) =>
      pmod(col("node") * a + b, col("n_docs")).as("dst")
    }
    nodes.crossJoin(broadcast(nDf))
      .select(col("node").as("src"), explode(array(dsts: _*)).as("dst"))
      .where(col("dst") =!= col("src"))
      .distinct()
  }

  /** Fixed-iteration PageRank (damping 0.85) with quantized-exact mass. */
  def pagerank(docs: DataFrame, iterations: Int): DataFrame = {
    val nDf = docs.agg(count(lit(1)).as("n_docs"))
    val nodes = docs.select(col("doc_id").as("node"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val edges = syntheticEdges(nodes, nDf)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    var ranks = nodes.crossJoin(broadcast(nDf))
      .select(col("node"), (lit(1.0) / col("n_docs")).as("r"))
    for (_ <- 1 to iterations) {
      val contrib = edges.join(outdeg, "src")
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst"))
        .agg(sum(floor(col("r") / col("outdeg") * Quant)
          .cast("decimal(38,0)")).as("sq"))
        .withColumnRenamed("dst", "node")
      ranks = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(nDf))
        .select(col("node"),
          (lit(0.15) / col("n_docs") + lit(0.85) *
            (coalesce(col("sq"), lit(0).cast("decimal(38,0)"))
              .cast("double") / Quant)).as("r"))
    }
    ranks.select(col("node"), col("r").as("rank"))
  }

  private val sqlN = "(SELECT count(*) FROM documents)"
  private def sqlStep(prev: String, i: Int): String =
    s"""s$i AS (SELECT e.dst AS node,
          sum(CAST(floor($prev.r / od.outdeg * 1e12) AS DECIMAL(38,0))) AS sq
        FROM e JOIN od USING (src) JOIN $prev ON $prev.node = e.src GROUP BY 1),
      r$i AS (SELECT nodes.node,
          0.15e0 / $sqlN + 0.85e0 * (CAST(coalesce(s$i.sq, 0) AS DOUBLE) / 1e12) AS r
        FROM nodes LEFT JOIN s$i USING (node))"""

  def entries: Seq[QueryEntry] = Seq(
    QueryEntry(
      "q_pagerank",
      (s, dir) => pagerank(t(s, dir, "documents"), 3).orderBy("node"),
      Some(s"""WITH nodes AS (SELECT doc_id AS node FROM documents),
          e0 AS (SELECT node AS src, (node*7+1) % $sqlN AS dst FROM nodes
                 UNION ALL SELECT node, (node*13+5) % $sqlN FROM nodes
                 UNION ALL SELECT node, (node*31+11) % $sqlN FROM nodes),
          e AS (SELECT DISTINCT src, dst FROM e0 WHERE dst <> src),
          od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
          r0 AS (SELECT node, 1e0 / $sqlN AS r FROM nodes),
          ${sqlStep("r0", 1)},
          ${sqlStep("r1", 2)},
          ${sqlStep("r2", 3)}
          SELECT node, r AS rank FROM r3 ORDER BY node"""),
    ),
  )
}
