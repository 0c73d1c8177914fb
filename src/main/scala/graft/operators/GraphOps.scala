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

  /** Fixed-iteration HITS (Kleinberg): hub mass flows src→dst into
    * authority, authority flows back dst→src into hub — the second
    * crawl-priority signal family (a hub page full of dataset links vs an
    * authoritative dataset page). Each half-step is L1-normalized;
    * contribution mass is quantized to integral NANO-units and summed as
    * exact longs — the [[pagerank]] determinism pattern, but nano not pico
    * so every norm sum stays under 2^53 and its double cast is exact at any
    * scale factor. Scale shape per iteration: two partial-agg'd shuffles
    * (keyed src, then dst) over the persisted edge table plus two 1-row
    * scalar aggs for the norms; same bucketed-edge story as PageRank at
    * 100 TB.
    */
  def hits(docs: DataFrame, iterations: Int): DataFrame = {
    // Small-graph fast path (the bfsLayers/DedupOps.LocalFinishEdges
    // pattern): collect the node ids only — the 3·|nodes| edge set is
    // derived arithmetic — and run the fixed iterations in memory. Every
    // step is exact-long quantized sums plus the same IEEE double
    // divisions the distributed loop performs, so the result is
    // bit-identical (pinned by the equality spec); one job replaces the
    // ~8 join/agg/norm barriers per iteration that amplify under load.
    val nodeIdsArr = docs.select(col("doc_id").cast("long")).collect()
      .map(_.getLong(0))
    if (3L * nodeIdsArr.length <= DedupOps.LocalFinishEdges)
      return hitsLocal(docs.sparkSession, nodeIdsArr, iterations)
    hitsDistributed(docs, iterations)
  }

  private def hitsLocal(spark: org.apache.spark.sql.SparkSession,
      nodeIds: Array[Long], iterations: Int): DataFrame = {
    val n = nodeIds.length.toLong
    def mod(x: Long): Long = { val m = x % n; if (m < 0) m + n else m }
    // distinct out-neighbors per node (self-loops dropped) — the exact
    // syntheticEdges set; in-neighbors derived by reversal
    val coeffs = Seq((7L, 1L), (13L, 5L), (31L, 11L))
    val out = new java.util.HashMap[Long, Array[Long]]()
    val in = new java.util.HashMap[Long, scala.collection.mutable.ArrayBuffer[Long]]()
    nodeIds.foreach { v =>
      val ds = coeffs.map { case (a, b) => mod(v * a + b) }
        .distinct.filter(_ != v).toArray
      out.put(v, ds)
      ds.foreach { d =>
        val buf = in.get(d)
        if (buf == null) {
          val nb = new scala.collection.mutable.ArrayBuffer[Long]()
          nb += v; in.put(d, nb)
        } else buf += v
      }
    }
    val auth = new java.util.HashMap[Long, Double]()
    val hub = new java.util.HashMap[Long, Double]()
    nodeIds.foreach { v => auth.put(v, 1.0); hub.put(v, 1.0) }
    // dst-side values may be non-node ids: they hold no score row in the
    // distributed loop's node-keyed frames either (left joins on nodes)
    for (_ <- 1 to iterations) {
      // hub: per src, exact long sum of floor(auth(dst)·1e9) over out(src)
      val hq = new java.util.HashMap[Long, Long]()
      var hsum = 0L
      nodeIds.foreach { v =>
        var s = 0L
        var any = false
        out.get(v).foreach { d =>
          // the distributed join edges⋈auth on dst drops non-node dsts
          if (auth.containsKey(d)) {
            s += math.floor(auth.get(d) * 1e9).toLong; any = true
          }
        }
        if (any) { hq.put(v, s); hsum += s }
      }
      nodeIds.foreach { v =>
        val q = if (hq.containsKey(v)) hq.get(v) else 0L
        hub.put(v, q.toDouble / hsum.toDouble)
      }
      val aq = new java.util.HashMap[Long, Long]()
      var asum = 0L
      nodeIds.foreach { v =>
        out.get(v).foreach { d =>
          val add = math.floor(hub.get(v) * 1e9).toLong
          val cur = if (aq.containsKey(d)) aq.get(d) else 0L
          aq.put(d, cur + add)
          asum += add
        }
      }
      nodeIds.foreach { v =>
        val q = if (aq.containsKey(v)) aq.get(v) else 0L
        auth.put(v, q.toDouble / asum.toDouble)
      }
    }
    val rows = nodeIds.sorted.map(v =>
      org.apache.spark.sql.Row(v, hub.get(v), auth.get(v))).toSeq
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("hub",
        org.apache.spark.sql.types.DoubleType, nullable = true),
      org.apache.spark.sql.types.StructField("auth",
        org.apache.spark.sql.types.DoubleType, nullable = true)))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
  }

  /** The distributed iteration loop — public above the local-finish bound
    * and pinned equal to [[hitsLocal]] by the equality spec. */
  def hitsDistributed(docs: DataFrame, iterations: Int): DataFrame = {
    val QuantN = 1e9
    val nDf = docs.agg(count(lit(1)).as("n_docs"))
    val nodes = docs.select(col("doc_id").as("node"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val edges = syntheticEdges(nodes, nDf)
      .persist(StorageLevel.MEMORY_AND_DISK)
    var auth = nodes.select(col("node"), lit(1.0).as("a"))
    var hub = nodes.select(col("node"), lit(1.0).as("h"))
    for (_ <- 1 to iterations) {
      val hq = edges.join(auth.select(col("node").as("dst"), col("a")), "dst")
        .groupBy(col("src").as("node"))
        .agg(sum(floor(col("a") * QuantN)).as("hq"))
      val hnorm = hq.agg(sum(col("hq")).as("hsum"))
      hub = nodes.join(hq, Seq("node"), "left").crossJoin(broadcast(hnorm))
        .select(col("node"), (coalesce(col("hq"), lit(0L)).cast("double") /
          col("hsum").cast("double")).as("h"))
      val aq = edges.join(hub.select(col("node").as("src"), col("h")), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(floor(col("h") * QuantN)).as("aq"))
      val anorm = aq.agg(sum(col("aq")).as("asum"))
      auth = nodes.join(aq, Seq("node"), "left").crossJoin(broadcast(anorm))
        .select(col("node"), (coalesce(col("aq"), lit(0L)).cast("double") /
          col("asum").cast("double")).as("a"))
    }
    hub.join(auth, "node")
      .select(col("node"), col("h").as("hub"), col("a").as("auth"))
  }

  /** Exact triangle count over the undirected link graph — the classic
    * graph-shape statistic (community density in a host graph; a crawl
    * scheduler reads high triangle density as a link farm / mirror
    * cluster). The standard order-canonicalization trick bounds the join:
    * every undirected edge is kept once as (lo, hi), so each triangle
    * {a<b<c} is counted exactly once via wedge (a→b, b→c) ∩ edge (a→c) —
    * two equi-join shuffles over the edge table, never an all-pairs
    * expansion; at 100 TB the edge table is bucketed by `src` and degree
    * skew is handled by the standard high-degree-vertex split (the salted
    * join pattern, see q_skew_join_salted).
    */
  def triangleCount(docs: DataFrame): DataFrame = {
    val nDf = docs.agg(count(lit(1)).as("n_docs"))
    val nodes = docs.select(col("doc_id").as("node"))
    val und = syntheticEdges(nodes, nDf)
      .select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val wedges = und.as("e1").join(und.as("e2"),
        col("e1.hi") === col("e2.lo"))
      .select(col("e1.lo").as("a"), col("e1.hi").as("b"),
        col("e2.hi").as("c"))
    wedges.join(und.as("e3"),
        col("a") === col("e3.lo") && col("c") === col("e3.hi"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Min-hop BFS layers from a deterministic seed set (node ≡ 0 mod 97) —
    * the crawl loop's abstract form, SQL-checkable: a monotone visited set,
    * each round's frontier = out-links of the previous frontier anti-joined
    * against everything already seen, depth = discovery round (mdws's
    * node-graph ×2 closure generalized to depth d; reference anchor
    * `osf.py`'s node expansion). Scale shape per level: one src-keyed join
    * bounded by the frontier, a dst distinct, and an anti-join against
    * visited — exactly the production loop's shape, where the anti-join is
    * replaced by the partitioned bloom/cuckoo seen-set probe ([[graft.crawl.SeenSet]])
    * so visited never re-shuffles; here the exact anti-join IS the point
    * (the oracle replays it with a recursive CTE). Each level is persisted
    * so lineage stays one level deep. Returns the per-depth rollup
    * (n_nodes + node-sum fingerprint), whose grain is maxDepth+1 rows at
    * any corpus size.
    */
  def bfsLayers(docs: DataFrame, maxDepth: Int): DataFrame = {
    // Small-graph fast path (the DedupOps.LocalFinishEdges pattern, same
    // bound): the synthetic graph has exactly 3·|nodes| directed edges, so
    // when that fits the driver-local budget, collect the NODE IDS ONLY
    // (the edge set is derived arithmetic — nothing else crosses the
    // driver) and run the whole BFS + per-depth rollup in memory: pure
    // integer arithmetic, bit-identical to the distributed loop, with ONE
    // job instead of ~3 per level. Under a loaded box the level loop's
    // sequential job barriers amplify exactly like the clusters
    // contraction did (r5 driver: 25.4 s vs 4.5 s quiet). Above the bound
    // the distributed level loop below runs unchanged — at web scale the
    // anti-join becomes the SeenSet probe, as documented above.
    val spark = docs.sparkSession
    val nodeIds = docs.select(col("doc_id").cast("long")).collect()
      .map(_.getLong(0))
    if (3L * nodeIds.length <= DedupOps.LocalFinishEdges) {
      val n = nodeIds.length.toLong
      val idSet = new java.util.HashSet[Long](nodeIds.length * 2)
      nodeIds.foreach(idSet.add)
      def mod(x: Long): Long = { val m = x % n; if (m < 0) m + n else m }
      // adjacency is implicit: out(v) = (a·v+b) mod N, self-loops dropped.
      // Mirror the distributed semantics exactly: edges exist only for
      // src ∈ node table (a discovered dst that is not a real node id has
      // NO out-edges — the level join keys edges on src), while any dst
      // value participates in layers and the rollup.
      val depthOf = new java.util.HashMap[Long, Int]()
      var frontier = nodeIds.filter(v => mod0(v, 97L) == 0).sorted
      frontier.foreach(v => depthOf.put(v, 0))
      var d = 1
      while (d <= maxDepth && frontier.nonEmpty) {
        val nxt = new java.util.TreeSet[java.lang.Long]()
        frontier.foreach { v =>
          if (idSet.contains(v)) {
            Seq((7L, 1L), (13L, 5L), (31L, 11L)).foreach { case (a, b) =>
              val w = mod(v * a + b)
              if (w != v && !depthOf.containsKey(w)) nxt.add(w)
            }
          }
        }
        val arr = new Array[Long](nxt.size())
        val it = nxt.iterator()
        var i = 0
        while (it.hasNext) { arr(i) = it.next(); i += 1 }
        arr.foreach(w => depthOf.put(w, d))
        frontier = arr
        d += 1
      }
      import scala.jdk.CollectionConverters._
      val rollup = depthOf.asScala.toSeq
        .groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (depth, vs) =>
          org.apache.spark.sql.Row(depth.toLong, vs.size.toLong,
            vs.map(_._1).sum)
        }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("depth",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_nodes",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("sum_nodes",
          org.apache.spark.sql.types.LongType, nullable = true)))
      return spark.createDataFrame(rollup.asJava, schema).orderBy("depth")
    }
    bfsLayersDistributed(docs, maxDepth)
  }

  /** The distributed level loop — public surface above the local-finish
    * bound; kept callable directly so the equality spec can pin
    * local == distributed on the same graph. */
  def bfsLayersDistributed(docs: DataFrame,
      maxDepth: Int): DataFrame = {
    val nDf = docs.agg(count(lit(1)).as("n_docs"))
    val nodes = docs.select(col("doc_id").as("node"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val edges = syntheticEdges(nodes, nDf)
      .persist(StorageLevel.MEMORY_AND_DISK)
    var visited = nodes.where(pmod(col("node"), lit(97L)) === 0)
      .select(col("node"), lit(0L).as("depth"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var frontier = visited.select("node")
    for (d <- 1 to maxDepth) {
      val next = edges
        .join(frontier.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .select(col("node"), lit(d.toLong).as("depth"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      visited = visited.unionByName(next)
        .persist(StorageLevel.MEMORY_AND_DISK)
      frontier = next.select("node")
    }
    visited.groupBy("depth")
      .agg(count(lit(1)).as("n_nodes"), sum(col("node")).as("sum_nodes"))
      .orderBy("depth")
  }

  /** pmod twin for the driver-local path. */
  private def mod0(x: Long, m: Long): Long = {
    val r = x % m; if (r < 0) r + m else r
  }

  private val sqlN = "(SELECT count(*) FROM documents)"
  private def sqlStep(prev: String, i: Int): String =
    s"""s$i AS (SELECT e.dst AS node,
          sum(CAST(floor($prev.r / od.outdeg * 1e12) AS DECIMAL(38,0))) AS sq
        FROM e JOIN od USING (src) JOIN $prev ON $prev.node = e.src GROUP BY 1),
      r$i AS (SELECT nodes.node,
          0.15e0 / $sqlN + 0.85e0 * (CAST(coalesce(s$i.sq, 0) AS DOUBLE) / 1e12) AS r
        FROM nodes LEFT JOIN s$i USING (node))"""

  // one HITS iteration in oracle SQL: authority a$prev → hub h$i → auth a$i
  private def sqlHitsIter(i: Int, prev: Int): String =
    s"""hq$i AS (SELECT e.src AS node,
          CAST(sum(CAST(floor(a$prev.a * 1e9) AS BIGINT)) AS BIGINT) AS q
        FROM e JOIN a$prev ON a$prev.node = e.dst GROUP BY 1),
      h$i AS (SELECT nodes.node, CAST(coalesce(q, 0) AS DOUBLE)
          / (SELECT CAST(CAST(sum(q) AS BIGINT) AS DOUBLE) FROM hq$i) AS h
        FROM nodes LEFT JOIN hq$i USING (node)),
      aq$i AS (SELECT e.dst AS node,
          CAST(sum(CAST(floor(h$i.h * 1e9) AS BIGINT)) AS BIGINT) AS q
        FROM e JOIN h$i ON h$i.node = e.src GROUP BY 1),
      a$i AS (SELECT nodes.node, CAST(coalesce(q, 0) AS DOUBLE)
          / (SELECT CAST(CAST(sum(q) AS BIGINT) AS DOUBLE) FROM aq$i) AS a
        FROM nodes LEFT JOIN aq$i USING (node))"""

  def entries: Seq[QueryEntry] = Seq(
    QueryEntry(
      "q_hits",
      (s, dir) => hits(t(s, dir, "documents"), 2).orderBy("node"),
      Some(s"""WITH nodes AS (SELECT doc_id AS node FROM documents),
          e0 AS (SELECT node AS src, (node*7+1) % $sqlN AS dst FROM nodes
                 UNION ALL SELECT node, (node*13+5) % $sqlN FROM nodes
                 UNION ALL SELECT node, (node*31+11) % $sqlN FROM nodes),
          e AS (SELECT DISTINCT src, dst FROM e0 WHERE dst <> src),
          a0 AS (SELECT node, 1e0 AS a FROM nodes),
          ${sqlHitsIter(1, 0)},
          ${sqlHitsIter(2, 1)}
          SELECT h2.node, h2.h AS hub, a2.a AS auth
          FROM h2 JOIN a2 USING (node) ORDER BY node"""),
    ),
    QueryEntry(
      "q_bfs_layers",
      (s, dir) => bfsLayers(t(s, dir, "documents"), 4),
      Some(s"""WITH RECURSIVE nodes AS (SELECT doc_id AS node FROM documents),
          e0 AS (SELECT node AS src, (node*7+1) % $sqlN AS dst FROM nodes
                 UNION ALL SELECT node, (node*13+5) % $sqlN FROM nodes
                 UNION ALL SELECT node, (node*31+11) % $sqlN FROM nodes),
          e AS (SELECT DISTINCT src, dst FROM e0 WHERE dst <> src),
          bfs AS (
            SELECT node, 0 AS depth FROM nodes WHERE node % 97 = 0
            UNION
            SELECT e.dst, b.depth + 1 FROM bfs b JOIN e ON e.src = b.node
            WHERE b.depth < 4
          ),
          dist AS (SELECT node, min(depth) AS depth FROM bfs GROUP BY 1)
          SELECT CAST(depth AS BIGINT) AS depth,
                 CAST(count(*) AS BIGINT) AS n_nodes,
                 CAST(sum(node) AS BIGINT) AS sum_nodes
          FROM dist GROUP BY 1 ORDER BY 1"""),
    ),
    QueryEntry(
      "q_triangle_count",
      (s, dir) => triangleCount(t(s, dir, "documents")),
      Some(s"""WITH nodes AS (SELECT doc_id AS node FROM documents),
          e0 AS (SELECT node AS src, (node*7+1) % $sqlN AS dst FROM nodes
                 UNION ALL SELECT node, (node*13+5) % $sqlN FROM nodes
                 UNION ALL SELECT node, (node*31+11) % $sqlN FROM nodes),
          und AS (SELECT DISTINCT least(src, dst) AS lo,
                         greatest(src, dst) AS hi
                  FROM e0 WHERE dst <> src)
          SELECT count(*) AS n_triangles
          FROM und e1 JOIN und e2 ON e1.hi = e2.lo
               JOIN und e3 ON e1.lo = e3.lo AND e2.hi = e3.hi"""),
    ),
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
