package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch A/B probe (not part of the driver contract): isolates the
  * drain and first-wins dedup operator costs, old window plan vs the
  * TopKPerKey plan, at CrawlBench-like sizes.
  */
object DrainProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val hosts = Array("zenodo", "figshare", "osf", "nomad", "gpcrmd", "mddb", "atlas")
    val n = 1500000
    val frontier = spark.range(n).select(
      concat(lit("u://"), $"id").as("url"),
      element_at(typedLit(hosts), ($"id" % 7 + 1).cast("int")).as("host"),
      lit(0).as("depth"),
      ($"id" * 2654435761L % 1000).cast("double").as("score"),
      ($"id" % 5).cast("int").as("round"),
      ($"id" % 17).cast("int").as("queryIdx"),
      ($"id" % 3).cast("int").as("pageIdx"),
      $"id".cast("int").as("hitIdx"),
    ).cache()
    frontier.count()

    val budget = hosts.map(_ -> 75000).toMap
    val budgetCol = coalesce(element_at(typedLit(budget), col("host")), lit(0))
    val priority = col("score").desc +: Seq("round", "queryIdx", "pageIdx", "hitIdx")
      .map(c => col(c).asc)

    def timeIt(tag: String)(mk: => DataFrame): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val c = mk.count()
        println(f"$tag%-22s rep$i count=$c wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    // -- drain: window form FIRST (rule not yet registered) -----------------
    timeIt("drain/window") {
      val salted = frontier.withColumn("salt",
        pmod(xxhash64(col("url")), lit(8L)).cast("int"))
      val w1 = Window.partitionBy(col("host"), col("salt")).orderBy(priority: _*)
      val cand = salted.withColumn("r1", row_number().over(w1))
        .filter(col("r1") <= budgetCol)
      val w2 = Window.partitionBy(col("host")).orderBy(priority: _*)
      cand.withColumn("rk", row_number().over(w2))
        .filter(col("rk") <= budgetCol)
        .drop("salt", "r1", "rk")
    }

    // -- first-wins: window form (still unregistered) -----------------------
    val links = spark.range(3000000).select(
      concat(lit("l://"), ($"id" % 2000000)).as("url"),
      $"id".cast("int").as("seqInRound"),
      ($"id" % 100).cast("int").as("ordinal"),
      ($"id" % 1000).cast("double").as("score"),
    ).cache()
    links.count()
    timeIt("firstwins/window") {
      val w = Window.partitionBy($"url").orderBy($"seqInRound".asc, $"ordinal".asc)
      links.withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")
    }

    // -- now the TopKPerKey forms ------------------------------------------
    timeIt("drain/topk") {
      graft.plans.TopKPerKey(frontier, Seq(col("host")), priority, budgetCol)
    }
    // the k=1 rewrite is gated off by default (rewriteMinK=2) — force it on
    // so this block actually measures the TopKPerKey plan, not the window
    // plan a second time
    spark.conf.set("spark.graft.topk.rewriteMinK", "1")
    timeIt("firstwins/topk") {
      val w = Window.partitionBy($"url").orderBy($"seqInRound".asc, $"ordinal".asc)
      links.withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")
    }
    spark.conf.set("spark.graft.topk.rewriteMinK", "2")
    spark.stop()
  }
}
