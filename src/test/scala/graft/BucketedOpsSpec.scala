package graft

import graft.operators.BucketedOps
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketedOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  /** Flatten an executed plan INCLUDING the subtrees hidden inside AQE
    * query-stage leaf nodes (plain `collect` stops at stage boundaries). */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val here = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => p +: flatten(q.plan)
      case other => other +: other.children.flatMap(flatten)
    }
    here
  }

  test("bucketed join: matches direct join, NO shuffle under the merge join") {
    val dir = "/root/testdata/sf0.001"
    val got = BucketedOps.bucketedOrdersJoin(spark, dir).collect()
      .map(_.toSeq)
    val direct = Tables.t(spark, dir, "orders")
      .join(Tables.t(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_extendedprice").cast("decimal(28,6)")).cast("double")
          .as("revenue"))
      .orderBy("o_orderpriority").collect().map(_.toSeq)
    assert(got.toSeq === direct.toSeq)

    // plan shape: the join consumes the bucket layout — no shuffle (and no
    // broadcast) anywhere beneath the SortMergeJoin
    val q = BucketedOps.joinBucketed(spark)
    q.collect()
    val nodes = flatten(q.queryExecution.executedPlan)
    val smj = nodes.collectFirst { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty, s"expected a SortMergeJoin:\n${nodes.mkString("\n")}")
    val shuffles = smj.get.children.flatMap(flatten).collect {
      case n if n.nodeName.toLowerCase.contains("shuffle")
        || n.nodeName.toLowerCase.contains("broadcast") => n.nodeName
    }
    assert(shuffles.isEmpty, s"join subtree must be exchange-free: $shuffles")
    // and the scans really consume the bucket layout
    val scans = smj.get.children.flatMap(flatten)
      .filter(_.nodeName.contains("Scan")).map(_.toString)
    assert(scans.nonEmpty && scans.forall(_.contains("Bucketed: true")), scans)
  }
}
