package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** North-rule skew evidence at the ENGINE level: AQE's runtime skew-join
  * handling must actually trigger on a hot-key shuffle join and split the
  * oversized partition — the safety net under every equi-join the library
  * plans when a host/key goes hot beyond what static salting anticipated.
  * (The drain path kills host skew structurally — TopKPerKeySpec/
  * FrontierSpec; q_skew_join_salted pins manual salting. This spec pins
  * the third leg: Spark's own runtime re-plan.)
  */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
    case q: QueryStageExec => p +: flatten(q.plan)
    case other => other +: other.children.flatMap(flatten)
  }

  private def withConf[A](kvs: (String, String)*)(body: => A): A = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the hot-key partition of a shuffle join at runtime") {
    import spark.implicits._
    // 90% of fact rows land on key 0 → one shuffle partition dwarfs the
    // rest; thresholds are shrunk so test-scale bytes count as skewed
    val fact = spark.range(0, 120000).select(
      when($"id" % 10 < 9, 0L).otherwise($"id" % 1000).as("k"),
      $"id".as("v"))
    val dim = spark.range(0, 1000).select($"id".as("k"), ($"id" * 2).as("w"))
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    ) {
      val joined = fact.hint("merge").join(dim, Seq("k"))
        .agg(count(lit(1)).as("n"), sum($"v" + $"w").as("s"))
      val row = joined.collect()(0)
      // correctness first: every fact row matches exactly one dim row
      assert(row.getLong(0) === 120000L)
      val smjs = flatten(joined.queryExecution.executedPlan)
        .collect { case j: SortMergeJoinExec => j }
      assert(smjs.nonEmpty, "expected a SortMergeJoin")
      assert(smjs.exists(_.isSkewJoin),
        s"AQE did not mark the join skew-optimized:\n${smjs.mkString("\n")}")
    }
  }
}
