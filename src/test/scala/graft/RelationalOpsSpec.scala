package graft

import graft.operators.Relational
import org.scalatest.funsuite.AnyFunSuite

class RelationalOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("profile: per-column null/distinct/min/max in native type order") {
    val df = Seq[(java.lang.Long, String)](
      (9L, "b"),
      (10L, "a"), // 10 > 9 numerically but "10" < "9" lexicographically
      (null, "a"),
    ).toDF("k", "s")
    val got = Relational.profileColumns(df, Seq("k", "s"))
      .orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    assert(got.toSeq === Seq(
      // min/max computed on the BIGINT, stringified after → 9..10, not 10..9
      ("k", 3L, 2L, 2L, "9", "10"),
      ("s", 3L, 3L, 2L, "a", "b"),
    ))
  }

  test("profile: single scan — one Expand aggregate, no join or union") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("k", "s")
    val plan = Relational.profileColumns(df, Seq("k", "s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand")) // multi-column exact count-distinct
    assert(!plan.contains("Join") && !plan.contains("Union"))
  }
}
