package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.Glacier

class GlacierSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def tmpRoot(): String =
    Files.createTempDirectory("glacier-test").toString

  test("commit / read / append / replace / time-travel") {
    val g = new Glacier(tmpRoot())
    val df1 = spark.range(10).select(col("id"), (col("id") * 2).as("v"))
    val s1 = g.commit(spark, Seq(
      g.TableWrite("t_app", df1, g.Append),
      g.TableWrite("t_rep", df1, g.Replace),
    ), Map("round" -> 1L))
    assert(s1 === 1L)
    assert(g.rowCount("t_app") === 10L)

    val df2 = spark.range(10, 15).select(col("id"), (col("id") * 2).as("v"))
    val s2 = g.commit(spark, Seq(
      g.TableWrite("t_app", df2, g.Append),
      g.TableWrite("t_rep", df2, g.Replace),
    ), Map("round" -> 2L))

    // append accumulates, replace rewrites
    assert(g.read(spark, "t_app").get.count() === 15L)
    assert(g.read(spark, "t_rep").get.count() === 5L)
    assert(g.rowCount("t_app") === 15L)

    // time travel to snapshot 1
    assert(g.read(spark, "t_app", Some(s1)).get.count() === 10L)
    assert(g.read(spark, "t_rep", Some(s1)).get.count() === 10L)

    // history is ordered, metrics preserved
    val hist = g.history
    assert(hist.map(_.snapshotId) === Seq(1L, 2L))
    assert(hist.last.metrics("round") === 2L)
    assert(hist.last.parentId === Some(1L))

    // untouched tables carry forward
    val s3 = g.commit(spark, Seq(g.TableWrite("t_rep", df1, g.Replace)))
    assert(g.read(spark, "t_app", Some(s3)).get.count() === 15L)

    // per-partition lineage recorded
    val m = g.manifest(s2)
    assert(m.tables("t_app").partitions.nonEmpty)
    assert(m.tables("t_app").partitions.forall(_.bytes > 0))
  }

  test("missing table / empty root behave") {
    val g = new Glacier(tmpRoot())
    assert(g.currentSnapshotId.isEmpty)
    assert(g.read(spark, "nope").isEmpty)
    assert(g.rowCount("nope") === 0L)
    assert(g.history.isEmpty)
  }
}
