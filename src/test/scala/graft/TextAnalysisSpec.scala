package graft

import graft.operators.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("token bigrams: adjacent-pair counts across the corpus") {
    val corpus = Seq(
      (1L, "x y x"),   // (x,y), (y,x)
      (2L, "y x"),     // (y,x)
      (3L, "solo"),    // 1 token → no bigrams
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tokenBigrams(corpus).orderBy("w1", "w2").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(("x", "y", 1L), ("y", "x", 2L)))
  }
}
