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

  test("contamination: eval docs sharing train 4-grams, distinct-counted") {
    val train = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val eval = Seq(
      (10L, "x a b c d e"),   // shares "a b c d" and "b c d e"
      (11L, "c d e f g h"),   // shares only 3-grams → clean at k=4
      (12L, "a b c d a b c d e"), // shared grams counted DISTINCT (2, not 3)
    ).toDF("doc_id", "text")
    val got = TextAnalysis.contaminationBetween(train, eval, 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((10L, 2L), (12L, 2L)))
  }
}
