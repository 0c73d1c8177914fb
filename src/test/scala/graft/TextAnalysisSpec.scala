package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions.{col, desc}
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

  test("doc chunks: overlapping windows, stride starts, tail length") {
    // 8 tokens, chunkLen 4, stride 3 → starts 0,3,6; tails 4,4,2
    val docs = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val got = TextAnalysis.docChunks(docs, 4, 3)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((0L, 0L, 4L), (1L, 3L, 4L), (2L, 6L, 2L)))
    // chunk hash = md5 of the space-joined window
    val h = TextAnalysis.docChunks(docs, 4, 3)
      .orderBy("chunk_idx").collect().map(_.getString(4))
    assert(h(0) === org.apache.commons.codec.digest.DigestUtils.md5Hex("a b c d"))
    assert(h(2) === org.apache.commons.codec.digest.DigestUtils.md5Hex("g h"))
  }

  test("term salience: tf*N/df ranking with per-doc top-k") {
    // N=3; "rare" appears only in doc 1 (df=1, tf=2 → 6.0);
    // "common" in all three (df=3, tf=1 → 1.0)
    val docs = Seq(
      (1L, "rare rare common"),
      (2L, "common x"),
      (3L, "common y"),
    ).toDF("doc_id", "text")
    val got = TextAnalysis.termSalience(docs, 2)
      .orderBy(col("doc_id"), desc("salience"), col("term")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(4)))
    assert(got.head === ((1L, "rare", 6.0)))
    // doc 1's second entry is "common" at 1.0; each doc keeps ≤ k rows
    assert(got.count(_._1 == 1L) === 2)
    assert(got.filter(_._1 == 2L).map(_._2).toSet === Set("common", "x"))
  }

  test("token packing: batch advances when the budget is crossed") {
    // budget 10, one lang, one shard: cum-exclusive 0,4,9,13 → batches 0,0,0,1
    val docs = Seq(
      (1L, "en", "t t t t"),          // 4 tokens
      (2L, "en", "t t t t t"),        // 5
      (3L, "en", "t t t t"),          // 4
      (4L, "en", "t t"),              // 2
    ).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.tokenPacking(docs, 10, 1000)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(4)))
    assert(got.toSeq === Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L)))
    // shard boundary resets the running count
    val sharded = Seq((999L, "en", "t t t"), (1000L, "en", "t t t"))
      .toDF("doc_id", "lang", "text")
    val g2 = TextAnalysis.tokenPacking(sharded, 2, 1000)
      .orderBy("doc_id").collect().map(r => (r.getLong(2), r.getLong(4)))
    assert(g2.toSeq === Seq((0L, 0L), (1L, 0L)))
  }
}
