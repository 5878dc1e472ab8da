package graft.functions

import graft.SparkSpec
import graft.ops.Dedup

/** The native expression must be indistinguishable from its executable
  * specification — the pure-HOF formulation — on real data and edge cases.
  */
class MinhashSigExprSpec extends SparkSpec {

  test("native expression ≡ HOF formulation on sf0.001 documents") {
    val sf = "/root/testdata/sf0.001"
    val fast = Dedup.minhashSignatures(spark, sf)
    val ref = Dedup.minhashSignaturesHof(spark, sf)
    assert(fast.count() == ref.count())
    assert(fast.exceptAll(ref).isEmpty && ref.exceptAll(fast).isEmpty)
  }

  test("short and empty texts yield all-null signatures (no fabricated grams)") {
    import spark.implicits._
    val out = Seq((1L, "abc"), (2L, ""), (3L, "abcd"))
      .toDF("doc_id", "text")
      .select($"doc_id", MinhashSigExpr($"text").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    assert(out(1L).forall(_ == null)) // 3 chars < q=4
    assert(out(2L).forall(_ == null))
    assert(out(3L).forall(_ != null)) // exactly one gram
    assert(out(3L).size == Dedup.MinhashFuncs)
  }

  test("native Jaccard verify ≡ HOF formulation on sf0.001 documents") {
    val sf = "/root/testdata/sf0.001"
    val fast = Dedup.ngramJaccard(spark, sf)
    val ref = Dedup.ngramJaccardHof(spark, sf)
    assert(fast.count() == ref.count())
    assert(fast.exceptAll(ref).isEmpty && ref.exceptAll(fast).isEmpty)
  }

  test("native simhash ≡ HOF formulation on sf0.001 documents") {
    val sf = "/root/testdata/sf0.001"
    val fast = Dedup.simhash(spark, sf)
    val ref = Dedup.simhashHof(spark, sf)
    assert(fast.exceptAll(ref).isEmpty && ref.exceptAll(fast).isEmpty)
  }

  test("native cosine ≡ HOF formulation on sf0.001 embeddings") {
    import org.apache.spark.sql.functions._
    val vecs = graft.ops.Similarity.scaledVecs(spark, "/root/testdata/sf0.001")
    val a = vecs.select(col("vec_id").as("id_a"), col("svec").as("va"))
      .filter(col("id_a") < 30)
    val b = vecs.select(col("vec_id").as("id_b"), col("svec").as("vb"))
      .filter(col("id_b") >= 30 && col("id_b") < 60)
    val pairs = a.crossJoin(b)
    val diff = pairs.select(
      CosineSimExpr(col("va"), col("vb")).as("fast"),
      graft.ops.Similarity.cosineHof(col("va"), col("vb")).as("ref"))
      .filter(col("fast") =!= col("ref")) // bit-exact, not approximate
    assert(diff.count() == 0)
  }

  test("multi-byte text shingles by code point, not byte") {
    import spark.implicits._
    // 4 CJK chars = 1 gram; byte-based shingling would see 12 bytes = 9 grams
    val sigs = Seq((1L, "的是不了"), (2L, "的是不了"))
      .toDF("doc_id", "text")
      .select($"doc_id", MinhashSigExpr($"text").as("sig"))
      .collect().map(_.getSeq[Long](1))
    assert(sigs(0) == sigs(1)) // deterministic
    assert(sigs(0).forall(_ >= 0L))
  }
}
