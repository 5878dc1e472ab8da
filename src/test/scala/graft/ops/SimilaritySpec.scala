package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Convergence and determinism of the k-means family ([[Similarity.kmeansStep]]
  * is the oracle-gated single round; [[Similarity.kmeans]] is its driver-side
  * fixpoint iteration, which SQL can't express — these pins replace the oracle
  * for the loop).
  */
class SimilaritySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("kmeans stopped after one iteration reproduces kmeansStep's reassignment") {
    val step = Similarity.kmeansStep(spark, sf)
      .select(col("vec_id"), col("cell1").as("cell"))
    val loop = Similarity.kmeans(spark, sf, maxIters = 1)
    assert(loop.count() > 0)
    assert(loop.exceptAll(step).isEmpty && step.exceptAll(loop).isEmpty)
  }

  test("kmeans yields a total deterministic partition into at most k cells") {
    val k = 8
    val n = graft.core.Tables.embeddings(spark, sf).count()
    val run1 = Similarity.kmeans(spark, sf, k = k, maxIters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // total: every vector assigned exactly once
    assert(run1.length.toLong == n && run1.map(_._1).distinct.length.toLong == n)
    // cells are seed ids, so the label space stays within [0, k)
    assert(run1.map(_._2).forall(c => c >= 0 && c < k))
    assert(run1.map(_._2).distinct.length > 1)
    // floored-mean centroids are bit-exact, so the whole loop is deterministic
    val run2 = Similarity.kmeans(spark, sf, k = k, maxIters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(run1.sorted.sameElements(run2.sorted))
  }
}
