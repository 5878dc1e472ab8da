package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.{Num, Tables}

/** K-means over the embedding corpus — the clustering member of the vector
  * tier ([[Similarity]] covers search; this covers structure discovery, the
  * IVF coarse quantizer's training step made a first-class operator).
  *
  * Lloyd iterations with everything FP-order-sensitive pushed through exact
  * decimal arithmetic so the result is bit-stable on any cluster:
  *
  *  - distances: Σ_dims (x−c)² with each squared term rounded to
  *    DECIMAL(30,18) (deterministic) and summed exactly (order-independent);
  *    the argmin then compares exact decimals, ties broken by centroid id.
  *  - centroid update: per-dimension mean = exact decimal Σx crossed to
  *    double through [[Num.decToDouble]], divided by the exact count.
  *
  * Initialization is deterministic (the first k vec_ids seed the centroids),
  * so the whole computation is a pure function of the data — which is what
  * lets DuckDB replay it as the oracle.
  *
  * Scale shape: the exploded (vec_id, dim, x) frame is |V|·D rows, shuffled
  * once per iteration in a partial-aggregated groupBy; the distance join is
  * dim-keyed against a k·D-row centroid frame (broadcast at any realistic
  * k·D). Nothing is driver-side; iterations are plan-checkpointed. For
  * billion-vector corpora you'd mini-batch the update — same dataflow per
  * batch.
  */
object Clustering {

  def kmeansAssignments(spark: SparkSession, sfDir: String, k: Int = 8,
      iters: Int = 2): DataFrame = {
    require(iters >= 1, s"kmeans needs at least one assignment round, got $iters")
    val emb = Tables.embeddings(spark, sfDir)
    // deliberately NOT spreadScan'd (r19): measured 5.17 → 5.5 s solo — the
    // per-row work here is trivial (one explode), the heavy aggregates run
    // post-shuffle, and the extra task fan-out only adds per-iteration
    // scheduling latency
    val e = emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "xf")))
      .select(col("vec_id"), col("dim"), col("xf").cast("double").as("x"))
      .cache()

    // seed from the first k vec_ids actually PRESENT (TakeOrderedAndProject,
    // k rows to the driver-side plan, never a full sort) — `vec_id < k` would
    // silently train fewer than k clusters on sparse or offset id spaces
    var cents = emb.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("cid"), posexplode(col("embedding")).as(Seq("dim", "cf")))
      .select(col("cid"), col("dim"), col("cf").cast("double").as("c"))

    def assignments(c: DataFrame): DataFrame = {
      val diff = col("x") - col("c")
      val byVec = Window.partitionBy("vec_id").orderBy(col("dist"), col("cid"))
      e.join(c, "dim")
        .groupBy(col("vec_id"), col("cid"))
        .agg(sum((diff * diff).cast(DecimalType(30, 18))).as("dist"))
        .withColumn("rn", row_number().over(byVec))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("cid"), col("dist"))
    }

    var assign: DataFrame = null
    for (i <- 1 to iters) {
      assign = assignments(cents)
      if (i < iters) {
        cents = assign.join(e, "vec_id")
          .groupBy(col("cid"), col("dim"))
          .agg((Num.decToDouble(sum(col("x").cast(DecimalType(25, 10))))
            / count(lit(1))).as("c"))
          .localCheckpoint(true) // cut the recurrence's lineage growth
      }
    }
    // materialize the |V|-row result, then release the exploded frame —
    // a lazily-returned plan would pin it in executor storage forever
    val result = assign.select(col("vec_id"), col("cid").as("cluster"),
      Num.decToDouble(col("dist")).as("dist"))
      .localCheckpoint(true)
    e.unpersist()
    result
  }
}
