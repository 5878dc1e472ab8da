package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured basis for the r19 scan-parallelism fix (guide §2.5 "one huge
  * unsplittable file → repartition immediately after the read", §6 split
  * sizing): the sf testdata ships each table as ONE parquet row group
  * (documents.parquet = 594 KB / 1 row group at sf0.1), and a row group is
  * not splittable — so every text-tier operator whose heavy per-row work
  * (normText, gram posexplode, chunk build + md5) is attached to the scan
  * runs that work in ONE task while the other 31 cores idle (TimeQuery task
  * metrics: q86 solo = 7 tasks, cpu 3.7 s ≈ wall 4.7 s, i.e. sequential).
  *
  * This probe times the two heaviest grind bodies as-is vs with a
  * doc_id-hash repartition to defaultParallelism inserted between the scan
  * and the heavy expression. Hash repartition by the unique doc_id: no
  * sort-before-repartition (that is round-robin's determinism tax,
  * SPARK-23207) and deterministic under retry. Run:
  * `runMain graft.tools.ProbeSpread` against SPARK_GRAFT_SF_DIR.
  */
object ProbeSpread {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.SessionFactory.local(32, "graft-probe-spread")
    spark.range(1000).selectExpr("sum(id)").collect()
    val p = spark.sparkContext.defaultParallelism

    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }

    def docs: DataFrame = graft.core.Tables.documents(spark, sfDir)
    def spread(df: DataFrame): DataFrame = df.repartition(p, col("doc_id"))

    // --- hit-position grind (leakHitPositionsCompute's shape) ---
    def hitPos(train: DataFrame, eval: DataFrame): Long = {
      val evalGrams = eval
        .select(explode(graft.ops.Curation.wordGrams(col("text"), 5)).as("gram"))
        .distinct()
      train
        .select(col("doc_id"), posexplode(graft.ops.Curation.posWordGrams(col("text"), 5)))
        .toDF("doc_id", "pos", "gram")
        .join(evalGrams, Seq("gram"))
        .count()
    }
    val isEval = graft.ops.Corpus.hashBucket(col("doc_id"), "eval_v1") < 200
    for (r <- 1 to 2) {
      time(s"hitpos as-is #$r")(hitPos(docs.filter(!isEval), docs.filter(isEval)))
      time(s"hitpos spread #$r")(hitPos(spread(docs.filter(!isEval)), spread(docs.filter(isEval))))
    }

    // --- passage-chunk grind (passageDedup's segs shape) ---
    def segs(d: DataFrame): Long = {
      val w = 8
      val toks = graft.ops.TextAnalysis.alphaTokens(col("text"))
      val nChunks = floor((size(toks) + lit(w - 1)).cast("double") / lit(w)).cast("int")
      val chunks = when(size(toks) >= 1,
          transform(sequence(lit(0), nChunks - 1),
            i => concat_ws(" ", slice(toks, i * w + 1, lit(w)))))
        .otherwise(array().cast("array<string>"))
      d.select(col("doc_id"), chunks.as("chunks"))
        .select(col("doc_id"), posexplode(col("chunks")).as(Seq("pos", "chunk")))
        .select(col("doc_id"), col("pos"), md5(col("chunk")).as("h"))
        .groupBy(col("h")).agg(countDistinct(col("doc_id")).as("n_docs"))
        .count()
    }
    for (r <- 1 to 2) {
      time(s"passage segs as-is #$r")(segs(docs))
      time(s"passage segs spread #$r")(segs(spread(docs)))
    }
    spark.stop()
  }
}
