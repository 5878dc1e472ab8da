package graft.tools

/** Stage attribution for q230 (containment pairs) — the registry's most
  * expensive query (19.35 s solo cold at sf0.1, BENCH harness). The cost has
  * three candidate owners: LSH candidate generation (minhash + band join),
  * NgramJaccardExpr scoring with the text attach, and the persist
  * materialization + final filter/checkpoint. `lshCandidatePairs` is NOT
  * memoized, so a five-point cumulative split attributes them — exploiting
  * Catalyst's own column pruning in both directions (count() on the
  * un-persisted frame PRUNES the scoring column and the doc-side gram
  * counts; aggregating a computed column forces it):
  *
  *   A  = lshCandidatePairs.count()           → candidate generation
  *   S  = docSides agg(sum(n_a + len))        → ONE side's norm + gram count
  *   B2 = scoredCompute agg(sum(n_common))    → A + attach + scoring forced
  *   B  = scoredCompute.count()               → A + attach, scoring pruned
  *   C  = containmentPairs.count()            → everything + persist + ckpt
  *
  * Each point re-executes its prefix (no cross-job shuffle reuse in Spark),
  * with the parquet read warmed by the A pass for all (run order fixed for
  * that reason — the deltas compare like against like). This split is what
  * located the round-13 fix: S was 12.4 s of C's 15.6 — the interpreted
  * size(shingles(...)) projections, not the scoring. Prints one JSON line.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ProfileQ230"
  */
object ProfileQ230 {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.SessionFactory.local(cpus.toInt, "graft-profile-q230")
    spark.range(1000).selectExpr("sum(id)").collect() // JVM/codegen warmup
    def timed(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = body
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val (tA, nPairs) = timed(graft.ops.Dedup.lshCandidatePairs(spark, sf).count())
    // one doc-side projection forced end-to-end (normText + distinct-gram
    // count per doc) — count() would prune it all away, so aggregate the
    // computed columns themselves
    val (tS, _) = timed {
      val (a, _) = graft.ops.Dedup.containmentDocSides(spark, sf)
      a.agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("n_a") +
          org.apache.spark.sql.functions.length(
            org.apache.spark.sql.functions.col("norm_a")))).collect()
      1L
    }
    // scoring forced WITHOUT the persist barrier: sum(n_common) keeps the
    // expression alive through count-style pruning
    val (tB2, _) = timed {
      graft.ops.Dedup.containmentScoredCompute(spark, sf)
        .agg(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.col("n_common"))).collect()
      1L
    }
    val (tB, nScored) = timed(graft.ops.Dedup.containmentScoredCompute(spark, sf).count())
    val (tC, nOut) = timed(graft.ops.Dedup.containmentPairs(spark, sf).count())
    val load = java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    println(f"""{"query":"q230_containment","sf":"$sf","lsh_candidates_sec":$tA%.2f,"doc_sides_sec":$tS%.2f,"scored_forced_sec":$tB2%.2f,"scored_pruned_sec":$tB%.2f,"full_sec":$tC%.2f,"n_candidate_pairs":$nPairs,"n_scored":$nScored,"n_out":$nOut,"load":$load%.2f}""")
    spark.stop()
  }
}
