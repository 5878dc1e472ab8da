package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components — the cluster-assignment stage of the
  * near-dup pipeline: LSH candidate pairs ([[Dedup.lshCandidatePairs]]) are
  * edges, and every document must learn its duplicate family so exactly one
  * representative per family survives into the training set.
  *
  * Algorithm: iterative min-label propagation. Each round every vertex takes
  * the minimum label among itself and its neighbors (one equi-join on vertex
  * id + one partial-agged min), until a fixpoint. Rounds ≤ graph diameter;
  * duplicate families are near-cliques (diameter 1–2), so 2–3 rounds close a
  * corpus of any size. Each round is a pair of narrow shuffles keyed by
  * doc_id — nothing quadratic, nothing driver-side except the fixpoint test
  * (a count of changed labels, one scalar per round). For adversarial
  * long-chain graphs the round count grows with the diameter; the classic
  * fix (large-star/small-star rewiring, which squashes diameter
  * logarithmically) plugs into the same loop, but plain propagation is the
  * right default for dedup-shaped graphs.
  *
  * Each round's labels are eagerly `localCheckpoint`ed: an iterative
  * DataFrame recurrence otherwise DOUBLES its logical plan every round
  * (labels_{k+1} references labels_k twice), and the analyzer re-walks the
  * exponentially-growing plan until it OOMs — caching alone does not cut
  * lineage. The checkpoint truncates the plan to the materialized rows;
  * dropped round RDDs are reclaimed by the ContextCleaner. On a cluster
  * where executor loss matters, swap `localCheckpoint` for a reliable
  * `checkpoint` (HDFS-backed) — same loop.
  */
object Graph {

  /** Connected components of an undirected edge list. `edges` needs columns
    * (src, dst); `vertices` one column (id) — isolated vertices become
    * singleton components. Returns (id, component) where component = min id
    * in the vertex's component.
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
      maxRounds: Int = 50): DataFrame = {
    // symmetric closure once; reused every round
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = vertices.select(col("id"), col("id").as("component"))
      .localCheckpoint(true)
    var converged = false
    var round = 0
    // One min-label propagation step (plan only — nothing materialized).
    // Explicit aliases throughout: labels and sym share scan lineage
    // (vertices and edges usually derive from the same table), which
    // otherwise trips Spark's ambiguous-self-join detection.
    def propagate(cur: DataFrame): DataFrame = {
      val viaNeighbors = cur.as("l").join(sym.as("e"), col("l.id") === col("e.src"))
        .select(col("e.dst").as("id"), col("l.component").as("component"))
      cur.select(col("id"), col("component"))
        .union(viaNeighbors)
        .groupBy(col("id"))
        .agg(min(col("component")).as("component"))
    }
    // Pointer jump (path halving): component(id) ← component(component(id)).
    // A label always names a vertex of the same component, so the jump stays
    // within the component while compressing label chains — on id-ordered
    // chains it is geometric, on adversarial id placement it degrades toward
    // ~diameter/2 rounds (the label acts as a teleport that may not point
    // toward the component minimum). One self-join per round; at most
    // single-level (nested self-joins of one un-materialized plan break
    // attribute deduplication), so `prop` feeds both jump sides directly.
    def jump(cur: DataFrame): DataFrame = {
      val lookup = cur.select(col("id").as("j_id"), col("component").as("j_comp"))
      cur.join(lookup, col("component") === col("j_id"))
        .select(col("id"), col("j_comp").as("component"))
    }
    while (!converged && round < maxRounds) {
      val next = jump(propagate(labels))
        .localCheckpoint(true) // eager: truncates lineage, one job per round
      // fixpoint probe every second round: a converged graph just recomputes
      // identical labels on the extra round, which is cheaper than probing
      // every time
      val probe = round % 2 == 1 || round >= maxRounds - 2
      val changed =
        if (!probe) 1L
        else next.as("n").join(labels.as("p"), col("n.id") === col("p.id"))
          .filter(col("n.component") =!= col("p.component"))
          .limit(1).count()
      labels = next
      converged = changed == 0
      round += 1
    }
    sym.unpersist()
    // un-converged labels are silently WRONG (one family reported as several
    // clusters, each electing its own representative) — fail instead
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge within $maxRounds rounds; " +
          "the graph has a deeper chain structure than expected — raise maxRounds")
    labels
  }

  /** Duplicate families over the VERIFIED near-dup graph: (doc_id,
    * cluster_id, cluster representative flag). Every document appears;
    * documents with no verified near-dup form singleton clusters.
    *
    * Edges are [[Dedup.ngramJaccard]]'s verified pairs (exact Jaccard ≥ 0.5),
    * not the raw LSH candidates: candidates are recall-oriented noise — at
    * sf0.1 they chain 93% of the corpus into one giant component — while
    * verified edges yield actual duplicate families. Feeding the verify
    * stage's output in also means clustering cost tracks true duplication,
    * not banding collisions.
    */
  def dupClusters(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = graft.core.Tables.documents(spark, sfDir).select(col("doc_id").as("id"))
    val edges = Dedup.ngramJaccard(spark, sfDir)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    connectedComponents(docs, edges)
      .select(col("id").as("doc_id"), col("component").as("cluster_id"),
        (col("id") === col("component")).as("is_representative"))
  }
}
