package graft.ops

import graft.SparkSpec

/** Connected components: correctness on shapes the LSH dedup graph can take
  * (cliques, chains that force multiple propagation rounds, isolated docs),
  * and the representative flag derived from it.
  */
class GraphSpec extends SparkSpec {

  private def cc(vs: Seq[Long], es: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val vertices = vs.toDF("id")
    val edges = es.toDF("src", "dst")
    Graph.connectedComponents(vertices, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain, clique, and singleton components all collapse to their min id") {
    // chain 1-2-3-4-5 (diameter 4 → several rounds), clique {10,11,12},
    // isolated 20
    val labels = cc(
      Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L, 12L, 20L),
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
        (10L, 11L), (11L, 12L), (10L, 12L)))
    assert(labels == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
  }

  test("label flows against edge direction too (undirected semantics)") {
    // edge given high→low only; symmetric closure must still pull 7 down
    val labels = cc(Seq(3L, 7L), Seq((7L, 3L)))
    assert(labels == Map(3L -> 3L, 7L -> 3L))
  }

  test("dupClusters marks exactly one representative per cluster") {
    val sf = "/root/testdata/sf0.001"
    val clusters = Graph.dupClusters(spark, sf)
    val byCluster = clusters.groupBy("cluster_id")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.col("is_representative"), 1L).otherwise(0L))
        .as("n_reps"))
    assert(byCluster.filter(org.apache.spark.sql.functions.col("n_reps") =!= 1L).count() == 0)
    // every document is assigned
    assert(clusters.count() ==
      graft.core.Tables.documents(spark, sf).count())
  }
}
