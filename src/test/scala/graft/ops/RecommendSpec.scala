package graft.ops

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Invariants for the neighborhood-recommendation tier (the oracle gate pins
  * exact values; these pin the mathematical structure against naive
  * driver-side recomputes on the tiny scale).
  */
class RecommendSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** (order → distinct parts) collected driver-side for recomputes. */
  private def basketMap(): Map[Long, Set[Long]] =
    graft.core.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .groupBy(_.getLong(0)).map { case (ok, rs) =>
        ok -> rs.map(_.getLong(1)).toSet
      }

  test("item cf: top-k per item, scores in (0,1], one score recomputed directly") {
    val rows = Recommend.itemItemCf(spark, sf, minSupport = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (item, rs) =>
      assert(rs.length <= 3, s"item $item has ${rs.length} neighbors")
      assert(rs.map(_._7).sorted.sameElements(1L to rs.length), "ranks are 1..k")
      // descending by (score, neighbor asc) — verify rank order is score order
      val byRank = rs.sortBy(_._7).map(_._6)
      assert(byRank.sameElements(byRank.sortBy(-_)), s"item $item ranks not by score")
    }
    assert(rows.forall(r => r._6 > 0.0 && r._6 <= 1.0))
    val baskets = basketMap()
    val (item, nbr, nBoth, nI, nJ, score, _) = rows.head
    assert(baskets.values.count(b => b.contains(item) && b.contains(nbr)).toLong === nBoth)
    assert(baskets.values.count(_.contains(item)).toLong === nI)
    assert(baskets.values.count(_.contains(nbr)).toLong === nJ)
    assert(score === nBoth.toDouble / math.sqrt(nI.toDouble * nJ.toDouble))
  }

  test("adamic-adar: every pair recomputed from the raw baskets") {
    val rows = Recommend.adamicAdar(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val baskets = basketMap().filter(_._2.size >= 2)
    rows.foreach { case (a, b, nShared, aa) =>
      val shared = baskets.values.filter(s => s.contains(a) && s.contains(b))
      assert(shared.size.toLong === nShared, s"($a,$b) shared-basket count")
      assert(nShared >= 2)
      // same quantization ladder as the operator: ln → 12dp, 1/· → 12dp, Σ exact
      val expect = shared.map { s =>
        val lnq = BigDecimal(math.log(s.size.toDouble))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        BigDecimal(1.0 / lnq.toDouble).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      assert(math.abs(aa - expect.toDouble) < 1e-9, s"($a,$b) aa=$aa expect=$expect")
    }
  }

  test("label propagation: census partitions the vertex set; round 0 is all singletons") {
    val sym = {
      val baskets = basketMap()
      baskets.values.toSeq.flatMap(s =>
        s.toSeq.combinations(2).map(p => (p.min, p.max))).distinct
    }
    val nodes = sym.flatMap(e => Seq(e._1, e._2)).distinct
    val census = Graph.labelPropagation(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(census.map(_._2).sum === nodes.length.toLong, "members partition V")
    assert(census.map(_._1).toSet.subsetOf(nodes.toSet), "labels are node ids")
    assert(census.length < nodes.length, "two rounds merged some communities")
    val singles = Graph.labelPropagation(spark, sf, rounds = 0).collect()
    assert(singles.length === nodes.length)
    assert(singles.forall(_.getLong(1) == 1L))
  }
}
