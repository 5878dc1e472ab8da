package graft.ops

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Invariants for the experimentation tier. */
class ExperimentSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Driver-side md5-parity arm, the operator's exact rule. */
  private def armOf(uid: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$uid:exp1".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    if (java.lang.Long.parseLong(hex, 16) % 2 == 0) "A" else "B"
  }

  test("ab test: arms partition users deterministically, z and CI recomputed") {
    val users = graft.core.Tables.events(spark, sf)
      .groupBy(col("user_id")).count().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val purchases = graft.core.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byArm = users.map(_._1).groupBy(armOf)
    val r = Experiment.abTest(spark, sf).collect().head
    assert(r.getLong(0) === byArm("A").length.toLong, "n_a from md5 parity")
    assert(r.getLong(2) === byArm("B").length.toLong, "n_b from md5 parity")
    val xa = byArm("A").count(u => purchases.getOrElse(u, 0L) >= 14).toLong
    val xb = byArm("B").count(u => purchases.getOrElse(u, 0L) >= 14).toLong
    assert(r.getLong(1) === xa && r.getLong(3) === xb, "conversions recomputed")
    val (na, nb) = (r.getLong(0).toDouble, r.getLong(2).toDouble)
    val (ra, rb) = (xa / na, xb / nb)
    val p = (xa + xb) / (na + nb)
    val z = (ra - rb) / math.sqrt(p * (1.0 - p) * (1.0 / na + 1.0 / nb))
    assert(math.abs(r.getDouble(7) - z) < 1e-12, "z recomputed")
    assert(r.getBoolean(10) === (math.abs(z) > 1.96))
    assert(r.getDouble(8) <= r.getDouble(6) && r.getDouble(6) <= r.getDouble(9),
      "diff inside its own CI")
  }

  test("cuped: theta shared, adjusted metric conserves the pooled total") {
    val rows = Experiment.cuped(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    assert(rows.length === 2 && rows.map(_._1).sorted.sameElements(Seq("A", "B")))
    assert(rows.map(_._5).distinct.length === 1, "one theta for the experiment")
    // Σ y_adj = Σ y over ALL users (Σ(x - x̄) = 0 pooled), so the n-weighted
    // arm means must agree between raw and adjusted
    val rawTotal = rows.map(t => t._2 * t._3).sum
    val adjTotal = rows.map(t => t._2 * t._4).sum
    assert(math.abs(rawTotal - adjTotal) < 1e-3 * math.abs(rawTotal),
      s"pooled total conserved: $rawTotal vs $adjTotal")
    rows.foreach { case (arm, n, _, _, theta, vy, va, ratio) =>
      assert(n > 0 && vy > 0 && va > 0, arm)
      assert(math.abs(ratio - va / vy) < 1e-12, "ratio identity")
      assert(!theta.isNaN)
    }
    // CUPED's purpose: pooled variance must not increase when |corr| > 0 —
    // check the n-weighted average ratio is at most ~1
    val wRatio = rows.map(t => t._2 * t._8).sum / rows.map(_._2).sum
    assert(wRatio < 1.05, s"variance not inflated: $wRatio")
  }
}
