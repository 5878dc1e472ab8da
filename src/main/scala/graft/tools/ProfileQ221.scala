package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Stage split for q221 Theil–Sen (the ProfileQ230 playbook): times the
  * daily aggregate, the raw O(d²) pair join, the two-phase rank chain over
  * the pairs, and the full query — so the 8–10 s clean cost lands on a
  * stage instead of a story. Run: `runMain graft.tools.ProfileQ221`
  * against SPARK_GRAFT_SF_DIR (default sf0.1).
  */
object ProfileQ221 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.SessionFactory.local(32, "graft-prof-q221")
    spark.range(1000).selectExpr("sum(id)").collect()
    def time(label: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PROF $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    val daily = graft.core.Tables.orders(spark, sfDir)
      .select(to_date(col("o_orderdate")).as("day"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("x"))
      .withColumn("dn", datediff(col("day"), lit("1990-01-01").cast("date")).cast("long"))
      .select(col("dn"), col("x"))
    time("daily agg count")(daily.count())
    val pairs = daily.as("a").join(daily.as("b"), col("b.dn") > col("a.dn"))
      .select((col("a.dn") * 100000L + col("b.dn")).as("pid"),
        ((col("b.x") - col("a.x")).cast("double") /
          (col("b.dn") - col("a.dn")).cast("double")).as("slope"))
    time("pair join count")(pairs.count())
    time("pair join count again")(pairs.count())
    val ranked = graft.ops.Relational.twoPhaseRank(pairs, "slope", "pid", "rk")
    time("twoPhaseRank(grid) filter mid")(
      ranked.filter(col("rk") === 1000000L).count())
    val qs = (1 until 64).map(i => i.toDouble / 64).mkString(", ")
    time("sketch bounds agg")(
      pairs.agg(expr(s"approx_percentile(slope, array($qs), 10000)").as("__bs"))
        .count())
    val rankedS = graft.ops.Relational.twoPhaseRankSketch(pairs, "slope", "pid", "rk")
    time("twoPhaseRankSketch filter mid")(
      rankedS.filter(col("rk") === 1000000L).count())
    time("twoPhaseRankSketch again")(
      rankedS.filter(col("rk") === 1000000L).count())
    time("full q221 #1")(
      graft.SparkEntry.queries("q221_theil_sen")(spark, sfDir).count())
    time("full q221 #2")(
      graft.SparkEntry.queries("q221_theil_sen")(spark, sfDir).count())
    spark.stop()
  }
}
