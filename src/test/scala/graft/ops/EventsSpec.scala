package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The HLL sketch column of q61: correct exact counts, and the approximate
  * count within the configured relative standard deviation's practical bound
  * (4 sigma) of the exact value for every group.
  */
class EventsSpec extends SparkSpec {

  test("sessionPaths enumerates every session's events, one path entry per event") {
    val sf = "/root/testdata/sf0.001"
    val paths = Events.sessionPaths(spark, sf)
    // every event appears in exactly one path entry
    assert(paths.agg(sum(col("n_events"))).head.getLong(0) ==
      graft.core.Tables.events(spark, sf).count())
    // path length is the event count for every session
    assert(paths.filter(size(split(col("path"), ">")) =!= col("n_events")).isEmpty)
    // sessions are exactly sessionize's sessions with identical event counts
    val bySession = Events.sessionize(spark, sf)
      .select(col("user_id"), col("session_seq"), col("n_events"))
    assert(paths.select(col("user_id"), col("session_seq"), col("n_events"))
      .exceptAll(bySession).isEmpty)
    assert(bySession.exceptAll(
      paths.select(col("user_id"), col("session_seq"), col("n_events"))).isEmpty)
  }

  test("funnel enforces strict sequencing against a per-user fold of sorted events") {
    val sf = "/root/testdata/sf0.001"
    val out = Events.conversionFunnel(spark, sf).collect()
      .map(r => r.getLong(0) -> ((
        Option(r.getAs[java.time.LocalDateTime]("view_ts")),
        Option(r.getAs[java.time.LocalDateTime]("click_ts")),
        Option(r.getAs[java.time.LocalDateTime]("purchase_ts")),
        r.getAs[Long]("stage")))).toMap
    val evs = graft.core.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[java.time.LocalDateTime](2)))
    val expected = evs.groupBy(_._1).flatMap { case (u, rows) =>
      val sorted = rows.sortBy(_._3.toString)
      sorted.find(_._2 == "view").map(_._3).map { v =>
        val ct = sorted.find(e => e._2 == "click" && e._3.isAfter(v)).map(_._3)
        val pt = ct.flatMap(c =>
          sorted.find(e => e._2 == "purchase" && e._3.isAfter(c)).map(_._3))
        val stage = if (pt.isDefined) 3L else if (ct.isDefined) 2L else 1L
        u -> ((Some(v), ct, pt, stage))
      }
    }.toMap
    assert(out == expected)
    assert(out.nonEmpty)
  }

  test("funnel strictness edges: pre-view clicks/purchases never count") {
    import spark.implicits._
    val d = tmpDir("funnel")
    // UTC wall-clock nanos: Timestamp.valueOf would use the JVM default zone,
    // breaking the literal assertions on any non-UTC machine
    def ns(t: String): Long =
      java.time.LocalDateTime.parse(t.replace(' ', 'T'))
        .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L
    Seq(
      // u1: early purchase ignored; full strict sequence afterwards → stage 3
      (1L, ns("2024-01-01 09:00:00"), 1L, "purchase", 1.0, "{}"),
      (2L, ns("2024-01-01 10:00:00"), 1L, "view", 1.0, "{}"),
      (3L, ns("2024-01-01 10:30:00"), 1L, "click", 1.0, "{}"),
      (4L, ns("2024-01-01 11:00:00"), 1L, "purchase", 1.0, "{}"),
      // u2: purchase after view but NO click → stage 1 (strict chain broken)
      (5L, ns("2024-01-01 10:00:00"), 2L, "view", 1.0, "{}"),
      (6L, ns("2024-01-01 10:30:00"), 2L, "purchase", 1.0, "{}"),
      // u3: pre-view click ignored; post-view click counts → stage 2
      (7L, ns("2024-01-01 09:00:00"), 3L, "click", 1.0, "{}"),
      (8L, ns("2024-01-01 10:00:00"), 3L, "view", 1.0, "{}"),
      (9L, ns("2024-01-01 11:00:00"), 3L, "click", 1.0, "{}"),
      // u4: no view at all → absent from the funnel
      (10L, ns("2024-01-01 09:00:00"), 4L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = Events.conversionFunnel(spark, d).collect()
      .map(r => r.getLong(0) -> ((
        Option(r.getAs[java.time.LocalDateTime]("click_ts")).map(_.toString),
        Option(r.getAs[java.time.LocalDateTime]("purchase_ts")).map(_.toString),
        r.getAs[Long]("stage")))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == ((Some("2024-01-01T10:30"), Some("2024-01-01T11:00"), 3L)))
    assert(out(2L) == ((None, None, 1L)))
    assert(out(3L) == ((Some("2024-01-01T11:00"), None, 2L)))
  }

  test("hopping windows: each event lands in exactly window/slide overlapping hops") {
    import spark.implicits._
    val d = tmpDir("hopping")
    def ns(t: String): Long =
      java.time.LocalDateTime.parse(t.replace(' ', 'T'))
        .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L
    Seq(
      (1L, ns("2024-01-01 10:37:00"), 1L, "click", 1.0, "{}"),  // hops 09:45..10:30
      (2L, ns("2024-01-01 10:50:00"), 2L, "click", 1.0, "{}"))  // hops 10:00..10:45
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = Events.hoppingRollup(spark, d).collect()
      .map(r => r.getAs[java.time.LocalDateTime]("window_start").toString ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("n_users")))).toMap
    assert(out === Map(
      "2024-01-01T09:45" -> ((1L, 1L)),
      "2024-01-01T10:00" -> ((2L, 2L)),
      "2024-01-01T10:15" -> ((2L, 2L)),
      "2024-01-01T10:30" -> ((2L, 2L)),
      "2024-01-01T10:45" -> ((1L, 1L))))
  }

  test("decayed popularity halves per day in exact shifted fixed point") {
    import spark.implicits._
    val d = tmpDir("decay")
    def ns(t: String): Long =
      java.time.LocalDateTime.parse(t.replace(' ', 'T'))
        .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L
    Seq(
      (1L, ns("2024-01-10 12:00:00"), 1L, "a", 1.00, "{}"),  // age 0: 100·2^30
      (2L, ns("2024-01-09 06:00:00"), 1L, "a", 1.00, "{}"),  // age 1: 50·2^30
      (3L, ns("2024-01-08 01:00:00"), 2L, "b", 0.50, "{}"))  // age 2: (50·2^30)//4
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = Events.decayedPopularity(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out === Map(
      "a" -> ((2L, 150.0 * (1L << 30))),
      "b" -> ((1L, ((50L << 30) / 4).toDouble))))
  }

  test("approx_count_distinct tracks the exact count within its error bound") {
    val rsd = 0.02
    val rows = Events.approxDistinctUsers(spark, "/root/testdata/sf0.001", rsd)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_users_exact").toDouble
      val approx = r.getAs[Long]("n_users_approx").toDouble
      assert(math.abs(approx - exact) <= math.max(4 * rsd * exact, 4.0),
        s"${r.getAs[String]("event_type")}: approx=$approx exact=$exact")
    }
  }

  test("variant schema evolution: merged schema spans versions; extraction is null-safe") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the two payload generations of q104's derivation, mixed in one column
    val payloads = Seq(
      """{"k": 7}""", """{"k": 9}""",
      """{"k": 3, "src": "web", "retry": 2}""").toDF("p")
      .select(parse_json(col("p")).as("v"))
    // schema_of_variant_agg merges the OBSERVED shapes — the evolution view:
    // one call answers "what does this payload family look like today?"
    val merged = payloads.agg(schema_of_variant_agg(col("v"))).head.getString(0)
    assert(merged.contains("k") && merged.contains("src") && merged.contains("retry"),
      s"merged schema should span both generations: $merged")
    // typed extraction tolerates the old shape: missing field → NULL, no error
    val retries = payloads
      .select(try_variant_get(col("v"), "$.retry", "bigint").as("r"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(retries.count(_.isEmpty) == 2 && retries.flatten.toSeq == Seq(2L))
    // and the variant round-trips typed values exactly
    val ks = payloads.select(variant_get(col("v"), "$.k", "bigint")).collect().map(_.getLong(0))
    assert(ks.sorted.toSeq == Seq(3L, 7L, 9L))
  }

  test("hourly spikes: every flagged hour genuinely exceeds 2x its trailing average") {
    val sf = "/root/testdata/sf0.001"
    val rows = Events.hourlySpikes(spark, sf).collect()
    assert(rows.nonEmpty, "calibrated threshold should flag some hours on this data")
    rows.foreach { r =>
      val n = r.getLong(2); val avg = r.getDouble(3)
      assert(n > 2.0 * avg, s"flagged hour $r fails its own predicate")
    }
  }

  test("gap fill: dense spine, zero-count gaps, forward fill carries the last sum") {
    val sf = "/root/testdata/sf0.001"
    val rows = Events.gapFilledHourly(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[java.time.LocalDateTime](1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    val byType = rows.groupBy(_._1)
    // every type spans the SAME dense hourly range
    val spans = byType.values.map(_.map(_._2).sorted.toSeq).toSeq
    assert(spans.map(_.size).distinct.size === 1)
    assert(spans.map(s => (s.head, s.last)).distinct.size === 1)
    assert(rows.exists(_._3 == 0L), "there are genuine gaps at this scale")
    // after a type's first observation, last_value_sum is never NULL again
    byType.values.foreach { ts =>
      val ordered = ts.sortBy(_._2.toString)
      val firstObs = ordered.indexWhere(_._3 > 0L)
      assert(ordered.drop(firstObs).forall(_._4.isDefined))
      assert(ordered.take(firstObs).forall(_._4.isEmpty), "leading gaps stay NULL")
    }
  }

  test("transition probabilities are a proper distribution per source type") {
    val sf = "/root/testdata/sf0.001"
    val rows = Events.eventTransitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (from, group) =>
      val pSum = group.map(_._3).sum
      assert(math.abs(pSum - 1.0) < 1e-9, s"$from probabilities sum to $pSum")
    }
    // conservation: total transitions = total events - one per active user
    val ev = graft.core.Tables.events(spark, sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_._2).sum === expected)
  }

  test("attribution: one row per purchase; channels never 'purchase'; lookback respected") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val rows = Events.lastTouchAttribution(spark, sf).collect()
    val ev = graft.core.Tables.events(spark, sf)
    assert(rows.length.toLong === ev.filter(col("event_type") === "purchase").count())
    rows.foreach { r =>
      if (!r.isNullAt(3)) assert(r.getString(3) != "purchase")
    }
    assert(rows.exists(_.isNullAt(3)), "some purchases are organic")
    assert(rows.exists(!_.isNullAt(3)), "some purchases are attributed")
    // spot-check one attributed purchase against a direct as-of recompute
    val attributed = rows.filter(!_.isNullAt(3)).head
    val pid = attributed.getLong(0)
    val p = ev.filter(col("event_id") === pid).head
    val direct = ev
      .filter(col("user_id") === p.getAs[Long]("user_id") &&
        col("event_type") =!= "purchase")
      .filter(col("ts") < p.getAs[java.time.LocalDateTime]("ts") ||
        (col("ts") === p.getAs[java.time.LocalDateTime]("ts") &&
          col("event_id") < pid))
      .orderBy(col("ts").desc, col("event_id").desc).limit(1).head
    assert(direct.getAs[String]("event_type") === attributed.getString(3))
  }

  test("rolling distinct: each window >= its single day, <= the week's union") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val rolling = Events.rollingDistinctUsers(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    val daily = graft.core.Tables.events(spark, sf)
      .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
      .groupBy("d").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    assert(rolling.keySet === daily.keySet, "one window per active day")
    val totalUsers = graft.core.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    daily.foreach { case (d, n) =>
      assert(rolling(d) >= n && rolling(d) <= totalUsers, s"window $d out of bounds")
    }
  }

  test("cohort ltv: cumulative revenue monotone per cohort, offset-0 covers every cohort") {
    val sf = "/root/testdata/sf0.001"
    val rows = Events.cohortLtv(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (cohort, cells) =>
      val byOff = cells.sortBy(_._2)
      assert(byOff.head._2 === 0L, s"cohort $cohort must have its birth month")
      assert(byOff.map(_._4).sum === byOff.last._5, "cumulative telescopes")
      byOff.sliding(2).foreach {
        case Array(a, b) => assert(b._5 >= a._5, s"cohort $cohort cum monotone")
        case _ =>
      }
      cells.foreach(c => assert(c._6 === c._5.toDouble / c._3.toDouble, "ltv identity"))
    }
    // cohort sizes partition the customer base
    val nCust = graft.core.Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(rows.groupBy(_._1).map(_._2.head._3).sum === nCust)
  }

  test("session funnel: one row per viewing session, windows and ordering hold") {
    val sf = "/root/testdata/sf0.001"
    val rows = Events.sessionFunnel(spark, sf).collect()
    assert(rows.nonEmpty)
    // exactly the sessions whose event path contains a view, each once
    val viewing = Events.sessionPaths(spark, sf).collect()
      .filter(_.getString(2).split(">").contains("view"))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet === viewing)
    assert(rows.length === viewing.size, "one funnel row per viewing session")
    rows.foreach { r =>
      val stage = r.getLong(5)
      assert(stage >= 1 && stage <= 3)
      assert(r.isNullAt(3) === (stage < 2), "click_ts present iff stage >= 2")
      assert(r.isNullAt(4) === (stage < 3), "purchase_ts present iff stage = 3")
      if (stage >= 2) {
        val lat = r.getLong(6)
        assert(lat > 0 && lat <= 10L * 60 * 1000000, s"click window: $lat")
      } else assert(r.isNullAt(6))
      if (stage == 3) {
        val lat = r.getLong(7)
        assert(lat > 0 && lat <= 30L * 60 * 1000000, s"purchase window: $lat")
      } else assert(r.isNullAt(7))
    }
    // strict ordering (view < click < purchase) is already pinned by the
    // positive-latency checks above — the latencies ARE the µs differences
  }

  test("path entropy: bridged entropies recomputed off q142's own cells") {
    val sf = "/root/testdata/sf0.001"
    import java.math.{BigDecimal => BD, RoundingMode}
    def lnB(x: Double): Double =
      new BD(java.lang.Double.toString(math.log(x)))
        .setScale(12, RoundingMode.HALF_UP).toPlainString.toDouble
    def q12(x: Double): BD =
      new BD(java.lang.Double.toString(x)).setScale(12, RoundingMode.HALF_UP)
    val cells = Events.eventTransitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val n = cells.map(_._3).sum
    val fromTot = cells.groupBy(_._1).map { case (f, cs) => (f, cs.map(_._3).sum) }
    val toTot = cells.groupBy(_._2).map { case (t, cs) => (t, cs.map(_._3).sum) }
    val hCond = -cells.map { case (f, _, c) =>
      q12((c.toDouble / n.toDouble) * lnB(c.toDouble / fromTot(f).toDouble))
    }.reduce(_ add _).toPlainString.toDouble
    val hMarg = -toTot.values.map { c =>
      q12((c.toDouble / n.toDouble) * lnB(c.toDouble / n.toDouble))
    }.reduce(_ add _).toPlainString.toDouble
    val row = Events.pathEntropy(spark, sf).collect().head
    assert(row.getLong(0) === n)
    assert(row.getDouble(1) === hMarg, "marginal next-step entropy")
    assert(row.getDouble(2) === hCond, "conditional entropy")
    assert(row.getDouble(3) === hMarg - hCond, "mutual info is the difference")
    // conditioning never increases entropy (up to bridge rounding)
    assert(row.getDouble(3) >= -1e-9)
  }

  test("funnel wilson: counts off q96's own stages; intervals bracket the rate") {
    val sf = "/root/testdata/sf0.001"
    val stages = Events.conversionFunnel(spark, sf).collect()
      .map(_.getLong(4))
    val n1 = stages.length.toLong
    val n2 = stages.count(_ >= 2L).toLong
    val n3 = stages.count(_ == 3L).toLong
    val rows = Events.funnelWilson(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).sortBy(_._1)
    assert(rows.map(r => (r._1, r._2, r._3)).toList ===
      List(("click_to_purchase", n2, n3), ("view_to_click", n1, n2)))
    rows.foreach { case (step, n, k, rate, lo, hi) =>
      assert(rate === k.toDouble / n.toDouble, s"$step rate")
      val z = 1.96; val z2 = z * z
      val nD = n.toDouble
      val center = rate + z2 / (2.0 * nD)
      val rad = z * math.sqrt(rate * (1.0 - rate) / nD + z2 / (4.0 * nD * nD))
      val denom = 1.0 + z2 / nD
      assert(lo === (center - rad) / denom, s"$step lower bound tree")
      assert(hi === (center + rad) / denom, s"$step upper bound tree")
      assert(lo >= 0.0 && hi <= 1.0 && lo <= rate && rate <= hi,
        s"$step Wilson bracket inside [0,1]")
    }
  }

  test("markov stationary: the 8 bridged power rounds replayed off q142's cells") {
    val sf = "/root/testdata/sf0.001"
    import java.math.{BigDecimal => BD, RoundingMode}
    def q18(x: Double): BD =
      new BD(java.lang.Double.toString(x)).setScale(18, RoundingMode.HALF_UP)
    def bridge(b: BD): Double = b.toPlainString.toDouble
    val cells = Events.eventTransitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val states = cells.map(_._1).distinct.sorted
    val kept = cells.filter(c => states.contains(c._2))
    val cf = kept.groupBy(_._1).map { case (f, cs) => (f, cs.map(_._3).sum) }
    val p = kept.map(c => ((c._1, c._2), c._3.toDouble / cf(c._1).toDouble)).toMap
    var dist = states.map(s => (s, 1.0 / states.length.toDouble)).toMap
    (1 to 8).foreach { _ =>
      val raw = states.map { to =>
        val terms = kept.filter(_._2 == to)
          .map(c => q18(dist(c._1) * p((c._1, c._2))))
        (to, if (terms.isEmpty) 0.0
        else bridge(terms.reduce(_ add _)))
      }.toMap
      val tot = bridge(states.map(s => q18(raw(s))).reduce(_ add _))
      dist = states.map(s => (s, raw(s) / tot)).toMap
    }
    val rows = Events.markovStationary(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(rows.keySet === dist.keySet)
    states.foreach { s =>
      assert(rows(s) === dist(s), s"$s stationary probability")
    }
    assert(math.abs(rows.values.sum - 1.0) < 1e-12, "a distribution")
  }
}
