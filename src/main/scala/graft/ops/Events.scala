package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** Event-stream analytics over the `events` table, batch form. The same logical
  * shapes run as Structured Streaming in [[graft.streaming.EventStream]] —
  * tumbling windows map to `groupBy(window($"ts", …))` with a watermark, and
  * sessionization maps to `flatMapGroupsWithState` — the batch versions double as
  * the oracle-checkable semantics contract.
  */
object Events {

  /** Tumbling one-hour windows per event type: count + exact sum. At scale this
    * is a single partial/final hash aggregate keyed by (hour, type).
    */
  def hourlyRollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(
        date_trunc("hour", col("ts")).as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"),
        countDistinct(col("user_id")).as("n_users"))

  /** Hopping (sliding) windows: one-hour windows advancing every 15 minutes —
    * the moving-rate shape (each event lands in window/slide = 4 overlapping
    * windows). Spark's `window(ts, len, slide)` expands the hop set per row
    * BEFORE the partial aggregate, so the exchange carries one row per
    * (window, type), never 4× the events; boundaries are epoch-aligned, which
    * the oracle mirrors with 15-minute `time_bucket`s. Streaming twin: the
    * identical expression under `readStream` + watermark (see
    * [[graft.streaming.EventStream]] for the tumbling member of the family).
    */
  def hoppingRollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"),
        countDistinct(col("user_id")).as("n_users"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"), col("n_users"))

  /** Exponentially time-decayed popularity per event type — freshness-
    * weighted scoring (feed ranking, trending-over-lifetime) with a one-day
    * half-life: each event contributes value · 2^(−age_days).
    *
    * Exact fixed point, not float pow(): contribution =
    * (value_cents · 2³⁰) div 2^age — shift-and-floor-divide is bit-identical
    * in Spark and DuckDB (age capped at 62 so the shift never wraps), per-doc
    * sums run in DECIMAL(38,0) (order-free), and the single decimal→double
    * cast at the end is deterministic. The reference anchor (corpus max day)
    * rides a broadcast one-row aggregate.
    */
  def decayedPopularity(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val anchor = ev.agg(to_date(max(col("ts"))).as("max_day"))
    ev.crossJoin(broadcast(anchor))
      .withColumn("age", least(datediff(col("max_day"), to_date(col("ts"))), lit(62)).cast("long"))
      .withColumn("cents", (col("value").cast(DecimalType(18, 2)) * 100).cast("long"))
      .withColumn("decayed",
        expr("(cents * 1073741824L) div shiftleft(1L, cast(age as int))"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("decayed").cast(DecimalType(38, 0))).cast("double").as("decayed_value"))
  }

  /** Gap-based sessionization: a new session starts after >30 min of inactivity.
    * Classic lag → flag → running-sum-of-flags; one shuffle on user_id, then all
    * window work is within-partition.
    */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame =
    withSessionSeq(Tables.events(spark, sfDir))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("session_value"))

  /** Gap sessionization via Spark's BUILT-IN `session_window` aggregation —
    * the FOURTH spelling of the q15 semantics beside the lag-window batch
    * form and the three stateful streaming APIs (q34/q82/q84), and the most
    * declarative: the merging-session machinery lives in the engine, so the
    * same expression runs batch here and streaming (with a watermark) in
    * [[graft.streaming.SessionStream.sessionizeNativeToParquet]]. All four
    * share ONE oracle.
    *
    * Boundary caveat, checked against the data: `session_window` treats a
    * gap of EXACTLY the timeout as a new session (half-open [start, end)
    * windows), while the lag formulation's `>` keeps it — the corpus has no
    * exact-30:00.000000 gap at any scale factor, so the spellings agree
    * here; a deployment where such gaps occur must pick one rule.
    *
    * Scale shape: partial merging-session aggregation BEFORE the user_id
    * exchange (in-partition session merge), then final merge per user — the
    * same one-shuffle budget as the window form, without materializing a
    * per-event running flag. session_seq is a per-user window over the
    * SESSION rows (|sessions| rows, not |events|).
    */
  def sessionizeNative(spark: SparkSession, sfDir: String): DataFrame = {
    // session_window needs TimestampType; under the UTC session the NTZ cast
    // is wall-clock identity, and the emitted bounds are min/max of the
    // ORIGINAL NTZ ts so the output schema matches q15 exactly
    val sessions = Tables.events(spark, sfDir)
      .withColumn("tsw", col("ts").cast("timestamp"))
      .groupBy(col("user_id"), session_window(col("tsw"), "30 minutes"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("session_value"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("session_start"))
    sessions
      .withColumn("session_seq", row_number().over(byUser).cast("long"))
      .select(col("user_id"), col("session_seq"), col("session_start"),
        col("session_end"), col("n_events"), col("session_value"))
  }

  /** The shared session assignment: a new session starts after >30 min of
    * inactivity (lag → flag → running flag sum). One shuffle on user_id; all
    * window work is within-partition.
    */
  private def withSessionSeq(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val newSession = when(
      col("ts") > lag(col("ts"), 1).over(byUser) + expr("INTERVAL 30 MINUTES") ||
        lag(col("ts"), 1).over(byUser).isNull,
      lit(1L)).otherwise(lit(0L))
    events.withColumn("session_seq", sum(newSession).over(
      byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session event paths — the funnel/journey primitive: each session's
    * event types in time order, joined into one `a>b>c` path string. Uses
    * [[sessionize]]'s exact session assignment, then one hash aggregate per
    * session whose in-session order comes from `array_sort` over
    * (ts, event_id, type) structs — deterministic under any partitioning, no
    * second window pass. Paths are bounded by session length; the text-heavy
    * column never exceeds one row per session.
    */
  def sessionPaths(spark: SparkSession, sfDir: String): DataFrame =
    withSessionSeq(Tables.events(spark, sfDir))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
            x => x.getField("event_type")),
          ">").as("path"),
        count(lit(1)).as("n_events"))

  /** Distinct users per event type, exact AND HyperLogLog++. At 100 TB the
    * exact form is the expensive one (distinct forces the full key set
    * through the shuffle); the sketch aggregates partial HLL registers
    * map-side, shuffling constant bytes per group, at bounded relative error.
    * Both are emitted so the gate can check the exact column; the sketch's
    * error bound is pinned by `EventsSpec`. No cross-engine oracle exists for
    * the sketch value itself (HLL implementations differ), so this query is
    * registered rows-only.
    */
  def approxDistinctUsers(spark: SparkSession, sfDir: String, rsd: Double = 0.02): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("n_users_exact"),
        approx_count_distinct(col("user_id"), rsd).as("n_users_approx"))

  /** The ORACLE-GATED form of q61's HLL contract — the q165 pattern applied
    * to approx_count_distinct: the sketch VALUE is engine-specific (q61
    * stays rows-only), but its ERROR BOUND is not. Per group we emit the
    * exact distinct count and a verdict that the sketch landed within
    * 4·rsd of it (HLL++ error is approximately Gaussian with σ ≈ rsd, so
    * 4σ is a deterministic-in-practice spec bound; the same 4σ convention
    * as EventsSpec's unit pin). The DuckDB oracle recomputes the exact
    * counts and pins `within_bound = TRUE`, so an HLL regression past its
    * advertised accuracy breaks the hash gate — the 100 TB NDV swap
    * (constant bytes per group through the shuffle vs the full key set)
    * has its error budget CI-enforced.
    */
  def hllBound(spark: SparkSession, sfDir: String, rsd: Double = 0.02): DataFrame =
    approxDistinctUsers(spark, sfDir, rsd)
      .select(col("event_type"), col("n_users_exact"),
        (abs(col("n_users_approx").cast("double") - col("n_users_exact")) <=
          lit(4.0 * rsd) * col("n_users_exact")).as("within_bound"))

  /** Semi-structured payloads: parse the JSON `props` column with an explicit
    * schema (`from_json` — codegen'd, no UDF, malformed rows become NULL
    * rather than failures) and aggregate the extracted field. The parse is
    * per-row before the aggregate's map-side combine, so the shuffle carries
    * |event_type| rows.
    */
  def propsFieldStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"),
        from_json(col("props"), "k BIGINT", Map.empty[String, String])
          .getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))

  /** Schema-evolution over the `props` payload family via VariantType — the
    * semi-structured path a long-lived event pipeline needs when producers
    * upgrade their payloads out from under consumers. The corpus carries one
    * payload shape (`{"k": n}`); a second, EVOLVED shape is derived
    * deterministically (odd event_ids re-emit with added `src`/`retry`
    * fields, values pure functions of the row), and the query consumes the
    * mixed stream the schema-on-read way:
    *
    *  - `parse_json` → a variant column (binary-encoded, no global schema);
    *  - `try_variant_get` typed extraction that yields NULL (not an error)
    *    where a shape lacks the field — v1 rows simply have no `retry`;
    *  - a schema census: rows grouped by their payload's sorted key
    *    signature, so "which payload versions are live, and how many of
    *    each?" is one aggregate.
    *
    * The oracle mirrors every step with DuckDB's JSON functions (extraction
    * and key sets are engine-portable; variant is the ENCODING, not the
    * semantics). The Spark-only `schema_of_variant_agg` merged-schema view is
    * spec-gated in EventsSpec instead — no cross-engine spelling exists.
    *
    * Scale shape: parse + extraction are per-row inside the scan; the census
    * aggregate's map-side combine reduces the shuffle to |event_type| ×
    * |signatures| rows. Variant's binary encoding is built once per row —
    * no repeated JSON re-parse per extracted field, the reason the variant
    * path beats `get_json_object` chains on wide payloads.
    */
  def propsEvolution(spark: SparkSession, sfDir: String): DataFrame = {
    val k = from_json(col("props"), "k BIGINT", Map.empty[String, String]).getField("k")
    val evolved = when(pmod(col("event_id"), lit(2)) === 1,
        to_json(struct(k.as("k"), lit("web").as("src"),
          pmod(col("event_id"), lit(3)).as("retry"))))
      .otherwise(col("props"))
    Tables.events(spark, sfDir)
      .select(col("event_type"), evolved.as("p"))
      .select(col("event_type"),
        array_join(array_sort(json_object_keys(col("p"))), ",").as("schema_sig"),
        parse_json(col("p")).as("v"))
      .select(col("event_type"), col("schema_sig"),
        try_variant_get(col("v"), "$.k", "bigint").as("k"),
        try_variant_get(col("v"), "$.retry", "bigint").as("retry"))
      .groupBy(col("event_type"), col("schema_sig"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        count(col("retry")).as("n_retry"),
        sum(col("retry")).as("sum_retry"))
  }

  /** Weekly retention cohorts: users grouped by the date of their FIRST
    * signup event; for each (cohort_date, week_offset) the count of distinct
    * cohort members active that week. Week offsets are whole 7-day spans
    * from the cohort date (no calendar-week semantics — week-start
    * conventions differ across engines; day arithmetic does not).
    *
    * Scale shape: the cohort frame is one date per user (hash agg with
    * map-side combine); the events join is a user_id equi-join; the final
    * distinct count is a two-phase agg on (cohort, offset, user) — narrow
    * keys end to end, no windows over raw events.
    */
  def retentionCohorts(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val cohorts = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("cohort_date"))
    ev.join(cohorts, Seq("user_id"))
      .withColumn("week_offset",
        floor(datediff(to_date(col("ts")), col("cohort_date")) / 7).cast("long"))
      .filter(col("week_offset") >= 0)
      .groupBy(col("cohort_date"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
  }

  /** RETENTION HALF-LIFE per cohort — the log-linear decay fit a growth
    * team reads off the q99 retention matrix: regress ln(week-k active /
    * week-0 active) on k for k ≥ 1 and report the decay slope plus
    * half-life ln2 / (−slope) for decaying cohorts. The q143 regression
    * recipe applied to the cohort curves: ln rates bridge to 12 decimals,
    * Σy/Σxy fold in exact decimal, the slope is the identical double
    * expression on both engines, and ln 2 is interpolated from THIS Scala
    * double (the two engines' `ln(2)` may differ by an ulp). Scale shape:
    * everything after [[retentionCohorts]]' aggregate runs on
    * |cohorts × weeks| rows; the week-0 bases broadcast.
    */
  def retentionHalfLife(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val ln2 = math.log(2.0)
    val r = retentionCohorts(spark, sfDir)
    val base = r.filter(col("week_offset") === 0)
      .select(col("cohort_date"), col("n_active").as("n0"))
    val y = graft.core.Num.decToDouble(
      log(col("n_active").cast("double") / col("n0")).cast(DecimalType(18, 12)))
    val pts = r.join(broadcast(base), Seq("cohort_date"))
      .filter(col("week_offset") >= 1)
      .select(col("cohort_date"), col("week_offset").as("x"), y.as("y"))
    val s = pts.groupBy(col("cohort_date")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"),
      sum(col("x") * col("x")).as("sxx"),
      graft.core.Num.decToDouble(
        sum(col("y").cast(DecimalType(28, 14)))).as("sy"),
      graft.core.Num.decToDouble(
        sum((col("x").cast("double") * col("y")).cast(DecimalType(28, 14))))
        .as("sxy"))
    val nD = col("n").cast("double")
    val sxD = col("sx").cast("double")
    val sxxD = col("sxx").cast("double")
    val slope = (nD * col("sxy") - sxD * col("sy")) / (nD * sxxD - sxD * sxD)
    s.filter(col("n") >= 2 && (nD * sxxD - sxD * sxD) > 0)
      .select(col("cohort_date"), col("n").as("n_weeks"),
        slope.as("decay_slope"),
        when(slope < 0, lit(ln2) / -slope).as("half_life_weeks"))
  }

  /** Conversion funnel view → click → purchase: for each user with at least
    * one view, the FIRST view, the first click strictly after that view, and
    * the first purchase strictly after that click, plus the funnel stage
    * reached (1/2/3). The sequencing is strict (each stage's event must
    * follow the previous stage's), which a naive per-type min() would get
    * wrong for users who purchase before ever viewing.
    *
    * Scale shape: three narrow per-user hash aggregates (partial map-side
    * combine — each carries one timestamp per user through its exchange)
    * chained by equi-joins on user_id; no window over raw events, no
    * per-user event array. AQE broadcasts the stage frames while they fit.
    */
  def conversionFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir).select(col("user_id"), col("event_type"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("view_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .join(views, Seq("user_id"))
      .filter(col("ts") > col("view_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .join(clicks, Seq("user_id"))
      .filter(col("ts") > col("click_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("purchase_ts"))
    views
      .join(clicks, Seq("user_id"), "left")
      .join(purchases, Seq("user_id"), "left")
      .withColumn("stage",
        when(col("purchase_ts").isNotNull, 3L)
          .when(col("click_ts").isNotNull, 2L)
          .otherwise(1L))
  }

  /** WILSON 95% CONFIDENCE INTERVALS (Wilson 1927, public) on q96's two
    * funnel conversion steps — the uncertainty the raw rates lack: a
    * 40%-conversion step estimated from 50 users and one from 50,000 look
    * identical in q96 but decide differently, and Wilson (unlike the normal
    * interval) stays inside [0,1] and behaves at small k. Counts are exact
    * BIGINTs off q96's stage column (ONE aggregate); p̂, the interval
    * center (p̂ + z²/2n)/(1 + z²/n) and radius are fixed double trees with
    * z = 1.96 a shared literal. Scale shape: q96's three user-grouped
    * aggregates, then everything runs on one row exploded to two.
    */
  def funnelWilson(spark: SparkSession, sfDir: String, z: Double = 1.96): DataFrame = {
    val s = conversionFunnel(spark, sfDir)
      .agg(count(lit(1)).as("n1"),
        sum(when(col("stage") >= 2L, 1L).otherwise(0L)).as("n2"),
        sum(when(col("stage") === 3L, 1L).otherwise(0L)).as("n3"))
    val steps = s.select(explode(array(
        struct(lit("view_to_click").as("step"),
          col("n1").as("n"), col("n2").as("k")),
        struct(lit("click_to_purchase").as("step"),
          col("n2").as("n"), col("n3").as("k")))).as("st"))
      .select(col("st.step").as("step"), col("st.n").as("n"), col("st.k").as("k"))
    val nD = col("n").cast("double")
    val p = col("k").cast("double") / nD
    val z2 = lit(z * z)
    val denom = lit(1.0) + z2 / nD
    val center = p + z2 / (lit(2.0) * nD)
    val rad = lit(z) * sqrt(p * (lit(1.0) - p) / nD + z2 / (lit(4.0) * nD * nD))
    steps.select(col("step"), col("n"), col("k"), p.as("rate"),
      ((center - rad) / denom).as("wilson_lo"),
      ((center + rad) / denom).as("wilson_hi"))
  }

  /** SESSIONIZED CONVERSION FUNNEL with bounded conversion windows — the
    * q96 × q105 composition: the strict view → click → purchase sequence
    * evaluated WITHIN each 30-min-gap session, and each transition must
    * land inside its conversion window (click ≤ `clickWindowMin` after the
    * session's first view; purchase ≤ `purchaseWindowMin` after that
    * click). The global q96 funnel credits a purchase days after the view;
    * attribution windows are how production funnels actually count.
    * Latencies are exact microsecond integers (the q212 epoch_us recipe —
    * no cross-engine second-truncation ambiguity).
    *
    * Scale shape: ONE window pass assigns session_seq (partitioned by
    * user — parallel, the q15 machinery), then q96's three narrow hash
    * aggregates keyed by (user, session) chained by equi-joins; no
    * per-session event array, nothing event-sized crosses a second
    * shuffle. AQE broadcasts the stage frames while they fit.
    */
  def sessionFunnel(spark: SparkSession, sfDir: String,
      clickWindowMin: Int = 10, purchaseWindowMin: Int = 30): DataFrame = {
    val ev = withSessionSeq(Tables.events(spark, sfDir))
      .select(col("user_id"), col("session_seq"), col("event_type"), col("ts"))
    val key = Seq("user_id", "session_seq")
    val views = ev.filter(col("event_type") === "view")
      .groupBy(key.map(col): _*).agg(min(col("ts")).as("view_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .join(views, key)
      .filter(col("ts") > col("view_ts") &&
        col("ts") <= col("view_ts") + expr(s"INTERVAL $clickWindowMin MINUTES"))
      .groupBy(key.map(col): _*).agg(min(col("ts")).as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .join(clicks, key)
      .filter(col("ts") > col("click_ts") &&
        col("ts") <= col("click_ts") + expr(s"INTERVAL $purchaseWindowMin MINUTES"))
      .groupBy(key.map(col): _*).agg(min(col("ts")).as("purchase_ts"))
    def us(c: Column): Column = unix_micros(c.cast("timestamp"))
    views
      .join(clicks, key, "left")
      .join(purchases, key, "left")
      .select(col("user_id"), col("session_seq"), col("view_ts"),
        col("click_ts"), col("purchase_ts"),
        when(col("purchase_ts").isNotNull, 3L)
          .when(col("click_ts").isNotNull, 2L)
          .otherwise(1L).as("stage"),
        (us(col("click_ts")) - us(col("view_ts"))).as("click_lat_us"),
        (us(col("purchase_ts")) - us(col("click_ts"))).as("purchase_lat_us"))
  }

  /** Hourly volume anomalies per event type: an hour is a spike when its
    * count exceeds 2× the average of the trailing 24 OBSERVED hours (rows,
    * not wall-clock — gaps don't dilute the baseline), with at least 12
    * hours of history so the first day can't self-flag. All-integer counts
    * compared through one double division keep the predicate reproducible
    * across engines — a mean/stddev z-score would hinge on FP summation
    * order exactly at the threshold.
    *
    * Scale shape: the window runs over the HOURLY rollup (8760 rows per
    * type-year), not raw events; the only event-sized job is the first
    * hash aggregate, which combines map-side.
    */
  def hourlySpikes(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
    val trailing = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(-24, -1)
    hourly
      .withColumn("trailing_n", sum(col("n")).over(trailing))
      .withColumn("trailing_hours", count(lit(1)).over(trailing))
      .filter(col("trailing_hours") >= 12 &&
        col("n").cast("double") > lit(2.0) * col("trailing_n") / col("trailing_hours"))
      .select(col("event_type"), col("hour"), col("n"),
        (col("trailing_n").cast("double") / col("trailing_hours")).as("trailing_avg"))
  }

  /** First-order Markov transition matrix of user behavior: for every
    * consecutive event pair within a user's timeline, the transition count
    * and its probability conditioned on the source type. One lead() over
    * (user, time) — the same partitioning the sessionizers use — then a
    * pair-keyed aggregate (≤ |types|² rows); the probability is a ratio of
    * exact counts, so one IEEE division per output row.
    */
  def eventTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    val byUserTime = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("to_type", lead(col("event_type"), 1).over(byUserTime))
      .filter(col("to_type").isNotNull)
    pairs
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .withColumn("p_transition",
        col("n_transitions").cast("double") /
          sum(col("n_transitions")).over(Window.partitionBy("from_type")))
  }

  /** SESSION-PATH PREDICTABILITY: the conditional entropy H(next | current)
    * of q142's transition matrix, beside the marginal H(next) and their
    * difference — the mutual information the current step carries about
    * the next. The one-number answer to "are user journeys structured or
    * random?": H(next|cur) ≈ H(next) means the funnel order is noise;
    * a large gap means paths are predictable (and a path model is worth
    * training). Exactness: the q282 recipe verbatim — every probability a
    * ratio of exact BIGINT transition counts, every ln through the
    * 12-decimal bridge, each −(c/N)·ln(·) term quantized to 12 decimals
    * before the exact decimal fold, so accumulation order never matters.
    * Scale shape: ONE corpus-sized job (the per-user lead window + the
    * |types|² count aggregate q142 already pays); everything after runs on
    * the ≤|types|² cells frame.
    */
  def pathEntropy(spark: SparkSession, sfDir: String): DataFrame = {
    def q12(c: Column): Column = c.cast("string").cast(DecimalType(28, 12))
    def lnB(c: Column): Column =
      graft.core.Num.decToDouble(log(c).cast(DecimalType(18, 12)))
    val byUserTime = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val cells = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("to_type", lead(col("event_type"), 1).over(byUserTime))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("c_ft"))
    val fromTot = cells.groupBy(col("from_type")).agg(sum(col("c_ft")).as("c_f"))
    val toTot = cells.groupBy(col("to_type")).agg(sum(col("c_ft")).as("c_t"))
    val n = cells.agg(sum(col("c_ft")).as("n"))
    val hCond = cells.join(broadcast(fromTot), "from_type")
      .crossJoin(broadcast(n))
      .select(q12((col("c_ft").cast("double") / col("n").cast("double")) *
        lnB(col("c_ft").cast("double") / col("c_f").cast("double"))).as("t"))
      .agg((-graft.core.Num.decToDouble(sum(col("t")))).as("h_next_given_cur"))
    val hMarg = toTot.crossJoin(broadcast(n))
      .select(max(col("n")).as("n_transitions"),
        (-graft.core.Num.decToDouble(sum(q12(
          (col("c_t").cast("double") / col("n").cast("double")) *
            lnB(col("c_t").cast("double") / col("n").cast("double"))))))
          .as("h_next"))
    hMarg.crossJoin(hCond)
      .select(col("n_transitions"), col("h_next"), col("h_next_given_cur"),
        (col("h_next") - col("h_next_given_cur")).as("mutual_info"))
  }

  /** STATIONARY DISTRIBUTION of q142's empirical event-transition chain by
    * `iters` unrolled power-iteration rounds (the PageRank/HITS dataflow on
    * the |types|² matrix) — where user attention settles if journeys run
    * long: the equilibrium read before sizing per-surface capacity, and the
    * chain-level companion of q286's one-step entropy. The chain restricts
    * to states with outgoing mass (dangling targets drop; each round
    * sum-normalizes, the q192 discipline), contributions round to
    * DECIMAL(28,18) and fold exactly (order-free), totals ride broadcast
    * one-row frames. Scale shape: ONE corpus-sized job (q142's per-user
    * lead window) pays once into a localCheckpoint; all `iters` rounds run
    * on the k²-row matrix.
    */
  def markovStationary(spark: SparkSession, sfDir: String, iters: Int = 8): DataFrame = {
    val byUserTime = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val cells = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("to_type", lead(col("event_type"), 1).over(byUserTime))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("c_ft"))
    val states = cells.select(col("from_type").as("state")).distinct()
    val kept = cells.join(states.select(col("state").as("to_type")), "to_type")
    val denom = kept.groupBy(col("from_type")).agg(sum(col("c_ft")).as("c_f"))
    val p = kept.join(denom, "from_type")
      .select(col("from_type"), col("to_type"),
        (col("c_ft").cast("double") / col("c_f").cast("double")).as("p"))
      .localCheckpoint(true) // the corpus-sized window pays once
    val k = states.agg(count(lit(1)).as("k"))
    var dist = states.crossJoin(broadcast(k))
      .select(col("state"), (lit(1.0) / col("k").cast("double")).as("prob"))
    for (_ <- 1 to iters) {
      val raw = p.join(dist, p("from_type") === dist("state"))
        .select(col("to_type"), (col("prob") * col("p")).as("contrib"))
        .groupBy(col("to_type"))
        .agg(graft.core.Num.decToDouble(
          sum(col("contrib").cast(DecimalType(28, 18)))).as("raw"))
      val tot = raw.agg(graft.core.Num.decToDouble(
        sum(col("raw").cast(DecimalType(28, 18)))).as("t"))
      dist = states.join(raw, states("state") === raw("to_type"), "left")
        .crossJoin(broadcast(tot))
        .select(col("state"),
          (coalesce(col("raw"), lit(0.0)) / col("t")).as("prob"))
        // cut per-round lineage growth: measured 11.9 s solo WITH the
        // k-row checkpoints vs 14.5 s without (the 8-round analyzed plan
        // costs more than the 8 tiny checkpoint jobs)
        .localCheckpoint(true)
    }
    dist.select(col("state").as("event_type"), col("prob").as("stationary_p"))
  }

  /** Gap-filled hourly series: a dense (event_type × hour) spine over the
    * table's full time range, observed hours joined in, missing hours
    * filled with n=0 and a FORWARD-FILLED last observed hourly value sum
    * (the time-series regularization every downstream
    * resampler/anomaly-detector assumes; leading gaps before a type's first
    * observation stay NULL, which is the honest answer).
    *
    * Scale shape: the spine is |types| × |hours| rows built from one
    * broadcast min/max — for a year that is 8760 rows per type, window
    * partitions are per-type, and the only event-sized job is the hourly
    * rollup itself.
    */
  def gapFilledHourly(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("value_sum"))
    val bounds = hourly.agg(min(col("hour")).as("mn"), max(col("hour")).as("mx"))
    // sequence() coerces NTZ bounds to LTZ timestamps; cast back (identity
    // under the UTC session timezone every entry point sets)
    val spine = hourly.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("mn"), col("mx"), expr("INTERVAL 1 HOUR"))).as("h"))
      .select(col("event_type"), col("h").cast("timestamp_ntz").as("hour"))
    val ffill = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq("event_type", "hour"), "left")
      .select(col("event_type"), col("hour"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("value_sum"), ignoreNulls = true).over(ffill).as("last_value_sum"))
  }

  /** LAST-TOUCH ATTRIBUTION: every purchase credited to the same user's most
    * recent NON-purchase event within a lookback window (NULL = organic) —
    * the marketing-attribution join expressed as ONE ordered window instead
    * of an as-of self-join: `last(non-purchase, ignoreNulls)` over
    * (user, time) with a rows-preceding frame carries the candidate
    * touchpoint to every purchase in the same pass that scans the events.
    * The (ts, channel) pair travels as one struct so both fields always
    * come from the SAME touch event; the lookback test then runs on the
    * carried ts. One shuffle (by user), window state O(1) per row — at
    * 100 TB this beats the as-of join's range bucketing because the events
    * table is already the only input.
    */
  def lastTouchAttribution(spark: SparkSession, sfDir: String,
      lookbackMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .withColumn("touch",
        last(when(col("event_type") =!= "purchase",
          struct(col("ts").as("tts"), col("event_type").as("tchannel"))),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"),
        when(col("touch.tts") >=
          col("ts") - expr(s"INTERVAL $lookbackMinutes MINUTES"),
          col("touch.tchannel")).as("channel"))
  }

  /** LINEAR MULTI-TOUCH ATTRIBUTION: every purchase's value split EQUALLY
    * across all of the same user's non-purchase touches inside the lookback
    * window (the fractional-credit counterpart of [[lastTouchAttribution]]'s
    * winner-takes-all); a purchase with no in-window touch credits the
    * 'organic' channel in full. Per-channel totals — the report a marketing
    * mix model actually consumes.
    *
    * Scale shape: both sides key by user_id, so the touch↔purchase pairing
    * is ONE user-keyed equi-join with the lookback as a residual range
    * predicate (per-user event counts bound the pair fan-out; a pathological
    * single-user firehose is [[graft.ops.Skew]]'s salting territory), then
    * the per-purchase touch count rides a purchase-keyed window over the
    * already-paired rows. Credits are value/n — an IEEE division, correctly
    * rounded on every engine — folded per channel in exact decimal through
    * the shortest-string bridge, so the fractional split stays cross-engine
    * bit-exact.
    */
  def linearAttribution(spark: SparkSession, sfDir: String,
      lookbackMinutes: Int = 30): DataFrame = {
    val (purchases, paired) = attributionPairs(spark, sfDir, lookbackMinutes)
    val credited = paired
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("pid"))))
      .select(col("pid"), col("channel"), (col("value") / col("n")).as("credit"))
    attributionTotals(purchases, paired, credited)
  }

  /** Shared touch↔purchase pairing for the attribution family: the
    * user-keyed equi-join with the lookback as a residual range predicate.
    * Returns (purchases, paired-touch rows) — both keyed for the caller's
    * per-purchase window.
    */
  private def attributionPairs(spark: SparkSession, sfDir: String,
      lookbackMinutes: Int): (DataFrame, DataFrame) = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
    val touches = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("event_id").as("tid"), col("ts").as("tts"),
        col("event_type").as("channel"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"), col("ts").as("pts"),
        col("value"))
    val paired = purchases.join(touches, Seq("user_id"))
      .filter(col("tts") < col("pts") &&
        col("tts") >= col("pts") - expr(s"INTERVAL $lookbackMinutes MINUTES"))
    (purchases, paired)
  }

  /** Shared tail of the attribution family: organic fallback + per-channel
    * bridged-decimal credit totals.
    */
  private def attributionTotals(purchases: DataFrame, paired: DataFrame,
      credited: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val organic = purchases
      .join(paired.select(col("pid")).distinct(), Seq("pid"), "left_anti")
      .select(col("pid"), lit("organic").as("channel"), col("value").as("credit"))
    credited.unionByName(organic)
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_credits"),
        graft.core.Num.decToDouble(
          sum(col("credit").cast(DecimalType(28, 14)))).as("credit_total"))
  }

  /** POSITION-BASED (U-shaped) ATTRIBUTION — the 40/20/40 rule beside
    * [[linearAttribution]]'s equal split: the first and last touch before a
    * purchase each take 40% of its value, the middle touches share the
    * remaining 20% equally (single touch takes all; two touches split
    * 50/50; no touch → 'organic'). Same user-keyed pairing join; the
    * position index and touch count ride two windows over the already-
    * paired purchase-keyed rows (ties in touch time break by the touch's
    * event id — a total order, so position credit is deterministic). The
    * fraction arithmetic is divisions/multiplications of doubles only
    * (correctly rounded), folded per channel in bridged decimal.
    */
  def positionAttribution(spark: SparkSession, sfDir: String,
      lookbackMinutes: Int = 30): DataFrame = {
    val (purchases, paired) = attributionPairs(spark, sfDir, lookbackMinutes)
    val byPid = Window.partitionBy(col("pid"))
    val ranked = paired
      .withColumn("n", count(lit(1)).over(byPid))
      .withColumn("rn", row_number().over(byPid.orderBy(col("tts"), col("tid"))))
    val frac = when(col("n") === 1, lit(1.0))
      .when(col("n") === 2, lit(0.5))
      .when(col("rn") === 1 || col("rn") === col("n"), lit(0.4))
      .otherwise(lit(0.2) / (col("n") - 2))
    val credited = ranked
      .select(col("pid"), col("channel"), (col("value") * frac).as("credit"))
    attributionTotals(purchases, paired, credited)
  }

  /** Rolling 7-day DISTINCT active users per day — the sliding-window
    * distinct that no windowed aggregate computes incrementally (distinct
    * doesn't decompose over sliding frames). The scale-correct expansion:
    * collapse to (day, user) once, EXPLODE each pair into the ≤`days`
    * window-end days it supports, and de-dup + count per window — O(|day ×
    * user| × days) narrow rows through one partial-agged shuffle, versus a
    * range self-join whose skew follows the busiest week. Window-end days
    * are then semi-joined back to days that actually exist, so the spine
    * carries no phantom trailing days.
    */
  def rollingDistinctUsers(spark: SparkSession, sfDir: String,
      days: Int = 7): DataFrame = {
    val dayUser = Tables.events(spark, sfDir)
      .select(to_date(col("ts")).as("d"), col("user_id"))
      .distinct()
    val contrib = dayUser
      .select(col("d"), col("user_id"),
        explode(array((0 until days).map(lit): _*)).as("off"))
      .select(date_add(col("d"), col("off")).as("window_day"), col("user_id"))
      .distinct()
    contrib
      .join(dayUser.select(col("d").as("window_day")).distinct(), Seq("window_day"),
        "left_semi")
      .groupBy(col("window_day"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** COHORT LIFETIME-VALUE CURVES over orders: customers grouped by their
    * FIRST order month; for each (cohort, months-since-first) the cohort's
    * revenue, its cumulative revenue, and cumulative LTV per member — the
    * payback-period readout next to q99's retention counts. Months are
    * pure integer arithmetic (year·12 + month — no calendar-diff
    * semantics to disagree on); revenue folds as exact cents and only the
    * final per-member division is a double. Scale shape: one per-customer
    * min-month aggregate, a custkey shuffle join back onto orders, a
    * (cohort × offset) aggregate; the cumulative window is PARTITIONED by
    * cohort over that aggregated frame.
    */
  def cohortLtv(spark: SparkSession, sfDir: String, maxMonths: Int = 12): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("cust"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).cast("long").as("m"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
    val cohorts = o.groupBy(col("cust")).agg(min(col("m")).as("m0"))
    val sizes = cohorts.groupBy(col("m0").as("cohort_m")).agg(count(lit(1)).as("n_cohort"))
    val cells = o.join(cohorts, "cust")
      .select(col("m0").as("cohort_m"), (col("m") - col("m0")).as("month_offset"), col("cents"))
      .filter(col("month_offset") <= maxMonths)
      .groupBy(col("cohort_m"), col("month_offset"))
      .agg(sum(col("cents")).as("revenue_cents"))
    val w = Window.partitionBy(col("cohort_m")).orderBy(col("month_offset"))
      .rowsBetween(Window.unboundedPreceding, 0)
    cells
      .withColumn("cum_revenue_cents", sum(col("revenue_cents")).over(w))
      .join(broadcast(sizes), "cohort_m")
      .select(col("cohort_m"), col("month_offset"), col("n_cohort"),
        col("revenue_cents"), col("cum_revenue_cents"),
        (col("cum_revenue_cents").cast("double") /
          col("n_cohort").cast("double")).as("ltv_cents"))
  }
}
