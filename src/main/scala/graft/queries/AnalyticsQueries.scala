package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics operators over `events`: funnel, cohort retention,
  * histogram — the OLAP staples a user of the reference's query surface
  * reaches for next. All are oracle-verified; arithmetic sticks to
  * integers, dates, and single correctly-rounded IEEE divisions so DuckDB
  * replays bit-identically.
  */
object AnalyticsQueries {

  /** Conversion window: a stage must follow the previous one within 6h
    * (shared with the streaming twin, q70).
    */
  private val WindowUs = graft.streaming.StreamingFunnel.ConversionWindowUs

  /** First-touch funnel (view → click → purchase, each within 6h of the
    * previous stage's FIRST qualifying event). Spark side is ONE shuffle:
    * per-user events collect into a sorted array and a linear `aggregate`
    * state machine assigns the stage — the shape that holds at 100 TB
    * because per-user event counts are bounded, while the join-chain
    * formulation (the oracle's: min-view, then min-click-after, then
    * min-purchase-after) would re-shuffle the full event set three times.
    * The state machine transitions on strictly-greater timestamps, so the
    * two formulations agree even on timestamp ties.
    */
  val q63Funnel: QuerySpec = QuerySpec.oracled(
    "q63_funnel",
    s"""WITH e AS (
       |  SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
       |v AS (SELECT user_id, min(tus) AS vt FROM e WHERE event_type='view'
       |      GROUP BY user_id),
       |c AS (SELECT e.user_id, min(tus) AS ct FROM e JOIN v USING (user_id)
       |      WHERE event_type='click' AND tus > v.vt
       |        AND tus <= v.vt + $WindowUs
       |      GROUP BY e.user_id),
       |p AS (SELECT e.user_id, min(tus) AS pt FROM e JOIN c USING (user_id)
       |      WHERE event_type='purchase' AND tus > c.ct
       |        AND tus <= c.ct + $WindowUs
       |      GROUP BY e.user_id)
       |SELECT u.user_id,
       |  CASE WHEN p.user_id IS NOT NULL THEN 3
       |       WHEN c.user_id IS NOT NULL THEN 2
       |       WHEN v.user_id IS NOT NULL THEN 1 ELSE 0 END AS funnel_stage
       |FROM (SELECT DISTINCT user_id FROM e) u
       |LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
       |LEFT JOIN p USING (user_id)
       |ORDER BY user_id""".stripMargin) { (spark, dir) =>
    val e = CoreQueries.events(spark, dir)
      .select(col("user_id"), col("event_type").as("et"),
        expr("ts div 1000").as("tus"))
    e.groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("tus"), col("et"))))
        .as("ev"))
      .withColumn("funnel_stage", expr(
        s"""aggregate(ev,
           |  struct(CAST(0 AS INT) AS stage, CAST(0 AS BIGINT) AS since),
           |  (acc, x) -> CASE
           |    WHEN acc.stage = 0 AND x.et = 'view'
           |      THEN struct(CAST(1 AS INT) AS stage, x.tus AS since)
           |    WHEN acc.stage = 1 AND x.et = 'click'
           |         AND x.tus > acc.since AND x.tus <= acc.since + ${WindowUs}L
           |      THEN struct(CAST(2 AS INT) AS stage, x.tus AS since)
           |    WHEN acc.stage = 2 AND x.et = 'purchase'
           |         AND x.tus > acc.since AND x.tus <= acc.since + ${WindowUs}L
           |      THEN struct(CAST(3 AS INT) AS stage, x.tus AS since)
           |    ELSE acc END,
           |  acc -> acc.stage)""".stripMargin))
      .select(col("user_id"), col("funnel_stage"))
      .orderBy("user_id")
  }

  /** Cohort retention: users grouped by first-seen day, counted at each
    * day offset they were active. Two key-shuffles (per-user min, then
    * per-(cohort, offset) distinct count) — both partial-aggregated
    * map-side. Dates are day-truncated in UTC on both engines; the cohort
    * label is emitted as a STRING (raw timestamps never cross the oracle
    * boundary — Spark writes UTC-adjusted parquet, DuckDB naive).
    */
  val q64Cohort: QuerySpec = QuerySpec.oracled(
    "q64_cohort",
    """WITH e AS (
      |  SELECT user_id, date_trunc('day', ts) AS d FROM events),
      |f AS (SELECT user_id, min(d) AS cohort FROM e GROUP BY user_id)
      |SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_day,
      |  date_diff('day', f.cohort, e.d) AS day_offset,
      |  count(DISTINCT e.user_id) AS n_users
      |FROM e JOIN f USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    val e = CoreQueries.events(spark, dir)
      .select(col("user_id"),
        to_date(timestamp_micros(expr("ts div 1000"))).as("d"))
    val f = e.groupBy("user_id").agg(min("d").as("cohort"))
    e.join(f, "user_id")
      .groupBy(
        date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
        datediff(col("d"), col("cohort")).cast("long").as("day_offset"))
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Fixed-width histogram of `value` per event type. Entirely integer
    * buckets (floor of one correctly-rounded division) plus
    * order-independent min/max — a single partial-aggregated shuffle, no
    * float accumulation anywhere.
    */
  val q65Histogram: QuerySpec = QuerySpec.oracled(
    "q65_histogram",
    """SELECT event_type, CAST(floor(value / 50) AS INTEGER) AS bin,
      |  count(*) AS n,
      |  round(min(value), 2) AS lo, round(max(value), 2) AS hi
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) {
    (spark, dir) =>
      CoreQueries.events(spark, dir)
        .groupBy(col("event_type"),
          floor(col("value") / 50).cast("int").as("bin"))
        .agg(count(lit(1)).as("n"),
          round(min("value"), 2).as("lo"),
          round(max("value"), 2).as("hi"))
        .orderBy("event_type", "bin")
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * P(next event type | current event type). One shuffle partitions by
    * user for the `lead` window (per-user state is bounded and local);
    * pair counting is a partially-aggregated groupBy, and the row
    * probability is the per-from-type window sum — `n_pairs` never leaves
    * integer arithmetic until ONE correctly-rounded BIGINT/BIGINT division,
    * so DuckDB replays it bit-identically.
    */
  val q72TransitionMatrix: QuerySpec = QuerySpec.oracled(
    "q72_transition_matrix",
    """WITH seq AS (
      |  SELECT user_id, event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY epoch_ns(ts), event_id) AS to_type
      |  FROM events),
      |pairs AS (
      |  SELECT from_type, to_type, count(*) AS n_pairs FROM seq
      |  WHERE to_type IS NOT NULL GROUP BY from_type, to_type)
      |SELECT from_type, to_type, n_pairs,
      |  CAST(n_pairs AS DOUBLE) /
      |    CAST(sum(n_pairs) OVER (PARTITION BY from_type) AS DOUBLE) AS prob
      |FROM pairs ORDER BY from_type, to_type""".stripMargin) { (spark, dir) =>
    val userWin = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = CoreQueries.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(userWin))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n_pairs"))
    val fromWin = Window.partitionBy("from_type")
    pairs
      .withColumn("prob",
        col("n_pairs").cast("double") /
          sum(col("n_pairs")).over(fromWin).cast("double"))
      .orderBy("from_type", "to_type")
  }

  /** Salted two-phase exact distinct count ([[graft.ext.Skew]]): the
    * distinct set of a hot key never assembles in one task — values
    * deduplicate within disjoint (key, hash(value) % 8) cells, cell counts
    * add. The oracle is the one-shot COUNT(DISTINCT): result-identical by
    * construction, so the gate adjudicates the rewrite, not the salt.
    */
  val q78SaltedDistinct: QuerySpec = QuerySpec.oracled(
    "q78_salted_distinct",
    """SELECT event_type, count(DISTINCT user_id) AS n_distinct
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
    (spark, dir) =>
      graft.ext.Skew.saltedCountDistinct(
        CoreQueries.events(spark, dir),
        col("event_type"), col("user_id"), s = 8)
        .withColumnRenamed("__key", "event_type")
        .orderBy("event_type")
  }

  /** Exact population variance without float accumulation: moments in
    * integer cents (count, Σx, Σx² — Σx² accumulated in DECIMAL(38,0), so
    * no ANSI overflow at any scale), then variance as an explicit IEEE
    * expression tree over the exact moments — both engines evaluate the
    * same correctly-rounded op sequence on identical inputs, so the double
    * is bit-identical. The streaming-friendly form: the three moments are
    * trivially mergeable partial aggregates.
    */
  val q80VarianceExact: QuerySpec = QuerySpec.oracled(
    "q80_variance_exact",
    """WITH c AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |m AS (
      |  SELECT event_type, count(*) AS n,
      |    CAST(sum(cents) AS BIGINT) AS sum_cents,
      |    CAST(sum(cents * cents) AS BIGINT) AS sumsq_cents
      |  FROM c GROUP BY event_type)
      |SELECT event_type, n, sum_cents, sumsq_cents,
      |  CAST(sumsq_cents AS DOUBLE) / CAST(n AS DOUBLE) -
      |    (CAST(sum_cents AS DOUBLE) / CAST(n AS DOUBLE)) *
      |    (CAST(sum_cents AS DOUBLE) / CAST(n AS DOUBLE)) AS var_pop_cents2
      |FROM m ORDER BY event_type""".stripMargin) { (spark, dir) =>
    CoreQueries.events(spark, dir)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("cents")).as("sum_cents"),
        sum((col("cents") * col("cents")).cast("decimal(38,0)"))
          .cast("long").as("sumsq_cents"))
      .withColumn("var_pop_cents2",
        col("sumsq_cents").cast("double") / col("n").cast("double") -
          (col("sum_cents").cast("double") / col("n").cast("double")) *
          (col("sum_cents").cast("double") / col("n").cast("double")))
      .orderBy("event_type")
  }

  /** Time-series resample with gap fill: per-user daily event counts over
    * the GLOBAL day span, absent days materialized as zero — the
    * regularization step before any windowed model. The day spine is
    * `sequence(min_day, max_day)` off a one-row aggregate (tiny,
    * broadcast); the users × days grid is a broadcast cross join (|days|
    * rows ride the broadcast bus, the user set never replicates), and the
    * left join back to real counts is one keyed shuffle. Grid size is
    * |users| × |days| — explicit, and each side is bounded by data the
    * query already shuffles.
    */
  val q83GapFill: QuerySpec = QuerySpec.oracled(
    "q83_gap_fill",
    """WITH days AS (
      |  SELECT CAST(unnest(generate_series(
      |    (SELECT min(date_trunc('day', ts)) FROM events),
      |    (SELECT max(date_trunc('day', ts)) FROM events),
      |    INTERVAL 1 DAY)) AS DATE) AS day),
      |u AS (SELECT DISTINCT user_id FROM events),
      |grid AS (SELECT u.user_id, days.day FROM u CROSS JOIN days),
      |cnt AS (
      |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT g.user_id, strftime(g.day, '%Y-%m-%d') AS day,
      |  coalesce(cnt.n, 0) AS n
      |FROM grid g
      |LEFT JOIN cnt ON g.user_id = cnt.user_id AND g.day = cnt.day
      |ORDER BY g.user_id, g.day""".stripMargin) { (spark, dir) =>
    val e = CoreQueries.events(spark, dir)
      .select(col("user_id"),
        to_date(timestamp_micros(expr("ts div 1000"))).as("day"))
    val days = e.agg(min("day").as("lo"), max("day").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("INTERVAL 1 DAY"))).as("day"))
    val grid = e.select("user_id").distinct().crossJoin(broadcast(days))
    val cnt = e.groupBy("user_id", "day").agg(count(lit(1)).as("n"))
    grid.join(cnt, Seq("user_id", "day"), "left")
      .select(col("user_id"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("user_id", "day")
  }

  /** One PageRank iteration as DuckDB CTEs: incoming mass from the
    * previous rank table, then the damped rebase — integer ops only, the
    * exact mirror of [[graft.ext.PageRank.ranks]]'s loop body.
    */
  private def prIterSql(i: Int): String =
    s"""inc$i AS (
       |  SELECT e.t AS node, CAST(sum((p.r * e.w) // o.wout) AS BIGINT) AS s
       |  FROM e JOIN r${i - 1} p ON e.f = p.node JOIN outw o ON e.f = o.f
       |  GROUP BY e.t),
       |r$i AS (
       |  SELECT n.node,
       |    (1000000000000 * 3 // 20) // nn.n
       |      + CAST((17 * coalesce(i.s, 0)) // 20 AS BIGINT) AS r
       |  FROM nodes n CROSS JOIN nn LEFT JOIN inc$i i ON n.node = i.node)"""
      .stripMargin

  /** Weighted PageRank (3 iterations, damping 17/20) over the event-type
    * transition graph — [[graft.ext.PageRank]]'s exact integer fixed-point
    * formulation, which is what lets an iterative float-free rank be
    * hash-adjudicated at all: BIGINT micro-unit ranks, `div` edge
    * contributions, exact integer sums. The oracle unrolls the three
    * iterations as CTE pairs. Per iteration the plan is the canonical two
    * shuffles (ranks⋈edges on src, mass aggregate on dst); at 100 TB the
    * edge table partitions once and is reused every round.
    */
  val q98PageRank: QuerySpec = QuerySpec.oracled(
    "q98_pagerank",
    s"""WITH seq AS (
       |  SELECT event_type AS f0,
       |    lead(event_type) OVER (PARTITION BY user_id
       |      ORDER BY epoch_ns(ts), event_id) AS t0
       |  FROM events),
       |e AS (
       |  SELECT f0 AS f, t0 AS t, count(*) AS w FROM seq
       |  WHERE t0 IS NOT NULL GROUP BY 1, 2),
       |outw AS (SELECT f, CAST(sum(w) AS BIGINT) AS wout FROM e GROUP BY f),
       |nodes AS (SELECT f AS node FROM e UNION SELECT t FROM e),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |r0 AS (SELECT node, 1000000000000 // nn.n AS r
       |       FROM nodes CROSS JOIN nn),
       |${prIterSql(1)},
       |${prIterSql(2)},
       |${prIterSql(3)}
       |SELECT node AS event_type, r AS rank_micro FROM r3
       |ORDER BY rank_micro DESC, event_type""".stripMargin) { (spark, dir) =>
    val userWin = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val edges = CoreQueries.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type").as("src"))
      .withColumn("dst", lead(col("src"), 1).over(userWin))
      .filter(col("dst").isNotNull)
      .groupBy("src", "dst")
      .agg(count(lit(1)).as("w"))
    graft.ext.PageRank.ranks(edges, "src", "dst", "w", iterations = 3)
      .select(col("node").as("event_type"), col("rank_micro"))
      .orderBy(col("rank_micro").desc, col("event_type"))
  }

  /** Exponentially time-decayed event counts (half-life = 1 day,
    * trending/recency scoring): the decay factor 2^-age is a POWER OF
    * TWO, so the whole metric stays in exact integer arithmetic — each
    * day bucket contributes `count << (30 - age)` (a 2^30-scaled weight),
    * sums are exact BIGINT adds, order-independent, hash-adjudicable.
    * The generic e^-λt form would sum engine-rounded doubles in
    * partition order and could never pass the gate bit-for-bit (the q98
    * lesson applied to decay). Ages beyond 30 days contribute 0 —
    * identically in both engines — which is also the production
    * truncation (2^-30 of a count is noise). One grouped count + one
    * broadcast scalar max; shuffles carry (type, day) rows only.
    */
  val q107TimeDecay: QuerySpec = QuerySpec.oracled(
    "q107_time_decay",
    """WITH e AS (
      |  SELECT event_type,
      |    (epoch_ns(ts) // 1000) // 86400000000 AS day
      |  FROM events),
      |mx AS (SELECT max(day) AS m FROM e),
      |d AS (SELECT event_type, day, count(*) AS c FROM e GROUP BY 1, 2)
      |SELECT event_type,
      |  CAST(sum(CASE WHEN m - day <= 30
      |    THEN c * (CAST(1 AS BIGINT) << CAST(30 - (m - day) AS INT))
      |    ELSE 0 END) AS BIGINT) AS decayed_x2p30,
      |  CAST(sum(c) AS BIGINT) AS total
      |FROM d CROSS JOIN mx
      |GROUP BY event_type ORDER BY event_type""".stripMargin) {
    (spark, dir) =>
      val e = CoreQueries.events(spark, dir)
        .select(col("event_type"),
          expr("(ts div 1000) div 86400000000").as("day"))
      val d = e.groupBy("event_type", "day").agg(count(lit(1)).as("c"))
      d.crossJoin(broadcast(e.agg(max("day").as("m"))))
        .withColumn("age", col("m") - col("day"))
        .groupBy("event_type")
        .agg(
          sum(when(col("age") <= 30,
            expr("c * shiftleft(CAST(1 AS BIGINT), CAST(30 - age AS INT))"))
            .otherwise(0L)).as("decayed_x2p30"),
          sum("c").as("total"))
        .orderBy("event_type")
  }

  /** Rolling 7-day distinct users per day (the WAU family): exact sliding
    * DISTINCT cannot ride a window frame (`count(DISTINCT) OVER` is
    * unsupported — duplicate users straddling frame boundaries break
    * incremental state), so the plan dedups to (day, user) once and joins
    * the small day spine against it on the 7-day range — the spine is
    * tens-of-rows and broadcasts, so the big side shuffles once for the
    * dedup and once for the per-day count, both keyed. Each (day, user)
    * row fans out to ≤ 7 spine days; at 100 TB that bounded fan-out of
    * ids-only rows is the price of exactness (the approximate path is
    * q56's HLL sketches, which merge across window partials).
    */
  val q109RollingDistinct: QuerySpec = QuerySpec.oracled(
    "q109_rolling_distinct",
    """WITH du AS (
      |  SELECT DISTINCT (epoch_ns(ts) // 1000) // 86400000000 AS day,
      |    user_id
      |  FROM events),
      |days AS (SELECT DISTINCT day FROM du)
      |SELECT d.day, count(DISTINCT u.user_id) AS wau
      |FROM days d JOIN du u
      |  ON u.day BETWEEN d.day - 6 AND d.day
      |GROUP BY d.day ORDER BY d.day""".stripMargin) { (spark, dir) =>
    val du = CoreQueries.events(spark, dir)
      .select(expr("(ts div 1000) div 86400000000").as("day"),
        col("user_id"))
      .distinct()
    val days = du.select(col("day").as("d")).distinct()
    du.join(broadcast(days),
        col("day").between(col("d") - 6, col("d")))
      .groupBy(col("d").as("day"))
      .agg(countDistinct("user_id").as("wau"))
      .orderBy("day")
  }

  /** Exact simple linear regression (value vs hour-of-day) per event type —
    * q80's moment discipline extended to two variables: the five moments
    * (n, Σx, Σy, Σx², Σxy) accumulate as integers (products through
    * DECIMAL(38,0), so no ANSI overflow), then slope/intercept are an
    * explicit IEEE expression tree over the exact moments — both engines
    * run the same correctly-rounded op sequence on identical integers, so
    * the doubles are bit-identical. Moments are trivially mergeable: this
    * is the map-side-combine form of regression at 100 TB (one shuffle of
    * 5 longs per group), where `regr_slope`'s float accumulation would be
    * partial-order-dependent.
    */
  val q112RegressionExact: QuerySpec = QuerySpec.oracled(
    "q112_regression_exact",
    """WITH c AS (
      |  SELECT event_type,
      |    CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS x,
      |    CAST(round(value * 100) AS BIGINT) AS y
      |  FROM events),
      |m AS (
      |  SELECT event_type, count(*) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(x * y) AS BIGINT) AS sxy
      |  FROM c GROUP BY event_type)
      |SELECT event_type, n, sx, sy, sxx, sxy,
      |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |  (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope_cents,
      |  (CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |   (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
      |     * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept_cents
      |FROM m ORDER BY event_type""".stripMargin) { (spark, dir) =>
    val m = CoreQueries.events(spark, dir)
      .select(col("event_type"),
        expr("CAST(((ts div 1000) div 3600000000) % 24 AS BIGINT)").as("x"),
        round(col("value") * 100).cast("long").as("y"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).cast("long")
          .as("sxx"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).cast("long")
          .as("sxy"))
    val nD = col("n").cast("double")
    val slope = (nD * col("sxy").cast("double")
      - col("sx").cast("double") * col("sy").cast("double")) /
      (nD * col("sxx").cast("double")
        - col("sx").cast("double") * col("sx").cast("double"))
    m.withColumn("slope_cents", slope)
      .withColumn("intercept_cents",
        (col("sy").cast("double") - slope * col("sx").cast("double")) / nD)
      .orderBy("event_type")
  }

  /** Interval union (gaps-and-islands): each event projects a 5-minute
    * activity interval [ts, ts+300s); per user, overlapping-or-adjacent
    * intervals merge into islands and the query reports exact covered
    * microseconds — the dwell/uptime primitive. One shuffle on user_id;
    * both windows (running max-end and running break-sum) share the same
    * sort, so Catalyst runs them in a single Window node. Island state is
    * O(1) per row — no interval list ever materializes, which is what
    * makes the sweep safe for users with millions of events.
    */
  val q114IntervalUnion: QuerySpec = QuerySpec.oracled(
    "q114_interval_union",
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 300000000 AS t
      |  FROM events),
      |w AS (
      |  SELECT user_id, s, t,
      |    max(t) OVER (PARTITION BY user_id ORDER BY s
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
      |  FROM e),
      |f AS (
      |  SELECT user_id, s, t,
      |    CASE WHEN prev_end IS NULL OR s > prev_end THEN 1 ELSE 0 END
      |      AS brk
      |  FROM w),
      |g AS (
      |  SELECT user_id, s, t,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY s
      |      ROWS UNBOUNDED PRECEDING) AS isl
      |  FROM f),
      |i AS (
      |  SELECT user_id, isl, max(t) - min(s) AS len
      |  FROM g GROUP BY user_id, isl)
      |SELECT user_id, count(*) AS n_islands,
      |  CAST(sum(len) AS BIGINT) AS covered_us
      |FROM i GROUP BY user_id ORDER BY user_id""".stripMargin) { (spark, dir) =>
    graft.ext.Intervals.coverage(
      CoreQueries.events(spark, dir)
        .select(col("user_id"), expr("ts div 1000").as("s"),
          expr("ts div 1000 + 300000000").as("t")),
      "user_id", "s", "t")
      .select(col("user_id"), col("n_islands"),
        col("covered").as("covered_us"))
      .orderBy("user_id")
  }

  /** Daily-count anomaly gate: a (type, day) count is anomalous iff it
    * sits more than 2 population-σ from its type's mean — decided ENTIRELY
    * in integer arithmetic by cross-multiplying the definition:
    * |c−μ| > 2σ  ⟺  (n·c−S)² > 4·(n·Sxx−S²), every term a BIGINT. No
    * division, no sqrt, no float ever exists, so the flag is
    * hash-adjudicable and layout-independent — a float z-score version
    * could flip a boundary row per partial-agg order. One shuffle for the
    * count grid, one tiny per-type window over ≤ |days| rows.
    */
  val q123AnomalyGate: QuerySpec = QuerySpec.oracled(
    "q123_anomaly_gate",
    """WITH c AS (
      |  SELECT event_type,
      |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_idx,
      |    count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, day_idx, cnt,
      |    count(*) OVER (PARTITION BY event_type) AS n,
      |    sum(cnt) OVER (PARTITION BY event_type) AS s,
      |    sum(cnt * cnt) OVER (PARTITION BY event_type) AS sxx
      |  FROM c)
      |SELECT event_type, day_idx, CAST(cnt AS BIGINT) AS cnt,
      |  CAST(n * cnt - s AS BIGINT) AS dev_n,
      |  (n * cnt - s) * (n * cnt - s) > 4 * (n * sxx - s * s)
      |    AS is_anomaly
      |FROM m ORDER BY event_type, day_idx""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy("event_type")
    CoreQueries.events(spark, dir)
      .select(col("event_type"),
        expr("CAST((ts div 1000) div 86400000000 AS BIGINT)").as("day_idx"))
      .groupBy("event_type", "day_idx")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(col("cnt")).over(w))
      .withColumn("sxx", sum(col("cnt") * col("cnt")).over(w))
      .select(col("event_type"), col("day_idx"), col("cnt"),
        (col("n") * col("cnt") - col("s")).as("dev_n"),
        ((col("n") * col("cnt") - col("s")) *
          (col("n") * col("cnt") - col("s")) >
          (col("n") * col("sxx") - col("s") * col("s")) * 4)
          .as("is_anomaly"))
      .orderBy("event_type", "day_idx")
  }

  /** Winsorized (robust) mean: per-type p01/p99 cent boundaries — rounded
    * to INTEGERS the moment they leave the percentile aggregate — then
    * every value clamps into [lo, hi] and the clamped INTEGER sum divides
    * once. Rounding the boundaries first is what keeps the whole thing
    * hash-adjudicable: a float clamp would sum interpolated doubles in
    * partition order. Two passes over the column (exact percentiles need
    * the sorted group; the boundary row set is |types|, broadcast back),
    * which is the exact-robust-stats trade; the approx path swaps pass 1
    * for `approx_percentile` with the same clamp.
    */
  val q127Winsorize: QuerySpec = QuerySpec.oracled(
    "q127_winsorize",
    """WITH c AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |b AS (
      |  SELECT event_type,
      |    CAST(round(quantile_cont(cents, 0.01), 0) AS BIGINT) AS lo,
      |    CAST(round(quantile_cont(cents, 0.99), 0) AS BIGINT) AS hi
      |  FROM c GROUP BY event_type)
      |SELECT c.event_type, b.lo, b.hi, count(*) AS n,
      |  CAST(sum(CASE WHEN cents < lo THEN lo
      |                WHEN cents > hi THEN hi ELSE cents END) AS BIGINT)
      |    AS wsum_cents,
      |  CAST(sum(CASE WHEN cents < lo OR cents > hi THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_clamped
      |FROM c JOIN b USING (event_type)
      |GROUP BY c.event_type, b.lo, b.hi
      |ORDER BY event_type""".stripMargin) { (spark, dir) =>
    val c = CoreQueries.events(spark, dir)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
    val b = c.groupBy("event_type")
      .agg(
        round(expr("percentile(cents, 0.01)"), 0).cast("long").as("lo"),
        round(expr("percentile(cents, 0.99)"), 0).cast("long").as("hi"))
    c.join(broadcast(b), "event_type")
      .groupBy("event_type", "lo", "hi")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("cents") < col("lo"), col("lo"))
          .when(col("cents") > col("hi"), col("hi"))
          .otherwise(col("cents"))).as("wsum_cents"),
        sum(when(col("cents") < col("lo") || col("cents") > col("hi"), 1L)
          .otherwise(0L)).as("n_clamped"))
      .orderBy("event_type")
  }

  /** Bounded-hop BFS ([[graft.ext.Bfs]]) over a planted deterministic
    * graph (each customer key < 1000 emits edges to (2u+1)%1000 and
    * (3u+7)%1000 — same arithmetic both engines, so the graph and every
    * distance are adjudicable). 4 hops from node 1; the oracle replays
    * the expansion as a bounded recursive CTE with min-hop dedup. Per
    * hop one frontier⋈edges shuffle + one min-aggregate; the frontier
    * carries only nodes first reached that hop, so a converged region
    * stops costing anything — the reachability/lineage primitive.
    */
  val q132BfsReach: QuerySpec = QuerySpec.oracled(
    "q132_bfs_reach",
    """WITH e AS (
      |  SELECT c_custkey AS u, (c_custkey * 2 + 1) % 1000 AS v
      |  FROM customer WHERE c_custkey < 1000
      |  UNION ALL
      |  SELECT c_custkey, (c_custkey * 3 + 7) % 1000
      |  FROM customer WHERE c_custkey < 1000),
      |walk AS (
      |  WITH RECURSIVE w(node, d) AS (
      |    SELECT CAST(1 AS BIGINT), 0
      |    UNION ALL
      |    SELECT e.v, w.d + 1 FROM w JOIN e ON e.u = w.node
      |    WHERE w.d < 4)
      |  SELECT node, min(d) AS d FROM w GROUP BY node)
      |SELECT node, CAST(d AS INT) AS d FROM walk
      |ORDER BY node""".stripMargin) { (spark, dir) =>
    val c = spark.read.parquet(s"$dir/customer.parquet")
      .filter(col("c_custkey") < 1000)
      .select(col("c_custkey").as("u"))
    val edges = c.select(col("u"), ((col("u") * 2 + 1) % 1000).as("v"))
      .unionByName(c.select(col("u"), ((col("u") * 3 + 7) % 1000).as("v")))
    graft.ext.Bfs.boundedDistances(spark, edges, source = 1L, maxHops = 4)
      .orderBy("node")
  }

  /** Longest consecutive-day activity streak per user, via the TYPED
    * Dataset API: `groupByKey(...).mapGroups` runs a 6-line sorted-scan
    * per user — the per-group imperative escape hatch for logic window
    * functions express awkwardly. The scale contract of `mapGroups`: ONE
    * shuffle on the key, then each group streams through a single
    * function call, so it is safe exactly when per-group data is bounded
    * (a user's distinct active DAYS — ≤ a few thousand, forever). The
    * oracle replays the streak as gaps-and-islands SQL (day − dense rank
    * is constant within a consecutive run), proving the typed scan ≡
    * the relational form.
    */
  val q133Streaks: QuerySpec = QuerySpec.oracled(
    "q133_streaks",
    """WITH d AS (
      |  SELECT DISTINCT user_id,
      |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
      |  FROM events),
      |r AS (
      |  SELECT user_id, day,
      |    day - row_number() OVER (PARTITION BY user_id ORDER BY day)
      |      AS grp
      |  FROM d),
      |s AS (
      |  SELECT user_id, count(*) AS len, min(day) AS start_day
      |  FROM r GROUP BY user_id, grp),
      |s2 AS (
      |  SELECT user_id, len, start_day,
      |    max(len) OVER (PARTITION BY user_id) AS mx
      |  FROM s)
      |SELECT user_id,
      |  CAST(max(len) AS INT) AS longest_streak,
      |  CAST(min(CASE WHEN len = mx THEN start_day END) AS BIGINT)
      |    AS streak_start_day
      |FROM s2 GROUP BY user_id ORDER BY user_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    CoreQueries.events(spark, dir)
      .select(col("user_id"),
        expr("CAST((ts div 1000) div 86400000000 AS BIGINT)").as("day"))
      .distinct()
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (user, rows) =>
        val days = rows.map(_._2).toArray.sorted
        var bestLen = 1
        var bestStart = days.head
        var curLen = 1
        var curStart = days.head
        for (i <- 1 until days.length) {
          if (days(i) == days(i - 1) + 1) curLen += 1
          else { curLen = 1; curStart = days(i) }
          // strict > keeps the EARLIEST start among equal-length streaks,
          // matching the oracle's min(start_day) FILTER (len = max)
          if (curLen > bestLen) { bestLen = curLen; bestStart = curStart }
        }
        (user, bestLen, bestStart)
      }
      .toDF("user_id", "longest_streak", "streak_start_day")
      .orderBy("user_id")
  }

  /** Event-sequence pattern matching (MATCH_RECOGNIZE's common case):
    * each user's chronologically-ordered event types collapse to an
    * initials string (c/e/p/s/v — all distinct) and a regex asks the
    * behavioral question "viewed, then purchased, with no error in
    * between" (`v[^e]*p`). One shuffle to assemble per-user sequences
    * (bounded by per-user event counts, like q63's state machine); the
    * regex runs once per user on a string of length = #events, not per
    * event. The (tus, event_id) sort key is unique, so the sequence —
    * and therefore the match — is deterministic in both engines.
    */
  val q135SequenceMatch: QuerySpec = QuerySpec.oracled(
    "q135_sequence_match",
    """WITH s AS (
      |  SELECT user_id,
      |    string_agg(substr(event_type, 1, 1), ''
      |      ORDER BY epoch_us(ts), event_id) AS seq
      |  FROM events GROUP BY user_id)
      |SELECT user_id,
      |  CAST(length(seq) AS BIGINT) AS n_events,
      |  regexp_matches(seq, 'v[^e]*p') AS view_to_purchase_clean
      |FROM s ORDER BY user_id""".stripMargin) { (spark, dir) =>
    CoreQueries.events(spark, dir)
      .select(col("user_id"),
        struct(expr("ts div 1000").as("tus"), col("event_id"),
          substring(col("event_type"), 1, 1).as("init")).as("ev"))
      .groupBy("user_id")
      .agg(sort_array(collect_list(col("ev"))).as("evs"))
      .select(col("user_id"),
        expr("array_join(transform(evs, x -> x.init), '')").as("seq"))
      .select(col("user_id"),
        length(col("seq")).cast("long").as("n_events"),
        col("seq").rlike("v[^e]*p").as("view_to_purchase_clean"))
      .orderBy("user_id")
  }

  /** Exact per-node triangle counts ([[graft.ext.Triangles]]) over a
    * planted deterministic graph (customer keys < 1000 emit three edges
    * each — identity, doubling, and integer-division generators mod 400,
    * whose locality yields a clustered graph: ~2.4k edges, ~355
    * triangles at sf0.01). The Spark side runs degree-oriented wedge
    * enumeration — oriented out-degree is O(sqrt(m)) on ANY graph, so
    * the wedge join survives celebrity-skewed graphs where the naive
    * adjacency self-join is quadratic in max degree. The oracle replays
    * the textbook 3-way self-join on the id-canonical edge set (each
    * triangle x<y<z appears exactly once as (x,y)(y,z)(x,z)), proving
    * the oriented enumeration ≡ the declarative form.
    */
  val q136TriangleCount: QuerySpec = QuerySpec.oracled(
    "q136_triangle_count",
    """WITH r AS (
      |  SELECT c_custkey AS k FROM customer WHERE c_custkey < 1000),
      |raw AS (
      |  SELECT k % 400 AS u, (k // 3) % 400 AS v FROM r
      |  UNION ALL SELECT k % 400, (k * 2 + 1) % 400 FROM r
      |  UNION ALL SELECT k % 400, ((k // 7) + 5) % 400 FROM r),
      |e AS (
      |  SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v
      |  FROM raw WHERE u <> v),
      |t AS (
      |  SELECT a.u AS x, a.v AS y, b.v AS z
      |  FROM e a JOIN e b ON b.u = a.v
      |           JOIN e c ON c.u = a.u AND c.v = b.v),
      |n AS (
      |  SELECT x AS node FROM t
      |  UNION ALL SELECT y FROM t
      |  UNION ALL SELECT z FROM t)
      |SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
      |FROM n GROUP BY node ORDER BY node""".stripMargin) { (spark, dir) =>
    val k = spark.read.parquet(s"$dir/customer.parquet")
      .filter(col("c_custkey") < 1000)
      .select(col("c_custkey").as("k"))
    val raw = k.select((col("k") % 400).as("u"),
        expr("(k div 3) % 400").as("v"))
      .unionByName(k.select((col("k") % 400).as("u"),
        ((col("k") * 2 + 1) % 400).as("v")))
      .unionByName(k.select((col("k") % 400).as("u"),
        expr("((k div 7) + 5) % 400").as("v")))
    graft.ext.Triangles.perNodeCounts(raw).orderBy("node")
  }

  /** Pairwise Pearson correlation matrix over lineitem's four numeric
    * measures in ONE scan: a single map-side-combinable aggregate
    * collects every first/second/cross moment as an exact integer
    * (cents-scaled longs; squares and cross-products summed in
    * decimal(38,0) — they overflow int64 at sf ≥ 0.01), then the six
    * upper-triangle correlations are pure driver-side arithmetic on the
    * one aggregate row, exploded to rows. At 100 TB a k-metric
    * correlation matrix costs one scan and a 1-row-per-partition
    * reduce — no shuffle of data, no per-pair pass. Determinism: both
    * engines cast the SAME exact integers to double and apply the SAME
    * single expression (sqrt is IEEE-exact; no transcendentals).
    */
  val q137CorrMatrix: QuerySpec = QuerySpec.oracled(
    "q137_corr_matrix",
    """WITH c AS (
      |  SELECT CAST(round(l_quantity * 100) AS BIGINT) AS q,
      |         CAST(round(l_extendedprice * 100) AS BIGINT) AS e,
      |         CAST(round(l_discount * 100) AS BIGINT) AS d,
      |         CAST(round(l_tax * 100) AS BIGINT) AS t
      |  FROM lineitem),
      |m AS (
      |  SELECT count(*) AS n,
      |    CAST(sum(q) AS DOUBLE) AS sq, CAST(sum(e) AS DOUBLE) AS se,
      |    CAST(sum(d) AS DOUBLE) AS sd, CAST(sum(t) AS DOUBLE) AS st,
      |    CAST(sum(q * q) AS DOUBLE) AS sqq,
      |    CAST(sum(e * e) AS DOUBLE) AS see,
      |    CAST(sum(d * d) AS DOUBLE) AS sdd,
      |    CAST(sum(t * t) AS DOUBLE) AS stt,
      |    CAST(sum(q * e) AS DOUBLE) AS sqe,
      |    CAST(sum(q * d) AS DOUBLE) AS sqd,
      |    CAST(sum(q * t) AS DOUBLE) AS sqt,
      |    CAST(sum(e * d) AS DOUBLE) AS sed,
      |    CAST(sum(e * t) AS DOUBLE) AS set_,
      |    CAST(sum(d * t) AS DOUBLE) AS sdt
      |  FROM c)
      |SELECT var_x, var_y, n,
      |  (CAST(n AS DOUBLE) * sxy - sx * sy) /
      |  (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) *
      |   sqrt(CAST(n AS DOUBLE) * syy - sy * sy)) AS corr
      |FROM (
      |  SELECT 'discount' AS var_x, 'extendedprice' AS var_y, n,
      |    sd AS sx, se AS sy, sdd AS sxx, see AS syy, sed AS sxy FROM m
      |  UNION ALL SELECT 'discount', 'tax', n, sd, st, sdd, stt, sdt
      |    FROM m
      |  UNION ALL SELECT 'extendedprice', 'tax', n, se, st, see, stt,
      |    set_ FROM m
      |  UNION ALL SELECT 'quantity', 'discount', n, sq, sd, sqq, sdd,
      |    sqd FROM m
      |  UNION ALL SELECT 'quantity', 'extendedprice', n, sq, se, sqq,
      |    see, sqe FROM m
      |  UNION ALL SELECT 'quantity', 'tax', n, sq, st, sqq, stt, sqt
      |    FROM m)
      |ORDER BY var_x, var_y""".stripMargin) { (spark, dir) =>
    val c = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(
        round(col("l_quantity") * 100).cast("long").as("q"),
        round(col("l_extendedprice") * 100).cast("long").as("e"),
        round(col("l_discount") * 100).cast("long").as("d"),
        round(col("l_tax") * 100).cast("long").as("t"))
    def s2(a: String, b: String) =
      sum((col(a) * col(b)).cast("decimal(38,0)")).cast("double")
    val m = c.agg(
      count(lit(1)).as("n"),
      sum("q").cast("double").as("sq"), sum("e").cast("double").as("se"),
      sum("d").cast("double").as("sd"), sum("t").cast("double").as("st"),
      s2("q", "q").as("sqq"), s2("e", "e").as("see"),
      s2("d", "d").as("sdd"), s2("t", "t").as("stt"),
      s2("q", "e").as("sqe"), s2("q", "d").as("sqd"),
      s2("q", "t").as("sqt"), s2("e", "d").as("sed"),
      s2("e", "t").as("set_"), s2("d", "t").as("sdt"))
    val nD = col("n").cast("double")
    def pair(vx: String, vy: String, sx: String, sy: String,
        sxx: String, syy: String, sxy: String) =
      struct(
        lit(vx).as("var_x"), lit(vy).as("var_y"), col("n").as("n"),
        ((nD * col(sxy) - col(sx) * col(sy)) /
          (sqrt(nD * col(sxx) - col(sx) * col(sx)) *
           sqrt(nD * col(syy) - col(sy) * col(sy)))).as("corr"))
    m.select(explode(array(
        pair("discount", "extendedprice", "sd", "se", "sdd", "see", "sed"),
        pair("discount", "tax", "sd", "st", "sdd", "stt", "sdt"),
        pair("extendedprice", "tax", "se", "st", "see", "stt", "set_"),
        pair("quantity", "discount", "sq", "sd", "sqq", "sdd", "sqd"),
        pair("quantity", "extendedprice", "sq", "se", "sqq", "see", "sqe"),
        pair("quantity", "tax", "sq", "st", "sqq", "stt", "sqt")))
        .as("p"))
      .select(col("p.*"))
      .orderBy("var_x", "var_y")
  }

  /** Welch's unequal-variance two-sample t-test (purchase vs view event
    * values) in ONE conditional-aggregation scan: per-arm n / sum /
    * sum-of-squares as exact integers, then mean, sample variance, the
    * t statistic, and Welch–Satterthwaite degrees of freedom as a single
    * deterministic double expression on the 1-row aggregate. The A/B
    * readout at 100 TB is one map-side-combinable pass over the event
    * log — no per-arm subqueries, no second scan, no shuffle of data.
    */
  val q138WelchTtest: QuerySpec = QuerySpec.oracled(
    "q138_welch_ttest",
    """WITH c AS (
      |  SELECT event_type,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type IN ('purchase', 'view')),
      |m AS (
      |  SELECT
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_a,
      |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_b,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN cents
      |      ELSE 0 END) AS DOUBLE) AS s_a,
      |    CAST(sum(CASE WHEN event_type = 'view' THEN cents ELSE 0 END)
      |      AS DOUBLE) AS s_b,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN cents * cents
      |      ELSE 0 END) AS DOUBLE) AS ss_a,
      |    CAST(sum(CASE WHEN event_type = 'view' THEN cents * cents
      |      ELSE 0 END) AS DOUBLE) AS ss_b
      |  FROM c),
      |v AS (
      |  SELECT n_a, n_b,
      |    s_a / CAST(n_a AS DOUBLE) AS mean_a,
      |    s_b / CAST(n_b AS DOUBLE) AS mean_b,
      |    ((ss_a - s_a * s_a / CAST(n_a AS DOUBLE))
      |       / (CAST(n_a AS DOUBLE) - 1)) / CAST(n_a AS DOUBLE) AS va,
      |    ((ss_b - s_b * s_b / CAST(n_b AS DOUBLE))
      |       / (CAST(n_b AS DOUBLE) - 1)) / CAST(n_b AS DOUBLE) AS vb
      |  FROM m)
      |SELECT n_a, n_b, mean_a, mean_b,
      |  (mean_a - mean_b) / sqrt(va + vb) AS t_stat,
      |  ((va + vb) * (va + vb)) /
      |    (va * va / (CAST(n_a AS DOUBLE) - 1) +
      |     vb * vb / (CAST(n_b AS DOUBLE) - 1)) AS df_welch
      |FROM v""".stripMargin) { (spark, dir) =>
    val c = CoreQueries.events(spark, dir)
      .filter(col("event_type").isin("purchase", "view"))
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
    def armSum(arm: String, e: org.apache.spark.sql.Column) =
      sum(when(col("event_type") === arm, e).otherwise(lit(0L)))
    val m = c.agg(
      armSum("purchase", lit(1L)).as("n_a"),
      armSum("view", lit(1L)).as("n_b"),
      armSum("purchase", col("cents")).cast("double").as("s_a"),
      armSum("view", col("cents")).cast("double").as("s_b"),
      armSum("purchase", (col("cents") * col("cents"))
        .cast("decimal(38,0)")).cast("double").as("ss_a"),
      armSum("view", (col("cents") * col("cents"))
        .cast("decimal(38,0)")).cast("double").as("ss_b"))
    val (nA, nB) = (col("n_a").cast("double"), col("n_b").cast("double"))
    val v = m.select(col("n_a"), col("n_b"),
      (col("s_a") / nA).as("mean_a"),
      (col("s_b") / nB).as("mean_b"),
      (((col("ss_a") - col("s_a") * col("s_a") / nA) / (nA - 1)) / nA)
        .as("va"),
      (((col("ss_b") - col("s_b") * col("s_b") / nB) / (nB - 1)) / nB)
        .as("vb"))
    v.select(col("n_a"), col("n_b"), col("mean_a"), col("mean_b"),
      ((col("mean_a") - col("mean_b")) / sqrt(col("va") + col("vb")))
        .as("t_stat"),
      (((col("va") + col("vb")) * (col("va") + col("vb"))) /
        (col("va") * col("va") / (col("n_a").cast("double") - 1) +
         col("vb") * col("vb") / (col("n_b").cast("double") - 1)))
        .as("df_welch"))
  }

  /** Pointwise-lift table (the mutual-information/PMI readout) between
    * event type and hour-of-day: joint and marginal counts from ONE
    * groupBy over the fact, marginals recovered by windows OVER THE
    * 120-ROW AGGREGATE (zero additional passes over the data), lift =
    * (n_xy·n)/(n_x·n_y) as one exact-integer-fed division. Deliberately
    * emits per-cell lift rather than summed MI: all products stay below
    * 2^53 so every double is exact, and no cross-row float summation
    * exists whose ORDER could differ between engines (ln is also not
    * correctly-rounded across libms — the PMI log is the caller's
    * one-liner). The feature-association scan at 100 TB is one shuffle.
    */
  val q139PointwiseLift: QuerySpec = QuerySpec.oracled(
    "q139_pointwise_lift",
    """WITH j AS (
      |  SELECT event_type,
      |    CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hour,
      |    count(*) AS n_xy
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, hour, CAST(n_xy AS BIGINT) AS n_xy,
      |  CAST(sum(n_xy) OVER (PARTITION BY event_type) AS BIGINT) AS n_x,
      |  CAST(sum(n_xy) OVER (PARTITION BY hour) AS BIGINT) AS n_y,
      |  CAST(sum(n_xy) OVER () AS BIGINT) AS n,
      |  (CAST(n_xy AS DOUBLE) * CAST(sum(n_xy) OVER () AS DOUBLE)) /
      |  (CAST(sum(n_xy) OVER (PARTITION BY event_type) AS DOUBLE) *
      |   CAST(sum(n_xy) OVER (PARTITION BY hour) AS DOUBLE)) AS lift
      |FROM j ORDER BY event_type, hour""".stripMargin) { (spark, dir) =>
    val j = CoreQueries.events(spark, dir)
      .select(col("event_type"),
        expr("CAST(((ts div 1000) div 3600000000) % 24 AS BIGINT)")
          .as("hour"))
      .groupBy("event_type", "hour")
      .agg(count(lit(1)).as("n_xy"))
    val nX = sum("n_xy").over(Window.partitionBy("event_type"))
    val nY = sum("n_xy").over(Window.partitionBy("hour"))
    val n = sum("n_xy").over(Window.partitionBy())
    j.select(col("event_type"), col("hour"), col("n_xy"),
        nX.as("n_x"), nY.as("n_y"), n.as("n"),
        ((col("n_xy").cast("double") * n.cast("double")) /
          (nX.cast("double") * nY.cast("double"))).as("lift"))
      .orderBy("event_type", "hour")
  }

  /** Lag-1 autocorrelation of daily event counts per type — the
    * time-series "is yesterday predictive of today" readout. Three
    * cheap stages: one groupBy builds the daily series (the only pass
    * over the fact), a lag window pairs consecutive days WITHIN each
    * type's few-hundred-row series, and exact integer moments feed one
    * deterministic correlation expression. Counts are exact longs;
    * cross-products sum in decimal(38,0) (daily counts at 100 TB reach
    * 10¹⁰, so count-pair products overflow int64). The window and final
    * aggregate run over |types|·|days| rows — the fact is scanned once.
    */
  val q141Autocorr: QuerySpec = QuerySpec.oracled(
    "q141_autocorr",
    """WITH d AS (
      |  SELECT event_type,
      |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
      |    count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |p AS (
      |  SELECT event_type, cnt AS y,
      |    lag(cnt) OVER (PARTITION BY event_type ORDER BY day) AS x
      |  FROM d),
      |m AS (
      |  SELECT event_type, count(*) AS n,
      |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
      |    CAST(sum(x * x) AS DOUBLE) AS sxx,
      |    CAST(sum(y * y) AS DOUBLE) AS syy,
      |    CAST(sum(x * y) AS DOUBLE) AS sxy
      |  FROM p WHERE x IS NOT NULL GROUP BY event_type)
      |SELECT event_type, n,
      |  (CAST(n AS DOUBLE) * sxy - sx * sy) /
      |  (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) *
      |   sqrt(CAST(n AS DOUBLE) * syy - sy * sy)) AS autocorr_lag1
      |FROM m ORDER BY event_type""".stripMargin) { (spark, dir) =>
    val d = CoreQueries.events(spark, dir)
      .select(col("event_type"),
        expr("CAST((ts div 1000) div 86400000000 AS BIGINT)").as("day"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val p = d.select(col("event_type"), col("cnt").as("y"),
        lag("cnt", 1).over(w).as("x"))
      .filter(col("x").isNotNull)
    def s2(a: String, b: String) =
      sum((col(a) * col(b)).cast("decimal(38,0)")).cast("double")
    val m = p.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum("x").cast("double").as("sx"), sum("y").cast("double").as("sy"),
      s2("x", "x").as("sxx"), s2("y", "y").as("syy"),
      s2("x", "y").as("sxy"))
    val nD = col("n").cast("double")
    m.select(col("event_type"), col("n"),
        ((nD * col("sxy") - col("sx") * col("sy")) /
          (sqrt(nD * col("sxx") - col("sx") * col("sx")) *
           sqrt(nD * col("syy") - col("sy") * col("sy"))))
          .as("autocorr_lag1"))
      .orderBy("event_type")
  }

  /** Benford first-digit audit of lineitem extended prices — the
    * data-quality screen for fabricated, truncated, or unit-mismatched
    * numeric columns. The digit is taken from exact cents
    * (`round(price*100)` as BIGINT → leading char of the integer's
    * decimal rendering), never from double→string formatting, so both
    * engines bucket identically; the Benford expectation is a fixed
    * basis-point literal table (3010…458), and the chi-square terms are
    * single correctly-rounded IEEE divisions over exact integers. One
    * narrow 1-column scan into a 9-group aggregate — the whole result
    * is 9 rows regardless of input scale, and the window total runs
    * over those 9 rows, not the fact.
    */
  val q142Benford: QuerySpec = QuerySpec.oracled(
    "q142_benford",
    """WITH d AS (
      |  SELECT substr(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
      |      AS VARCHAR), 1, 1)::INT AS digit
      |  FROM lineitem),
      |c AS (SELECT digit, count(*) AS cnt FROM d GROUP BY digit),
      |t AS (SELECT digit, cnt, sum(cnt) OVER () AS total,
      |  CASE digit WHEN 1 THEN 3010 WHEN 2 THEN 1761 WHEN 3 THEN 1249
      |    WHEN 4 THEN 969 WHEN 5 THEN 792 WHEN 6 THEN 669 WHEN 7 THEN 580
      |    WHEN 8 THEN 511 ELSE 458 END AS exp_bp FROM c)
      |SELECT digit, cnt, exp_bp,
      |  CAST(cnt * 10000 AS DOUBLE) / CAST(total AS DOUBLE) AS obs_bp,
      |  (CAST(cnt * 10000 AS DOUBLE) / CAST(total AS DOUBLE) - exp_bp) *
      |  (CAST(cnt * 10000 AS DOUBLE) / CAST(total AS DOUBLE) - exp_bp) /
      |  exp_bp AS chisq_term
      |FROM t ORDER BY digit""".stripMargin) { (spark, dir) =>
    val digits = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(substring(
        expr("CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS STRING)"),
        1, 1).cast("int").as("digit"))
    val counts = digits.groupBy("digit").agg(count(lit(1)).as("cnt"))
    val withTotal = counts
      .withColumn("total", sum("cnt").over(Window.partitionBy()))
      .withColumn("exp_bp", expr(
        """CASE digit WHEN 1 THEN 3010 WHEN 2 THEN 1761 WHEN 3 THEN 1249
          |  WHEN 4 THEN 969 WHEN 5 THEN 792 WHEN 6 THEN 669 WHEN 7 THEN 580
          |  WHEN 8 THEN 511 ELSE 458 END""".stripMargin))
    val obsBp =
      (col("cnt") * 10000).cast("double") / col("total").cast("double")
    withTotal.select(col("digit"), col("cnt"), col("exp_bp"),
        obsBp.as("obs_bp"),
        ((obsBp - col("exp_bp")) * (obsBp - col("exp_bp")) / col("exp_bp"))
          .as("chisq_term"))
      .orderBy("digit")
  }

  /** Top event-path trigrams — the "what do users do next (twice)"
    * extension of q72's lag-1 transition matrix. Two `lead`s in ONE
    * window pass per user (state bounded by per-user event count), a
    * path-string aggregate whose cardinality is ≤ |event types|³ —
    * independent of fact size — and a deterministic total-order top-k
    * (count desc, path asc) so the LIMIT boundary is tie-stable under
    * any partitioning.
    */
  val q143PathTrigrams: QuerySpec = QuerySpec.oracled(
    "q143_path_trigrams",
    """WITH seq AS (
      |  SELECT event_type AS e1,
      |    lead(event_type, 1) OVER w AS e2,
      |    lead(event_type, 2) OVER w AS e3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)),
      |paths AS (
      |  SELECT e1 || '>' || e2 || '>' || e3 AS path, count(*) AS cnt
      |  FROM seq WHERE e3 IS NOT NULL GROUP BY 1)
      |SELECT path, cnt FROM paths
      |ORDER BY cnt DESC, path LIMIT 20""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    CoreQueries.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type").as("e1"))
      .withColumn("e2", lead("e1", 1).over(w))
      .withColumn("e3", lead("e1", 2).over(w))
      .filter(col("e3").isNotNull)
      .select(concat_ws(">", col("e1"), col("e2"), col("e3")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("path"))
      .limit(20)
  }

  /** 2-D skyline (Pareto frontier) over per-part totals
    * ([[graft.ext.Skyline.skyline2d]]): the parts no other part beats on
    * BOTH total quantity (maximize) and total revenue (minimize). Spark
    * side runs the distributed two-level sweep (local prune per shuffle
    * partition, global sweep over survivors only — see the operator's
    * Scaladoc and SkylineSpec's partition-invariance proof); the oracle
    * replays the plain one-pass running-min sweep, which the two-level
    * form provably equals. Totals are exact integers (quantity units,
    * revenue cents).
    */
  val q145Skyline: QuerySpec = QuerySpec.oracled(
    "q145_skyline",
    """WITH p AS (
      |  SELECT l_partkey,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
      |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      |  FROM lineitem GROUP BY 1),
      |s AS (
      |  SELECT l_partkey, qty, rev_cents,
      |    min(rev_cents) OVER (ORDER BY qty DESC, rev_cents, l_partkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_min
      |  FROM p)
      |SELECT l_partkey, qty, rev_cents FROM s
      |WHERE prev_min IS NULL OR rev_cents < prev_min
      |ORDER BY l_partkey""".stripMargin) { (spark, dir) =>
    val pts = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_partkey")
      .agg(sum(col("l_quantity").cast("long")).as("qty"),
        sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
          .as("rev_cents"))
    graft.ext.Skyline.skyline2d(pts, "qty", "rev_cents", "l_partkey")
      .orderBy("l_partkey")
  }

  /** Weighted median of line price (cents) with quantity weights, per
    * return flag. The pre-aggregate to DISTINCT price points is what
    * makes this both deterministic and scalable: the cumulative-weight
    * window runs over |distinct prices| rows per flag (bounded by the
    * price domain, not the fact), its ORDER BY key is unique within the
    * partition so RANGE-vs-ROWS framing cannot diverge, and there is no
    * tie order left for engines to disagree on. All arithmetic is exact
    * integers; the median is the smallest price whose doubled cumulative
    * weight reaches the flag's total.
    */
  val q146WeightedMedian: QuerySpec = QuerySpec.oracled(
    "q146_weighted_median",
    """WITH g AS (
      |  SELECT l_returnflag AS flag,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
      |    CAST(l_quantity AS BIGINT) AS w
      |  FROM lineitem),
      |a AS (SELECT flag, cents, sum(w) AS w FROM g GROUP BY 1, 2),
      |c AS (
      |  SELECT flag, cents, w,
      |    sum(w) OVER (PARTITION BY flag ORDER BY cents) AS cw,
      |    sum(w) OVER (PARTITION BY flag) AS tw
      |  FROM a)
      |SELECT flag, min(cents) AS wmedian_cents, CAST(max(tw) AS BIGINT) AS total_weight
      |FROM c WHERE 2 * cw >= tw GROUP BY flag
      |ORDER BY flag""".stripMargin) { (spark, dir) =>
    val a = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_returnflag").as("flag"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
        col("l_quantity").cast("long").as("w"))
      .groupBy("flag", "cents").agg(sum("w").as("w"))
    val cum = Window.partitionBy("flag").orderBy("cents")
    val tot = Window.partitionBy("flag")
    a.withColumn("cw", sum("w").over(cum))
      .withColumn("tw", sum("w").over(tot))
      .filter(col("cw") * 2 >= col("tw"))
      .groupBy("flag")
      .agg(min("cents").as("wmedian_cents"), max("tw").as("total_weight"))
      .orderBy("flag")
  }

  /** Robust outlier gate: per event type, median and MAD (median absolute
    * deviation) of the value column, then the count of points farther than
    * 3·MAD from the median — the screen that survives the heavy-tailed
    * distributions that wreck mean/stddev z-scores (one whale purchase
    * drags a mean arbitrarily; the median doesn't move). Both medians use
    * the q146 distinct-value technique: aggregate to (type, value) counts
    * first, cumulative-weight window over the UNIQUE ascending value key,
    * median = smallest value whose doubled cumulative count reaches the
    * total — deterministic (no interpolation, no tie order), exact integer
    * cents throughout, and the windows run over |distinct values| rows per
    * type, not the fact table. Two aggregate passes + two tiny broadcast
    * joins back — shape holds at any scale.
    */
  val q156MadOutliers: QuerySpec = QuerySpec.oracled(
    "q156_mad_outliers",
    """WITH g AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |a AS (SELECT event_type, cents, count(*) AS w FROM g GROUP BY 1, 2),
      |c AS (
      |  SELECT event_type, cents, w,
      |    sum(w) OVER (PARTITION BY event_type ORDER BY cents) AS cw,
      |    sum(w) OVER (PARTITION BY event_type) AS tw
      |  FROM a),
      |med AS (SELECT event_type, min(cents) AS med_cents FROM c
      |        WHERE 2 * cw >= tw GROUP BY 1),
      |d AS (
      |  SELECT g.event_type, abs(g.cents - m.med_cents) AS dv
      |  FROM g JOIN med m USING (event_type)),
      |da AS (SELECT event_type, dv, count(*) AS w FROM d GROUP BY 1, 2),
      |dc AS (
      |  SELECT event_type, dv, w,
      |    sum(w) OVER (PARTITION BY event_type ORDER BY dv) AS cw,
      |    sum(w) OVER (PARTITION BY event_type) AS tw
      |  FROM da),
      |mad AS (SELECT event_type, min(dv) AS mad_cents FROM dc
      |        WHERE 2 * cw >= tw GROUP BY 1)
      |SELECT g.event_type, max(m.med_cents) AS med_cents,
      |  max(x.mad_cents) AS mad_cents, count(*) AS n,
      |  CAST(sum(CASE WHEN abs(g.cents - m.med_cents) > 3 * x.mad_cents
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM g JOIN med m USING (event_type) JOIN mad x USING (event_type)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val g = CoreQueries.events(spark, dir)
      .select(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    def lowerMedian(pts: org.apache.spark.sql.DataFrame, valCol: String,
        out: String) = {
      val a = pts.groupBy("event_type", valCol)
        .agg(count(lit(1)).as("w"))
      val cum = Window.partitionBy("event_type").orderBy(valCol)
      val tot = Window.partitionBy("event_type")
      a.withColumn("cw", sum("w").over(cum))
        .withColumn("tw", sum("w").over(tot))
        .filter(col("cw") * 2 >= col("tw"))
        .groupBy("event_type").agg(min(valCol).as(out))
    }
    val med = lowerMedian(g, "cents", "med_cents")
    val dev = g.join(med, "event_type")
      .select(col("event_type"),
        abs(col("cents") - col("med_cents")).as("dv"))
    val mad = lowerMedian(dev, "dv", "mad_cents")
    g.join(med, "event_type").join(mad, "event_type")
      .groupBy("event_type")
      .agg(max("med_cents").as("med_cents"),
        max("mad_cents").as("mad_cents"),
        count(lit(1)).as("n"),
        sum(when(abs(col("cents") - col("med_cents")) >
          col("mad_cents") * 3, 1L).otherwise(0L)).as("n_outliers"))
      .orderBy("event_type")
  }

  /** CUSUM changepoint detection on the daily event-count series, one
    * series per event type: C_d = Σ_{i≤d} (x_i − mean) peaks exactly where
    * the level of the series shifts, so `argmax |C_d|` is the classic
    * single-changepoint estimator (Page's cumulative-sum statistic without
    * the reset, i.e. the form that IS a prefix sum and therefore one
    * window pass instead of an unparallelizable recursion). All arithmetic
    * is exact integer: with N days and total T, N·C_d = Σ (N·x_i − T), so
    * the statistic is scaled by N once rather than dividing by it — no
    * float mean, no cross-engine rounding. Shape at 100 TB: the fact
    * table collapses to |types|·|days| rows in one aggregate pass; the
    * window + argmax run over that tiny series. Tie on |C| → earliest day.
    */
  val q159CusumChangepoint: QuerySpec = QuerySpec.oracled(
    "q159_cusum_changepoint",
    """WITH d AS (
      |  SELECT event_type,
      |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |t AS (
      |  SELECT event_type, day, n,
      |    count(*) OVER (PARTITION BY event_type) AS nd,
      |    sum(n) OVER (PARTITION BY event_type) AS tot
      |  FROM d),
      |c AS (
      |  SELECT event_type, day, nd,
      |    sum(nd * n - tot) OVER (PARTITION BY event_type ORDER BY day)
      |      AS cs
      |  FROM t),
      |r AS (
      |  SELECT event_type, day AS cp_day,
      |    CAST(abs(cs) AS BIGINT) AS max_abs_c,
      |    nd AS n_days,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY abs(cs) DESC, day) AS rn
      |  FROM c)
      |SELECT event_type, cp_day, max_abs_c, n_days FROM r WHERE rn = 1
      |ORDER BY event_type""".stripMargin) { (spark, dir) =>
    val d = CoreQueries.events(spark, dir)
      .select(col("event_type"),
        expr("CAST((ts div 1000) div 86400000000 AS BIGINT)").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
    val per = Window.partitionBy("event_type")
    val cum = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rank = Window.partitionBy("event_type")
      .orderBy(col("max_abs_c").desc, col("cp_day"))
    d.withColumn("nd", count(lit(1)).over(per))
      .withColumn("tot", sum("n").over(per))
      .withColumn("cs", sum(col("nd") * col("n") - col("tot")).over(cum))
      .select(col("event_type"), col("day").as("cp_day"),
        abs(col("cs")).as("max_abs_c"), col("nd").as("n_days"))
      .withColumn("rn", row_number().over(rank))
      .filter(col("rn") === 1).drop("rn")
      .orderBy("event_type")
  }

  /** Last-touch attribution: each purchase is credited to the most recent
    * strictly-earlier event of an attributable type (click / view /
    * signup) by the same user, falling back to 'direct' when the user has
    * no prior touch. One window pass — `last(..., ignoreNulls)` over
    * `ROWS UNBOUNDED PRECEDING → 1 PRECEDING` ordered by (ts, event_id)
    * (the id tiebreak makes same-microsecond orderings identical in both
    * engines) — then a tiny per-source rollup of purchase counts and
    * integer-cents revenue. Shape at 100 TB: state per user is one
    * carried value inside the window sweep (no self-join against the
    * touch history), partitioned by user — exactly how attribution runs
    * on a billion-user event log.
    */
  val q160LastTouchAttribution: QuerySpec = QuerySpec.oracled(
    "q160_last_touch_attribution",
    """WITH w AS (
      |  SELECT event_type, value,
      |    last_value(CASE WHEN event_type IN ('click', 'view', 'signup')
      |      THEN event_type END IGNORE NULLS) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS src
      |  FROM events)
      |SELECT coalesce(src, 'direct') AS source,
      |  count(*) AS n_purchases,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
      |    AS revenue_cents
      |FROM w WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val touch = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    CoreQueries.events(spark, dir)
      .withColumn("src",
        last(when(col("event_type").isin("click", "view", "signup"),
          col("event_type")), ignoreNulls = true).over(touch))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("src"), lit("direct")).as("source"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(expr("CAST(round(value * 100) AS BIGINT)"))
          .as("revenue_cents"))
      .orderBy("source")
  }

  /** Distribution drift between the first and second half of the event
    * timeline, per event type: total-variation distance over $5-wide
    * integer-cents value bins, in parts-per-million
    * ([[graft.ext.Drift.tvdPpm]]). The snapshot-acceptance gate a
    * training-data pipeline runs before taking a corpus refresh — with NO
    * logarithms: mass terms are BIGINT counts, the only division is one
    * final integer floor-div, so Spark and DuckDB agree bit-for-bit (PSI's
    * `ln(pa/pb)` would hinge on two libms rounding identically).
    * Shape: one map-side-combinable groupBy over raw events; everything
    * downstream runs on the tiny (type × bin) histogram with broadcast
    * totals.
    */
  /** Label-propagation community detection
    * ([[graft.ext.Clusters.labelPropagation]]) over the co-purchase graph
    * (parts sharing an order ≥ 2 times) — the graph-family member between
    * connected components (q57: any path merges) and triangles (q136:
    * local density): two LPA rounds find DENSE part groups, and a single
    * bridging order no longer merges two communities. Deterministic by
    * construction — synchronous rounds, ties to the smallest label — so
    * the oracle replays both rounds exactly (classic async LPA could
    * never be gate-adjudicated). Edges thresholded at co-occurrence ≥ 2
    * (3,638 edges at sf0.01 vs 115k raw pairs — the dedup that keeps the
    * graph dense-signal only).
    */
  val q186Communities: QuerySpec = QuerySpec.oracled(
    "q186_communities",
    """WITH p AS (
      |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |ew AS (SELECT pa, pb FROM p GROUP BY pa, pb HAVING count(*) >= 2),
      |ed AS (SELECT pa AS src, pb AS dst FROM ew
      |       UNION ALL SELECT pb, pa FROM ew),
      |l0 AS (SELECT DISTINCT src AS v FROM ed),
      |c1 AS (
      |  SELECT ed.src, l0.v AS nlab, count(*) AS c
      |  FROM ed JOIN l0 ON l0.v = ed.dst GROUP BY 1, 2),
      |l1 AS (
      |  SELECT src AS v, nlab AS lab FROM (
      |    SELECT src, nlab,
      |      row_number() OVER (PARTITION BY src ORDER BY c DESC, nlab)
      |        AS rk
      |    FROM c1) WHERE rk = 1),
      |c2 AS (
      |  SELECT ed.src, l1.lab AS nlab, count(*) AS c
      |  FROM ed JOIN l1 ON l1.v = ed.dst GROUP BY 1, 2),
      |l2 AS (
      |  SELECT src AS v, nlab AS lab FROM (
      |    SELECT src, nlab,
      |      row_number() OVER (PARTITION BY src ORDER BY c DESC, nlab)
      |        AS rk
      |    FROM c2) WHERE rk = 1)
      |SELECT lab AS community, CAST(count(*) AS BIGINT) AS n_members,
      |  CAST(min(v) AS BIGINT) AS min_member,
      |  CAST(max(v) AS BIGINT) AS max_member
      |FROM l2 GROUP BY lab
      |ORDER BY n_members DESC, community LIMIT 50""".stripMargin) {
    (spark, dir) =>
    graft.ext.Clusters.labelPropagation(
        coPurchaseEdges(spark, dir), iters = 2)
      .groupBy(col("lab").as("community"))
      .agg(count(lit(1)).as("n_members"),
        min("v").as("min_member"), max("v").as("max_member"))
      .orderBy(col("n_members").desc, col("community")).limit(50)
  }

  /** Discrete survival-hazard table (time-to-convert with CENSORING) —
    * what q64's retention curve cannot say: retention counts everyone
    * still absent as "not yet", silently treating users last seen on
    * day 2 like users observed for 60 days. Survival analysis separates
    * them: a user either converts at offset d (first purchase, an
    * event) or is censored at their last observed day. Per day-offset:
    * at-risk count (suffix sum of observation endings — everyone whose
    * observation reaches d), conversions, censorings, and the discrete
    * hazard `⌊1e6·events/at_risk⌋` — exact integers, so the oracle
    * adjudicates the estimator itself (the Kaplan-Meier survival curve
    * is the running product of (1 − hazard), left to the caller to
    * avoid a cross-engine float product).
    *
    * 100 TB shape: ONE per-user groupBy collapses the facts to a
    * |users|-row (offset, event?) table, then |offsets|-row counts and
    * one tiny suffix-sum window — nothing after the first aggregate
    * scales with events.
    */
  val q195HazardTable: QuerySpec = QuerySpec.oracled(
    "q195_hazard_table",
    """WITH u AS (
      |  SELECT user_id,
      |    min(epoch_us(ts) // 86400000000) AS entry_day,
      |    min(CASE WHEN event_type = 'purchase'
      |        THEN epoch_us(ts) // 86400000000 END) AS purch_day,
      |    max(epoch_us(ts) // 86400000000) AS last_day
      |  FROM events GROUP BY 1),
      |o AS (
      |  SELECT user_id,
      |    CASE WHEN purch_day IS NOT NULL THEN purch_day - entry_day
      |         ELSE last_day - entry_day END AS d,
      |    purch_day IS NOT NULL AS ev
      |  FROM u),
      |c AS (
      |  SELECT d,
      |    CAST(sum(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT) AS events,
      |    CAST(sum(CASE WHEN ev THEN 0 ELSE 1 END) AS BIGINT)
      |      AS censored,
      |    CAST(count(*) AS BIGINT) AS ending
      |  FROM o GROUP BY 1),
      |r AS (
      |  SELECT d, events, censored,
      |    CAST(sum(ending) OVER (ORDER BY d DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS at_risk
      |  FROM c)
      |SELECT d, at_risk, events, censored,
      |  (1000000 * events) // at_risk AS hazard_ppm
      |FROM r ORDER BY d LIMIT 30""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val day = expr("(ts div 1000) div 86400000000")
    val u = CoreQueries.events(spark, dir)
      .groupBy("user_id")
      .agg(min(day).as("entry_day"),
        min(when(col("event_type") === "purchase", day)).as("purch_day"),
        max(day).as("last_day"))
    val c = u.select(
        when(col("purch_day").isNotNull,
          col("purch_day") - col("entry_day"))
          .otherwise(col("last_day") - col("entry_day")).as("d"),
        col("purch_day").isNotNull.as("ev"))
      .groupBy("d")
      .agg(sum(when(col("ev"), 1L).otherwise(0L)).cast("long").as("events"),
        sum(when(col("ev"), 0L).otherwise(1L)).cast("long").as("censored"),
        count(lit(1)).as("ending"))
    val w = Window.orderBy(col("d").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c.withColumn("at_risk", sum("ending").over(w).cast("long"))
      .select(col("d"), col("at_risk"), col("events"), col("censored"),
        expr("(1000000 * events) DIV at_risk").as("hazard_ppm"))
      .orderBy("d").limit(30)
  }

  /** Trend detection: which (event type × user band) segments RISE or
    * FALL between the two timeline halves — the "what changed in this
    * snapshot" report beside q170's did-anything-change gate (TVD says
    * how much total mass moved; this names the movers). Lift is exact
    * cross-multiplied ppm: `⌊1e6·(nb·TA) / (na·TB)⌋` (second-half share
    * over first-half share — volume-normalized so a globally bigger
    * half doesn't read as every segment rising), floor-div, positive
    * operands. Segments new in half B (na = 0) report null lift and
    * sort first as born; top risers by lift then the integer evidence.
    *
    * 100 TB shape: ONE map-side-combinable (segment × half) groupBy,
    * broadcast totals, |segments| rows ever after.
    */
  val q192TrendDetect: QuerySpec = QuerySpec.oracled(
    "q192_trend_detect",
    """WITH e AS (
      |  SELECT event_type || '/' || CAST(user_id % 5 AS VARCHAR) AS seg,
      |    epoch_us(ts) // 86400000000 < 19738 AS isa
      |  FROM events),
      |c AS (
      |  SELECT seg,
      |    CAST(sum(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS na,
      |    CAST(sum(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS BIGINT) AS nb
      |  FROM e GROUP BY 1),
      |t AS (
      |  SELECT CAST(sum(na) AS BIGINT) AS ta, CAST(sum(nb) AS BIGINT)
      |    AS tb
      |  FROM c),
      |l AS (
      |  SELECT c.seg, c.na, c.nb,
      |    CASE WHEN c.na = 0 THEN NULL
      |      ELSE CAST((1000000 * c.nb * t.ta) // (c.na * t.tb) AS BIGINT)
      |    END AS lift_ppm
      |  FROM c CROSS JOIN t)
      |SELECT seg, na, nb, lift_ppm
      |FROM l
      |ORDER BY lift_ppm DESC NULLS FIRST, seg
      |LIMIT 10""".stripMargin) { (spark, dir) =>
    val c = CoreQueries.events(spark, dir)
      .select(concat(col("event_type"), lit("/"),
          (col("user_id") % 5).cast("string")).as("seg"),
        expr("(ts div 1000) div 86400000000 < 19738").as("isa"))
      .groupBy("seg")
      .agg(sum(when(col("isa"), 1L).otherwise(0L)).as("na"),
        sum(when(!col("isa"), 1L).otherwise(0L)).as("nb"))
    val t = c.agg(sum("na").cast("long").as("ta"),
      sum("nb").cast("long").as("tb"))
    c.crossJoin(broadcast(t))
      .select(col("seg"), col("na"), col("nb"),
        when(col("na") === 0L, lit(null).cast("long"))
          .otherwise(expr(
            "CAST((1000000 * nb * ta) DIV (na * tb) AS BIGINT)"))
          .as("lift_ppm"))
      .orderBy(col("lift_ppm").desc_nulls_first, col("seg"))
      .limit(10)
  }

  /** The q186/q189 co-purchase graph: undirected distinct (a, b) part
    * pairs sharing an order ≥ 2 times — ONE definition so the two graph
    * queries cannot silently diverge (their SQL oracles duplicate the
    * CTE by necessity; this is the single Scala source of truth).
    */
  private def coPurchaseEdges(spark: SparkSession,
      dir: String): DataFrame = {
    // r9 (guide §2.4/§3): the lineitem self-join on l_orderkey shuffled
    // the fact table TWICE and sorted both sides; baskets are small and
    // bounded, so ONE groupBy collects each basket's parts and the row
    // pairs are generated in place with array expressions (codegen-
    // friendly, no join). Pair multiset is identical: for every unordered
    // row pair within an order with distinct parts, one (min, max) —
    // exactly the rows the a.part < b.part self-join produced.
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    li.groupBy("l_orderkey")
      .agg(collect_list("l_partkey").as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
          |  filter(transform(slice(ps, i + 2, size(ps)), y ->
          |    IF(y != x,
          |       named_struct('pa', least(x, y), 'pb', greatest(x, y)),
          |       CAST(NULL AS STRUCT<pa: BIGINT, pb: BIGINT>))),
          |  p -> p IS NOT NULL)))""".stripMargin)).as("pr"))
      .select(col("pr.pa").as("pa"), col("pr.pb").as("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2)
      .select(col("pa").as("a"), col("pb").as("b"))
  }

  /** Degree assortativity of the co-purchase graph — the graph-health
    * scalar (do hubs attach to hubs?) beside q186's communities and
    * q136's triangles: Pearson correlation of endpoint degrees over the
    * symmetrized edge list, computed with exact BIGINT power sums
    * (N·Σxy − Σx·Σy over the cross-multiplied q112 discipline) and ONE
    * literal-order IEEE expression at the end. Negative r = hub-leaf
    * (dissasortative, typical for co-purchase); the sign and magnitude
    * drive sampling strategy for graph-structured training data.
    *
    * 100 TB shape: degrees = one groupBy over edges; endpoint join =
    * broadcast of the |V|-row degree table onto edges twice; power sums
    * = one map-side-combinable aggregate to a single row.
    */
  val q189Assortativity: QuerySpec = QuerySpec.oracled(
    "q189_assortativity",
    """WITH p AS (
      |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |ew AS (SELECT pa, pb FROM p GROUP BY pa, pb HAVING count(*) >= 2),
      |ed AS (SELECT pa AS src, pb AS dst FROM ew
      |       UNION ALL SELECT pb, pa FROM ew),
      |dg AS (SELECT src AS v, CAST(count(*) AS BIGINT) AS deg
      |       FROM ed GROUP BY 1),
      |xy AS (
      |  SELECT dx.deg AS x, dy.deg AS y
      |  FROM ed JOIN dg dx ON dx.v = ed.src JOIN dg dy ON dy.v = ed.dst),
      |s AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(y * y) AS BIGINT) AS syy
      |  FROM xy)
      |SELECT n, round(
      |  CAST(n * sxy - sx * sy AS DOUBLE) /
      |  sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
      |       CAST(n * syy - sy * sy AS DOUBLE)), 6) AS assortativity
      |FROM s""".stripMargin) { (spark, dir) =>
    val ew = coPurchaseEdges(spark, dir)
    val ed = ew.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(ew.select(col("b").as("src"), col("a").as("dst")))
    val dg = ed.groupBy(col("src").as("v"))
      .agg(count(lit(1)).as("deg"))
    val xy = ed
      .join(broadcast(dg.select(col("v").as("__vx"), col("deg").as("x"))),
        col("src") === col("__vx"))
      .join(broadcast(dg.select(col("v").as("__vy"), col("deg").as("y"))),
        col("dst") === col("__vy"))
      .select("x", "y")
    xy.agg(count(lit(1)).as("n"),
        sum("x").cast("long").as("sx"), sum("y").cast("long").as("sy"),
        sum(col("x") * col("y")).cast("long").as("sxy"),
        sum(col("x") * col("x")).cast("long").as("sxx"),
        sum(col("y") * col("y")).cast("long").as("syy"))
      .select(col("n"), round(
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
        sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
          (col("n") * col("syy") - col("sy") * col("sy")).cast("double")),
        6).as("assortativity"))
  }

  /** Chi-squared independence audit between two categorical columns —
    * the association/leakage check (is the user band informative about
    * event type?) completing the stats toolbox beside the two-sample
    * drift trio (q170/q171/q173) and kappa (q182). The statistic is
    * DEFINED in per-cell fixed point so two engines can agree exactly:
    * each cell contributes `⌊1e6·(N·O − R·C)² / (N·R·C)⌋` (all positive
    * integers, so floor-div and truncating div coincide), and chi² in
    * ppm is the BIGINT sum of cell contributions — order-free. Cramér's
    * V is then one literal-order IEEE expression over exact integers,
    * identical in both engines. Intermediates ride DECIMAL(38,0) /
    * INT128 ((N·O)²·1e6 ≈ 5e27 at sf0.1; past ~1e9 rows per table,
    * compute the audit on a fixed-rate sample or drop the ppm scale).
    *
    * 100 TB shape: ONE map-side-combinable (row-class × col-class)
    * groupBy collapses the facts; marginals, the cell grid, and the
    * rollup all run on |r|·|c| rows. Output: one row.
    */
  val q184ChiSquared: QuerySpec = QuerySpec.oracled(
    "q184_chi_squared",
    """WITH e AS (
      |  SELECT event_type, user_id % 10 AS band FROM events),
      |o AS (
      |  SELECT event_type, band, CAST(count(*) AS BIGINT) AS obs
      |  FROM e GROUP BY 1, 2),
      |r AS (
      |  SELECT event_type, CAST(sum(obs) AS BIGINT) AS rr
      |  FROM o GROUP BY 1),
      |c AS (
      |  SELECT band, CAST(sum(obs) AS BIGINT) AS cc FROM o GROUP BY 1),
      |t AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(count(DISTINCT event_type) AS BIGINT) AS nr,
      |    CAST(count(DISTINCT band) AS BIGINT) AS nc
      |  FROM e),
      |cells AS (
      |  SELECT CAST((1000000 *
      |      ((t.n::HUGEINT * o.obs - r.rr::HUGEINT * c.cc) *
      |       (t.n::HUGEINT * o.obs - r.rr::HUGEINT * c.cc)))
      |    // (t.n::HUGEINT * r.rr * c.cc) AS BIGINT) AS ppm
      |  FROM o JOIN r USING (event_type) JOIN c USING (band)
      |  CROSS JOIN t),
      |s AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_cells,
      |    CAST(sum(ppm) AS BIGINT) AS chi2_ppm
      |  FROM cells)
      |SELECT t.n, s.n_cells, (t.nr - 1) * (t.nc - 1) AS dof,
      |  s.chi2_ppm,
      |  round(sqrt(CAST(s.chi2_ppm AS DOUBLE) / 1000000.0 /
      |    CAST(t.n * least(t.nr - 1, t.nc - 1) AS DOUBLE)), 6)
      |    AS cramers_v
      |FROM s CROSS JOIN t""".stripMargin) { (spark, dir) =>
    val e = CoreQueries.events(spark, dir)
      .select(col("event_type"), (col("user_id") % 10).as("band"))
    val o = e.groupBy("event_type", "band").agg(count(lit(1)).as("obs"))
    val r = o.groupBy(col("event_type").as("et_r"))
      .agg(sum("obs").cast("long").as("rr"))
    val c = o.groupBy(col("band").as("band_c"))
      .agg(sum("obs").cast("long").as("cc"))
    val t = e.agg(count(lit(1)).as("n"),
      countDistinct("event_type").as("nr"),
      countDistinct("band").as("nc"))
    val cells = o
      .join(r, col("event_type") === col("et_r"))
      .join(c, col("band") === col("band_c"))
      .crossJoin(broadcast(t))
      .select(expr(
        """CAST((1000000 *
          |  ((CAST(n AS DECIMAL(38,0)) * obs - CAST(rr AS DECIMAL(38,0)) * cc) *
          |   (CAST(n AS DECIMAL(38,0)) * obs - CAST(rr AS DECIMAL(38,0)) * cc)))
          |DIV (CAST(n AS DECIMAL(38,0)) * rr * cc) AS BIGINT)""".stripMargin
          .replace("\n", " ")).as("ppm"))
    val s = cells.agg(count(lit(1)).as("n_cells"),
      sum("ppm").cast("long").as("chi2_ppm"))
    s.crossJoin(broadcast(t))
      .select(col("n"), col("n_cells"),
        ((col("nr") - 1) * (col("nc") - 1)).as("dof"),
        col("chi2_ppm"),
        round(sqrt(col("chi2_ppm").cast("double") / 1000000.0 /
          (col("n") * least(col("nr") - 1, col("nc") - 1)).cast("double")),
          6).as("cramers_v"))
  }

  val q170TvdDrift: QuerySpec = QuerySpec.oracled(
    "q170_tvd_drift",
    """WITH e AS (
      |  SELECT event_type,
      |    CAST(round(value * 100) AS BIGINT) // 500 AS bin,
      |    epoch_us(ts) // 86400000000 < 19738 AS isa
      |  FROM events WHERE value IS NOT NULL),
      |c AS (
      |  SELECT event_type, bin,
      |    CAST(sum(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS na,
      |    CAST(sum(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS BIGINT) AS nb
      |  FROM e GROUP BY 1, 2),
      |t AS (
      |  SELECT event_type, CAST(sum(na) AS BIGINT) AS ta,
      |    CAST(sum(nb) AS BIGINT) AS tb
      |  FROM c GROUP BY 1),
      |s AS (
      |  SELECT c.event_type, any_value(t.ta) AS ta, any_value(t.tb) AS tb,
      |    CAST(sum(abs(c.na * t.tb - c.nb * t.ta)) AS BIGINT) AS num
      |  FROM c JOIN t USING (event_type) GROUP BY c.event_type)
      |SELECT event_type, ta AS na, tb AS nb,
      |  CASE WHEN ta * tb = 0 THEN NULL
      |    ELSE CAST((1000000 * num) // (2 * ta * tb) AS BIGINT)
      |  END AS tvd_ppm
      |FROM s ORDER BY event_type""".stripMargin) { (spark, dir) =>
    graft.ext.Drift.tvdPpm(
      CoreQueries.events(spark, dir)
        .filter(col("value").isNotNull)
        .select(col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT) DIV 500").as("bin"),
          expr("(ts div 1000) div 86400000000 < 19738").as("isa")),
      grpCol = "event_type", inACol = "isa", binCol = "bin")
      .orderBy("event_type")
  }

  /** Mann-Whitney U (Wilcoxon rank-sum) per event type, comparing the
    * even-user cohort's value distribution against the odd-user cohort's —
    * the nonparametric complement to q138's Welch t-test (no normality
    * assumption; rank-based, so robust to the heavy-tailed value
    * distributions metric pipelines actually see). Reported in the exact
    * DOUBLED form `u2_a = 2·R_A − NA·(NA+1)`: midrank ties stay integral
    * (`2·rank + tie_count − 1`), so the whole statistic is BIGINT and
    * hash-stable across engines ([[graft.ext.Drift.mannWhitneyU2]]).
    */
  val q171MannWhitney: QuerySpec = QuerySpec.oracled(
    "q171_mann_whitney",
    """WITH e AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c,
      |    user_id % 2 = 0 AS isa
      |  FROM events WHERE value IS NOT NULL),
      |r AS (
      |  SELECT event_type, isa,
      |    CAST(rank() OVER (PARTITION BY event_type ORDER BY c)
      |      AS BIGINT) AS rk,
      |    CAST(count(*) OVER (PARTITION BY event_type, c)
      |      AS BIGINT) AS ct
      |  FROM e)
      |SELECT event_type,
      |  CAST(sum(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS na,
      |  CAST(sum(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS BIGINT) AS nb,
      |  CAST(sum(CASE WHEN isa THEN 2 * rk + ct - 1 ELSE 0 END)
      |    - sum(CASE WHEN isa THEN 1 ELSE 0 END)
      |      * (sum(CASE WHEN isa THEN 1 ELSE 0 END) + 1)
      |    AS BIGINT) AS u2_a
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    graft.ext.Drift.mannWhitneyU2(
      CoreQueries.events(spark, dir)
        .filter(col("value").isNotNull)
        .select(col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT)").as("c"),
          (col("user_id") % 2 === 0).as("isa")),
      grpCol = "event_type", inACol = "isa", valCol = "c")
      .orderBy("event_type")
  }

  /** Kolmogorov–Smirnov two-sample statistic per event type (first vs
    * second half of the timeline, the q170 split) in ppm
    * ([[graft.ext.Drift.ksPpm]]) — the CDF-supremum member of the drift
    * trio: catches location/shape drift that leaves q170's $5 bin masses
    * and q171's mean ranks nearly unchanged. Exact BIGINT cross-
    * multiplication, one final floor-div; the oracle replays the same
    * cumulative windows over the same integer-cents values.
    */
  val q173KsTest: QuerySpec = QuerySpec.oracled(
    "q173_ks_test",
    """WITH e AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c,
      |    epoch_us(ts) // 86400000000 < 19738 AS isa
      |  FROM events WHERE value IS NOT NULL),
      |v AS (
      |  SELECT event_type, c,
      |    CAST(sum(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS na,
      |    CAST(sum(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS BIGINT) AS nb
      |  FROM e GROUP BY 1, 2),
      |cum AS (
      |  SELECT event_type, na, nb,
      |    sum(na) OVER (PARTITION BY event_type ORDER BY c
      |      ROWS UNBOUNDED PRECEDING) AS ca,
      |    sum(nb) OVER (PARTITION BY event_type ORDER BY c
      |      ROWS UNBOUNDED PRECEDING) AS cb
      |  FROM v),
      |t AS (
      |  SELECT event_type, CAST(sum(na) AS BIGINT) AS ta,
      |    CAST(sum(nb) AS BIGINT) AS tb
      |  FROM cum GROUP BY 1),
      |s AS (
      |  SELECT cum.event_type, any_value(t.ta) AS ta, any_value(t.tb) AS tb,
      |    CAST(max(abs(cum.ca * t.tb - cum.cb * t.ta)) AS BIGINT) AS sup
      |  FROM cum JOIN t USING (event_type) GROUP BY cum.event_type)
      |SELECT event_type, ta AS na, tb AS nb,
      |  CASE WHEN ta * tb = 0 THEN NULL
      |    ELSE CAST((1000000 * sup) // (ta * tb) AS BIGINT)
      |  END AS ks_ppm
      |FROM s ORDER BY event_type""".stripMargin) { (spark, dir) =>
    graft.ext.Drift.ksPpm(
      CoreQueries.events(spark, dir)
        .filter(col("value").isNotNull)
        .select(col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT)").as("c"),
          expr("(ts div 1000) div 86400000000 < 19738").as("isa")),
      grpCol = "event_type", inACol = "isa", valCol = "c")
      .orderBy("event_type")
  }

  val all: Seq[QuerySpec] =
    Seq(q63Funnel, q64Cohort, q65Histogram, q72TransitionMatrix,
      q78SaltedDistinct, q80VarianceExact, q83GapFill, q98PageRank,
      q107TimeDecay, q109RollingDistinct, q112RegressionExact,
      q114IntervalUnion, q123AnomalyGate, q127Winsorize, q132BfsReach,
      q133Streaks, q135SequenceMatch, q136TriangleCount, q137CorrMatrix,
      q138WelchTtest, q139PointwiseLift, q141Autocorr, q142Benford,
      q143PathTrigrams, q145Skyline, q146WeightedMedian, q156MadOutliers,
      q159CusumChangepoint, q160LastTouchAttribution, q170TvdDrift,
      q171MannWhitney, q173KsTest, q184ChiSquared, q186Communities,
      q189Assortativity, q192TrendDetect, q195HazardTable, q200Hits,
      q205LinearAttribution, q206KCore, q207Sssp, q211PassAtK,
      q213UShapeAttribution, q216WilsonLb, q225RfmSegments,
      q227ForecastEval)

  /** Forecast-eval baseline comparison (the MASE ingredient): per event
    * type, the 1-day-lag naive forecast against the 7-day-lag seasonal
    * naive over the daily count series — absolute-error SUMS as exact
    * BIGINTs (counts are integers, so MAE numerators are too), the
    * seasonal/naive ratio as one floor-div ppm, and the winner decided by
    * integer comparison. Missing days are handled by JOINING on day−k
    * (inner semantics, identical in both engines) rather than a
    * row-offset `lag` that silently spans gaps — the correctness trap in
    * time-series eval on sparse series. One (type, day) map-side
    * aggregate; everything after runs on |types|×|days| rows.
    */
  lazy val q227ForecastEval: QuerySpec = QuerySpec.oracled(
    "q227_forecast_eval",
    """WITH d AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |j AS (
      |  SELECT d.event_type, d.day, d.c, p1.c AS c1, p7.c AS c7
      |  FROM d
      |  JOIN d p1 ON p1.event_type = d.event_type AND p1.day = d.day - 1
      |  JOIN d p7 ON p7.event_type = d.event_type AND p7.day = d.day - 7)
      |SELECT event_type, count(*) AS n_days,
      |  CAST(sum(abs(c - c1)) AS BIGINT) AS mae1_sum,
      |  CAST(sum(abs(c - c7)) AS BIGINT) AS mae7_sum,
      |  CAST(CASE WHEN sum(abs(c - c1)) > 0
      |    THEN (sum(abs(c - c7)) * 1000000) // sum(abs(c - c1))
      |    ELSE -1 END AS BIGINT) AS mase_ppm,
      |  CAST(CASE WHEN sum(abs(c - c7)) < sum(abs(c - c1))
      |    THEN 1 ELSE 0 END AS INTEGER) AS seasonal_wins
      |FROM j GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (spark, dir) =>
    val d = CoreQueries.events(spark, dir)
      .groupBy(col("event_type"),
        expr("(ts div 1000) div 86400000000").as("day"))
      .agg(count(lit(1)).as("c"))
    val p1 = d.select(col("event_type").as("et1"),
      col("day").as("d1"), col("c").as("c1"))
    val p7 = d.select(col("event_type").as("et7"),
      col("day").as("d7"), col("c").as("c7"))
    d.join(p1, col("et1") === col("event_type") &&
        col("d1") === col("day") - 1)
      .join(p7, col("et7") === col("event_type") &&
        col("d7") === col("day") - 7)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("c") - col("c1"))).as("mae1_sum"),
        sum(abs(col("c") - col("c7"))).as("mae7_sum"))
      .withColumn("mase_ppm",
        when(col("mae1_sum") > 0,
          expr("(mae7_sum * 1000000) DIV mae1_sum"))
          .otherwise(lit(-1L)))
      .withColumn("seasonal_wins",
        when(col("mae7_sum") < col("mae1_sum"), 1).otherwise(0))
      .select(col("event_type"), col("n_days"), col("mae1_sum"),
        col("mae7_sum"), col("mase_ppm"), col("seasonal_wins"))
      .orderBy("event_type")
  }

  /** RFM customer segmentation: recency (days since last order, anchored
    * to the corpus-max date so the metric is reproducible), frequency
    * (order count), monetary (lifetime cents) — each scored into
    * quintiles with `ntile(5)` over a UNIQUE order (metric, custkey), so
    * tile boundaries are deterministic in both engines; higher tile =
    * better customer on every axis. Emitted as the (r, f, m) segment
    * matrix with member counts and key sums — the lifecycle-marketing
    * precompute. Scale: one per-customer aggregate; the three ntile
    * windows run over |customers| rows (single-partition at gate scale —
    * the production form pre-computes boundaries via approx quantiles
    * and maps tiles map-side, which q74's equidepth binning demonstrates).
    */
  lazy val q225RfmSegments: QuerySpec = QuerySpec.oracled(
    "q225_rfm_segments",
    """WITH c AS (
      |  SELECT o_custkey,
      |    CAST((epoch_us((SELECT max(o_orderdate) FROM orders))
      |      - epoch_us(max(o_orderdate))) // 86400000000 AS BIGINT)
      |      AS rec_days,
      |    count(*) AS freq,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY o_custkey),
      |t AS (
      |  SELECT o_custkey,
      |    ntile(5) OVER (ORDER BY rec_days DESC, o_custkey) AS r_q,
      |    ntile(5) OVER (ORDER BY freq ASC, o_custkey) AS f_q,
      |    ntile(5) OVER (ORDER BY cents ASC, o_custkey) AS m_q
      |  FROM c)
      |SELECT CAST(r_q AS INTEGER) AS r_q, CAST(f_q AS INTEGER) AS f_q,
      |  CAST(m_q AS INTEGER) AS m_q,
      |  count(*) AS n_customers,
      |  CAST(sum(o_custkey) AS BIGINT) AS key_sum
      |FROM t GROUP BY 1, 2, 3
      |ORDER BY r_q, f_q, m_q""".stripMargin) { (spark, dir) =>
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    // corpus-max anchor as a broadcast scalar (o_orderdate arrives NTZ —
    // with the session pinned UTC the double cast reads the same instant
    // DuckDB's epoch_us sees, the q28 discipline)
    val anchor = orders.agg(
      max(col("o_orderdate").cast("timestamp").cast("long")).as("anchor_s"))
    val c = orders.groupBy("o_custkey")
      .agg(
        max(col("o_orderdate").cast("timestamp").cast("long")).as("last_s"),
        count(lit(1)).as("freq"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
      .crossJoin(broadcast(anchor))
      .withColumn("rec_days",
        ((col("anchor_s") - col("last_s")) / 86400).cast("long"))
    val wAll = Window.partitionBy(lit(1))
    val t = c
      .withColumn("r_q", ntile(5).over(
        wAll.orderBy(col("rec_days").desc, col("o_custkey"))))
      .withColumn("f_q", ntile(5).over(
        wAll.orderBy(col("freq").asc, col("o_custkey"))))
      .withColumn("m_q", ntile(5).over(
        wAll.orderBy(col("cents").asc, col("o_custkey"))))
    t.groupBy("r_q", "f_q", "m_q")
      .agg(count(lit(1)).as("n_customers"),
        sum("o_custkey").as("key_sum"))
      .orderBy("r_q", "f_q", "m_q")
  }

  /** Wilson-score lower-bound ranking (z = 2, ~95.45%): rank user cohorts
    * by the CONFIDENCE-ADJUSTED click share, not the raw ratio — the
    * classic fix for "1/1 beats 900/1000" when sorting by small-sample
    * rates. z = 2 is chosen deliberately: z² = 4 and z²/4 = 1 are exact,
    * so the whole formula is rational arithmetic around ONE `sqrt` — and
    * IEEE sqrt is correctly rounded (engine-portable, unlike ln/erf), so
    * both engines produce the identical double before the ppm floor (the
    * q209 discipline). The ranking key itself is the floored BIGINT.
    * Scale: one map-side-combinable cohort aggregate; the ranking window
    * runs on |cohorts| rows.
    */
  lazy val q216WilsonLb: QuerySpec = QuerySpec.oracled(
    "q216_wilson_lb",
    """WITH b AS (
      |  SELECT user_id % 50 AS cohort,
      |    count(*) FILTER (WHERE event_type IN ('view', 'click')) AS n,
      |    count(*) FILTER (WHERE event_type = 'click') AS k
      |  FROM events GROUP BY 1
      |  HAVING count(*) FILTER (WHERE event_type IN ('view', 'click')) > 0),
      |w AS (
      |  SELECT cohort, n, k,
      |    CAST(floor(
      |      ((k / CAST(n AS DOUBLE)) + 2.0 / n
      |        - 2.0 * sqrt(((k / CAST(n AS DOUBLE))
      |            * (1.0 - (k / CAST(n AS DOUBLE)))) / n
      |          + 1.0 / (n * n)))
      |      / (1.0 + 4.0 / n) * 1000000.0 + 0.5) AS BIGINT) AS lb_ppm
      |  FROM b)
      |SELECT CAST(cohort AS BIGINT) AS cohort, CAST(n AS BIGINT) AS n,
      |  CAST(k AS BIGINT) AS k, lb_ppm,
      |  CAST(row_number() OVER (ORDER BY lb_ppm DESC, cohort)
      |    AS INTEGER) AS rnk
      |FROM w ORDER BY rnk""".stripMargin) { (spark, dir) =>
    val b = CoreQueries.events(spark, dir)
      .groupBy((col("user_id") % 50).as("cohort"))
      .agg(
        count(when(col("event_type").isin("view", "click"), 1)).as("n"),
        count(when(col("event_type") === "click", 1)).as("k"))
      .filter(col("n") > 0)
    val p = col("k") / col("n").cast("double")
    val lb = (p + lit(2.0) / col("n")
      - lit(2.0) * sqrt((p * (lit(1.0) - p)) / col("n")
        + lit(1.0) / (col("n") * col("n")))) / (lit(1.0) + lit(4.0) / col("n"))
    val wR = Window.partitionBy(lit(1))
      .orderBy(col("lb_ppm").desc, col("cohort"))
    b.withColumn("lb_ppm",
        floor(lb * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("rnk", row_number().over(wR))
      .select(col("cohort").cast("long").as("cohort"),
        col("n"), col("k"), col("lb_ppm"), col("rnk"))
      .orderBy("rnk")
  }

  /** Position-based (U-shaped) attribution — 40% first touch, 40% last,
    * 20% shared by the middles — completing the attribution triple
    * (q160 last-touch, q205 linear). Exact integer apportionment per
    * purchase: n=1 → 10000; n=2 → 5000/5000; n≥3 → 4000 at each end,
    * middles get `2000 DIV (n−2)` each with the second-to-last absorbing
    * the remainder — credits sum to exactly 10000 for every n (spec'd).
    * Same join/window shape and 7-day lookback as q205.
    */
  lazy val q213UShapeAttribution: QuerySpec = QuerySpec.oracled(
    "q213_ushape_attribution",
    """WITH e AS (
      |  SELECT event_id, user_id, event_type,
      |    epoch_ns(ts) // 1000 AS tus
      |  FROM events),
      |p AS (
      |  SELECT user_id, event_id AS pid, tus AS pts FROM e
      |  WHERE event_type = 'purchase'),
      |t AS (
      |  SELECT user_id, event_id AS tid, event_type AS ttype, tus AS tts
      |  FROM e WHERE event_type IN ('view', 'click')),
      |j AS (
      |  SELECT p.pid, t.tid, t.ttype, t.tts
      |  FROM p JOIN t ON p.user_id = t.user_id
      |    AND t.tts < p.pts AND t.tts >= p.pts - 604800000000),
      |w AS (
      |  SELECT pid, tid, ttype,
      |    count(*) OVER (PARTITION BY pid) AS n,
      |    row_number() OVER (PARTITION BY pid
      |                       ORDER BY tts, tid) AS rn
      |  FROM j),
      |c AS (
      |  SELECT ttype,
      |    CASE
      |      WHEN n = 1 THEN 10000
      |      WHEN n = 2 THEN 5000
      |      WHEN rn = 1 OR rn = n THEN 4000
      |      WHEN rn = n - 1 THEN 2000 - (n - 3) * (2000 // (n - 2))
      |      ELSE 2000 // (n - 2)
      |    END AS credit_bp
      |  FROM w)
      |SELECT ttype AS event_type, count(*) AS n_touches,
      |  CAST(sum(credit_bp) AS BIGINT) AS credit_bp_sum
      |FROM c GROUP BY ttype
      |ORDER BY event_type""".stripMargin) { (spark, dir) =>
    val ev = CoreQueries.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000").as("tus"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"),
        col("tus").as("pts"))
    val t = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id").as("t_user"), col("event_id").as("tid"),
        col("event_type").as("ttype"), col("tus").as("tts"))
    val j = p.join(t,
      col("user_id") === col("t_user") &&
        col("tts") < col("pts") &&
        col("tts") >= col("pts") - lit(604800000000L))
    val wN = Window.partitionBy("pid")
    val wR = Window.partitionBy("pid").orderBy(col("tts"), col("tid"))
    j.withColumn("n", count(lit(1)).over(wN))
      .withColumn("rn", row_number().over(wR))
      .withColumn("credit_bp", expr(
        """CASE
          |  WHEN n = 1 THEN 10000L
          |  WHEN n = 2 THEN 5000L
          |  WHEN rn = 1 OR rn = n THEN 4000L
          |  WHEN rn = n - 1 THEN 2000 - (n - 3) * (2000 DIV (n - 2))
          |  ELSE 2000 DIV (n - 2)
          |END""".stripMargin))
      .groupBy("ttype")
      .agg(count(lit(1)).as("n_touches"),
        sum("credit_bp").as("credit_bp_sum"))
      .select(col("ttype").as("event_type"), col("n_touches"),
        col("credit_bp_sum"))
      .orderBy("event_type")
  }

  /** Exact pass@k (k = 3): per user, the probability that at least one of
    * k uniformly drawn attempts (without replacement) succeeds —
    * `1 − C(n−c,k)/C(n,k)` — the eval-harness estimator, computed as
    * EXACT integer arithmetic: the binomial ratio telescopes to
    * `Π(n−c−i)/Π(n−i)`, both products small BIGINTs, one floor-div to
    * ppm (floats would need n! beyond 2^53 immediately; the product form
    * never exceeds n³·1e6). Attempts = events, successes = purchases;
    * users with fewer successes than room (n−c < k) clamp to 1e6 ppm
    * exactly as the estimator does. One map-side-combinable per-user
    * aggregate; everything after is row-local arithmetic.
    */
  lazy val q211PassAtK: QuerySpec = QuerySpec.oracled(
    "q211_pass_at_k",
    """WITH u AS (
      |  SELECT user_id, count(*) AS n,
      |    count(*) FILTER (WHERE event_type = 'purchase') AS c
      |  FROM events GROUP BY user_id
      |  HAVING count(*) >= 3)
      |SELECT user_id, CAST(n AS BIGINT) AS n_attempts,
      |  CAST(c AS BIGINT) AS n_correct,
      |  CAST(CASE WHEN n - c < 3 THEN 1000000
      |    ELSE 1000000 - (1000000 * ((n - c) * (n - c - 1) * (n - c - 2)))
      |      // (n * (n - 1) * (n - 2)) END AS BIGINT) AS pass_at_3_ppm
      |FROM u ORDER BY user_id""".stripMargin) { (spark, dir) =>
    CoreQueries.events(spark, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        count(when(col("event_type") === "purchase", 1)).as("c"))
      .filter(col("n") >= 3)
      .select(col("user_id"), col("n").as("n_attempts"),
        col("c").as("n_correct"),
        expr("""CAST(CASE WHEN n - c < 3 THEN 1000000
                |  ELSE 1000000 - (1000000 * ((n - c) * (n - c - 1)
                |    * (n - c - 2))) DIV (n * (n - 1) * (n - 2)) END
                |  AS BIGINT)""".stripMargin).as("pass_at_3_ppm"))
      .orderBy("user_id")
  }

  private def ssspIterSql(i: Int): String =
    s"""d$i AS (
       |  SELECT node, min(dist) AS dist FROM (
       |    SELECT node, dist FROM d${i - 1}
       |    UNION ALL
       |    SELECT e.dst AS node, p.dist + e.w AS dist
       |    FROM e JOIN d${i - 1} p ON e.src = p.node)
       |  GROUP BY node)""".stripMargin

  /** Weighted single-source shortest paths ([[graft.ext.Sssp]], 4
    * Bellman-Ford rounds) over the symmetrized customer↔part purchase
    * graph, weight = cheapest observed price in exact cents — "what's the
    * cheapest connection chain from the seed customer?". Min-plus algebra
    * needs NO fixed-point tricks: distances are exact BIGINT sums and
    * `min` commutes, so partition order is irrelevant and the oracle
    * unrolls the four relaxations as plain CTEs (the q98/q132 iterative
    * family, completed for weighted graphs). Node encoding 2k / 2k+1
    * keeps the bipartite key spaces disjoint. Per round: one
    * distances⋈edges equi-join + one min-aggregate, linear in |E|.
    */
  lazy val q207Sssp: QuerySpec = QuerySpec.oracled(
    "q207_sssp",
    s"""WITH pair AS (
       |  SELECT o.o_custkey AS c, l.l_partkey AS p,
       |    min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS w
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       |  GROUP BY 1, 2),
       |e AS (
       |  SELECT c * 2 AS src, p * 2 + 1 AS dst, w FROM pair
       |  UNION ALL
       |  SELECT p * 2 + 1, c * 2, w FROM pair),
       |s AS (SELECT min(src) AS n FROM e WHERE src % 2 = 0),
       |d0 AS (SELECT n AS node, CAST(0 AS BIGINT) AS dist FROM s),
       |${ssspIterSql(1)},
       |${ssspIterSql(2)},
       |${ssspIterSql(3)},
       |${ssspIterSql(4)}
       |SELECT CAST(node % 2 AS INTEGER) AS side, node // 2 AS key, dist
       |FROM d4 ORDER BY side, key""".stripMargin) { (spark, dir) =>
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val l = spark.read.parquet(s"$dir/lineitem.parquet")
    val pair = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .agg(min(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
        .as("w"))
    // materialize the o⋈l pair derivation ONCE: the source-seed aggregate
    // and every relaxation round read this checkpoint instead of each
    // re-running the join (r9: was two full derivations per call)
    val e = pair.select((col("c") * 2).as("src"),
        (col("p") * 2 + 1).as("dst"), col("w"))
      .unionByName(pair.select((col("p") * 2 + 1).as("src"),
        (col("c") * 2).as("dst"), col("w")))
      .localCheckpoint()
    val source = e.filter(col("src") % 2 === 0)
      .agg(min("src")).head().getLong(0)
    graft.ext.Sssp.boundedDistances(
      spark, e, "src", "dst", "w", source, rounds = 4)
      .select(expr("CAST(node % 2 AS INT)").as("side"),
        expr("node DIV 2").as("key"), col("dist"))
      .orderBy("side", "key")
  }

  /** Linear multi-touch attribution with a 7-day lookback: every view or
    * click in the week before a purchase shares that purchase's 10,000
    * basis points EQUALLY — q160's last-touch twin for the other standard
    * attribution model. Fractional credit is the adjudication trap: bp/n
    * is not an integer, and float credit would sum in partition order.
    * The q169 apportionment discipline instead: every touch gets
    * `10000 DIV n`, the LAST touch (latest ts, ties → highest id) absorbs
    * the remainder — credits are exact integers that sum to exactly
    * 10000 per purchase. Scale: one user-key equi-join bounded by the
    * 7-day range (the q77 attribution shape in batch), two windows per
    * purchase-sized partition, then a map-side-combinable rollup.
    */
  lazy val q205LinearAttribution: QuerySpec = QuerySpec.oracled(
    "q205_linear_attribution",
    """WITH e AS (
      |  SELECT event_id, user_id, event_type,
      |    epoch_ns(ts) // 1000 AS tus
      |  FROM events),
      |p AS (
      |  SELECT user_id, event_id AS pid, tus AS pts FROM e
      |  WHERE event_type = 'purchase'),
      |t AS (
      |  SELECT user_id, event_id AS tid, event_type AS ttype, tus AS tts
      |  FROM e WHERE event_type IN ('view', 'click')),
      |j AS (
      |  SELECT p.pid, t.tid, t.ttype, t.tts
      |  FROM p JOIN t ON p.user_id = t.user_id
      |    AND t.tts < p.pts AND t.tts >= p.pts - 604800000000),
      |w AS (
      |  SELECT pid, tid, ttype,
      |    count(*) OVER (PARTITION BY pid) AS n,
      |    row_number() OVER (PARTITION BY pid
      |                       ORDER BY tts DESC, tid DESC) AS rn
      |  FROM j),
      |c AS (
      |  SELECT ttype,
      |    CASE WHEN rn = 1 THEN 10000 - (n - 1) * (10000 // n)
      |         ELSE 10000 // n END AS credit_bp
      |  FROM w)
      |SELECT ttype AS event_type, count(*) AS n_touches,
      |  CAST(sum(credit_bp) AS BIGINT) AS credit_bp_sum
      |FROM c GROUP BY ttype
      |ORDER BY event_type""".stripMargin) { (spark, dir) =>
    val ev = CoreQueries.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000").as("tus"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"),
        col("tus").as("pts"))
    val t = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id").as("t_user"), col("event_id").as("tid"),
        col("event_type").as("ttype"), col("tus").as("tts"))
    val j = p.join(t,
      col("user_id") === col("t_user") &&
        col("tts") < col("pts") &&
        col("tts") >= col("pts") - lit(604800000000L))
    val wN = Window.partitionBy("pid")
    val wR = Window.partitionBy("pid")
      .orderBy(col("tts").desc, col("tid").desc)
    j.withColumn("n", count(lit(1)).over(wN))
      .withColumn("rn", row_number().over(wR))
      .withColumn("credit_bp",
        when(col("rn") === 1,
          lit(10000) - (col("n") - 1) * expr("10000 DIV n"))
          .otherwise(expr("10000 DIV n")))
      .groupBy("ttype")
      .agg(count(lit(1)).as("n_touches"),
        sum("credit_bp").as("credit_bp_sum"))
      .select(col("ttype").as("event_type"), col("n_touches"),
        col("credit_bp_sum"))
      .orderBy("event_type")
  }

  /** Bipartite k-core peeling ([[graft.ext.KCore.peelStats]], k = 30,
    * 3 synchronous rounds) over the customer→part purchase graph — the
    * dense-core prune run before collaborative filtering or graph
    * embedding (sparse interactions are noise that doubles the edge
    * list). Each round drops edges with EITHER endpoint below degree 30;
    * peeling cascades (removing a round-1 edge can sink a round-2
    * endpoint), which is exactly what the per-round stats surface. The
    * oracle unrolls the three rounds as CTE filters. Per round: two
    * node-sized degree aggregates + two joins back onto a monotonically
    * shrinking edge table.
    */
  lazy val q206KCore: QuerySpec = QuerySpec.oracled(
    "q206_kcore",
    """WITH e0 AS (
      |  SELECT DISTINCT o.o_custkey AS src, l.l_partkey AS dst
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
      |e1 AS (
      |  SELECT src, dst FROM e0
      |  WHERE src IN (SELECT src FROM e0 GROUP BY src
      |                HAVING count(*) >= 30)
      |    AND dst IN (SELECT dst FROM e0 GROUP BY dst
      |                HAVING count(*) >= 30)),
      |e2 AS (
      |  SELECT src, dst FROM e1
      |  WHERE src IN (SELECT src FROM e1 GROUP BY src
      |                HAVING count(*) >= 30)
      |    AND dst IN (SELECT dst FROM e1 GROUP BY dst
      |                HAVING count(*) >= 30)),
      |e3 AS (
      |  SELECT src, dst FROM e2
      |  WHERE src IN (SELECT src FROM e2 GROUP BY src
      |                HAVING count(*) >= 30)
      |    AND dst IN (SELECT dst FROM e2 GROUP BY dst
      |                HAVING count(*) >= 30))
      |SELECT * FROM (
      |  SELECT 1 AS round, count(*) AS n_edges,
      |    count(DISTINCT src) AS n_src, count(DISTINCT dst) AS n_dst
      |  FROM e1
      |  UNION ALL
      |  SELECT 2, count(*), count(DISTINCT src), count(DISTINCT dst)
      |  FROM e2
      |  UNION ALL
      |  SELECT 3, count(*), count(DISTINCT src), count(DISTINCT dst)
      |  FROM e3)
      |ORDER BY round""".stripMargin) { (spark, dir) =>
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val l = spark.read.parquet(s"$dir/lineitem.parquet")
    val edges = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .select(col("o_custkey").as("src"), col("l_partkey").as("dst"))
    graft.ext.KCore.peelStats(edges, "src", "dst", k = 30, rounds = 3)
      .orderBy("round")
  }

  /** HITS hubs & authorities ([[graft.ext.Hits.hubsAuthorities]], 2
    * rounds) over the customer→part purchase graph (distinct
    * orders⋈lineitem pairs): hubs are customers whose baskets concentrate
    * on widely-bought parts, authorities the parts those hubs buy —
    * Kleinberg's mutual reinforcement beside q98's PageRank (random-walk
    * centrality) and q189's assortativity. Exact integer formulation:
    * scores stay UNNORMALIZED BIGINTs (a0 = 1, every round two
    * sum-aggregates), so partition order cannot perturb them and the
    * oracle unrolls both rounds as plain CTEs — rankings are identical to
    * the normalized form since normalization only rescales. Top-20 per
    * role. Scale: per round two edges⋈scores equi-joins + partial-agg
    * sums, linear in |E|; the distinct edge table derives once
    * (persisted) and is reused all four joins.
    */
  lazy val q200Hits: QuerySpec = QuerySpec.oracled(
    "q200_hits",
    """WITH e AS (
      |  SELECT DISTINCT o.o_custkey AS src, l.l_partkey AS dst
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
      |h1 AS (
      |  SELECT src, CAST(count(*) AS BIGINT) AS s FROM e GROUP BY src),
      |a1 AS (
      |  SELECT e.dst, CAST(sum(h1.s) AS BIGINT) AS s
      |  FROM e JOIN h1 USING (src) GROUP BY e.dst),
      |h2 AS (
      |  SELECT e.src, CAST(sum(a1.s) AS BIGINT) AS s
      |  FROM e JOIN a1 USING (dst) GROUP BY e.src),
      |a2 AS (
      |  SELECT e.dst, CAST(sum(h2.s) AS BIGINT) AS s
      |  FROM e JOIN h2 USING (src) GROUP BY e.dst),
      |u AS (
      |  SELECT CAST(src AS BIGINT) AS node, 'hub' AS role, s AS score
      |  FROM h2
      |  UNION ALL
      |  SELECT CAST(dst AS BIGINT), 'authority', s FROM a2),
      |r AS (
      |  SELECT node, role, score,
      |    row_number() OVER (PARTITION BY role
      |                       ORDER BY score DESC, node) AS rnk
      |  FROM u)
      |SELECT role, CAST(rnk AS INTEGER) AS rank, node, score
      |FROM r WHERE rnk <= 20
      |ORDER BY role, rank""".stripMargin) { (spark, dir) =>
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val l = spark.read.parquet(s"$dir/lineitem.parquet")
    val edges = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .select(col("o_custkey").as("src"), col("l_partkey").as("dst"))
    val scores = graft.ext.Hits.hubsAuthorities(edges, "src", "dst", 2)
      .select(col("node").cast("long").as("node"), col("role"),
        col("score"))
    val w = Window.partitionBy("role")
      .orderBy(col("score").desc, col("node"))
    scores.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 20)
      .select(col("role"), col("rank"), col("node"), col("score"))
      .orderBy("role", "rank")
  }
}
