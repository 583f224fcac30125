package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ANALYZE-style table profiling: per-column null count, exact distinct
  * count, and formatted min/max — the stats collection a warehouse runs
  * before choosing join orders, and the first thing a data engineer asks
  * of an unfamiliar 100 TB table.
  *
  * Plan shape: ONE scan. All columns' metrics compute in a single
  * aggregation (the multi-distinct plan Spark lowers to an Expand — one
  * pass over the data, fan-out #cols in the shuffle, which is the
  * standard ANALYZE trade), then the single result row unpivots to one
  * row per column with `stack`. Formatters let callers route doubles
  * through integer cents and dates through strings (the cross-engine
  * canonicalization rules).
  */
object Profile {

  /** One profiled column: output row name, the source column, and a
    * formatter applied to min/max before they leave as strings.
    */
  final case class ProfileCol(
      name: String,
      source: Column,
      fmt: Column => Column = _.cast("string"))

  /** Profile `cols` over `df` in one scan; returns (col, n_null,
    * n_distinct, min_s, max_s) ordered by col.
    */
  def table(df: DataFrame, cols: Seq[ProfileCol]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        (count(lit(1)) - count(c.source)).as(s"${c.name}__nn"),
        countDistinct(c.source).as(s"${c.name}__nd"),
        c.fmt(min(c.source)).as(s"${c.name}__mn"),
        c.fmt(max(c.source)).as(s"${c.name}__mx"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'${c.name}', `${c.name}__nn`, `${c.name}__nd`, " +
        s"`${c.name}__mn`, `${c.name}__mx`"
    }.mkString(", ")
    one.selectExpr(
        s"stack(${cols.size}, $stackArgs) AS (col, n_null, n_distinct, min_s, max_s)")
      .orderBy("col")
  }

  /** The scale variant: same single-scan profile but distincts come from
    * `approx_count_distinct` (HLL++, rsd-bounded) ALONGSIDE the exact
    * count. q93's exact multi-distinct Expand multiplies scan output rows
    * by #cols before the shuffle — the standard ANALYZE trade, but at
    * 100 TB the HLL sketches (one fixed-size buffer per column per
    * partition, no Expand) are what a user actually runs; the exact
    * column exists to make the error claim adjudicable (q56's pattern).
    * Returns (col, n_null, n_distinct, n_distinct_approx, min_s, max_s).
    */
  def tableWithApprox(df: DataFrame, cols: Seq[ProfileCol],
      rsd: Double = 0.02): DataFrame = {
    // sketch pass: plain aggregates only — NO distinct column, so Catalyst
    // plans a straight partial agg with no Expand. Mixing countDistinct
    // into this aggregate would drag every HLL buffer through the
    // Expand's #distinct-groups row multiplication (measured 2.4× q93).
    val sketchAggs = cols.flatMap { c =>
      Seq(
        (count(lit(1)) - count(c.source)).as(s"${c.name}__nn"),
        approx_count_distinct(c.source, rsd).as(s"${c.name}__na"),
        c.fmt(min(c.source)).as(s"${c.name}__mn"),
        c.fmt(max(c.source)).as(s"${c.name}__mx"))
    }
    // exact pass: the adjudication twin, isolated so its multi-distinct
    // Expand carries bare values, not sketch buffers
    val exactAggs = cols.map(c =>
      countDistinct(c.source).as(s"${c.name}__nd"))
    val one = df.agg(sketchAggs.head, sketchAggs.tail: _*)
      .crossJoin(df.agg(exactAggs.head, exactAggs.tail: _*)) // 1×1 rows
    val stackArgs = cols.map { c =>
      s"'${c.name}', `${c.name}__nn`, `${c.name}__nd`, `${c.name}__na`, " +
        s"`${c.name}__mn`, `${c.name}__mx`"
    }.mkString(", ")
    one.selectExpr(
        s"stack(${cols.size}, $stackArgs) AS " +
          "(col, n_null, n_distinct, n_distinct_approx, min_s, max_s)")
      .orderBy("col")
  }

  /** Approximate functional-dependency audit: for each candidate FD A→B,
    * the g3 measure (Kivinen & Mannila) — the minimum number of rows to
    * DELETE so the dependency holds exactly — plus the determinant counts
    * a profiler reports. The discovery step behind key detection,
    * normalization advice, and "is this column derivable?" questions; g3
    * is the standard approximate-FD error because it is exact, integral,
    * and monotone under row deletion (violation-PAIR counting is
    * quadratic per group; g3 is linear).
    *
    * Output per FD: (fd, n_rows, n_determinants,
    * n_violating_determinants, g3_remove_rows, holds) where
    * `g3_remove_rows = N − Σ_a max_b |rows(a,b)|` and `holds` ⇔ g3 = 0.
    *
    * 100 TB shape: ONE scan for ALL candidate FDs — each row expands to
    * |fds| (fd, a, b) tuples (Spark's Expand, the multi-distinct trade),
    * then two map-side-combinable aggregations whose keys shrink at each
    * step ((fd, a, b) → (fd, a) → fd). Values ride as strings so one
    * uniform schema serves every FD; NULL is a value (its own group) in
    * both engines.
    */
  def fdAudit(df: DataFrame, fds: Seq[(String, String)]): DataFrame = {
    require(fds.nonEmpty, "need at least one candidate FD")
    val melted = df.select(explode(array(fds.map { case (a, b) =>
        struct(lit(s"$a->$b").as("fd"),
          col(a).cast("string").as("a"),
          col(b).cast("string").as("b"))
      }: _*)).as("x"))
      .select(col("x.fd").as("fd"), col("x.a").as("a"), col("x.b").as("b"))
    val ab = melted.groupBy("fd", "a", "b").agg(count(lit(1)).as("cnt"))
    val perA = ab.groupBy("fd", "a")
      .agg(sum("cnt").as("rows_a"), max("cnt").as("keep_a"),
        count(lit(1)).as("nb"))
    perA.groupBy("fd")
      .agg(
        sum("rows_a").as("n_rows"),
        count(lit(1)).as("n_determinants"),
        sum(when(col("nb") > 1L, 1L).otherwise(0L))
          .as("n_violating_determinants"),
        (sum("rows_a") - sum("keep_a")).as("g3_remove_rows"))
      .withColumn("holds", col("g3_remove_rows") === 0L)
  }
}
