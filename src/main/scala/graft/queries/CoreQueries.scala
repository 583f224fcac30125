package graft.queries

import graft.operators.Upsert

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The relational substrate + contract-layer operators as oracle-verifiable
  * queries (SURVEY §2). Each query reads the driver's parquet tables from
  * `dir` and mirrors its DuckDB oracle exactly (aliases included).
  *
  * Conventions (driver-compare safety):
  *  - timestamps are always emitted as formatted strings (Spark writes
  *    UTC-adjusted parquet timestamps, DuckDB naive — raw values would
  *    false-mismatch);
  *  - double aggregates are `round(...)`-ed so partial-aggregation order
  *    cannot surface ulp noise; raw stored doubles pass through untouched
  *    (bit-exact in both engines);
  *  - every query is totally ordered by a unique key set.
  */
object CoreQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Canonical events loader: presents `ts` as epoch-nanos BIGINT no matter
    * which physical type the fixture carries. Earlier fixture generations
    * wrote TIMESTAMP(NANOS) — which Spark 4 refuses by default
    * (PARQUET_TYPE_ILLEGAL), hence `nanosAsLong` → LongType nanos — while
    * current ones write TIMESTAMP(MICROS) (TIMESTAMP_NTZ in Spark), which
    * is reinterpreted here as UTC (all graft sessions pin
    * `spark.sql.session.timeZone=UTC`) and scaled to nanos. Every use site
    * keeps the one canonical convention (`timestamp_micros(ts div 1000)`),
    * and the DuckDB oracles keep reading the same column as a timestamp
    * (`epoch_us(ts)` ≡ `ts div 1000` here).
    */
  private[graft] def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      case _ => raw.withColumn(
        "ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
    }
  }

  /** TPC-H Q1-style pricing summary: the flagship scan→filter→agg path.
    * Partial (map-side) aggregation + single shuffle on the 6-value group
    * key; the shipdate filter and 7-column projection push into the parquet
    * scan.
    */
  val q01PricingSummary: QuerySpec = QuerySpec.oracled(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) *
          (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Filter + projection (P11/P12 substrate): both reach the parquet scan as
    * PushedFilters/ReadSchema — a 3-column read, not a full-row scan.
    */
  val q02FilterProject: QuerySpec = QuerySpec.oracled(
    "q02_filter_project",
    """SELECT l_orderkey, l_linenumber, l_extendedprice
      |FROM lineitem
      |WHERE l_extendedprice > 48000
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (spark, dir) =>
    t(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .filter(col("l_extendedprice") > 48000)
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Multi-way join + agg (M4 substrate): revenue by nation. Dimension
    * tables (region, nation) are broadcast — no shuffle for the small sides;
    * the orders⋈lineitem join shuffles once on the order key.
    */
  val q03JoinAggNationRevenue: QuerySpec = QuerySpec.oracled(
    "q03_join_agg",
    """SELECT n.n_name,
      |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |GROUP BY n.n_name
      |ORDER BY n.n_name""".stripMargin) { (spark, dir) =>
    val l = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01 00:00:00").cast(TimestampType))
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    val r = t(spark, dir, "region")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("n_name")
  }

  /** Ranking window (top-k per group): row_number over a per-group sort —
    * one shuffle on the partition key, tie-broken deterministically.
    */
  val q04TopkPerGroup: QuerySpec = QuerySpec.oracled(
    "q04_topk_per_group",
    """SELECT o_orderpriority, CAST(rnk AS INTEGER) AS rnk, o_orderkey,
      |  o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      |  FROM orders) ranked
      |WHERE rnk <= 3
      |ORDER BY o_orderpriority, rnk""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(spark, dir, "orders")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("o_orderpriority", "rnk", "o_orderkey", "o_totalprice")
      .orderBy("o_orderpriority", "rnk")
  }

  /** Hierarchical aggregate (rollup): partial aggregation feeds all grouping
    * sets from one shuffle.
    */
  val q05Rollup: QuerySpec = QuerySpec.oracled(
    "q05_rollup",
    """SELECT o_orderstatus, o_orderpriority,
      |  count(*) AS n_orders,
      |  round(sum(o_totalprice), 2) AS sum_total
      |FROM orders
      |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin) {
    (spark, dir) =>
      t(spark, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("sum_total"))
        .orderBy(asc_nulls_first("o_orderstatus"),
          asc_nulls_first("o_orderpriority"))
  }

  /** Set operators (M5 substrate): INTERSECT / EXCEPT with SQL distinct
    * semantics.
    */
  val q06SetOps: QuerySpec = QuerySpec.oracled(
    "q06_set_ops",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderpriority LIKE '1%'
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
      |ORDER BY o_custkey""".stripMargin) { (spark, dir) =>
    val o = t(spark, dir, "orders")
    o.filter(col("o_orderstatus") === "F").select("o_custkey")
      .intersect(o.filter(col("o_orderpriority").startsWith("1"))
        .select("o_custkey"))
      .except(o.filter(col("o_orderstatus") === "P").select("o_custkey"))
      .orderBy("o_custkey")
  }

  /** Keyed keep-last upsert (M1+M2, ref: src/etl-utils.ts:289,319) through
    * the real [[graft.operators.Upsert]] operator: new batch beats snapshot
    * on PK collision, non-colliding rows from both sides survive.
    */
  val q07UpsertKeepLast: QuerySpec = QuerySpec.oracled(
    "q07_upsert_keep_last",
    """WITH old AS (
      |  SELECT o_orderkey, 'old' AS batch, o_totalprice
      |  FROM orders WHERE o_orderkey % 2 = 0),
      |fresh AS (
      |  SELECT o_orderkey, 'new' AS batch, o_totalprice
      |  FROM orders WHERE o_orderkey % 3 = 0),
      |merged AS (
      |  SELECT *, 0 AS pri FROM old
      |  UNION ALL
      |  SELECT *, 1 AS pri FROM fresh),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY o_orderkey
      |                               ORDER BY pri DESC) AS rn
      |  FROM merged)
      |SELECT o_orderkey, batch, o_totalprice FROM ranked WHERE rn = 1
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    val o = t(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice")
    val old = o.filter(col("o_orderkey") % 2 === 0)
      .withColumn("batch", lit("old"))
    val fresh = o.filter(col("o_orderkey") % 3 === 0)
      .withColumn("batch", lit("new"))
    Upsert.keepLast(old, fresh, Seq("o_orderkey"))
      .select("o_orderkey", "batch", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** Schema-drift union (M1, ref: src/etl-utils.ts:289): `unionByName` with
    * null-fill for side-missing columns ≙ DuckDB UNION ALL BY NAME.
    */
  val q08UnionByName: QuerySpec = QuerySpec.oracled(
    "q08_union_by_name",
    """SELECT o_orderkey, o_orderstatus, o_totalprice
      |FROM orders WHERE o_orderkey % 5 = 0
      |UNION ALL BY NAME
      |SELECT o_orderkey, o_orderpriority
      |FROM orders WHERE o_orderkey % 5 = 1
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    val o = t(spark, dir, "orders")
    val a = o.filter(col("o_orderkey") % 5 === 0)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val b = o.filter(col("o_orderkey") % 5 === 1)
      .select("o_orderkey", "o_orderpriority")
    a.unionByName(b, allowMissingColumns = true).orderBy("o_orderkey")
  }

  /** Cast matrix (P2/S2 lenient casting, ref: src/reader.ts:73-81,
    * src/etl-utils.ts:307-309): explicit rounding before narrowing (Spark
    * truncates double→int, DuckDB rounds — the operator pins the semantics),
    * try_cast null on failure.
    */
  val q09CastMatrix: QuerySpec = QuerySpec.oracled(
    "q09_cast_matrix",
    """SELECT l_orderkey, l_linenumber,
      |  CAST(l_linenumber AS BIGINT) AS ln_long,
      |  CAST(l_orderkey AS VARCHAR) AS ok_str,
      |  CAST(round(l_quantity) AS BIGINT) AS qty_int,
      |  TRY_CAST(l_returnflag AS INTEGER) AS rf_int,
      |  strftime(l_shipdate, '%Y-%m-%d') AS ship_day,
      |  l_quantity > 25 AS qty_gt25
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (spark, dir) =>
    t(spark, dir, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_linenumber").cast(LongType).as("ln_long"),
        col("l_orderkey").cast(StringType).as("ok_str"),
        round(col("l_quantity")).cast(LongType).as("qty_int"),
        expr("try_cast(l_returnflag AS INT)").as("rf_int"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"),
        (col("l_quantity") > 25).as("qty_gt25"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** String→timestamp parsing with format fallback (P3/S3,
    * ref: src/reader.ts:111-128): full-datetime and date-only inputs through
    * the same lenient coalesce chain.
    */
  val q10ParseDates: QuerySpec = QuerySpec.oracled(
    "q10_parse_dates",
    """SELECT o_orderkey,
      |  strftime(strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
      |           '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS rt_full,
      |  strftime(strptime(strftime(o_orderdate, '%Y-%m-%d'),
      |           '%Y-%m-%d'), '%Y-%m-%d %H:%M:%S') AS rt_dateonly
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    def parseChain(c: org.apache.spark.sql.Column) = coalesce(
      try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss.SSSSSS")),
      try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss")),
      try_to_timestamp(c, lit("yyyy-MM-dd")))
    t(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        date_format(
          parseChain(date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss")),
          "yyyy-MM-dd HH:mm:ss").as("rt_full"),
        date_format(
          parseChain(date_format(col("o_orderdate"), "yyyy-MM-dd")),
          "yyyy-MM-dd HH:mm:ss").as("rt_dateonly"))
      .orderBy("o_orderkey")
  }

  /** ISO-8601 µs formatting before Singer export (P4,
    * ref: src/singer.ts:63-73 strftime "%Y-%m-%dT%H:%M:%S.%fZ").
    */
  val q11IsoFormat: QuerySpec = QuerySpec.oracled(
    "q11_iso_format",
    """SELECT o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S.%fZ') AS iso_ts
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    t(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
          .as("iso_ts"))
      .orderBy("o_orderkey")
  }

  /** JSON-string column extraction (P6, ref: src/singer.ts:208-219
    * parseObjs): schema-driven `get_json_object` instead of per-value JS
    * parse — stays in codegen, no row materialization.
    */
  val q12JsonExtract: QuerySpec = QuerySpec.oracled(
    "q12_json_extract",
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
      |FROM events
      |ORDER BY event_id""".stripMargin) { (spark, dir) =>
    events(spark, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k_val"))
      .orderBy("event_id")
  }

  /** Struct→JSON string (P5/S7, ref: src/etl-utils.ts:88-90
    * struct.jsonEncode): `to_json(struct(...))`, key order = field order.
    */
  val q13ToJsonStruct: QuerySpec = QuerySpec.oracled(
    "q13_to_json_struct",
    """SELECT o_orderkey,
      |  CAST(to_json(struct_pack(
      |    o_orderkey := o_orderkey,
      |    o_orderstatus := o_orderstatus,
      |    o_orderpriority := o_orderpriority)) AS VARCHAR) AS payload
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    t(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        to_json(struct(col("o_orderkey"), col("o_orderstatus"),
          col("o_orderpriority"))).as("payload"))
      .orderBy("o_orderkey")
  }

  /** Null semantics (P9-adjacent): nullif/coalesce and null-aware counting.
    *
    * `filled_sum_cents` accumulates DECIMAL(18,6), not DOUBLE: a double
    * sum's partial-aggregation order differs between Spark's 32-way partials
    * and the oracle's sequential scan, and a true sum near a half-cent
    * boundary then rounds differently per engine. Decimal addition is exact,
    * so the sum is order-independent; `value` carries 2 decimal digits, so
    * the DECIMAL(18,6) cast is itself tie-free. The output is BIGINT cents,
    * not DOUBLE, and every integer aggregate in the oracle SQL is CAST to
    * BIGINT: DuckDB types a bare integer `sum()` as HUGEINT (int128) where
    * Spark produces BIGINT, and the driver's hash is TYPE-sensitive — the
    * r1–r4 reds on this query were exactly that (values identical, declared
    * result type divergent), not float canonicalization.
    */
  val q14NullHandling: QuerySpec = QuerySpec.oracled(
    "q14_null_handling",
    """SELECT event_type,
      |  count(*) AS n_rows,
      |  count(nullif(user_id % 10, 0)) AS n_nonnull,
      |  CAST(sum(CASE WHEN user_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
      |  CAST(round(sum(CAST(coalesce(nullif(value, 0.0), -1.0)
      |    AS DECIMAL(18,6))) * 100, 0) AS BIGINT) AS filled_sum_cents
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (spark, dir) =>
    events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(expr("nullif(user_id % 10, 0)")).as("n_nonnull"),
        sum(when(col("user_id") % 10 === 0, 1).otherwise(0)).as("n_zero"),
        round(sum(expr(
          "CAST(coalesce(nullif(value, 0.0d), -1.0d) AS DECIMAL(18,6))"))
          * 100, 0).cast("bigint").as("filled_sum_cents"))
      .orderBy("event_type")
  }

  /** Exact group dedup: canonical (min-id) representative per key — the
    * deterministic form of `dropDuplicates` (SURVEY §2.6 dedup substrate).
    */
  val q15DedupExact: QuerySpec = QuerySpec.oracled(
    "q15_dedup_exact",
    """SELECT lang, source,
      |  min(doc_id) AS canonical_id,
      |  count(*) AS group_size
      |FROM documents
      |GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin) { (spark, dir) =>
    t(spark, dir, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(
        min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("group_size"))
      .orderBy("lang", "source")
  }

  /** Semi/anti joins (EXISTS / NOT EXISTS substrate): customers with urgent
    * open orders but no finished ones.
    */
  val q32SemiAntiJoin: QuerySpec = QuerySpec.oracled(
    "q32_semi_anti_join",
    """SELECT c_custkey, c_mktsegment FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_orderpriority = '1-URGENT')
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
    c.join(o.filter(col("o_orderpriority") === "1-URGENT"),
        c("c_custkey") === o("o_custkey"), "left_semi")
      .join(o.filter(col("o_orderstatus") === "F"),
        c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** Full grouping-set lattice (cube) with grouping ids. */
  val q33Cube: QuerySpec = QuerySpec.oracled(
    "q33_cube",
    """SELECT l_returnflag, l_linestatus,
      |  count(*) AS n,
      |  round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin) {
    (spark, dir) =>
      t(spark, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"),
          asc_nulls_first("l_linestatus"))
  }

  /** DISTINCT + total order + LIMIT: the sort/limit substrate — Spark plans
    * a TakeOrderedAndProject (no full result materialization).
    */
  val q34DistinctLimit: QuerySpec = QuerySpec.oracled(
    "q34_distinct_limit",
    """SELECT DISTINCT o_orderpriority, o_orderstatus
      |FROM orders
      |ORDER BY o_orderpriority, o_orderstatus
      |LIMIT 7""".stripMargin) { (spark, dir) =>
    t(spark, dir, "orders")
      .select("o_orderpriority", "o_orderstatus")
      .distinct()
      .orderBy("o_orderpriority", "o_orderstatus")
      .limit(7)
  }

  /** Scalar function matrix (string/math substrate): engine-portable subset
    * (sqrt/abs/floor are IEEE-exact; no libm-dependent transcendentals).
    */
  val q35ScalarFuncs: QuerySpec = QuerySpec.oracled(
    "q35_scalar_funcs",
    """SELECT p_partkey,
      |  upper(p_name) AS name_up,
      |  substr(p_name, 1, 5) AS name5,
      |  replace(p_type, ' ', '_') AS type_u,
      |  CAST(length(p_brand) AS BIGINT) AS brand_len,
      |  abs(p_size - 25) AS size_dev,
      |  CAST(floor(sqrt(p_retailprice)) AS BIGINT) AS sqrt_floor,
      |  concat(p_brand, ':', p_type) AS brand_type
      |FROM part
      |ORDER BY p_partkey""".stripMargin) { (spark, dir) =>
    t(spark, dir, "part").select(
      col("p_partkey"),
      upper(col("p_name")).as("name_up"),
      substring(col("p_name"), 1, 5).as("name5"),
      regexp_replace(col("p_type"), " ", "_").as("type_u"),
      length(col("p_brand")).cast(LongType).as("brand_len"),
      abs(col("p_size") - 25).as("size_dev"),
      floor(sqrt(col("p_retailprice"))).cast(LongType).as("sqrt_floor"),
      concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"))
      .orderBy("p_partkey")
  }

  /** Window frames: running total (ROWS unbounded-preceding) and a 30-day
    * RANGE frame over an integer day column.
    */
  val q36WindowFrames: QuerySpec = QuerySpec.oracled(
    "q36_window_frames",
    """WITH o AS (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(epoch_us(o_orderdate) / 86400000000 AS BIGINT) AS day
      |  FROM orders)
      |SELECT o_custkey, o_orderkey,
      |  round(sum(o_totalprice) OVER (
      |    PARTITION BY o_custkey ORDER BY day, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
      |    AS running_total,
      |  count(*) OVER (
      |    PARTITION BY o_custkey ORDER BY day
      |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS n_last_30d
      |FROM o
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (spark, dir) =>
    val o = t(spark, dir, "orders").select(
      col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
      expr("CAST(unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV " +
        "86400000000 AS BIGINT)").as("day"))
    val wRows = Window.partitionBy("o_custkey")
      .orderBy(col("day"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRange = Window.partitionBy("o_custkey")
      .orderBy(col("day"))
      .rangeBetween(-30, Window.currentRow)
    o.select(
      col("o_custkey"), col("o_orderkey"),
      round(sum("o_totalprice").over(wRows), 2).as("running_total"),
      count(lit(1)).over(wRange).as("n_last_30d"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Exact interpolated percentiles (median / p90) per group. */
  val q37Percentiles: QuerySpec = QuerySpec.oracled(
    "q37_percentiles",
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
      |  round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
      |  round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 6).as("median_qty"),
        round(expr("percentile(l_quantity, 0.9)"), 6).as("p90_qty"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4)
          .as("median_price"))
      .orderBy("l_returnflag")
  }

  /** Approximate-percentile twin of [[q37Percentiles]] — the form a user
    * actually runs at 100 TB: `approx_percentile` (Greenwald-Khanna) is
    * one pass with fixed-size mergeable map-side sketches, where the exact
    * `percentile` must gather every value per group. DuckDB's t-digest is
    * a different sketch, so the estimate itself cannot be replayed;
    * instead (the q56 pattern) the query emits the EXACT percentiles plus
    * a BOOLEAN claiming the estimate lands within 1% relative, and the
    * oracle recomputes the exact values and expects TRUE — the error bound
    * is adjudicated as a hard row. GK with accuracy 10000 is rank-error
    * ≤ N/10000, far inside 1% value error on these distributions, and
    * deterministic for fixed input.
    */
  val q59PercentilesApprox: QuerySpec = QuerySpec.oracled(
    "q59_percentiles_approx",
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.5), 4)
      |    AS exact_median_price,
      |  round(quantile_cont(l_extendedprice, 0.99), 4) AS exact_p99_price,
      |  TRUE AS approx_within_1pct
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 4)
          .as("exact_median_price"),
        round(expr("percentile(l_extendedprice, 0.99)"), 4)
          .as("exact_p99_price"),
        expr("approx_percentile(l_extendedprice, array(0.5D, 0.99D), 10000)")
          .as("__ap"))
      .select(col("l_returnflag"),
        col("exact_median_price"), col("exact_p99_price"),
        (abs(element_at(col("__ap"), 1) - col("exact_median_price")) <=
          col("exact_median_price") * 0.01 &&
          abs(element_at(col("__ap"), 2) - col("exact_p99_price")) <=
            col("exact_p99_price") * 0.01).as("approx_within_1pct"))
      .orderBy("l_returnflag")
  }

  private val q61Staging = new QuerySpec.StagingCache[(String, String)]

  /** Stage lineitem + orders as bucketed-by-orderkey external tables
    * (once per sf dir, untimed in Bench via the setup hook). Table names
    * carry the dir digest so two sf dirs in one JVM never alias.
    */
  private def ensureBucketed(
      spark: SparkSession, dir: String): (String, String) =
    q61Staging.getOrStage(dir) {
      val lp = QuerySpec.stagedPath("q61_bucketed_lineitem", dir)
      val op = QuerySpec.stagedPath("q61_bucketed_orders", dir)
      val dig = lp.split('_').last
      val (lt, ot) = (s"graft_q61_lineitem_$dig", s"graft_q61_orders_$dig")
      graft.ext.Bucketing.writeBucketed(
        t(spark, dir, "lineitem"), "l_orderkey", 8, lp, lt)
      graft.ext.Bucketing.writeBucketed(
        t(spark, dir, "orders"), "o_orderkey", 8, op, ot)
      (lt, ot)
    }

  /** Co-located join over bucketed tables ([[graft.ext.Bucketing]]): both
    * sides are pre-bucketed on the join key, so the join itself runs with
    * NO exchange on either side — the shuffle was paid once at write time.
    * This is the layout a 100 TB fact-to-fact join runs on; the oracle
    * only checks values (DuckDB has no bucket notion), BucketedJoinSpec
    * pins the shuffle-free plan shape.
    */
  val q61BucketedJoin: QuerySpec = QuerySpec.oracled(
    "q61_bucketed_join",
    """SELECT o_orderpriority,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
    val (lt, ot) = ensureBucketed(spark, dir)
    val l = spark.table(lt)
    val o = spark.table(ot)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("o_orderpriority")
  }.withSetup((spark, dir) => { ensureBucketed(spark, dir); () })

  /** Pivot (wide aggregation): explicit value list keeps the plan
    * single-pass (no distinct-values pre-query) — the form that scales.
    */
  val q39Pivot: QuerySpec = QuerySpec.oracled(
    "q39_pivot",
    """SELECT l_returnflag,
      |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F,
      |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(round(sum(col("l_quantity")), 2))
      .orderBy("l_returnflag")
  }

  /** GROUPING SETS (the general form of rollup/cube, q05/q33): three
    * explicit grouping sets in ONE pass — Catalyst expands them via a
    * single Expand node feeding one partial-aggregated shuffle, so adding
    * a set costs a row-multiplier, never a rescan. `grouping_id` keys which
    * set a row belongs to; both engines bit-order it left-to-right over the
    * listed columns (reference has no grouping sets — relational substrate,
    * SURVEY §2.6).
    */
  val q110GroupingSets: QuerySpec = QuerySpec.oracled(
    "q110_grouping_sets",
    """SELECT
      |  CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |  coalesce(l_returnflag, '*') AS rflag,
      |  coalesce(l_linestatus, '*') AS lstatus,
      |  count(*) AS n,
      |  round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
      |                        (l_linestatus), ())
      |ORDER BY gid, rflag, lstatus""".stripMargin) { (spark, dir) =>
    t(spark, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
      .select(col("gid"),
        coalesce(col("l_returnflag"), lit("*")).as("rflag"),
        coalesce(col("l_linestatus"), lit("*")).as("lstatus"),
        col("n"), col("sum_qty"))
      .orderBy("gid", "rflag", "lstatus")
  }

  /** Window distribution functions (percent_rank / cume_dist) — the last
    * window family q36's frames and q04's rank don't cover. The ORDER BY
    * key is made unique (price, then key) so rank has no peer groups and
    * both fractions are ratios of identical integers; the single division
    * is correctly rounded identically in both engines (q68's discipline).
    * One shuffle on the partition key; per-partition state is a sort.
    */
  val q111WindowDistribution: QuerySpec = QuerySpec.oracled(
    "q111_window_distribution",
    """SELECT o_orderkey, o_orderpriority,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cume
      |FROM orders
      |WHERE o_orderstatus = 'F'
      |WINDOW w AS (PARTITION BY o_orderpriority
      |             ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy("o_orderpriority")
      .orderBy("o_totalprice", "o_orderkey")
    t(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderpriority"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy("o_orderkey")
  }

  /** Top-k per group via the k-bounded native aggregate
    * ([[graft.functions.TopKAgg]]) — the scale form of q04's window rank:
    * each partial holds ≤ k pairs and partials merge by keeping the best
    * k, so the shuffle carries k rows per group per partition instead of
    * every row of every group (at 100 TB the window form's shuffle is
    * the whole table). Deterministic total order (cents desc, id asc)
    * makes the result layout-independent; TopKAggSpec pins parity with
    * the window formulation across partitionings, and the oracle IS the
    * window formulation.
    */
  val q126TopkAggregate: QuerySpec = QuerySpec.oracled(
    "q126_topk_aggregate",
    """WITH c AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
      |    event_id
      |  FROM events WHERE value IS NOT NULL),
      |r AS (
      |  SELECT event_type, cents, event_id,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY cents DESC, event_id) AS rk
      |  FROM c)
      |SELECT event_type, CAST(rk AS INTEGER) AS rk, cents, event_id
      |FROM r WHERE rk <= 3
      |ORDER BY event_type, rk""".stripMargin) { (spark, dir) =>
    graft.functions.VectorExpressions.register(spark)
    events(spark, dir)
      // the aggregate skips null ranks by contract; the oracle's window
      // would RANK null cents (NULLS LAST still get row_numbers), so
      // both sides exclude them explicitly
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"),
        col("event_id"))
      .groupBy("event_type")
      .agg(expr("graft_top_k(cents, event_id, 3)").as("top"))
      .select(col("event_type"), posexplode(col("top")))
      .select(col("event_type"), (col("pos") + 1).as("rk"),
        col("col.rank_val").as("cents"), col("col.id").as("event_id"))
      .orderBy("event_type", "rk")
  }

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    * MATCH each other instead of vanishing — the semantics a dimension
    * lookup with an explicit "unknown" bucket needs (a plain equi-join
    * silently drops every NULL fact row; the null-safe form routes them
    * to the NULL dim row). Spark plans `<=>` as a hash join on the
    * null-safe key wrapper, so it shuffles like any equi-join — no
    * nested loop. The %-7 nullif plants a NULL key population.
    */
  val q129NullsafeJoin: QuerySpec = QuerySpec.oracled(
    "q129_nullsafe_join",
    """WITH l AS (
      |  SELECT nullif(user_id % 7, 3) AS k, count(*) AS n
      |  FROM events GROUP BY 1),
      |d (k, label) AS (VALUES
      |  (0::BIGINT, 'zero'), (1::BIGINT, 'one'), (2::BIGINT, 'two'),
      |  (CAST(NULL AS BIGINT), 'unknown'))
      |SELECT coalesce(l.k, -1) AS k_out, d.label, l.n
      |FROM l LEFT JOIN d ON l.k IS NOT DISTINCT FROM d.k
      |ORDER BY k_out""".stripMargin) { (spark, dir) =>
    val l = events(spark, dir)
      .select(expr("nullif(user_id % 7, 3)").as("k"))
      .groupBy("k").agg(count(lit(1)).as("n"))
    val d = spark.sql(
      """SELECT * FROM VALUES
        |  (CAST(0 AS BIGINT), 'zero'), (CAST(1 AS BIGINT), 'one'),
        |  (CAST(2 AS BIGINT), 'two'), (CAST(NULL AS BIGINT), 'unknown')
        |  AS t(k, label)""".stripMargin)
    l.join(d, l("k") <=> d("k"), "left")
      .select(coalesce(l("k"), lit(-1L)).as("k_out"), d("label"), l("n"))
      .orderBy("k_out")
  }

  val all: Seq[QuerySpec] = Seq(
    q39Pivot, q110GroupingSets, q111WindowDistribution, q126TopkAggregate,
    q129NullsafeJoin,
    q01PricingSummary, q02FilterProject, q03JoinAggNationRevenue,
    q04TopkPerGroup, q05Rollup, q06SetOps, q07UpsertKeepLast,
    q08UnionByName, q09CastMatrix, q10ParseDates, q11IsoFormat,
    q12JsonExtract, q13ToJsonStruct, q14NullHandling, q15DedupExact,
    q32SemiAntiJoin, q33Cube, q34DistinctLimit, q35ScalarFuncs,
    q36WindowFrames, q37Percentiles, q59PercentilesApprox,
    q61BucketedJoin)
}
