package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational substrate at warehouse shape: multi-way star joins, exact
  * distributed quantile binning, and z-order data clustering. These are the
  * query shapes a user of the reference's Polars surface grows into once the
  * data no longer fits one machine; each docstring carries the 100 TB plan
  * argument.
  */
object RelationalQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** TPC-H Q5-style five-way star join: revenue per nation for one region
    * and one order year, with the co-nation constraint between customer and
    * supplier. The 100 TB plan: lineitem⋈orders is the only big-big join
    * (one shuffle on the order key, AQE-splittable); customer, supplier,
    * nation, and region are dimension tables and broadcast — the fact table
    * never moves for them. Catalyst pushes the region/date filters below
    * the joins, so the orders scan reads one year and the nation/region
    * broadcast is 5 rows. Revenue accumulates in DECIMAL(18,6) (exact,
    * order-independent addition — the q14 lesson) and is emitted as BIGINT
    * cents so the gate hash is canonicalization-proof.
    */
  val q71StarJoin: QuerySpec = QuerySpec.oracled(
    "q71_star_join",
    """SELECT n_name,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) *
      |                 (1 - CAST(l_discount AS DECIMAL(18,6)))) * 100)
      |    AS BIGINT) AS revenue_cents,
      |  count(*) AS n_lines
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name
      |ORDER BY revenue_cents DESC, n_name""".stripMargin) { (spark, dir) =>
    val customer = t(spark, dir, "customer")
    val orders = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("o_orderdate") < lit("1997-01-01").cast(TimestampType))
    val lineitem = t(spark, dir, "lineitem")
    val supplier = t(spark, dir, "supplier")
    val nation = t(spark, dir, "nation")
    val region = t(spark, dir, "region").filter(col("r_name") === "ASIA")

    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("c_custkey") === col("o_custkey"))
      .join(broadcast(supplier),
        col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(
        round(sum(col("l_extendedprice").cast(DecimalType(18, 6)) *
          (lit(1) - col("l_discount").cast(DecimalType(18, 6)))) * 100)
          .cast(LongType).as("revenue_cents"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("revenue_cents").desc, col("n_name"))
  }

  /** SQL-exact ntile bucket for 0-based global index `idx` of `n` rows into
    * `k` buckets: the first `n % k` buckets hold one extra row.
    */
  private[graft] def ntileBucket(idx: Long, n: Long, k: Int): Int = {
    val q = n / k
    val r = n % k
    val cut = r * (q + 1)
    val b = if (idx < cut) idx / (q + 1) else r + (idx - cut) / q
    b.toInt + 1
  }

  /** Equi-depth decile binning with DISTRIBUTED exact ntile. The oracle is
    * `ntile(10) OVER (ORDER BY ...)`; a literal Spark translation is a
    * window with no PARTITION BY — every row through ONE task, the
    * canonical scale-killer. Instead: `orderBy` (range-partitioned sort —
    * sampled boundaries, parallel partitions) + `zipWithIndex` (computes
    * global offsets from per-partition counts without collapsing them) +
    * the closed-form ntile bucket formula per row. Bit-identical to the
    * single-partition window at any partition count, and every stage stays
    * parallel at 100 TB. Bin edges are emitted as exact integer cents.
    */
  val q74EquidepthBins: QuerySpec = QuerySpec.oracled(
    "q74_equidepth_bins",
    """WITH b AS (
      |  SELECT o_orderkey, o_totalprice,
      |    ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
      |  FROM orders)
      |SELECT CAST(bin AS INTEGER) AS bin, count(*) AS n_orders,
      |  CAST(round(min(o_totalprice) * 100) AS BIGINT) AS min_cents,
      |  CAST(round(max(o_totalprice) * 100) AS BIGINT) AS max_cents
      |FROM b GROUP BY bin ORDER BY bin""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val src = t(spark, dir, "orders")
      .select(col("o_orderkey").cast(LongType), col("o_totalprice"))
    val n = src.count() // parquet count-star: metadata-only, no row scan
    val sorted = src.orderBy(col("o_totalprice"), col("o_orderkey"))
    val binned = sorted.as[(Long, Double)].rdd.zipWithIndex
      .map { case ((key, price), idx) =>
        (ntileBucket(idx, n, 10), key, price)
      }
      .toDF("bin", "o_orderkey", "o_totalprice")
    binned
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(min(col("o_totalprice")) * 100).cast(LongType).as("min_cents"),
        round(max(col("o_totalprice")) * 100).cast(LongType).as("max_cents"))
      .orderBy("bin")
  }

  /** Canonical implementation lives in [[graft.ext.ZOrder]]; kept as a
    * named alias because RelationalSpec pins it against a reference
    * interleave independently of ZOrderSpec.
    */
  def zOrderKey(x: org.apache.spark.sql.Column,
      y: org.apache.spark.sql.Column, bits: Int): org.apache.spark.sql.Column =
    graft.ext.ZOrder.interleave2(x, y, bits)

  private def zOrderSqlTerms(bits: Int): String =
    graft.ext.ZOrder.interleave2SqlDuck("x", "y", bits)

  /** Z-order clustering key over (part, supplier): bucketing rows by Morton
    * key keeps BOTH dimensions locally bounded per bucket (the min/max
    * columns prove it: each 1024-key bucket spans a 32×32 tile of the
    * 256×256 key space). At 100 TB this is the data-layout play: write
    * sorted by zkey (`repartitionByRange(zkey)` + sortWithinPartitions) and
    * parquet min/max stats prune file reads for predicates on EITHER
    * dimension — a linear sort can only serve one. The layout itself is
    * [[graft.ext.ZOrder.writeZOrdered]]: ZOrderSpec proves the file-level
    * pruning, q163 reads a staged z-ordered layout end-to-end, and this
    * query pins the key arithmetic cross-engine.
    */
  val q76ZOrder: QuerySpec = QuerySpec.oracled(
    "q76_zorder",
    s"""WITH z AS (
       |  SELECT (l_partkey % 256) AS x, (l_suppkey % 256) AS y
       |  FROM lineitem),
       |k AS (SELECT x, y, (${zOrderSqlTerms(8)}) AS zkey FROM z)
       |SELECT zkey // 1024 AS zbucket, count(*) AS n_rows,
       |  min(x) AS min_x, max(x) AS max_x,
       |  min(y) AS min_y, max(y) AS max_y
       |FROM k GROUP BY zbucket ORDER BY zbucket""".stripMargin) {
    (spark, dir) =>
      t(spark, dir, "lineitem")
        .select((col("l_partkey") % 256).as("x"), (col("l_suppkey") % 256).as("y"))
        .withColumn("zkey", zOrderKey(col("x"), col("y"), 8))
        .withColumn("zbucket", expr("zkey div 1024"))
        .groupBy(col("zbucket"))
        .agg(
          count(lit(1)).as("n_rows"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"))
        .orderBy("zbucket")
  }

  /** The q71 fact-fact join rewritten through [[graft.ext.Skew.saltedJoin]]:
    * lineitem rows salt on their PK, orders replicate 4×, and the hot-key
    * join spreads over 4 tasks per key. The oracle is the PLAIN join —
    * salting is result-invariant by construction, which is exactly what
    * the gate adjudicates. (On real skew, AQE's skew-join split is the
    * first tool; explicit salting is for keys a partition split cannot
    * separate — see Skew's scaladoc.)
    */
  val q79SaltedJoin: QuerySpec = QuerySpec.oracled(
    "q79_salted_join",
    """SELECT o_orderstatus,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) *
      |                 (1 - CAST(l_discount AS DECIMAL(18,6)))) * 100)
      |    AS BIGINT) AS revenue_cents,
      |  count(*) AS n_lines
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) {
    (spark, dir) =>
      graft.ext.Skew.saltedJoin(
        t(spark, dir, "lineitem"),
        t(spark, dir, "orders"),
        leftKey = col("l_orderkey"), rightKey = col("o_orderkey"),
        saltFrom = concat_ws("#", col("l_orderkey"), col("l_linenumber")),
        s = 4)
        .groupBy(col("o_orderstatus"))
        .agg(
          round(sum(col("l_extendedprice").cast(DecimalType(18, 6)) *
            (lit(1) - col("l_discount").cast(DecimalType(18, 6)))) * 100)
            .cast(LongType).as("revenue_cents"),
          count(lit(1)).as("n_lines"))
        .orderBy("o_orderstatus")
  }

  /** Point-in-interval join ([[graft.ext.RangeJoin]]): count all orders
    * falling inside each sampled customer's 90-day first-order window.
    * The naive form is a theta join (broadcast nested loop — dead at
    * scale); bucket decomposition shuffles both sides ONCE on an integer
    * 30-day bucket key and filters containment inside the bucket. LEFT
    * semantics keep point-free intervals at count 0. Positions are
    * epoch-day integers; the oracle replays the plain theta join.
    */
  val q90IntervalJoin: QuerySpec = QuerySpec.oracled(
    "q90_interval_join",
    """WITH iv AS (
      |  SELECT o_custkey AS owner,
      |    min(o_orderdate) AS lo,
      |    min(o_orderdate) + INTERVAL 90 DAY AS hi
      |  FROM orders WHERE o_custkey % 100 = 0 GROUP BY o_custkey),
      |pts AS (SELECT o_orderkey, o_orderdate AS t FROM orders)
      |SELECT iv.owner, strftime(iv.lo, '%Y-%m-%d') AS lo_day,
      |  count(pts.o_orderkey) AS n_inside
      |FROM iv LEFT JOIN pts ON pts.t >= iv.lo AND pts.t < iv.hi
      |GROUP BY iv.owner, iv.lo ORDER BY iv.owner""".stripMargin) {
    (spark, dir) =>
      val orders = t(spark, dir, "orders")
      val iv = orders.filter(col("o_custkey") % 100 === 0)
        .groupBy(col("o_custkey").as("owner"))
        .agg(min(unix_date(to_date(col("o_orderdate")))).as("lo"))
        .withColumn("hi", col("lo") + 90)
      val pts = orders.select(col("o_orderkey"),
        unix_date(to_date(col("o_orderdate"))).as("t"))
      graft.ext.RangeJoin.pointInInterval(
          iv, "lo", "hi", pts, "t", bucketWidth = 30, how = "left")
        .groupBy(col("owner"), col("lo"))
        .agg(count(col("o_orderkey")).as("n_inside"))
        .select(col("owner"),
          date_format(date_add(lit("1970-01-01").cast("date"),
            col("lo").cast("int")), "yyyy-MM-dd").as("lo_day"),
          col("n_inside"))
        .orderBy("owner")
  }

  /** Bloom-pruned fact-dim join ([[graft.ext.BloomPrune]]): urgent-order
    * revenue by return flag, with the lineitem scan pre-filtered by a
    * bloom sketch of the urgent order keys BEFORE the join shuffle. The
    * sketch admits false positives (killed by the exact join) and no
    * false negatives, so the oracle is the PLAIN join — result-invariance
    * is exactly what the gate adjudicates; BloomPruneSpec additionally
    * pins the pruning ratio. At 100 TB the ~20% priority selectivity cuts
    * the fact-side shuffle ~5×; the probe runs inside the scan's codegen
    * stage.
    */
  val q96BloomJoin: QuerySpec = QuerySpec.oracled(
    "q96_bloom_join",
    """SELECT l_returnflag,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) *
      |                 (1 - CAST(l_discount AS DECIMAL(18,6)))) * 100)
      |    AS BIGINT) AS revenue_cents,
      |  count(*) AS n_lines
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
    (spark, dir) =>
      val urgent = t(spark, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val pruned = graft.ext.BloomPrune.filterByDim(
        t(spark, dir, "lineitem"), "l_orderkey", urgent, "o_orderkey")
      pruned.join(urgent, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(
          round(sum(col("l_extendedprice").cast(DecimalType(18, 6)) *
            (lit(1) - col("l_discount").cast(DecimalType(18, 6)))) * 100)
            .cast(LongType).as("revenue_cents"),
          count(lit(1)).as("n_lines"))
        .orderBy("l_returnflag")
  }

  /** Adaptive (hot-key-only) salted join: the q79 pattern in its
    * production form. Skew is PLANTED (2% of lineitem rows collapse onto
    * key 0 — a hot key two orders of magnitude above the rest);
    * [[graft.ext.Skew.heavyKeys]] detects it with the Misra–Gries sketch
    * + exact verify (k-bounded shuffle, never a full-keyspace groupBy),
    * and [[graft.ext.Skew.adaptiveSaltedJoin]] salts ONLY that key —
    * cold keys pay nothing, vs blanket salting's |right|×s replication.
    * Detection affects performance only, never rows (any hot set gives
    * the identical join), so the oracle adjudicates the plain join.
    */
  val q101AdaptiveSkewJoin: QuerySpec = QuerySpec.oracled(
    "q101_adaptive_skew_join",
    """WITH f AS (
      |  SELECT CASE WHEN l_orderkey % 50 = 0 THEN 0 ELSE l_orderkey END
      |      AS fkey,
      |    l_returnflag
      |  FROM lineitem),
      |d AS (
      |  SELECT CASE WHEN o_orderkey % 50 = 0 THEN 0 ELSE o_orderkey END
      |      AS dkey,
      |    count(*) AS n_orders
      |  FROM orders GROUP BY 1)
      |SELECT l_returnflag, count(*) AS n_lines,
      |  CAST(sum(n_orders) AS BIGINT) AS weight_sum
      |FROM f JOIN d ON fkey = dkey
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
    (spark, dir) =>
      val hotCase = (k: org.apache.spark.sql.Column) =>
        when(k % 50 === 0, 0L).otherwise(k)
      val f = t(spark, dir, "lineitem")
        .select(hotCase(col("l_orderkey")).as("fkey"), col("l_returnflag"),
          col("l_orderkey"), col("l_linenumber"))
      val d = t(spark, dir, "orders")
        .select(hotCase(col("o_orderkey")).as("dkey"))
        .groupBy("dkey").agg(count(lit(1)).as("n_orders"))
      val hot = graft.ext.Skew.heavyKeys(f, col("fkey"), minShare = 0.01)
      graft.ext.Skew.adaptiveSaltedJoin(
          f, d, col("fkey"), col("dkey"),
          saltFrom = concat_ws("#", col("l_orderkey"), col("l_linenumber")),
          s = 8, hotKeys = hot)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("n_orders")).as("weight_sum"))
        .orderBy("l_returnflag")
  }

  /** Global total-order rank of a fact table, decimated to every 100th
    * row. The oracle is a bare `row_number() OVER (ORDER BY ...)` — whose
    * literal Spark translation is the no-PARTITION-BY window that drags
    * every row through ONE task. This query instead reuses q74's
    * distributed-rank shape: `orderBy` (sampled RangePartitioning — each
    * partition sorts a disjoint key range in parallel) + `zipWithIndex`
    * (global offsets from per-partition counts, no collapse), then the
    * `rank % 100` decimation filters map-side. Bit-identical to the
    * single-partition window at any partition count; every stage stays
    * parallel at 100 TB. The sort key is made unique (price, key) so rank
    * and decimation are deterministic.
    */
  val q120GlobalSort: QuerySpec = QuerySpec.oracled(
    "q120_global_sort",
    """SELECT rk, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderkey, o_totalprice,
      |    row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rk
      |  FROM orders)
      |WHERE rk % 100 = 0
      |ORDER BY rk""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    t(spark, dir, "orders")
      .select(col("o_orderkey").cast(LongType), col("o_totalprice"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
      .as[(Long, Double)].rdd.zipWithIndex
      .flatMap { case ((key, price), idx) =>
        val rk = idx + 1
        if (rk % 100 == 0) Some((rk, key, price)) else None
      }
      .toDF("rk", "o_orderkey", "o_totalprice")
      .orderBy("rk")
  }

  /** Frequent-pair mining (market basket) with APRIORI pruning: parts
    * co-ordered in ≥ 3 baskets, with each pair's support and both
    * singleton supports (lift-ready). The scale discipline is the prune
    * ORDER: singleton supports come first (one map-side-combinable
    * aggregate), parts below minsup are dropped BEFORE the pair explode —
    * by the apriori property no frequent pair can contain an infrequent
    * part, so the prune is lossless — and only then does the per-basket
    * self-join run, whose fan-out is basket²/2 (baskets are small and
    * bounded: max 13 parts here; a hot-basket cap would be the production
    * guard). The frequent-part set joins in as a broadcast semi-join
    * (frequency tables are ≪ facts at any scale). Everything else is
    * integer counting.
    */
  val q164FrequentPairs: QuerySpec = QuerySpec.oracled(
    "q164_frequent_pairs",
    """WITH b AS (
      |  SELECT DISTINCT l_orderkey AS ord, l_partkey AS part
      |  FROM lineitem),
      |s AS (SELECT part, count(*) AS sup FROM b GROUP BY 1),
      |f AS (SELECT part, sup FROM s WHERE sup >= 3),
      |bf AS (
      |  SELECT b.ord, b.part, f.sup FROM b JOIN f USING (part)),
      |p AS (
      |  SELECT a.part AS part_a, c.part AS part_b,
      |    max(a.sup) AS sup_a, max(c.sup) AS sup_b,
      |    count(*) AS sup_ab
      |  FROM bf a JOIN bf c ON a.ord = c.ord AND a.part < c.part
      |  GROUP BY 1, 2)
      |SELECT part_a, part_b, sup_ab, sup_a, sup_b FROM p
      |WHERE sup_ab >= 3
      |ORDER BY part_a, part_b""".stripMargin) { (spark, dir) =>
    val b = t(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ord"), col("l_partkey").as("part"))
      .distinct()
    val freq = b.groupBy("part").agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= 3)
    val bf = b.join(broadcast(freq), "part")
    // r9 (guide §2.4/§3): the per-basket pair explode used to be a bf⋈bf
    // self-join on ord — the fact table shuffled twice plus a sort-merge.
    // Baskets are small and bounded, so ONE groupBy collects each
    // basket's (distinct) items sorted by part and the part_a < part_b
    // pairs are generated in place with array expressions: identical
    // pair multiset, one shuffle of the facts, no join. Singleton
    // supports ride along in the struct.
    bf.groupBy("ord")
      .agg(sort_array(collect_list(struct(col("part"), col("sup"))))
        .as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps)), y ->
          |    named_struct('part_a', x.part, 'sup_a', x.sup,
          |                 'part_b', y.part, 'sup_b', y.sup))))"""
          .stripMargin)).as("pr"))
      .select(col("pr.part_a").as("part_a"), col("pr.part_b").as("part_b"),
        col("pr.sup_a").as("sup_a"), col("pr.sup_b").as("sup_b"))
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("sup_ab"),
        max("sup_a").as("sup_a"), max("sup_b").as("sup_b"))
      .filter(col("sup_ab") >= 3)
      .select("part_a", "part_b", "sup_ab", "sup_a", "sup_b")
      .orderBy("part_a", "part_b")
  }

  /** Numeric band join ([[graft.ext.RangeJoin.bandJoin]]): pair F-status
    * orders with O-status orders of the same priority whose totals are
    * within $10 — the symmetric-band theta join (entity matching on a
    * numeric attribute, price-anomaly twins) decomposed into an
    * equi-join: left side keeps its single eps-bucket, right side
    * explodes to bucket ± 1, complete recall with each pair matched
    * exactly once, exact integer-cents band filter inside the bucket.
    */
  val q190BandJoin: QuerySpec = QuerySpec.oracled(
    "q190_band_join",
    """WITH a AS (
      |  SELECT o_orderkey AS ka, o_orderpriority AS pr,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS ca
      |  FROM orders WHERE o_orderstatus = 'F'),
      |b AS (
      |  SELECT o_orderkey AS kb, o_orderpriority AS pr,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cb
      |  FROM orders WHERE o_orderstatus = 'O')
      |SELECT a.pr AS pr, a.ka, b.kb, abs(a.ca - b.cb) AS gap_cents
      |FROM a JOIN b ON a.pr = b.pr AND abs(a.ca - b.cb) <= 1000
      |ORDER BY a.pr, ka, kb""".stripMargin) { (spark, dir) =>
    val orders = t(spark, dir, "orders")
    def side(status: String, k: String, c: String) = orders
      .filter(col("o_orderstatus") === status)
      .select(col("o_orderkey").as(k), col("o_orderpriority").as("pr"),
        round(col("o_totalprice") * 100).cast("long").as(c))
    graft.ext.RangeJoin.bandJoin(
        side("F", "ka", "ca"), "ca",
        side("O", "kb", "cb"), "cb",
        eps = 1000L, keys = Seq("pr"))
      .select(col("pr"), col("ka"), col("kb"),
        abs(col("ca") - col("cb")).as("gap_cents"))
      .orderBy("pr", "ka", "kb")
  }

  val all: Seq[QuerySpec] =
    Seq(q71StarJoin, q74EquidepthBins, q76ZOrder, q79SaltedJoin,
      q90IntervalJoin, q96BloomJoin, q101AdaptiveSkewJoin, q120GlobalSort,
      q164FrequentPairs, q190BandJoin, q219ItemCf, q221FanoutHistogram,
      q226SpatialJoin, q228HilbertLayout, q230RecHoldout)

  /** Leave-one-out recommendation evaluation — the measurement harness
    * for the q219 CF family (the q220/q215 audit discipline): each
    * customer's LAST order (by date, ties to the higher key) is held
    * out, item co-occurrence trains on the earlier orders only (no
    * temporal leakage — co-counts never see the evaluation order),
    * each customer is recommended the top-5 co-occurring items scored
    * by Σ co-counts over their train items (exact BIGINT, already-bought
    * items excluded), and a customer scores a hit if ANY held-out item
    * lands in their top-5. One adjudicated summary row: eval population,
    * candidate coverage, hits, hit ppm — the honest number a
    * recommendation precompute ships with.
    */
  lazy val q230RecHoldout: QuerySpec = QuerySpec.oracled(
    "q230_rec_holdout",
    """WITH b AS (
      |  SELECT DISTINCT l_orderkey AS oid, l_partkey AS item
      |  FROM lineitem),
      |ranked AS (
      |  SELECT o_orderkey AS oid, o_custkey AS cust,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn,
      |    count(*) OVER (PARTITION BY o_custkey) AS n_ord
      |  FROM orders),
      |held AS (SELECT cust, oid FROM ranked WHERE rn = 1 AND n_ord >= 2),
      |train AS (SELECT cust, oid FROM ranked WHERE rn > 1),
      |tb AS (
      |  SELECT t.cust, b.item FROM train t JOIN b ON b.oid = t.oid
      |  GROUP BY 1, 2),
      |tob AS (
      |  SELECT b.oid, b.item FROM b
      |  JOIN (SELECT DISTINCT oid FROM train) tr ON tr.oid = b.oid),
      |pair AS (
      |  SELECT a.item AS i, c.item AS j, count(*) AS cij
      |  FROM tob a JOIN tob c ON a.oid = c.oid AND a.item <> c.item
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |score AS (
      |  SELECT tb.cust, p.j AS cand, CAST(sum(p.cij) AS BIGINT) AS s
      |  FROM tb JOIN pair p ON p.i = tb.item
      |  GROUP BY 1, 2),
      |scorex AS (
      |  SELECT s.cust, s.cand, s.s FROM score s
      |  LEFT JOIN tb ON tb.cust = s.cust AND tb.item = s.cand
      |  WHERE tb.item IS NULL),
      |top5 AS (
      |  SELECT cust, cand FROM (
      |    SELECT cust, cand,
      |      row_number() OVER (PARTITION BY cust
      |                         ORDER BY s DESC, cand) AS rk
      |    FROM scorex) WHERE rk <= 5),
      |hi AS (SELECT h.cust, b.item FROM held h JOIN b ON b.oid = h.oid),
      |hit AS (
      |  SELECT hi.cust,
      |    max(CASE WHEN t.cand IS NOT NULL THEN 1 ELSE 0 END) AS hit
      |  FROM hi LEFT JOIN top5 t
      |    ON t.cust = hi.cust AND t.cand = hi.item
      |  GROUP BY hi.cust)
      |SELECT CAST(count(*) AS BIGINT) AS n_eval,
      |  CAST((SELECT count(DISTINCT cust) FROM top5) AS BIGINT)
      |    AS n_with_candidates,
      |  CAST(sum(hit) AS BIGINT) AS n_hits,
      |  CAST((sum(hit) * 1000000) // count(*) AS BIGINT) AS hit_ppm
      |FROM hit""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val b = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("oid"), col("l_partkey").as("item"))
      .distinct()
    val wC = Window.partitionBy("cust")
    val ranked = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("oid"), col("o_custkey").as("cust"),
        col("o_orderdate").as("d"))
      .withColumn("rn", row_number().over(
        wC.orderBy(col("d").desc, col("oid").desc)))
      .withColumn("n_ord", count(lit(1)).over(wC))
    val held = ranked.filter(col("rn") === 1 && col("n_ord") >= 2)
      .select("cust", "oid")
    val train = ranked.filter(col("rn") > 1).select("cust", "oid")
    // r10 note: persisting tb + top5 (each feeds two readers) was tried
    // per the round-9 verdict and measured SLOWER in a matched A/B
    // (5.40 → 7.62 s): the columnar cache build of both frames costs
    // more than the exchange reuse the single-action plan already gets.
    // Kept un-persisted — the one-action shape below is the optimization.
    val tb = train.join(b, "oid").select("cust", "item").distinct()
    val tob = b.join(train.select("oid").distinct(), "oid")
    // r9 note: the in-array ordered-pair rewrite applied to q164/q219
    // was tried here too and measured SLOWER (4.7 → 7.7 s — this chain
    // is consumed twice downstream via top5's two readers, and the
    // grouped-array form recomputes worse than the self-join whose
    // exchanges the planner reuses). Kept as the original self-join.
    val pair = tob.as("a")
      .join(tob.as("c"),
        col("a.oid") === col("c.oid") && col("a.item") =!= col("c.item"))
      .groupBy(col("a.item").as("i"), col("c.item").as("j"))
      .agg(count(lit(1)).as("cij"))
      .filter(col("cij") >= 2)
    val score = tb.join(pair, col("item") === col("i"))
      .groupBy(col("cust"), col("j").as("cand"))
      .agg(sum("cij").as("s"))
    val scorex = score.join(
        tb.select(col("cust").as("tc"), col("item").as("ti")),
        col("tc") === col("cust") && col("ti") === col("cand"),
        "left_anti")
    val top5 = scorex
      .withColumn("rk", row_number().over(
        Window.partitionBy("cust").orderBy(col("s").desc, col("cand"))))
      .filter(col("rk") <= 5)
      .select("cust", "cand")
    val hi = held.join(b, "oid").select("cust", "item")
    val hit = hi.join(
        top5.select(col("cust").as("hc"), col("cand")),
        col("hc") === col("cust") && col("cand") === col("item"), "left")
      .groupBy("cust")
      .agg(max(when(col("cand").isNotNull, 1).otherwise(0)).as("hit"))
    // one action: the candidate-coverage count rides the same job as the
    // hit rollup (a separate .count() would execute the whole CF DAG
    // twice; within one plan the duplicated top5 subtree is eligible for
    // exchange reuse instead)
    val nCand = top5.agg(
      countDistinct("cust").as("n_with_candidates"))
    hit.agg(
      count(lit(1)).as("n_eval"),
      sum("hit").as("n_hits"))
      .crossJoin(broadcast(nCand))
      .select(col("n_eval"),
        col("n_with_candidates"),
        col("n_hits"),
        expr("(n_hits * 1000000) DIV n_eval").as("hit_ppm"))
  }

  private def hilbertLevels: String =
    (15 to 0 by -1).map(k => 1L << k).mkString("[", ", ", "]")

  /** The q228 oracle's Hilbert fold: one HUGEINT accumulator
    * `d·2³⁴ + x·2¹⁷ + y` folded over the 16 levels — DuckDB 1.0's
    * `list_reduce` mis-evaluates STRUCT accumulators (field aliasing),
    * so the state is packed into a single integer; the walk itself is
    * the normalized (always-non-negative) variant, which
    * HilbertSpec proves ≡ the signed textbook walk, and division/modulo
    * replace the bit ops so HUGEINT arithmetic suffices.
    */
  private def hilbertFoldSql: String = {
    val x = "(acc // 131072 % 131072)" // 2^17
    val y = "(acc % 131072)"
    val d = "(acc // 17179869184)" // 2^34
    val rx = s"(($x // s) % 2)"
    val ry = s"(($y // s) % 2)"
    s"""CAST(list_reduce(
       |  list_prepend(
       |    CAST(x AS HUGEINT) * 131072 + y,
       |    list_transform($hilbertLevels, s -> CAST(s AS HUGEINT))),
       |  (acc, s) -> (
       |    ($d + s * s * CASE
       |        WHEN $rx = 1 AND $ry = 1 THEN 2
       |        WHEN $rx = 1 THEN 3
       |        WHEN $ry = 1 THEN 1
       |        ELSE 0 END) * 17179869184
       |    + CASE WHEN $ry = 1 THEN $x % s
       |        WHEN $rx = 1 THEN s - 1 - $y % s
       |        ELSE $y % s END * 131072
       |    + CASE WHEN $ry = 1 THEN $y % s
       |        WHEN $rx = 1 THEN s - 1 - $x % s
       |        ELSE $x % s END
       |  )) // 17179869184 AS BIGINT)""".stripMargin
  }

  /** Hilbert-curve layout key ([[graft.functions.HilbertIndexExpr]],
    * native codegen) beside the z-order family (q76/q163): the
    * CONTINUOUS space-filling curve — no Z-diagonal jumps, so an
    * axis-aligned range scan touches fewer, longer index runs (why
    * production table formats offer hilbert-clustering beside
    * z-ordering). The walk is pure integer arithmetic, so the oracle
    * replays all 16 levels as a `list_reduce` fold carrying (x, y, d) —
    * the index VALUES are adjudicated bit-for-bit, not spot-checked.
    * Emitted as the top-8-bit curve-bucket profile with per-bucket
    * bounding boxes: bounded bboxes are the locality evidence (a
    * Z-bucket's box can span the whole plane across a diagonal jump).
    */
  lazy val q228HilbertLayout: QuerySpec = QuerySpec.oracled(
    "q228_hilbert_layout",
    s"""WITH pts AS (
       |  SELECT c_custkey AS id,
       |    ('0x' || substr(md5('px:' || CAST(c_custkey AS VARCHAR)), 1, 15))
       |      ::BIGINT % 65536 AS x,
       |    ('0x' || substr(md5('py:' || CAST(c_custkey AS VARCHAR)), 1, 15))
       |      ::BIGINT % 65536 AS y
       |  FROM customer),
       |h AS (
       |  SELECT id, x, y,
       |    $hilbertFoldSql AS hd
       |  FROM pts)
       |SELECT CAST(hd // 16777216 AS INTEGER) AS bucket,
       |  count(*) AS n_points,
       |  CAST(min(x) AS BIGINT) AS min_x, CAST(max(x) AS BIGINT) AS max_x,
       |  CAST(min(y) AS BIGINT) AS min_y, CAST(max(y) AS BIGINT) AS max_y,
       |  CAST(sum(id) AS BIGINT) AS id_sum
       |FROM h GROUP BY 1
       |ORDER BY bucket""".stripMargin) { (spark, dir) =>
    graft.functions.VectorExpressions.register(spark)
    def h(tag: String) = conv(substring(md5(concat(lit(tag),
      col("c_custkey").cast("string"))), 1, 15), 16, 10)
      .cast("long") % 65536L
    spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").as("id"),
        h("px:").as("x"), h("py:").as("y"))
      .withColumn("hd", expr("graft_hilbert(x, y)"))
      .groupBy(expr("CAST(hd DIV 16777216 AS INT)").as("bucket"))
      .agg(count(lit(1)).as("n_points"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"),
        sum("id").as("id_sum"))
      .orderBy("bucket")
  }

  /** 2D spatial radius join — q190's band-join discipline lifted to the
    * plane: points bucket into r-sized grid cells, the right side
    * explodes to its 3×3 neighborhood (fixed 9× fan-out), candidates meet
    * on an exact cell equi-join, and the L2² ≤ r² verify is pure BIGINT
    * (squared distances need no sqrt, and the md5-derived micro-unit
    * coordinates are engine-identical). Each qualifying pair matches
    * EXACTLY once (only one exploded neighbor of b coincides with a's
    * cell), so no dedup pass. This is the geohash/grid shape every
    * spatial near-join at scale reduces to; a cartesian would be n²
    * distance checks, the grid makes it Σ per-cell-pair products. Cells
    * partition the one shuffle; hot cells ride AQE like any equi-join.
    */
  lazy val q226SpatialJoin: QuerySpec = QuerySpec.oracled(
    "q226_spatial_join",
    """WITH pts AS (
      |  SELECT c_custkey AS id,
      |    ('0x' || substr(md5('px:' || CAST(c_custkey AS VARCHAR)), 1, 15))
      |      ::BIGINT % 1000000 AS x,
      |    ('0x' || substr(md5('py:' || CAST(c_custkey AS VARCHAR)), 1, 15))
      |      ::BIGINT % 1000000 AS y
      |  FROM customer),
      |a AS (SELECT id, x, y, x // 10000 AS cx, y // 10000 AS cy FROM pts),
      |b AS (
      |  SELECT p.id, p.x, p.y,
      |    p.x // 10000 + d.dx AS cx, p.y // 10000 + d.dy AS cy
      |  FROM pts p CROSS JOIN (
      |    SELECT * FROM (VALUES (-1, -1), (-1, 0), (-1, 1), (0, -1),
      |      (0, 0), (0, 1), (1, -1), (1, 0), (1, 1)) AS t(dx, dy)) d),
      |pair AS (
      |  SELECT a.id AS id_a, b.id AS id_b,
      |    (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
      |  FROM a JOIN b ON a.cx = b.cx AND a.cy = b.cy AND a.id < b.id)
      |SELECT id_a, id_b, CAST(dist2 AS BIGINT) AS dist2
      |FROM pair WHERE dist2 <= 100000000
      |ORDER BY id_a, id_b""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val r = 10000L
    def h(tag: String) = conv(substring(md5(concat(lit(tag),
      col("c_custkey").cast("string"))), 1, 15), 16, 10)
      .cast("long") % 1000000L
    val pts = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").as("id"),
        h("px:").as("x"), h("py:").as("y"))
    val a = pts.select(col("id"), col("x"), col("y"),
      (col("x") / r).cast("long").as("cx"),
      (col("y") / r).cast("long").as("cy"))
    val nb = broadcast((for { dx <- -1 to 1; dy <- -1 to 1 }
      yield (dx, dy)).toDF("dx", "dy"))
    val b = pts.crossJoin(nb)
      .select(col("id").as("id_b"), col("x").as("xb"), col("y").as("yb"),
        ((col("x") / r).cast("long") + col("dx")).as("cx"),
        ((col("y") / r).cast("long") + col("dy")).as("cy"))
    a.join(b,
        a("cx") === b("cx") && a("cy") === b("cy") &&
          a("id") < b("id_b"))
      .withColumn("dist2",
        (col("x") - col("xb")) * (col("x") - col("xb")) +
          (col("y") - col("yb")) * (col("y") - col("yb")))
      .filter(col("dist2") <= r * r)
      .select(col("id").as("id_a"), col("id_b"), col("dist2"))
      .orderBy("id_a", "id_b")
  }

  /** Join-fanout histogram — the skew diagnosis you run BEFORE choosing a
    * join strategy: per foreign key, its multiplicity m, bucketed into
    * log₂ bins computed as `length(bin(m)) − 1` (both engines print the
    * same binary string — an integer log2 with no libm), with the bin's
    * key count and worst multiplicity. A heavy tail at high bins is the
    * signal to salt (q79) or let AQE split (q101); three key columns in
    * one report. One map-side-combinable count per key column + a
    * \|distinct keys\|-row rollup.
    */
  lazy val q221FanoutHistogram: QuerySpec = QuerySpec.oracled(
    "q221_fanout_histogram",
    """WITH m1 AS (
      |  SELECT 'lineitem.l_orderkey' AS key_col, l_orderkey AS k,
      |    count(*) AS m FROM lineitem GROUP BY 2),
      |m2 AS (
      |  SELECT 'lineitem.l_partkey', l_partkey, count(*)
      |  FROM lineitem GROUP BY 2),
      |m3 AS (
      |  SELECT 'orders.o_custkey', o_custkey, count(*)
      |  FROM orders GROUP BY 2),
      |u AS (
      |  SELECT * FROM m1 UNION ALL SELECT * FROM m2
      |  UNION ALL SELECT * FROM m3)
      |SELECT key_col,
      |  CAST(length(bin(m)) - 1 AS INTEGER) AS log2_bucket,
      |  count(*) AS n_keys,
      |  CAST(max(m) AS BIGINT) AS max_m,
      |  CAST(sum(m) AS BIGINT) AS n_rows
      |FROM u GROUP BY 1, 2
      |ORDER BY key_col, log2_bucket""".stripMargin) { (spark, dir) =>
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val o = spark.read.parquet(s"$dir/orders.parquet")
    def mult(df: org.apache.spark.sql.DataFrame, c: String, label: String) =
      df.groupBy(col(c).as("k")).agg(count(lit(1)).as("m"))
        .select(lit(label).as("key_col"), col("k"), col("m"))
    mult(li, "l_orderkey", "lineitem.l_orderkey")
      .unionByName(mult(li, "l_partkey", "lineitem.l_partkey"))
      .unionByName(mult(o, "o_custkey", "orders.o_custkey"))
      .groupBy(col("key_col"),
        expr("CAST(length(bin(m)) - 1 AS INT)").as("log2_bucket"))
      .agg(count(lit(1)).as("n_keys"), max("m").as("max_m"),
        sum("m").as("n_rows"))
      .orderBy("key_col", "log2_bucket")
  }

  /** Item-item collaborative-filtering similarity ("bought X also bought
    * Y"): per part, the top-5 co-purchased parts by cosine over basket
    * co-occurrence — `c_ij / √(c_i·c_j)` with exact BIGINT counts, ONE
    * correctly-rounded sqrt, and a floored-ppm BIGINT ranking key (the
    * q216 discipline). Scale follows q164's apriori order: parts below
    * the support floor are dropped BEFORE the per-basket pair explode
    * (lossless — c_ij ≥ 3 needs c_i ≥ 3), baskets are small and bounded,
    * the count table broadcasts back for scoring, and the per-item top-5
    * is a bounded window. This is the recommendation precompute a
    * purchase log feeds nightly.
    */
  lazy val q219ItemCf: QuerySpec = QuerySpec.oracled(
    "q219_item_cf",
    """WITH b AS (
      |  SELECT DISTINCT l_orderkey AS bid, l_partkey AS item
      |  FROM lineitem),
      |ic AS (SELECT item, count(*) AS ci FROM b GROUP BY item),
      |pair AS (
      |  SELECT a.item AS i, c.item AS j, count(*) AS cij
      |  FROM b a JOIN b c ON a.bid = c.bid AND a.item < c.item
      |  GROUP BY 1, 2 HAVING count(*) >= 3),
      |sym AS (
      |  SELECT i, j, cij FROM pair
      |  UNION ALL
      |  SELECT j, i, cij FROM pair),
      |sc AS (
      |  SELECT s.i AS item, s.j AS neighbor, s.cij,
      |    CAST(floor((s.cij * 1000000) / sqrt(ca.ci * cb.ci) + 0.5)
      |      AS BIGINT) AS sim_ppm
      |  FROM sym s JOIN ic ca ON s.i = ca.item
      |  JOIN ic cb ON s.j = cb.item),
      |r AS (
      |  SELECT item, neighbor, cij, sim_ppm,
      |    row_number() OVER (PARTITION BY item
      |                       ORDER BY sim_ppm DESC, neighbor) AS rnk
      |  FROM sc)
      |SELECT item, CAST(rnk AS INTEGER) AS rank, neighbor,
      |  CAST(cij AS BIGINT) AS n_co, sim_ppm
      |FROM r WHERE rnk <= 5
      |ORDER BY item, rank""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val b = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("bid"), col("l_partkey").as("item"))
      .distinct()
    val ic = b.groupBy("item").agg(count(lit(1)).as("ci"))
    // apriori prune: items below the support floor can't form a pair
    val frequent = ic.filter(col("ci") >= 3).select("item")
    val bf = b.join(broadcast(frequent), "item")
    // r9 (guide §2.4/§3): the per-basket pair explode used to be a bf⋈bf
    // self-join on bid — the fact table shuffled twice plus a sort-merge.
    // Baskets are small and bounded, so ONE groupBy collects each
    // basket's (distinct, sorted) items and the i<j pairs are generated
    // in place with array expressions: identical pair multiset, one
    // shuffle of the facts, no join.
    val pair = bf.groupBy("bid")
      .agg(sort_array(collect_list(col("item"))).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps)), y ->
          |    named_struct('i', x, 'j', y))))""".stripMargin)).as("pr"))
      .select(col("pr.i").as("i"), col("pr.j").as("j"))
      .groupBy("i", "j").agg(count(lit(1)).as("cij"))
      .filter(col("cij") >= 3)
    val sym = pair.select(col("i"), col("j"), col("cij"))
      .unionByName(pair.select(col("j").as("i"), col("i").as("j"),
        col("cij")))
    val scored = sym
      .join(broadcast(ic.select(col("item").as("i"), col("ci").as("ca"))),
        "i")
      .join(broadcast(ic.select(col("item").as("j"), col("ci").as("cb"))),
        "j")
      .withColumn("sim_ppm",
        floor((col("cij") * lit(1000000)) / sqrt(col("ca") * col("cb"))
          + lit(0.5)).cast("long"))
    val w = Window.partitionBy("i")
      .orderBy(col("sim_ppm").desc, col("j"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("i").as("item"), col("rnk").as("rank"),
        col("j").as("neighbor"), col("cij").as("n_co"), col("sim_ppm"))
      .orderBy("item", "rank")
  }
}
