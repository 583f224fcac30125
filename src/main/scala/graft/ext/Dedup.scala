package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication family for large-scale training-data pipelines:
  * exact, MinHash+LSH, SimHash, and blocked n-gram Jaccard.
  *
  * Execution shape (the part that must survive 100 TB):
  *  - shingling+hashing is ONE fused pass per document
  *    ([[graft.functions.ShingleHashExpr]]: text → distinct 60-bit shingle
  *    hashes); composed built-ins (token array → shingle strings → md5)
  *    measured ~2.4 ms/doc interpreted vs ~40 µs fused, and nested
  *    higher-order forms were O(n²)/doc — see BASELINE.md ledger;
  *  - the whole family then runs on hash *sets* (intersection sizes match
  *    string-set sizes since both engines hash before the set ops);
  *  - signatures: ONE fused scalar pass per doc over its hash-set array
  *    ([[graft.functions.MinHashSigExpr]] / [[graft.functions.SimHashSigExpr]]
  *    — all 128 MinHash lanes / 16 SimHash bit-votes in a codegen'd loop,
  *    no explode, no shuffle; the r3 wide-aggregate forms survive as
  *    [[minhashSignatureAgg]]/[[simhashSignatureAgg]] parity references);
  *  - LSH candidate generation is an equi-join on (band, bucket) carrying
  *    only ids; intersection sizes come from a second exploded-hash
  *    equi-join ([[withOverlapExploded]]) — no wide array rows anywhere;
  *  - hot buckets (boilerplate corpora) are the skew risk: [[saltedSelfJoin]]
  *    splits any bucket wider than `bucketCap` across salt groups without
  *    changing the pair set; AQE splits what remains.
  *
  * Cross-engine determinism: the only hash is
  * `conv(substr(md5(s),1,15),16,10)` — 60 bits of md5, reproducible
  * bit-for-bit in any engine (DuckDB: `('0x'||substr(md5(s),1,15))::BIGINT`),
  * so DuckDB oracles replay identical signatures.
  */
object Dedup {

  /** 1e9+7: modulus keeping a*h+b inside int64 for any engine. */
  final val P = 1000000007L

  /** MinHash lane parameters, derived arithmetically from the lane index. */
  def laneA(i: Int): Long = (1103515245L * i + 12345) % P
  def laneB(i: Int): Long = (69069L * i + 1) % P

  /** Lower-cased whitespace tokens, empty strings removed (a leading tab
    * survives `trim`, which strips spaces only, and would otherwise yield a
    * leading "" token — the fused [[graft.functions.ShingleHashExpr]] and
    * the DuckDB oracles both exclude empties). NOTE: `TextStats` token
    * *counts* deliberately use the raw split to mirror their SQL oracles.
    */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => t =!= "")

  /** 60-bit md5-derived hash — the cross-engine workhorse. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** (doc_id, sh) where sh is the distinct k-shingle set. Tokens are
    * materialized as their own projection so the shingle transform reads an
    * attribute (once per row) instead of re-splitting per element.
    */
  def withShingles(
      docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val words = (0 until k)
      .map(o => s"element_at(__toks, CAST(__i + $o AS INT))")
      .mkString(", ")
    docs
      .select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .withColumn("__toks", tokens(col("__text")))
      // guard: sequence(1, 0) would be a DESCENDING range and index 0 is
      // always invalid — docs shorter than k tokens get an empty set
      .withColumn("sh", expr(
        s"IF(size(__toks) >= $k, " +
          s"array_distinct(transform(sequence(1, size(__toks) - ${k - 1}), " +
          s"__i -> concat_ws(' ', $words))), " +
          "CAST(array() AS ARRAY<STRING>))"))
      .select("doc_id", "sh")
  }

  /** (doc_id, hsh): distinct 60-bit shingle-hash set per document via the
    * fused one-pass [[graft.functions.ShingleHashExpr]] — the whole dedup
    * family runs on hash sets (set sizes are identical to string-set sizes
    * because both engines apply the same hash before the set ops).
    */
  def withShingleHashSets(
      docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    graft.functions.VectorExpressions.register(docs.sparkSession)
    docs
      .select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .select(col("doc_id"),
        expr(s"graft_shingle_hashes(__text, $k)").as("hsh"))
      // family-wide semantics: docs with fewer than k tokens have no
      // shingle set and are excluded from near-dup detection (the oracles
      // filter `len(s) > 0` identically)
      .filter(size(col("hsh")) > 0)
  }

  /** (doc_id, h): one row per distinct shingle hash —
    * the overlap-join input. */
  private[ext] def shingleHashes(hashSets: DataFrame): DataFrame =
    hashSets.select(col("doc_id"), explode(col("hsh")).as("h"))

  /** The r3 wide-aggregate MinHash signature (explode → 128 named `min`
    * lanes → array): the engine-portable reference formulation
    * [[graft.functions.MinHashSigExpr]] is parity-tested against
    * (SignatureParitySpec). Input: (doc_id, hsh) hash sets.
    */
  def minhashSignatureAgg(hashSets: DataFrame, numHashes: Int): DataFrame = {
    val lanes = (0 until numHashes).map(i =>
      min(expr(s"(${laneA(i)}L * (h % $P) + ${laneB(i)}L) % $P")).as(s"m$i"))
    shingleHashes(hashSets)
      .groupBy("doc_id")
      .agg(lanes.head, lanes.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** The r3 vote-aggregate SimHash signature — reference formulation for
    * SignatureParitySpec. Input: (doc_id, hsh) hash sets.
    */
  def simhashSignatureAgg(hashSets: DataFrame): DataFrame = {
    val votes = (0 until 16).map(j =>
      sum(expr(s"IF((h >> $j) & 1 = 1, 1L, -1L)")).as(s"v$j"))
    val sigExpr = (0 until 16)
      .map(j => s"IF(v$j > 0, ${1L << j}L, 0L)").mkString(" + ")
    shingleHashes(hashSets)
      .groupBy("doc_id")
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), expr(s"($sigExpr)").as("sig"))
  }

  /** Exact intersection/union sizes for candidate pairs via the
    * exploded-hash equi-join: instead of re-attaching both whole hash-set
    * arrays per pair (row width = O(|doc| hashes) — the 100 TB row-size
    * risk), join the candidate ids against the exploded (doc, h) rows on
    * id then (id, h) and COUNT matches. Every row is three scalars; the
    * shuffles are id/(id, h) equi-joins AQE can split freely.
    *
    * Pairs with an empty intersection produce no counting rows — the left
    * join restores them with inter_size 0, so thresholds of 0 keep exact
    * semantics. Extra candidate columns (e.g. block keys) pass through.
    */
  private[ext] def withOverlapExploded(
      candidates: DataFrame, hashSets: DataFrame): DataFrame = {
    // r9 note: do NOT blanket-persist here — candidates can be huge at
    // low thresholds (q222 passes 0/1) and hashSets carries per-doc
    // arrays whose columnar cache build costs more than the exchange
    // reuse it replaces (measured: q222 3.6 → 7.0 s when tried). Callers
    // whose inputs are expensive AND small persist at the call site.
    val rows = shingleHashes(hashSets)
    val sizes = hashSets.select(
      col("doc_id"), size(col("hsh")).cast("long").as("__sz"))
    // precondition: candidates are pair-distinct (both call sites ensure
    // it — duplicates would double the counted intersection)
    val inter = candidates.select("id_a", "id_b")
      .join(rows.select(col("doc_id").as("id_a"), col("h")), "id_a")
      .join(rows.select(col("doc_id").as("id_b"), col("h")), Seq("id_b", "h"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("__inter"))
    candidates
      .join(inter, Seq("id_a", "id_b"), "left")
      .withColumn("inter_size", coalesce(col("__inter"), lit(0L)))
      .join(sizes.select(col("doc_id").as("id_a"), col("__sz").as("__sz_a")),
        "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("__sz").as("__sz_b")),
        "id_b")
      .withColumn("union_size",
        col("__sz_a") + col("__sz_b") - col("inter_size"))
      .drop("__inter", "__sz_a", "__sz_b")
  }

  /** Skew-safe LSH self-join: pair generation per equal `keyCols` value,
    * with hot keys (width > `capWidth`) salted so no single task owns a
    * whole quadratic bucket — the coded form of the "boilerplate corpus"
    * mitigation. The left side of a hot key keeps one deterministic salt
    * (`hash(id) mod fan`), the right side replicates to every salt, so each
    * unordered pair meets exactly once and the pair set is IDENTICAL to the
    * unsalted join (DedupSkewSpec proves both properties on a skewed
    * fixture). `fan = ceil(width / capWidth)` bounds the left rows per
    * (key, salt) task at ~capWidth; widths come from a window count over
    * the same key partitioning so the upstream pipeline is never evaluated
    * an extra time.
    */
  def saltedSelfJoin(
      items: DataFrame,
      keyCols: Seq[String],
      idCol: String,
      capWidth: Int): DataFrame = {
    val keys = keyCols.map(col)
    if (capWidth <= 0) {
      val l = items.select((col(idCol).as("id_a") +: keys): _*)
      val r = items.select((col(idCol).as("id_b") +: keys): _*)
      l.join(r, keyCols).filter(col("id_a") < col("id_b"))
    } else {
      // widths via a window count, not a groupBy + join-back: the self-join
      // already evaluates `items` twice (left/right); a separate aggregate
      // would re-run the whole upstream (e.g. the 128-lane signature pass)
      // a third time — profiled ~1.5× slower end-to-end at sf0.1
      val w = org.apache.spark.sql.expressions.Window.partitionBy(keys: _*)
      val tagged = items.withColumn("__w", count(lit(1)).over(w))
      val fan = expr(s"CAST((__w + ${capWidth - 1}) DIV $capWidth AS INT)")
      val l = tagged
        .withColumn("__g",
          when(col("__w") <= capWidth, lit(0))
            .otherwise(pmod(hash(col(idCol)), fan)))
        .select((col(idCol).as("id_a") +: col("__g") +: keys): _*)
      val r = tagged
        .withColumn("__g", explode(
          when(col("__w") <= capWidth, array(lit(0)))
            .otherwise(sequence(lit(0), fan - 1))))
        .select((col(idCol).as("id_b") +: col("__g") +: keys): _*)
      l.join(r, keyCols :+ "__g")
        .filter(col("id_a") < col("id_b"))
        .drop("__g")
    }
  }

  /** MinHash-LSH near-duplicate pairs, exactly verified.
    *
    * With r=2, b=64 the detection probability at jaccard 0.7 is
    * 1-(1-0.49)^64 ≈ 1-2e-19 — the LSH pass only prunes the pair space; the
    * final integer-arithmetic Jaccard filter
    * (`den * inter >= num * union`) pins semantics exactly.
    */
  def minhashNearDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      numHashes: Int = 128,
      bandRows: Int = 2,
      thresholdNum: Int = 7,
      thresholdDen: Int = 10,
      bucketCap: Int = 1000): DataFrame = {
    require(numHashes % bandRows == 0)
    val numBands = numHashes / bandRows
    // persisted (r9): the fused shingle pass feeds the signature leg AND
    // the exact verify — one computation per action. These call-site
    // persists throughout this file are session-scoped scratch (the
    // PageRank contract): alive for the caller's action, reclaimed by
    // the harness between queries / on session end — the operators
    // return lazy frames and cannot know when that action has run.
    val sets = withShingleHashSets(docs, idCol, textCol, k).persist()

    // Whole signature as ONE fused scalar pass over the per-doc hash set
    // (graft_minhash): no explode, no shuffle, one plan node — replaces the
    // r3 128-column min-aggregate whose codegen alone cost ~3 s of
    // plan-compile per run (SignatureParitySpec pins bit-parity). The set
    // is non-empty by withShingleHashSets' filter, so sig is never null.
    val sig = sets.select(col("doc_id"),
      expr(s"graft_minhash(hsh, $numHashes)").as("sig"))

    // Band buckets from the signature array: (doc_id, band, bucket).
    val banded = sig.select(
      col("doc_id"),
      posexplode(expr(
        s"transform(sequence(0, ${numBands - 1}), b -> concat_ws(':', " +
          s"transform(slice(sig, b * $bandRows + 1, $bandRows), " +
          "x -> CAST(x AS STRING))))"))
        .as(Seq("band", "bucket")))

    val candidates =
      saltedSelfJoin(banded, Seq("band", "bucket"), "doc_id", bucketCap)
        .select("id_a", "id_b")
        .dropDuplicates("id_a", "id_b")

    withOverlapExploded(candidates, sets)
      .filter(col("inter_size") * thresholdDen >=
        col("union_size") * thresholdNum)
  }

  /** Incremental MinHash-LSH near-dup: every qualifying pair that involves
    * at least one `incoming` document — the append-only maintenance shape.
    * A production corpus is deduplicated ONCE; each new ingest batch then
    * only needs (incoming × corpus) ∪ (incoming × incoming) candidates,
    * never corpus × corpus, so the per-batch cost scales with
    * |batch| · bucket-width instead of re-paying the full self-join over
    * 100 TB of history. Implementation: band buckets for BOTH sides (the
    * corpus side is the part a real pipeline persists between batches),
    * then ONE asymmetric equi-join of incoming bands against all bands —
    * ids only, AQE-splittable — canonicalized to unordered pairs, and the
    * same exact integer-arithmetic Jaccard verify as
    * [[minhashNearDupPairs]]. Incoming ids must be disjoint from corpus
    * ids (they are new documents). IncrementalDedupSpec proves the pair
    * set equals the full self-join's pairs filtered to incoming
    * membership.
    *
    * Scale notes, honestly: (1) as written, the lazy plan evaluates the
    * incoming side's fused shingle/minhash pass in more than one branch
    * (candidate legs + verify union) — a production deployment persists
    * the banded corpus AND the incoming bands/sets between steps (the
    * corpus table is a durable artifact anyway; q161's streaming loop
    * keeps it in parquet), which also removes the recompute; (2) hot
    * band-buckets here ride AQE's skew-split of the plain equi-join
    * rather than the explicit `saltedSelfJoin` cap the batch variant
    * uses — the asymmetric join's skew exposure is bounded by the BATCH
    * side's bucket width, which is small by construction.
    */
  def minhashNearDupPairsIncremental(
      corpus: DataFrame,
      incoming: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      numHashes: Int = 128,
      bandRows: Int = 2,
      thresholdNum: Int = 7,
      thresholdDen: Int = 10): DataFrame = {
    val (setsC, bandsC) =
      signedSetsAndBands(corpus, idCol, textCol, k, numHashes, bandRows)
    val (setsI, bandsI) =
      signedSetsAndBands(incoming, idCol, textCol, k, numHashes, bandRows)
    minhashPairsFromSigned(setsI, bandsI, setsC, bandsC,
      thresholdNum, thresholdDen)
  }

  /** The (sets, bands) signed form of `docs` under a MinHash-LSH banding
    * scheme — (doc_id, hsh) shingle-hash sets plus (doc_id, band, bucket)
    * LSH buckets, the exact state a production pipeline PERSISTS between
    * ingest batches (r9: factored out of
    * [[minhashNearDupPairsIncremental]] so q161's streaming loop can
    * store signatures instead of re-signing the whole corpus each batch;
    * [[graft.ext.DedupIndex]] is the committed-artifact form).
    */
  def signedSetsAndBands(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      numHashes: Int,
      bandRows: Int): (DataFrame, DataFrame) = {
    require(numHashes % bandRows == 0)
    val numBands = numHashes / bandRows
    val sets = withShingleHashSets(docs, idCol, textCol, k)
    val sig = sets.select(col("doc_id"),
      expr(s"graft_minhash(hsh, $numHashes)").as("sig"))
    val bands = sig.select(
      col("doc_id"),
      posexplode(expr(
        s"transform(sequence(0, ${numBands - 1}), b -> concat_ws(':', " +
          s"transform(slice(sig, b * $bandRows + 1, $bandRows), " +
          "x -> CAST(x AS STRING))))"))
        .as(Seq("band", "bucket")))
    (sets, bands)
  }

  /** The incremental pair algebra over ALREADY-SIGNED state: candidates =
    * incoming bands ⋈ (prior ∪ incoming) bands (ids only — each pair
    * carries ≥ 1 incoming doc; incoming × incoming pairs meet twice and
    * collapse under the canonical unordered form), verified with the
    * exact integer Jaccard over prior ∪ incoming sets.
    */
  def minhashPairsFromSigned(
      setsI: DataFrame,
      bandsI: DataFrame,
      priorSets: DataFrame,
      priorBands: DataFrame,
      thresholdNum: Int,
      thresholdDen: Int): DataFrame = {
    val cands = bandsI.select(col("doc_id").as("id_n"),
        col("band"), col("bucket"))
      .join(priorBands.union(bandsI).select(col("doc_id").as("id_o"),
        col("band"), col("bucket")), Seq("band", "bucket"))
      .filter(col("id_n") =!= col("id_o"))
      .select(least(col("id_n"), col("id_o")).as("id_a"),
        greatest(col("id_n"), col("id_o")).as("id_b"))
      .dropDuplicates("id_a", "id_b")
    withOverlapExploded(cands, priorSets.union(setsI))
      .filter(col("inter_size") * thresholdDen >=
        col("union_size") * thresholdNum)
  }

  /** SimHash near-duplicate pairs: 16-bit signatures from per-bit ±1 vote
    * sums (16 agg columns, one shuffle), Hamming ≤ `maxHamming` via the
    * pigeonhole nibble bands (distance ≤ 3 ⇒ some nibble equal) — an
    * equi-join, never a cross join.
    */
  def simhashNearDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      maxHamming: Int = 3): DataFrame = {
    val sets = withShingleHashSets(docs, idCol, textCol, k)
    // Fused per-doc bit votes (graft_simhash) — same no-shuffle rationale
    // as the MinHash signature above; parity in SignatureParitySpec.
    val base = sets.select(col("doc_id"),
      expr("graft_simhash(hsh)").as("sig"))

    // persisted (r9): both self-join legs read this — one signing pass
    val banded = base.select(col("doc_id"), col("sig"),
      posexplode(expr(
        "transform(sequence(0, 3), n -> (sig >> (n * 4)) & 15)"))
        .as(Seq("nib", "nibval")))
      .persist()
    val l = banded.select(col("doc_id").as("id_a"), col("sig").as("sig_a"),
      col("nib"), col("nibval"))
    val r = banded.select(col("doc_id").as("id_b"), col("sig").as("sig_b"),
      col("nib"), col("nibval"))
    // Hamming filter BEFORE the dedup shuffle: the bitwise test is free in
    // the join's codegen stage, so only qualifying pairs pay the exchange.
    l.join(r, Seq("nib", "nibval"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
      .dropDuplicates("id_a", "id_b")
  }

  /** Blocked exact n-gram Jaccard join: candidate pairs only within the same
    * `blockCol` value (metadata blocking — the bounded alternative to LSH
    * when a natural partition key exists). Integer threshold.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockCols: Seq[String],
      k: Int = 2,
      thresholdNum: Int = 4,
      thresholdDen: Int = 5,
      blockCap: Int = 1000): DataFrame = {
    val sets = withShingleHashSets(docs, idCol, textCol, k)
    val base = sets.select("doc_id")
      .join(docs.select((col(idCol).as("doc_id") +:
        blockCols.map(col)): _*), "doc_id")
    val candidates = saltedSelfJoin(base, blockCols, "doc_id", blockCap)
    withOverlapExploded(candidates, sets)
      .filter(col("inter_size") * thresholdDen >=
        col("union_size") * thresholdNum)
  }

  /** Containment near-dup pairs: |A∩B| / min(|A|,|B|) ≥ t over trigram
    * shingle-hash sets — the subset-duplication detector MinHash cannot
    * express (a short doc quoted whole inside a long one has high
    * containment but low Jaccard, so Jaccard-calibrated bands miss it).
    *
    * Candidate generation is the PREFIX FILTER (SSJoin/PPJoin family): in
    * a global canonical element order — ascending document frequency,
    * then hash, so the rarest shingles come first — a set S only needs its
    * first `|S| − ⌈t·|S|⌉ + 1` elements indexed: any pair meeting the
    * overlap bound o = ⌈t·min⌉ shares its canonically-smallest common
    * element e_min, and e_min provably sits inside the SMALLER set's
    * prefix (if it didn't, the o−1 non-prefix slots above it could not
    * hold the ≥ o−1 intersection elements that outrank it). Joining every
    * doc's prefix against the FULL posting list therefore finds every
    * qualifying pair exactly once from the smaller side — lossless, no
    * band tuning, no false-negative probability. Rarest-first ordering is
    * a pure optimization: prefixes fill with low-df shingles, so the
    * prefix ⋈ postings join fans out by Σ prefix_cnt(h)·df(h) with the
    * high-df terms near-absent from the left side; the residual hot-h
    * skew rides a plain equi-join, which AQE splits. The exact
    * integer-arithmetic verify (den·inter ≥ num·min) then pins semantics,
    * exactly as in the MinHash path.
    *
    * No reference analogue (`/root/reference/src` has no set-similarity
    * join); training-pipeline extension.
    */
  def containmentPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      thresholdNum: Int = 9,
      thresholdDen: Int = 10): DataFrame = {
    require(thresholdNum > 0 && thresholdNum <= thresholdDen)
    // persisted (r9): the fused shingle pass feeds the df aggregate, the
    // prefix window, the candidate join and the exact verify — one
    // computation per action instead of ~6
    val sets = withShingleHashSets(docs, idCol, textCol, k).persist()
    val rows = shingleHashes(sets)
    val dfreq = rows.groupBy("h").agg(count(lit(1)).as("__df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("__df"), col("h"))
    // prefix length |S| - ceil(t*|S|) + 1, ceil in exact integers
    val prefix = rows.join(dfreq, "h")
      .withColumn("__rnk", row_number().over(w))
      .join(sets.select(col("doc_id"),
        size(col("hsh")).cast("long").as("__sz")), "doc_id")
      .filter(col("__rnk") <= expr(
        s"__sz - ((__sz * $thresholdNum + ${thresholdDen - 1}) " +
          s"DIV $thresholdDen) + 1"))
    val cands = prefix.select(col("doc_id").as("id_p"), col("h"))
      .join(rows.select(col("doc_id").as("id_f"), col("h")), "h")
      .filter(col("id_p") =!= col("id_f"))
      .select(least(col("id_p"), col("id_f")).as("id_a"),
        greatest(col("id_p"), col("id_f")).as("id_b"))
      .distinct()
    val sizes = sets.select(col("doc_id"), size(col("hsh")).cast("long"))
      .toDF("doc_id", "sz")
    withOverlapExploded(cands, sets)
      .join(sizes.select(col("doc_id").as("id_a"), col("sz").as("sz_a")),
        "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("sz").as("sz_b")),
        "id_b")
      .withColumn("min_size", least(col("sz_a"), col("sz_b")))
      .filter(col("inter_size") * thresholdDen >=
        col("min_size") * thresholdNum)
      .select("id_a", "id_b", "inter_size", "min_size")
  }

  /** Sorted-neighborhood near-duplicate pairs: the classic entity-
    * resolution blocking discipline (Hernández & Stolfo, SIGMOD'95) as the
    * LINEAR-candidate member of the dedup family. Every document gets a
    * normalized blocking key (lowercased alphanumeric prefix); the corpus
    * is globally sorted by (key, id); each doc is a candidate only against
    * its `window−1` successors in that order — exactly `(window−1)·n`
    * candidate pairs, against LSH's bucket-quadratic worst case — and the
    * exact integer-arithmetic Jaccard verify (`den·inter ≥ num·union` over
    * the k-shingle hash sets) then pins semantics, as everywhere in this
    * family. Catches what prefix-keyed sorting co-locates (shared
    * openings, template families with small edits); complements — not
    * replaces — MinHash, which is key-order-blind.
    *
    * 100 TB shape: the global sort is a range-partitioned exchange
    * (sampled boundaries, parallel partition sorts) + `zipWithIndex` —
    * the same machinery as the q120 global rank, NOT a single-partition
    * window. Candidate generation is an equi-join on the dense rank
    * (successor rank = rank + offset, offsets exploded on one side), so
    * no range scan and no skew: every rank value is unique. The verify
    * joins carry ids only ([[withOverlapExploded]]).
    *
    * No reference analogue; training-pipeline extension.
    */
  def sortedNeighborhoodPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 4,
      keyLen: Int = 24,
      k: Int = 2,
      thresholdNum: Int = 3,
      thresholdDen: Int = 10): DataFrame = {
    require(window >= 2, "window must cover at least one successor")
    val spark = docs.sparkSession
    import spark.implicits._
    val keyed = docs.select(col(idCol).cast("long").as("doc_id"),
        substring(regexp_replace(lower(col(textCol)), "[^a-z0-9]", ""),
          1, keyLen).as("__key"))
    val ranked = keyed
      .orderBy(col("__key"), col("doc_id"))
      .as[(Long, String)].rdd.zipWithIndex
      .map { case ((id, _), idx) => (idx + 1, id) }
      .toDF("rn", "doc_id")
    val successors = ranked
      .withColumn("__off",
        explode(sequence(lit(1), lit(window - 1))))
      .select((col("rn") + col("__off")).as("rn"), col("doc_id").as("id_a"))
    val cands = successors
      .join(ranked.withColumnRenamed("doc_id", "id_b"), "rn")
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
    val sets = withShingleHashSets(docs, idCol, textCol, k)
    withOverlapExploded(cands, sets)
      .filter(col("inter_size") * thresholdDen >=
        col("union_size") * thresholdNum)
      .select("id_a", "id_b", "inter_size", "union_size")
  }

  /** Duplicated-span fraction: what FRACTION of each document's text is
    * covered by fixed-width character windows that also appear verbatim
    * in at least one OTHER document. The corpus-curation signal behind
    * span-level dedup (a document can be 90 % boilerplate shared with
    * thousands of siblings yet never cross a DOC-level MinHash threshold
    * — this measures that 90 % directly; the doc-level family is blind
    * to it by construction).
    *
    * Windows of `width` chars at `stride` offsets (strided, not sliding:
    * n/stride windows per doc, not n — the standard cost/recall trade);
    * a window is duplicated when its hash occurs in ≥ 2 DISTINCT docs,
    * so intra-doc repetition (q60's signal) does not count. Output per
    * doc: (`doc_id`, `n_windows`, `n_dup`, `dup_ppm`) with `dup_ppm` an
    * exact integer floor-div — cross-engine bit-stable.
    *
    * 100 TB shape: explode is a bounded fan-out (len/stride rows per
    * doc, hash + id only — never the window text past the md5); the
    * distinct-doc count is ONE hash-partitioned groupBy on the window
    * hash, and the join back is on the same key so the exchange is
    * reused; final per-doc rollup is map-side combinable. No pairwise
    * anything — cost is linear in corpus size.
    *
    * No reference analogue; training-pipeline extension.
    */
  def duplicatedSpanFraction(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      nCharsCol: String,
      width: Int = 64,
      stride: Int = 32): DataFrame = {
    val w = docs.filter(col(nCharsCol) >= width)
      .select(col(idCol), col(textCol),
        explode(sequence(lit(0L),
          ((col(nCharsCol) - width) / stride).cast("long"))).as("i"))
      .select(col(idCol),
        md5(expr(s"substring($textCol, CAST(i * $stride + 1 AS INT), $width)"))
          .as("h"))
    val nd = w.groupBy("h").agg(countDistinct(idCol).as("nd"))
    w.join(nd, "h")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).cast("long").as("n_dup"))
      .select(col(idCol), col("n_windows"), col("n_dup"),
        expr("n_dup * 1000000 DIV n_windows").as("dup_ppm"))
  }

  /** Exact duplicated-span REMOVAL (the cleanup counterpart of
    * [[duplicatedSpanFraction]]'s signal — Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better", the ExactSubstr policy
    * re-shaped for hash windows): every aligned `width`-char window
    * (stride `stride`) whose hash occurs in ≥ 2 DISTINCT documents is a
    * duplicated span; overlapping/adjacent spans merge into maximal
    * intervals per document (gaps-and-islands over the window starts),
    * and each document is rewritten with those intervals excised — every
    * occurrence corpus-wide is removed, the ExactSubstr rule. Documents
    * with no duplicated window pass through unchanged.
    *
    * Everything is deterministic (md5 window hashes, integer intervals,
    * right-to-left excision fold), so the oracle replays the rewrite
    * hash-exactly — removing merged spans right-to-left equals
    * concatenating the kept gaps, which is how the SQL twin phrases it.
    *
    * 100 TB shape: window rows are (id, start, hash) — text never rides
    * the hash shuffle; the dup-hash filter is one groupBy + semi-join;
    * interval merge is a per-doc window function over a handful of span
    * rows; the rewrite joins ONE spans-array row back per document, so
    * each text value moves exactly once.
    */
  def removeDuplicatedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      nCharsCol: String,
      width: Int = 64,
      stride: Int = 32): DataFrame = {
    val w = docs.filter(col(nCharsCol) >= width)
      .select(col(idCol), col(textCol),
        explode(sequence(lit(0L),
          ((col(nCharsCol) - width) / stride).cast("long"))).as("i"))
      .select(col(idCol), (col("i") * stride).as("s"),
        md5(expr(s"substring($textCol, CAST(i * $stride + 1 AS INT), $width)"))
          .as("h"))
    val dupH = w.groupBy("h").agg(countDistinct(idCol).as("nd"))
      .filter(col("nd") >= 2).select("h")
    val dupw = w.join(dupH, "h")
      .select(col(idCol), col("s"), (col("s") + width).as("e"))
    val wm = Window.partitionBy(idCol).orderBy(col("s"), col("e"))
    val prevMax = max(col("e"))
      .over(wm.rowsBetween(Window.unboundedPreceding, -1))
    val merged = dupw
      .withColumn("brk",
        when(col("s") > coalesce(prevMax, lit(-1L)), 1L).otherwise(0L))
      .withColumn("g",
        sum("brk").over(wm.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(idCol), col("g"))
      .agg(min("s").as("s"), max("e").as("e"))
    val spans = merged.groupBy(idCol)
      .agg(
        expr("reverse(array_sort(collect_list(struct(s, e))))").as("spans"),
        count(lit(1)).as("n_spans"),
        sum(col("e") - col("s")).as("removed_chars"))
    docs.select(col(idCol), col(textCol))
      .join(spans, Seq(idCol), "left")
      .withColumn("clean",
        when(col("spans").isNull, col(textCol)).otherwise(expr(
          s"""aggregate(spans, $textCol, (acc, sp) -> concat(
             |  substring(acc, 1, CAST(sp.s AS INT)),
             |  substring(acc, CAST(sp.e AS INT) + 1)))""".stripMargin)))
      .select(col(idCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("removed_chars"), lit(0L)).as("removed_chars"),
        length(col("clean")).cast("long").as("clean_len"),
        md5(col("clean").cast("binary")).as("clean_md5"))
  }

  /** Variable-length exact-substring dedup (Lee et al. 2022
    * "Deduplicating Training Data Makes Language Models Better",
    * ExactSubstr — the suffix-array policy, re-expressed distributed):
    * any TOKEN run of length ≥ `minLen` that occurs twice anywhere in
    * the corpus (another document OR the same one) is excised from every
    * occurrence. The sequential implementation builds a corpus suffix
    * array and scans neighbors for ≥ minLen shared prefixes; the
    * shuffle-friendly equivalence this uses instead: a maximal
    * duplicated run of length M ≥ minLen is exactly the union of its
    * M − minLen + 1 duplicated minLen-grams, so marking every token
    * position whose minLen-gram hash occurs ≥ 2 times and merging
    * overlaps (gaps-and-islands) recovers precisely the ≥ minLen
    * duplicated-run coverage — variable-length removal from fixed-length
    * probes, no suffix array, no n².
    *
    * Differences from [[removeDuplicatedSpans]] (the q275 hash-window
    * form): token units with stride 1 (so runs of ANY length ≥ minLen
    * are caught exactly, not just stride-aligned windows), and ≥ 2
    * OCCURRENCES rather than ≥ 2 distinct documents (within-document
    * repetition is duplication too — the published policy).
    *
    * Cleaned text is the kept tokens space-joined (canonical token
    * form, like the published token-level rewrite). Deterministic
    * throughout: md5 gram hashes, integer token intervals — the oracle
    * replays the rewrite hash-exactly.
    *
    * 100 TB shape: gram rows are (id, pos, hash) — stride 1 means one
    * row per corpus token, linear, never quadratic; text never rides
    * the hash shuffle; the dup filter is one groupBy + semi-join; the
    * rewrite joins ONE spans-array row back per document.
    */
  /** Merged duplicated-token intervals (id, s, e) at one gram length —
    * the shared core of [[removeExactSubstr]] and [[exactSubstrCurve]].
    * Input: (idCol, toks, nt) rows.
    */
  private def exactSubstrMergedSpans(
      arr: DataFrame, idCol: String, minLen: Int): DataFrame = {
    val grams = arr.filter(col("nt") >= minLen)
      .select(col(idCol), col("toks"),
        explode(sequence(lit(0L), col("nt") - minLen)).as("p"))
      .select(col(idCol), col("p"),
        // \u0001 separator: tokens never contain it (non-space runs),
        // so gram boundaries are unambiguous under the hash
        md5(concat_ws("\u0001",
          expr(s"slice(toks, CAST(p + 1 AS INT), $minLen)"))
          .cast("binary")).as("h"))
    val dupH = grams.groupBy("h").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).select("h")
    val dupw = grams.join(dupH, "h")
      .select(col(idCol), col("p").as("s"), (col("p") + minLen).as("e"))
    val wm = Window.partitionBy(idCol).orderBy(col("s"), col("e"))
    val prevMax = max(col("e"))
      .over(wm.rowsBetween(Window.unboundedPreceding, -1))
    dupw
      .withColumn("brk",
        when(col("s") > coalesce(prevMax, lit(-1L)), 1L).otherwise(0L))
      .withColumn("g",
        sum("brk").over(wm.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(idCol), col("g"))
      .agg(min("s").as("s"), max("e").as("e"))
  }

  def removeExactSubstr(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minLen: Int = 12): DataFrame = {
    require(minLen >= 2, s"removeExactSubstr: minLen must be >= 2, got $minLen")
    val arr = docs
      .select(col(idCol), tokens(col(textCol)).as("toks"))
      .withColumn("nt", size(col("toks")).cast("long"))
    val merged = exactSubstrMergedSpans(arr, idCol, minLen)
    val spans = merged.groupBy(idCol)
      .agg(expr("array_sort(collect_list(struct(s, e)))").as("spans"),
        count(lit(1)).as("n_spans"),
        sum(col("e") - col("s")).as("removed_toks"))
    arr.join(spans, Seq(idCol), "left")
      .withColumn("clean",
        when(col("spans").isNull, concat_ws(" ", col("toks")))
          .otherwise(expr(
            """concat_ws(' ', filter(toks, (t, q) ->
              |  NOT exists(spans, sp -> q >= sp.s AND q < sp.e)))"""
              .stripMargin)))
      .select(col(idCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("removed_toks"), lit(0L)).as("removed_toks"),
        (col("nt") - coalesce(col("removed_toks"), lit(0L)))
          .as("clean_ntoks"),
        md5(col("clean").cast("binary")).as("clean_md5"))
  }

  /** Deterministic md5 ppm document sample — the q49 stratified-sample
    * rule at ppm resolution, shared by the corpus-wide audit curves so
    * their cost is constant at any corpus size: a doc is kept iff the
    * 60-bit md5 of `salt:id` lands below `samplePpm` of 1e6. No RNG
    * state, reproducible in any engine (DuckDB:
    * `('0x'||substr(md5(s),1,15))::BIGINT % 1000000 < ppm`).
    */
  private def samplePpmKeep(
      idCol: String, samplePpm: Int, salt: String): Column =
    expr(s"CAST(conv(substring(md5(concat('$salt', ':', " +
      s"CAST(`$idCol` AS STRING))), 1, 15), 16, 10) AS BIGINT) " +
      s"% 1000000") < samplePpm

  private def requireSamplePpm(samplePpm: Int, who: String): Unit =
    require(samplePpm >= 1 && samplePpm <= 1000000,
      s"$who: samplePpm must be in [1, 1000000], got $samplePpm")

  /** Exact-substring minLen sensitivity curve — the audit a practitioner
    * runs BEFORE picking [[removeExactSubstr]]'s gram length (Lee et al.
    * 2022 use 50 tokens; the right value depends on the corpus): one row
    * per candidate length with documents hit, merged spans, tokens
    * removed, and the corpus-wide removal rate in exact floor-div ppm.
    * Coverage at different lengths is NOT derivable from one pass (a
    * longer gram probes different runs), so each rung is its own
    * linear gram pass — the q284 decontamination-curve discipline.
    *
    * SAMPLE-FIRST AT SCALE: at 100 TB the curve runs on a sample, the
    * chosen rung on the corpus — `samplePpm` keeps a deterministic md5
    * ppm slice of the documents (the q49 rule, so any engine replays the
    * identical slice) and every downstream stat, including the removal
    * rate's denominator, is computed over that slice.
    */
  def exactSubstrCurve(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minLens: Seq[Int],
      samplePpm: Int = 1000000,
      sampleSalt: String = "curve"): DataFrame = {
    require(minLens.nonEmpty && minLens.forall(_ >= 2),
      s"exactSubstrCurve: minLens must be >= 2, got $minLens")
    require(minLens.distinct.size == minLens.size,
      s"exactSubstrCurve: minLens must be distinct, got $minLens")
    requireSamplePpm(samplePpm, "exactSubstrCurve")
    val base =
      if (samplePpm == 1000000) docs
      else docs.filter(samplePpmKeep(idCol, samplePpm, sampleSalt))
    val arr = base
      .select(col(idCol), tokens(col(textCol)).as("toks"))
      .withColumn("nt", size(col("toks")).cast("long"))
      .localCheckpoint()
    val tot = arr.agg(sum("nt").as("__tot"))
    minLens.sorted.map { L =>
      exactSubstrMergedSpans(arr, idCol, L)
        .groupBy()
        .agg(countDistinct(idCol).as("n_docs_hit"),
          count(lit(1)).as("n_spans"),
          coalesce(sum(col("e") - col("s")), lit(0L)).as("removed_toks"))
        .select(lit(L.toLong).as("min_len"), col("n_docs_hit"),
          col("n_spans"), col("removed_toks"))
    }.reduce(_.unionByName(_))
      .crossJoin(broadcast(tot))
      .withColumn("removed_ppm",
        expr("removed_toks * 1000000 div __tot"))
      .drop("__tot")
      .orderBy("min_len")
  }

  /** Jaccard threshold-sensitivity curve — the audit a practitioner runs
    * BEFORE picking a dedup threshold: for each candidate threshold
    * (percent), how many pairs qualify and how many documents they touch.
    * One pair computation feeds every threshold row: candidates are all
    * pairs sharing ≥ 1 shingle (exactly the pairs any threshold > 0 can
    * qualify — a pair with an empty intersection never passes), built from
    * the exploded-hash equi-self-join and verified with the exact integer
    * overlap counts, then bucketed by `inter·100 ≥ union·pct` per ladder
    * step. Shape at scale: the candidate join is the q18/q20 exploded-hash
    * discipline (ids-only rows, AQE-splittable; a boilerplate-heavy corpus
    * routes through [[saltedSelfJoin]] first), and the curve itself is one
    * tiny rollup over |pairs| rows per threshold.
    */
  def jaccardThresholdCurve(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      thresholdsPct: Seq[Int] = Seq(50, 60, 70, 80, 90)): DataFrame = {
    require(thresholdsPct.nonEmpty && thresholdsPct.forall(t => t > 0 && t <= 100),
      s"thresholdsPct must be in (0, 100], got $thresholdsPct")
    require(thresholdsPct.distinct.size == thresholdsPct.size,
      s"thresholdsPct must be distinct (a duplicate ladder step would " +
        s"double-count n_pairs), got $thresholdsPct")
    // persisted (r9): feeds both exploded join legs and both size legs
    val hs = withShingleHashSets(docs, idCol, textCol, k).persist()
    val rows = shingleHashes(hs)
    // intersection sizes straight off the h equi-join aggregation — NOT
    // the q18 candidates-then-overlap two-step: with candidates = ALL
    // co-shingle pairs, re-attaching each pair's full shingle list would
    // explode |pairs| × |shingles per doc| rows; here the join output IS
    // the counting input (one shuffle, map-side combinable)
    val inter = rows.select(col("doc_id").as("id_a"), col("h"))
      .join(rows.select(col("doc_id").as("id_b"), col("h")), "h")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("inter_size"))
    val sizes = hs.select(col("doc_id"), size(col("hsh")).cast("long").as("__sz"))
    // prune at the LOWEST ladder step before the ×|ladder| explode — a
    // pair that misses the loosest threshold can't appear on any row
    val minPct = thresholdsPct.min
    val scored = inter
      .join(sizes.select(col("doc_id").as("id_a"), col("__sz").as("__sz_a")),
        "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("__sz").as("__sz_b")),
        "id_b")
      .withColumn("union_size",
        col("__sz_a") + col("__sz_b") - col("inter_size"))
      .filter(col("inter_size") * 100 >= col("union_size") * minPct)
    val ladder = thresholdsPct.map(t => s"($t)").mkString(", ")
    val qual = scored
      .crossJoin(
        broadcast(docs.sparkSession.sql(
          s"SELECT * FROM VALUES $ladder AS t(threshold_pct)")))
      .filter(col("inter_size") * 100 >= col("union_size") * col("threshold_pct"))
      .select(col("threshold_pct").cast("long").as("threshold_pct"),
        col("id_a"), col("id_b"))
    val pairCounts = qual.groupBy("threshold_pct")
      .agg(count(lit(1)).as("n_pairs"))
    // touched-doc counts via endpoint explode + two-phase distinct — no
    // whole-pair-set array ever materializes on one row
    val docCounts = qual
      .select(col("threshold_pct"),
        explode(array(col("id_a"), col("id_b"))).as("id"))
      .groupBy("threshold_pct")
      .agg(countDistinct("id").as("n_docs"))
    pairCounts.join(docCounts, "threshold_pct")
      .orderBy("threshold_pct")
  }

  /** All-pairs set-cosine similarity join with LOSSLESS prefix filtering
    * (Bayardo, Ma & Srikant 2007, "Scaling Up All Pairs Similarity
    * Search"; prefix-filter soundness per Chaudhuri, Ganti & Kaushik
    * 2006): every unordered document pair whose distinct-k-shingle-set
    * cosine `|A∩B| / sqrt(|A|·|B|)` reaches `thresholdPermil/1000` —
    * WITHOUT forming the all-pairs grid. Complements the family's
    * probabilistic members: MinHash (q18) trades recall for speed; this
    * is the exact join, pruned instead of sampled. Runs on the family's
    * 60-bit shingle-hash sets (set sizes identical to string sets — both
    * engines hash before the set ops).
    *
    * Why the pruning is exact: order all shingles by one global total
    * order (df ASC, hash ASC — rarest first). A qualifying pair has
    * overlap `c ≥ t·sqrt(|A|·|B|) ≥ t²·|A|` (since `|B| ≥ c`), so each
    * side needs `c ≥ o = ceil(t²·n)` shared shingles; if the
    * globally-smallest shared shingle sat outside A's first
    * `n_A − o_A + 1`, all shared shingles would fit in A's last
    * `o_A − 1` — contradiction. Hence the smallest shared shingle lies
    * in BOTH prefixes and the prefix equi-join misses nothing. Every
    * arithmetic step is integer (`o` by ceil division, the threshold
    * test cross-multiplied as `c²·10⁶ ≥ tpm²·n_A·n_B`), so a brute
    * all-pairs SQL oracle adjudicates the pruned result bit-for-bit.
    *
    * Scale shape: candidate generation joins ONLY prefix shingles — the
    * rarest-first order makes a doc's prefix its lowest-df shingles, so
    * per-key join fanout is bounded by rare-shingle df, never the
    * boilerplate hot shingles (which sit in suffixes and are never join
    * keys). All rows crossing shuffles are (id, hash) pairs; the
    * verification join is candidate-sized. Integer guards are exact for
    * docs up to ~3M distinct shingles (`c²·10⁶ < 2⁶³`).
    */
  def apssCosinePairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      thresholdPermil: Int,
      k: Int = 3): DataFrame =
    apssScored(docs, idCol, textCol, thresholdPermil, k)
      .select(col("doc_a"), col("doc_b"), col("overlap"),
        col("n_a"), col("n_b"),
        floor(col("overlap").cast("double") * 1e9 /
          sqrt((col("n_a") * col("n_b")).cast("double")) + lit(0.5))
          .cast("long").as("cos_ppb"))

  /** [[apssCosinePairs]]' core: prefix-filtered candidates + exact
    * integer verification, returning (doc_a, doc_b, overlap, n_a, n_b)
    * for every pair at cosine ≥ threshold — shared with
    * [[apssCosineCurve]], which reuses ONE loosest-rung pass for every
    * ladder step.
    */
  private def apssScored(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      thresholdPermil: Int,
      k: Int): DataFrame = {
    require(thresholdPermil >= 1 && thresholdPermil <= 1000,
      s"apssCosinePairs: thresholdPermil must be in [1, 1000], " +
        s"got $thresholdPermil")
    val tpm2 = thresholdPermil.toLong * thresholdPermil
    // persisted (r9): hs feeds the size table (3 refs), the token table
    // (4 refs) and the prefix chain — the fused shingle pass previously
    // recomputed ~7× per action
    val hs = withShingleHashSets(docs, idCol, textCol, k).persist()
    val n = hs.select(col("doc_id"), size(col("hsh")).cast("long").as("n"))
    val tc = shingleHashes(hs)
    val dfreq = tc.groupBy("h").agg(count(lit(1)).as("__df"))
    val pos = tc.join(dfreq, "h")
      .withColumn("__pos", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("__df"), col("h"))))
    // minimum overlap o = ceil(t²·n) per side; prefix = first n − o + 1
    val pre = pos.join(n, "doc_id")
      .withColumn("__o", expr(s"($tpm2 * n + 999999) div 1000000"))
      .filter(col("__pos") <= col("n") - col("__o") + 1)
      .select("doc_id", "h")
      // persisted (r9): both legs of the prefix self-join read this —
      // the df aggregate + window chain runs once per action, not twice
      .persist()
    val cand = pre.as("x").join(pre.as("y"),
        col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val ov = cand
      .join(tc.select(col("doc_id").as("doc_a"), col("h")), "doc_a")
      .join(tc.select(col("doc_id").as("doc_b"), col("h")),
        Seq("doc_b", "h"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("overlap"))
    ov
      .join(n.select(col("doc_id").as("doc_a"), col("n").as("n_a")), "doc_a")
      .join(n.select(col("doc_id").as("doc_b"), col("n").as("n_b")), "doc_b")
      .filter(col("overlap") * col("overlap") * 1000000L >=
        lit(tpm2) * col("n_a") * col("n_b"))
  }

  /** Analytic MinHash-LSH S-curve planner (the banding analysis of
    * Leskovec, Rajaraman & Ullman, "Mining of Massive Datasets" §3.4) —
    * the DESIGN-side audit pairing with q215's measured calibration: for
    * each way to split `numHashes` lanes into (rows r × bands b), the
    * candidate probability at Jaccard similarity s is
    * `p = 1 − (1 − s^r)^b`. The planner tabulates p over a similarity
    * grid and scores each split by its false-positive mass below the
    * target threshold plus false-negative mass above it, flagging the
    * minimizer. At the default 0.7 target the BALANCED pick is r = 8
    * (cost 1.50 vs r = 2's 11.3, which is almost all FP mass) — the
    * family's bandRows = 2 default is the deliberate RECALL-heavy
    * corner (fn ≈ 0: a dedup pipeline would rather verify extra
    * candidates than miss a duplicate), and the planner quantifies
    * exactly what that choice costs before anyone pays for a run.
    *
    * Exact arithmetic: s and p live in 1e9 fixed point; every power is
    * a chain of `acc·x div 10⁹` integer multiply-floors (each product
    * ≤ 10¹⁸ < 2⁶³), so both engines replay the whole table bit-for-bit
    * — no pow(), no float. Grid × splits is a ~100-row frame: the
    * computation is codegen'd HOF folds, the windows are trivial.
    */
  def lshPlanner(
      spark: org.apache.spark.sql.SparkSession,
      numHashes: Int = 128,
      rows: Seq[Int] = Seq(1, 2, 4, 8, 16),
      gridPct: Seq[Int] = (5 to 95 by 5),
      targetPct: Int = 70): DataFrame = {
    require(rows.nonEmpty && rows.forall(r => r >= 1 && numHashes % r == 0),
      s"lshPlanner: every r must divide numHashes=$numHashes, got $rows")
    require(rows.distinct.size == rows.size, "lshPlanner: rows distinct")
    require(gridPct.nonEmpty && gridPct.forall(p => p >= 1 && p <= 99),
      s"lshPlanner: grid must be in [1, 99] pct, got $gridPct")
    require(targetPct >= 1 && targetPct <= 99, "lshPlanner: target pct")
    import spark.implicits._
    val S = 1000000000L
    val splits = rows.map(r => (r, numHashes / r)).toDF("r", "b")
    val grid = gridPct.map(p => (p, p.toLong * 10000000L)).toDF("pct", "s")
    val powFold = (base: String, n: String) =>
      s"IF($n = 1, $base, aggregate(transform(sequence(2, $n), " +
        s"__x -> $base), $base, (__acc, __y) -> __acc * __y div ${S}L))"
    val wSplit = Window.partitionBy("r", "b")
    val wAll = Window.orderBy(col("cost_fix"), col("r"))
    splits.crossJoin(grid)
      .withColumn("__sr", expr(powFold("s", "r")))
      .withColumn("__tb", expr(powFold(s"(${S}L - __sr)", "b")))
      .withColumn("p", lit(S) - col("__tb"))
      .withColumn("fp_fix",
        sum(when(col("pct") < targetPct, col("p")).otherwise(0L))
          .over(wSplit))
      .withColumn("fn_fix",
        sum(when(col("pct") >= targetPct, lit(S) - col("p")).otherwise(0L))
          .over(wSplit))
      .withColumn("cost_fix", col("fp_fix") + col("fn_fix"))
      .withColumn("is_best", dense_rank().over(wAll) === 1)
      .select(col("r"), col("b"), col("pct"), col("p").as("p_fix"),
        col("fp_fix"), col("fn_fix"), col("cost_fix"), col("is_best"))
      .orderBy("r", "pct")
  }

  /** Cosine threshold-sensitivity curve — the audit a practitioner runs
    * BEFORE picking an APSS threshold (the q236 jaccard-curve discipline
    * applied to [[apssCosinePairs]]): per candidate threshold, how many
    * pairs qualify and how many documents they touch. ONE loosest-rung
    * prefix-filtered pass feeds every ladder step (the prefix filter at
    * `min(thresholds)` is lossless for every tighter rung by
    * monotonicity), then each rung is one cross-multiplied integer
    * filter over the |pairs at min|-row scored table.
    *
    * SAMPLE-FIRST AT SCALE: a loose bottom rung keeps most of each
    * doc's postings (at t = 0.55 the prefix filter passes ~70%), so on
    * a boilerplate-heavy corpus — exactly where a dedup audit runs —
    * the loosest-rung candidate join approaches all-pairs. `samplePpm`
    * keeps a deterministic md5 ppm slice of the documents first (the
    * q49 rule — any engine replays the identical slice), making the
    * audit constant-cost at any corpus size; the chosen threshold then
    * runs on the corpus via [[apssCosinePairs]].
    */
  def apssCosineCurve(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      thresholdsPermil: Seq[Int],
      k: Int = 3,
      samplePpm: Int = 1000000,
      sampleSalt: String = "curve"): DataFrame = {
    require(thresholdsPermil.nonEmpty &&
      thresholdsPermil.forall(t => t >= 1 && t <= 1000),
      s"thresholdsPermil must be in [1, 1000], got $thresholdsPermil")
    require(thresholdsPermil.distinct.size == thresholdsPermil.size,
      s"thresholdsPermil must be distinct (a duplicate rung would " +
        s"double-count n_pairs), got $thresholdsPermil")
    requireSamplePpm(samplePpm, "apssCosineCurve")
    val base =
      if (samplePpm == 1000000) docs
      else docs.filter(samplePpmKeep(idCol, samplePpm, sampleSalt))
    // both rollups consume one scored subtree: the heavy upstream
    // exchanges (df agg, prefix window, candidate join) canonicalize
    // identically in both branches, so exchange reuse evaluates them
    // once within the joined plan — a localCheckpoint here measured as
    // pure overhead (its materialization barrier) across A/B runs
    val scored = apssScored(base, idCol, textCol, thresholdsPermil.min, k)
    val ladder = thresholdsPermil.map(t => s"($t)").mkString(", ")
    val qual = scored
      .crossJoin(broadcast(docs.sparkSession.sql(
        s"SELECT * FROM VALUES $ladder AS t(threshold_permil)")))
      .filter(col("overlap") * col("overlap") * 1000000L >=
        col("threshold_permil") * col("threshold_permil") *
          col("n_a") * col("n_b"))
      .select(col("threshold_permil").cast("long").as("threshold_permil"),
        col("doc_a"), col("doc_b"))
    val pairCounts = qual.groupBy("threshold_permil")
      .agg(count(lit(1)).as("n_pairs"))
    val docCounts = qual
      .select(col("threshold_permil"),
        explode(array(col("doc_a"), col("doc_b"))).as("id"))
      .groupBy("threshold_permil")
      .agg(countDistinct("id").as("n_docs"))
    pairCounts.join(docCounts, "threshold_permil")
      .orderBy("threshold_permil")
  }
}
