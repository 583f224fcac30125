package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID
  * (stopword-marker heuristic), quality scoring, token counting, and
  * document fingerprinting. Every operator is a narrow projection or a
  * single keyed aggregation — embarrassingly parallel at 100 TB, no shuffle
  * except the explicit group-bys.
  */
object TextStats {

  /** Marker stopwords per language for the n-gram-free language-ID
    * heuristic. Score = number of *distinct* markers present in the token
    * set; ties resolve in declaration order.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "zu", "mit"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "est", "dans"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "不", "人"))

  def tokensCol(textCol: String): Column =
    split(lower(trim(col(textCol))), "\\s+")

  /** Distinct-marker score for one language. */
  def langScore(tokens: Column, markers: Seq[String]): Column =
    size(array_intersect(tokens,
      array(markers.map(lit): _*))).cast("long")

  /** doc → (score_<lang>..., detected). Detection is a fixed-priority
    * arg-max so it is reproducible in plain SQL.
    */
  def langId(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokensCol(textCol)
    val scored = LangMarkers.foldLeft(df) { case (d, (lang, markers)) =>
      d.withColumn(s"score_$lang", langScore(toks, markers))
    }
    val langs = LangMarkers.map(_._1)
    val detected = langs.init.foldRight(lit(langs.last): Column) {
      case (lang, fallback) =>
        val isMax = langs.filter(_ != lang).foldLeft(lit(true)) { (acc, o) =>
          acc && col(s"score_$lang") >= col(s"score_$o")
        }
        when(isMax, lit(lang)).otherwise(fallback)
    }
    scored.withColumn("detected", detected)
  }

  /** Quality features: char/token counts, distinct-token ratio, mean token
    * length, punctuation ratio (ASCII punct chars / chars), stopword ratio
    * (en-marker token occurrences / tokens), and a bucketed quality label.
    * Ratios are plain IEEE divisions — engine-portable.
    */
  /** The q24 verdict thresholds in INTEGER-EXACT form (cross-multiplied
    * `n_uniq·10 < n_tokens·3` instead of q24's reference-parity rounded
    * float ratio — the two differ only at 4-decimal boundary values):
    * the single source of truth for every query that re-applies the
    * rule (q182's rater A, q191's quality mix), so a cutoff change
    * cannot silently desync them. Labels parameterized because callers'
    * oracles fixed different spellings.
    */
  def qualityVerdictExact(nTokens: Column, nUniq: Column,
      shortLabel: String, repLabel: String): Column =
    when(nTokens < 20, shortLabel)
      .when(nUniq * 10 < nTokens * 3, repLabel)
      .otherwise("ok")

  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokensCol(textCol)
    val enMarkers = array(LangMarkers.head._2.map(lit): _*)
    df.withColumn("n_chars", length(col(textCol)).cast("long"))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_uniq", size(array_distinct(toks)).cast("long"))
      // \p{Punct} (Java) and [[:punct:]] (RE2/DuckDB) are the same 32
      // ASCII punctuation characters — the oracle replays this class
      .withColumn("n_punct",
        size(regexp_extract_all(col(textCol), lit("\\p{Punct}"), lit(0)))
          .cast("long"))
      .withColumn("n_stopwords",
        size(filter(toks, t => array_contains(enMarkers, t))).cast("long"))
      .withColumn("uniq_ratio",
        round(col("n_uniq").cast("double") / col("n_tokens"), 4))
      .withColumn("mean_token_len", round(
        (col("n_chars") - (col("n_tokens") - 1)).cast("double") /
          col("n_tokens"), 4))
      // n_chars can be 0 (empty text) and Spark's null-on-zero-divide
      // diverges from DuckDB's IEEE NaN — both sides guard explicitly to
      // null. n_tokens needs no guard: split('') yields [""], so it's ≥ 1.
      .withColumn("punct_ratio",
        when(col("n_chars") > 0,
          round(col("n_punct").cast("double") / col("n_chars"), 4)))
      .withColumn("stopword_ratio",
        round(col("n_stopwords").cast("double") / col("n_tokens"), 4))
      .withColumn("quality",
        when(col("n_tokens") < 20, "too_short")
          .when(col("uniq_ratio") < 0.3, "repetitive")
          .otherwise("ok"))
  }

  /** Whitespace token count + BPE-ish regex segment count (letter runs,
    * digit runs, single punctuation marks). The segment count runs as the
    * fused count-only [[graft.functions.TokenCountExpr]] (bit-parity with
    * [[reTokensComposed]], TokenCountSpec) — the composed
    * `size(regexp_extract_all(...))` materialized every match per document
    * just to count them, the per-row hot loop of the r3 bench. Registers
    * the expression on the frame's own session.
    */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame = {
    graft.functions.VectorExpressions.register(df.sparkSession)
    df.withColumn("ws_tokens", size(tokensCol(textCol)).cast("long"))
      .withColumn("re_tokens", expr(s"graft_token_count(`$textCol`)"))
  }

  /** The composed regexp form of the segment count: the engine-portable
    * reference formulation [[graft.functions.TokenCountExpr]] is
    * parity-tested against.
    */
  def reTokensComposed(textCol: String): Column =
    size(regexp_extract_all(
      lower(col(textCol)), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
      .cast("long")

  /** Polynomial rolling hash over the character stream, mod 1e9+7 —
    * a deterministic whole-document fingerprint computable in any engine
    * with a left fold (`(acc * 31 + ascii(char)) % p`). Runs as the fused
    * codegen'd [[graft.functions.FingerprintExpr]] (bit-parity with
    * [[fingerprintComposed]], FingerprintSpec); callers must have run
    * [[graft.functions.VectorExpressions.register]].
    */
  def fingerprint(textCol: String): Column =
    expr(s"graft_fingerprint(`$textCol`)")

  /** Redaction patterns shared by [[redact]] and its SQL oracle: kept to
    * the regex subset Java and RE2 agree on (no backrefs, no lookaround).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^\\s]+"

  /** PII-style scrubbing for training corpora: emails then URLs replaced
    * with placeholder tokens, with per-document match counts for audit.
    * A narrow projection — embarrassingly parallel, no shuffle.
    */
  def redact(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_emails",
        size(regexp_extract_all(col(textCol), lit(EmailRe), lit(0)))
          .cast("long"))
      .withColumn("n_urls",
        size(regexp_extract_all(col(textCol), lit(UrlRe), lit(0)))
          .cast("long"))
      .withColumn("redacted",
        regexp_replace(
          regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
          UrlRe, "<URL>"))

  /** PII audit card — the detector battery a release review runs BEFORE
    * redaction decides anything: per-document counts of email addresses,
    * 16-digit card-number candidates split by the Luhn checksum
    * (ISO/IEC 7812 — the check that separates a real PAN shape from a
    * random digit run), and IPv4 candidates split by octet-range
    * validity. Everything is exact integer arithmetic over extracted
    * candidates (the Luhn fold is a 16-step integer aggregate), so any
    * engine replays it bit-for-bit. Pure per-row projection — zero
    * shuffles at any scale. [[redact]] is the matching scrubber.
    */
  def piiAudit(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Luhn over a 16-char digit string: from the left in even length,
    // odd positions double (they sit at even offsets from the right)
    val luhnOk = "aggregate(sequence(1, 16), 0, (a, j) -> a + " +
      "if(j % 2 = 1, " +
      "if(cast(substr(c, j, 1) as int) * 2 > 9, " +
      "cast(substr(c, j, 1) as int) * 2 - 9, " +
      "cast(substr(c, j, 1) as int) * 2), " +
      "cast(substr(c, j, 1) as int))) % 10 = 0"
    val ipOk = "forall(split(ip, '\\\\.'), o -> cast(o as int) <= 255)"
    df.select(col(idCol),
        regexp_extract_all(col(textCol), lit(EmailRe), lit(0))
          .as("__em"),
        regexp_extract_all(col(textCol), lit("\\d{16}"), lit(0))
          .as("__cc"),
        regexp_extract_all(col(textCol),
          lit("\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"), lit(0))
          .as("__ip"))
      .select(col(idCol),
        size(col("__em")).cast("long").as("n_emails"),
        size(col("__cc")).cast("long").as("n_cards"),
        expr(s"size(filter(__cc, c -> $luhnOk))").cast("long")
          .as("n_cards_valid"),
        size(col("__ip")).cast("long").as("n_ips"),
        expr(s"size(filter(__ip, ip -> $ipOk))").cast("long")
          .as("n_ips_valid"))
  }

  /** Deterministic stratified sampling for training-mix construction: keep
    * a row iff `md5_60(salt || ':' || id) % 10000 < rate(stratum) * 10000`.
    * Hash-based (not `df.sample`): the same row is kept or dropped
    * identically on every run, engine, partitioning, and cluster size —
    * reproducible data mixes, per-stratum rates, no RNG state. Basis-point
    * integer compares keep the threshold exact. Strata absent from `rates`
    * are dropped (rate 0).
    */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      rates: Map[String, Double],
      salt: String = "mix1"): DataFrame = {
    require(rates.values.forall(r => r >= 0 && r <= 1), "rates must be [0,1]")
    val bp = rates.foldLeft(lit(0L)) { case (acc, (stratum, rate)) =>
      when(col(strataCol) === stratum,
        lit(math.round(rate * 10000).toLong)).otherwise(acc)
    }
    val bucket = expr(
      s"CAST(conv(substring(md5(concat('$salt', ':', " +
        s"CAST(`$idCol` AS STRING))), 1, 15), 16, 10) AS BIGINT) % 10000")
    df.filter(bucket < bp)
  }

  /** The composed HOF form of [[fingerprint]]: materializes one
    * single-character string per character per document — the
    * engine-portable reference formulation the fused expression is
    * parity-tested against.
    */
  def fingerprintComposed(textCol: String): Column = expr(
    s"aggregate(split(`$textCol`, ''), 0L, " +
      "(acc, c) -> (acc * 31 + ascii(c)) % 1000000007L)")

  /** Fixed-size token chunking with stride — the pre-tokenizer split every
    * training pipeline runs before embedding or packing. One row per
    * (doc, window): start offsets advance by `stride` (< `chunkSize` ⇒
    * overlapping context windows), the trailing window is kept short. The
    * chunk itself leaves as an md5 over the joined tokens plus its token
    * count, so downstream joins carry fixed-width scalars, not text.
    *
    * 100 TB shape: ZERO shuffles — sequence → explode → slice is a narrow
    * per-row fan-out that runs inside the scan stage; output is
    * ~n_tokens/stride rows per doc with no driver or cross-partition
    * involvement.
    */
  def chunkTokens(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int = 64,
      stride: Int = 48): DataFrame = {
    require(chunkSize > 0 && stride > 0)
    docs
      .select(col(idCol), graft.ext.Dedup.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .withColumn("__n", size(col("__toks")))
      .withColumn("__start", explode(expr(s"sequence(1, __n, $stride)")))
      .withColumn("__chunk",
        expr(s"slice(__toks, __start, least($chunkSize, __n - __start + 1))"))
      .select(col(idCol),
        expr(s"CAST((__start - 1) div $stride AS INT)").as("chunk_idx"),
        (col("__start") - 1).cast("long").as("start_off"),
        size(col("__chunk")).cast("long").as("n_chunk_tokens"),
        md5(concat_ws(" ", col("__chunk"))).as("chunk_md5"))
  }

  /** Sequence packing (concat-and-split): documents are laid head-to-tail
    * into `buckets` independent token streams and cut into fixed
    * `blockSize` training blocks; each doc reports its stream offset and
    * the first/last block it lands in (straddlers span two). This is the
    * GPT-style packing layout computed as METADATA — no token is ever
    * moved, so the actual payload assembly can happen lazily at read time.
    *
    * 100 TB shape: one shuffle — a per-bucket running-sum window ordered
    * by doc id. The bucket count bounds each window's partition (pick
    * ~#executor-cores × k); packing is embarrassingly parallel ACROSS
    * buckets by construction, which is exactly how a cluster packs: one
    * sequential stream per worker, never a global order.
    */
  def packSequences(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockSize: Int = 256,
      buckets: Int = 32): DataFrame = {
    require(blockSize > 0 && buckets > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy(idCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs
      .select(col(idCol),
        size(graft.ext.Dedup.tokens(col(textCol))).cast("long").as("n_toks"))
      .filter(col("n_toks") > 0)
      .withColumn("bucket", (col(idCol) % buckets).cast("long"))
      .withColumn("__cum", sum("n_toks").over(w))
      .select(col(idCol), col("bucket"), col("n_toks"),
        (col("__cum") - col("n_toks")).cast("long").as("start_off"),
        expr(s"CAST((__cum - n_toks) div $blockSize AS BIGINT)")
          .as("block_first"),
        expr(s"CAST((__cum - 1) div $blockSize AS BIGINT)")
          .as("block_last"))
  }

  /** Packing-efficiency curve — the audit behind choosing a training
    * context length: for each candidate block size, how many blocks the
    * packed corpus needs ([[packSequences]]'s contiguous-stream packing),
    * what fraction of block capacity is padding waste (exact ppm), and
    * how many documents get SPLIT across a block boundary (the
    * attention-mask / quality cost of packing tighter). One cumulative
    * pass over the corpus serves every rung — per-bucket running
    * offsets are block-size-independent, so rungs differ only in the
    * final integer divisions.
    */
  def packingCurve(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockSizes: Seq[Int],
      buckets: Int = 32): DataFrame = {
    require(blockSizes.nonEmpty && blockSizes.forall(_ >= 1),
      s"packingCurve: block sizes must be >= 1, got $blockSizes")
    require(blockSizes.distinct.size == blockSizes.size,
      s"packingCurve: block sizes must be distinct, got $blockSizes — " +
        "duplicate rungs would merge in the groupBy and double-count")
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val w = Window.partitionBy("bucket").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // one cumulative pass, shared by every rung and both aggregates
    val cum = docs
      .select(col(idCol),
        size(graft.ext.Dedup.tokens(col(textCol))).cast("long")
          .as("n_toks"))
      .filter(col("n_toks") > 0)
      .withColumn("bucket", (col(idCol) % buckets).cast("long"))
      .withColumn("__cum", sum("n_toks").over(w))
      .localCheckpoint()
    val rungs = broadcast(blockSizes.map(_.toLong).toDF("block_size"))
    val split = cum.crossJoin(rungs)
      .filter(expr(
        "(__cum - n_toks) div block_size <> (__cum - 1) div block_size"))
      .groupBy("block_size")
      .agg(count(lit(1)).as("n_split_docs"))
    cum.groupBy("bucket").agg(max("__cum").as("t"))
      .crossJoin(rungs)
      .groupBy("block_size")
      .agg(sum(expr("(t + block_size - 1) div block_size"))
          .as("n_blocks"),
        sum("t").as("total_tokens"))
      .join(split, Seq("block_size"), "left")
      .na.fill(0L, Seq("n_split_docs"))
      .withColumn("waste_ppm", expr(
        "(n_blocks * block_size - total_tokens) * 1000000 div " +
          "(n_blocks * block_size)"))
      .select(col("block_size"), col("n_blocks"), col("total_tokens"),
        col("waste_ppm"), col("n_split_docs"))
  }

  /** T5-style span-corruption example builder (Raffel et al. 2020, the
    * C4/T5 denoising objective): masked spans leave a sentinel
    * `<extra_id_k>` in the INPUT and re-emit as `<extra_id_k> tokens…`
    * in the TARGET, closed by a final sentinel — the step that turns a
    * curated corpus into model-ready (input, target) pairs.
    *
    * Span starts are hash-decided per (salt, doc, position) — md5-based
    * like every sampling rule here, so the same doc corrupts identically
    * on any engine, partitioning, or rerun (no RNG state); a start
    * inside an active span is suppressed by the left fold (spans never
    * overlap), which is the only sequential dependency and it lives
    * INSIDE one row — the operator is a zero-shuffle projection at any
    * scale. Expected mask rate is spanLen/rate tokens.
    *
    * Tokens must not contain `'|'` (the fold's state separator; the
    * whitespace tokenizer never emits one from natural text).
    */
  def spanCorrupt(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      rate: Int = 20,
      spanLen: Int = 3,
      salt: String = "t5"): DataFrame = {
    require(rate >= 1 && spanLen >= 1,
      s"spanCorrupt: rate/spanLen must be >= 1, got $rate/$spanLen")
    val le = "CAST(split_part(a, '|', 1) AS INT)"
    val k = "split_part(a, '|', 2)"
    val inp = "split_part(a, '|', 3)"
    val tgt = "split_part(a, '|', 4)"
    val tok = "element_at(__w, i)"
    // explicit BIGINT cast on conv's string result (the Dedup.hash60
    // discipline): without it, ANSI-off sessions coerce the 60-bit hex
    // to DOUBLE and the mod silently picks different spans
    val flag = s"CAST(conv(substring(md5(concat('$salt:', " +
      s"cast($idCol as string), ':', cast(i as string))), 1, 15), " +
      s"16, 10) AS BIGINT) % $rate = 0"
    val fold =
      s"""aggregate(sequence(1, size(__w)), '0|0||', (a, i) -> CASE
         |  WHEN i <= $le THEN concat(split_part(a, '|', 1), '|', $k,
         |    '|', $inp, '|', $tgt, ' ', $tok)
         |  WHEN $flag THEN concat(
         |    cast(i + ${spanLen - 1} as string), '|',
         |    cast(cast($k as int) + 1 as string), '|',
         |    $inp, ' <extra_id_', $k, '>', '|',
         |    $tgt, ' <extra_id_', $k, '> ', $tok)
         |  ELSE concat(split_part(a, '|', 1), '|', $k, '|',
         |    $inp, ' ', $tok, '|', $tgt)
         |END)""".stripMargin.replaceAll("\n", " ")
    docs
      .withColumn("__w", filter(tokensCol(textCol), t => t =!= ""))
      .filter(size(col("__w")) >= 1)
      .withColumn("__f", expr(fold))
      .select(col(idCol),
        size(col("__w")).cast("long").as("n_tokens"),
        expr("CAST(split_part(__f, '|', 2) AS BIGINT)").as("n_spans"),
        expr("ltrim(split_part(__f, '|', 3))").as("input_text"),
        expr("ltrim(concat(split_part(__f, '|', 4), ' <extra_id_', " +
          "split_part(__f, '|', 2), '>'))").as("target_text"))
  }

  /** Fill-in-the-middle transformation (Bavarian et al. 2022, "Efficient
    * Training of Language Models to Fill in the Middle" — the OpenAI FIM
    * recipe): each document splits at two hash-decided cut points into
    * prefix / middle / suffix and re-serializes in PSM order
    * (`<fim_prefix> P <fim_suffix> S <fim_middle> M`), teaching a causal
    * LM to infill. Cut points are md5-derived per (salt, doc) — engine-
    * and partitioning-independent, no RNG state; empty parts are legal
    * (cuts may coincide), exactly as in the paper's uniform split.
    * Zero-shuffle projection. [[spanCorrupt]] is the T5-family sibling.
    */
  def fimTransform(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      salt: String = "fim"): DataFrame = {
    // BIGINT cast for ANSI-off sessions — see spanCorrupt's flag note
    def h(tag: String): String =
      s"CAST(conv(substring(md5(concat('$salt$tag:', " +
        s"cast($idCol as string))), 1, 15), 16, 10) AS BIGINT)"
    docs
      .withColumn("__w", filter(tokensCol(textCol), t => t =!= ""))
      .filter(size(col("__w")) >= 1)
      .withColumn("__n", size(col("__w")))
      .withColumn("__c1", expr(s"cast(${h("1")} % (__n + 1) as int)"))
      .withColumn("__c2",
        expr(s"cast(__c1 + ${h("2")} % (__n - __c1 + 1) as int)"))
      .select(col(idCol),
        col("__n").cast("long").as("n_tokens"),
        col("__c1").cast("long").as("cut1"),
        col("__c2").cast("long").as("cut2"),
        expr("concat('<fim_prefix> ', " +
          "array_join(slice(__w, 1, __c1), ' '), " +
          "' <fim_suffix> ', " +
          "array_join(slice(__w, __c2 + 1, __n - __c2), ' '), " +
          "' <fim_middle> ', " +
          "array_join(slice(__w, __c1 + 1, __c2 - __c1), ' '))")
          .as("fim_text"))
  }

  /** Preference-pair builder — the DPO/RLHF training-example shape: per
    * group (a prompt, a source, a topic bucket), pair the BEST-scoring
    * candidate (chosen) with the WORST (rejected), keeping the pair only
    * when the score gap clears `minGap` (a pair the reward signal can't
    * separate teaches nothing). Scores are caller-supplied integers (a
    * quality score, a reward-model output bucketed to ppm, an exact
    * ratio), so the pick is deterministic: ties break on ascending id at
    * both ends, and a group whose best and worst are the same row emits
    * nothing.
    *
    * 100 TB shape: ONE shuffle — both row_number windows share the group
    * partitioning, so best and worst resolve in the same exchange; the
    * pair join is group-key equi (1 row per group per side).
    */
  def preferencePairs(
      scored: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      scoreCol: String,
      minGap: Long = 1L): DataFrame = {
    require(groupCols.nonEmpty, "preferencePairs: at least one group column")
    require(minGap >= 0, s"preferencePairs: minGap must be >= 0, got $minGap")
    val part = groupCols.map(col)
    val wBest = org.apache.spark.sql.expressions.Window.partitionBy(part: _*)
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val wWorst = org.apache.spark.sql.expressions.Window.partitionBy(part: _*)
      .orderBy(col(scoreCol).asc, col(idCol).asc)
    val ranked = scored
      .withColumn("__rb", row_number().over(wBest))
      .withColumn("__rw", row_number().over(wWorst))
    val chosen = ranked.filter(col("__rb") === 1)
      .select(part :+ col(idCol).as("chosen_id") :+
        col(scoreCol).as("chosen_score"): _*)
    val rejected = ranked.filter(col("__rw") === 1)
      .select(part :+ col(idCol).as("rejected_id") :+
        col(scoreCol).as("rejected_score"): _*)
    chosen.join(rejected, groupCols)
      .filter(col("chosen_id") =!= col("rejected_id") &&
        col("chosen_score") - col("rejected_score") >= minGap)
      .select(part ++ Seq(col("chosen_id"), col("rejected_id"),
        col("chosen_score"), col("rejected_score"),
        (col("chosen_score") - col("rejected_score")).as("gap")): _*)
  }

  /** Intra-document repetition signals (the Gopher-family quality rules a
    * training-data pass thresholds on): duplicate-token fraction and the
    * most-frequent-bigram share of all bigram slots. Tokens are the
    * filtered dedup tokenization ([[Dedup.tokens]]) so the signals line up
    * with the near-dup family, not the raw-split counting family.
    *
    * 100 TB shape: ZERO shuffles — the most-frequent-bigram count is a
    * max-run scan over the doc's SORTED bigram array (`array_sort` +
    * `aggregate` HOF), so the whole operator is a narrow projection; the
    * naive formulation (explode bigrams → two groupBys) would shuffle one
    * row per bigram occurrence of the entire corpus. Docs with zero tokens
    * are dropped (no signal to threshold); a single-token doc has no
    * bigrams → `top_bigram_count` 0, `top_bigram_frac` null.
    */
  def repetition(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), Dedup.tokens(col(textCol)).as("__toks"))
      .withColumn("n_tokens", size(col("__toks")).cast("long"))
      .where(col("n_tokens") > 0)
      .withColumn("n_distinct",
        size(array_distinct(col("__toks"))).cast("long"))
      // sequence(1, 0) would be a DESCENDING range — guard short docs
      .withColumn("__bg", expr(
        "IF(size(__toks) >= 2, " +
          "array_sort(transform(sequence(1, size(__toks) - 1), " +
          "__i -> concat_ws(' ', element_at(__toks, CAST(__i AS INT)), " +
          "element_at(__toks, CAST(__i + 1 AS INT))))), " +
          "CAST(array() AS ARRAY<STRING>))"))
      .withColumn("top_bigram_count", expr(
        "aggregate(__bg, " +
          "struct(CAST(NULL AS STRING) AS prev, 0L AS run, 0L AS best), " +
          "(acc, x) -> struct(x AS prev, " +
          "IF(x <=> acc.prev, acc.run + 1L, 1L) AS run, " +
          "greatest(acc.best, IF(x <=> acc.prev, acc.run + 1L, 1L)) AS best), " +
          "acc -> acc.best)"))
      .select(col(idCol),
        col("n_tokens"), col("n_distinct"),
        round(lit(1.0) -
          col("n_distinct").cast("double") / col("n_tokens"), 4)
          .as("dup_token_ratio"),
        col("top_bigram_count"),
        when(col("n_tokens") >= 2,
          round(col("top_bigram_count").cast("double") /
            (col("n_tokens") - 1), 4)).as("top_bigram_frac"))

  /** Hashing-trick feature buckets: every token maps to
    * `hash60(token) % numBuckets`, and the result is the LONG-FORM hashed
    * feature matrix — one row per (group, bucket) with total term count
    * and distinct-token count (the collision diagnostic). The md5-derived
    * 60-bit hash is the repo's cross-engine workhorse: DuckDB replays the
    * identical bucket ids, which a seeded `xxhash64` could not. Shape at
    * scale: explode → one hash-partitioned aggregate on (group, bucket),
    * output cardinality ≤ |groups| × numBuckets regardless of corpus size.
    * Reference analogue: the reference has no feature hashing; this is a
    * training-pipeline extension (vectorize text without a vocab build).
    */
  def hashedFeatures(
      docs: DataFrame,
      groupCol: String,
      textCol: String,
      numBuckets: Int = 256): DataFrame =
    docs
      .select(col(groupCol), explode(Dedup.tokens(col(textCol))).as("tok"))
      .withColumn("bucket", Dedup.hash60(col("tok")) % numBuckets)
      .groupBy(groupCol, "bucket")
      .agg(count(lit(1)).as("n_terms"),
        countDistinct("tok").as("n_uniq"))

  /** Per-document unigram surprisal in INTEGER bits: each token contributes
    * `floor(log2(N div c))` where `c` is its corpus frequency and `N` the
    * total token count — computed as `length(bin(N div c)) - 1`, pure
    * integer arithmetic, so the score is bit-identical in any engine (no
    * floating log). High average surprisal = rare/unusual vocabulary
    * (possible garbage or mis-langed text); low = repetitive boilerplate —
    * the KenLM-perplexity quality-filter signal, integerized.
    *
    * Shape at 100 TB: one corpus scan builds the vocab counts (the only
    * corpus-sized shuffle), the per-token scoring join is a plain (tok)
    * equi-join AQE can split, and the per-doc rollup partially aggregates
    * map-side. The total-count `N` rides a 1-row broadcast.
    */
  /** Bigram conditional surprisal in whole bits — the next step up from
    * [[surprisalBits]]'s unigram model: each bigram (w₁,w₂) contributes
    * `⌊log₂(c(w₁·) / c(w₁w₂))⌋` = −⌊log₂ P(w₂|w₁)⌋ quantized, where
    * c(w₁·) counts bigram CONTEXTS starting with w₁ (so probabilities
    * condition correctly and the per-context ratios are ≥ 1). Same
    * libm-free `length(bin(a div b))−1` floor-log₂, so the per-doc sums
    * are exact integers any engine reproduces. Repetitive, formulaic
    * text (low conditional entropy) scores LOW bits per bigram — the
    * quality signal unigram surprisal misses, because a doc can use
    * rare words in utterly predictable sequences. Docs with fewer than
    * two tokens emit no row.
    *
    * Scale shape: bigrams explode once (narrow), two vocabulary-sized
    * count aggregates (map-side combinable), and two equi-joins keyed by
    * bigram/context — AQE's skew handling covers the hot-context keys
    * ("the …"); nothing keys wider than a bigram string.
    */
  def bigramSurprisalBits(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = filter(tokensCol(textCol), t => t =!= "")
    val bg = docs
      .select(col(idCol), toks.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(0, size(toks) - 2), " +
          "i -> struct(toks[i] AS w1, " +
          "concat(toks[i], ' ', toks[i + 1]) AS bgm))")).as("b"))
      .select(col(idCol), col("b.w1").as("w1"), col("b.bgm").as("bgm"))
    val c1 = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
    val c12 = bg.groupBy("bgm").agg(count(lit(1)).as("c12"))
    bg.join(c12, "bgm").join(c1, "w1")
      .select(col(idCol),
        (length(bin(expr("c1 div c12"))) - 1).cast("long").as("bits"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        sum("bits").as("bigram_bits"))
      .withColumn("avg_millibits",
        expr("bigram_bits * 1000 div n_bigrams"))
  }

  /** Stupid-backoff trigram scoring (Brants et al. 2007, "Large Language
    * Models in Machine Translation" §4 — the web-scale LM smoothing that
    * needs no discounting pass) in whole bits: each trigram position in a
    * SCORED document costs
    *
    *   c(w₁w₂w₃) > 0:  ⌊log₂(c(w₁w₂·) div c(w₁w₂w₃))⌋          (hit)
    *   c(w₂w₃)   > 0:  2 + ⌊log₂(c(w₂·) div c(w₂w₃))⌋          (backoff)
    *   otherwise:      4 + ⌊log₂(N div max(c(w₃), 1))⌋          (unigram)
    *
    * with counts from a separate TRAIN corpus — the split is what makes
    * backoff real (train = score would make every trigram a hit). The
    * backoff penalty is 2 bits per level: α = 1/4, a power of two, so the
    * whole score stays in the exact `length(bin(a div b)) − 1` integer
    * discipline (the paper's α = 0.4 is a free constant; the quantized
    * choice is what any engine replays bit-for-bit). Unseen unigrams
    * floor at count 1 (add-one, the q272 smoothing discipline). This is
    * the CCNet-style perplexity filter one step up from [[surprisalBits]]
    * / [[bigramSurprisalBits]]: held-out documents whose n-grams the
    * train corpus predicts poorly score HIGH bits — likely garbage or
    * out-of-domain.
    *
    * Scale shape: n-gram positions explode once per order (narrow);
    * count tables are map-side-combinable aggregates; scoring is five
    * string-keyed equi-joins (AQE splits the hot "the …" contexts) and
    * the total-count N rides a 1-row broadcast. Nothing keys wider than
    * a trigram string.
    */
  def trigramBackoffBits(
      train: DataFrame, docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val toks = filter(tokensCol(textCol), t => t =!= "")
    def triRows(df: DataFrame): DataFrame = df
      .select(col(idCol), toks.as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col(idCol), explode(expr(
        "transform(sequence(0, size(toks) - 3), " +
          "i -> struct(toks[i] AS w1, toks[i + 1] AS w2, " +
          "toks[i + 2] AS w3))")).as("t"))
      .select(col(idCol), col("t.w1").as("w1"), col("t.w2").as("w2"),
        col("t.w3").as("w3"))
    def bgRows(df: DataFrame): DataFrame = df
      .select(toks.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(toks) - 2), " +
          "i -> struct(toks[i] AS w2, toks[i + 1] AS w3))")).as("b"))
      .select(col("b.w2").as("w2"), col("b.w3").as("w3"))
    val unRows = train.select(explode(toks).as("w"))
    val tTri = triRows(train)
    val c123 = tTri.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c123"))
    val c12 = tTri.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val tBg = bgRows(train)
    val c23 = tBg.groupBy("w2", "w3").agg(count(lit(1)).as("c23"))
    val c2 = tBg.groupBy("w2").agg(count(lit(1)).as("c2"))
    val c3 = unRows.groupBy("w").agg(count(lit(1)).as("c3"))
      .withColumnRenamed("w", "w3")
    val nn = unRows.agg(count(lit(1)).as("n"))
    triRows(docs)
      .join(c123, Seq("w1", "w2", "w3"), "left")
      .join(c12, Seq("w1", "w2"), "left")
      .join(c23, Seq("w2", "w3"), "left")
      .join(c2, Seq("w2"), "left")
      .join(c3, Seq("w3"), "left")
      .crossJoin(broadcast(nn))
      .select(col(idCol),
        when(col("c123").isNotNull, lit(0L))
          .when(col("c23").isNotNull, lit(1L)).otherwise(lit(2L)).as("lvl"),
        when(col("c123").isNotNull,
          (length(bin(expr("c12 div c123"))) - 1).cast("long"))
          .when(col("c23").isNotNull,
            lit(2L) + (length(bin(expr("c2 div c23"))) - 1).cast("long"))
          .otherwise(lit(4L) +
            (length(bin(expr("n div greatest(coalesce(c3, 0L), 1L)"))) - 1)
              .cast("long"))
          .as("bits"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_trigrams"),
        sum(when(col("lvl") === 0, 1L).otherwise(0L)).as("n_tri"),
        sum(when(col("lvl") === 1, 1L).otherwise(0L)).as("n_bi"),
        sum(when(col("lvl") === 2, 1L).otherwise(0L)).as("n_uni"),
        sum("bits").as("backoff_bits"))
      .withColumn("avg_millibits",
        expr("backoff_bits * 1000 div n_trigrams"))
  }

  /** Distributed BATCH-PERCEPTRON training of a linear quality filter
    * (Rosenblatt 1958's rule in Collins 2002's batch form) — the
    * LEARNED counterpart of the fixed-weight q233 classifier, with no
    * float anywhere: features are the q233 integer columns
    * `(1, min(n_toks, 512), stop_bp, digit_bp, upper_bp)`, labels come
    * from the independent q232 surprisal signal
    * (`avg_millibits < posMillibitsBelow` → +1), and each iteration
    * updates `w ← w + Σ_misclassified y·x` — an ORDER-FREE integer sum,
    * so the whole trajectory is deterministic under any partitioning
    * and replays as unrolled SQL CTEs (the BPE/unigram training-oracle
    * discipline).
    *
    * Output: one row per iteration — the misclassified count under the
    * incoming weights and the UPDATED weight vector. A converging
    * n_mis column is the training curve; the final row's weights drop
    * into [[classifierMargin]]'s evaluation shape (zero-shuffle linear
    * scoring) unchanged.
    *
    * Scale shape: the feature+label frame builds once (classifier
    * features are a projection; the label join is q232's vocab join)
    * and is lineage-cut; each iteration is ONE map-side-combinable
    * aggregate with the current weights as literals. The per-iteration
    * collect is 6 integers (the weight vector — a driver-sized model by
    * definition, the Bpe best-pair pattern).
    */
  def perceptronTrain(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      iters: Int = 5,
      posMillibitsBelow: Long = 4250L): DataFrame = {
    require(iters >= 1 && iters <= 50,
      s"perceptronTrain: iters must be in [1, 50], got $iters")
    val sess = docs.sparkSession
    import sess.implicits._
    val feats = classifierMargin(docs, idCol, textCol)
      .select(col(idCol), expr("least(n_toks, 512)").as("x1"),
        col("stop_bp").as("x2"), col("digit_bp").as("x3"),
        col("upper_bp").as("x4"))
    val labels = surprisalBits(docs, idCol, textCol)
      .select(col(idCol),
        when(col("avg_millibits") < posMillibitsBelow, 1L)
          .otherwise(-1L).as("y"))
    // iterative training re-reads this frame once per iteration — the
    // across-actions case where a lineage cut IS the right tool
    val f = feats.join(labels, idCol).localCheckpoint()
    var w = Array(0L, 0L, 0L, 0L, 0L)
    val rows = Seq.newBuilder[(Int, Long, Long, Long, Long, Long, Long)]
    // unpersist the checkpointed frame when training ends (success or
    // failure) — the trainWordpiece discipline; without it every call
    // leaks the cached feature blocks for the session's lifetime
    try (1 to iters).foreach { it =>
      val mis = expr(
        s"y * (${w(0)}L + ${w(1)}L * x1 + ${w(2)}L * x2 + " +
          s"${w(3)}L * x3 + ${w(4)}L * x4) <= 0")
      val r = f.agg(
        sum(when(mis, 1L).otherwise(0L)).as("n_mis"),
        sum(when(mis, col("y")).otherwise(0L)).as("d0"),
        sum(when(mis, col("y") * col("x1")).otherwise(0L)).as("d1"),
        sum(when(mis, col("y") * col("x2")).otherwise(0L)).as("d2"),
        sum(when(mis, col("y") * col("x3")).otherwise(0L)).as("d3"),
        sum(when(mis, col("y") * col("x4")).otherwise(0L)).as("d4"))
        .head()
      val nMis = r.getLong(0)
      w = Array(w(0) + r.getLong(1), w(1) + r.getLong(2),
        w(2) + r.getLong(3), w(3) + r.getLong(4), w(4) + r.getLong(5))
      rows += ((it, nMis, w(0), w(1), w(2), w(3), w(4)))
    } finally { f.unpersist(); () }
    sess.createDataFrame(rows.result())
      .toDF("iter", "n_mis", "w_bias", "w_toks", "w_stop", "w_digit",
        "w_upper")
  }

  /** The ADDITIVE dataset-card rows of one document batch — the
    * stream-maintainable subset of q191's card, designed for
    * [[Reports.foldSummed]] on (section, item): corpus totals
    * (docs/chars/tokens), per-language and per-source doc counts, and
    * the quality-verdict histogram. Every row is an integer counter over
    * per-doc-decidable rules, so per-batch cards fold EXACTLY to the
    * whole-corpus card under any stream slicing.
    *
    * Deliberately absent (documented, not silent): q191's
    * `exact_dup_docs` row — exact-dup counting needs the text-hash
    * multiset (corpus-sized state, against the report-sized contract);
    * a streamed pipeline gets dup accounting from the maintained dedup
    * index (q313/q314) instead. The distinct-language/source totals are
    * NOT folded as counters — they derive at read time from the
    * maintained lang/source sections ([[datasetCardFinish]]).
    */
  def datasetCardBatch(
      docs: DataFrame, textCol: String): DataFrame = {
    val f = qualityFeatures(docs, textCol)
    val corpus = f.agg(count(lit(1)).as("docs"),
        sum("n_chars").cast("long").as("chars"),
        sum("n_tokens").cast("long").as("tokens"))
      .select(explode(expr(
        "array(struct('docs' AS item, docs AS n)," +
          " struct('chars' AS item, chars AS n)," +
          " struct('tokens' AS item, tokens AS n))")).as("e"))
      .select(lit("corpus").as("section"), col("e.item").as("item"),
        col("e.n").as("n"))
    val langs = f.groupBy(col("lang").as("item"))
      .agg(count(lit(1)).as("n"))
      .select(lit("lang").as("section"), col("item"), col("n"))
    val sources = f.groupBy(col("source").as("item"))
      .agg(count(lit(1)).as("n"))
      .select(lit("source").as("section"), col("item"), col("n"))
    val quality = f
      .select(qualityVerdictExact(col("n_tokens"), col("n_uniq"),
        "too_short", "repetitive").as("item"))
      .groupBy("item").agg(count(lit(1)).as("n"))
      .select(lit("quality").as("section"), col("item"), col("n"))
    corpus.unionByName(langs).unionByName(sources).unionByName(quality)
  }

  /** Finish a maintained [[datasetCardBatch]] state for presentation:
    * append the derived distinct-language/source totals (row counts of
    * the maintained lang/source sections — exact, because those
    * sections key by the value itself) and order deterministically.
    */
  def datasetCardFinish(state: DataFrame): DataFrame = {
    val derived = state
      .filter(col("section").isin("lang", "source"))
      .groupBy("section").agg(count(lit(1)).as("n"))
      .select(lit("corpus").as("section"),
        when(col("section") === "lang", "langs").otherwise("sources")
          .as("item"),
        col("n"))
    state.unionByName(derived).orderBy("section", "item")
  }

  /** Per-document LANGUAGE SEGMENTATION (the multilingual-document
    * splitter — CCNet/RefinedWeb pipelines route paragraphs, not whole
    * docs, when languages mix): fixed `window`-token chunks are
    * language-identified independently with the [[LangMarkers]]
    * distinct-marker score (q23's rule, applied per chunk: argmax with
    * declaration-order ties; zero-marker chunks default to the first
    * language), then CONSECUTIVE same-language chunks merge into spans
    * via the gaps-and-islands running sum. A doc with >1 span is a
    * mixed-language doc and the spans are the split points.
    *
    * Everything is integers and strings — marker hits, chunk argmax,
    * lag-based span boundaries — so the whole segmentation replays in
    * SQL. Scale shape: one token explode (narrow), a broadcast marker
    * join, one (doc, chunk)-keyed aggregate, two per-doc windows over
    * chunk-sized rows (bounded by n_tokens/window per doc).
    */
  def langSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 16): DataFrame = {
    require(window >= 1, s"langSpans: window must be >= 1, got $window")
    val sess = docs.sparkSession
    import sess.implicits._
    val toks = filter(tokensCol(textCol), t => t =!= "")
    val tok = docs
      .select(col(idCol), posexplode(toks).as(Seq("__p", "__tok")))
      .withColumn("__chunk", expr(s"__p div $window"))
    val universe = tok.select(col(idCol), col("__chunk")).distinct()
    val markers = broadcast(
      LangMarkers.zipWithIndex
        .flatMap { case ((lang, ms), i) => ms.map(m => (lang, i, m)) }
        .toDF("lang", "__prio", "__tok"))
    val scores = tok.join(markers, "__tok")
      .select(col(idCol), col("__chunk"), col("lang"), col("__prio"),
        col("__tok"))
      .distinct() // DISTINCT markers present — q23's scoring rule
      .groupBy(col(idCol), col("__chunk"), col("lang"), col("__prio"))
      .agg(count(lit(1)).as("__score"))
    val bw = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol), col("__chunk"))
      .orderBy(col("__score").desc, col("__prio"))
    val best = scores
      .withColumn("__rn", row_number().over(bw))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("__chunk"), col("lang"))
    val dw = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__chunk"))
    universe.join(best, Seq(idCol, "__chunk"), "left")
      .withColumn("lang", coalesce(col("lang"), lit(LangMarkers.head._1)))
      .withColumn("__new",
        when(lag(col("lang"), 1).over(dw).isNull ||
          lag(col("lang"), 1).over(dw) =!= col("lang"), 1L).otherwise(0L))
      .withColumn("span_idx", sum(col("__new")).over(dw))
      .groupBy(col(idCol), col("span_idx"), col("lang"))
      .agg(min("__chunk").as("chunk_from"),
        max("__chunk").as("chunk_to"),
        count(lit(1)).as("n_chunks"))
      .select(col(idCol), col("span_idx"), col("lang"),
        col("chunk_from").cast("long").as("chunk_from"),
        col("chunk_to").cast("long").as("chunk_to"),
        col("n_chunks"))
  }

  /** Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; the
    * interpolated form of Chen & Goodman 1999 §3) in EXACT rational
    * arithmetic — the principled-smoothing member of the LM-scoring
    * family beside stupid backoff ([[trigramBackoffBits]]): instead of a
    * fixed per-level penalty, probability mass is absolutely DISCOUNTED
    * from seen bigrams and redistributed over the continuation
    * distribution (how many distinct left contexts a word follows — the
    * "San Francisco" correction: "francisco" is frequent but follows
    * almost nothing, so its unigram weight should be tiny).
    *
    * Discount D = 1/2 (a power of two, so every probability is one exact
    * rational; the paper's corpus-fit D is a free constant):
    *
    *   p(w|u) = (2·c(uw) − 1)/(2·c(u)) + (N₁₊(u·)/(2·c(u)))·p_cont(w)
    *   p_cont(w) = N₁₊(·w)/N₁₊(··)
    *
    * over ONE common denominator `2·c(u)·N₁₊(··)`, giving integer
    * numerator `(2·c(uw) − 1)·N₁₊(··) + N₁₊(u·)·N₁₊(·w)` for seen
    * bigrams; unseen bigrams drop the first term; an unseen CONTEXT
    * backs off to p_cont alone; numerators floor at 1 (the add-one
    * discipline, so a fully-unseen word scores the ceiling, not ∞).
    * Position cost is whole-bits surprisal via the repo's
    * `length(bin(den div num)) − 1` integer-log₂ — no float anywhere,
    * so TRAINING + SCORING replay as oracle CTEs.
    *
    * Counts come from a TRAIN corpus split from the scored docs (q276's
    * discipline). Exact while `numerator·2⁶³⁻ safe`: bigram-type totals
    * to ~10⁹ at the gate corpus scale. Scale shape: one bigram explode
    * per side, four vocab-sized map-side-combinable aggregates, scoring
    * is string-keyed equi-joins + a 1-row broadcast.
    */
  def knBigramBits(
      train: DataFrame, docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val toks = filter(tokensCol(textCol), t => t =!= "")
    def bgRows(df: DataFrame, keep: Seq[Column]): DataFrame = df
      .select(keep :+ toks.as("toks"): _*)
      .filter(size(col("toks")) >= 2)
      .select(keep :+ explode(expr(
        "transform(sequence(0, size(toks) - 2), " +
          "i -> struct(toks[i] AS u, toks[i + 1] AS w))")).as("b"): _*)
      .select(keep :+ col("b.u").as("u") :+ col("b.w").as("w"): _*)
    // r9: tBg (tokenize + bigram explode over the whole train corpus) is
    // referenced twice (c_uw and c_u legs) and cuw three times (n1_w,
    // n_types, and the scoring join) — persist both so each computes once
    // inside the caller's single action instead of re-running the
    // tokenizer pass per reference
    // session-scoped scratch cache (the PageRank contract): alive for
    // the caller's action; reclaimed by the harness between queries /
    // on session end.
    val tBg = bgRows(train, Nil).persist()
    val cuw = tBg.groupBy("u", "w").agg(count(lit(1)).as("c_uw")).persist()
    val cu = tBg.groupBy("u").agg(count(lit(1)).as("c_u"),
      countDistinct("w").as("n1_u")) // N₁₊(u·): distinct continuations
    val nleft = cuw.groupBy("w").agg(count(lit(1)).as("n1_w")) // N₁₊(·w)
    val ntot = cuw.agg(count(lit(1)).as("n_types")) // N₁₊(··)
    bgRows(docs, Seq(col(idCol)))
      .join(cuw, Seq("u", "w"), "left")
      .join(cu, Seq("u"), "left")
      .join(nleft, Seq("w"), "left")
      .crossJoin(broadcast(ntot))
      .select(col(idCol),
        when(col("c_uw").isNotNull, lit(0L))
          .when(col("c_u").isNotNull, lit(1L)).otherwise(lit(2L)).as("lvl"),
        // num/den of p(w|u) over the common denominator per case
        when(col("c_uw").isNotNull,
          (col("c_uw") * 2 - 1) * col("n_types") +
            col("n1_u") * coalesce(col("n1_w"), lit(0L)))
          .when(col("c_u").isNotNull,
            col("n1_u") * coalesce(col("n1_w"), lit(0L)))
          .otherwise(coalesce(col("n1_w"), lit(0L))).as("__num0"),
        when(col("c_u").isNotNull, col("c_u") * 2 * col("n_types"))
          .otherwise(col("n_types")).as("__den"))
      .withColumn("__num", greatest(col("__num0"), lit(1L)))
      .withColumn("bits",
        (length(bin(expr("__den div __num"))) - 1).cast("long"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("lvl") === 0, 1L).otherwise(0L)).as("n_seen"),
        sum(when(col("lvl") === 1, 1L).otherwise(0L)).as("n_backed"),
        sum(when(col("lvl") === 2, 1L).otherwise(0L)).as("n_novel_ctx"),
        sum("bits").as("kn_bits"))
      .withColumn("avg_millibits",
        expr("kn_bits * 1000 div n_bigrams"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020: head /
    * middle / tail language tertiles of LM perplexity — the filter that
    * decides which crawl slice trains and which gets dropped): every doc
    * scores against the [[trigramBackoffBits]] LM, then per-language
    * tertile THRESHOLD VALUES are fit and each doc is assigned by value.
    *
    * Thresholds are the avg_millibits values at ranks ⌈n/3⌉ and ⌈2n/3⌉
    * in (avg_millibits, id) order; assignment is `bits ≤ t1 → head`,
    * `≤ t2 → middle`, else tail — value-based, so ties straddling a
    * boundary all land on the lower bucket (deterministic, and exactly
    * what a threshold fit on a sample gives at scale).
    *
    * 100 TB shape: fit and assignment are SEPARATE stages on purpose —
    * assignment is a broadcast join of a ≤(2 rows × #langs) threshold
    * table against the scored corpus (map-side, no per-language global
    * sort of the assignment pass). The exact rank-extraction fit used
    * here puts each language's scores through one window — swap in
    * [[graft.ext.QuantileSketch]] thresholds past the point a language's
    * docs overflow a partition; the assignment stage is unchanged.
    * Docs with fewer than 3 tokens have no trigram score and emit no
    * row (CCNet drops them before the LM too).
    */
  def perplexityBuckets(
      train: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the scored table feeds the rank window, the per-lang count, and
    // the assignment join — cut the 6-join LM-scoring lineage once
    val scored = trigramBackoffBits(train, docs, idCol, textCol)
      .select(col(idCol), col("avg_millibits"))
      .join(docs.select(col(idCol), col(langCol)), Seq(idCol))
      .localCheckpoint()
    val w = Window.partitionBy(langCol)
      .orderBy(col("avg_millibits").asc, col(idCol).asc)
    val thresholds = scored
      .withColumn("__r", row_number().over(w))
      .join(scored.groupBy(langCol).agg(count(lit(1)).as("__n")), langCol)
      .filter(col("__r") === expr("(__n + 2) div 3") ||
        col("__r") === expr("(2 * __n + 2) div 3"))
      .groupBy(langCol)
      .agg(min(when(col("__r") === expr("(__n + 2) div 3"),
          col("avg_millibits"))).as("t1"),
        min(when(col("__r") === expr("(2 * __n + 2) div 3"),
          col("avg_millibits"))).as("t2"))
    scored.join(broadcast(thresholds), langCol)
      .withColumn("bucket",
        when(col("avg_millibits") <= col("t1"), "head")
          .when(col("avg_millibits") <= col("t2"), "middle")
          .otherwise("tail"))
      .select(col(idCol), col(langCol), col("avg_millibits"),
        col("bucket"))
  }

  /** Gopher's English stop-word presence list (Rae et al. 2021,
    * App. A1.1: a doc must contain ≥2 of these).
    */
  val GopherStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher rule card (Rae et al. 2021, App. A1.1 — the named
    * quality-rule battery behind MassiveText and most corpora since):
    * one INDEPENDENT boolean verdict per rule per document, not a
    * first-fail verdict (that is q149's funnel) — the per-rule matrix is
    * what rule-threshold tuning and marginal attribution need.
    *
    * Rules, all in exact integer cross-multiplication (no ratios):
    *  - ok_word_count: 50 ≤ words ≤ 100000
    *  - ok_mean_len:   mean word length in [3, 10] ⇔ 3n ≤ Σlen ≤ 10n
    *  - ok_symbols:    (# + "...") to word ratio ≤ 0.1
    *  - ok_bullets:    ≤ 90% of lines start with a bullet (-, *, •)
    *  - ok_ellipsis:   ≤ 30% of lines end with "..." / "…"
    *  - ok_alpha:      ≥ 80% of words contain an [a-z] letter
    *  - ok_stops:      ≥ 2 distinct [[GopherStopWords]] present
    *
    * Pure per-row projection — zero shuffles, embarrassingly parallel at
    * any scale; the card is the input to [[gopherRuleReport]].
    */
  def gopherRuleCard(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      stopWords: Seq[String] = GopherStopWords): DataFrame = {
    val stops = array(stopWords.map(lit): _*)
    docs
      .withColumn("__w", filter(tokensCol(textCol), t => t =!= ""))
      .withColumn("__l", split(col(textCol), "\n"))
      .withColumn("n_words", size(col("__w")).cast("long"))
      .withColumn("__sumlen", expr(
        "aggregate(__w, CAST(0 AS BIGINT), (a, x) -> a + length(x))"))
      .withColumn("__alpha",
        size(filter(col("__w"), t => t.rlike("[a-z]"))).cast("long"))
      .withColumn("__sym",
        (length(col(textCol)) -
          length(regexp_replace(col(textCol), "#", ""))).cast("long") +
        size(regexp_extract_all(col(textCol), lit("\\.\\.\\."), lit(0)))
          .cast("long"))
      .withColumn("__nl", size(col("__l")).cast("long"))
      .withColumn("__bull",
        size(filter(col("__l"), l => trim(l).rlike("^[-*•]")))
          .cast("long"))
      .withColumn("__elin",
        size(filter(col("__l"),
          l => trim(l).rlike("(\\.\\.\\.|…)$"))).cast("long"))
      .withColumn("__stops",
        size(array_intersect(array_distinct(col("__w")), stops))
          .cast("long"))
      .select(col(idCol), col("n_words"),
        (col("n_words") >= 50 && col("n_words") <= 100000)
          .as("ok_word_count"),
        (col("__sumlen") >= col("n_words") * 3 &&
          col("__sumlen") <= col("n_words") * 10).as("ok_mean_len"),
        (col("__sym") * 10 <= col("n_words")).as("ok_symbols"),
        (col("__bull") * 10 <= col("__nl") * 9).as("ok_bullets"),
        (col("__elin") * 10 <= col("__nl") * 3).as("ok_ellipsis"),
        (col("__alpha") * 5 >= col("n_words") * 4).as("ok_alpha"),
        (col("__stops") >= 2).as("ok_stops"))
      .withColumn("pass",
        col("ok_word_count") && col("ok_mean_len") && col("ok_symbols") &&
          col("ok_bullets") && col("ok_ellipsis") && col("ok_alpha") &&
          col("ok_stops"))
  }

  /** Per-rule failure report with MARGINAL attribution over a
    * [[gopherRuleCard]]: for each rule, how many docs fail it at all
    * (`n_fail`) and how many fail ONLY it (`n_only_fail` — the docs that
    * relaxing exactly this rule would recover). One stack-unpivot + one
    * aggregation; O(#rules) output rows.
    */
  def gopherRuleReport(card: DataFrame): DataFrame = {
    val rules = Seq("ok_word_count", "ok_mean_len", "ok_symbols",
      "ok_bullets", "ok_ellipsis", "ok_alpha", "ok_stops")
    val nFailed = rules.map(r => when(col(r), 0L).otherwise(1L))
      .reduce(_ + _)
    val stackSql = rules.map(r => s"'$r', $r").mkString(
      s"stack(${rules.length}, ", ", ", ") AS (rule, ok)")
    card.withColumn("__nf", nFailed)
      .select(expr(stackSql), col("__nf"))
      .groupBy("rule")
      .agg(sum(when(!col("ok"), 1L).otherwise(0L)).as("n_fail"),
        sum(when(!col("ok") && col("__nf") === 1L, 1L).otherwise(0L))
          .as("n_only_fail"))
  }

  /** Vocabulary coverage curve: what fraction of corpus token
    * OCCURRENCES the top-N vocabulary types cover, at several N rungs —
    * the Zipf-tail audit behind every vocab-size decision (tokenizers,
    * embedding tables, OOV budgets).
    *
    * 100 TB shape: the corpus collapses to one (token, count) table;
    * the only ordered step is a `TakeOrdered(max rung)` of THAT table
    * (never a global sort of it), and ranks are assigned inside the
    * bounded top set. Rung totals are exact integer ppm.
    */
  def vocabCoverageCurve(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      rungs: Seq[Int]): DataFrame = {
    require(rungs.nonEmpty && rungs.forall(_ >= 1),
      s"vocabCoverageCurve: rungs must be >= 1, got $rungs")
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = docs
      .select(explode(filter(tokensCol(textCol), t => t =!= ""))
        .as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      // feeds both the corpus total and the top-rung extraction
      .localCheckpoint()
    val total = counts.agg(sum("c").as("total_tokens"))
    // TakeOrdered bounds the ordered set to max(rungs) rows; the rank
    // window then runs over that bounded set only
    val top = counts.orderBy(col("c").desc, col("tok").asc)
      .limit(rungs.max)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("c").desc, col("tok").asc)))
    val rungDf = rungs.map(_.toLong).toDF("rung")
    top.crossJoin(broadcast(rungDf))
      .filter(col("rk") <= col("rung"))
      .groupBy("rung")
      .agg(count(lit(1)).as("n_types"), sum("c").as("covered_tokens"))
      .crossJoin(broadcast(total))
      .withColumn("coverage_ppm",
        expr("covered_tokens * 1000000 div total_tokens"))
  }

  /** Moore–Lewis cross-entropy-difference data selection (Moore & Lewis
    * 2010, "Intelligent Selection of Language Model Training Data" — the
    * original domain-targeted corpus filter): every doc scores under an
    * IN-DOMAIN LM and a GENERAL LM (both [[trigramBackoffBits]]), and
    * the n docs with the lowest `in − general` millibit difference are
    * selected — "looks like the domain, not just easy text".
    *
    * The selected flag comes from a TakeOrdered(n) THRESHOLD
    * (max (diff, id) struct of the top-n, broadcast back), not a global
    * row_number — docs never sort globally. Ties cannot occur (ids are
    * part of the order), so threshold-selection ≡ rank-selection
    * exactly. Only docs with ≥3 tokens score (no trigram otherwise).
    */
  def crossEntropySelect(
      inDomainTrain: DataFrame,
      generalTrain: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"crossEntropySelect: n must be >= 1, got $n")
    val inB = trigramBackoffBits(inDomainTrain, docs, idCol, textCol)
      .select(col(idCol), col("avg_millibits").as("in_millibits"))
    val genB = trigramBackoffBits(generalTrain, docs, idCol, textCol)
      .select(col(idCol), col("avg_millibits").as("gen_millibits"))
    // scored table feeds both the threshold fit and the flag join.
    // r10 note: running this checkpoint under the size-gated fixed-cost
    // scope (AQE off + 1-2 partitions) was tried and measured SLOWER in
    // a matched A/B (2.97 → 4.94 s) — the two LM fits are genuine
    // parallel compute (count-table aggregations + five scoring joins),
    // not job-count overhead. Left at the session's AQE defaults.
    val j = inB.join(genB, Seq(idCol))
      .withColumn("diff_millibits",
        col("in_millibits") - col("gen_millibits"))
      .localCheckpoint()
    val th = j
      .select(struct(col("diff_millibits"), col(idCol)).as("k"))
      .orderBy(col("k").asc).limit(n)
      .agg(max("k").as("k"))
    j.crossJoin(broadcast(th))
      .withColumn("selected", coalesce(
        struct(col("diff_millibits"), col(idCol)) <= col("k"),
        lit(false)))
      .drop("k")
  }

  def surprisalBits(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(tokensCol(textCol)).as("tok"))
    val vc = tok.groupBy("tok").agg(count(lit(1)).as("c"))
    val tot = vc.agg(sum("c").as("n"))
    tok
      .join(vc, "tok")
      .crossJoin(broadcast(tot))
      .select(col(idCol),
        (length(bin(expr("n div c"))) - 1).cast("long").as("bits"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_toks"),
        sum("bits").as("surprisal_bits"))
      .withColumn("avg_millibits",
        expr("surprisal_bits * 1000 div n_toks"))
  }

  /** English stopwords for the linear quality classifier's density
    * feature — fixed, tiny, and replayed literally by the oracle. */
  val ClassifierStopwords: Seq[String] =
    Seq("the", "of", "and", "to", "in", "is", "a", "for", "on", "with")

  /** The classifier's weights — THE single source for the Scala expr and
    * every SQL oracle (built via [[classifierMarginSqlExpr]]), so a weight
    * change cannot desync them: (intercept, wToks, wStop, wDigit, wUpper),
    * margin = intercept + wToks·min(n_toks, 512) + wStop·stop_bp −
    * wDigit·digit_bp − wUpper·upper_bp.
    */
  val ClassifierWeights: (Long, Long, Long, Long, Long) =
    (-100000L, 900L, 400L, 300L, 150L)

  /** The margin formula over columns named n_toks/stop_bp/digit_bp/
    * upper_bp — identical text works in Spark SQL and DuckDB. */
  def classifierMarginSqlExpr: String = {
    val (c, wt, ws, wd, wu) = ClassifierWeights
    s"$c + $wt * least(n_toks, 512) + $ws * stop_bp " +
      s"- $wd * digit_bp - $wu * upper_bp"
  }

  /** DuckDB CTE computing the classifier's raw counting features from
    * `documents(text)` with an id column — shared by every oracle that
    * replays the classifier (q233/q235/q237), interpolated from the same
    * constants the Spark side uses.
    */
  def classifierFeatureSql(idCol: String): String = {
    val stops = ClassifierStopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""SELECT $idCol,
       |    CAST(length(text) AS BIGINT) AS n_chars,
       |    CAST(len(string_split_regex(lower(trim(text)), '\\s+'))
       |      AS BIGINT) AS n_toks,
       |    CAST(len(list_filter(string_split_regex(lower(trim(text)),
       |      '\\s+'), x -> list_contains($stops, x))) AS BIGINT) AS n_stop,
       |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
       |      AS BIGINT) AS n_digit,
       |    CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))
       |      AS BIGINT) AS n_upper
       |  FROM documents""".stripMargin
  }

  /** The basis-point density selects over a [[classifierFeatureSql]] CTE
    * named `f` — `SELECT *, ... FROM f`. */
  def classifierBpSql: String =
    """SELECT *, n_stop * 10000 // greatest(n_toks, 1) AS stop_bp,
      |    n_digit * 10000 // greatest(n_chars, 1) AS digit_bp,
      |    n_upper * 10000 // greatest(n_chars, 1) AS upper_bp
      |  FROM f""".stripMargin

  /** A fixed linear quality classifier evaluated as pure integer
    * arithmetic — the fastText-style "keep/drop" filter of a training-data
    * pipeline, with hand-set weights instead of learned ones so every
    * decision is deterministic and oracle-replayable. Features: token count
    * (capped), stopword density, digit density, uppercase density (densities
    * in basis points via integer division). The margin is in micro-units;
    * `keep = margin > 0`. A learned linear model drops in by swapping the
    * weight constants — the evaluation plan (narrow projection, zero
    * shuffles) is the part that matters at 100 TB.
    */
  /** Per-term corpus dispersion (Gries 2008, "Dispersions and adjusted
    * frequencies in corpora" — the DP measure): is a term spread across
    * the corpus parts in proportion to their sizes, or bursty in a few?
    * `DP = ½·Σ_parts |observed share − expected share|` ∈ [0, 1) — 0 for
    * perfectly proportional terms, → 1 for terms concentrated in tiny
    * parts. High-frequency-but-bursty terms (boilerplate, markup,
    * source-specific tics) rank high; a frequency cut alone cannot see
    * them, which is why curation pipelines audit dispersion separately.
    *
    * Exact integer form: with part totals `t_s` (Σ = T) and term counts
    * `c_ws` (Σ over parts = c_w), each |o − e| term is
    * `|c_ws·T − t_s·c_w| / (c_w·T)`; parts where the term is ABSENT
    * contribute `t_s·c_w` to the same numerator (c_ws = 0), so the full
    * absent-part sum folds to ONE closed term `c_w·(T − Σ_present t_s)`
    * — no (term × part) cross join ever materializes. The result is
    * `dp_ppm = numerator·500000 div (c_w·T)`, exact while
    * `c_w·T·10⁶ < 2⁶³` (corpus parts to ~3M tokens at gate scale; a
    * 100 TB run pre-divides shares to ppm first).
    *
    * Output: the `topK` highest-DP terms at corpus count ≥ `minCount`
    * (ties dp desc, then count desc, then term). Scale shape: two
    * partial-aggregated shuffles ((part, term) then term), a broadcast
    * part-totals join, one TakeOrdered.
    */
  def termDispersion(
      docs: DataFrame,
      textCol: String,
      partCol: String,
      minCount: Long = 50L,
      topK: Int = 20): DataFrame = {
    require(topK >= 1 && minCount >= 1,
      s"termDispersion: topK ($topK) and minCount ($minCount) must be >= 1")
    val tok = docs.select(col(partCol).as("part"),
      explode(tokensCol(textCol)).as("tok"))
    val cws = tok.groupBy("part", "tok").agg(count(lit(1)).as("c_ws"))
    val ts = tok.groupBy("part").agg(count(lit(1)).as("t_s"))
    val tot = ts.agg(sum("t_s").as("t"))
    // pass 1: per-term corpus totals (needed inside the |o−e| numerator)
    val cw = cws.groupBy("tok").agg(sum("c_ws").as("c_w"))
    // pass 2: present-part numerator + closed absent-part term
    cws
      .join(broadcast(ts), "part")
      .join(cw, "tok")
      .crossJoin(broadcast(tot))
      .groupBy("tok")
      .agg(first("c_w").as("c"),
        count(lit(1)).as("n_parts"),
        first("t").as("__t"),
        sum("t_s").as("__pres"),
        sum(abs(col("c_ws") * col("t") - col("t_s") * col("c_w")))
          .as("__num_present"))
      .filter(col("c") >= minCount)
      .withColumn("__num",
        col("__num_present") + col("c") * (col("__t") - col("__pres")))
      .withColumn("dp_ppm", expr("__num * 500000 div (c * __t)"))
      .select("tok", "c", "n_parts", "dp_ppm")
      .orderBy(col("dp_ppm").desc, col("c").desc, col("tok"))
      .limit(topK)
  }

  /** Calibration reliability report (Guo et al. 2017, "On Calibration of
    * Modern Neural Networks" — the ECE binning): is the q233 linear
    * quality classifier's confidence honest? Per confidence bin:
    * population, mean confidence, observed accuracy, and the bin's exact
    * ECE numerator — all in integer basis points, so the whole diagram
    * replays bit-for-bit in SQL.
    *
    *  - confidence: the classifier margin affinely squashed to [0,10000]
    *    bp (`least(greatest(margin div confDiv, 0), 10000)` — a
    *    deterministic monotone proxy for a sigmoid);
    *  - outcome: the INDEPENDENT quality signal — q232's integer unigram
    *    surprisal, positive when `avg_millibits < posMillibitsBelow`
    *    (the q235 curation-band boundary);
    *  - `ece_num = |Σconf_bp − 10000·n_pos|` per bin: summing these over
    *    bins and dividing by `10000·N` yields exactly Guo's
    *    `Σ (n_b/N)·|acc_b − conf_b|`, with the division deferred so every
    *    reported number is an exact integer.
    *
    * Scale shape: the margin is a zero-shuffle projection; surprisal is
    * q232's vocab join; the report is one `nBins`-row aggregate.
    */
  def calibrationBins(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      nBins: Int = 10,
      confDiv: Int = 80,
      posMillibitsBelow: Long = 4250L): DataFrame = {
    require(nBins >= 2, s"calibrationBins: nBins must be >= 2, got $nBins")
    require(confDiv >= 1, s"calibrationBins: confDiv must be >= 1")
    val m = classifierMargin(docs, idCol, textCol)
      .select(col(idCol), col("margin"))
    val sb = surprisalBits(docs, idCol, textCol)
      .select(col(idCol), col("avg_millibits"))
    m.join(sb, idCol)
      .withColumn("conf_bp",
        expr(s"least(greatest(margin div $confDiv, 0), 10000)"))
      .withColumn("pos",
        (col("avg_millibits") < posMillibitsBelow).cast("long"))
      .withColumn("bin",
        expr(s"least(conf_bp * $nBins div 10000, ${nBins - 1})"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        sum("conf_bp").as("__conf_sum"),
        sum("pos").as("n_pos"))
      .select(col("bin"), col("n_docs"), col("n_pos"),
        expr("__conf_sum div n_docs").as("avg_conf_bp"),
        expr("n_pos * 10000 div n_docs").as("acc_bp"),
        abs(col("__conf_sum") - lit(10000L) * col("n_pos")).as("ece_num"))
  }

  /** ROC-AUC of the quality classifier against the independent surprisal
    * labels — the threshold-free discrimination metric beside q311's
    * calibration (a classifier can be well-calibrated and useless, or
    * discriminative and miscalibrated; an eval reports both): the
    * Mann–Whitney U form `AUC = (Σ_pos midrank − n⁺(n⁺+1)/2) / (n⁺·n⁻)`
    * with ties handled by midranks, all in EXACT integers — midranks are
    * kept DOUBLED (a tie group spanning ranks [a, b] contributes a+b per
    * member, always integral), and the final ppm fix uses the
    * quotient/remainder decomposition `q·10⁶ + (r·10⁶ div den)` so no
    * intermediate exceeds `den·10⁶` (exact while 2·n⁺·n⁻ < 2⁶³/10⁶ —
    * every eval set by construction; a 100 TB corpus evals on a sample).
    *
    * One row: (n_pos, n_neg, auc_ppm). Degenerate label sets (no
    * positives or no negatives) are refused loudly — an AUC of a
    * one-class eval is undefined, not 0.
    *
    * Scale shape: one margin-keyed aggregate (distinct scores), one
    * cumulative window over |distinct margins| rows, one scalar rollup.
    */
  def rocAuc(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      posMillibitsBelow: Long = 4250L): DataFrame = {
    val m = classifierMargin(docs, idCol, textCol)
      .select(col(idCol), col("margin"))
    val sb = surprisalBits(docs, idCol, textCol)
      .select(col(idCol),
        (col("avg_millibits") < posMillibitsBelow).cast("long").as("pos"))
    val grouped = m.join(sb, idCol)
      .groupBy("margin")
      .agg(count(lit(1)).as("n"), sum("pos").as("np"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("margin")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val ranked = grouped
      .withColumn("__cum", sum("n").over(w))
      // doubled midrank of the tie group ending at __cum: (a + b) where
      // a = __cum − n + 1, b = __cum
      .withColumn("__r2", lit(2) * col("__cum") - col("n") + 1)
    ranked.agg(
        sum(col("np") * col("__r2")).as("__s2"), // 2·Σ_pos midrank
        sum("np").as("n_pos"),
        (sum("n") - sum("np")).as("n_neg"))
      .select(col("n_pos"), col("n_neg"),
        expr("2 * n_pos * n_neg").as("__den"),
        (col("__s2") - col("n_pos") * (col("n_pos") + 1)).as("__u2"))
      .select(col("n_pos"), col("n_neg"),
        // q·1e6 + (r·1e6 div den): exact without u2·1e6 ever forming.
        // The CaseWhen guards the division: a single-class eval raises
        // BEFORE any den = 0 arithmetic can fire (branches are lazy)
        when(col("n_pos") > 0 && col("n_neg") > 0,
          expr("(__u2 div __den) * 1000000") +
            expr("((__u2 % __den) * 1000000) div __den"))
          .otherwise(raise_error(lit(
            "rocAuc: eval set has a single class — AUC is undefined, " +
              "refusing to report a number")).cast("long"))
          .as("auc_ppm"))
  }

  /** Precision/recall operating points of the quality classifier over a
    * margin-threshold ladder — the curve a filter's cutoff is chosen
    * from (the q236/q317 audit discipline applied to the learned
    * filter): per threshold, confusion counts plus precision/recall in
    * exact floor-div ppm. One margin+label pass feeds every rung
    * (broadcast ladder, integer compares).
    */
  def prCurve(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      thresholds: Seq[Long],
      posMillibitsBelow: Long = 4250L): DataFrame = {
    require(thresholds.nonEmpty && thresholds.distinct.size == thresholds.size,
      s"prCurve: thresholds must be non-empty and distinct, got $thresholds")
    val sess = docs.sparkSession
    import sess.implicits._
    val m = classifierMargin(docs, idCol, textCol)
      .select(col(idCol), col("margin"))
    val sb = surprisalBits(docs, idCol, textCol)
      .select(col(idCol),
        (col("avg_millibits") < posMillibitsBelow).cast("long").as("pos"))
    m.join(sb, idCol)
      .crossJoin(broadcast(thresholds.toDF("threshold")))
      .withColumn("pred", (col("margin") >= col("threshold")).cast("long"))
      .groupBy("threshold")
      .agg(sum(col("pred") * col("pos")).as("tp"),
        sum(col("pred") * (lit(1L) - col("pos"))).as("fp"),
        sum((lit(1L) - col("pred")) * col("pos")).as("fn"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"),
        coalesce(expr("tp * 1000000 div nullif(tp + fp, 0)"), lit(0L))
          .as("precision_ppm"),
        coalesce(expr("tp * 1000000 div nullif(tp + fn, 0)"), lit(0L))
          .as("recall_ppm"))
      .orderBy("threshold")
  }

  def classifierMargin(docs: DataFrame, idCol: String, textCol: String,
      keepCols: Seq[String] = Nil): DataFrame = {
    val stops = ClassifierStopwords.map(s => s"'$s'").mkString(", ")
    val carried = keepCols.map(col)
    docs
      .select(col(idCol) +: carried :+ col(textCol).as("__t")
        :+ tokensCol(textCol).as("__toks"): _*)
      .select((col(idCol) +: carried) ++ Seq(
        length(col("__t")).cast("long").as("n_chars"),
        size(col("__toks")).cast("long").as("n_toks"),
        expr(s"CAST(size(filter(__toks, x -> x IN ($stops))) AS BIGINT)")
          .as("n_stop"),
        (length(col("__t")) -
          length(regexp_replace(col("__t"), "[0-9]", "")))
          .cast("long").as("n_digit"),
        (length(col("__t")) -
          length(regexp_replace(col("__t"), "[A-Z]", "")))
          .cast("long").as("n_upper")): _*)
      .withColumn("stop_bp", expr("n_stop * 10000 div greatest(n_toks, 1)"))
      .withColumn("digit_bp", expr("n_digit * 10000 div greatest(n_chars, 1)"))
      .withColumn("upper_bp", expr("n_upper * 10000 div greatest(n_chars, 1)"))
      .withColumn("margin", expr(classifierMarginSqlExpr))
      .withColumn("keep", col("margin") > 0)
  }
}

