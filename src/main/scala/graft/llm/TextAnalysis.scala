package graft.llm

import graft.Tables.t
import graft.functions.Parity._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: language ID,
  * quality scoring, token counting, document fingerprinting.
  *
  * All are narrow per-row transforms (codegen'd builtins, no UDFs, no
  * shuffle except the fingerprint's per-doc top-k) — they stream through
  * 100 TB at scan speed.
  */
object TextAnalysis {

  /** Marker-token sets per language, over the corpus vocabulary. */
  private val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of"),
    "es" -> Seq("data", "table", "row"),
    "fr" -> Seq("query", "join", "merge"))

  private def hitExpr(words: Seq[String]): String =
    s"size(filter(toks, x -> x in (${words.map(w => s"'$w'").mkString(", ")})))"

  /** N-gram/marker-hit language ID: argmax of marker-token hits with a
    * fixed priority order on ties.
    */
  def langid(spark: SparkSession, dir: String): DataFrame =
    withLangPred(t(spark, dir, "documents"))
      .select("doc_id", "pred_lang", "h_en", "h_es", "h_fr")

  /** Marker hits + argmax prediction over any frame with a `text` column
    * — the ONE spelling shared by [[langid]] and [[langidEval]].
    */
  private def withLangPred(df: DataFrame): DataFrame =
    df.withColumn("toks", split(col("text"), " "))
      .withColumn("h_en", expr(hitExpr(markers("en"))).cast("long"))
      .withColumn("h_es", expr(hitExpr(markers("es"))).cast("long"))
      .withColumn("h_fr", expr(hitExpr(markers("fr"))).cast("long"))
      .withColumn("pred_lang",
        when(col("h_en") >= col("h_es") && col("h_en") >= col("h_fr"), "en")
          .when(col("h_es") >= col("h_fr"), "es")
          .otherwise("fr"))

  /** Classifier evaluation for the language-ID heuristic: the confusion
    * matrix against the labeled `lang` column — per (actual, predicted)
    * cell the count, the row share in integer basis points, and the hit
    * flag. The view a data team reads before trusting langid-gated
    * filtering (the heuristic only emits en/es/fr, so zh/de rows expose
    * its out-of-vocabulary behavior honestly).
    *
    * Scale: one documents scan, in-row scoring, a partial-aggregated
    * rollup to |langs|² cells; row totals join broadcast.
    */
  def langidEval(spark: SparkSession, dir: String): DataFrame =
    withLangPred(t(spark, dir, "documents"))
      .groupBy("lang", "pred_lang")
      .agg(count(lit(1)).as("n"))
      // row totals via a window over the |langs|²-row aggregate — no
      // second corpus scan, and the window's exchange is metadata-sized
      .withColumn("n_lang", sum("n").over(Window.partitionBy("lang")))
      .withColumn("bp", expr("(10000 * n) div n_lang"))
      .withColumn("hit",
        when(col("lang") === col("pred_lang"), 1L).otherwise(0L))
      .select("lang", "pred_lang", "n", "bp", "hit")

  /** Language-ID confidence calibration: per LABELED language, the
    * nearest-rank quartiles of the classifier's winning MARGIN (top
    * marker-hit count minus runner-up, as 2·top + min − sum — pure
    * integer arithmetic) — the companion to [[langidEval]]'s confusion
    * matrix: the matrix says how often the heuristic is wrong, this says
    * how CONFIDENT it was, which is what a margin-gated routing policy
    * ("trust langid only above margin m") is calibrated from.
    *
    * Scale: one scored scan partial-aggregated to the (lang, margin)
    * count frame; quartiles are count-compressed nearest-rank picks
    * (the likelihoodQuartiles discipline — no join back to rows).
    */
  def langidMargin(spark: SparkSession, dir: String): DataFrame = {
    val scored = withLangPred(t(spark, dir, "documents"))
      .withColumn("top1", greatest(col("h_en"), col("h_es"), col("h_fr")))
      .withColumn("margin",
        lit(2L) * col("top1") +
          least(col("h_en"), col("h_es"), col("h_fr")) -
          (col("h_en") + col("h_es") + col("h_fr")))
    val byL = Window.partitionBy("lang")
    val cum = scored.groupBy("lang", "margin").agg(count(lit(1)).as("k"))
      .withColumn("cum", sum("k").over(byL.orderBy("margin")
        .rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
      .withColumn("n", sum("k").over(byL).cast("long"))
    def pick(p: Double) =
      max(when(col("cum") >= expr(s"CAST(ceil(n * $p) AS BIGINT)") &&
        col("cum") - col("k") < expr(s"CAST(ceil(n * $p) AS BIGINT)"),
        col("margin")))
    cum.groupBy("lang").agg(max("n").as("n_docs"),
      pick(0.25).as("q1_margin"), pick(0.5).as("median_margin"),
      pick(0.75).as("q3_margin"))
  }

  /** Shared-prefix boilerplate detector: documents bucketed by their
    * first 32 characters — per source, how many docs share a prefix
    * with at least one other doc (in basis points), how many distinct
    * duplicated prefixes exist, and the largest prefix bucket. A
    * crawler emitting templated pages (cookie banners, SEO headers)
    * shows up here before any expensive near-dup pass runs; the classic
    * cheap pre-filter next to [[graft.llm.Curation]]'s line-level
    * boilerplate_chunks.
    *
    * Scale: ONE prefix-keyed exchange (32-char key, map-side combined)
    * for the bucket sizes, joined back on the same key — no pair
    * generation anywhere; the per-source rollup is partial-aggregated.
    */
  def prefixDupProfile(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
      .filter(length(col("text")) >= 32)
      .select(col("doc_id"), col("source"),
        substring(col("text"), 1, 32).as("pfx"))
    val buckets = d.groupBy("pfx").agg(count(lit(1)).as("k"))
    d.join(buckets, "pfx")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("k") >= 2L, 1L).otherwise(0L)).cast("long")
          .as("n_shared_prefix"),
        countDistinct(when(col("k") >= 2L, col("pfx")))
          .as("n_dup_prefixes"),
        max("k").as("max_bucket"))
      .withColumn("shared_bp", expr("(10000 * n_shared_prefix) div n_docs"))
  }

  /** Heuristic quality score from length / punctuation / stopword ratios.
    * The arithmetic is written in the same order on both engines so the
    * double is bit-identical.
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_c", length(col("text")).cast("long"))
      .withColumn("n_t", size(col("toks")).cast("long"))
      .withColumn("n_stop", expr(hitExpr(markers("en"))).cast("long"))
      .withColumn("n_punct",
        (length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", "")))
          .cast("long"))
      .select(col("doc_id"), col("n_c"), col("n_t"),
        (col("n_stop") / col("n_t")).as("stop_ratio"),
        (col("n_punct") / col("n_c")).as("punct_ratio"),
        ((col("n_c") - (col("n_t") - 1)) / col("n_t")).as("avg_tok_len"))

  /** Per-source character-class composition: letter / digit / space /
    * other shares of the corpus character mass in basis points — the
    * crawl-health fingerprint read next to [[qualityScore]]: a source
    * whose digit or "other" share spikes is markup, tables, or binary
    * junk the per-doc heuristics each see too little of. Class counts
    * are in-row length arithmetic (len − len(class stripped)), so the
    * only exchange is the |sources|-row rollup; null text degrades to
    * zero mass and an all-empty source reports zero shares, never a
    * divide-by-zero abort.
    */
  def charClassProfile(spark: SparkSession, dir: String): DataFrame =
    charClassRollup(t(spark, dir, "documents"))

  /** The in-row class counts + per-source rollup — the ONE spelling
    * shared by [[charClassProfile]] and the streaming monitor
    * (graft.streaming.Streams.charClassStream), the withLangMixScores
    * discipline: batch and online composition can never silently
    * diverge.
    */
  private[graft] def charClassRollup(df: DataFrame): DataFrame = {
    def stripped(cls: String) =
      length(regexp_replace(coalesce(col("text"), lit("")), cls, ""))
    val base = length(coalesce(col("text"), lit("")))
    df.select(col("source"),
        base.cast("long").as("n_c"),
        (base - stripped("[a-zA-Z]")).cast("long").as("n_alpha"),
        (base - stripped("[0-9]")).cast("long").as("n_digit"),
        (base - stripped("[ \\t\\n\\r]")).cast("long").as("n_space"))
      .groupBy("source")
      .agg(sum("n_c").cast("long").as("n_chars"),
        sum("n_alpha").cast("long").as("t_alpha"),
        sum("n_digit").cast("long").as("t_digit"),
        sum("n_space").cast("long").as("t_space"))
      .select(col("source"), col("n_chars"),
        expr("CASE WHEN n_chars > 0 THEN (10000 * t_alpha) div n_chars ELSE 0 END").as("alpha_bp"),
        expr("CASE WHEN n_chars > 0 THEN (10000 * t_digit) div n_chars ELSE 0 END").as("digit_bp"),
        expr("CASE WHEN n_chars > 0 THEN (10000 * t_space) div n_chars ELSE 0 END").as("space_bp"),
        expr("""CASE WHEN n_chars > 0
               |  THEN (10000 * (n_chars - t_alpha - t_digit - t_space))
               |    div n_chars
               |  ELSE 0 END""".stripMargin).as("other_bp"))
  }

  /** Per-source token-length histogram — the tokenizer-facing shape
    * audit next to [[charClassProfile]]'s class shares: a source whose
    * length mass shifts toward 1-char tokens is delimiter-corrupted,
    * toward very long ones is concatenated/URL-heavy — both inflate
    * BPE fertility before any model sees the text. Token-scale work
    * stays IN-ROW (array_counts over the per-doc length array, so at
    * most |distinct lengths| ≈ 30 rows per doc cross the exchange,
    * never the tokens); the rollup is the (source, tok_len) count
    * frame. Null text degrades to one zero-length token, same as the
    * oracle's split semantics.
    */
  def tokenLenProfile(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.TextHashes.register(spark)
    tokenLenRollup(t(spark, dir, "documents"))
  }

  /** The in-row length fold + (source, tok_len) rollup — ONE spelling
    * shared by [[tokenLenProfile]] and the streaming monitor
    * (graft.streaming.Streams.tokenLenStream), the charClassRollup
    * discipline.
    */
  private[graft] def tokenLenRollup(df: DataFrame): DataFrame =
    df.select(col("source"), explode(expr(
        """map_entries(array_counts(transform(
          |  split(coalesce(text, ''), ' '),
          |  t -> CAST(length(t) AS STRING))))""".stripMargin)).as("e"))
      .select(col("source"), expr("CAST(e.key AS BIGINT)").as("tok_len"),
        col("e.value").as("cnt"))
      .groupBy("source", "tok_len")
      .agg(sum("cnt").cast("long").as("n_toks"))

  /** Source × language contingency matrix with independence deviations:
    * per (source, LABELED lang) the doc count, the independence-expected
    * count in the same quantization (row_total · col_total div total),
    * and the signed deviation in ppm of expected — the structural drift
    * detector next to [[langid]]'s per-doc prediction (a source whose
    * deviation flips sign is changing language mix upstream, before any
    * classifier disagrees). One scan to the |sources|·|langs| count
    * frame; marginals are re-aggregations of it, broadcast back; all
    * integer math.
    */
  def sourceLangMatrix(spark: SparkSession, dir: String): DataFrame = {
    val m = t(spark, dir, "documents")
      .groupBy("source", "lang").agg(count(lit(1)).as("n_docs"))
    val rowT = m.groupBy("source").agg(sum("n_docs").cast("long").as("rt"))
    val colT = m.groupBy("lang").agg(sum("n_docs").cast("long").as("ct"))
    val tot = m.agg(sum("n_docs").cast("long").as("tt"))
    m.join(broadcast(rowT), "source")
      .join(broadcast(colT), "lang")
      .crossJoin(broadcast(tot))
      // the signed deviation divides NONNEGATIVE numerators only (Spark
      // div truncates toward zero, DuckDB // floors — they disagree on
      // negatives; the knn_mutuality shift discipline). DECIMAL(38,0)
      // headroom on every N² product (the basketLift discipline): raw
      // BIGINT rt·ct / n_docs·tt wrap at ~3M docs once ×1e6 — Spark
      // (non-ANSI) would wrap SILENTLY where the oracle errors.
      .withColumn("rc", expr("CAST(rt AS DECIMAL(38,0)) * ct"))
      .withColumn("nt", expr("CAST(n_docs AS DECIMAL(38,0)) * tt"))
      .select(col("source"), col("lang"), col("n_docs"),
        expr("CAST(rc div tt AS BIGINT)").as("n_expected"),
        expr("""CAST(CASE WHEN rc = 0 THEN 0
               |WHEN nt >= rc
               |  THEN (1000000 * (nt - rc)) div rc
               |ELSE -((1000000 * (rc - nt)) div rc)
               |END AS BIGINT)""".stripMargin).as("dev_ppm"))
  }

  /** Vocabulary-growth (Heaps-law) curve: distinct word types and token
    * mass at 1/8, 1/4, 1/2, and all of the corpus in the shared md5-coin
    * pseudo-arrival order (the [[graft.llm.Dedup.dupAccumulationCurve]]
    * companion for the VOCABULARY: sub-Heaps growth says the crawl is
    * exhausting its domain; super-linear says the tail is noise/junk
    * types). Type counts per prefix come from each type's MIN arrival
    * coin — ONE token-scale exchange (gram → min coin), after which the
    * whole curve is an 8-row cumulative rollup; token mass per prefix
    * is a per-doc count rollup, never a second token pass.
    */
  def vocabGrowthCurve(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Parity.md5Long
    val docs = t(spark, dir, "documents")
      .select((md5Long(concat(lit("vocabcurve#"), col("doc_id"))) % 8)
        .as("coin"),
        split(coalesce(col("text"), lit("")), " ").as("toks"))
    def prefixes(c: String) =
      explode(expr(s"filter(array(1L, 2L, 4L, 8L), b -> $c < b)"))
    // per-prefix doc/token mass off the 8-row per-coin rollup
    val mass = docs.select(col("coin"), size(col("toks")).cast("long")
        .as("n_t"))
      .groupBy("coin").agg(count(lit(1)).as("d"), sum("n_t").as("tk"))
      .select(prefixes("coin").as("prefix_eighths"), col("d"),
        col("tk"))
      .groupBy("prefix_eighths")
      .agg(sum("d").cast("long").as("n_docs"),
        sum("tk").cast("long").as("n_tokens"))
    // per-prefix distinct types off each type's min arrival coin
    val types = docs
      .select(col("coin"), explode(array_distinct(col("toks"))).as("tok"))
      .groupBy("tok").agg(min("coin").as("c0"))
      .groupBy("c0").agg(count(lit(1)).as("k"))
      .select(prefixes("c0").as("prefix_eighths"), col("k"))
      .groupBy("prefix_eighths")
      .agg(sum("k").cast("long").as("n_types"))
    mass.join(broadcast(types), "prefix_eighths")
      .withColumn("ttr_ppm",
        expr("""CASE WHEN n_tokens > 0
               |  THEN (1000000 * n_types) div n_tokens
               |  ELSE 0 END""".stripMargin))
  }

  /** Whitespace + BPE-ish regex token counts per document. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_ws"),
        size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
          .cast("long").as("n_bpe"))

  /** Bottom-8 sketch of 8-gram hashes: a compact, order-independent document
    * fingerprint (MOD-sketch flavor of winnowing). Computed entirely within
    * the row (sort the hash array, take the head) — no explode, no window
    * shuffle; 56-bit hashes over distinct grams make in-doc collisions (the
    * only case where a tiebreak could matter) negligible.
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.TextHashes.register(spark)
    // tPar: gram hashing is per-row-expensive and this is a direct scan
    // (no shared cache) — measured 0.77x with the parallelized scan.
    graft.Tables.tPar(spark, dir, "documents", "doc_id")
      .filter(length(col("text")) >= 8)
      .select(col("doc_id"),
        expr("slice(gram_hashes(text, 8, 0), 1, 8)").as("hs"))  // gram_hashes returns sorted
      .select(col("doc_id"), posexplode(col("hs")).as(Seq("pos", "h")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("rank"), col("h"))
  }

  /** End-to-end corpus filter: the keep/drop decision a training-data
    * pipeline actually ships — exact-dup drop composed with quality gates,
    * with the first failing rule as the audit reason.
    */
  /** C4-style LINE-level quality gate (Raffel et al. 2020 §2.2's cleanup
    * rules, the public pipeline behind the C4 corpus) — the line-grained
    * complement of [[qualityGopher]]'s word-level battery: per document,
    * how many '\n'-separated lines survive "retain only lines that end
    * in terminal punctuation AND carry at least 5 words", whether the
    * page-level drops fire ("lorem ipsum" placeholder text, a curly
    * brace marking inline code/JS, fewer than 3 sentences), and the
    * char-level retention the line filter achieves. `keep` composes the
    * page rules the way C4 does: some line survives, >= 3 sentences, no
    * lorem, no brace. (C4's bad-words list and its 3-sentence-span
    * dedup are out of scope here — the latter is `dedup_spans`.)
    *
    * All in-row (split/filter/aggregate over the line array) — no
    * explode, no shuffle; streams at scan speed at any corpus size.
    */
  def qualityC4(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("lines", split(col("text"), "\n"))
      .withColumn("kept", expr(
        """filter(lines, l ->
          |  right(l, 1) IN ('.', '!', '?', '"') AND
          |  size(filter(split(l, ' '), x -> x != '')) >= 5)""".stripMargin))
      .select(
        col("doc_id"), col("source"),
        size(col("lines")).cast("long").as("n_lines"),
        size(col("kept")).cast("long").as("n_kept_lines"),
        length(col("text")).cast("long").as("total_chars"),
        expr("aggregate(kept, 0L, (acc, l) -> acc + length(l))")
          .as("kept_chars"),
        size(expr("regexp_extract_all(text, '[.!?]', 0)")).cast("long")
          .as("n_sentences"),
        when(expr("contains(lower(text), 'lorem ipsum')"), 1L).otherwise(0L)
          .as("has_lorem"),
        when(expr("contains(text, '{')"), 1L).otherwise(0L).as("has_brace"))
      .withColumn("keep",
        when(col("n_kept_lines") > 0L && col("n_sentences") >= 3L &&
          col("has_lorem") === 0L && col("has_brace") === 0L, 1L)
          .otherwise(0L))

  def corpusFilter(spark: SparkSession, dir: String): DataFrame =
    filterVerdicts(spark, dir)
      .select(col("doc_id"),
        when(col("reason") === "keep", 1L).otherwise(0L).as("keep"),
        col("reason"))

  /** The per-document filter verdict frame (doc_id, source, n_t, reason)
    * — [[corpusFilter]] projects it; Curation.curationReport rolls it up
    * per source WITHOUT re-joining documents (one scan + one md5-identity
    * window serves both).
    */
  private[llm] def filterVerdicts(spark: SparkSession, dir: String): DataFrame = {
    val byText = Window.partitionBy(md5(col("text")))
    withQualityCols(t(spark, dir, "documents"))
      .withColumn("keep_id", min("doc_id").over(byText))
      .withColumn("reason",
        when(col("doc_id") =!= col("keep_id"), "dup")
          .otherwise(qualityReason))
      .select("doc_id", "source", "n_t", "reason")
  }

  /** The stateless quality feature columns (toks, n_c, n_t, n_stop,
    * avg_tok_len, stop_ratio) over any frame with a `text` column — the
    * ONE spelling shared by the batch verdicts and the streaming gate.
    */
  private[graft] def withQualityCols(df: DataFrame): DataFrame =
    df.withColumn("toks", split(col("text"), " "))
      .withColumn("n_c", length(col("text")).cast("long"))
      .withColumn("n_t", size(col("toks")).cast("long"))
      .withColumn("n_stop", expr(hitExpr(markers("en"))).cast("long"))
      .withColumn("avg_tok_len",
        (col("n_c") - (col("n_t") - 1)) / col("n_t"))
      .withColumn("stop_ratio", col("n_stop") / col("n_t"))

  /** The quality-rule verdict (everything but the exact-dup rule) over
    * [[withQualityCols]]'s features — first failing rule wins, same
    * order in batch and stream.
    */
  private[graft] def qualityReason =
    when(col("n_t") < 20, "too_short")
      .when(col("avg_tok_len") < 3.0 || col("avg_tok_len") > 8.0, "tok_len")
      .when(col("stop_ratio") > 0.2, "stopwords")
      .otherwise("keep")

  /** TF-IDF-style term weighting, log-free for cross-engine exactness:
    * weight = tf * (N / df) — integer-derived double arithmetic (libm log
    * differs between engines by ulps, so the classic formula cannot be
    * hash-verified). Top-10 terms per document by weight.
    */
  def tfidf(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.TextHashes.register(spark)
    val docs = t(spark, dir, "documents")
    // In-row TF (array_counts combiner): one (doc, term, tf) row per
    // DISTINCT term per doc, no per-occurrence explode and no (doc, term)
    // aggregation shuffle; DF then counts rows per term on the same frame.
    // (r18 note: tPar on this scan was measured 1.25x WORSE — the
    // repartition exchange ships the full text column and the tokenize
    // is too cheap to amortize it; left on the direct scan.)
    val tf = docs.select(col("doc_id"),
      explode(expr("array_counts(split(text, ' '))")).as(Seq("term", "tf")))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.count() // corpus size: one tiny driver-side scalar
    val w = Window.partitionBy("doc_id")
      .orderBy(col("weight").desc, col("term"))
    tf.join(broadcast(df), "term")
      .withColumn("weight", col("tf") * (lit(n).cast("double") / col("df")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 10)
      .select("doc_id", "term", "tf", "df", "weight", "rnk")
  }

  /** Corpus-level top-20 char-trigrams (vocabulary profiling). */
  def ngramCounts(spark: SparkSession, dir: String): DataFrame = {
    // In-row combiner: one (gram, count) row per DISTINCT gram per doc
    // (gram_counts native expression) instead of one per occurrence —
    // 3-4x fewer generator rows, and the rollup SUMs partial counts
    // (NativeExprSpec pins count-equivalence to the explode form).
    graft.functions.TextHashes.register(spark)
    t(spark, dir, "documents")
      .filter(length(col("text")) >= 3)
      .select(explode(expr("gram_counts(text, 3)")).as(Seq("g", "c")))
      .groupBy("g").agg(sum("c").cast("long").as("n"))
      .orderBy(col("n").desc, col("g"))
      .limit(20)
  }

  /** The BPE-merge selection step (tokenizer training, iteration 0): the
    * most frequent ADJACENT symbol pairs at the character level, counted
    * only within words — a char bigram containing the space separator is a
    * cross-word pair and never merges. Same in-row gram_counts combiner as
    * [[ngramCounts]]; the top-20 by count is the merge queue a BPE trainer
    * would pop from. A full trainer iterates this query, re-tokenizing
    * with the merged symbol each round — each iteration stays this same
    * one-aggregation shape.
    */
  def bpePairCounts(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.TextHashes.register(spark)
    t(spark, dir, "documents")
      .filter(length(col("text")) >= 2)
      .select(explode(expr("gram_counts(text, 2)")).as(Seq("pair", "c")))
      .filter(!col("pair").contains(" "))
      .groupBy("pair").agg(sum("c").cast("long").as("n"))
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("n").desc, col("pair"))).cast("long"))
      .filter(col("rnk") <= 20)
  }

  /** BPE merge training — the iterative loop behind every tokenizer build
    * (Sennrich et al. 2016), not just the first pair table
    * ([[bpePairCounts]]): words become space-separated symbol sequences,
    * each round counts adjacent symbol pairs weighted by word frequency,
    * merges the single most frequent pair (ties to the lexicographically
    * smallest) everywhere, and repeats. Three rounds; output is the merge
    * table (round, pair, merged symbol, pair count at merge time) — the
    * artifact a tokenizer ships.
    *
    * Scale: the iterated frame is the word-frequency vocabulary (not the
    * corpus — pair counting is weighted by freq), the winning pair is a
    * broadcast 1-row frame, and the merge is a codegen'd string replace.
    * Left-to-right non-overlapping replace semantics are identical in
    * Spark and DuckDB, so sequences stay bit-identical; the winner pick is
    * a global (n DESC, pair ASC) top-1 (TakeOrderedAndProject — no full
    * sort materialized).
    */
  private val mergeCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  /** The trained merge table, fingerprint-cached per (session, data) —
    * [[bpeMerges]] and [[bpeEncode]] share one trainer run (the PQ
    * codebook-cache discipline); each round's winner is already
    * localCheckpoint'ed, so the cached frame is 3 tiny checkpointed rows.
    */
  def bpeMerges(spark: SparkSession, dir: String): DataFrame =
    mergeCache.getOrElseUpdate(
      graft.Tables.freshCacheKey(mergeCache, spark, dir, "documents"),
      trainBpeMerges(spark, dir))

  private def trainBpeMerges(spark: SparkSession, dir: String): DataFrame = {
    val rounds = 3
    // One regexp pass: splitting on runs of non-alphanumerics yields the
    // same word sequence as replace-to-space + collapse + trim + split
    // (leading/trailing empties are dropped by the length filter), at
    // ~0.6x the per-row cost — measured noop-sink identical output.
    val words = t(spark, dir, "documents")
      .select(explode(split(lower(col("text")), "[^a-z0-9]+")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy("word").agg(count(lit(1)).cast("long").as("freq"))
    // localCheckpoint per round (the dedup_clusters loop discipline):
    // without it, round r's plan replays rounds 1..r-1's replaces AND
    // re-reads the corpus — 2x the passes for a vocabulary-sized frame.
    var seqs = words.withColumn("seq",
      concat(lit(" "),
        concat_ws(" ", expr("regexp_extract_all(word, '.', 0)")), lit(" ")))
      .localCheckpoint()
    val merges = (1 to rounds).map { r =>
      val pairs = seqs
        .withColumn("el", split(trim(col("seq")), " "))
        // size guard: Spark's sequence(0, -1) DESCENDS (it is not empty),
        // so a 1-symbol word would emit a null pair without this filter.
        .filter(size(col("el")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(el) - 2), i -> concat(el[i], ' ', el[i + 1]))"))
          .as("pair"))
        .groupBy("pair").agg(sum("freq").cast("long").as("n_pair"))
      // Checkpoint the 1-row winner too: without it the merge table's
      // final union re-runs each round's vocabulary-scale pair count.
      val top = pairs.orderBy(col("n_pair").desc, col("pair")).limit(1)
        .localCheckpoint()
      if (r < rounds)
        seqs = seqs.crossJoin(broadcast(top.select(col("pair").as("mp"))))
          .withColumn("seq", expr(
            "replace(seq, concat(' ', mp, ' '), concat(' ', replace(mp, ' ', ''), ' '))"))
          .drop("mp")
          .localCheckpoint()
      top.select(
        lit(r.toLong).as("round"), col("pair"),
        regexp_replace(col("pair"), " ", "").as("merged"), col("n_pair"))
    }
    merges.reduce(_ unionAll _)
  }

  /** BPE encoding — applying the merge table [[bpeMerges]] trains, the
    * other half of a tokenizer's life: each word becomes its symbol
    * sequence, the three learned merges replay in training order, and the
    * per-document accounting (words, pre-merge symbols = chars, post-merge
    * tokens, symbols saved) is what a token-budget planner consumes.
    *
    * Scale: encoding happens on the DISTINCT vocabulary (bounded, not
    * corpus-sized), with the 3 merges pivoted into one broadcast row and
    * replayed as chained codegen'd replaces; the corpus-sized side only
    * joins (doc, word) to the encoded vocab and partial-aggregates per
    * doc. The trainer's checkpointed winners are reused, not re-derived.
    * The per-doc accounting frame is fingerprint-cached per (session,
    * data) with the knn-edge discipline — [[bpeFertility]] re-aggregates
    * it instead of re-encoding the corpus; one 5-column row per doc, the
    * same footprint class as the cached dedup/knn label frames.
    */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame =
    encodeCache.getOrElseUpdate(
      graft.Tables.freshCacheKey(encodeCache, spark, dir, "documents"),
      buildBpeEncode(spark, dir).localCheckpoint())

  private val encodeCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  /** Explicit teardown hook (the Dedup.clearHsCache discipline) for the
    * BPE trainer and per-doc encode caches.
    */
  def clearBpeCache(): Unit = { mergeCache.clear(); encodeCache.clear() }

  /** The (doc_id, word) corpus fan — the one word-splitting spelling
    * shared by the encode paths.
    */
  private[llm] def docWords(spark: SparkSession, dir: String): DataFrame =
    // Same one-regexp split as the trainer's word fan (see trainBpeMerges)
    // — output-identical to the replace/collapse/trim spelling, ~1.6x
    // cheaper per pass, and this fan re-runs per bench pass in the
    // persist/apply paths.
    t(spark, dir, "documents")
      .select(col("doc_id"),
        explode(split(lower(col("text")), "[^a-z0-9]+")).as("word"))
      .filter(length(col("word")) >= 1)

  /** The encoded vocabulary `(word, n_tok)` — each distinct word's token
    * count under the trained merges. Bounded (distinct words, not corpus
    * rows); the tokenizer artifact [[graft.llm.BpeStore]] persists.
    */
  private[llm] def encodedVocab(spark: SparkSession, dir: String): DataFrame = {
    val mw = bpeMerges(spark, dir).groupBy().agg(
      max(when(col("round") === 1L, col("pair"))).as("p1"),
      max(when(col("round") === 2L, col("pair"))).as("p2"),
      max(when(col("round") === 3L, col("pair"))).as("p3"))
    def applyMerge(p: String) = expr(
      s"replace(seq, concat(' ', $p, ' '), concat(' ', replace($p, ' ', ''), ' '))")
    docWords(spark, dir).select("word").distinct()
      .withColumn("seq", concat(lit(" "),
        concat_ws(" ", expr("regexp_extract_all(word, '.', 0)")), lit(" ")))
      .crossJoin(broadcast(mw))
      .withColumn("seq", applyMerge("p1"))
      .withColumn("seq", applyMerge("p2"))
      .withColumn("seq", applyMerge("p3"))
      .select(col("word"),
        size(split(trim(col("seq")), " ")).cast("long").as("n_tok"))
  }

  /** The per-doc accounting over any `(word, n_tok)` vocabulary frame —
    * shared by the in-session encode and [[graft.llm.BpeStore]]'s
    * apply-only path so the two cannot drift.
    */
  private[llm] def encodeAccounting(spark: SparkSession, dir: String,
      vocab: DataFrame): DataFrame =
    // The encoded vocabulary is bounded (distinct words, not corpus rows)
    // — broadcast it so the corpus side never shuffles on `word`.
    docWords(spark, dir).join(broadcast(vocab), "word")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum(length(col("word"))).cast("long").as("n_chars"),
        sum("n_tok").cast("long").as("n_tokens"))
      .withColumn("saved", col("n_chars") - col("n_tokens"))

  private def buildBpeEncode(spark: SparkSession, dir: String): DataFrame =
    encodeAccounting(spark, dir, encodedVocab(spark, dir))

  /** Tokenizer fertility per source — the tokenizer-quality metric a
    * multilingual data team tracks: tokens emitted per word and chars
    * compressed per token under the trained BPE ([[bpeEncode]]'s
    * per-doc accounting rolled up by source). A source whose fertility
    * runs hot is under-served by the merge table — the signal that
    * re-weights tokenizer training data. Counts are exact BIGINTs; the
    * two ratios are single double divisions (engine-identical).
    *
    * Scale: rides bpe_encode's bounded-vocabulary broadcast; the source
    * join keys the doc-level frame once, the rollup partial-aggregates
    * to |sources| rows.
    */
  def bpeFertility(spark: SparkSession, dir: String): DataFrame =
    bpeEncode(spark, dir)
      .join(t(spark, dir, "documents").select("doc_id", "source"), "doc_id")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_words").cast("long").as("n_words"),
        sum("n_chars").cast("long").as("n_chars"),
        sum("n_tokens").cast("long").as("n_tokens"))
      .withColumn("fertility",
        col("n_tokens").cast("double") / col("n_words").cast("double"))
      .withColumn("compression",
        col("n_chars").cast("double") / col("n_tokens").cast("double"))

  /** Document-length distribution per source: nearest-rank quartiles.
    *
    * Count-compressed (the value_percentiles discipline): a per-source
    * rank over raw documents would funnel each source's whole slice
    * through one window task at 100 TB. Instead one partial-aggregated
    * shuffle compresses to (source, n_chars) counts — n_chars is
    * schema-bounded — and the quartile is the value whose cumulative
    * rank range [cum - cnt + 1, cum] covers ceil(n * p); identical to
    * the doc-level nearest rank (the doc_id tiebreak only chose WHICH
    * doc sat at the rank, never the value picked), so the oracle keeps
    * the literal ROW_NUMBER form and pins the equivalence.
    */
  def docLengthStats(spark: SparkSession, dir: String): DataFrame = {
    val counts = t(spark, dir, "documents")
      .groupBy("source", "n_chars").agg(count(lit(1)).as("cnt"))
    val ranked = counts
      .withColumn("cum", sum("cnt").over(
        Window.partitionBy("source").orderBy("n_chars")))
      .withColumn("n", sum("cnt").over(Window.partitionBy("source")))
      .withColumn("lo", col("cum") - col("cnt") + 1L)
    def pick(p: Double) =
      max(when(expr(s"CAST(ceil(n * $p) AS BIGINT)")
        .between(col("lo"), col("cum")), col("n_chars")))
    ranked.groupBy("source").agg(
      max("n").as("n_docs"),
      min("n_chars").as("min_c"),
      pick(0.25).as("q1"), pick(0.5).as("median"), pick(0.75).as("q3"),
      max("n_chars").as("max_c"))
  }

  /** Robust per-source length-outlier screen: exact median and median
    * absolute deviation of doc length, and the count of docs beyond
    * 5 MAD — the anomaly_mad discipline pointed at the corpus (truncated
    * crawls and concatenation bugs live in the length tails, and
    * mean/stddev breaks on exactly those tails). All integers, so both
    * engines agree bit-for-bit.
    *
    * Scale: ONE corpus scan partial-aggregates to the (source, n_chars)
    * count frame; the median, the deviation re-aggregation, the MAD,
    * and the outlier count all derive from that metadata-sized frame —
    * no second scan, no corpus window.
    */
  def docLengthOutliers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // (source, n_chars) counts are schema-bounded metadata (distinct
    // lengths per source) — the auth_failure_delay / nation_revenue
    // discipline applies (guide §5 bounded driver work): ONE
    // partial-aggregated corpus scan collects the count frame, and the
    // med/MAD/outlier chain (exact integer rank-picks) runs driver-side.
    // The r17 shape checkpointed the same frame and re-read it through 2
    // median windows + 2 broadcast joins + 3 rollups = 12 single-task
    // jobs per pass; the arithmetic below is the same exact long math
    // (ceil(n * 0.5) == (n+1) div 2 for nonnegative counts), so rows are
    // bit-identical, oracle-checked.
    val counts = t(spark, dir, "documents")
      .groupBy("source", "n_chars").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0),
        Option(r.getAs[java.lang.Long]("n_chars")).map(_.longValue),
        r.getAs[Long]("cnt")))
    // Exact rank-pick median, null-faithful to the windowed SQL form:
    // nulls order FIRST (they advance the cumulative count), the pick is
    // the smallest non-null value at-or-after the half threshold
    // (ceil(n * 0.5) == (n+1) div 2 for nonnegative counts).
    def medOf(rows: Seq[(Option[Long], Long)]): Option[Long] = {
      val half = (rows.map(_._2).sum + 1L) / 2L
      val sorted = rows.sortBy { case (v, _) =>
        (v.isDefined, v.getOrElse(0L)) }
      var cum = 0L
      val idx = sorted.indexWhere { case (_, c) => cum += c; cum >= half }
      if (idx < 0) None
      else sorted.drop(idx).collectFirst { case (Some(v), _) => v }
    }
    val out = counts.groupBy(_._1).toSeq.map { case (source, rs) =>
      val lenCounts: Seq[(Option[Long], Long)] =
        rs.toSeq.map(r => (r._2, r._3))
      val nDocs = lenCounts.map(_._2).sum
      val med = medOf(lenCounts)
      val devCounts = lenCounts.groupBy { case (len, _) =>
        for { l <- len; m <- med } yield math.abs(l - m)
      }.map { case (d, cs) => (d, cs.map(_._2).sum) }.toSeq
      val mad = medOf(devCounts)
      val nOutliers = devCounts.collect {
        case (Some(d), c) if mad.exists(m => d > m * 5L) => c }.sum
      (source, nDocs, med, mad, nOutliers, 10000L * nOutliers / nDocs)
    }
    out.toDF("source", "n_docs", "med_chars", "mad_chars", "n_outliers",
      "outlier_bp")
  }

  /** Char-mass inequality per source: the exact Gini coefficient of doc
    * lengths in basis points — 0 = every doc the same size, →10000 =
    * all mass in one doc. A source whose Gini jumps is a crawl that
    * started concatenating (few huge docs) or truncating (many tiny
    * ones) — the single-number companion to [[docLengthOutliers]]'
    * tail counts. Computed EXACTLY in integers from the (source,
    * n_chars) count frame: a run of k docs at value v whose cumulative
    * predecessor count is c0 occupies ranks c0+1..c0+k and contributes
    * v·(k·c0 + k(k+1)/2) to Σ rank·x, so
    * G_bp = (10000·(2·Σrank·x − (n+1)·Σx)) div (n·Σx) with no floats
    * anywhere — both engines agree bit-for-bit.
    *
    * Scale: ONE corpus scan partial-aggregates to the count frame;
    * the cumulative window and the Gini arithmetic run entirely there.
    */
  def lengthGini(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy("source", "n_chars").agg(count(lit(1)).as("k"))
      .withColumn("c0",
        coalesce(sum("k").over(Window.partitionBy("source")
          .orderBy("n_chars").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .groupBy("source")
      .agg(sum("k").cast("long").as("n_docs"),
        sum(col("n_chars") * col("k")).cast("long").as("total_chars"),
        sum(col("n_chars") *
          (col("k") * col("c0") + expr("(k * (k + 1)) div 2")))
          .cast("long").as("s1"))
      .withColumn("gini_bp",
        // A source of solely zero-length docs has total_chars = 0:
        // degrade to gini 0 instead of an ANSI DIVIDE_BY_ZERO abort.
        expr("""CASE WHEN total_chars > 0
               |  THEN (10000 * (2 * s1 - (n_docs + 1) * total_chars))
               |    div (n_docs * total_chars)
               |  ELSE 0 END""".stripMargin))
      .select("source", "n_docs", "total_chars", "gini_bp")

  /** Mixed-language document screen: a doc whose second-best language
    * carries at least a third of its best language's marker mass is
    * code-switching, boilerplate-in-another-language, or mislabeled —
    * the docs langid silently assigns to ONE language and a monolingual
    * training mix silently absorbs. Per source: mixed and
    * zero-evidence (no marker hit at all) counts, mixed share in basis
    * points. In-row scoring (the langid markers), rollup-only exchange;
    * null text degrades to zero hits, never the stage.
    */
  /** The marker-hit (best, second) scoring columns — the ONE spelling
    * of the mixed-doc evidence shared by [[langMix]] and the streaming
    * screen (graft.streaming.Streams.langMixStream), so the rule can
    * never silently diverge between them (the BenchSplitMod
    * discipline).
    */
  private[graft] def withLangMixScores(df: DataFrame): DataFrame =
    df.withColumn("toks", split(coalesce(col("text"), lit("")), " "))
      .withColumn("h_en", expr(hitExpr(markers("en"))).cast("long"))
      .withColumn("h_es", expr(hitExpr(markers("es"))).cast("long"))
      .withColumn("h_fr", expr(hitExpr(markers("fr"))).cast("long"))
      .withColumn("best", greatest(col("h_en"), col("h_es"), col("h_fr")))
      .withColumn("second",
        col("h_en") + col("h_es") + col("h_fr") - col("best") -
          least(col("h_en"), col("h_es"), col("h_fr")))

  def langMix(spark: SparkSession, dir: String): DataFrame =
    withLangMixScores(t(spark, dir, "documents"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("second") > 0L && col("second") * 3L >= col("best"),
          1L).otherwise(0L)).cast("long").as("n_mixed"),
        sum(when(col("best") === 0L, 1L).otherwise(0L)).cast("long")
          .as("n_nohit"))
      .withColumn("mixed_bp", expr("(10000 * n_mixed) div n_docs"))

  /** Per-source sentence segmentation audit: sentence counts and lengths
    * under the standard [.!?]+ splitter — the structural sibling of
    * [[docLengthStats]] (a source whose "sentences" average 9 chars or
    * 900 is table dumps or run-on crawl junk, not prose, whatever its
    * doc-length profile says). Sentences are counted and measured
    * entirely in-row (split → trim-filter → length fold); the only
    * exchange is the |sources|-row rollup. Ratios are integer basis
    * points / floor divisions, so both engines agree bit-for-bit; null
    * text degrades to zero sentences (the EdgeCaseSpec contract), never
    * the stage.
    */
  def sentenceStats(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("source"),
        expr("filter(split(coalesce(text, ''), '[.!?]+')," +
          " x -> length(trim(x)) > 0)").as("sents"))
      .select(col("source"),
        size(col("sents")).cast("long").as("n_s"),
        expr("aggregate(sents, CAST(0 AS BIGINT)," +
          " (acc, x) -> acc + length(trim(x)))").as("c_s"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_s").cast("long").as("n_sent"),
        sum("c_s").cast("long").as("sent_chars"))
      .select(col("source"), col("n_docs"), col("n_sent"),
        expr("(10000 * n_sent) div n_docs").as("sent_per_doc_bp"),
        expr("CASE WHEN n_sent > 0 THEN sent_chars div n_sent" +
          " ELSE CAST(0 AS BIGINT) END").as("chars_per_sent"))

  /** Canonical text normalization: lowercase, strip punctuation, collapse
    * whitespace — the first stage of every text pipeline, reported with
    * before/after sizes and the normalized md5 identity.
    */
  def normalizeText(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("norm",
        trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")))
      .select(col("doc_id"),
        length(col("text")).cast("long").as("raw_len"),
        length(col("norm")).cast("long").as("norm_len"),
        md5(col("norm")).as("norm_hash"))

  /** Per-source vocabulary statistics: token volume, distinct vocabulary,
    * and type-token ratio — the corpus-diversity profile used to weight
    * sources in a training mix.
    */
  def vocabStats(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_tokens"),
        countDistinct("tok").as("n_vocab"))
      .withColumn("ttr", col("n_vocab") / col("n_tokens"))

  /** Zipf power-law profile: per source, the token frequency-rank
    * distribution compressed into log2 rank buckets — the diagnostic a
    * corpus-quality gate reads against Zipf's law (natural text puts
    * roughly constant total frequency in each doubling of rank; machine-
    * generated or template text collapses the head or flattens the
    * tail). Pure integer math (bucket = bit length of the rank), so both
    * engines agree bit-for-bit without transcendental parity.
    *
    * Scale: the token counting partial-aggregates per (source, token);
    * the rank window shuffles only the |sources|*|vocab| count frame
    * (vocabulary grows sub-linearly in the corpus), and the bucket
    * rollup is |sources|*~20 rows.
    */
  def zipfProfile(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("source").orderBy(col("freq").desc, col("tok"))
    t(spark, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("source", "tok")
      .agg(count(lit(1)).as("freq"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("rank_bucket", (length(bin(col("rank"))) - 1).cast("long"))
      .groupBy("source", "rank_bucket")
      .agg(
        count(lit(1)).as("n_toks"),
        sum("freq").cast("long").as("sum_freq"),
        max("freq").cast("long").as("max_freq"))
  }

  /** Top-vocabulary size for [[vocabOverlap]]. */
  private val VocabTopK = 200L

  /** Cross-source vocabulary overlap: Jaccard of the top-[[VocabTopK]]
    * token vocabularies for every unordered source pair — the source-
    * similarity matrix a mixing plan reads (near-duplicate sources add
    * redundancy, not diversity; a source overlapping nothing is either
    * novel or noise). Deterministic vocabularies (count desc, token
    * asc); overlap as exact-integer counts plus one double division.
    *
    * Scale: the token counting partial-aggregates per (source, token);
    * after the top-K cut both join sides are |sources|·K rows —
    * metadata-sized, so the pair join and rollup never touch the corpus
    * again.
    */
  def vocabOverlap(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(col("n").desc, col("tok"))
    val top = t(spark, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("source", "tok")
      .agg(count(lit(1)).as("n"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= VocabTopK)
      .select("source", "tok")
    val shared = top.as("a")
      .join(top.as("b"),
        col("a.tok") === col("b.tok") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
      .agg(count(lit(1)).as("n_shared"))
    // actual vocabulary sizes (a source can hold < TopK distinct tokens)
    val sizes = top.groupBy("source").agg(count(lit(1)).as("sz"))
    // EVERY unordered source pair, generated from the size table (s1 < s2)
    // — an inner join on the shared counts would silently drop pairs with
    // zero common tokens, exactly the "overlaps nothing" rows the mixing
    // plan needs to see. Both sides are |sources| rows, so the pair
    // universe is a broadcast nested-loop over metadata, never the corpus.
    sizes.select(col("source").as("s1"), col("sz").as("sz1"))
      .crossJoin(broadcast(
        sizes.select(col("source").as("s2"), col("sz").as("sz2"))))
      .filter(col("s1") < col("s2"))
      .join(shared, Seq("s1", "s2"), "left")
      .na.fill(0L, Seq("n_shared"))
      .withColumn("jaccard",
        col("n_shared") /
          (col("sz1") + col("sz2") - col("n_shared")).cast("double"))
      .select("s1", "s2", "n_shared", "sz1", "sz2", "jaccard")
  }

  /** The full Gopher/RefinedWeb repetition battery (Rae et al. 2021
    * §A1.1 extends [[repetitionNgrams]]' single 2-gram signal): per doc
    * with ≥ 4 tokens, for n ∈ {2, 3, 4} the n-gram count, the
    * duplicate-gram fraction (n_grams − n_distinct)/n_grams, and the
    * top-gram mass top_n/n_grams — template/machine text trips
    * different orders at different thresholds, so quality filters read
    * the battery, not one number. Every fraction is one double
    * division of exact integers derived from the in-row array_counts
    * combiner: no explode, no shuffle beyond the scan — streams at
    * scan speed at 100 TB.
    */
  def repetitionProfile(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.TextHashes.register(spark)
    def gm(n: Int) = expr(
      s"""array_counts(transform(sequence(1, size(toks) - ${n - 1}),
         |  i -> concat_ws(' ', slice(toks, i, $n))))""".stripMargin)
    def stats(n: Int)(df: DataFrame): DataFrame = df
      .withColumn("m", gm(n))
      .withColumn(s"n_grams_$n",
        expr("aggregate(map_values(m), 0L, (a, x) -> a + x)"))
      .withColumn(s"dup_frac_$n",
        (col(s"n_grams_$n") - expr("CAST(size(m) AS BIGINT)")) /
          col(s"n_grams_$n"))
      .withColumn(s"top_frac_$n",
        expr("array_max(map_values(m))") / col(s"n_grams_$n"))
      .drop("m")
    val base = t(spark, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 4)
    Seq(2, 3, 4).foldLeft(base)((d, n) => stats(n)(d))
      .select(col("doc_id"),
        col("n_grams_2"), col("dup_frac_2"), col("top_frac_2"),
        col("n_grams_3"), col("dup_frac_3"), col("top_frac_3"),
        col("n_grams_4"), col("dup_frac_4"), col("top_frac_4"))
  }

  /** Source-ablation signal: per source, how much of the corpus's
    * DISTINCT char-8-gram universe it covers, and how much exists
    * NOWHERE else — the "what would removing this source actually
    * lose" number a mixing plan reads against [[vocabOverlap]]'s
    * redundancy view (a source with high coverage but near-zero unique
    * mass is replaceable; low coverage with high unique mass is the
    * long tail worth protecting). Integer ppm shares over the distinct
    * universe.
    *
    * Scale: grams dedupe in-row first (gram_hashes emits each doc's
    * DISTINCT hashes), then two shuffles keyed by the uniform 56-bit
    * gram hash — (source, h) dedup and the per-h source rollup; the
    * per-source frames are |sources| rows and broadcast.
    */
  def sourceUniqueGrams(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.TextHashes.register(spark)
    // Deliberately NOT checkpointed: the deduped (source, h) frame is
    // DATA-sized, so materializing it for its two consumers costs as
    // much as the rescans it would save (measured: +46% at sf0.1 and
    // +28% at 100x with a localCheckpoint here); each consumer's
    // pipeline partial-aggregates before its exchange instead.
    // tPar: the double gram fan below is per-row-expensive and this is a
    // direct scan (each consumer re-derives g) — measured 0.90x in-bench
    // and 2.2x standalone with the parallelized scan.
    val g = graft.Tables.tPar(spark, dir, "documents", "doc_id")
      .filter(length(col("text")) >= 8)
      .select(col("source"), explode(expr("gram_hashes(text, 8, 0)")).as("h"))
      .distinct()
    val per = g.groupBy("h")
      .agg(count(lit(1)).as("ns"), max("source").as("src"))
    val univ = per.agg(count(lit(1)).as("univ"))
    val cov = g.groupBy("source").agg(count(lit(1)).as("n_grams"))
    val uq = per.filter(col("ns") === 1L)
      .groupBy(col("src").as("source"))
      .agg(count(lit(1)).as("n_unique"))
    cov.join(broadcast(uq), Seq("source"), "left")
      .na.fill(0L, Seq("n_unique"))
      .crossJoin(broadcast(univ))
      .select(col("source"), col("n_grams"), col("n_unique"),
        // DECIMAL(38) headroom: the distinct-gram universe at 100 TB is
        // ~1e14 — 1e6·count wraps BIGINT well before that.
        expr("CAST((1000000 * CAST(n_unique AS DECIMAL(38,0))) div univ" +
          " AS BIGINT)").as("unique_ppm"),
        expr("CAST((1000000 * CAST(n_grams AS DECIMAL(38,0))) div univ" +
          " AS BIGINT)").as("coverage_ppm"))
  }

  /** Collocation mining over adjacent token pairs: the top-100 bigrams
    * by LIFT — observed co-occurrence over the independence expectation,
    * n_ab·N / (n_a·n_b), in integer parts-per-million (the log-free PMI
    * ranking: log is monotone, so ordering by lift IS ordering by PMI,
    * with no transcendental parity risk) — at minimum support 5. The
    * multiword-expression / tokenizer-merge-candidate view a vocab
    * design reads ("new york" scoring 100x its independence expectation
    * is one token in spirit). Products run in DECIMAL(38,0) so the
    * ppm scaling cannot overflow at 100 TB token counts (n_ab·10⁶·N ≤
    * 10²⁷ ≪ 10³⁸), and the division is truncating integral DIV —
    * engine-exact.
    *
    * Scale: bigram and unigram counts partial-aggregate in-row
    * (array_counts) before their one shuffle each; the support-5 cut
    * prunes the bigram tail before the two vocab-frame joins; the
    * top-100 is a distributed partial top-k (TakeOrderedAndProject),
    * never a global sort.
    */
  def collocations(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.TextHashes.register(spark)
    val toks = t(spark, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
    // The unigram frame has three consumers, each re-deriving it from
    // its own scan — and that is the measured-fastest shape here: every
    // branch partial-aggregates in parallel off the (page-cached) scan,
    // while a localCheckpoint serializes the whole query behind one
    // materialization (+29% at sf0.1, still slower at 100x). On a real
    // cluster where scans pay network I/O the trade can flip; swap in a
    // checkpoint there, guided by the same measurement.
    val uni = toks
      .select(explode(expr("array_counts(toks)")).as(Seq("w", "tf")))
      .groupBy("w").agg(sum("tf").cast("long").as("n_w"))
    val nTok = uni.agg(sum("n_w").cast("long").as("n_total"))
    toks.filter(size(col("toks")) >= 2)
      .select(explode(expr(
        """array_counts(transform(sequence(1, size(toks) - 1),
          |  i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))))"""
          .stripMargin)).as(Seq("bg", "tf")))
      .groupBy("bg").agg(sum("tf").cast("long").as("n_ab"))
      .filter(col("n_ab") >= 5L)
      .withColumn("w1", expr("split_part(bg, ' ', 1)"))
      .withColumn("w2", expr("split_part(bg, ' ', 2)"))
      .join(uni.select(col("w").as("w1"), col("n_w").as("n_a")), "w1")
      .join(uni.select(col("w").as("w2"), col("n_w").as("n_b")), "w2")
      .crossJoin(broadcast(nTok))
      .withColumn("lift_ppm", expr(
        """CAST((CAST(n_ab AS DECIMAL(38,0)) * 1000000 * n_total)
          |  DIV (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"""
          .stripMargin))
      .select("w1", "w2", "n_ab", "n_a", "n_b", "lift_ppm")
      .orderBy(col("lift_ppm").desc, col("w1"), col("w2"))
      .limit(100)
  }

  /** Corpus vocabulary size for [[vocabCoverage]]. */
  private val CoverageK = 500

  /** Tokenizer-vocabulary coverage: per source, the token mass and type
    * count falling OUTSIDE the corpus-level top-[[CoverageK]] vocabulary
    * — the "how much of this source would a K-entry tokenizer render as
    * UNK/byte-fallback" audit run before fixing a vocabulary size. A
    * source with a high OOV rate is under-served by the shared vocab
    * (jargon, another language, noise) and either needs vocab budget or
    * a quality look.
    *
    * Scale: ONE (source, token) partial-aggregated shuffle; the corpus
    * rollup compresses to the vocabulary (sub-linear in data); the
    * top-K cut is a distributed partial top-K (TakeOrderedAndProject —
    * per-partition heads merged on one K-row frame, never a global
    * sort); the K-row vocab broadcasts back. OOV accounting is a
    * per-source rollup of the already-aggregated count frame.
    */
  def vocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    // The count frame feeds both the corpus top-K branch and the OOV
    // join; as in [[collocations]], the measured-fastest local shape is
    // letting each branch re-derive it (parallel partial-aggregated
    // scans beat serializing behind a localCheckpoint: +57% at sf0.1
    // with one). On a cluster where scans pay network I/O, checkpoint
    // the vocabulary-sized frame instead — same measurement, new trade.
    val counts = t(spark, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("source", "tok")
      .agg(count(lit(1)).as("n"))
    val topv = counts.groupBy("tok").agg(sum("n").cast("long").as("cn"))
      .orderBy(col("cn").desc, col("tok")).limit(CoverageK)
      .select(col("tok"), lit(1L).as("in_vocab"))
    counts.join(broadcast(topv), Seq("tok"), "left")
      .groupBy("source")
      .agg(
        sum("n").cast("long").as("n_tokens"),
        sum(when(col("in_vocab").isNull, col("n")).otherwise(0L))
          .cast("long").as("oov_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L))
          .cast("long").as("oov_types"))
      .withColumn("oov_rate", col("oov_tokens") / col("n_tokens"))
  }

  /** Corpus coverage-vs-vocab-size curve: the token mass covered by the
    * top-K vocabulary at K ∈ {4, 8, 16} — the "how big must the vocab
    * be" knob read before fixing a tokenizer budget ([[vocabCoverage]]
    * answers it for ONE K per source; this is the corpus-level curve,
    * the ivf_recall_curve discipline applied to the vocabulary). All
    * counts are exact longs, coverage in integer basis points.
    *
    * Scale: one corpus scan partial-aggregates to the vocabulary-sized
    * (tok, cn) frame; the top-16 head comes off it as a parallel
    * TakeOrdered (no global window over the vocabulary), and the curve
    * evaluates on those 16 rows against the broadcast scalar total.
    */
  def vocabCoverageCurve(spark: SparkSession, dir: String): DataFrame = {
    val counts = t(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).cast("long").as("cn"))
    val top = counts.orderBy(col("cn").desc, col("tok")).limit(16)
      .withColumn("r", row_number().over(
        Window.orderBy(col("cn").desc, col("tok"))).cast("long"))
    val tot = counts.agg(sum("cn").cast("long").as("n_total"))
    val ks = spark.range(0, 3, 1, 1)
      .select(expr("CAST(shiftleft(4, CAST(id AS INT)) AS BIGINT)").as("k"))
    top.crossJoin(broadcast(ks))
      .groupBy("k")
      .agg(sum(when(col("r") <= col("k"), col("cn")).otherwise(0L))
        .cast("long").as("covered"))
      .crossJoin(broadcast(tot))
      .select(col("k"), col("covered"), col("n_total"))
      .withColumn("coverage_bp", expr("(10000 * covered) div n_total"))
  }

  /** Per-source dataset card: the one-row-per-source summary a corpus
    * release ships — population (docs, chars), majority language with
    * its share, exact-duplicate exposure (docs whose full-text md5
    * recurs ANYWHERE in the corpus, so cross-source mirrors count), and
    * the Gopher keep rate. Every rate is integer basis points
    * (truncating div, identical both engines); the majority language
    * tie-breaks deterministically (count desc, then lang desc via the
    * struct max). The first artifact a data consumer reads and the
    * last the curation pipeline writes.
    *
    * Scale: three corpus scans (profile, hash, quality words), each
    * rolling up per source / per hash with map-side combine — no
    * data-sized join keys except the hash rollup, which is the
    * dedup_exact shape; everything after is |sources|-row metadata.
    */
  def corpusCard(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val base = docs.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum("n_chars").cast("long").as("total_chars"))
    val lmax = docs.groupBy("source", "lang").agg(count(lit(1)).as("ln"))
      .groupBy("source")
      .agg(max(struct(col("ln"), col("lang"))).as("m"))
      .select(col("source"), col("m.lang").as("top_lang"),
        col("m.ln").as("top_lang_n"))
    val h = docs.select(col("source"), md5(col("text")).as("h"))
    val dups = h.join(
        h.groupBy("h").agg(count(lit(1)).as("nh")).filter(col("nh") > 1L)
          .select("h"), "h")
      .groupBy("source").agg(count(lit(1)).as("dup_docs"))
    val keep = qualityGopher(spark, dir).select("doc_id", "keep")
      .join(docs.select("doc_id", "source"), "doc_id")
      .groupBy("source").agg(sum("keep").cast("long").as("keep_docs"))
    base.join(lmax, "source")
      .join(dups, Seq("source"), "left").na.fill(0L, Seq("dup_docs"))
      .join(keep, "source")
      .withColumn("top_lang_bp", expr("(10000 * top_lang_n) div n_docs"))
      .withColumn("dup_bp", expr("(10000 * dup_docs) div n_docs"))
      .withColumn("keep_bp", expr("(10000 * keep_docs) div n_docs"))
  }

  /** Gopher-style per-document quality signals (Rae et al. 2021 §A1.1):
    * word count, mean word length, type-token ratio, and the top-word
    * mass fraction, folded into a keep/drop gate. One explode + one
    * two-level aggregation (word counts per doc, then doc rollup) — the
    * per-word frame partial-aggregates before the shuffle, so at 100 TB
    * the wide exchange carries (doc, word) counts, not occurrences.
    */
  def qualityGopher(spark: SparkSession, dir: String): DataFrame = {
    val words = t(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id", "w")
      .agg(count(lit(1)).as("n"))
    words.groupBy("doc_id")
      .agg(
        sum("n").cast("long").as("n_words"),
        count(lit(1)).as("n_distinct"),
        max("n").as("top_n"),
        sum(col("n") * length(col("w"))).cast("long").as("sum_len"))
      .select(
        col("doc_id"), col("n_words"), col("n_distinct"), col("top_n"),
        (col("sum_len") / col("n_words")).as("mean_word_len"),
        (col("n_distinct") / col("n_words")).as("ttr"),
        (col("top_n") / col("n_words")).as("top_frac"))
      .withColumn("keep",
        when(col("n_words") >= 10L && col("n_words") <= 1000L
          && col("mean_word_len") >= 2.0 && col("mean_word_len") <= 10.0
          && col("top_frac") <= 0.2, 1L).otherwise(0L))
  }

  /** Duplicate word-3-gram fraction per document (the Gopher repetition
    * signal): computed entirely in-row (gram array vs its distinct form) —
    * no explode, no shuffle; streams at scan speed.
    */
  def repetitionNgrams(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .withColumn("grams",
        expr("transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', slice(toks, i + 1, 3)))"))
      .select(
        col("doc_id"),
        size(col("grams")).cast("long").as("n_grams"),
        size(array_distinct(col("grams"))).cast("long").as("n_distinct"))
      .withColumn("dup_frac",
        (col("n_grams") - col("n_distinct")) / col("n_grams"))
      .withColumn("repetitive", when(col("dup_frac") > 0.1, 1L).otherwise(0L))

  /** Corpus-frequency likelihood: a language-model-quality proxy with no
    * floats in the model — each document is scored by the mean corpus
    * document-frequency of its tokens (occurrence-weighted). Common-word
    * documents score high, rare-token noise scores low — the integer-exact
    * stand-in for a perplexity bucket (logs and float products would
    * drift between engines; a ratio of two exact integer sums cannot).
    * The df table is vocabulary-sized, so the join broadcasts; per-doc
    * term frequencies come from the in-row array_counts combiner (one
    * generator row per DISTINCT token per doc).
    */
  /** Per-doc corpus-frequency score, fingerprint-cached per (session,
    * data) — the [[bpeEncode]] per-doc accounting discipline. FOUR
    * registry queries consume this frame (gram_likelihood itself,
    * likelihood_quartiles, quality_length_matrix, quality_by_dup) and
    * two of them replicate it several times inside one plan
    * (quality_length_matrix planned 24 parquet scans of the tokenize +
    * df-join subtree before caching); the cached form is one 4-column
    * row per doc, the same footprint class as the encode cache.
    */
  private val glCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  def gramLikelihood(spark: SparkSession, dir: String): DataFrame =
    glCache.getOrElseUpdate(
      graft.Tables.freshCacheKey(glCache, spark, dir, "documents"),
      buildGramLikelihood(spark, dir).localCheckpoint())

  private def buildGramLikelihood(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.TextHashes.register(spark)
    val tf = t(spark, dir, "documents")
      .select(col("doc_id"),
        explode(expr("array_counts(split(text, ' '))")).as(Seq("tok", "tf")))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "tok")
      .groupBy("doc_id")
      .agg(
        sum("tf").cast("long").as("n_tokens"),
        sum(col("tf") * col("df")).cast("long").as("sum_df"))
      .withColumn("score",
        col("sum_df").cast("double") / col("n_tokens").cast("double"))
  }

  /** Per-source quartiles of the corpus-frequency quality score — the
    * threshold-calibration table behind [[corpusFilter]]: a global
    * quality cut over sources with different score distributions
    * silently guts the clean source and keeps the noisy one; this is
    * the per-source evidence for per-source thresholds. The score is
    * [[gramLikelihood]]'s ratio quantized to integer micro-units
    * ((1e6·sum_df) div n_tokens) so the nearest-rank picks are
    * bit-identical; quartiles come straight off the (source, score)
    * count frame's cumulative window (the length_gini discipline — no
    * join back to rows).
    */
  def likelihoodQuartiles(spark: SparkSession, dir: String): DataFrame = {
    val qs = gramLikelihood(spark, dir)
      .select(col("doc_id"),
        expr("CAST((1000000 * CAST(sum_df AS DECIMAL(38,0))) div n_tokens AS BIGINT)").as("qs_q"))
      .join(t(spark, dir, "documents").select("doc_id", "source"),
        "doc_id")
    val byS = Window.partitionBy("source")
    val cum = qs.groupBy("source", "qs_q").agg(count(lit(1)).as("k"))
      .withColumn("cum", sum("k").over(byS.orderBy("qs_q")
        .rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
      .withColumn("n", sum("k").over(byS).cast("long"))
    def pick(p: Double) =
      max(when(col("cum") >= expr(s"CAST(ceil(n * $p) AS BIGINT)") &&
        col("cum") - col("k") < expr(s"CAST(ceil(n * $p) AS BIGINT)"),
        col("qs_q")))
    cum.groupBy("source").agg(max("n").as("n_docs"),
      pick(0.25).as("q1_qs"), pick(0.5).as("median_qs"),
      pick(0.75).as("q3_qs"))
  }

  /** Quality × length contingency grid: doc counts over a fixed bucket
    * grid of the corpus-frequency quality score (200k-micro-unit steps,
    * capped at 10) against document length (200-char steps, capped at
    * 10), with each cell's share of its length ROW in basis points —
    * the confound audit run before shipping any quality threshold: if
    * high-quality mass concentrates in one length band, the "quality"
    * cut is a length cut in disguise ([[likelihoodQuartiles]] says
    * where to cut per source; this says what the cut actually selects).
    * One scored scan partial-aggregated to the <= 121-cell grid; row
    * totals re-aggregate there.
    */
  def qualityLengthMatrix(spark: SparkSession, dir: String): DataFrame = {
    val scored = gramLikelihood(spark, dir)
      .select(col("doc_id"),
        expr("CAST((1000000 * CAST(sum_df AS DECIMAL(38,0))) div n_tokens AS BIGINT)").as("qs_q"))
      .join(t(spark, dir, "documents").select("doc_id", "n_chars"),
        "doc_id")
    // min-max scaled 10-bucket grid on BOTH axes (integer-exact; the
    // +1 keeps the max value inside bucket 9) — corpus-adaptive, so the
    // grid stays informative whatever the absolute score range is
    val ext = scored.agg(
      min("qs_q").as("q_mn"), max("qs_q").as("q_mx"),
      min("n_chars").as("l_mn"), max("n_chars").as("l_mx"))
    // <= 121 rows; checkpointed so the row-total re-aggregation and the
    // final join share one derivation instead of re-running the scored
    // subtree per consumer.
    val cells = scored.crossJoin(broadcast(ext))
      .select(
        expr("((qs_q - q_mn) * 10) div (q_mx - q_mn + 1)").as("q_bucket"),
        expr("((n_chars - l_mn) * 10) div (l_mx - l_mn + 1)")
          .as("len_bucket"))
      .groupBy("q_bucket", "len_bucket")
      .agg(count(lit(1)).as("n_docs"))
      .localCheckpoint()
    val rows = cells.groupBy("len_bucket")
      .agg(sum("n_docs").cast("long").as("row_total"))
    cells.join(broadcast(rows), "len_bucket")
      .select(col("q_bucket"), col("len_bucket"), col("n_docs"),
        expr("(10000 * n_docs) div row_total").as("row_share_bp"))
  }

  /** Exact-substring duplicate candidates: documents sharing at least 3 of
    * their bottom-8 winnowed 8-gram fingerprints (the [[fingerprint]]
    * sketch turned into a pair generator) — the scalable alternative to a
    * suffix-array exact-substring dedup: the join key is a 56-bit hash, so
    * buckets are tiny and the shuffle carries 8 rows per document, never
    * the text.
    */
  def substringDupPairs(spark: SparkSession, dir: String): DataFrame =
    // One pass over the text (a self-join would evaluate the gram hashing
    // twice): group the 8-per-doc fingerprint rows by hash and emit each
    // bucket's (d1 < d2) pairs in-row from the sorted member list.
    fingerprint(spark, dir)
      .groupBy("h").agg(sort_array(collect_list("doc_id")).as("ds"))
      // A fingerprint shared by more than 32 documents is a stop-gram (a
      // globally common 8-gram whose hash happens to be small), not a
      // duplication signal; the cap also bounds the per-bucket pair
      // blowup at scale, exactly like the LSH band cap.
      .filter(size(col("ds")).between(2, 32))
      .select(explode(expr(
        """flatten(transform(ds, (x, i) ->
          |  transform(slice(ds, i + 2, size(ds)), y ->
          |    struct(x AS d1, y AS d2))))""".stripMargin)).as("p"))
      .select(col("p.d1"), col("p.d2"))
      .groupBy("d1", "d2")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 3L)

  /** Per-document lexical diversity: type-token ratio and the Simpson
    * diversity index 1 − Σ tf²/n² (the token-concentration signal quality
    * filters use alongside [[qualityGopher]] — a doc dominated by a few
    * repeated tokens scores near 0, a fully varied one near 1). Integer-
    * exact parity: both ratios are one double division of exact BIGINT
    * sums (n² − Σ tf² as the Simpson numerator) — no logs, no float
    * folds. Computed entirely in-row from the array_counts combiner: no
    * explode, no shuffle; streams at scan speed at 100 TB.
    */
  def lexicalDiversity(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.TextHashes.register(spark)
    t(spark, dir, "documents")
      .withColumn("m", expr("array_counts(split(text, ' '))"))
      .select(col("doc_id"),
        expr("aggregate(map_values(m), 0L, (a, x) -> a + x)").as("n_tokens"),
        expr("CAST(size(m) AS BIGINT)").as("n_types"),
        expr("aggregate(map_values(m), 0L, (a, x) -> a + x * x)").as("sum_sq"))
      .withColumn("ttr",
        col("n_types").cast("double") / col("n_tokens").cast("double"))
      .withColumn("simpson",
        (col("n_tokens") * col("n_tokens") - col("sum_sq")).cast("double")
          / (col("n_tokens") * col("n_tokens")).cast("double"))
  }

  /** Per-document n-gram novelty against the earlier corpus (doc_id
    * order): the fraction of a doc's distinct char-8-grams whose FIRST
    * corpus occurrence is this doc — the incremental-ingest signal a
    * pipeline reads to decide whether a new crawl slice still adds
    * content (novelty decaying to ~0 means the source is exhausted) and
    * the per-doc complement of [[substringDupPairs]]' pairwise view.
    * Integer-exact parity: counts plus one double division.
    *
    * Scale: one explode of the in-row distinct gram hashes (the
    * [[fingerprint]] machinery without the bottom-8 cut), ONE shuffle
    * keyed by the 56-bit gram hash (uniform — no skew), a min-over-hash
    * window inside that partitioning, then a map-side-combined rollup to
    * doc grain. Gram rows carry (doc_id, h) only — 16 bytes — never the
    * text; at 100 TB the shuffle is ~2% of corpus bytes.
    */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.TextHashes.register(spark)
    // tPar: per-row gram hashing + explode dominates; direct scan, no
    // shared cache — measured 0.61x with the parallelized scan.
    graft.Tables.tPar(spark, dir, "documents", "doc_id")
      .filter(length(col("text")) >= 8)
      .select(col("doc_id"), explode(expr("gram_hashes(text, 8, 0)")).as("h"))
      .withColumn("fd", min("doc_id").over(Window.partitionBy("h")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("doc_id") === col("fd"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty",
        col("n_novel").cast("double") / col("n_grams").cast("double"))
  }

  /** Word-BIGRAM df-weighted likelihood — [[gramLikelihood]] lifted to
    * token order: a doc of common words in an order nobody else uses
    * (shuffled/generated salad) scores low here while scoring high on the
    * unigram gate, so the two together separate "rare words" from "wrong
    * order". Same integer-exact contract: score is one double division of
    * two exact BIGINT sums.
    *
    * Scale: bigrams are generated and counted IN-ROW (array_counts over
    * the adjacent-pair transform — one generator row per distinct bigram
    * per doc), hashed to 56 bits so the shuffle carries (doc_id, h, tf)
    * and never the strings. Unlike the unigram df (vocabulary-sized,
    * broadcast), the bigram df grows with the corpus — so df is a
    * count-over-hash window INSIDE the one uniform-key shuffle (the
    * [[ngramNovelty]] shape), not a groupBy + re-shuffle join, followed
    * by the map-side-combined doc rollup.
    */
  def bigramLikelihood(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.TextHashes.register(spark)
    t(spark, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        """array_counts(transform(sequence(1, size(toks) - 1),
          |  i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))))"""
          .stripMargin)).as(Seq("bg", "tf")))
      .select(col("doc_id"), md5Long(col("bg")).as("h"), col("tf"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("h")))
      .groupBy("doc_id")
      .agg(sum("tf").cast("long").as("n_bigrams"),
        sum(col("tf") * col("df")).cast("long").as("sum_df"))
      .withColumn("score",
        col("sum_df").cast("double") / col("n_bigrams").cast("double"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ngram_novelty" -> ngramNovelty,
    "bigram_likelihood" -> bigramLikelihood,
    "lexical_diversity" -> lexicalDiversity,
    "bpe_merges" -> bpeMerges,
    "bpe_encode" -> bpeEncode,
    "bpe_fertility" -> bpeFertility,
    "bpe_pair_counts" -> bpePairCounts,
    "gram_likelihood" -> gramLikelihood,
    "likelihood_quartiles" -> likelihoodQuartiles,
    "quality_length_matrix" -> qualityLengthMatrix,
    "substring_dup_pairs" -> substringDupPairs,
    "quality_gopher" -> qualityGopher,
    "repetition_ngrams" -> repetitionNgrams,
    "vocab_stats" -> vocabStats,
    "vocab_coverage" -> vocabCoverage,
    "vocab_coverage_curve" -> vocabCoverageCurve,
    "corpus_card" -> corpusCard,
    "collocations" -> collocations,
    "source_unique_grams" -> sourceUniqueGrams,
    "repetition_profile" -> repetitionProfile,
    "vocab_overlap" -> vocabOverlap,
    "zipf_profile" -> zipfProfile,
    "normalize_text" -> normalizeText,
    "tfidf" -> tfidf,
    "ngram_counts" -> ngramCounts,
    "doc_length_stats" -> docLengthStats,
    "doc_length_outliers" -> docLengthOutliers,
    "lang_mix" -> langMix,
    "length_gini" -> lengthGini,
    "sentence_stats" -> sentenceStats,
    "corpus_filter" -> corpusFilter,
    "quality_c4" -> qualityC4,
    "langid" -> langid,
    "langid_eval" -> langidEval,
    "langid_margin" -> langidMargin,
    "prefix_dup_profile" -> prefixDupProfile,
    "quality_score" -> qualityScore,
    "char_class_profile" -> charClassProfile,
    "token_len_profile" -> tokenLenProfile,
    "vocab_growth_curve" -> vocabGrowthCurve,
    "source_lang_matrix" -> sourceLangMatrix,
    "token_count" -> tokenCount,
    "fingerprint" -> fingerprint)

  private def hitSql(words: Seq[String]): String =
    s"len(list_filter(string_split(text, ' '), x -> x in (${words.map(w => s"'$w'").mkString(", ")})))"

  /** The corpus_filter decision chain as a WITH-continuation (ends with
    * `r(doc_id, reason)`) — shared by the corpus_filter oracle and
    * Curation's curation_pipeline oracle.
    */
  private[llm] lazy val corpusFilterChainSql: String =
    s"""m AS (
       |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_c,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_t,
       |    CAST(${hitSql(markers("en"))} AS BIGINT) AS n_stop,
       |    MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
       |  FROM documents),
       |r AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id <> keep_id THEN 'dup'
       |         WHEN n_t < 20 THEN 'too_short'
       |         WHEN (n_c - (n_t - 1)) / n_t < 3.0
       |           OR (n_c - (n_t - 1)) / n_t > 8.0 THEN 'tok_len'
       |         WHEN n_stop / n_t > 0.2 THEN 'stopwords'
       |         ELSE 'keep' END AS reason
       |  FROM m)""".stripMargin

  /** DuckDB mirror of [[bpeMerges]]: the 3 merge rounds unrolled as CTEs
    * (pair count -> top-1 winner -> replace), same left-to-right
    * non-overlapping replace semantics.
    */
  /** The 3-round BPE training CTE chain (norm/words/s0, then per round
    * pair counts p_r, winner t_r, merged vocabulary s_r) — s3 is the
    * vocabulary AFTER all three merges. Shared by the bpe_merges and
    * bpe_encode oracles.
    */
  private[llm] def bpeChainSql: String = {
    val rounds = (1 to 3).map { r =>
      val prev = if (r == 1) "s0" else s"s${r - 1}"
      s"""p$r AS (
         |  SELECT pair, CAST(SUM(freq) AS BIGINT) AS n_pair FROM (
         |    SELECT freq, unnest(list_transform(generate_series(1, len(el) - 1),
         |      i -> el[i] || ' ' || el[i + 1])) AS pair
         |    FROM (SELECT freq, string_split(trim(seq), ' ') AS el FROM $prev))
         |  GROUP BY pair),
         |t$r AS (SELECT pair, n_pair FROM p$r ORDER BY n_pair DESC, pair LIMIT 1),
         |s$r AS (
         |  SELECT word, freq,
         |    replace(seq, ' ' || t.pair || ' ', ' ' || replace(t.pair, ' ', '') || ' ')
         |      AS seq
         |  FROM $prev CROSS JOIN t$r t)""".stripMargin
    }.mkString(",\n")
    s"""WITH norm AS (
       |  SELECT trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
       |    ' +', ' ', 'g')) AS t
       |  FROM documents),
       |words AS (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
       |    SELECT unnest(string_split(t, ' ')) AS word FROM norm)
       |  WHERE length(word) >= 1 GROUP BY word),
       |s0 AS (
       |  SELECT word, freq,
       |    ' ' || array_to_string(regexp_extract_all(word, '.'), ' ') || ' ' AS seq
       |  FROM words),
       |$rounds""".stripMargin
  }

  private def bpeMergesSql: String =
    bpeChainSql + "\n" +
      """SELECT CAST(round AS BIGINT) AS round, pair,
        |  replace(pair, ' ', '') AS merged, n_pair
        |FROM (
        |  SELECT 1 AS round, pair, n_pair FROM t1
        |  UNION ALL SELECT 2, pair, n_pair FROM t2
        |  UNION ALL SELECT 3, pair, n_pair FROM t3)""".stripMargin

  val oracles: Map[String, String] = Map(
    "ngram_novelty" ->
      s"""WITH g AS (
        |  SELECT doc_id, ${md5LongSql("gr")} AS h
        |  FROM (SELECT doc_id, unnest(list_distinct(list_transform(
        |          generate_series(1, length(text) - 7), i -> substring(text, i, 8)))) AS gr
        |        FROM documents WHERE length(text) >= 8)),
        |f AS (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY h) AS fd FROM g)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
        |  CAST(SUM(CASE WHEN doc_id = fd THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |  CAST(CAST(SUM(CASE WHEN doc_id = fd THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
        |    / CAST(CAST(COUNT(*) AS BIGINT) AS DOUBLE) AS novelty
        |FROM f GROUP BY doc_id""".stripMargin,
    "bigram_likelihood" ->
      s"""WITH tk AS (
        |  SELECT doc_id, bg, COUNT(*) AS tf FROM (
        |    SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i + 1])) AS bg
        |    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |    WHERE len(toks) >= 2)
        |  GROUP BY doc_id, bg),
        |h AS (SELECT doc_id, ${md5LongSql("bg")} AS h, tf FROM tk),
        |df AS (SELECT h, COUNT(*) AS df FROM h GROUP BY h)
        |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(tf * df) AS BIGINT) AS sum_df,
        |  CAST(CAST(SUM(tf * df) AS BIGINT) AS DOUBLE)
        |    / CAST(CAST(SUM(tf) AS BIGINT) AS DOUBLE) AS score
        |FROM h JOIN df USING (h) GROUP BY doc_id""".stripMargin,
    "bpe_merges" -> bpeMergesSql,
    "bpe_fertility" -> (bpeChainSql + """,
        |dw AS (
        |  SELECT doc_id, word FROM (
        |    SELECT doc_id,
        |      unnest(string_split(trim(regexp_replace(regexp_replace(
        |        lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '))
        |        AS word
        |    FROM documents)
        |  WHERE length(word) >= 1),
        |enc AS (
        |  SELECT word,
        |    CAST(len(string_split(trim(seq), ' ')) AS BIGINT) AS n_tok
        |  FROM s3),
        |perdoc AS (
        |  SELECT doc_id, COUNT(*) AS n_words,
        |    CAST(SUM(length(word)) AS BIGINT) AS n_chars,
        |    CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        |  FROM dw JOIN enc USING (word) GROUP BY doc_id)
        |SELECT d.source,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(p.n_words) AS BIGINT) AS n_words,
        |  CAST(SUM(p.n_chars) AS BIGINT) AS n_chars,
        |  CAST(SUM(p.n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(CAST(SUM(p.n_tokens) AS BIGINT) AS DOUBLE) /
        |    CAST(CAST(SUM(p.n_words) AS BIGINT) AS DOUBLE) AS fertility,
        |  CAST(CAST(SUM(p.n_chars) AS BIGINT) AS DOUBLE) /
        |    CAST(CAST(SUM(p.n_tokens) AS BIGINT) AS DOUBLE) AS compression
        |FROM perdoc p JOIN documents d USING (doc_id)
        |GROUP BY d.source""".stripMargin),
    "bpe_encode" -> (bpeChainSql + """,
        |dw AS (
        |  SELECT doc_id, word FROM (
        |    SELECT doc_id,
        |      unnest(string_split(trim(regexp_replace(regexp_replace(
        |        lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '))
        |        AS word
        |    FROM documents)
        |  WHERE length(word) >= 1),
        |enc AS (
        |  SELECT word,
        |    CAST(len(string_split(trim(seq), ' ')) AS BIGINT) AS n_tok
        |  FROM s3)
        |SELECT doc_id, COUNT(*) AS n_words,
        |  CAST(SUM(length(word)) AS BIGINT) AS n_chars,
        |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
        |  CAST(SUM(length(word)) AS BIGINT) - CAST(SUM(n_tok) AS BIGINT)
        |    AS saved
        |FROM dw JOIN enc USING (word) GROUP BY doc_id""".stripMargin),
    "bpe_pair_counts" ->
      """SELECT pair, n, rnk FROM (
        |  SELECT pair, n,
        |    ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS rnk
        |  FROM (
        |    SELECT pair, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |      SELECT unnest(list_transform(generate_series(1, length(text) - 1),
        |        i -> substring(text, i, 2))) AS pair
        |      FROM documents WHERE length(text) >= 2)
        |    WHERE NOT contains(pair, ' ')
        |    GROUP BY pair))
        |WHERE rnk <= 20""".stripMargin,
    "gram_likelihood" ->
      """WITH tk AS (
        |  SELECT doc_id, tok, COUNT(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY doc_id, tok),
        |df AS (SELECT tok, COUNT(*) AS df FROM tk GROUP BY tok)
        |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
        |  CAST(SUM(tf * df) AS BIGINT) AS sum_df,
        |  CAST(CAST(SUM(tf * df) AS BIGINT) AS DOUBLE) /
        |    CAST(CAST(SUM(tf) AS BIGINT) AS DOUBLE) AS score
        |FROM tk JOIN df USING (tok) GROUP BY doc_id""".stripMargin,
    "quality_length_matrix" ->
      """WITH tk AS (
        |  SELECT doc_id, tok, COUNT(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY doc_id, tok),
        |df AS (SELECT tok, COUNT(*) AS df FROM tk GROUP BY tok),
        |qs AS (
        |  SELECT doc_id,
        |    CAST((1000000 * CAST(SUM(tf * df) AS HUGEINT))
        |      // CAST(SUM(tf) AS BIGINT) AS BIGINT) AS qs_q
        |  FROM tk JOIN df USING (tok) GROUP BY doc_id),
        |sc AS (
        |  SELECT qs_q, n_chars FROM qs JOIN documents USING (doc_id)),
        |ext AS (
        |  SELECT MIN(qs_q) AS q_mn, MAX(qs_q) AS q_mx,
        |    MIN(n_chars) AS l_mn, MAX(n_chars) AS l_mx FROM sc),
        |cells AS (
        |  SELECT ((qs_q - q_mn) * 10) // (q_mx - q_mn + 1) AS q_bucket,
        |    ((n_chars - l_mn) * 10) // (l_mx - l_mn + 1) AS len_bucket,
        |    COUNT(*) AS n_docs
        |  FROM sc CROSS JOIN ext
        |  GROUP BY q_bucket, len_bucket),
        |rt AS (SELECT len_bucket, CAST(SUM(n_docs) AS BIGINT) AS row_total
        |  FROM cells GROUP BY len_bucket)
        |SELECT q_bucket, cells.len_bucket, n_docs,
        |  (10000 * n_docs) // row_total AS row_share_bp
        |FROM cells JOIN rt USING (len_bucket)""".stripMargin,
    "likelihood_quartiles" ->
      """WITH tk AS (
        |  SELECT doc_id, tok, COUNT(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY doc_id, tok),
        |df AS (SELECT tok, COUNT(*) AS df FROM tk GROUP BY tok),
        |qs AS (
        |  SELECT doc_id,
        |    CAST((1000000 * CAST(SUM(tf * df) AS HUGEINT))
        |      // CAST(SUM(tf) AS BIGINT) AS BIGINT) AS qs_q
        |  FROM tk JOIN df USING (tok) GROUP BY doc_id),
        |c AS (
        |  SELECT source, qs_q, COUNT(*) AS k
        |  FROM qs JOIN documents USING (doc_id) GROUP BY source, qs_q),
        |cc AS (
        |  SELECT *, CAST(SUM(k) OVER (PARTITION BY source
        |    ORDER BY qs_q) AS BIGINT) AS cum,
        |    CAST(SUM(k) OVER (PARTITION BY source) AS BIGINT) AS n
        |  FROM c)
        |SELECT source, MAX(n) AS n_docs,
        |  MAX(CASE WHEN cum >= CAST(ceil(n * 0.25) AS BIGINT)
        |    AND cum - k < CAST(ceil(n * 0.25) AS BIGINT)
        |    THEN qs_q END) AS q1_qs,
        |  MAX(CASE WHEN cum >= CAST(ceil(n * 0.5) AS BIGINT)
        |    AND cum - k < CAST(ceil(n * 0.5) AS BIGINT)
        |    THEN qs_q END) AS median_qs,
        |  MAX(CASE WHEN cum >= CAST(ceil(n * 0.75) AS BIGINT)
        |    AND cum - k < CAST(ceil(n * 0.75) AS BIGINT)
        |    THEN qs_q END) AS q3_qs
        |FROM cc GROUP BY source""".stripMargin,
    "substring_dup_pairs" ->
      s"""WITH g AS (
        |  SELECT doc_id, g, ${md5LongSql("g")} AS h
        |  FROM (SELECT doc_id, unnest(list_distinct(list_transform(
        |          generate_series(1, length(text) - 7), i -> substring(text, i, 8)))) AS g
        |        FROM documents WHERE length(text) >= 8)),
        |fp AS (
        |  SELECT doc_id, h FROM (
        |    SELECT doc_id, h,
        |      ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h, g) AS rank
        |    FROM g)
        |  WHERE rank <= 8),
        |small AS (
        |  SELECT h FROM fp GROUP BY h HAVING COUNT(*) BETWEEN 2 AND 32)
        |SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_shared
        |FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
        |JOIN small s ON a.h = s.h
        |GROUP BY a.doc_id, b.doc_id
        |HAVING COUNT(*) >= 3""".stripMargin,
    "quality_gopher" ->
      """WITH words AS (
        |  SELECT doc_id, w, COUNT(*) AS n
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  GROUP BY doc_id, w),
        |rolled AS (
        |  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_words,
        |    COUNT(*) AS n_distinct, MAX(n) AS top_n,
        |    CAST(SUM(n * length(w)) AS BIGINT) AS sum_len
        |  FROM words GROUP BY doc_id),
        |sel AS (
        |  SELECT doc_id, n_words, n_distinct, top_n,
        |    sum_len / n_words AS mean_word_len,
        |    n_distinct / n_words AS ttr,
        |    top_n / n_words AS top_frac
        |  FROM rolled)
        |SELECT *, CAST(CASE WHEN n_words >= 10 AND n_words <= 1000
        |    AND mean_word_len >= 2.0 AND mean_word_len <= 10.0
        |    AND top_frac <= 0.2 THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM sel""".stripMargin,
    "repetition_ngrams" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    list_transform(range(0, len(string_split(text, ' ')) - 2),
        |      i -> array_to_string(string_split(text, ' ')[i + 1:i + 3], ' '))
        |      AS grams
        |  FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |sized AS (
        |  SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
        |    CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct
        |  FROM g)
        |SELECT doc_id, n_grams, n_distinct,
        |  (n_grams - n_distinct) / n_grams AS dup_frac,
        |  CAST(CASE WHEN (n_grams - n_distinct) / n_grams > 0.1
        |    THEN 1 ELSE 0 END AS BIGINT) AS repetitive
        |FROM sized""".stripMargin,
    "vocab_overlap" ->
      """WITH tc AS (
        |  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY source, tok),
        |top AS (
        |  SELECT source, tok FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY n DESC, tok) AS rnk FROM tc)
        |  WHERE rnk <= 200),
        |sz AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS sz
        |  FROM top GROUP BY source),
        |shared AS (
        |  SELECT a.source AS s1, b.source AS s2,
        |    CAST(COUNT(*) AS BIGINT) AS n_shared
        |  FROM top a JOIN top b
        |    ON a.tok = b.tok AND a.source < b.source
        |  GROUP BY a.source, b.source),
        |pairs AS (
        |  SELECT z1.source AS s1, z1.sz AS sz1, z2.source AS s2, z2.sz AS sz2
        |  FROM sz z1 CROSS JOIN sz z2 WHERE z1.source < z2.source)
        |SELECT s1, s2, COALESCE(n_shared, 0) AS n_shared, sz1, sz2,
        |  COALESCE(n_shared, 0)
        |    / CAST(sz1 + sz2 - COALESCE(n_shared, 0) AS DOUBLE) AS jaccard
        |FROM pairs LEFT JOIN shared USING (s1, s2)""".stripMargin,
    "zipf_profile" ->
      """WITH tf AS (
        |  SELECT source, tok, COUNT(*) AS freq
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY source, tok),
        |ranked AS (
        |  SELECT source, freq,
        |    length(format('{:b}', ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY freq DESC, tok))) - 1 AS rank_bucket
        |  FROM tf)
        |SELECT source, CAST(rank_bucket AS BIGINT) AS rank_bucket,
        |  COUNT(*) AS n_toks, CAST(SUM(freq) AS BIGINT) AS sum_freq,
        |  CAST(MAX(freq) AS BIGINT) AS max_freq
        |FROM ranked GROUP BY source, rank_bucket""".stripMargin,
    "source_unique_grams" ->
      s"""WITH g0 AS (
        |  SELECT source, ${md5LongSql("gr")} AS h
        |  FROM (SELECT source, unnest(list_distinct(list_transform(
        |          generate_series(1, length(text) - 7), i -> substring(text, i, 8)))) AS gr
        |        FROM documents WHERE length(text) >= 8)),
        |g AS (SELECT DISTINCT source, h FROM g0),
        |per AS (SELECT h, COUNT(*) AS ns, MAX(source) AS src FROM g GROUP BY h),
        |u AS (SELECT CAST(COUNT(*) AS BIGINT) AS univ FROM per),
        |cov AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_grams
        |        FROM g GROUP BY source),
        |uq AS (SELECT src AS source, CAST(COUNT(*) AS BIGINT) AS n_unique
        |       FROM per WHERE ns = 1 GROUP BY src)
        |SELECT cov.source, cov.n_grams,
        |  COALESCE(uq.n_unique, 0) AS n_unique,
        |  CAST((1000000 * CAST(COALESCE(uq.n_unique, 0) AS HUGEINT))
        |    // u.univ AS BIGINT) AS unique_ppm,
        |  CAST((1000000 * CAST(cov.n_grams AS HUGEINT)) // u.univ
        |    AS BIGINT) AS coverage_ppm
        |FROM cov LEFT JOIN uq USING (source) CROSS JOIN u""".stripMargin,
    "repetition_profile" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |  WHERE len(string_split(text, ' ')) >= 4),
        |g AS (
        |  SELECT doc_id,
        |    list_transform(range(1, len(toks) ),
        |      i -> array_to_string(toks[i:i + 1], ' ')) AS g2,
        |    list_transform(range(1, len(toks) - 1),
        |      i -> array_to_string(toks[i:i + 2], ' ')) AS g3,
        |    list_transform(range(1, len(toks) - 2),
        |      i -> array_to_string(toks[i:i + 3], ' ')) AS g4
        |  FROM tk),
        |s AS (
        |  SELECT doc_id,
        |    CAST(len(g2) AS BIGINT) AS n_grams_2,
        |    CAST(len(list_distinct(g2)) AS BIGINT) AS d2,
        |    CAST(list_max(list_transform(list_distinct(g2),
        |      x -> len(list_filter(g2, y -> y = x)))) AS BIGINT) AS t2,
        |    CAST(len(g3) AS BIGINT) AS n_grams_3,
        |    CAST(len(list_distinct(g3)) AS BIGINT) AS d3,
        |    CAST(list_max(list_transform(list_distinct(g3),
        |      x -> len(list_filter(g3, y -> y = x)))) AS BIGINT) AS t3,
        |    CAST(len(g4) AS BIGINT) AS n_grams_4,
        |    CAST(len(list_distinct(g4)) AS BIGINT) AS d4,
        |    CAST(list_max(list_transform(list_distinct(g4),
        |      x -> len(list_filter(g4, y -> y = x)))) AS BIGINT) AS t4
        |  FROM g)
        |SELECT doc_id,
        |  n_grams_2, (n_grams_2 - d2) / n_grams_2 AS dup_frac_2,
        |  t2 / n_grams_2 AS top_frac_2,
        |  n_grams_3, (n_grams_3 - d3) / n_grams_3 AS dup_frac_3,
        |  t3 / n_grams_3 AS top_frac_3,
        |  n_grams_4, (n_grams_4 - d4) / n_grams_4 AS dup_frac_4,
        |  t4 / n_grams_4 AS top_frac_4
        |FROM s""".stripMargin,
    "collocations" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |uni AS (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS n_w
        |  FROM (SELECT unnest(toks) AS w FROM tk) GROUP BY w),
        |tot AS (SELECT CAST(SUM(n_w) AS BIGINT) AS n_total FROM uni),
        |bg AS (
        |  SELECT bg, CAST(COUNT(*) AS BIGINT) AS n_ab FROM (
        |    SELECT unnest(list_transform(range(1, len(toks)),
        |      i -> toks[i] || ' ' || toks[i + 1])) AS bg
        |    FROM tk WHERE len(toks) >= 2)
        |  GROUP BY bg HAVING COUNT(*) >= 5),
        |j AS (
        |  SELECT n_ab, string_split(bg, ' ')[1] AS w1,
        |    string_split(bg, ' ')[2] AS w2 FROM bg)
        |SELECT w1, w2, n_ab, u1.n_w AS n_a, u2.n_w AS n_b,
        |  CAST((CAST(n_ab AS HUGEINT) * 1000000 * tot.n_total)
        |    // (CAST(u1.n_w AS HUGEINT) * u2.n_w) AS BIGINT) AS lift_ppm
        |FROM j
        |JOIN uni u1 ON u1.w = j.w1
        |JOIN uni u2 ON u2.w = j.w2
        |CROSS JOIN tot
        |ORDER BY lift_ppm DESC, w1, w2 LIMIT 100""".stripMargin,
    "vocab_coverage_curve" ->
      """WITH c AS (
        |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cn FROM (
        |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY tok),
        |r AS (
        |  SELECT cn, ROW_NUMBER() OVER (ORDER BY cn DESC, tok) AS r
        |  FROM c),
        |tot AS (SELECT CAST(SUM(cn) AS BIGINT) AS n_total FROM c),
        |ks AS (SELECT CAST(unnest([4, 8, 16]) AS BIGINT) AS k)
        |SELECT k,
        |  CAST(SUM(CASE WHEN r.r <= ks.k THEN cn ELSE 0 END) AS BIGINT)
        |    AS covered,
        |  n_total,
        |  (10000 * CAST(SUM(CASE WHEN r.r <= ks.k THEN cn ELSE 0 END)
        |    AS BIGINT)) // n_total AS coverage_bp
        |FROM r CROSS JOIN ks CROSS JOIN tot
        |GROUP BY k, n_total""".stripMargin,
    "vocab_coverage" ->
      """WITH tc AS (
        |  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY source, tok),
        |cv AS (
        |  SELECT tok, 1 AS in_vocab FROM (
        |    SELECT tok, CAST(SUM(n) AS BIGINT) AS cn FROM tc GROUP BY tok
        |    ORDER BY cn DESC, tok LIMIT 500)),
        |j AS (SELECT tc.*, cv.in_vocab FROM tc LEFT JOIN cv USING (tok)),
        |per AS (
        |  SELECT source, CAST(SUM(n) AS BIGINT) AS n_tokens,
        |    CAST(SUM(CASE WHEN in_vocab IS NULL THEN n ELSE 0 END) AS BIGINT)
        |      AS oov_tokens,
        |    COUNT(*) AS n_types,
        |    CAST(SUM(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS oov_types
        |  FROM j GROUP BY source)
        |SELECT *, oov_tokens / n_tokens AS oov_rate FROM per""".stripMargin,
    "corpus_card" ->
      """WITH base AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |  FROM documents GROUP BY source),
        |lc AS (
        |  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS ln
        |  FROM documents GROUP BY source, lang),
        |lm AS (
        |  SELECT source, lang AS top_lang, ln AS top_lang_n FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY ln DESC, lang DESC) AS rn FROM lc)
        |  WHERE rn = 1),
        |hh AS (SELECT source, md5(text) AS h FROM documents),
        |dh AS (SELECT h FROM hh GROUP BY h HAVING COUNT(*) > 1),
        |dd AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS dup_docs
        |  FROM hh JOIN dh USING (h) GROUP BY source),
        |words AS (
        |  SELECT doc_id, w, COUNT(*) AS n
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  GROUP BY doc_id, w),
        |rolled AS (
        |  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_words,
        |    COUNT(*) AS n_distinct, MAX(n) AS top_n,
        |    CAST(SUM(n * length(w)) AS BIGINT) AS sum_len
        |  FROM words GROUP BY doc_id),
        |kflag AS (
        |  SELECT doc_id, CAST(CASE WHEN n_words >= 10 AND n_words <= 1000
        |    AND sum_len / n_words >= 2.0 AND sum_len / n_words <= 10.0
        |    AND top_n / n_words <= 0.2 THEN 1 ELSE 0 END AS BIGINT) AS keep
        |  FROM rolled),
        |kp AS (
        |  SELECT d.source, CAST(SUM(k.keep) AS BIGINT) AS keep_docs
        |  FROM kflag k JOIN documents d USING (doc_id) GROUP BY d.source)
        |SELECT base.source, base.n_docs, base.total_chars,
        |  lm.top_lang, lm.top_lang_n,
        |  COALESCE(dd.dup_docs, 0) AS dup_docs, kp.keep_docs,
        |  (10000 * lm.top_lang_n) // base.n_docs AS top_lang_bp,
        |  (10000 * COALESCE(dd.dup_docs, 0)) // base.n_docs AS dup_bp,
        |  (10000 * kp.keep_docs) // base.n_docs AS keep_bp
        |FROM base
        |JOIN lm USING (source)
        |LEFT JOIN dd USING (source)
        |JOIN kp USING (source)""".stripMargin,
    "vocab_stats" ->
      """SELECT source, COUNT(*) AS n_tokens,
        |  CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_vocab,
        |  CAST(COUNT(DISTINCT tok) AS BIGINT) / COUNT(*) AS ttr
        |FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
        |      FROM documents)
        |GROUP BY source""".stripMargin,
    "normalize_text" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS raw_len,
        |  CAST(length(norm) AS BIGINT) AS norm_len, md5(norm) AS norm_hash
        |FROM (
        |  SELECT doc_id, text, trim(regexp_replace(
        |    regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |    ' +', ' ', 'g')) AS norm
        |  FROM documents)""".stripMargin,
    "tfidf" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
        |df AS (SELECT term, COUNT(*) AS df
        |       FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n FROM documents),
        |wtd AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    tf.tf * (CAST(n.n AS DOUBLE) / df.df) AS weight
        |  FROM tf JOIN df USING (term) CROSS JOIN n)
        |SELECT doc_id, term, tf, df, weight, CAST(rnk AS BIGINT) AS rnk FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |    ORDER BY weight DESC, term) AS rnk FROM wtd)
        |WHERE rnk <= 10""".stripMargin,
    "ngram_counts" ->
      """SELECT g, COUNT(*) AS n FROM (
        |  SELECT unnest(list_transform(generate_series(1, length(text) - 2),
        |    i -> substring(text, i, 3))) AS g
        |  FROM documents WHERE length(text) >= 3)
        |GROUP BY g ORDER BY n DESC, g LIMIT 20""".stripMargin,
    "lexical_diversity" ->
      """WITH tf AS (
        |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2),
        |s AS (
        |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
        |    CAST(COUNT(*) AS BIGINT) AS n_types,
        |    CAST(SUM(tf * tf) AS BIGINT) AS sum_sq
        |  FROM tf GROUP BY doc_id)
        |SELECT doc_id, n_tokens, n_types, sum_sq,
        |  CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr,
        |  CAST(n_tokens * n_tokens - sum_sq AS DOUBLE)
        |    / CAST(n_tokens * n_tokens AS DOUBLE) AS simpson
        |FROM s""".stripMargin,
    "sentence_stats" ->
      """WITH s AS (
        |  SELECT source,
        |    list_filter(string_split_regex(coalesce(text, ''), '[.!?]+'),
        |      x -> len(trim(x)) > 0) AS sents
        |  FROM documents),
        |d AS (
        |  SELECT source,
        |    CAST(len(sents) AS BIGINT) AS n_s,
        |    CAST(coalesce(list_sum(list_transform(sents,
        |      x -> len(trim(x)))), 0) AS BIGINT) AS c_s
        |  FROM s),
        |r AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(n_s) AS BIGINT) AS n_sent,
        |    CAST(SUM(c_s) AS BIGINT) AS sent_chars
        |  FROM d GROUP BY source)
        |SELECT source, n_docs, n_sent,
        |  (10000 * n_sent) // n_docs AS sent_per_doc_bp,
        |  CASE WHEN n_sent > 0 THEN sent_chars // n_sent
        |    ELSE CAST(0 AS BIGINT) END AS chars_per_sent
        |FROM r""".stripMargin,
    "doc_length_outliers" ->
      """WITH c AS (
        |  SELECT source, n_chars, COUNT(*) AS cnt
        |  FROM documents GROUP BY source, n_chars),
        |cum AS (
        |  SELECT source, n_chars, cnt,
        |    SUM(cnt) OVER (PARTITION BY source ORDER BY n_chars) AS cum,
        |    SUM(cnt) OVER (PARTITION BY source) AS n
        |  FROM c),
        |med AS (
        |  SELECT source, MIN(n_chars) AS med_chars,
        |    CAST(MAX(n) AS BIGINT) AS n_docs
        |  FROM cum WHERE cum >= CAST(ceil(n * 0.5) AS BIGINT)
        |  GROUP BY source),
        |dc AS (
        |  SELECT c.source, abs(c.n_chars - m.med_chars) AS dev,
        |    CAST(SUM(cnt) AS BIGINT) AS cnt
        |  FROM c JOIN med m USING (source) GROUP BY c.source, dev),
        |dcum AS (
        |  SELECT source, dev, cnt,
        |    SUM(cnt) OVER (PARTITION BY source ORDER BY dev) AS cum,
        |    SUM(cnt) OVER (PARTITION BY source) AS n
        |  FROM dc),
        |mad AS (
        |  SELECT source, MIN(dev) AS mad_chars
        |  FROM dcum WHERE cum >= CAST(ceil(n * 0.5) AS BIGINT)
        |  GROUP BY source),
        |o AS (
        |  SELECT dc.source,
        |    CAST(SUM(CASE WHEN dev > mad_chars * 5 THEN cnt ELSE 0 END)
        |      AS BIGINT) AS n_outliers,
        |    MAX(mad_chars) AS mad_chars
        |  FROM dc JOIN mad USING (source) GROUP BY dc.source)
        |SELECT o.source, n_docs, med_chars, o.mad_chars, n_outliers,
        |  (10000 * n_outliers) // n_docs AS outlier_bp
        |FROM o JOIN med USING (source)""".stripMargin,
    "length_gini" ->
      """WITH c AS (
        |  SELECT source, n_chars, COUNT(*) AS k
        |  FROM documents GROUP BY source, n_chars),
        |cc AS (
        |  SELECT source, n_chars, k,
        |    CAST(COALESCE(SUM(k) OVER (PARTITION BY source
        |      ORDER BY n_chars
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS c0
        |  FROM c),
        |r AS (
        |  SELECT source, CAST(SUM(k) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_chars * k) AS BIGINT) AS total_chars,
        |    CAST(SUM(n_chars * (k * c0 + (k * (k + 1)) // 2)) AS BIGINT)
        |      AS s1
        |  FROM cc GROUP BY source)
        |SELECT source, n_docs, total_chars,
        |  CASE WHEN total_chars > 0
        |    THEN (10000 * (2 * s1 - (n_docs + 1) * total_chars))
        |      // (n_docs * total_chars)
        |    ELSE 0 END AS gini_bp
        |FROM r""".stripMargin,
    "lang_mix" ->
      s"""WITH h AS (
         |  SELECT source,
         |    CAST(${hitSql(markers("en"))} AS BIGINT) AS h_en,
         |    CAST(${hitSql(markers("es"))} AS BIGINT) AS h_es,
         |    CAST(${hitSql(markers("fr"))} AS BIGINT) AS h_fr
         |  FROM documents),
         |m AS (
         |  SELECT source, greatest(h_en, h_es, h_fr) AS best,
         |    h_en + h_es + h_fr - greatest(h_en, h_es, h_fr)
         |      - least(h_en, h_es, h_fr) AS second
         |  FROM h)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN second > 0 AND second * 3 >= best
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_mixed,
         |  CAST(SUM(CASE WHEN best = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_nohit,
         |  (10000 * CAST(SUM(CASE WHEN second > 0 AND second * 3 >= best
         |    THEN 1 ELSE 0 END) AS BIGINT)) // COUNT(*) AS mixed_bp
         |FROM m GROUP BY source""".stripMargin,
    "doc_length_stats" ->
      """WITH ranked AS (
        |  SELECT source, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY source) AS n
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_docs, MIN(n_chars) AS min_c,
        |  MAX(CASE WHEN rn = CAST(ceil(n * 0.25) AS BIGINT) THEN n_chars END) AS q1,
        |  MAX(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN n_chars END) AS median,
        |  MAX(CASE WHEN rn = CAST(ceil(n * 0.75) AS BIGINT) THEN n_chars END) AS q3,
        |  MAX(n_chars) AS max_c
        |FROM ranked GROUP BY source""".stripMargin,
    "quality_c4" ->
      """WITH d AS (
        |  SELECT doc_id, source, text,
        |    string_split(text, chr(10)) AS lines,
        |    list_filter(string_split(text, chr(10)), l ->
        |      right(l, 1) IN ('.', '!', '?', '"') AND
        |      len(list_filter(string_split(l, ' '), x -> x != '')) >= 5)
        |      AS kept
        |  FROM documents),
        |e AS (
        |  SELECT doc_id, source,
        |    CAST(len(lines) AS BIGINT) AS n_lines,
        |    CAST(len(kept) AS BIGINT) AS n_kept_lines,
        |    CAST(length(text) AS BIGINT) AS total_chars,
        |    CAST(list_sum(list_prepend(0, list_transform(kept,
        |      l -> length(l)))) AS BIGINT) AS kept_chars,
        |    CAST(len(regexp_extract_all(text, '[.!?]')) AS BIGINT)
        |      AS n_sentences,
        |    CAST(CASE WHEN contains(lower(text), 'lorem ipsum') THEN 1
        |      ELSE 0 END AS BIGINT) AS has_lorem,
        |    CAST(CASE WHEN contains(text, '{') THEN 1 ELSE 0 END
        |      AS BIGINT) AS has_brace
        |  FROM d)
        |SELECT *,
        |  CAST(CASE WHEN n_kept_lines > 0 AND n_sentences >= 3
        |      AND has_lorem = 0 AND has_brace = 0
        |    THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM e""".stripMargin,
    "corpus_filter" ->
      (s"WITH $corpusFilterChainSql" +
        """
          |SELECT doc_id,
          |  CAST(CASE WHEN reason = 'keep' THEN 1 ELSE 0 END AS BIGINT) AS keep,
          |  reason
          |FROM r""".stripMargin),
    "langid_margin" ->
      s"""WITH h AS (
         |  SELECT doc_id, lang,
         |    CAST(${hitSql(markers("en"))} AS BIGINT) AS h_en,
         |    CAST(${hitSql(markers("es"))} AS BIGINT) AS h_es,
         |    CAST(${hitSql(markers("fr"))} AS BIGINT) AS h_fr
         |  FROM documents),
         |m AS (
         |  SELECT lang,
         |    2 * greatest(h_en, h_es, h_fr) + least(h_en, h_es, h_fr)
         |      - (h_en + h_es + h_fr) AS margin
         |  FROM h),
         |c AS (SELECT lang, margin, COUNT(*) AS k FROM m GROUP BY 1, 2),
         |cc AS (
         |  SELECT *, CAST(SUM(k) OVER (PARTITION BY lang
         |    ORDER BY margin) AS BIGINT) AS cum,
         |    CAST(SUM(k) OVER (PARTITION BY lang) AS BIGINT) AS n
         |  FROM c)
         |SELECT lang, MAX(n) AS n_docs,
         |  MAX(CASE WHEN cum >= CAST(ceil(n * 0.25) AS BIGINT)
         |    AND cum - k < CAST(ceil(n * 0.25) AS BIGINT)
         |    THEN margin END) AS q1_margin,
         |  MAX(CASE WHEN cum >= CAST(ceil(n * 0.5) AS BIGINT)
         |    AND cum - k < CAST(ceil(n * 0.5) AS BIGINT)
         |    THEN margin END) AS median_margin,
         |  MAX(CASE WHEN cum >= CAST(ceil(n * 0.75) AS BIGINT)
         |    AND cum - k < CAST(ceil(n * 0.75) AS BIGINT)
         |    THEN margin END) AS q3_margin
         |FROM cc GROUP BY lang""".stripMargin,
    "prefix_dup_profile" ->
      """WITH d AS (
        |  SELECT doc_id, source, substring(text, 1, 32) AS pfx
        |  FROM documents WHERE length(text) >= 32),
        |b AS (SELECT pfx, COUNT(*) AS k FROM d GROUP BY pfx)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN k >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_shared_prefix,
        |  CAST(COUNT(DISTINCT CASE WHEN k >= 2 THEN pfx END) AS BIGINT)
        |    AS n_dup_prefixes,
        |  MAX(k) AS max_bucket,
        |  (10000 * CAST(SUM(CASE WHEN k >= 2 THEN 1 ELSE 0 END) AS BIGINT))
        |    // COUNT(*) AS shared_bp
        |FROM d JOIN b USING (pfx) GROUP BY source""".stripMargin,
    "langid_eval" ->
      s"""WITH h AS (
         |  SELECT doc_id, lang,
         |    CAST(${hitSql(markers("en"))} AS BIGINT) AS h_en,
         |    CAST(${hitSql(markers("es"))} AS BIGINT) AS h_es,
         |    CAST(${hitSql(markers("fr"))} AS BIGINT) AS h_fr
         |  FROM documents),
         |p AS (
         |  SELECT lang,
         |    CASE WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
         |         WHEN h_es >= h_fr THEN 'es' ELSE 'fr' END AS pred_lang
         |  FROM h),
         |cells AS (
         |  SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM p GROUP BY lang, pred_lang),
         |tot AS (
         |  SELECT lang, CAST(SUM(n) AS BIGINT) AS n_lang
         |  FROM cells GROUP BY lang)
         |SELECT cells.lang, pred_lang, n,
         |  (10000 * n) // n_lang AS bp,
         |  CAST(CASE WHEN cells.lang = pred_lang THEN 1 ELSE 0 END AS BIGINT)
         |    AS hit
         |FROM cells JOIN tot USING (lang)""".stripMargin,
    "langid" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    CAST(${hitSql(markers("en"))} AS BIGINT) AS h_en,
         |    CAST(${hitSql(markers("es"))} AS BIGINT) AS h_es,
         |    CAST(${hitSql(markers("fr"))} AS BIGINT) AS h_fr
         |  FROM documents)
         |SELECT doc_id,
         |  CASE WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
         |       WHEN h_es >= h_fr THEN 'es' ELSE 'fr' END AS pred_lang,
         |  h_en, h_es, h_fr
         |FROM h""".stripMargin,
    "source_lang_matrix" ->
      """WITH m AS (
        |  SELECT source, lang, COUNT(*) AS n_docs
        |  FROM documents GROUP BY source, lang),
        |rt AS (SELECT source, CAST(SUM(n_docs) AS BIGINT) AS rt
        |  FROM m GROUP BY source),
        |ct AS (SELECT lang, CAST(SUM(n_docs) AS BIGINT) AS ct
        |  FROM m GROUP BY lang),
        |tt AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS tt FROM m)
        |SELECT source, lang, n_docs,
        |  CAST((CAST(rt AS HUGEINT) * ct) // tt AS BIGINT) AS n_expected,
        |  CAST(CASE WHEN rt = 0 OR ct = 0 THEN 0
        |  WHEN CAST(n_docs AS HUGEINT) * tt >= CAST(rt AS HUGEINT) * ct
        |    THEN (1000000 * (CAST(n_docs AS HUGEINT) * tt
        |      - CAST(rt AS HUGEINT) * ct)) // (CAST(rt AS HUGEINT) * ct)
        |  ELSE -((1000000 * (CAST(rt AS HUGEINT) * ct
        |      - CAST(n_docs AS HUGEINT) * tt)) // (CAST(rt AS HUGEINT) * ct))
        |  END AS BIGINT) AS dev_ppm
        |FROM m JOIN rt USING (source) JOIN ct USING (lang)
        |CROSS JOIN tt""".stripMargin,
    "vocab_growth_curve" ->
      s"""WITH d AS (
         |  SELECT ${graft.functions.Parity.md5LongSql(
               "('vocabcurve#' || doc_id)")} % 8 AS coin,
         |    string_split(COALESCE(text, ''), ' ') AS toks
         |  FROM documents),
         |mass AS (
         |  SELECT b AS prefix_eighths, COUNT(*) AS n_docs,
         |    CAST(SUM(len(toks)) AS BIGINT) AS n_tokens
         |  FROM d, (SELECT unnest([1, 2, 4, 8]) AS b) t
         |  WHERE coin < b GROUP BY b),
         |fg AS (
         |  SELECT tok, MIN(coin) AS c0 FROM (
         |    SELECT coin, unnest(list_distinct(toks)) AS tok FROM d)
         |  GROUP BY tok),
         |ty AS (
         |  SELECT b AS prefix_eighths, CAST(COUNT(*) AS BIGINT) AS n_types
         |  FROM fg, (SELECT unnest([1, 2, 4, 8]) AS b) t
         |  WHERE c0 < b GROUP BY b)
         |SELECT CAST(mass.prefix_eighths AS BIGINT) AS prefix_eighths,
         |  n_docs, n_tokens, n_types,
         |  CASE WHEN n_tokens > 0
         |    THEN (1000000 * n_types) // n_tokens
         |    ELSE 0 END AS ttr_ppm
         |FROM mass JOIN ty USING (prefix_eighths)""".stripMargin,
    "token_len_profile" ->
      """SELECT source, CAST(length(tok) AS BIGINT) AS tok_len,
        |  COUNT(*) AS n_toks
        |FROM (SELECT source,
        |    unnest(string_split(COALESCE(text, ''), ' ')) AS tok
        |  FROM documents)
        |GROUP BY source, tok_len""".stripMargin,
    "char_class_profile" ->
      """WITH d AS (
        |  SELECT source,
        |    CAST(length(COALESCE(text, '')) AS BIGINT) AS n_c,
        |    CAST(length(COALESCE(text, '')) - length(
        |      regexp_replace(COALESCE(text, ''), '[a-zA-Z]', '', 'g'))
        |      AS BIGINT) AS n_alpha,
        |    CAST(length(COALESCE(text, '')) - length(
        |      regexp_replace(COALESCE(text, ''), '[0-9]', '', 'g'))
        |      AS BIGINT) AS n_digit,
        |    CAST(length(COALESCE(text, '')) - length(
        |      regexp_replace(COALESCE(text, ''), '[ \t\n\r]', '', 'g'))
        |      AS BIGINT) AS n_space
        |  FROM documents),
        |r AS (
        |  SELECT source, CAST(SUM(n_c) AS BIGINT) AS n_chars,
        |    CAST(SUM(n_alpha) AS BIGINT) AS t_alpha,
        |    CAST(SUM(n_digit) AS BIGINT) AS t_digit,
        |    CAST(SUM(n_space) AS BIGINT) AS t_space
        |  FROM d GROUP BY source)
        |SELECT source, n_chars,
        |  CASE WHEN n_chars > 0 THEN (10000 * t_alpha) // n_chars
        |    ELSE 0 END AS alpha_bp,
        |  CASE WHEN n_chars > 0 THEN (10000 * t_digit) // n_chars
        |    ELSE 0 END AS digit_bp,
        |  CASE WHEN n_chars > 0 THEN (10000 * t_space) // n_chars
        |    ELSE 0 END AS space_bp,
        |  CASE WHEN n_chars > 0
        |    THEN (10000 * (n_chars - t_alpha - t_digit - t_space))
        |      // n_chars
        |    ELSE 0 END AS other_bp
        |FROM r""".stripMargin,
    "quality_score" ->
      s"""WITH q AS (
         |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_c,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_t,
         |    CAST(${hitSql(markers("en"))} AS BIGINT) AS n_stop,
         |    CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS n_punct
         |  FROM documents)
         |SELECT doc_id, n_c, n_t,
         |  n_stop / n_t AS stop_ratio,
         |  n_punct / n_c AS punct_ratio,
         |  (n_c - (n_t - 1)) / n_t AS avg_tok_len
         |FROM q""".stripMargin,
    "token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe
        |FROM documents""".stripMargin,
    "fingerprint" ->
      s"""WITH g AS (
        |  SELECT doc_id, g, ${md5LongSql("g")} AS h
        |  FROM (SELECT doc_id, unnest(list_distinct(list_transform(
        |          generate_series(1, length(text) - 7), i -> substring(text, i, 8)))) AS g
        |        FROM documents WHERE length(text) >= 8))
        |SELECT doc_id, CAST(rank AS BIGINT) AS rank, h FROM (
        |  SELECT doc_id, g, h,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h, g) AS rank
        |  FROM g)
        |WHERE rank <= 8""".stripMargin)
}
