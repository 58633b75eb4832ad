package graft.llm

import graft.functions.Parity.md5LongSql
import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline runs between dedup
  * and tokenization: CCNet-style boilerplate removal and GPT-style
  * sequence packing.
  *
  * Scale notes:
  *  - Chunking is an in-row transform (one generator per doc, no join);
  *    the boilerplate table is tiny (repeated chunks only) and broadcast
  *    back against the chunk stream — at 100 TB this is one scan + one
  *    broadcast hash join, no big-side shuffle.
  *  - Packing's running offset is windowed per source, so each source
  *    packs independently and in parallel; a single global ordering would
  *    serialize the cumsum through one partition.
  */
object Curation {

  private val ChunkToks = 10
  private val MinDocs = 2
  private val SeqLen = 512

  /** One row per 10-token chunk: (doc_id, source, chunk_idx, chash,
    * chunk_toks). The md5 chunk hash is the cross-engine identity.
    */
  private def chunked(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("tk", split(col("text"), " "))
      .withColumn("nch", expr("CAST(ceil(size(tk) / 10.0) AS BIGINT)"))
      .select(col("doc_id"), col("source"),
        posexplode(expr(
          s"""transform(sequence(0L, nch - 1), i -> named_struct(
             |  'h', md5(array_join(slice(tk, CAST(i * $ChunkToks + 1 AS INT), $ChunkToks), ' ')),
             |  'tc', CAST(size(slice(tk, CAST(i * $ChunkToks + 1 AS INT), $ChunkToks)) AS BIGINT)))"""
            .stripMargin)).as(Seq("chunk_idx", "c")))
      .select(col("doc_id"), col("source"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("c.h").as("chash"), col("c.tc").as("chunk_toks"))

  /** Boilerplate chunk table: 10-token chunks repeated across >= 2
    * distinct documents of the same source (headers, footers, injected
    * templates). CCNet does this at paragraph level with a hash table;
    * here it is one groupBy over the chunk stream.
    */
  def boilerplateChunks(spark: SparkSession, dir: String): DataFrame =
    chunked(spark, dir)
      .groupBy("source", "chash")
      .agg(countDistinct("doc_id").as("n_docs"), count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= MinDocs)

  /** Boilerplate removal audit per document: chunks kept/dropped and the
    * residual token count after stripping repeated chunks.
    */
  def stripBoilerplate(spark: SparkSession, dir: String): DataFrame = {
    val ch = chunked(spark, dir)
    val bp = boilerplateChunks(spark, dir)
      .select(col("source").as("bs"), col("chash").as("bh"))
    ch.join(broadcast(bp), col("source") === col("bs") && col("chash") === col("bh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("bh").isNotNull, 1L).otherwise(0L)).cast("long").as("n_bp"),
        sum(when(col("bh").isNull, col("chunk_toks")).otherwise(0L)).cast("long")
          .as("kept_toks"))
  }

  /** GPT-style sequence packing: concatenate documents (in doc_id order,
    * per source, + 1 EOS token each) and cut every 512 tokens. Emits each
    * doc's start offset, owning sequence, and whether it straddles a
    * sequence boundary — the packer's manifest.
    */
  def seqPack(spark: SparkSession, dir: String): DataFrame = {
    // The running token offset is a per-source PREFIX SUM over doc_id
    // order; partitioning the window by source alone would funnel each
    // source's whole slice through one task. Decompose it (the
    // corpus_shuffle discipline, summing instead of counting):
    // order-preserving doc_id-range buckets (64k docs each), per-bucket
    // token totals rolled into per-source running offsets on the
    // 65536x-compressed bucket frame, then an in-bucket prefix sum.
    // (bucket, doc_id) order IS doc_id order, so offsets are identical.
    val d = t(spark, dir, "documents")
      .withColumn("n_tok", (size(split(col("text"), " ")) + 1).cast("long"))
      .withColumn("bkt", expr("doc_id div 65536"))
    val offs = d.groupBy("source", "bkt")
      .agg(sum("n_tok").cast("long").as("btoks"))
      .withColumn("off",
        coalesce(sum("btoks").over(Window.partitionBy("source").orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("source", "bkt", "off")
    val inBkt = Window.partitionBy("source", "bkt").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    d.join(offs, Seq("source", "bkt"))
      .withColumn("start_off",
        col("off") + coalesce(sum("n_tok").over(inBkt), lit(0L)))
      .select(col("doc_id"), col("source"), col("n_tok"), col("start_off"),
        expr(s"start_off div $SeqLen").as("seq_id"),
        when(expr(s"(start_off + n_tok - 1) div $SeqLen") =!= expr(s"start_off div $SeqLen"),
          1L).otherwise(0L).as("spans_boundary"))
  }

  /** Context-length sweep over the pack layout: sequences, tail waste,
    * and boundary-spanning docs at ctx ∈ {256, 512, 1024} — the knob a
    * pretraining team prices before fixing a context window (double the
    * window: half the tail waste but MORE docs need cross-document
    * masking... or fewer? this is the measurement). One evaluation of
    * the [[seqPack]] offsets serves all three lengths — start_off and
    * n_tok are ctx-independent, so the sweep is pure arithmetic on the
    * already-computed layout (the semdedup_sweep discipline).
    */
  def packLenSweep(spark: SparkSession, dir: String): DataFrame = {
    val sp = seqPack(spark, dir).select("source", "n_tok", "start_off")
    val ls = spark.range(0, 3, 1, 1)
      .select(expr("CAST(shiftleft(256, CAST(id AS INT)) AS BIGINT)")
        .as("ctx"))
    // per-source packing keeps its own tail per source (the seqPack
    // contract), so sequence counts roll up per (ctx, source) first
    sp.crossJoin(broadcast(ls))
      .groupBy("ctx", "source")
      .agg(count(lit(1)).as("nd"),
        sum("n_tok").cast("long").as("stoks"),
        sum(when(expr("(start_off + n_tok - 1) div ctx") =!=
          expr("start_off div ctx"), 1L).otherwise(0L)).cast("long")
          .as("nsp"))
      .withColumn("sseqs", expr("(stoks + ctx - 1) div ctx"))
      .groupBy("ctx")
      .agg(sum("nd").cast("long").as("n_docs"),
        sum("stoks").cast("long").as("total_toks"),
        sum("nsp").cast("long").as("n_spanning"),
        sum("sseqs").cast("long").as("n_seqs"))
      .withColumn("tail_waste", expr("n_seqs * ctx - total_toks"))
      .withColumn("span_bp", expr("(10000 * n_spanning) div n_docs"))
  }

  /** Packing-quality rollup over [[seqPack]]: per source the sequences
    * produced, the partial tail (the only waste contiguous concatenation
    * leaves), and — the number that matters for training — how many
    * documents SPAN a sequence boundary and therefore need cross-document
    * attention masking (or get truncated by boundary-respecting packers).
    * Pure aggregation over the pack layout; one shuffle on source.
    */
  def packEfficiency(spark: SparkSession, dir: String): DataFrame =
    seqPack(spark, dir)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").cast("long").as("total_toks"),
        sum("spans_boundary").cast("long").as("n_spanning"))
      .withColumn("n_seqs",
        expr(s"(total_toks + ${SeqLen - 1}) div $SeqLen"))
      .withColumn("tail_waste", col("n_seqs") * SeqLen - col("total_toks"))
      .withColumn("span_rate",
        col("n_spanning").cast("double") / col("n_docs").cast("double"))

  /** Packing in SHUFFLED global order — the layout a pre-training run
    * actually materializes: the deterministic corpus shuffle
    * (Sampling.corpusShuffle's hash order) defines one global document
    * stream, cut every [[SeqLen]] tokens. Per doc: its shuffle position,
    * token count, global start offset, owning sequence, and the
    * boundary-straddle flag.
    *
    * Scale: the global token prefix reuses corpus_shuffle's chunked
    * parallel-prefix shape — the 256 hash-prefix buckets ARE prefix-order
    * chunks, so per-bucket (row, token) totals roll into broadcast
    * running offsets and every within-bucket window stays parallel; no
    * single-task global window.
    */
  def packShuffled(spark: SparkSession, dir: String): DataFrame =
    shuffledPack(t(spark, dir, "documents"))
      .select("doc_id", "shuffle_pos", "n_tok", "start_off", "seq_id",
        "spans_boundary")

  /** Loader shards: [[shardManifest]] interleaves sequences round-robin
    * across this many reader workers (seq_id mod NumShards), the standard
    * layout that gives every worker a statistically even slice without a
    * second shuffle of the data.
    */
  private[graft] val NumShards = 8L

  /** The data-loader manifest over [[packShuffled]]'s layout — the
    * artifact a distributed reader fleet actually consumes: per
    * round-robin shard (seq_id mod [[NumShards]]) the sequences it owns,
    * the documents whose owning sequence lands there, their token volume,
    * the boundary-straddle count (docs whose tail the NEXT sequence
    * carries — the cross-shard read a loader must plan for), and the
    * shard's sequence-id range.
    *
    * Scale: rides the pack manifest (the 256-bucket parallel prefix);
    * the rollup partial-aggregates on (shard, seq_id) then on shard —
    * both map-side-combined, output bounded by NumShards rows.
    */
  def shardManifest(spark: SparkSession, dir: String): DataFrame =
    packShuffled(spark, dir)
      .withColumn("shard", pmod(col("seq_id"), lit(NumShards)))
      .groupBy("shard", "seq_id")
      .agg(
        count(lit(1)).as("d"),
        sum("n_tok").cast("long").as("tk"),
        sum("spans_boundary").cast("long").as("sp"))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_seqs"),
        sum("d").cast("long").as("n_docs"),
        sum("tk").cast("long").as("n_toks"),
        sum("sp").cast("long").as("n_straddle"),
        min("seq_id").as("min_seq"),
        max("seq_id").as("max_seq"))

  /** Shuffle-quality histogram: distinct sources per packed sequence —
    * the check that the deterministic corpus shuffle actually interleaves
    * sources (a bad shuffle leaves sequences dominated by one source,
    * which serializes gradient noise at train time). Healthy shape:
    * mass concentrated at n_sources ≈ docs-per-sequence; a spike at 1
    * means the order degenerated. Two map-side-combined rollups over the
    * pack manifest.
    */
  def seqSourceMix(spark: SparkSession, dir: String): DataFrame =
    shuffledPack(t(spark, dir, "documents"))
      .groupBy("seq_id")
      .agg(
        countDistinct("source").as("n_sources"),
        count(lit(1)).as("n_docs"))
      .groupBy("n_sources")
      .agg(
        count(lit(1)).as("n_seqs"),
        sum("n_docs").cast("long").as("n_docs"))

  /** The shuffled-order pack layout over an arbitrary (doc_id, source,
    * text) frame — [[packShuffled]] runs it over the whole corpus,
    * [[curationPipeline]] over the curated survivor set. Keeps the
    * 256-bucket parallel-prefix shape (the hash-prefix buckets ARE
    * prefix-order chunks; per-bucket totals roll into broadcast running
    * offsets) so no single-task global window exists at any input size.
    */
  private def shuffledPack(docs: DataFrame): DataFrame = {
    import graft.functions.Parity.md5Long
    val d = docs
      .withColumn("h", md5Long(col("doc_id").cast("string")))
      .withColumn("bucket", expr("h div 281474976710656"))
      .withColumn("n_tok", (size(split(col("text"), " ")) + 1).cast("long"))
    val wPrefix = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = d.groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum("n_tok").cast("long").as("toks"))
      .withColumn("pos_off", coalesce(sum("n").over(wPrefix), lit(0L)))
      .withColumn("tok_off", coalesce(sum("toks").over(wPrefix), lit(0L)))
      .select("bucket", "pos_off", "tok_off")
    val inBucket = Window.partitionBy("bucket").orderBy("h", "doc_id")
    d.join(broadcast(offs), "bucket")
      .withColumn("shuffle_pos",
        col("pos_off") + row_number().over(inBucket).cast("long") - 1L)
      .withColumn("start_off",
        col("tok_off") + coalesce(sum("n_tok").over(
          inBucket.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("source"), col("shuffle_pos"), col("n_tok"),
        col("start_off"),
        expr(s"start_off div $SeqLen").as("seq_id"),
        when(expr(s"(start_off + n_tok - 1) div $SeqLen")
          =!= expr(s"start_off div $SeqLen"), 1L).otherwise(0L)
          .as("spans_boundary"))
  }

  /** The per-sequence attention-mask manifest over [[packShuffled]]'s
    * layout — for every sequence that OWNS at least one document: the
    * document count, the sorted in-sequence boundary offsets (where
    * cross-document attention must be masked), whether a previous doc's
    * tail carries in (first boundary > 0), and how many owned docs
    * straddle out. Sequences fully covered by one long doc own no
    * boundary and don't appear — their mask is all-carry.
    *
    * Scale: one pass over the pack manifest, one partial-aggregated
    * shuffle on seq_id; the boundary list is bounded by SeqLen docs per
    * sequence by construction.
    */
  def seqBoundaries(spark: SparkSession, dir: String): DataFrame =
    packShuffled(spark, dir)
      .withColumn("rel_off", col("start_off") - col("seq_id") * SeqLen)
      .groupBy("seq_id")
      .agg(
        count(lit(1)).as("n_docs"),
        min("rel_off").as("first_off"),
        sum("spans_boundary").cast("long").as("n_straddle_out"),
        expr("array_join(transform(array_sort(collect_list(rel_off))," +
          " x -> cast(x as string)), ',')").as("boundaries"))
      .withColumn("carry_in",
        when(col("first_off") > 0L, 1L).otherwise(0L))

  /** The end-to-end curation job a pre-training run actually ships, as
    * ONE view: quality/exact-dup filtering (TextAnalysis.corpusFilter's
    * keep verdicts) -> near-dup pruning (keep only each
    * Dedup.dedupClusters component's exemplar, the smallest doc_id) ->
    * the shuffled pack manifest over the survivors ([[shuffledPack]]).
    * Both drop decisions are the registered corpus_filter /
    * dedup_clusters frames verbatim (computed corpus-wide, then
    * composed), so the pipeline inherits their caches and their oracle
    * semantics. Output: the packed-training-data manifest — one row per
    * surviving document with its shuffle position, token count, global
    * offset, owning sequence, and boundary-straddle flag.
    *
    * Scale: stage 1 is a scan + one md5-identity window, stage 2 touches
    * only the bounded LSH pair graph, stage 3 is the chunked parallel
    * prefix — no new shuffle shape beyond the stages' own; the stage
    * composition is two metadata-light semi/anti joins on doc_id.
    */
  def curationPipeline(spark: SparkSession, dir: String): DataFrame = {
    val keepers = TextAnalysis.corpusFilter(spark, dir)
      .filter(col("keep") === 1L).select("doc_id")
    val dupLosers = Dedup.dedupClusters(spark, dir)
      .filter(col("cluster_id") =!= col("doc_id")).select("doc_id")
    val survivors = t(spark, dir, "documents")
      .select("doc_id", "source", "text")
      .join(keepers, Seq("doc_id"), "left_semi")
      .join(dupLosers, Seq("doc_id"), "left_anti")
    shuffledPack(survivors)
  }

  /** The curation funnel audit per source — the stage-by-stage drop
    * accounting a data team reads next to [[curationPipeline]]'s
    * manifest: documents in, drops by filter reason (exact-dup /
    * too-short / token-length / stopword gate), near-dup exemplar drops
    * among the filter survivors, documents packed, tokens packed, and
    * the end-to-end keep rate.
    *
    * Scale: rides TextAnalysis.filterVerdicts (one documents scan + the
    * md5-identity window — no re-join of the corpus); the loser frame is
    * bounded by the capped LSH pair graph and joins broadcast-sized; the
    * rollup is one partial-aggregated shuffle on source.
    */
  def curationReport(spark: SparkSession, dir: String): DataFrame = {
    val losers = Dedup.dedupClusters(spark, dir)
      .filter(col("cluster_id") =!= col("doc_id"))
      .select(col("doc_id"), lit(1L).as("is_loser"))
    TextAnalysis.filterVerdicts(spark, dir)
      .join(broadcast(losers), Seq("doc_id"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("reason") === "dup", 1L).otherwise(0L)).cast("long")
          .as("n_exact_dup"),
        sum(when(col("reason") === "too_short", 1L).otherwise(0L)).cast("long")
          .as("n_too_short"),
        sum(when(col("reason") === "tok_len", 1L).otherwise(0L)).cast("long")
          .as("n_tok_len"),
        sum(when(col("reason") === "stopwords", 1L).otherwise(0L)).cast("long")
          .as("n_stopwords"),
        sum(when(col("reason") === "keep" && col("is_loser").isNotNull, 1L)
          .otherwise(0L)).cast("long").as("n_neardup_drop"),
        sum(when(col("reason") === "keep" && col("is_loser").isNull, 1L)
          .otherwise(0L)).cast("long").as("n_packed"),
        sum(when(col("reason") === "keep" && col("is_loser").isNull,
          col("n_t") + 1L).otherwise(0L)).cast("long").as("packed_toks"))
      .withColumn("keep_rate",
        col("n_packed").cast("double") / col("n_docs").cast("double"))
  }

  /** Intra-document span dedup — the within-doc half of the repetition
    * pipeline (Gopher / RefinedWeb "remove duplicate lines within a
    * document", at the same 10-token-chunk granularity the corpus
    * boilerplate ops use): keep each chunk's FIRST occurrence in
    * document order, drop later repeats, and account chunks/tokens
    * before and after plus the md5 identity of the rewritten text.
    *
    * Scale: computed entirely in-row (array_position over the doc's own
    * chunk array — chunks per doc is bounded by doc length, not corpus
    * size) — no explode, no shuffle; streams at scan speed at 100 TB.
    */
  def dedupSpans(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("tk", split(col("text"), " "))
      .withColumn("nch", expr("CAST(ceil(size(tk) / 10.0) AS BIGINT)"))
      .withColumn("chunks", expr(
        s"""transform(sequence(0L, nch - 1), i ->
           |  array_join(slice(tk, CAST(i * $ChunkToks + 1 AS INT),
           |    $ChunkToks), ' '))""".stripMargin))
      .withColumn("kept", expr(
        "filter(chunks, (c, i) -> array_position(chunks, c) == i + 1)"))
      .withColumn("kept_text", array_join(col("kept"), " "))
      .select(col("doc_id"),
        col("nch").as("n_chunks"),
        size(col("kept")).cast("long").as("n_kept"),
        (col("nch") - size(col("kept"))).as("n_dropped"),
        size(split(col("kept_text"), " ")).cast("long").as("kept_toks"),
        md5(col("kept_text")).as("kept_md5"))

  private val EmailRe = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
  private val PhoneRe = "555-[0-9]{4}"
  private val IpRe = "10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** PII detection/redaction audit — the scrub pass privacy-aware corpus
    * releases run after dedup. The raw corpus is synthetic word salad
    * with no organic PII, so a deterministic PII universe is injected
    * first (the synthetic-universe discipline of topic_configs /
    * protocol_select): docs keyed on doc_id residues get an email, phone,
    * or IPv4 appended, then detection runs three regex classes spelled
    * identically on both engines, and redaction measures the char delta
    * class-tagged replacement leaves. Per source: docs scanned, docs
    * carrying PII, hits per class, chars redacted.
    *
    * Scale: pure in-row regex work over a single scan of (doc_id, source,
    * text) — no shuffle except the final ~|sources|-row rollup; the regex
    * expressions are codegen'd so the scan stays one whole-stage span.
    */
  def piiScrub(spark: SparkSession, dir: String): DataFrame =
    piiAudit(t(spark, dir, "documents"))

  /** The scrub transform over an arbitrary (doc_id, source, text) frame —
    * batch [[piiScrub]] and Streams.piiScrubStream share it. The regex
    * classes are stateless in-row work and the rollup keys on source
    * (bounded cardinality), which is exactly what lets the streaming twin
    * run in complete mode with metadata-sized state.
    */
  private[graft] def piiAudit(docs: DataFrame): DataFrame = {
    val aug = docs
      .withColumn("txt", concat(col("text"),
        when(pmod(col("doc_id"), lit(7L)) === 0,
          concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(11L)) === 0,
          concat(lit(" call 555-"),
            lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0")))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(13L)) === 0,
          concat(lit(" host 10."),
            pmod(col("doc_id"), lit(256L)).cast("string"), lit("."),
            pmod(expr("doc_id div 7"), lit(256L)).cast("string"), lit("."),
            pmod(expr("doc_id div 49"), lit(256L)).cast("string")))
          .otherwise(lit(""))))
      .withColumn("n_email", regexp_count(col("txt"), lit(EmailRe)).cast("long"))
      .withColumn("n_phone", regexp_count(col("txt"), lit(PhoneRe)).cast("long"))
      .withColumn("n_ip", regexp_count(col("txt"), lit(IpRe)).cast("long"))
      .withColumn("red", regexp_replace(
        regexp_replace(regexp_replace(col("txt"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>"), IpRe, "<IP>"))
    aug.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("n_email") + col("n_phone") + col("n_ip") > 0, 1L)
        .otherwise(0L)).cast("long").as("docs_with_pii"),
      sum("n_email").cast("long").as("n_emails"),
      sum("n_phone").cast("long").as("n_phones"),
      sum("n_ip").cast("long").as("n_ips"),
      sum(length(col("txt")) - length(col("red"))).cast("long")
        .as("chars_redacted"))
  }

  /** Context-window budget per document for [[contextOverflow]]: docs
    * longer than this truncate in a fixed-window tokenizer path (the
    * non-packing alternative [[seqPack]] avoids — this op quantifies what
    * truncation would cost per source before choosing).
    */
  private[graft] val TruncWindow = 64L

  /** Per-source truncation accounting under a fixed context window of
    * [[TruncWindow]] whitespace tokens: how many docs overflow, and the
    * exact token mass kept vs dropped if each doc were clipped to the
    * window — the number a pipeline compares against [[packEfficiency]]'s
    * padding tax to pick clip-vs-pack per source. All counters are exact
    * BIGINTs off one scan (map-side-combined rollup to source grain, no
    * join, no window); drop_ratio is the single double division.
    */
  def contextOverflow(spark: SparkSession, dir: String): DataFrame = {
    val w = lit(TruncWindow)
    t(spark, dir, "documents")
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("n_t"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_t") > w, 1L).otherwise(0L)).as("n_overflow"),
        sum("n_t").cast("long").as("tok_total"),
        sum(least(col("n_t"), w)).cast("long").as("tok_kept"),
        sum(greatest(col("n_t") - w, lit(0L))).cast("long").as("tok_dropped"))
      .withColumn("drop_ratio",
        col("tok_dropped").cast("double") / col("tok_total").cast("double"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "context_overflow" -> contextOverflow,
    "pii_scrub" -> piiScrub,
    "dedup_spans" -> dedupSpans,
    "pack_shuffled" -> packShuffled,
    "shard_manifest" -> shardManifest,
    "seq_boundaries" -> seqBoundaries,
    "seq_source_mix" -> seqSourceMix,
    "curation_pipeline" -> curationPipeline,
    "curation_report" -> curationReport,
    "boilerplate_chunks" -> boilerplateChunks,
    "strip_boilerplate" -> stripBoilerplate,
    "pack_efficiency" -> packEfficiency,
    "seq_pack" -> seqPack,
    "pack_len_sweep" -> packLenSweep)

  /** Shared chunking CTE — unnest-in-select (DuckDB's generate_series
    * table function cannot be lateral).
    */
  private val chunkSql =
    s"""WITH tk AS (SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents),
       |ch AS (SELECT doc_id, source,
       |  unnest(generate_series(0, CAST(ceil(len(tk) / 10.0) AS BIGINT) - 1)) AS chunk_idx,
       |  unnest(list_transform(generate_series(0, CAST(ceil(len(tk) / 10.0) AS BIGINT) - 1),
       |    i -> md5(array_to_string(tk[(i * $ChunkToks + 1):(i * $ChunkToks + $ChunkToks)], ' ')))) AS chash,
       |  unnest(list_transform(generate_series(0, CAST(ceil(len(tk) / 10.0) AS BIGINT) - 1),
       |    i -> CAST(len(tk[(i * $ChunkToks + 1):(i * $ChunkToks + $ChunkToks)]) AS BIGINT))) AS chunk_toks
       |  FROM tk),
       |""".stripMargin

  private val bpSql =
    s"""bp AS (SELECT source, chash, COUNT(DISTINCT doc_id) AS n_docs,
       |  COUNT(*) AS n_occ FROM ch GROUP BY 1, 2
       |  HAVING COUNT(DISTINCT doc_id) >= $MinDocs)
       |""".stripMargin

  /** DuckDB mirror of [[packShuffled]] (ends with the per-doc manifest
    * `m(doc_id, shuffle_pos, n_tok, start_off, seq_id, spans_boundary)`)
    * — the ONE spelling of the shuffled pack layout, shared by
    * pack_shuffled and shard_manifest.
    */
  private def packChainSql: String =
    s"""WITH h AS (
       |  SELECT doc_id, source,
       |    ${md5LongSql("CAST(doc_id AS VARCHAR)")} AS hl,
       |    CAST(len(string_split(text, ' ')) + 1 AS BIGINT) AS n_tok
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, source, n_tok,
       |    CAST(ROW_NUMBER() OVER (ORDER BY hl, doc_id) - 1 AS BIGINT)
       |      AS shuffle_pos,
       |    CAST(COALESCE(SUM(n_tok) OVER (ORDER BY hl, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS start_off
       |  FROM h),
       |m AS (
       |  SELECT doc_id, source, shuffle_pos, n_tok, start_off,
       |    start_off // $SeqLen AS seq_id,
       |    CAST(CASE WHEN (start_off + n_tok - 1) // $SeqLen
       |        <> start_off // $SeqLen
       |      THEN 1 ELSE 0 END AS BIGINT) AS spans_boundary
       |  FROM p)""".stripMargin

  val oracles: Map[String, String] = Map(
    "context_overflow" ->
      s"""WITH d AS (SELECT source,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_t FROM documents)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN n_t > $TruncWindow THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_overflow,
        |  CAST(SUM(n_t) AS BIGINT) AS tok_total,
        |  CAST(SUM(LEAST(n_t, $TruncWindow)) AS BIGINT) AS tok_kept,
        |  CAST(SUM(GREATEST(n_t - $TruncWindow, 0)) AS BIGINT) AS tok_dropped,
        |  CAST(CAST(SUM(GREATEST(n_t - $TruncWindow, 0)) AS BIGINT) AS DOUBLE)
        |    / CAST(CAST(SUM(n_t) AS BIGINT) AS DOUBLE) AS drop_ratio
        |FROM d GROUP BY source""".stripMargin,
    "pii_scrub" ->
      """WITH aug AS (
        |  SELECT doc_id, source, text ||
        |    CASE WHEN doc_id % 7 = 0
        |      THEN ' contact user' || doc_id || '@example.com' ELSE '' END ||
        |    CASE WHEN doc_id % 11 = 0
        |      THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 13 = 0
        |      THEN ' host 10.' || (doc_id % 256) || '.'
        |        || ((doc_id // 7) % 256) || '.' || ((doc_id // 49) % 256)
        |      ELSE '' END AS txt
        |  FROM documents),
        |d AS (
        |  SELECT source, txt,
        |    CAST(len(regexp_extract_all(txt,
        |      '[a-z0-9]+@[a-z0-9]+\.[a-z]+')) AS BIGINT) AS n_email,
        |    CAST(len(regexp_extract_all(txt,
        |      '555-[0-9]{4}')) AS BIGINT) AS n_phone,
        |    CAST(len(regexp_extract_all(txt,
        |      '10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ip,
        |    regexp_replace(regexp_replace(regexp_replace(txt,
        |      '[a-z0-9]+@[a-z0-9]+\.[a-z]+', '<EMAIL>', 'g'),
        |      '555-[0-9]{4}', '<PHONE>', 'g'),
        |      '10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g') AS red
        |  FROM aug)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN n_email + n_phone + n_ip > 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS docs_with_pii,
        |  CAST(SUM(n_email) AS BIGINT) AS n_emails,
        |  CAST(SUM(n_phone) AS BIGINT) AS n_phones,
        |  CAST(SUM(n_ip) AS BIGINT) AS n_ips,
        |  CAST(SUM(len(txt) - len(red)) AS BIGINT) AS chars_redacted
        |FROM d GROUP BY source""".stripMargin,
    "dedup_spans" ->
      s"""WITH tk AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |ch AS (
        |  SELECT doc_id,
        |    unnest(generate_series(0,
        |      CAST(ceil(len(tk) / 10.0) AS BIGINT) - 1)) AS chunk_id,
        |    unnest(list_transform(generate_series(0,
        |        CAST(ceil(len(tk) / 10.0) AS BIGINT) - 1),
        |      i -> array_to_string(
        |        tk[(i * $ChunkToks + 1):(i * $ChunkToks + $ChunkToks)],
        |        ' '))) AS ctext
        |  FROM tk),
        |k AS (
        |  SELECT doc_id, chunk_id, ctext,
        |    CASE WHEN MIN(chunk_id) OVER (PARTITION BY doc_id, ctext)
        |      = chunk_id THEN 1 ELSE 0 END AS kept
        |  FROM ch)
        |SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_chunks,
        |  CAST(SUM(kept) AS BIGINT) AS n_kept,
        |  CAST(COUNT(*) - SUM(kept) AS BIGINT) AS n_dropped,
        |  CAST(SUM(CASE WHEN kept = 1
        |    THEN len(string_split(ctext, ' ')) ELSE 0 END) AS BIGINT)
        |    AS kept_toks,
        |  md5(string_agg(ctext, ' ' ORDER BY chunk_id)
        |    FILTER (WHERE kept = 1)) AS kept_md5
        |FROM k GROUP BY doc_id""".stripMargin,
    "pack_shuffled" -> (packChainSql +
      "\nSELECT doc_id, shuffle_pos, n_tok, start_off, seq_id," +
      " spans_boundary FROM m"),
    "seq_source_mix" -> (packChainSql + ",\n" +
      """sm AS (
         |  SELECT seq_id, CAST(COUNT(DISTINCT source) AS BIGINT)
         |      AS n_sources,
         |    CAST(COUNT(*) AS BIGINT) AS n_docs
         |  FROM m GROUP BY seq_id)
         |SELECT n_sources, CAST(COUNT(*) AS BIGINT) AS n_seqs,
         |  CAST(SUM(n_docs) AS BIGINT) AS n_docs
         |FROM sm GROUP BY n_sources""".stripMargin),
    "seq_boundaries" -> (packChainSql + ",\n" +
      s"""r AS (
         |  SELECT seq_id, start_off - seq_id * $SeqLen AS rel_off,
         |    spans_boundary
         |  FROM m)
         |SELECT seq_id,
         |  COUNT(*) AS n_docs,
         |  MIN(rel_off) AS first_off,
         |  CAST(SUM(spans_boundary) AS BIGINT) AS n_straddle_out,
         |  string_agg(CAST(rel_off AS VARCHAR), ',' ORDER BY rel_off)
         |    AS boundaries,
         |  CAST(CASE WHEN MIN(rel_off) > 0 THEN 1 ELSE 0 END AS BIGINT)
         |    AS carry_in
         |FROM r GROUP BY seq_id""".stripMargin),
    "shard_manifest" -> (packChainSql + ",\n" +
      s"""ps AS (
         |  SELECT seq_id % $NumShards AS shard, seq_id,
         |    COUNT(*) AS d,
         |    CAST(SUM(n_tok) AS BIGINT) AS tk,
         |    CAST(SUM(spans_boundary) AS BIGINT) AS sp
         |  FROM m GROUP BY seq_id % $NumShards, seq_id)
         |SELECT shard,
         |  COUNT(*) AS n_seqs,
         |  CAST(SUM(d) AS BIGINT) AS n_docs,
         |  CAST(SUM(tk) AS BIGINT) AS n_toks,
         |  CAST(SUM(sp) AS BIGINT) AS n_straddle,
         |  MIN(seq_id) AS min_seq,
         |  MAX(seq_id) AS max_seq
         |FROM ps GROUP BY shard""".stripMargin),
    "curation_pipeline" -> (Dedup.clustersChainSql + ",\n" +
      "losers AS (SELECT src AS doc_id FROM reach GROUP BY src HAVING MIN(dst) <> src),\n" +
      TextAnalysis.corpusFilterChainSql + ",\n" +
      s"""surv AS (
         |  SELECT d.doc_id, d.source, d.text FROM documents d
         |  JOIN r USING (doc_id)
         |  WHERE r.reason = 'keep'
         |    AND d.doc_id NOT IN (SELECT doc_id FROM losers)),
         |sh2 AS (
         |  SELECT doc_id, source,
         |    ${md5LongSql("CAST(doc_id AS VARCHAR)")} AS hl,
         |    CAST(len(string_split(text, ' ')) + 1 AS BIGINT) AS n_tok
         |  FROM surv),
         |p2 AS (
         |  SELECT doc_id, source, n_tok,
         |    CAST(ROW_NUMBER() OVER (ORDER BY hl, doc_id) - 1 AS BIGINT)
         |      AS shuffle_pos,
         |    CAST(COALESCE(SUM(n_tok) OVER (ORDER BY hl, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS start_off
         |  FROM sh2)
         |SELECT doc_id, source, shuffle_pos, n_tok, start_off,
         |  start_off // $SeqLen AS seq_id,
         |  CAST(CASE WHEN (start_off + n_tok - 1) // $SeqLen
         |      <> start_off // $SeqLen
         |    THEN 1 ELSE 0 END AS BIGINT) AS spans_boundary
         |FROM p2""".stripMargin),
    "curation_report" -> (Dedup.clustersChainSql + ",\n" +
      "losers AS (SELECT src AS doc_id FROM reach GROUP BY src HAVING MIN(dst) <> src),\n" +
      TextAnalysis.corpusFilterChainSql + ",\n" +
      """d2 AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_t
        |  FROM documents),
        |j2 AS (
        |  SELECT d2.source, r.reason, d2.n_t,
        |    CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_loser
        |  FROM d2 JOIN r USING (doc_id)
        |  LEFT JOIN losers l ON l.doc_id = d2.doc_id)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN reason = 'dup' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_exact_dup,
        |  CAST(SUM(CASE WHEN reason = 'too_short' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_too_short,
        |  CAST(SUM(CASE WHEN reason = 'tok_len' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_tok_len,
        |  CAST(SUM(CASE WHEN reason = 'stopwords' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_stopwords,
        |  CAST(SUM(CASE WHEN reason = 'keep' AND is_loser = 1
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup_drop,
        |  CAST(SUM(CASE WHEN reason = 'keep' AND is_loser = 0
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_packed,
        |  CAST(SUM(CASE WHEN reason = 'keep' AND is_loser = 0
        |    THEN n_t + 1 ELSE 0 END) AS BIGINT) AS packed_toks,
        |  CAST(SUM(CASE WHEN reason = 'keep' AND is_loser = 0
        |    THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS keep_rate
        |FROM j2 GROUP BY source""".stripMargin),
    "boilerplate_chunks" -> (chunkSql + bpSql + "SELECT * FROM bp"),
    "strip_boilerplate" -> (chunkSql + bpSql +
      """SELECT ch.doc_id, COUNT(*) AS n_chunks,
        |  CAST(SUM(CASE WHEN bp.chash IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bp,
        |  CAST(SUM(CASE WHEN bp.chash IS NULL THEN ch.chunk_toks ELSE 0 END) AS BIGINT) AS kept_toks
        |FROM ch LEFT JOIN bp ON ch.source = bp.source AND ch.chash = bp.chash
        |GROUP BY 1""".stripMargin),
    "pack_efficiency" ->
      s"""WITH d AS (SELECT doc_id, source,
         |  CAST(len(string_split(text, ' ')) + 1 AS BIGINT) AS n_tok FROM documents),
         |c AS (SELECT doc_id, source, n_tok,
         |  CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
         |  FROM d),
         |p AS (SELECT source, n_tok,
         |  CAST(CASE WHEN (start_off + n_tok - 1) // $SeqLen <> start_off // $SeqLen
         |    THEN 1 ELSE 0 END AS BIGINT) AS spans_boundary
         |  FROM c),
         |agg AS (SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(n_tok) AS BIGINT) AS total_toks,
         |  CAST(SUM(spans_boundary) AS BIGINT) AS n_spanning
         |  FROM p GROUP BY source)
         |SELECT source, n_docs, total_toks, n_spanning,
         |  (total_toks + ${SeqLen - 1}) // $SeqLen AS n_seqs,
         |  ((total_toks + ${SeqLen - 1}) // $SeqLen) * $SeqLen - total_toks
         |    AS tail_waste,
         |  CAST(n_spanning AS DOUBLE) / n_docs AS span_rate
         |FROM agg""".stripMargin,
    "pack_len_sweep" ->
      s"""WITH d AS (SELECT doc_id, source,
         |  CAST(len(string_split(text, ' ')) + 1 AS BIGINT) AS n_tok
         |  FROM documents),
         |c AS (SELECT doc_id, source, n_tok,
         |  CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY source
         |    ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    AS BIGINT) AS start_off
         |  FROM d),
         |ks AS (SELECT CAST(unnest([256, 512, 1024]) AS BIGINT) AS ctx),
         |per AS (
         |  SELECT ctx, source, COUNT(*) AS nd,
         |    CAST(SUM(n_tok) AS BIGINT) AS stoks,
         |    CAST(SUM(CASE WHEN (start_off + n_tok - 1) // ctx
         |      <> start_off // ctx THEN 1 ELSE 0 END) AS BIGINT) AS nsp
         |  FROM c CROSS JOIN ks GROUP BY ctx, source),
         |per2 AS (
         |  SELECT ctx, nd, stoks, nsp,
         |    (stoks + ctx - 1) // ctx AS sseqs FROM per),
         |r AS (
         |  SELECT ctx, CAST(SUM(nd) AS BIGINT) AS n_docs,
         |    CAST(SUM(stoks) AS BIGINT) AS total_toks,
         |    CAST(SUM(nsp) AS BIGINT) AS n_spanning,
         |    CAST(SUM(sseqs) AS BIGINT) AS n_seqs
         |  FROM per2 GROUP BY ctx)
         |SELECT ctx, n_docs, total_toks, n_spanning, n_seqs,
         |  n_seqs * ctx - total_toks AS tail_waste,
         |  (10000 * n_spanning) // n_docs AS span_bp
         |FROM r""".stripMargin,
    "seq_pack" ->
      s"""WITH d AS (SELECT doc_id, source,
         |  CAST(len(string_split(text, ' ')) + 1 AS BIGINT) AS n_tok FROM documents),
         |c AS (SELECT doc_id, source, n_tok,
         |  CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
         |  FROM d)
         |SELECT doc_id, source, n_tok, start_off, start_off // $SeqLen AS seq_id,
         |  CAST(CASE WHEN (start_off + n_tok - 1) // $SeqLen <> start_off // $SeqLen
         |    THEN 1 ELSE 0 END AS BIGINT) AS spans_boundary
         |FROM c""".stripMargin)
}
