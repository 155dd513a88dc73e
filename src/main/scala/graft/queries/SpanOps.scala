package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{QueryDef, QueryGroup, Tables}

/** Span-granular corpus hygiene: exact substring-level dedup and
  * boilerplate removal, the two cleaning stages between raw crawl text
  * and a training corpus that document-level dedup (NearDup / SimHash)
  * cannot express. A "span" is a disjoint W-token window of the
  * document — the single-line-text analog of the line/passage unit
  * that exact-substring training-data dedup and CCNet-style
  * boilerplate filtering operate on (PAPERS.md: "Deduplicating
  * Training Data Makes Language Models Better" — suffix-array exact
  * dedup; CCNet — per-shard repeated-paragraph removal).
  *
  * Reference analog: the reference has no corpus layer (it is a
  * transit ETL [P, module-level recall — SURVEY.md §0]); these extend
  * the LLM-pipeline family SURVEY.md §2.2b mandates.
  *
  * Cross-engine determinism: spans are built from the SAME token
  * split (`split(text,' ')` / `string_split`) both engines use
  * everywhere else; span text is rebuilt by joining exactly W ordered
  * tokens, so the strings — and their md5 — are bit-identical. All
  * counts are integers; the only float is one final round(ratio, 4).
  */
object SpanOps extends QueryGroup {

  /** Disjoint W-token spans of `text`, as array<string> in document
    * order. `ceil(|tokens|/W)` spans; the last may be short. */
  def spansArr(text: Column, w: Int): Column = {
    val toks = split(text, " ")
    transform(
      sequence(lit(0), ceil(size(toks).cast("double") / w).cast("int") - 1),
      i => array_join(slice(toks, i * w + 1, lit(w)), " "))
  }

  /** (doc_id, span_no, span) rows — span_no is the 0-based position. */
  def spanRows(docs: DataFrame, w: Int): DataFrame =
    docs.select(col("doc_id"),
      posexplode(spansArr(col("text"), w)).as(Seq("span_no", "span")))

  /** DuckDB twin of [[spanRows]]: tokens via the set-returning
    * unnest + generate_subscripts zip (DuckDB v1.0 has no lateral
    * generate_series), spans via ordered string_agg per (doc, bucket).
    * Yields CTEs `sp_toks`, `sp` with columns (doc_id, span_no, span). */
  def spanCtes(w: Int): String =
    s"sp_toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok, " +
      "generate_subscripts(string_split(text,' '),1) AS idx FROM documents), " +
      s"sp AS (SELECT doc_id, (idx-1)//$w AS span_no, " +
      "string_agg(tok, ' ' ORDER BY idx) AS span FROM sp_toks GROUP BY 1,2)"

  /** Lexicographic (doc_id, span_no) encoded as one BIGINT so both
    * engines take min() over a scalar. Safe while span_no < 2^20
    * (a 12-token-span doc would need >12M tokens to overflow). */
  private val OwnerEncode = 1048576L

  /** Spark-side ordered "kept spans rejoined" text: sort the kept
    * (span_no, span) structs (array_sort compares fields in order)
    * and join — deterministic where collect_list order is not. */
  private def keptText(keep: Column): Column =
    array_join(
      transform(
        array_sort(collect_list(when(keep,
          struct(col("span_no"), col("span"))))),
        x => x.getField("span")),
      " ")

  def defs: Seq[QueryDef] = Seq(

    // Exact span-level dedup, keep-first: a span occurrence survives
    // iff it is the corpus-wide FIRST occurrence (min (doc_id,
    // span_no)) of that exact text. Per doc: span counts, the dup
    // ratio, and the md5 of the deduplicated document (kept spans
    // rejoined in order) — the actual cleaned-corpus artifact.
    QueryDef(
      "dedup_spans",
      (spark, sf) => {
        val w = 12
        val sp = spanRows(Tables.documents(spark, sf), w)
          .withColumn("pos", col("doc_id") * OwnerEncode + col("span_no"))
        val owner = Window.partitionBy("span")
        sp.withColumn("kept", col("pos") === min(col("pos")).over(owner))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_spans"),
            sum(when(col("kept"), 0L).otherwise(1L)).as("n_dup"),
            md5(keptText(col("kept"))).as("kept_hash"))
          .withColumn("dup_ratio",
            round(col("n_dup").cast("double") / col("n_spans"), 4))
          .select("doc_id", "n_spans", "n_dup", "dup_ratio", "kept_hash")
          .orderBy("doc_id")
      },
      Some("WITH " + spanCtes(12) +
        s", own AS (SELECT span, min(doc_id*$OwnerEncode + span_no) AS owner FROM sp GROUP BY 1)" +
        s", k AS (SELECT doc_id, span_no, span, (doc_id*$OwnerEncode + span_no = owner) AS kept FROM sp JOIN own USING (span)) " +
        "SELECT doc_id, count(*) AS n_spans, " +
        "CAST(count(*) FILTER (WHERE NOT kept) AS BIGINT) AS n_dup, " +
        "round(CAST(count(*) FILTER (WHERE NOT kept) AS DOUBLE) / count(*), 4) AS dup_ratio, " +
        "md5(coalesce(string_agg(span, ' ' ORDER BY span_no) FILTER (WHERE kept), '')) AS kept_hash " +
        "FROM k GROUP BY doc_id ORDER BY doc_id"),
      scaleNote = "The Lee-et-al exact-dedup shape at span granularity: " +
        "one shuffle on the span key finds first-occurrences (min over " +
        "a window = 2-phase agg + self-colocated window, same " +
        "exchange), one shuffle on doc_id reassembles — both " +
        "map-side-combinable, never all-pairs. At 100 TB hash each " +
        "span to 8 bytes first (ngram_jaccard's trick) so the wide " +
        "shuffle carries fixed-width keys, and keep the raw span text " +
        "only in the reassembly exchange (keyed by doc). A true " +
        "suffix-array dedup (arbitrary-length substrings) is the " +
        "documented upgrade; disjoint-span dedup is its bounded-memory " +
        "distributed approximation — spans never straddle, so state " +
        "per key is O(1) and the plan is two hash shuffles whatever " +
        "the corpus size."),

    // CCNet-style boilerplate removal: a span whose exact text occurs
    // in >= 3 DISTINCT documents corpus-wide is boilerplate (nav
    // chrome, license headers, templated paragraphs) and is dropped
    // from EVERY document — unlike dedup_spans, no occurrence
    // survives. Per doc: counts, ratio, cleaned-doc hash.
    QueryDef(
      "text_boilerplate",
      (spark, sf) => {
        val w = 6
        val sp = spanRows(Tables.documents(spark, sf), w)
        // df via groupBy + join-back, NOT a whole-partition window with
        // collect_set: the window form buffers the full distinct-doc
        // set per span ROW, and a pervasive template span (exactly the
        // case this operator targets) makes that per-key state
        // O(|docs containing span|). The distinct-agg is map-side
        // combinable and carries no per-row set state — the same shape
        // the DuckDB oracle uses.
        val df = sp.groupBy("span")
          .agg(countDistinct(col("doc_id")).as("span_df"))
        sp.join(df, "span")
          .withColumn("kept", col("span_df") < 3)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_spans"),
            sum(when(col("kept"), 0L).otherwise(1L)).as("n_bp"),
            md5(keptText(col("kept"))).as("kept_hash"))
          .withColumn("bp_ratio",
            round(col("n_bp").cast("double") / col("n_spans"), 4))
          .select("doc_id", "n_spans", "n_bp", "bp_ratio", "kept_hash")
          .orderBy("doc_id")
      },
      Some("WITH " + spanCtes(6) +
        ", df AS (SELECT span, count(DISTINCT doc_id) AS span_df FROM sp GROUP BY 1)" +
        ", k AS (SELECT doc_id, span_no, span, (span_df < 3) AS kept FROM sp JOIN df USING (span)) " +
        "SELECT doc_id, count(*) AS n_spans, " +
        "CAST(count(*) FILTER (WHERE NOT kept) AS BIGINT) AS n_bp, " +
        "round(CAST(count(*) FILTER (WHERE NOT kept) AS DOUBLE) / count(*), 4) AS bp_ratio, " +
        "md5(coalesce(string_agg(span, ' ' ORDER BY span_no) FILTER (WHERE kept), '')) AS kept_hash " +
        "FROM k GROUP BY doc_id ORDER BY doc_id"),
      scaleNote = "Same two-exchange shape as dedup_spans (span-key " +
        "df, then doc-key reassembly); the df side is a distinct-agg " +
        "over (span, doc) — map-side combinable, and the W=6 span " +
        "vocabulary is bounded by corpus tokens/6. The df>=3 " +
        "threshold is the CCNet dial: at scale compute df per SHARD " +
        "(site/domain), not corpus-wide, so the span-key shuffle " +
        "partitions by (shard, span) and boilerplate stays local to " +
        "the template family that produced it. A Misra-Gries pass " +
        "(agg_heavy_hitters) over span hashes is the documented " +
        "prefilter when only the top templates matter: KB-size " +
        "partials instead of the full span vocabulary."))
}
