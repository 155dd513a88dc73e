package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.engine.{QueryDef, QueryGroup, Tables}

/** URL canonicalization and URL-level exact dedup — the first hygiene
  * pass of every web-crawl training corpus (before any content dedup
  * runs, the same page fetched as `HTTP://WWW.Site.com/a/index.html?
  * utm_source=feed#frag` and `http://site.com/a` must collapse to ONE
  * fetch key). The reference's analog is station/trip id normalization
  * before matching [P match_ids.py — SURVEY §1.2]; the corpus-scale
  * need comes from PAPERS.md's crawl-pipeline stage lists (CCNet /
  * RefinedWeb start with URL-level dedup).
  *
  * The driver tables carry no URL column, so raw URLs are SYNTHESIZED
  * deterministically from documents (mixed-case scheme/host, default
  * port, `www.`, tracking params, `index.html`, fragments — every
  * mess the normalizer must fix), identically in both engines; the
  * oracle restates the normalization with DuckDB's string/list
  * functions, so hash equality gates each canonicalization rule.
  *
  * Cross-engine determinism: pure string/integer functions throughout;
  * parameter reordering uses lexicographic array_sort/list_sort on
  * ASCII `key=value` strings — identical collation.
  */
object UrlOps extends QueryGroup {

  /** Deterministic raw URL per document (same expression in SQL).
    *
    * The path/id components use integer-DIVISION-derived digits, not
    * plain moduli: the driver's `source` column is itself
    * `src{doc_id % 20}`, so any modulus key would be CRT-unique per
    * doc and the dedup would be vacuous. With `(d div 20) % 5` and
    * `(d div 100) % 3` the canonical key collapses doc_ids that agree
    * mod 20, in `(d div 20) mod 5`, and in `(d div 100) mod 3` — real
    * duplicate groups at every SF. */
  def rawUrl(docId: Column, source: Column): Column =
    concat(
      lit("HTTPS://WWW."), upper(source), lit(".Example.COM:443/docs/"),
      floor(docId / 20).cast("long").%(5).cast("string"),
      when(docId % 3 === 0, "/index.html").otherwise(""),
      when(docId % 2 === 0,
        concat(lit("?utm_source=feed&id="),
          floor(docId / 100).cast("long").%(3).cast("string"),
          lit("&ref=rss")))
        .otherwise(concat(lit("?id="),
          floor(docId / 100).cast("long").%(3).cast("string"))),
      when(docId % 5 === 0, "#sec-2").otherwise(""))

  /** Canonical form: lowercase scheme+host, strip default port and
    * `www.`, directory-index and trailing-slash removal on the path,
    * drop tracking params (`utm_*`, `ref`), sort surviving params,
    * drop the fragment. */
  def canonUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val qPos = instr(noFrag, "?")
    val base = when(qPos > 0, noFrag.substr(lit(1), qPos - 1)).otherwise(noFrag)
    val query = when(qPos > 0, noFrag.substr(qPos + 1, length(noFrag))).otherwise(lit(""))
    val sPos = instr(base, "://") // 1-based start of "://"
    val scheme = lower(base.substr(lit(1), sPos - 1))
    val rest = base.substr(sPos + 3, length(base))
    val slash = instr(rest, "/")
    val hostport = lower(when(slash > 0, rest.substr(lit(1), slash - 1)).otherwise(rest))
    val host = regexp_replace(
      regexp_replace(
        when(scheme === "https", regexp_replace(hostport, ":443$", ""))
          .when(scheme === "http", regexp_replace(hostport, ":80$", ""))
          .otherwise(hostport),
        "^www\\.", ""),
      "\\.$", "")
    val rawPath = when(slash > 0, rest.substr(slash, length(rest))).otherwise(lit(""))
    val path = regexp_replace(
      regexp_replace(rawPath, "/index\\.html$", "/"), "/+$", "")
    val kept = array_sort(filter(split(query, "&"),
      p => !(p.startsWith("utm_") || p.startsWith("ref=") || p === "")))
    val qn = array_join(kept, "&")
    concat(scheme, lit("://"), host, path,
      when(qn === "", "").otherwise(concat(lit("?"), qn)))
  }

  /** DuckDB twin of [[rawUrl]] + [[canonUrl]] as CTEs `u` (doc_id,
    * url) and `c` (doc_id, url, canon). */
  private val UrlCtes: String =
    "u AS (SELECT doc_id, 'HTTPS://WWW.' || upper(source) || '.Example.COM:443/docs/' || " +
      "CAST((doc_id // 20) % 5 AS VARCHAR) || " +
      "(CASE WHEN doc_id % 3 = 0 THEN '/index.html' ELSE '' END) || " +
      "(CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&id=' || CAST((doc_id // 100) % 3 AS VARCHAR) || '&ref=rss' " +
      "ELSE '?id=' || CAST((doc_id // 100) % 3 AS VARCHAR) END) || " +
      "(CASE WHEN doc_id % 5 = 0 THEN '#sec-2' ELSE '' END) AS url FROM documents), " +
      "s1 AS (SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS nofrag FROM u), " +
      "s2 AS (SELECT *, strpos(nofrag, '?') AS qpos FROM s1), " +
      "s3 AS (SELECT *, CASE WHEN qpos > 0 THEN substr(nofrag, 1, qpos-1) ELSE nofrag END AS base, " +
      "CASE WHEN qpos > 0 THEN substr(nofrag, qpos+1) ELSE '' END AS query FROM s2), " +
      "s4 AS (SELECT *, strpos(base, '://') AS spos FROM s3), " +
      "s5 AS (SELECT *, lower(substr(base, 1, spos-1)) AS scheme, substr(base, spos+3) AS rest FROM s4), " +
      "s6 AS (SELECT *, strpos(rest, '/') AS slash FROM s5), " +
      "s7 AS (SELECT *, lower(CASE WHEN slash > 0 THEN substr(rest, 1, slash-1) ELSE rest END) AS hostport, " +
      "CASE WHEN slash > 0 THEN substr(rest, slash) ELSE '' END AS rawpath FROM s6), " +
      "s8 AS (SELECT *, regexp_replace(regexp_replace(" +
      "CASE WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '') " +
      "WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '') ELSE hostport END, " +
      "'^www\\.', ''), '\\.$', '') AS host, " +
      "regexp_replace(regexp_replace(rawpath, '/index\\.html$', '/'), '/+$', '') AS path, " +
      "array_to_string(list_sort(list_filter(string_split(query, '&'), " +
      "p -> NOT (p LIKE 'utm\\_%' ESCAPE '\\' OR p LIKE 'ref=%' OR p = ''))), '&') AS qn FROM s7), " +
      "c AS (SELECT doc_id, url, scheme || '://' || host || path || " +
      "(CASE WHEN qn = '' THEN '' ELSE '?' || qn END) AS canon FROM s8)"

  def defs: Seq[QueryDef] = Seq(

    // Per document: the raw synthesized URL and its canonical form —
    // the normalizer itself under the hash gate, every rule visible.
    QueryDef(
      "text_url_normalize",
      (spark, sf) => {
        val d = Tables.documents(spark, sf)
        d.select(col("doc_id"),
            rawUrl(col("doc_id"), col("source")).as("url"))
          .withColumn("canon", canonUrl(col("url")))
          .orderBy("doc_id")
      },
      Some("WITH " + UrlCtes +
        " SELECT doc_id, url, canon FROM c ORDER BY doc_id"),
      scaleNote = "Map-only: the whole normalizer is one codegen'd " +
        "string-expression tree riding the scan — no shuffle, no " +
        "state, linear in corpus bytes. At 100 TB this runs as the " +
        "fetch-log decorator and the canonical URL becomes the " +
        "partition/bucket key of the crawl store, so the later " +
        "URL-dedup groupBy shuffles an already-clustered key. The " +
        "param filter is an array HOF over a bounded query string, " +
        "not a regex backtrack — worst-case cost is the string " +
        "length, immune to adversarial inputs."),

    // URL-level exact dedup on the canonical form: fetch-key groups,
    // variant counts, and the keeper (min doc_id) per group — the
    // pre-content-dedup pass that collapses protocol/tracking/index
    // variants of the same page.
    QueryDef(
      "dedup_url",
      (spark, sf) => {
        val d = Tables.documents(spark, sf)
        d.select(col("doc_id"),
            rawUrl(col("doc_id"), col("source")).as("url"))
          .withColumn("canon", canonUrl(col("url")))
          .groupBy("canon")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("url")).as("n_raw_variants"),
            min(col("doc_id")).as("keeper"))
          .orderBy("canon")
      },
      Some("WITH " + UrlCtes +
        " SELECT canon, count(*) AS n_docs, count(DISTINCT url) AS n_raw_variants, " +
        "min(doc_id) AS keeper FROM c GROUP BY canon ORDER BY canon"),
      scaleNote = "One hash shuffle on the canonical URL — " +
        "map-side-combinable counts, min-keeper, O(|distinct urls|) " +
        "state. At 100 TB hash the canonical string to 16 bytes for " +
        "the exchange (xxhash/md5-half, dedup_spans' trick) and keep " +
        "the raw string only on the keeper rows; host-level skew " +
        "(one domain = billions of URLs) is bounded because the KEY " +
        "is the full URL, not the host — per-key groups stay tiny, " +
        "and AQE handles residual partition imbalance. The keeper " +
        "choice (min doc_id = first fetch) is the standard " +
        "recrawl-dedup policy and is deterministic under re-runs."))
}
