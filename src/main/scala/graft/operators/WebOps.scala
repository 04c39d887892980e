package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL/domain front-door operators — the first thing every web-corpus
  * pipeline runs: canonicalize the crawl URL, extract the registrable
  * domain, dedup and rate-stat per domain.
  *
  * The documents table carries no URL column, so a deterministic messy
  * URL is DERIVED from (doc_id, source, lang) identically on both
  * engines — uppercase schemes, www. prefixes, explicit default ports,
  * tracking params and fragments — exercising every normalization rule
  * on data both sides compute from the same parquet. All string ops are
  * row-local narrow transforms: at 100 TB the whole front door is one
  * scan with zero shuffles until the per-domain aggregation, which is
  * map-side combined on the (domain) key.
  */
object WebOps {

  /** Messy-URL derivation: scheme case varies by doc_id%3 (and %3==2 is
    * plain http), explicit default port on evens, path id is doc_id%23
    * (so canonical collisions exist), tracking params carry the real
    * doc_id (stripped by canonicalization → collisions become visible
    * dups). */
  // NOTE: continuation lines must not START with "||" — this fragment
  // is re-embedded in outer interpolated strings whose stripMargin
  // would eat leading pipes; operators trail the previous line instead
  private val urlSql: String =
    """u AS (
      |  SELECT doc_id, lang, source,
      |    (CASE doc_id % 3 WHEN 0 THEN 'HTTPS' WHEN 1 THEN 'https' ELSE 'http' END) ||
      |    '://WWW.' || source || '.Example.COM' ||
      |    (CASE WHEN doc_id % 3 = 2 THEN ':80'
      |          WHEN doc_id % 2 = 0 THEN ':443' ELSE '' END) ||
      |    '/' || lang || '/item-' || CAST(doc_id % 23 AS VARCHAR) ||
      |    '?utm_source=feed&id=' || CAST(doc_id % 23 AS VARCHAR) ||
      |    '&utm_campaign=c' || CAST(doc_id % 5 AS VARCHAR) ||
      |    '&ref=' || CAST(doc_id AS VARCHAR) ||
      |    '#sec' || CAST(doc_id % 4 AS VARCHAR) AS url
      |  FROM documents)""".stripMargin

  /** Canonicalization CTEs on top of `u`: lowercase scheme/host, strip
    * the www. prefix, drop scheme-default ports, drop tracking params
    * (utm_*, ref) and the fragment, sort surviving query params.
    * `canon` carries (doc_id, lang, source, url, host, scheme,
    * canon_url). */
  private val canonSql: String =
    s"""$urlSql,
       |cp AS (
       |  SELECT doc_id, lang, source, url,
       |    lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
       |    regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1) AS hostport,
       |    regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) AS path,
       |    regexp_extract(url, '\\?([^#]*)', 1) AS qstr
       |  FROM u),
       |cn AS (
       |  SELECT doc_id, lang, source, url, scheme, path,
       |    regexp_replace(lower(regexp_replace(hostport, ':[0-9]+$$', '')),
       |      '^www\\.', '') AS host,
       |    regexp_extract(hostport, ':([0-9]+)$$', 1) AS port,
       |    array_to_string(list_sort(list_filter(string_split(qstr, '&'),
       |      p -> p <> '' AND NOT starts_with(p, 'utm_')
       |           AND NOT starts_with(p, 'ref='))), '&') AS qs
       |  FROM cp),
       |canon AS (
       |  SELECT doc_id, lang, source, url, host, scheme,
       |    scheme || '://' || host ||
       |    (CASE WHEN port <> '' AND NOT ((scheme = 'https' AND port = '443')
       |                                OR (scheme = 'http' AND port = '80'))
       |     THEN ':' || port ELSE '' END) ||
       |    path ||
       |    (CASE WHEN qs <> '' THEN '?' || qs ELSE '' END) AS canon_url
       |  FROM cn)""".stripMargin

  /** Spark mirror of `u`: the derived messy URL column. */
  private def urlCol: Column =
    concat(
      when(pmod(col("doc_id"), lit(3)) === 0, lit("HTTPS"))
        .when(pmod(col("doc_id"), lit(3)) === 1, lit("https"))
        .otherwise(lit("http")),
      lit("://WWW."), col("source"), lit(".Example.COM"),
      when(pmod(col("doc_id"), lit(3)) === 2, lit(":80"))
        .when(pmod(col("doc_id"), lit(2)) === 0, lit(":443"))
        .otherwise(lit("")),
      lit("/"), col("lang"), lit("/item-"), pmod(col("doc_id"), lit(23)).cast("string"),
      lit("?utm_source=feed&id="), pmod(col("doc_id"), lit(23)).cast("string"),
      lit("&utm_campaign=c"), pmod(col("doc_id"), lit(5)).cast("string"),
      lit("&ref="), col("doc_id").cast("string"),
      lit("#sec"), pmod(col("doc_id"), lit(4)).cast("string"))

  /** Spark mirror of `canon`: (doc_id, lang, source, url, host, scheme,
    * canon_url). Every step is a codegen'd narrow expression — the
    * canonicalizer adds zero exchanges to whatever plan consumes it. */
  private[graft] def canonical(s: SparkSession, dir: String): DataFrame = {
    val withUrl = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("source"), urlCol.as("url"))
    val scheme = lower(regexp_extract(col("url"), "^([A-Za-z]+)://", 1))
    val hostport = regexp_extract(col("url"), "^[A-Za-z]+://([^/?#]+)", 1)
    val path = regexp_extract(col("url"), "^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    val qstr = regexp_extract(col("url"), "\\?([^#]*)", 1)
    val host = regexp_replace(
      lower(regexp_replace(col("hostport"), ":[0-9]+$", "")), "^www\\.", "")
    val port = regexp_extract(col("hostport"), ":([0-9]+)$", 1)
    val qs = array_join(array_sort(filter(split(col("qstr"), "&"),
      p => p =!= "" && !p.startsWith("utm_") && !p.startsWith("ref="))), "&")
    val keepPort = col("port") =!= "" &&
      !((col("scheme") === "https" && col("port") === "443") ||
        (col("scheme") === "http" && col("port") === "80"))
    withUrl
      .withColumn("scheme", scheme)
      .withColumn("hostport", hostport)
      .withColumn("path", path)
      .withColumn("qstr", qstr)
      .withColumn("host", host)
      .withColumn("port", port)
      .withColumn("qs", qs)
      .select(col("doc_id"), col("lang"), col("source"), col("url"),
        col("host"), col("scheme"),
        concat(col("scheme"), lit("://"), col("host"),
          when(keepPort, concat(lit(":"), col("port"))).otherwise(lit("")),
          col("path"),
          when(col("qs") =!= "", concat(lit("?"), col("qs"))).otherwise(lit("")))
          .as("canon_url"))
  }

  val defs: Seq[(String, QueryDef)] = Seq(

    // ------------------------------------------------------------------
    // URL canonicalization: scheme/host lowercasing, www-prefix strip,
    // scheme-default-port drop, tracking-param (utm_*, ref) strip,
    // param sort, fragment drop — pure row-local string expressions,
    // fully codegen'd, zero shuffle.
    "url_canonicalize" -> QueryDef.withOracle(
      s"""WITH $canonSql
         |SELECT doc_id, url, canon_url FROM canon""".stripMargin) { (s, dir) =>
      canonical(s, dir).select(col("doc_id"), col("url"), col("canon_url"))
    },

    // ------------------------------------------------------------------
    // Per-domain corpus stats: registrable domain (last two host
    // labels) × lang → url counts, distinct canonical urls, dup rate.
    // One map-side-combined aggregation on a low-cardinality key.
    "url_domain_stats" -> QueryDef.withOracle(
      s"""WITH $canonSql
         |SELECT regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) AS domain, lang,
         |  CAST(count(*) AS BIGINT) AS n_urls,
         |  CAST(count(DISTINCT canon_url) AS BIGINT) AS n_unique,
         |  round(1.0 - count(DISTINCT canon_url) * 1.0 / count(*), 9) AS dup_rate
         |FROM canon GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      canonical(s, dir)
        .groupBy(regexp_extract(col("host"), "([^.]+\\.[^.]+)$", 1).as("domain"),
          col("lang"))
        .agg(count(lit(1)).as("n_urls"),
          countDistinct(col("canon_url")).as("n_unique"))
        .select(col("domain"), col("lang"), col("n_urls"), col("n_unique"),
          round(lit(1.0) - col("n_unique") * lit(1.0) / col("n_urls"), 9)
            .as("dup_rate"))
    },

    // ------------------------------------------------------------------
    // Canonical-URL dedup (the dedup_exact keep-first shape): docs
    // whose URLs canonicalize identically are one fetch — keep the
    // lowest doc_id. Window partitions by canon_url, bounded by dup
    // group size, never corpus-sized.
    "url_dedup" -> QueryDef.withOracle(
      s"""WITH $canonSql
         |SELECT doc_id, canon_url,
         |  min(doc_id) OVER (PARTITION BY canon_url) AS keep_id,
         |  CAST(count(*) OVER (PARTITION BY canon_url) AS BIGINT) AS n_copies,
         |  doc_id <> min(doc_id) OVER (PARTITION BY canon_url) AS is_dup
         |FROM canon""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("canon_url"))
      canonical(s, dir).select(
        col("doc_id"), col("canon_url"),
        min(col("doc_id")).over(w).as("keep_id"),
        count(lit(1)).over(w).as("n_copies"),
        (col("doc_id") =!= min(col("doc_id")).over(w)).as("is_dup"))
    }
  )
}
