package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-level corpus curation — the stage-1 filter of a web-scale
  * training pipeline (the C4 / RefinedWeb recipe: extract the
  * registered domain, drop blocklisted domains and structurally
  * suspicious URLs, cap the share any one domain contributes, and
  * report per-domain statistics for manual review).
  *
  * Everything here is a codegen'd projection (`parse_url`, `split`,
  * `regexp`) or a broadcast anti-join — no UDFs, no shuffles beyond
  * the ones the contract requires (the per-domain aggregation and the
  * cap's per-domain window). At 100 TB the flag columns cost one pass
  * over the URL strings; the blocklist is broadcast (domain lists are
  * thousands of rows, never corpus-sized).
  */
object UrlCuration {

  /** Lower-cased host of `url`, empty string when unparseable. */
  def host(url: Column): Column =
    lower(coalesce(parse_url(url, lit("HOST")), lit("")))

  /** Registered-domain HEURISTIC: strip a leading `www.`, then keep the
    * last two labels (`a.b.example.com` → `example.com`). This is the
    * standard approximation when no public-suffix list ships with the
    * job; pass the real PSL through `suffixes` to treat entries like
    * `co.uk` as suffixes and keep three labels for hosts under them.
    * IP-literal hosts are returned whole. */
  def registeredDomain(url: Column, suffixes: Seq[String] = Nil): Column = {
    val h = regexp_replace(host(url), "^www\\.", "")
    val parts = split(h, "\\.")
    val n = size(parts)
    val lastTwo = when(n <= 2, h)
      .otherwise(concat_ws(".", slice(parts, -2, 2)))
    val suffixed = suffixes.foldLeft(lastTwo)((acc, s) =>
      when(h.endsWith("." + s) || (h === s),
        when(n <= s.count(_ == '.') + 2, h)
          .otherwise(concat_ws(".", slice(parts, -(s.count(_ == '.') + 2),
            s.count(_ == '.') + 2))))
        .otherwise(acc))
    when(host(url).rlike("^\\d{1,3}(\\.\\d{1,3}){3}$"), host(url))
      .otherwise(suffixed)
  }

  /** Structural URL sanity flags, one boolean column each:
    * `url_ip_host` (IP-literal host), `url_bad_ext` (path ends in a
    * non-document extension), `url_long_query` (more than `maxParams`
    * `&`-separated parameters — session/tracking spam), `url_blocked_token`
    * (a blocklisted token appears in host or path). */
  def withUrlFlags(docs: DataFrame, urlCol: String,
                   badExtensions: Seq[String] =
                     Seq("exe", "zip", "gz", "tar", "dmg", "apk", "iso"),
                   blockedTokens: Seq[String] = Seq("casino", "viagra"),
                   maxParams: Int = 8): DataFrame = {
    // an empty alternation would turn the regexes into match-everything /
    // match-dot patterns — fail fast instead
    require(badExtensions.nonEmpty, "badExtensions must be non-empty")
    require(blockedTokens.nonEmpty, "blockedTokens must be non-empty")
    require(maxParams > 0, s"maxParams must be positive, got $maxParams")
    val u = col(urlCol)
    val path = lower(coalesce(parse_url(u, lit("PATH")), lit("")))
    val query = coalesce(parse_url(u, lit("QUERY")), lit(""))
    val extRe = "\\.(" + badExtensions.mkString("|") + ")$"
    val tokRe = "(" + blockedTokens.mkString("|") + ")"
    docs
      .withColumn("url_ip_host",
        host(u).rlike("^\\d{1,3}(\\.\\d{1,3}){3}$"))
      .withColumn("url_bad_ext", path.rlike(extRe))
      .withColumn("url_long_query",
        when(query === "", lit(0)).otherwise(size(split(query, "&"))) >
          maxParams)
      .withColumn("url_blocked_token",
        concat_ws("/", host(u), path).rlike(tokRe))
  }

  /** Drop rows whose registered domain appears in `blocked` (one
    * `domain` string column). Broadcast anti-join — the blocklist is
    * always the small side. */
  def dropBlockedDomains(docs: DataFrame, urlCol: String,
                         blocked: DataFrame): DataFrame =
    docs
      .withColumn("__dom", registeredDomain(col(urlCol)))
      .join(broadcast(blocked.select(lower(col("domain")).as("__dom"))
        .distinct()), Seq("__dom"), "left_anti")
      .drop("__dom")

  /** Per-domain report: doc count, mean of `scoreCol`, flagged-URL
    * count — the review table a curation run publishes. One shuffle. */
  def domainStats(docs: DataFrame, urlCol: String,
                  scoreCol: String): DataFrame = {
    val flagged = withUrlFlags(docs, urlCol)
    flagged
      .groupBy(registeredDomain(col(urlCol)).as("domain"))
      .agg(count(lit(1)).as("n_docs"),
        avg(col(scoreCol)).as("mean_score"),
        sum(when(col("url_ip_host") || col("url_bad_ext") ||
          col("url_long_query") || col("url_blocked_token"), 1L)
          .otherwise(0L)).as("n_flagged"))
  }

  /** Cap any one domain's contribution at `cap` docs (deterministic
    * hash order — [[Sampling.groupCap]] on the registered domain). */
  def capPerDomain(docs: DataFrame, urlCol: String, idCol: String,
                   cap: Int): DataFrame = {
    val withDom = docs.withColumn("__dom", registeredDomain(col(urlCol)))
    Sampling.groupCap(withDom, "__dom", idCol, cap).drop("__dom")
  }
}
