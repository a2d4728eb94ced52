package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-level curation — the stage every web-scale corpus build runs
  * BEFORE touching document text (C4, RefinedWeb, Dolma all start
  * here): canonicalize the crawl URL, extract the registered domain,
  * and drop documents from blocked / opted-out domains. Reference
  * scope analog: the reference normalizes freeform slurm fields into
  * queryable columns (slurm2sql.py:330-520); this is the same
  * normalize-then-filter shape applied to the crawl-metadata column a
  * training pipeline carries.
  *
  * Everything here is MAP-ONLY column arithmetic over an
  * engine-portable regex subset (the [[TextOps.scrubPii]] rule):
  * no shuffle at any corpus size, and the DuckDB oracle replays the
  * exact same extractions. The blocklist filter is a literal `isin`
  * for list-sized sets and a broadcast anti join for table-sized ones
  * — the corpus itself never shuffles either way.
  */
object Web {

  /** Query params stripped by canonicalization: click-tracking noise
    * that makes one logical page look like many distinct URLs (the #1
    * cause of spurious URL-level "uniqueness" in crawls). */
  private val TRACKING_RE = "^(utm_[a-z0-9]+|fbclid|gclid|msclkid|ref|mc_cid|mc_eid)="

  /** Multi-part public suffixes where the registered domain is the
    * last THREE labels (public-suffix-list-lite — the handful of
    * country-code second-level registries that dominate real crawls;
    * a deployment swaps in the full PSL as a broadcast set, same
    * shape). */
  private val MULTI_SUFFIX_RE = "\\.(co|com|org|net|ac|gov|edu)\\.[a-z]{2}$"

  /** Lowercased host (no userinfo, no port) from a URL. */
  def host(url: Column): Column =
    lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)", 1))

  /** Registered domain ("site" identity for dedup rates, blocklists,
    * per-domain stats): last two host labels, or last three when the
    * host ends in a known multi-part suffix (`example.co.uk` →
    * `example.co.uk`, `a.b.example.com` → `example.com`). */
  def registeredDomain(url: Column): Column = {
    val h = host(url)
    val labels = split(h, "\\.")
    val n = size(labels)
    val take = when(h.rlike(MULTI_SUFFIX_RE), 3).otherwise(2)
    when(n <= take, h).otherwise(
      array_join(slice(labels, n - take + 1, take), "."))
  }

  /** Canonical URL: lowercase scheme and host, default ports dropped,
    * tracking query params removed (order of survivors preserved),
    * fragment dropped, empty path → "/", trailing slash trimmed off
    * non-root paths. Two crawls of the same logical page normalize to
    * byte-identical strings — the key exact URL-dedup groups on. */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val h = host(url)
    val port = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#:@]+:([0-9]+)", 1)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val rawPath = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = when(rawPath === "" || rawPath === "/", lit("/"))
      .otherwise(regexp_replace(rawPath, "/$", ""))
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val keptParams = filter(split(query, "&"),
      t => !(t.rlike(TRACKING_RE) || t === ""))
    concat(scheme, lit("://"), h,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(size(keptParams) > 0,
        concat(lit("?"), array_join(keptParams, "&"))).otherwise(lit("")))
  }

  /** Per-doc URL curation verdict: canonical URL, registered domain,
    * and whether the doc survives the domain blocklist. Map-only — the
    * blocklist is a literal set (the broadcast-join variant for
    * table-sized lists is [[filterBlockedTable]]). */
  def curateUrls(docs: DataFrame, url: Column, id: Column,
                 blockedDomains: Seq[String]): DataFrame =
    docs.select(id.as("doc_id"),
      canonicalUrl(url).as("canon_url"),
      registeredDomain(url).as("domain"),
      (!registeredDomain(url).isin(blockedDomains: _*)).as("kept"))

  /** Blocklist filter against a TABLE of blocked domains (opt-out
    * lists run to millions of rows): broadcast LEFT ANTI join on the
    * registered domain — the corpus never shuffles; only the
    * domain-sized list moves. */
  def filterBlockedTable(docs: DataFrame, url: Column,
                         blocked: DataFrame): DataFrame = {
    val b = blocked.select(col(blocked.columns.head).as("_blocked_domain"))
    docs.withColumn("_dom", registeredDomain(url))
      .join(broadcast(b), col("_dom") === col("_blocked_domain"), "left_anti")
      .drop("_dom")
  }
}
