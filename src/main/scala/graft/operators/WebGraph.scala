package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis.pround4

/**
 * Web-graph operators over the pages table's raw `html` column — link
 * extraction, link-graph degree stats, and a PageRank power-iteration
 * step. This is the crawl-side counterpart of the text-curation surface:
 * the reference parses log text into structured fields
 * (`LogProcessorService.java:150-210`); here the same vectorized-regex
 * parse idea is applied to markup, and the extracted edges feed plain
 * relational graph aggregates. No graph framework — at web scale the
 * edge list IS a table and every step below is one bounded shuffle.
 */
object WebGraph {

  /**
   * Anchor extraction: every `<a href="...">text</a>` in the html bytes
   * → one (href, anchor) row. Pure scan-local regexp (RE2-portable: no
   * lookarounds, two capture groups extracted by index) over the binary
   * column cast to string — the vectorized parse path; no DOM, which is
   * exactly the right trade for link-graph construction at 10¹² pages
   * (malformed markup degrades to missed edges, never to failures).
   */
  def extractLinks(pages: DataFrame, idCol: String,
                   htmlCol: String): DataFrame = {
    val s = col(htmlCol).cast("string")
    val re = "<a href=\"([^\"]*)\"[^>]*>([^<]*)</a>"
    pages.select(col(idCol),
        arrays_zip(regexp_extract_all(s, lit(re), lit(1)),
          regexp_extract_all(s, lit(re), lit(2))).as("_z"))
      .select(col(idCol), explode(col("_z")).as("_l"))
      .select(col(idCol), col("_l").getField("0").as("href"),
        col("_l").getField("1").as("anchor"))
  }

  /** Registrable host of an URL (scheme-relative tolerant), null if none. */
  def hostOf(url: Column): Column = {
    val h = regexp_extract(url, "^(?:https?://)?([^/:?#]+)", 1)
    when(h === "", null).otherwise(lower(h))
  }

  /**
   * Domain-level link graph from extracted anchors: distinct
   * (src_domain, dst_domain) edges with multiplicity, self-loops
   * dropped. One partial-agg shuffle on the edge key; the domain-domain
   * edge list is corpus-sublinear (Zipf hosts), which is what makes the
   * downstream graph aggregates broadcast-friendly.
   */
  def domainEdges(pages: DataFrame, srcCol: String, idCol: String,
                  htmlCol: String): DataFrame =
    extractLinks(pages, idCol, htmlCol)
      .join(pages.select(col(idCol), col(srcCol).as("src_domain")), idCol)
      .select(col("src_domain"), hostOf(col("href")).as("dst_domain"))
      .filter(col("dst_domain").isNotNull &&
        col("dst_domain") =!= col("src_domain"))
      .groupBy(col("src_domain"), col("dst_domain"))
      .agg(count(lit(1)).as("n_links"))

  /**
   * One PageRank power-iteration step over a domain edge list, from the
   * uniform start pr₀ = 1:
   *   pr₁(d) = (1−damping) + damping · Σ_{(s→d)} pr₀(s)·w(s→d)/out(s)
   * with w the edge multiplicity and out(s) = Σ_d w(s→d). Dangling
   * domains (no outlinks) receive the teleport term only — standard for
   * a single diagnostic iteration. Relational shape: out-degree is one
   * aggregate of the (already sublinear) edge table, joined back
   * BROADCAST; the contribution roll-up is ONE shuffle on dst. Iterating
   * to convergence is this same job in a loop with the label-propagation
   * checkpoint pattern ([[Dedup.dedupClusters]]); one step is what the
   * oracle can pin exactly.
   */
  def pagerankStep(edges: DataFrame, damping: Double = 0.85): DataFrame = {
    val out = edges.groupBy(col("src_domain"))
      .agg(sum(col("n_links")).as("outw"))
    val contrib = edges.join(broadcast(out), Seq("src_domain"))
      .select(col("dst_domain"),
        (col("n_links").cast("double") / col("outw")).as("c"))
    val allDomains = edges.select(col("src_domain").as("domain"))
      .union(edges.select(col("dst_domain").as("domain"))).distinct()
    allDomains.join(
        contrib.groupBy(col("dst_domain").as("domain"))
          .agg(sum(col("c")).as("inflow")),
        Seq("domain"), "left")
      .select(col("domain"),
        pround4(lit(1.0 - damping) +
          lit(damping) * coalesce(col("inflow"), lit(0.0))).as("pr"))
  }
}
