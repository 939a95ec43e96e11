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
   * Anchor extraction: every `<a ... href="...">text</a>` in the html
   * bytes → one (href, anchor) row. Case-insensitive, attributes before
   * or after href tolerated (the common well-formed shapes); unquoted
   * hrefs and anchors containing nested tags are dropped quietly —
   * malformed-or-exotic markup degrades to missed edges, never to
   * failures, the right trade for link-graph construction at 10¹²
   * pages. Pure scan-local regexp (RE2-portable: no lookarounds, two
   * capture groups extracted by index) over the binary column cast to
   * string — no DOM. `carryCols` ride along on the single scan so
   * callers never re-join the pages table to recover their own columns.
   */
  private[graft] val AnchorRe =
    "(?i)<a\\s[^>]*href=\"([^\"]*)\"[^>]*>([^<]*)</a>"

  def extractLinks(pages: DataFrame, idCol: String, htmlCol: String,
                   carryCols: String*): DataFrame = {
    val s = col(htmlCol).cast("string")
    // ONE matcher pass per page emitting both capture groups
    // (graft.functions.RegexCapturePairs — same java.util.regex engine and
    // pattern as the former arrays_zip(regexp_extract_all(g1),
    // regexp_extract_all(g2)), which ran the anchor automaton over the
    // html twice; pair equality pinned in PropertySpec)
    pages.select(col(idCol) +: carryCols.map(col) :+
        explode(graft.functions.AnchorExprs.capturePairs(s, AnchorRe,
          "href", "anchor")).as("_l"): _*)
      .select(col(idCol) +: carryCols.map(col) :+
        col("_l").getField("href").as("href") :+
        col("_l").getField("anchor").as("anchor"): _*)
  }

  /**
   * Main-text extraction from html bytes — the canonical crawl→corpus
   * step (trafilatura/jusText reduced to its deterministic core):
   * script/style subtrees dropped, every remaining tag replaced by a
   * space (so adjacent text nodes never fuse), the five ubiquitous
   * entities decoded (`&amp;` LAST so `&amp;lt;` single-decodes, the
   * standard order), whitespace collapsed, ends trimmed. Pure codegen
   * regexp chain, RE2-portable (inline `(?s)` + non-greedy, no
   * lookaround) so the DuckDB oracle mirrors it verbatim. For wrapper
   * markup around a text body this is EXACTLY inverse to wrapping — the
   * north-rule "extracted text per url" invariant is assertable
   * byte-for-byte (q_html_text; ParseSpec in-pipeline gate).
   */
  def extractText(html: Column): Column = {
    val s = html.cast("string")
    val noScript = regexp_replace(s, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]+>", " ")
    val ent = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(noTags,
        "&nbsp;", " "), "&lt;", "<"), "&gt;", ">"), "&quot;", "\""),
      "&amp;", "&")
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /** Registrable host of an URL (scheme-relative tolerant), null if none. */
  def hostOf(url: Column): Column = {
    val h = regexp_extract(url, "^(?:https?://)?([^/:?#]+)", 1)
    when(h === "", null).otherwise(lower(h))
  }

  /**
   * Domain-level link graph from extracted anchors: distinct
   * (src_domain, dst_domain) edges with multiplicity, self-loops
   * dropped. ONE scan of the pages table (the source column rides the
   * extraction via `carryCols` — no self-join to recover it) + one
   * partial-agg shuffle on the edge key; the domain-domain edge list is
   * corpus-sublinear (Zipf hosts), which is what makes the downstream
   * graph aggregates broadcast-friendly.
   */
  def domainEdges(pages: DataFrame, srcCol: String, idCol: String,
                  htmlCol: String): DataFrame =
    extractLinks(pages, idCol, htmlCol, srcCol)
      .select(col(srcCol).as("src_domain"), hostOf(col("href")).as("dst_domain"))
      .filter(col("dst_domain").isNotNull &&
        col("dst_domain") =!= col("src_domain"))
      .groupBy(col("src_domain"), col("dst_domain"))
      .agg(count(lit(1)).as("n_links"))

  /**
   * Anchor-text index: for every target domain, the term counts of all
   * anchor texts pointing AT it — the classic off-page relevance signal
   * (anchors describe the target better than the target describes
   * itself; the reason link spam exists). Self-links excluded so a
   * site's own nav anchors don't vote. One scan (source rides the
   * extraction) + one (dst, term) partial-agg shuffle over the
   * (sublinear) extracted-anchor rows.
   */
  def anchorTextIndex(pages: DataFrame, srcCol: String, idCol: String,
                      htmlCol: String): DataFrame =
    extractLinks(pages, idCol, htmlCol, srcCol)
      .select(col(srcCol).as("src_domain"), hostOf(col("href")).as("dst_domain"),
        explode(array_remove(split(lower(col("anchor")), "\\W+"), ""))
          .as("term"))
      .filter(col("dst_domain").isNotNull &&
        col("dst_domain") =!= col("src_domain"))
      .groupBy(col("dst_domain"), col("term"))
      .agg(count(lit(1)).as("n"))

  /**
   * PageRank iterated to a fixed number of power steps from the uniform
   * start, unrounded between iterations (only the output is 4dp-rounded).
   * Same relational shape as [[pagerankStep]] per round; the edge table
   * with out-degrees and the domain universe are materialized ONCE
   * (`localCheckpoint` — the label-propagation lineage pattern,
   * [[Dedup.dedupClusters]]), and each round's rank table is checkpointed
   * so lineage stays constant-depth across iterations.
   *
   * DANGLING-MASS SEMANTICS (deliberate, inherited from [[pagerankStep]]
   * every round): a dangling domain (in-links but no out-links) receives
   * rank but redistributes none — its damped mass LEAKS each iteration
   * rather than being spread uniformly as in standard power iteration, so
   * on graphs with dangling domains the total rank mass shrinks toward
   * the teleport floor and iterated ranks sit systematically below the
   * mass-conserving formulation (WebGraphSpec pins both: conservation on
   * a dangling-free cycle, measured leak on a graph with a sink). This is
   * the "leaked PageRank" variant, cheaper by one aggregate-and-broadcast
   * per round. For a single round the difference is rank-order-neutral
   * (uniform redistribution adds the same constant to every node); over
   * multiple rounds the constant feeds back through the graph and
   * orderings can drift, so use a mass-conserving implementation when
   * absolute rank values — or deep-iteration orderings on dangling-heavy
   * graphs — are the product.
   */
  def pagerank(edges: DataFrame, iters: Int,
               damping: Double = 0.85): DataFrame = {
    val (withOut, doms) = rankStage(edges)
    pagerankLoop(withOut, doms, iters, damping)
  }

  /**
   * Stage the three tables every fixed-horizon rank loop reads each
   * round — the checkpointed edge table's out-weight join and the domain
   * universe (guide §2.4: the edge lineage is typically the HTML
   * link-extraction scan, which the derivative checkpoints would
   * otherwise each re-run; the edge table is sublinear in the corpus).
   * Factored out so [[spamMass]] stages them ONCE for both of its rank
   * chains instead of paying the three checkpoints per chain.
   */
  private def rankStage(edges: DataFrame): (DataFrame, DataFrame) = {
    val e = edges.localCheckpoint()
    val withOut = e
      .join(e.groupBy(col("src_domain"))
        .agg(sum(col("n_links")).as("outw")), Seq("src_domain"))
      .localCheckpoint()
    val doms = e.select(col("src_domain").as("domain"))
      .union(e.select(col("dst_domain").as("domain"))).distinct()
      .localCheckpoint()
    (withOut, doms)
  }

  private def pagerankLoop(withOut: DataFrame, doms: DataFrame, iters: Int,
                           damping: Double): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    var pr = doms.withColumn("pr", lit(1.0))
    for (i <- 1 to iters) {
      val inflow = withOut
        .join(pr.withColumnRenamed("domain", "src_domain"),
          Seq("src_domain"))
        .select(col("dst_domain").as("domain"),
          (col("pr") * col("n_links").cast("double") / col("outw")).as("c"))
        .groupBy(col("domain")).agg(sum(col("c")).as("inflow"))
      val next = doms.join(inflow, Seq("domain"), "left")
        .select(col("domain"),
          (lit(1.0 - damping) +
            lit(damping) * coalesce(col("inflow"), lit(0.0))).as("pr"))
      // constant-depth lineage between rounds; the LAST round stays lazy —
      // its table is consumed exactly once downstream, so a checkpoint
      // would materialize it only to read it back (one dead job)
      pr = if (i < iters) next.localCheckpoint() else next
    }
    pr.select(col("domain"), pround4(col("pr")).as("pr"))
  }

  /**
   * TrustRank to a fixed horizon (Gyöngyi, Garcia-Molina & Pedersen
   * 2004, "Combating Web Spam with TrustRank"): PageRank with the
   * teleport biased ENTIRELY onto a trusted seed set —
   * t₀ = s, t_{k+1} = (1−d)·s + d·M t_k with s uniform over seeds and
   * zero elsewhere. Trust reaches a domain only through a link path
   * from a seed, so spam clusters with no trusted in-path score exactly
   * 0 — the deliberate difference from [[pagerank]]'s uniform teleport
   * (which gives every domain the (1−d) floor). Same plan per round as
   * pagerank: one out-weight join (materialized once) + one dst-keyed
   * aggregate, per-round localCheckpoint; the seed set is a literal IN
   * list (seed sets are human-curated — hundreds, not millions).
   */
  def trustrank(edges: DataFrame, seeds: Seq[String], iters: Int,
                damping: Double = 0.85): DataFrame = {
    val (withOut, doms) = rankStage(edges)
    trustrankLoop(withOut, doms, seeds, iters, damping)
  }

  private def trustrankLoop(withOut: DataFrame, doms: DataFrame,
                            seeds: Seq[String], iters: Int,
                            damping: Double): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(seeds.nonEmpty, "TrustRank needs a non-empty seed set")
    val tele = when(col("domain").isin(seeds.map(x => x: Any): _*),
      lit(1.0 / seeds.size)).otherwise(lit(0.0))
    var tr = doms.withColumn("tr", tele)
    for (i <- 1 to iters) {
      val inflow = withOut
        .join(tr.withColumnRenamed("domain", "src_domain"),
          Seq("src_domain"))
        .select(col("dst_domain").as("domain"),
          (col("tr") * col("n_links").cast("double") / col("outw")).as("c"))
        .groupBy(col("domain")).agg(sum(col("c")).as("inflow"))
      val next = doms.join(inflow, Seq("domain"), "left")
        .select(col("domain"),
          (lit(1.0 - damping) * tele +
            lit(damping) * coalesce(col("inflow"), lit(0.0))).as("tr"))
      // last round lazy, consumed once (see pagerankLoop)
      tr = if (i < iters) next.localCheckpoint() else next
    }
    tr.select(col("domain"), pround4(col("tr")).as("tr"))
  }

  /**
   * Crawl-frontier prioritization — the composition a crawler's scheduler
   * actually runs, from pieces that are each oracle-pinned alone:
   * candidate URLs are the hrefs extracted from fetched pages
   * ([[extractLinks]]), already-fetched URLs are filtered through the
   * Bloom URL-seen sketch ([[Sketches.bloomBits]] — zero false negatives
   * means nothing fetched is ever re-queued; a false positive drops a
   * candidate, the crawl-safe direction), and the survivors are ranked
   * by the PageRank of their DESTINATION domain ([[pagerank]] — the
   * authority-first frontier ordering, the batch recast of OPIC/
   * priority-BFS scheduling).
   *
   * Plan: candidates and edges come from ONE pages scan each; the bloom
   * bit table is ≤ mBits rows (broadcast), the rank table is
   * domain-keyed (aggregate-scale, AQE-sized join); the final top-k is
   * TakeOrderedAndProject. Nothing corpus-scale shuffles more than once.
   */
  def frontierRank(pages: DataFrame, srcCol: String, idCol: String,
                   htmlCol: String, seenUrls: DataFrame, iters: Int = 3,
                   mBits: Int = 8192, kHashes: Int = 4,
                   topK: Int = 20): DataFrame =
    // ONE link-extraction scan feeds BOTH the rank edges and the candidate
    // URLs (the former shape ran the regexp extraction twice)
    frontierRankFromLinks(
      extractLinks(pages, idCol, htmlCol, srcCol).localCheckpoint(),
      srcCol, seenUrls, iters, mBits, kHashes, topK)

  /** [[frontierRank]] from an ALREADY-STAGED [[extractLinks]] table —
    * the seam for callers whose seen-set derivation reads the same
    * extraction (q_frontier): one staged scan feeds candidates, edges
    * AND the caller's seen set instead of re-running the anchor regex. */
  def frontierRankFromLinks(links: DataFrame, srcCol: String,
                            seenUrls: DataFrame, iters: Int = 3,
                            mBits: Int = 8192, kHashes: Int = 4,
                            topK: Int = 20): DataFrame = {
    val edges = links
      .select(col(srcCol).as("src_domain"), hostOf(col("href")).as("dst_domain"))
      .filter(col("dst_domain").isNotNull &&
        col("dst_domain") =!= col("src_domain"))
      .groupBy(col("src_domain"), col("dst_domain"))
      .agg(count(lit(1)).as("n_links"))
    val pr = pagerank(edges, iters)
    val cand = links
      .select(col("href").as("url"), hostOf(col("href")).as("domain"))
      .filter(col("domain").isNotNull)
      .distinct()
    val bits = Sketches.bloomBits(seenUrls, "url", mBits, kHashes)
    val unseen = Sketches.bloomProbe(bits, cand.select(col("url")), "url",
      mBits, kHashes)
      .filter(!col("maybe_seen")).select(col("url"))
    cand.join(unseen, Seq("url"))
      .join(pr, Seq("domain"))
      .select(col("url"), col("domain"), col("pr").as("priority"))
      .orderBy(col("priority").desc, col("url"))
      .limit(topK)
  }

  /**
   * Relative spam mass (Gyöngyi, Berkhin, Garcia-Molina & Pedersen 2006,
   * "Link Spam Detection Based on Mass Estimation", VLDB): the fraction
   * of a domain's PageRank that arrives through UNtrusted paths,
   * m = (PR − PR⁺)/PR, where PR⁺ is the rank earned when teleport lands
   * only on the trusted seeds. Here PR is [[pagerank]] (uniform teleport,
   * 1.0 per domain — total mass n) and PR⁺ = n · [[trustrank]] (seed
   * teleport totals 1.0, so the ×n rescale puts both vectors on the same
   * total teleport mass, the paper's core normalization). m → 1 means the
   * domain's rank is almost entirely spam-suspect; seeds themselves go
   * NEGATIVE (they hold more trusted than total rank under the leaked-PR
   * formulation) — the paper thresholds on m, this emits the raw value.
   *
   * Plan: both rank vectors are domain-keyed aggregate-scale tables
   * (never corpus-scale), so the composition is ONE AQE-sized join plus
   * scalar arithmetic; the domain count is a driver scalar (model-sized,
   * same seam as [[pagerankConserving]]'s nDoms). Inputs are the two
   * operators' published 4dp-rounded ranks, so the division composes
   * engine-portably — both engines divide the same doubles. PR ≥ (1−d)
   * everywhere under uniform teleport, so the denominator never vanishes.
   */
  def spamMass(edges: DataFrame, seeds: Seq[String], iters: Int,
               damping: Double = 0.85): DataFrame = {
    // ONE staged edge/out-weight/domain set feeds BOTH rank chains (each
    // public entry would otherwise pay its own three rankStage checkpoints
    // over the identical tables)
    val (withOut, doms) = rankStage(edges)
    val pr = pagerankLoop(withOut, doms, iters, damping)
    val tr = trustrankLoop(withOut, doms, seeds, iters, damping)
    // domain count — model-sized driver scalar; read from the staged
    // domain checkpoint (pr has exactly one row per domain)
    val nDoms = doms.count().toDouble
    pr.join(tr, Seq("domain"))
      .select(col("domain"), col("pr"), col("tr"),
        pround4((col("pr") - lit(nDoms) * col("tr")) / col("pr"))
          .as("spam_mass"))
  }

  /**
   * Mass-CONSERVING PageRank to a fixed horizon — the standard power
   * iteration [[pagerank]] deliberately is not: each round the damped
   * mass of DANGLING domains (in-links, no out-links) is summed (one
   * 1-row aggregate, broadcast) and redistributed uniformly across the
   * domain universe, so Σpr stays exactly n·1.0 through every round
   * (spec-pinned on a dangling graph). Costs one extra aggregate +
   * broadcast per round over the leaked variant; choose this one when
   * absolute rank values or deep-iteration orderings on dangling-heavy
   * graphs are the product. Same per-round checkpoint pattern.
   */
  def pagerankConserving(edges: DataFrame, iters: Int,
                         damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e = edges.localCheckpoint() // one extraction scan (see pagerank)
    val srcs = e.select(col("src_domain")).distinct()
    val doms = e.select(col("src_domain").as("domain"))
      .union(e.select(col("dst_domain").as("domain"))).distinct()
      .localCheckpoint()
    val withOut = e
      .join(e.groupBy(col("src_domain"))
        .agg(sum(col("n_links")).as("outw")), Seq("src_domain"))
      .localCheckpoint()
    val dangling = doms
      .join(srcs, doms("domain") === srcs("src_domain"), "left_anti")
      .localCheckpoint()
    val nDoms = doms.count().toDouble // model-sized driver scalar
    var pr = doms.withColumn("pr", lit(1.0))
    for (i <- 1 to iters) {
      val inflow = withOut
        .join(pr.withColumnRenamed("domain", "src_domain"),
          Seq("src_domain"))
        .select(col("dst_domain").as("domain"),
          (col("pr") * col("n_links").cast("double") / col("outw")).as("c"))
        .groupBy(col("domain")).agg(sum(col("c")).as("inflow"))
      // the round's dangling mass: one row, broadcast into the update
      val dm = pr.join(dangling, Seq("domain"), "left_semi")
        .agg(coalesce(sum(col("pr")), lit(0.0)).as("dmass"))
      val next = doms.join(inflow, Seq("domain"), "left")
        .crossJoin(broadcast(dm))
        .select(col("domain"),
          (lit(1.0 - damping) + lit(damping) *
            (coalesce(col("inflow"), lit(0.0)) + col("dmass") / nDoms)).as("pr"))
      // last round lazy, consumed once (see pagerankLoop)
      pr = if (i < iters) next.localCheckpoint() else next
    }
    pr.select(col("domain"), pround4(col("pr")).as("pr"))
  }

  /**
   * One PageRank power-iteration step over a domain edge list, from the
   * uniform start pr₀ = 1:
   *   pr₁(d) = (1−damping) + damping · Σ_{(s→d)} pr₀(s)·w(s→d)/out(s)
   * with w the edge multiplicity and out(s) = Σ_d w(s→d). Dangling
   * domains (no outlinks) receive the teleport term only — standard for
   * a single diagnostic iteration. Relational shape: out-degree is one
   * aggregate of the (already sublinear) edge table joined back on the
   * same key — NOT a forced broadcast: the domain table is ~10⁶ rows for
   * a curated corpus but can reach 10⁹ at full-crawl scale, so the
   * planner (AQE) picks broadcast vs shuffle from its measured size; the
   * contribution roll-up is ONE shuffle on dst. Iterating
   * to convergence is this same job in a loop with the label-propagation
   * checkpoint pattern ([[Dedup.dedupClusters]]); one step is what the
   * oracle can pin exactly.
   */
  /**
   * Robots-exclusion filtering (RFC 9309 subset): decide per page whether
   * the crawl may keep it, from a rules table (host, rule ∈
   * allow|disallow, path_prefix). Precedence follows the standard:
   * among the host's rules whose path_prefix prefixes the page's path,
   * the LONGEST prefix wins; a length tie resolves to allow; a page
   * whose host has no matching rule (or no rules at all) is allowed.
   * Subset scope — single '*' agent group, literal prefixes (no $ / *
   * wildcards) — documented divergence from full REP.
   *
   * Scale: rules are first aggregated to ONE array row per host (robots
   * files are KB-sized, so per-host rule lists are bounded by
   * construction), then ONE host-keyed join attaches them — the rules
   * table is host-count-scale, corpus-sublinear, AQE broadcasts it while
   * it fits — and the verdict fold runs ARRAY-LOCALLY inside the scan
   * (max over (plen, is_allow): associative+commutative, order-
   * independent). No per-page regroup, no second shuffle.
   *
   * Output: input columns + (host, path, matched_len, allowed);
   * matched_len = −1 when no rule matched.
   */
  def robotsFilter(pages: DataFrame, rules: DataFrame,
                   urlCol: String): DataFrame = {
    val hostRules = rules.groupBy(col("host"))
      .agg(collect_list(struct(
        length(col("path_prefix")).cast("long").as("plen"),
        col("path_prefix").as("pfx"),
        (col("rule") === "allow").as("is_allow"))).as("_rules"))
    // scheme-OPTIONAL, mirroring [[hostOf]]'s exact scheme scope
    // ("(?:https?://)?"): a scheme-less URL like "example.com/private/x"
    // must still yield "/private/x" — with a mandatory "//" it parsed to
    // "/" and silently bypassed every disallow rule (failed OPEN, the
    // wrong direction for a compliance filter). Non-http(s) schemes are
    // outside robots scope and outside hostOf's contract — keeping the
    // two regexes scope-identical means host and path always come from
    // the SAME parse of the URL.
    val rawPath = regexp_extract(col(urlCol),
      "^(?:https?://)?[^/?#]*([^?#]*)", 1)
    val zero = struct(lit(-1L).as("plen"), lit(true).as("is_allow"))
    pages
      .withColumn("host", hostOf(col(urlCol)))
      .withColumn("path", when(rawPath === "", "/").otherwise(rawPath))
      .join(hostRules, Seq("host"), "left")
      .withColumn("_v", when(col("_rules").isNull, zero)
        .otherwise(aggregate(
          filter(col("_rules"),
            r => startswith(col("path"), r.getField("pfx"))),
          zero,
          (acc, r) => when(
            r.getField("plen") > acc.getField("plen") ||
              (r.getField("plen") === acc.getField("plen") &&
                r.getField("is_allow")),
            struct(r.getField("plen").as("plen"),
              r.getField("is_allow").as("is_allow")))
            .otherwise(acc))))
      .withColumn("matched_len", col("_v.plen"))
      .withColumn("allowed", col("_v.is_allow"))
      .drop("_rules", "_v")
  }

  /**
   * One HITS update (Kleinberg 1999, "Authoritative Sources in a
   * Hyperlinked Environment") over the weighted domain edge list, from
   * the uniform h₀ = 1 init: authority a₁(d) = Σ_in n_links (the
   * in-weight under h₀ = 1), then hub h₁(s) = Σ_out n_links·a₁(dst) —
   * the standard a-then-h half-steps of one power iteration,
   * UNNORMALIZED (HITS rankings are scale-invariant; per-round
   * normalization is one 1-row aggregate if absolute values are wanted —
   * the pagerankConserving pattern). Iterate-to-convergence = this step
   * in the [[graft.operators.Dedup.dedupClusters]] checkpoint loop, like
   * [[pagerank]]. Exactness: all sums are integer-valued doubles (link
   * counts and their products), so results are order-independent.
   *
   * Plan: two keyed aggregates + one AQE-sized join, all on the
   * corpus-sublinear edge table. Output: (domain, auth, hub), 4dp.
   */
  def hitsStep(edges0: DataFrame): DataFrame = {
    // the edge table feeds FOUR plan branches (auth agg, hub join, both
    // domain-universe arms); its lineage is typically the HTML
    // link-extraction scan, which the unmaterialized diamond re-ran per
    // branch. LAZY persist (not localCheckpoint): the first branch's
    // stage populates the cache inside the consumer's own action — no
    // dedicated materialization job, which an A/B measured at ~+0.1 s
    // per query on these single-step diagnostics
    val edges = edges0.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val auth = edges.groupBy(col("dst_domain").as("domain"))
      .agg(sum(col("n_links")).cast("double").as("auth"))
    val hub = edges
      .join(auth.select(col("domain").as("dst_domain"), col("auth")),
        Seq("dst_domain"))
      .groupBy(col("src_domain").as("domain"))
      .agg(sum(col("n_links").cast("double") * col("auth")).as("hub"))
    val allDomains = edges.select(col("src_domain").as("domain"))
      .union(edges.select(col("dst_domain").as("domain"))).distinct()
    allDomains
      .join(auth, Seq("domain"), "left")
      .join(hub, Seq("domain"), "left")
      .select(col("domain"),
        pround4(coalesce(col("auth"), lit(0.0))).as("auth"),
        pround4(coalesce(col("hub"), lit(0.0))).as("hub"))
  }

  /**
   * Per-domain degree/weight table — the first graph-health diagnostic
   * of a crawl graph (degree distributions expose scraper loops, link
   * farms, and dead hubs before any ranking runs): out_deg/in_deg =
   * distinct neighbor counts (edge rows are already distinct pairs),
   * out_weight/in_weight = link-multiplicity sums. One aggregate per
   * direction + one AQE-sized full-outer join, all on the
   * corpus-sublinear edge table; integer-only output (cross-engine
   * exact).
   */
  def degreeTable(edges0: DataFrame): DataFrame = {
    // both direction aggregates read the same (typically
    // extraction-lineage) edge table — lazy persist, see hitsStep
    val edges = edges0.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val outd = edges.groupBy(col("src_domain").as("domain"))
      .agg(count(lit(1)).as("out_deg"), sum(col("n_links")).as("out_weight"))
    val ind = edges.groupBy(col("dst_domain").as("domain"))
      .agg(count(lit(1)).as("in_deg"), sum(col("n_links")).as("in_weight"))
    outd.join(ind, Seq("domain"), "full_outer")
      .select(col("domain"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("out_weight"), lit(0L)).as("out_weight"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        coalesce(col("in_weight"), lit(0L)).as("in_weight"))
  }

  def pagerankStep(edges0: DataFrame, damping: Double = 0.85): DataFrame = {
    // four plan branches over the same edge table — lazy persist, see
    // hitsStep
    val edges = edges0.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = edges.groupBy(col("src_domain"))
      .agg(sum(col("n_links")).as("outw"))
    val contrib = edges.join(out, Seq("src_domain"))
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
