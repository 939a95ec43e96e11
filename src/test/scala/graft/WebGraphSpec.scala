package graft

import org.apache.spark.sql.functions._
import graft.operators.WebGraph

class WebGraphSpec extends SparkSuite {
  import spark.implicits._

  private def pages(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "h")
      .select($"doc_id", $"source", $"h".cast("binary").as("html"))

  test("link extraction: multiple anchors, attributes tolerated, malformed " +
    "markup degrades to missed edges (never failure), binary input") {
    val p = pages(
      (1L, "a.com",
        """<html><a href="http://x.com/p">one</a> mid """ +
          """<a href="https://y.com/q" rel="nofollow">two</a></html>"""),
      (2L, "b.com", """<a href="http://z.com">z!</a><a href="broken>no</a>"""),
      (3L, "c.com", "no anchors at all"))
    val got = WebGraph.extractLinks(p, "doc_id", "html")
      .as[(Long, String, String)].collect().toSet
    assert(got == Set(
      (1L, "http://x.com/p", "one"),
      (1L, "https://y.com/q", "two"),
      (2L, "http://z.com", "z!")),
      "attribute-bearing anchor matched; quote-less href skipped quietly")
  }

  test("domain edges: host lowered, self-loops dropped, multiplicity " +
    "counted, host-less hrefs dropped") {
    val p = pages(
      (1L, "a.com",
        """<a href="http://B.com/1">x</a><a href="http://b.com/2">y</a>""" +
          """<a href="http://a.com/self">self</a><a href="">empty</a>"""),
      (2L, "a.com", """<a href="http://c.com">z</a>"""))
    val got = WebGraph.domainEdges(p, "source", "doc_id", "html")
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a.com", "b.com", 2L), ("a.com", "c.com", 1L)))
  }

  test("pagerank step: hand-computed values, dangling node gets teleport " +
    "only, mass conservation") {
    // A->B, A->C, B->C; C dangling
    val edges = Seq(("A", "B", 1L), ("A", "C", 1L), ("B", "C", 1L))
      .toDF("src_domain", "dst_domain", "n_links")
    val pr = WebGraph.pagerankStep(edges).as[(String, Double)].collect().toMap
    val p4 = (x: Double) => math.floor(x * 10000 + 0.5) / 10000
    assert(pr("A") == p4(0.15))
    assert(pr("B") == p4(0.15 + 0.85 * 0.5))
    assert(pr("C") == p4(0.15 + 0.85 * 1.5))
    // conservation: teleport 3*0.15 + damped distributed mass 2*0.85
    assert(math.abs(pr.values.sum - (0.45 + 1.7)) < 1e-3)
  }

  test("plan: extraction is scan-local; pagerank joins out-degree " +
    "broadcast — no sort-merge join anywhere") {
    val p = pages((1L, "a.com", """<a href="http://b.com">x</a>"""))
    val ex = WebGraph.extractLinks(p, "doc_id", "html")
      .queryExecution.executedPlan.toString
    assert(!ex.contains("Exchange"), ex)
    val edges = Seq(("A", "B", 1L)).toDF("src_domain", "dst_domain", "n_links")
    val pp = WebGraph.pagerankStep(edges)
      .queryExecution.executedPlan.toString
    assert(pp.contains("BroadcastHashJoin"), pp)
    assert(!pp.contains("SortMergeJoin"), pp)
  }
}
