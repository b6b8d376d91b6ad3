package graft

import org.apache.spark.sql.functions._
import graft.queries.Registry

/** q339 URL canonicalization: rules replayed JVM-side from first
  * principles, real collapse measured, and the all-expression plan shape
  * pinned (no object boundary anywhere — this op must stay inside
  * whole-stage codegen).
  */
class UrlOpsSuite extends SparkTestBase {

  private def messyOf(id: Long): String = {
    val u = id / 40
    val v = id / 20
    val scheme =
      if (u % 2 == 0) { if (v % 2 == 0) "HTTP" else "http" }
      else { if (v % 2 == 0) "HTTPS" else "https" }
    val host = if (v % 2 == 0) s"WWW.Example${u % 7}.COM"
    else s"example${u % 7}.com"
    val port = if (u % 2 == 0 && v % 4 == 0) ":80"
    else if (u % 2 == 1 && v % 4 == 2) ":443" else ""
    val slash = if (v % 5 == 0) "/" else ""
    val q = if (v % 2 == 0) s"?b=2&a=${u % 9}&utm_source=feed"
    else s"?a=${u % 9}&b=2"
    val frag = if (v % 3 == 0) s"#sec${v % 4}" else ""
    s"$scheme://$host$port/A/b/${u % 50}$slash$q$frag"
  }

  private def canonOf(id: Long): String = {
    val u = id / 40
    val scheme = if (u % 2 == 0) "http" else "https"
    s"$scheme://example${u % 7}.com/A/b/${u % 50}?a=${u % 9}&b=2"
  }

  test("q339 canonicalization replays the rule set; collapse is real; " +
    "plan is pure codegen") {
    val out = Registry.byName("q339_url_canonicalize").q(spark, sf)
    val rows = out.collect().map(r => r.getString(0) -> r).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val P = 2147483647L
    docs.groupBy(_._1).foreach { case (src, ds) =>
      val r = rows(src)
      assert(r.getLong(1) == ds.length.toLong, "n_urls")
      assert(r.getLong(2) == ds.map(d => canonOf(d._2)).distinct.length,
        s"$src n_unique from the first-principles canonical")
      assert(r.getLong(3) == ds.count(d => (d._2 / 20) % 3 == 0).toLong,
        "frag lane")
      assert(r.getLong(4) == ds.count { d =>
        val (u, v) = (d._2 / 40, d._2 / 20)
        (u % 2 == 0 && v % 4 == 0) || (u % 2 == 1 && v % 4 == 2)
      }.toLong,
        "port-strip lane (both carriers: http :80 AND https :443)")
      val dg = ds.map(d => canonOf(d._2)
        .foldLeft(0L)((a, c) => (a * 131L + c) % P)).sum % P
      assert(r.getLong(5) == dg, s"$src canonical digest")
    }
    // the dedup purpose: at this SF the canonical space is smaller than
    // the corpus, so the collapse must be genuine somewhere
    val totalUrls = rows.values.map(_.getLong(1)).sum
    val totalUnique = rows.values.map(_.getLong(2)).sum
    assert(totalUnique < totalUrls,
      "canonicalization must actually collapse spellings")
    // all-expression pin: no object boundary, one scan
    val plan = flattenPlan(out.queryExecution.executedPlan)
    assert(!plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.SerializeFromObjectExec]),
      "q339 must stay in codegen — no typed object boundary")
    assert(plan.count(
      _.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]) == 1)
    // assert the JVM messy-URL builder agrees with the REGISTERED
    // generator (same SQL string the query and oracle both use)
    val gen = Tables.documents(spark, sf)
      .filter(col("doc_id").isin(0L, 3L, 4L, 5L, 12L, 90L))
      .select(col("doc_id"),
        expr(graft.operators.UrlOps.messy("STRING", "div")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    gen.foreach { case (id, m) =>
      assert(m == messyOf(id), s"id=$id messy synthesis agreement")
    }
  }

  test("q342 eTLD+1: all four public-suffix rule kinds replayed from " +
    "first principles; exception collapse and case collapse are real") {
    val out = Registry.byName("q342_etld1_rollup").q(spark, sf)
    val rows = out.collect().map(r => r.getString(0) -> r).toMap
    // first-principles replay of BOTH the synthesis and the PSL algorithm
    def hostOf(id: Long): String = {
      val u = id / 2
      val sub = if (u % 3 == 0) "www." else if (u % 3 == 1) "a.b." else ""
      val sufx = (u % 7) match {
        case 0 => "com"; case 1 => "co.uk"; case 2 => "org"
        case 3 => "github.io"; case 4 => "blog.kawasaki.jp"
        case 5 => "city.kawasaki.jp"; case _ => "example"
      }
      val h0 = s"${sub}site${u % 4}.$sufx"
      if (id % 2 == 0) h0.toUpperCase else h0
    }
    val rules = Set("com", "org", "net", "uk", "co.uk", "ac.uk", "jp",
      "github.io", "io", "*.kawasaki.jp", "!city.kawasaki.jp")
    // (etld1, rule kind, subdomain depth below the registrable domain)
    def pslOf(host: String): (String, String, Boolean) = {
      val labels = host.toLowerCase.split('.')
      val n = labels.length
      def suf(k: Int) = labels.takeRight(k).mkString(".")
      def best(ks: Range, f: Int => Boolean) =
        ks.filter(k => k <= n && f(k)).maxOption.getOrElse(0)
      val exc = best(2 to 4, k => rules.contains("!" + suf(k)))
      val exact = best(1 to 4, k => rules.contains(suf(k)))
      val wild = best(2 to 4, k => rules.contains("*." + suf(k - 1)))
      val ps = if (exc > 0) exc - 1 else math.max(math.max(exact, wild), 1)
      val kind = if (exc > 0) "exception"
      else if (wild > exact) "wildcard"
      else if (exact > 0) "exact" else "default"
      (labels.takeRight(ps + 1).mkString("."), kind, n > ps + 1)
    }
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expected = docs.map { case (src, id) =>
      val h = hostOf(id)
      val (dom, kind, deep) = pslOf(h)
      (dom, kind, deep, h.toLowerCase, src)
    }
    val grouped = expected.groupBy(_._1)
    assert(rows.size == grouped.size, "one row per registrable domain")
    grouped.foreach { case (dom, ds) =>
      val r = rows(dom)
      assert(r.getLong(1) == ds.length.toLong, s"$dom n_pages")
      assert(r.getLong(2) == ds.map(_._4).distinct.length.toLong,
        s"$dom n_hosts (lowercased spellings counted once)")
      assert(r.getLong(3) == ds.map(_._5).distinct.length.toLong,
        s"$dom n_sources")
      assert(r.getString(4) == ds.head._2, s"$dom rule kind")
      assert(r.getLong(5) == ds.count(_._3).toLong, s"$dom n_deep")
    }
    // all four rule kinds must actually occur in the corpus
    val kinds = rows.values.map(_.getString(4)).toSet
    assert(kinds == Set("exact", "wildcard", "exception", "default"),
      s"rule-kind coverage, got $kinds")
    // the exception rule's signature behavior: every siteN.city.kawasaki.jp
    // host collapses into the ONE registrable domain city.kawasaki.jp
    assert(rows("city.kawasaki.jp").getLong(2) > 1,
      "exception collapse across distinct hosts")
    // pure-expression plan: no typed object boundary anywhere
    val plan = flattenPlan(out.queryExecution.executedPlan)
    assert(!plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.SerializeFromObjectExec]),
      "q342 must stay in codegen — no typed object boundary")
  }

  test("q344 robots: RFC 9309 longest-match with allow-tiebreak replayed " +
    "from first principles; carve-out and wildcard interactions") {
    val out = Registry.byName("q344_robots_politeness").q(spark, sf)
    val rows = out.collect().map(r => r.getString(0) -> r).toMap
    def pathOf(id: Long): String = {
      val u = id / 2
      val base = (u % 4) match {
        case 0 => "/public/p"; case 1 => "/private/x"
        case 2 => "/private/pub/y"; case _ => "/tmp/z"
      }
      base + (u % 20) + (if (id % 7 == 0) ".json" else "")
    }
    // the rule set, resolved from first principles: longest matching
    // pattern wins, allow wins ties, default allow
    def allowedOf(p: String): Boolean = {
      val allow = Seq("/private/pub/", "/").filter(p.startsWith).map(_.length)
      val dis = Seq("/private/", "/tmp").filter(p.startsWith).map(_.length) ++
        (if (p.endsWith(".json")) Seq("*.json".length) else Nil)
      allow.max >= (if (dis.isEmpty) -1 else dis.max)
    }
    // spot semantics: the carve-out under a disallowed subtree is
    // allowed; its .json variant STAYS allowed (13 beats 6); a public
    // .json is blocked (6 beats 1); plain private is blocked
    assert(allowedOf("/public/p3"))
    assert(!allowedOf("/public/p3.json"))
    assert(!allowedOf("/private/x1"))
    assert(allowedOf("/private/pub/y1"))
    assert(allowedOf("/private/pub/y1.json"))
    assert(!allowedOf("/tmp/z9"))
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val P = 2147483647L
    docs.groupBy(_._1).foreach { case (src, ds) =>
      val r = rows(src)
      val paths = ds.map(d => pathOf(d._2))
      assert(r.getLong(1) == paths.length.toLong, s"$src n_urls")
      assert(r.getLong(2) == paths.count(allowedOf).toLong, s"$src n_allowed")
      assert(r.getLong(3) == paths.count(!allowedOf(_)).toLong,
        s"$src n_blocked")
      assert(r.getLong(4) == paths.count(p =>
        !allowedOf(p) && p.endsWith(".json")).toLong, s"$src n_json_blocked")
      val dg = paths.filter(!allowedOf(_))
        .map(_.foldLeft(0L)((a, c) => (a * 131L + c) % P)).sum % P
      assert(r.getLong(5) == dg, s"$src blocked digest")
    }
    // both verdicts must occur, and the wildcard must really block
    assert(rows.values.map(_.getLong(3)).sum > 0, "some URLs blocked")
    assert(rows.values.map(_.getLong(4)).sum > 0, "wildcard lane exercised")
    val plan = flattenPlan(out.queryExecution.executedPlan)
    assert(!plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.SerializeFromObjectExec]),
      "q344 must stay in codegen — no typed object boundary")
  }
}
