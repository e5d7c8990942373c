package graft

import org.apache.spark.sql.functions._

import graft.operators.Domains

/** Domain extraction + per-domain governance contracts (C114/C115). */
class DomainsSpec extends SparkSpec {

  import spark.implicits._

  private def hostOf(url: String): String =
    Seq(url).toDF("u").select(Domains.host(col("u"))).head.getString(0)

  private def regOf(host: String): String =
    Seq(host).toDF("h").select(Domains.registrable(col("h")))
      .head.getString(0)

  test("host extraction: scheme, userinfo, port, path, case, garbage") {
    assert(hostOf("https://www.Example.COM/p/1") === "www.example.com")
    assert(hostOf("http://user:pw@a.b.org:8080/x?q=1#f") === "a.b.org")
    assert(hostOf("ftp+ssh://HOST.NET") === "host.net")
    assert(hostOf("https://no-path.de") === "no-path.de")
    // schemeless / garbage rows surface as '' (quarantine), never throw
    assert(hostOf("www.example.com/p/1") === "")
    assert(hostOf("not a url at all") === "")
  }

  test("registrable domain: 2-label rule + multi-part suffix ladder") {
    assert(regOf("www.foo.example.com") === "example.com")
    assert(regOf("example.com") === "example.com")
    assert(regOf("deep.a.b.site9.co.uk") === "site9.co.uk")
    assert(regOf("bare") === "bare")
    assert(regOf("a.gov.uk") === "a.gov.uk")
  }

  test("PSL snapshot: multi-part suffixes, wildcards, exceptions") {
    // exact multi-part rules across registries
    assert(regOf("shop.example.com.au") === "example.com.au")
    assert(regOf("x.y.example.co.uk") === "example.co.uk")
    assert(regOf("www.example.go.jp") === "example.go.jp")
    assert(regOf("a.b.example.com.br") === "example.com.br")
    // wildcard rule *.ck: every 2nd-level label is a registry
    assert(regOf("shop.pref.ck") === "shop.pref.ck")
    assert(regOf("deep.shop.pref.ck") === "shop.pref.ck")
    // ...except the ! exception: www.ck IS a registrable domain
    assert(regOf("www.ck") === "www.ck")
    assert(regOf("a.www.ck") === "www.ck")
    // geographic jp wildcard + its city exception
    assert(regOf("a.b.kawasaki.jp") === "a.b.kawasaki.jp")
    assert(regOf("sub.city.kawasaki.jp") === "city.kawasaki.jp")
    // private-section platform entries: subdomains are distinct sites
    assert(regOf("alice.github.io") === "alice.github.io")
    assert(regOf("a.blog.blogspot.com") === "blog.blogspot.com")
    // a host that IS a public suffix comes back whole, never ''
    assert(regOf("co.uk") === "co.uk")
    // no snapshot rule → the registry-class ladder fallback
    assert(regOf("x.example.co.zz") === "example.co.zz")
    assert(regOf("x.example.zz") === "example.zz")
  }

  test("canonical URL: case, ports, fragments, tracking params, slashes") {
    def canon(u: String): String =
      Seq(u).toDF("u").select(Domains.canonicalUrl(col("u")))
        .head.getString(0)
    assert(canon("https://Ex.COM/Path") === "https://ex.com/Path") // path case kept
    assert(canon("https://ex.com:443/p") === "https://ex.com/p")
    assert(canon("http://ex.com:80/p") === "http://ex.com/p")
    assert(canon("https://ex.com:8443/p") === "https://ex.com:8443/p") // non-default kept
    assert(canon("https://ex.com/p?utm_source=x&id=9") === "https://ex.com/p?id=9")
    assert(canon("https://ex.com/p?id=9&utm_campaign=y") === "https://ex.com/p?id=9")
    assert(canon("https://ex.com/p?utm_a=1&gclid=2") === "https://ex.com/p")
    assert(canon("https://ex.com/p#frag") === "https://ex.com/p")
    assert(canon("https://ex.com/p/") === "https://ex.com/p")
    assert(canon("https://ex.com/") === "https://ex.com")
    assert(canon("https://ex.com/p?keep=1#frag") === "https://ex.com/p?keep=1")
    // tracking-param strip is anchored on its ?/& separator: legitimate
    // params that merely EMBED a tracking name survive intact
    assert(canon("https://ex.com/p?myutm_x=1") === "https://ex.com/p?myutm_x=1")
    assert(canon("https://ex.com/p?xgclid=5") === "https://ex.com/p?xgclid=5")
    assert(canon("https://ex.com/p?a=1&utm_x=2&b=3") === "https://ex.com/p?a=1&b=3")
    assert(canon("https://ex.com/p?utm_a=1&utm_b=2&keep=3") === "https://ex.com/p?keep=3")
  }

  test("distinct-host forms ≡ scan-local forms: reportByHost/capByHost " +
    "return exactly report/cap (PSL on |hosts|, not |rows|)") {
    val docs = Tables.documents(spark, sfDir)
    val url = Domains.synthesizeUrl(col("doc_id"), col("source"))
    val blocked = Seq("site3.com", "site7.co.uk").toDF("domain")
    val a = Domains.report(docs, url, col("text"), col("n_chars"), blocked)
    val b = Domains.reportByHost(docs, url, col("text"), col("n_chars"),
      blocked)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
    assert(a.count() > 0)
    val c = Domains.cap(docs, url, col("doc_id"), k = 5)
      .select("domain", "doc_id", "rnk")
    val d = Domains.capByHost(docs, url, col("doc_id"), k = 5)
      .select("domain", "doc_id", "rnk")
    assert(c.exceptAll(d).count() === 0 && d.exceptAll(c).count() === 0)
    assert(c.count() > 0)
  }

  test("report blocklist is a broadcast anti-join; cap uses a window group limit") {
    val docs = Tables.documents(spark, sfDir)
    val url = Domains.synthesizeUrl(col("doc_id"), col("source"))
    val rep = Domains.report(docs, url, col("text"), col("n_chars"),
      Seq("site3.com").toDF("domain"))
    val repPlan = rep.queryExecution.executedPlan.toString
    assert(repPlan.contains("BroadcastHashJoin") &&
      repPlan.contains("LeftAnti"), s"blocklist must broadcast:\n$repPlan")
    val capped = Domains.cap(docs, url, col("doc_id"), k = 5)
    val capPlan = capped.queryExecution.executedPlan.toString
    assert(capPlan.contains("WindowGroupLimit"),
      s"cap must run as a partial window group limit:\n$capPlan")
    // the cap actually binds and never exceeds k per domain
    val over = capped.groupBy("domain").count().where(col("count") > 5)
    assert(over.count() === 0L)
  }
}
