package graft

import org.apache.spark.sql.functions._

import graft.operators.Sample
import graft.text.UrlOps

class UrlOpsSpec extends GraftSuite {
  import spark.implicits._

  private def one(url: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String =
    Seq(url).toDF("u").select(c(col("u")).as("r")).head().getString(0)

  test("host: strips scheme case, userinfo, port; empty for non-URLs") {
    assert(one("HTTPS://User:pw@WWW.Example.COM:8443/a?b#c", UrlOps.host) === "www.example.com")
    assert(one("http://sub.domain.co.uk/path", UrlOps.host) === "sub.domain.co.uk")
    assert(one("ftp+ssh://h9.x.io", UrlOps.host) === "h9.x.io")
    assert(one("not a url", UrlOps.host) === "")
  }

  test("registeredDomain: two labels, two-part suffixes, short hosts") {
    def rd(h: String) = Seq(h).toDF("h")
      .select(UrlOps.registeredDomain(col("h")).as("r")).head().getString(0)
    assert(rd("www.example.com") === "example.com")
    assert(rd("a.b.deep.example.org") === "example.org")
    assert(rd("sub.domain.co.uk") === "domain.co.uk")
    assert(rd("news.site.com.au") === "site.com.au")
    assert(rd("example.com") === "example.com")
    assert(rd("localhost") === "localhost")
  }

  test("normalize: lowers scheme+authority, strips fragment and trackers") {
    assert(one("HTTP://Ex.COM/Path/Up?utm_source=x&id=3&fbclid=z#frag", UrlOps.normalize)
      === "http://ex.com/Path/Up?id=3")
    // all params tracked -> query dropped entirely
    assert(one("http://a.io/p?utm_campaign=c&gclid", UrlOps.normalize) === "http://a.io/p")
    // param order and case of survivors preserved
    assert(one("http://a.io/?B=2&a=1", UrlOps.normalize) === "http://a.io/?B=2&a=1")
    // fragment-only URL, port kept
    assert(one("https://A.io:8080/x#y", UrlOps.normalize) === "https://a.io:8080/x")
    // non-URL passes through untouched
    assert(one("plain text", UrlOps.normalize) === "plain text")
  }

  test("filterBlocked drops exactly the blocklisted registered domains") {
    val df = Seq(
      (1L, "http://www.bad.com/x"),
      (2L, "http://ok.org/y"),
      (3L, "http://sub.bad.com:80/z"),
      (4L, "http://bad.com.au/w")).toDF("id", "url")
    val kept = UrlOps.filterBlocked(df, "url", Seq("bad.com").toDF("d"))
      .select("id").as[Long].collect().toSet
    assert(kept === Set(2L, 4L))
  }

  test("topFractionPerGroup: exact quotas, highest scores, naive parity") {
    val df = spark.range(0, 1000).select(
      (col("id") % 4).as("g"),
      col("id").as("id"),
      ((col("id") * 37 % 101)).cast("double").as("s"))
    val got = Sample.topFractionPerGroup(df, "g", "id", col("s"), 0.3)
    // quota: ceil(0.3 * 250) = 75 per group
    val counts = got.groupBy("g").count().as[(Long, Long)].collect().toMap
    assert(counts.values.toSet === Set(75L))
    // parity with the naive whole-row window
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("s").desc, col("id").asc)
    val naive = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 75).drop("rn")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
    // frac edges
    assert(Sample.topFractionPerGroup(df, "g", "id", col("s"), 0.0).count() === 0)
    assert(Sample.topFractionPerGroup(df, "g", "id", col("s"), 1.0).count() === 1000)
  }
}
