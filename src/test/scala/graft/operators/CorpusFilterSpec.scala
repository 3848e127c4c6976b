package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class CorpusFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("withAttribution: each rule fires on its own pathology") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs home"),
      (2L, "a b"),                                     // too few tokens
      (3L, "the " + "supercalifragilisticexpialidocious " * 20 + "of and"),
      (4L, ("1234 5678 " * 20) + "the of and is"),     // low alpha ratio
      (5L, "zzz qqq xxx vvv kkk www yyy mmm nnn ppp")) // no stopwords
      .toDF("doc_id", "text")
    val out = CorpusFilter.withAttribution(docs, $"doc_id", $"text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Boolean]("keep"))
    assert(out(0).getAs[String]("fail_reasons") == "")
    assert(!out(1).getAs[Boolean]("r_len"))
    assert(out(1).getAs[String]("fail_reasons").contains("len"))
    assert(!out(2).getAs[Boolean]("r_mean_token_len"))
    assert(!out(3).getAs[Boolean]("r_alpha_ratio"))
    assert(!out(4).getAs[Boolean]("r_stopwords"))
    assert(out.count(_.getAs[Boolean]("keep")) == 1)
  }

  test("sampleStratified: deterministic, per-stratum rates, reproducible") {
    import spark.implicits._
    val docs = (0 until 2000).map(i =>
      (i.toLong, if (i % 2 == 0) "en" else "zz")).toDF("doc_id", "lang")
    val frac = Map("en" -> 0.5)
    val s1 = CorpusFilter.sampleStratified(docs, $"doc_id", $"lang", frac, 0.05)
      .collect().map(_.getLong(0)).toSet
    val s2 = CorpusFilter.sampleStratified(docs, $"doc_id", $"lang", frac, 0.05)
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "same input → same sample, no RNG")
    val en = s1.count(_ % 2 == 0); val zz = s1.size - en
    // 1000 docs per stratum: rates within generous binomial bounds
    assert(en > 400 && en < 600, s"en rate ~0.5, got $en/1000")
    assert(zz > 10 && zz < 110, s"zz rate ~0.05, got $zz/1000")
    // fraction 0 and 1 are exact
    val none = CorpusFilter.sampleStratified(docs, $"doc_id", $"lang",
      Map("en" -> 0.0, "zz" -> 0.0), 0.0).count()
    val all = CorpusFilter.sampleStratified(docs, $"doc_id", $"lang",
      Map("en" -> 1.0, "zz" -> 1.0), 1.0).count()
    assert(none == 0 && all == 2000)
  }
}
