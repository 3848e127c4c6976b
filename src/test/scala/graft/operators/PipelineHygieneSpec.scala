package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.PiiFunctions

/** Specs for the r10 corpus-hygiene operators: decontamination, PII
  * redaction, sequence packing, repetition profiling and target-mix
  * resampling (q103–q107). */
class PipelineHygieneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("decontaminate: counts distinct shared grams, benchmark excluded") {
    import spark.implicits._
    val docs = Seq(
      // benchmark doc: grams "a b c d", "b c d e"
      (1L, "a b c d e", true),
      // shares both benchmark grams → n_overlap 2
      (2L, "x a b c d e y", false),
      // shares one ("a b c d") even though it appears twice → counted once
      (3L, "a b c d q a b c d", false),
      // no shared 4-gram
      (4L, "p q r s t u v", false),
      // too short for a 4-gram
      (5L, "a b c", false))
      .toDF("doc_id", "text", "bench")
    val out = Decontaminate.overlap(docs, $"doc_id", $"text", $"bench", n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(2L -> 2L, 3L -> 1L))
  }

  test("pii: counts and redaction for each class, clean text untouched") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail a.b+c@ex-ample.org or root@h.io, host 10.0.0.1, tel +31-555-0042"),
      (2L, "no pii here at all"))
      .toDF("doc_id", "text")
    val out = docs.select(col("doc_id") +: PiiFunctions.counts(col("text")) :+
        PiiFunctions.redact(col("text")).as("red"): _*)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Int]("n_email") == 2)
    assert(out(0).getAs[Int]("n_ipv4") == 1)
    assert(out(0).getAs[Int]("n_phone") == 1)
    assert(out(0).getAs[String]("red") ==
      "mail <EMAIL> or <EMAIL>, host <IP>, tel <PHONE>")
    assert(out(1).getAs[String]("red") == "no pii here at all")
    assert(out(1).getAs[Int]("n_email") + out(1).getAs[Int]("n_ipv4") +
      out(1).getAs[Int]("n_phone") == 0)
  }

  test("seq_pack: exclusive cumsum per shard, budget boundaries honored") {
    import spark.implicits._
    // one shard so the layout is a single deterministic stream
    val docs = Seq(
      (1L, "alpha beta gamma"),        // 3 toks, start 0
      (2L, ("w " * 6).trim),           // 6 toks, start 3
      (3L, "x y z"),                   // 3 toks, start 9 → next seq
      (4L, "q"))                       // 1 tok, start 12
      .toDF("doc_id", "text")
    val out = SeqPack.pack(docs, $"doc_id", $"text", seqLen = 8, nShards = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("n_tok"), r.getAs[Long]("seq_id"),
        r.getAs[Long]("seq_off")))
    assert(out.toSeq == Seq((3L, 0L, 0L), (6L, 0L, 3L), (3L, 1L, 1L),
      (1L, 1L, 4L)))
    // sharding: every shard in range, deterministic across runs
    val many = (0 until 500).map(i => (i.toLong, "a b c")).toDF("doc_id", "text")
    val shards = SeqPack.pack(many, $"doc_id", $"text", 8, 4)
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(shards.forall { case (_, s) => s >= 0 && s < 4 })
    assert(shards.map(_._2).distinct.length == 4, "all shards populated")
  }

  test("repetition: dup-token and top-bigram fractions") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam"),     // 4 toks, 1 distinct; bigram "spam spam" 3/3
      (2L, "a b c d"),                 // all distinct, every bigram unique
      (3L, "one"))                     // single token: no bigram
      .toDF("doc_id", "text")
    val out = CorpusFilter.repetitionProfile(docs, $"doc_id", $"text")
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Double]("dup_frac"), r.getAs[Double]("top_bigram_frac")))
    assert(out(0) == ((0.75, 1.0)))
    assert(out(1) == ((0.0, 0.3333)))
    assert(out(2) == ((0.0, 0.0)))
  }

  test("mix: water-fills to the rarest stratum, untargeted stratum dropped") {
    import spark.implicits._
    val docs = ((0 until 600).map(i => (i.toLong, "en")) ++
      (600 until 800).map(i => (i.toLong, "de")) ++
      (800 until 850).map(i => (i.toLong, "xx"))).toDF("doc_id", "lang")
    val out = CorpusFilter.mixToTarget(docs, $"doc_id", $"lang",
        Map("en" -> 0.5, "de" -> 0.5))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // N = min(600/0.5, 200/0.5) = 400 → 200 per lang target
    assert(out("de")._1 == 200L)
    assert(out("en")._1 == 600L)
    assert(out("xx") == ((50L, 0L)), "untargeted stratum: rate 0")
    // de is the binding stratum: rate 1 keeps everything
    assert(out("de")._2 == 200L)
    // en rate = 200/600: hash sampling lands near the target
    assert(out("en")._2 > 140L && out("en")._2 < 260L, s"got ${out("en")._2}")
    // deterministic
    val again = CorpusFilter.mixToTarget(docs, $"doc_id", $"lang",
      Map("en" -> 0.5, "de" -> 0.5)).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(again("en") == out("en")._2)
  }

  test("mix: target stratum absent from the corpus ⇒ N = 0, nothing kept") {
    import spark.implicits._
    // the r10 advice bug: {en:0.5, fr:0.5} with zero fr docs must NOT
    // silently produce a 100% en mix — fr has avail 0, so N = 0
    val docs = (0 until 600).map(i => (i.toLong, "en")).toDF("doc_id", "lang")
    val out = CorpusFilter.mixToTarget(docs, $"doc_id", $"lang",
        Map("en" -> 0.5, "fr" -> 0.5))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("en", 600L, 0L)))
  }

  test("dsir: hashed-unigram importance weights match an independent derivation") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "cat dog", true),       // the target "domain"
      (2L, "cat cat fish", false), // cat-heavy → most target-like
      (3L, "dog dog dog", false),
      (4L, "fish", false))
    val (bkts, a) = (8, 0.5)
    // independent re-derivation: MessageDigest md5 + plain collections
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    val toks = fixture.flatMap { case (id, t, tg) =>
      t.split(" ").map(tok => (id, tg, h32(tok) % bkts))
    }
    val ct = toks.filter(_._2).groupBy(_._3).view.mapValues(_.size).toMap
    val cs = toks.filterNot(_._2).groupBy(_._3).view.mapValues(_.size).toMap
    val nt = toks.count(_._2).toDouble
    val ns = toks.size - nt
    val c0 = math.log(ns + a * bkts) - math.log(nt + a * bkts)
    val want = toks.filterNot(_._2).groupBy(_._1).map { case (id, ts) =>
      val s = ts.map { case (_, _, b) =>
        math.log(ct.getOrElse(b, 0) + a) - math.log(cs.getOrElse(b, 0) + a)
      }.sum
      id -> math.rint((s + ts.size * c0) * 10000) / 10000
    }
    val docs = fixture.toDF("doc_id", "text", "is_t")
    val got = CorpusFilter.dsirWeights(docs, $"doc_id", $"text", $"is_t",
        buckets = bkts, alpha = a)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getBoolean(3)))).toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (id, w) =>
      assert(got(id)._1 === w, s"doc $id")
      assert(got(id)._2 === (w > 0.0), s"doc $id kept")
    }
    // the cat-heavy doc must out-weigh the others (cat is 1/2 the
    // target stream, dog the other half, fish absent from it)
    assert(got(2L)._1 > got(4L)._1 && got(3L)._1 > got(4L)._1)
  }

  test("pii: phone shapes beyond the +CC-NNN fixture; digit runs untouched") {
    import spark.implicits._
    val docs = Seq(
      (1L, "tel +31-555-0042 ok"),              // the original fixture form
      (2L, "us style 555-123-4567 end"),        // local, dash-separated
      (3L, "dotted +1.555.0100 intl"),          // dot separators
      (4L, "area (020) 1234 5678 uk"),          // parenthesized area code
      (5L, "call 555-123-4567 or +1.555.0100"), // two matches in one doc
      (6L, "year 2026 zip 90210 id 1234567"),   // bare digit runs: NOT phones
      (7L, "meeting 2026-08-15 at noon"))       // ISO date: NOT a phone
      .toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        regexp_count(col("text"), lit(PiiFunctions.patterns
          .find(_._1 == "phone").get._2)).as("n"),
        PiiFunctions.redact(col("text")).as("red"))
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Int]("n")).toSeq === Seq(1, 1, 1, 1, 2, 0, 0))
    assert(out(0).getAs[String]("red") === "tel <PHONE> ok")
    assert(out(1).getAs[String]("red") === "us style <PHONE> end")
    assert(out(2).getAs[String]("red") === "dotted <PHONE> intl")
    assert(out(3).getAs[String]("red") === "area <PHONE> uk")
    assert(out(4).getAs[String]("red") === "call <PHONE> or <PHONE>")
    assert(out(5).getAs[String]("red") === "year 2026 zip 90210 id 1234567")
    assert(out(6).getAs[String]("red") === "meeting 2026-08-15 at noon")
  }
}
