package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.CorpusFilter

/** Semantics pins for the r10 q106 native: [[RepetitionStats]] (the
  * one-pass map-only scan) must produce exactly the rows of the
  * declarative explode-and-aggregate chain — the definition the DuckDB
  * oracle twin states — on edge texts, random token soups, and in both
  * codegen and interpreted execution. */
class RepetitionStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val edgeTexts = Seq(
    "",                                        // split("", " ") = [""]
    "   ",                                     // all-space = one empty token
    "one",
    "one two",
    "one one",
    "repeat repeat repeat repeat repeat repeat",
    "a b a b a b a b c",                       // top bigram across overlaps
    "  leading and   multiple   spaces  trailing   ",
    "UPPER upper UPPER upper case CASE",
    "tab\tstays one\ttoken",
    "unicode café straße Жук café straße Жук tail",
    "x " * 2000 + "tail")

  private def profiles(df: org.apache.spark.sql.DataFrame) = {
    val native = CorpusFilter.repetitionProfile(df, col("id"), col("text"))
    val spec = CorpusFilter.repetitionProfileDeclarative(df, col("id"), col("text"))
    (native, spec)
  }

  private def assertSame(df: org.apache.spark.sql.DataFrame): Unit = {
    val (native, spec) = profiles(df)
    val n = native.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val s = spec.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(n === s)
  }

  test("repetition_stats equals the declarative chain on edge texts") {
    assertSame(edgeTexts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text"))
  }

  test("repetition_stats equals the declarative chain on random token soups") {
    val rnd = new scala.util.Random(20260815L)
    val vocab = Array("alpha", "beta", "Gamma", "δ", "x", "yy", "zzz", "CAFÉ")
    val docs = (0 until 300).map { i =>
      val n = rnd.nextInt(40)
      val toks = Seq.fill(n)(vocab(rnd.nextInt(vocab.length)))
      (i.toLong, toks.mkString(sep = if (rnd.nextBoolean()) " " else "  "))
    }
    assertSame(docs.toDF("id", "text"))
  }

  test("repetition_stats matches in interpreted (non-codegen) execution") {
    val df = edgeTexts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      assertSame(df)
    }
  }

  test("null text yields a null struct (downstream nulls, frac 0.0)") {
    val df = Seq((1L, null: String), (2L, "a a")).toDF("id", "text")
    val out = CorpusFilter.repetitionProfile(df, col("id"), col("text"))
      .orderBy("doc_id").collect()
    assert(out(0).isNullAt(1) && out(0).isNullAt(2))
    assert(out(0).getDouble(3) === 0.0) // when(null >= 2) → otherwise
    assert(out(1).getLong(1) === 2L && out(1).getDouble(2) === 0.5)
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
