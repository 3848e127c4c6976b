package graft.plans

import java.util.regex.Pattern

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.PiiFunctions

/** Semantics pins for [[PiiScan]] (the r12 q104 native): the five
  * hand-specialized linear scanners must produce EXACTLY the match set
  * of java.util.regex on [[PiiFunctions.patterns]] — per-class counts
  * over the raw text, then sequential replaceAll email → ipv4 → phone —
  * because the q104 DuckDB oracle still states the declarative regex
  * definition. Adjudicated by differential fuzz against
  * java.util.regex ITSELF (not against Spark's regexp_* wrappers), on
  * edge fixtures, the ADVICE-r11 IP-adjacent dot-run cases, structured
  * PII soups, and raw character-soup fuzz; plus a Spark-side
  * equivalence leg vs the regexp_count/regexp_replace chain in both
  * codegen and interpreted execution. */
class PiiScanSpec extends AnyFunSuite {

  // ---- the reference implementation: java.util.regex verbatim ----
  private val compiled = PiiFunctions.patterns.map { case (n, re, tag) =>
    (n, Pattern.compile(re), tag)
  }

  private def refCounts(s: String): Seq[Int] = compiled.map { case (_, p, _) =>
    val m = p.matcher(s)
    var c = 0
    while (m.find()) c += 1
    c
  }

  private def refRedact(s: String): String =
    compiled.foldLeft(s) { case (t, (_, p, tag)) =>
      p.matcher(t).replaceAll(tag)
    }

  private def native(s: String): (Seq[Int], String) = {
    val r = PiiScan.compute(UTF8String.fromString(s))
    (Seq(r.getInt(0), r.getInt(1), r.getInt(2)), r.getUTF8String(3).toString)
  }

  private def assertSame(s: String): Unit = {
    val (nc, nr) = native(s)
    assert(nc === refCounts(s), s"counts diverged on: <$s>")
    assert(nr === refRedact(s), s"redaction diverged on: <$s>")
  }

  private val edge = Seq(
    "",
    " ",
    "@",
    "a@b.co",
    "a@b.c",                         // 1-char TLD: no email
    "no pii here at all",
    "x@y.museum tail",
    "a.b@c.d.e.ff",
    "trailing-dot domain a@b.com.",  // TLD backtrack past trailing dot
    "-a@-b-.com",
    "user+tag%x@sub.domain-x.org",
    "a@@b.com",                      // L-run ends, '@' then '@' not domain
    "@b.com",
    "a@.com",                        // domain needs >=1 char before dot
    "1.2.3.4",
    "1.2.3.4.5",                     // second IP can't start mid-run
    "1.2.3.4.5.6.7.8",
    "255.255.255.255",
    "1234.1.1.1",                    // 4-digit component: no match at run head
    "1.1234.1.1",
    "1.1.1.1234",                    // final component takes 3 of 4
    "20.300.4000",                   // ADVICE r11: dot-run, not an IP
    "v1.2.33 release 10.20.30.40",
    "10.0.0.1 at line start",
    "ip:1.2.3.4,phone:+1 555 0100",
    "+31-555-1234",
    "+31 (0)20 123 4567",
    "+1.555.0100",
    "(020) 1234 5678",
    "555-123-4567",                  // phone-without-plus
    "555.123.4567",                  // dotted local: overlaps ipv4 prefix
    "20.300.4000 versus 555.123.4567",
    "+123456789012345",              // long digit run after +
    "++31-555-1234",
    "(12345) 678 90",                // 5-digit area: {2,4} gives back? no ')'
    "() 123 45",
    "+31(20)5550100",
    "+31 (20) 555 0100 and a@b.nl and 1.2.3.4 all together",
    "digits 2026 and 12345 and 0 stay",
    "a-b 12-34 56-78 90-12",         // 2-digit groups: tail needs {3,4}
    "12-345 67",
    "123-4567-89",
    "date 2026-08-15 time 12:34",    // yyyy-mm-dd: {2,4}[-. ] then {3,4}?
    "2026-08-15",
    "1234-5678-9012-3456",           // card-like
    "unicode café@straße.de Жук 1.2.3.4 ☎ +31 555 0100",
    "éé@üü.com",                     // non-ASCII local/domain chars excluded
    "x" * 5000 + "@y.com",
    "9" * 5000,                      // one huge digit run
    ("1.2.3.4 " * 500).trim,
    "a@b.com" * 300,
    "+31-555-0100 " * 300)

  test("native scan equals java.util.regex on edge fixtures") {
    edge.foreach(assertSame)
  }

  test("native scan equals java.util.regex on structured PII soups") {
    val rnd = new scala.util.Random(20260815L)
    val frag: Seq[() => String] = Seq(
      () => s"user${rnd.nextInt(1000)}@ex${rnd.nextInt(10)}.com",
      () => s"${rnd.nextInt(300)}.${rnd.nextInt(300)}.${rnd.nextInt(300)}.${rnd.nextInt(3000)}",
      () => s"+${rnd.nextInt(100)}-${rnd.nextInt(1000)}-${rnd.nextInt(10000)}",
      () => s"(${rnd.nextInt(1000)}) ${rnd.nextInt(10000)} ${rnd.nextInt(10000)}",
      () => s"${rnd.nextInt(10000)}.${rnd.nextInt(10000)}.${rnd.nextInt(10000)}",
      () => "word" + rnd.nextInt(100),
      () => rnd.nextInt(100000).toString,
      () => s"v${rnd.nextInt(10)}.${rnd.nextInt(100)}.${rnd.nextInt(100)}",
      () => s"${rnd.nextInt(100)}@${rnd.nextInt(100)}.${rnd.nextInt(100)}")
    val seps = Array(" ", "  ", ".", "-", "", ", ", "@")
    (0 until 2000).foreach { _ =>
      val n = 1 + rnd.nextInt(8)
      assertSame(Seq.fill(n)(frag(rnd.nextInt(frag.length))())
        .mkString(seps(rnd.nextInt(seps.length))))
    }
  }

  test("native scan equals java.util.regex on character-soup fuzz") {
    val rnd = new scala.util.Random(42L)
    // digit/dot/@/+/paren/sep-dense alphabet — the pathological inputs
    // for all three patterns — plus letters and multi-byte codepoints
    // to pin the UTF-8 byte-scan boundary behavior
    val alphabet = "0123456789" * 3 + "..." + "@@" + "++" + "()- " +
      "abcXYZ_%" + "é☎Ж"
    (0 until 4000).foreach { _ =>
      val n = rnd.nextInt(60)
      assertSame(Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length)))
        .mkString)
    }
  }

  // ---- Spark-side: the registered function vs the regex chain ----
  lazy val spark = TestSpark.spark

  private def sparkAssert(): Unit = {
    import spark.implicits._
    val df = edge.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val p = PiiFunctions.scan(col("text"))
    val rows = df.select(Seq(
      col("id"),
      p.getField("n_email"), p.getField("n_ipv4"), p.getField("n_phone"),
      p.getField("redacted")) ++
      PiiFunctions.counts(col("text")) :+
      PiiFunctions.redact(col("text")).as("chain_redacted"): _*)
      .collect()
    rows.foreach { r =>
      assert(r.getInt(1) === r.getInt(5) && r.getInt(2) === r.getInt(6) &&
        r.getInt(3) === r.getInt(7), s"counts diverged, id=${r.getLong(0)}")
      assert(r.getString(4) === r.getString(8),
        s"redaction diverged, id=${r.getLong(0)}")
    }
  }

  test("pii_scan column equals the regexp_count/regexp_replace chain") {
    sparkAssert()
  }

  test("pii_scan matches in interpreted (non-codegen) execution") {
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      sparkAssert()
    }
  }

  test("null text yields a null struct") {
    import spark.implicits._
    val df = Seq((1L, null: String), (2L, "a@b.com")).toDF("id", "text")
    val out = df.select(col("id"), PiiFunctions.scan(col("text")).as("p"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1))
    assert(out(1).getStruct(1).getInt(0) === 1)
    assert(out(1).getStruct(1).getString(3) === "<EMAIL>")
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
