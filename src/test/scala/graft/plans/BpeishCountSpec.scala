package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[BpeishCount]] must be value-identical to the regexp form it
  * replaces — `regexp_count(lower(text), "[a-z]+|[0-9]+|[^a-z0-9 ]")` —
  * on case folding, digit/alpha run maximality, per-code-point counting
  * of non-alphanumerics (incl. multibyte and supplementary-plane
  * characters), whitespace classes, and null propagation. */
class BpeishCountSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val edges: Seq[String] = Seq(
    "", " ", "   ", "abc", "ABC def", "a1b2", "007bond",
    "hello, world!! 42", "naïve café", "日本語 text then more",
    "a  b", "x\ny", "tab\tsep", "🙂 emoji 🎉🎉", "ño.mañana",
    "UPPER lower MiXeD", "1,234.56", "--dashes--", "_under_score_",
    "ΣΙΓΜΑ σίγμα", "ß sharp", "é combining", "ended.")

  test("bpeish_count equals the regexp_count(lower(...)) form") {
    val rnd = new scala.util.Random(42)
    val alphabet =
      "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 ,.!?-_栗é🙂\n\t"
    val fuzz = (1 to 300).map { _ =>
      val len = rnd.nextInt(60)
      (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val df = (edges ++ fuzz).toDF("t")
    val bad = df.select(col("t"),
        call_function("bpeish_count", col("t")).as("native"),
        regexp_count(lower(col("t")),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).as("regex"))
      .where(col("native") =!= col("regex"))
      .collect()
    assert(bad.isEmpty, bad.take(5).mkString("; "))
  }

  test("bpeish_count: null text propagates null") {
    val out = Seq(Some("a b"), None).toDF("t")
      .select(call_function("bpeish_count", col("t")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0))
    assert(out.toSeq === Seq(2, -1))
  }
}
