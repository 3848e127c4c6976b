package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `pii_scan(text)` — one-call native PII scrubber: `struct<n_email:
  * int, n_ipv4: int, n_phone: int, redacted: string>` with EXACTLY the
  * semantics of the [[graft.functions.PiiFunctions.patterns]] regex
  * chain: per-class `regexp_count` over the RAW text, then sequential
  * `regexp_replace` email → ipv4 → phone (each pass over the previous
  * pass's output, the overlap-ordering contract of
  * `PiiFunctions.redact`).
  *
  * Why native (r11 verdict item 1): the six regex passes run Java's
  * backtracking engine over every row, and the salted scale corpus is
  * digit-dense — every token ends in `_r<i>`, so the email local-part
  * class eats whole tokens before failing at '@' and the phone
  * alternation forks on every digit run. DuckDB executes the identical
  * patterns in RE2's linear-time engine (1.4 s at sf1 vs 8.3 s). This
  * expression replaces all six passes with five linear byte scans
  * (email count+redact share one — both are the raw-text match set) of
  * hand-specialized matchers that REPLICATE java.util.regex
  * leftmost-first, greedy-with-backtracking semantics for the three
  * fixed patterns — every quantifier's give-back order is enumerated in
  * engine order, so the match set is bit-identical to the regex chain
  * (pinned by `PiiScanSpec`'s differential fuzz against
  * java.util.regex itself, plus the unchanged q104 DuckDB oracle).
  *
  * All pattern atoms are ASCII classes, so matching runs on UTF-8
  * bytes directly: continuation/lead bytes are >= 0x80, never in any
  * class, and match boundaries always fall on ASCII — no mid-codepoint
  * splices in the redaction.
  *
  * Null text yields a null struct (same as the regex chain nulling
  * every downstream column).
  */
case class PiiScan(child: Expression) extends UnaryExpression {

  override def dataType: DataType = PiiScan.schema
  override def nullable: Boolean = true
  override def prettyName: String = "pii_scan"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pii_scan expects a string column, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    PiiScan.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PiiScan.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PiiScan {

  val schema: StructType = StructType(Seq(
    StructField("n_email", IntegerType, nullable = false),
    StructField("n_ipv4", IntegerType, nullable = false),
    StructField("n_phone", IntegerType, nullable = false),
    StructField("redacted", StringType, nullable = false)))

  // ASCII class tables (index byte & 0xFF; >= 0x80 is always false)
  private val isLocal = new Array[Boolean](256)  // [A-Za-z0-9._%+-]
  private val isDomain = new Array[Boolean](256) // [A-Za-z0-9.-]
  private val isAlpha = new Array[Boolean](256)  // [A-Za-z]
  private val isDigit = new Array[Boolean](256)  // [0-9]
  private val isSep = new Array[Boolean](256)    // [-. ]
  locally {
    var c = 'A'.toInt
    while (c <= 'Z') { isAlpha(c) = true; isAlpha(c + 32) = true; c += 1 }
    c = '0'.toInt
    while (c <= '9') { isDigit(c) = true; c += 1 }
    c = 0
    while (c < 256) {
      isLocal(c) = isAlpha(c) || isDigit(c) || c == '.' || c == '_' ||
        c == '%' || c == '+' || c == '-'
      isDomain(c) = isAlpha(c) || isDigit(c) || c == '.' || c == '-'
      isSep(c) = c == '-' || c == '.' || c == ' '
      c += 1
    }
  }

  private val EMAIL_TAG = "<EMAIL>".getBytes
  private val IP_TAG = "<IP>".getBytes
  private val PHONE_TAG = "<PHONE>".getBytes

  /** Growable flat (start, end) pair list — no boxing, reused slots. */
  private final class Matches {
    var a = new Array[Int](32)
    var n = 0
    def add(s: Int, e: Int): Unit = {
      if (n + 2 > a.length) a = java.util.Arrays.copyOf(a, a.length * 2)
      a(n) = s; a(n + 1) = e; n += 2
    }
    def count: Int = n / 2
  }

  /** Static entry point shared by eval and codegen. */
  def compute(text: UTF8String): InternalRow = {
    val raw = text.getBytes
    // email: count == redact match set (both on raw), one scan
    val em = new Matches
    scanEmail(raw, em)
    val nEmail = em.count
    val nIpv4 = { val m = new Matches; scanIpv4(raw, m); m.count }
    val nPhone = { val m = new Matches; scanPhone(raw, m); m.count }
    val t1 = if (em.n == 0) raw else replace(raw, em, EMAIL_TAG)
    val t2 = {
      val m = new Matches; scanIpv4(t1, m)
      if (m.n == 0) t1 else replace(t1, m, IP_TAG)
    }
    val t3 = {
      val m = new Matches; scanPhone(t2, m)
      if (m.n == 0) t2 else replace(t2, m, PHONE_TAG)
    }
    val out = if (t3 eq raw) text.clone() else UTF8String.fromBytes(t3)
    new GenericInternalRow(Array[Any](nEmail, nIpv4, nPhone, out))
  }

  private def replace(b: Array[Byte], m: Matches, tag: Array[Byte]): Array[Byte] = {
    var removed = 0
    var i = 0
    while (i < m.n) { removed += m.a(i + 1) - m.a(i); i += 2 }
    val out = new Array[Byte](b.length - removed + m.count * tag.length)
    var src = 0; var dst = 0; i = 0
    while (i < m.n) {
      val s = m.a(i); val e = m.a(i + 1)
      System.arraycopy(b, src, out, dst, s - src); dst += s - src
      System.arraycopy(tag, 0, out, dst, tag.length); dst += tag.length
      src = e; i += 2
    }
    System.arraycopy(b, src, out, dst, b.length - src)
    out
  }

  @inline private def cls(b: Array[Byte], i: Int, t: Array[Boolean]): Boolean =
    t(b(i) & 0xFF)

  /** Length of the digit run at `p`, capped at `cap` (the quantifier
    * logic only needs to distinguish "more than max" from exact small
    * counts, so capping keeps per-start work O(1) on long runs). */
  @inline private def digitRun(b: Array[Byte], p: Int, cap: Int): Int = {
    val n = b.length
    var i = p
    val lim = math.min(n, p + cap)
    while (i < lim && isDigit(b(i) & 0xFF)) i += 1
    i - p
  }

  /** `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}` — engine order:
    * L+ is maximal (next is '@' which is not in L, so give-backs can
    * never help); D+ gives back from maximal one char at a time, the
    * first split whose next char is '.' followed by >= 2 alpha wins.
    * Failed-start skipping is exact: every start inside an L-run shares
    * the run's end, so a run not followed by '@' (or whose domain
    * fails) eliminates all starts in the run at once. */
  private def scanEmail(b: Array[Byte], out: Matches): Unit = {
    val n = b.length
    var i = 0
    while (i < n) {
      if (!cls(b, i, isLocal)) i += 1
      else {
        var e = i
        while (e < n && cls(b, e, isLocal)) e += 1 // maximal L-run
        var next = e + 1 // all starts in [i, e) fail together
        if (e < n && b(e) == '@') {
          val a = e + 1
          var m = a
          while (m < n && cls(b, m, isDomain)) m += 1 // maximal D-run
          var q = m - 1
          var done = false
          while (q >= a + 1 && !done) { // D+ give-back, longest first
            if (b(q) == '.') {
              var r = q + 1
              while (r < n && cls(b, r, isAlpha)) r += 1
              if (r - (q + 1) >= 2) { out.add(i, r); next = r; done = true }
            }
            q -= 1
          }
        }
        i = next
      }
    }
  }

  /** `([0-9]{1,3}\.){3}[0-9]{1,3}` — each dotted component matches iff
    * its maximal digit run is 1-3 long AND followed by '.' (a longer
    * run leaves a digit where '.' must be, and giving back digits puts
    * a digit there too); the final component takes min(run, 3) and has
    * no follow constraint. Failed starts advance one byte — a longer
    * run's tail can still start a match (leftmost semantics), and each
    * attempt is O(1) so the scan stays linear. */
  private def scanIpv4(b: Array[Byte], out: Matches): Unit = {
    val n = b.length
    var i = 0
    while (i < n) {
      if (!cls(b, i, isDigit)) i += 1
      else {
        val e = tryIpv4(b, i)
        if (e > 0) { out.add(i, e); i = e } else i += 1
      }
    }
  }

  private def tryIpv4(b: Array[Byte], s: Int): Int = {
    val n = b.length
    var p = s
    var k = 0
    while (k < 3) {
      val r = digitRun(b, p, 4)
      if (r == 0 || r > 3 || p + r >= n || b(p + r) != '.') return -1
      p += r + 1
      k += 1
    }
    val r = digitRun(b, p, 4)
    if (r == 0) -1 else p + math.min(r, 3)
  }

  /** The phone alternation, in exact engine order: alt1
    * `\+[0-9]{1,3}[-. ]?(\([0-9]{1,4}\)[-. ]?)?[0-9]{2,4}[-. ]?[0-9]{1,10}`
    * then alt2
    * `(\([0-9]{2,4}\)[-. ]?|[0-9]{2,4}[-. ])[0-9]{3,4}[-. ][0-9]{2,6}`.
    * Every quantifier backtracks rightmost-first, greedy `?` tries
    * consume-then-skip, the optional group tries with-then-without, and
    * the first fully-successful configuration's end is the match — the
    * same depth-first order java.util.regex walks. All quantifiers are
    * small and bounded, so per-start work is O(1). */
  private def scanPhone(b: Array[Byte], out: Matches): Unit = {
    val n = b.length
    var i = 0
    while (i < n) {
      val c = b(i) & 0xFF
      if (c != '+' && c != '(' && !isDigit(c)) i += 1
      else {
        var e = -1
        if (c == '+') e = tryPhoneAlt1(b, i + 1)
        if (e < 0) e = tryPhoneAlt2(b, i)
        if (e > 0) { out.add(i, e); i = e } else i += 1
      }
    }
  }

  /** `[0-9]{2,4}[-. ]?[0-9]{1,10}` — the shared tail of alt1. */
  private def phoneTailAlt1(b: Array[Byte], p: Int): Int = {
    val n = b.length
    val r5 = digitRun(b, p, 5)
    var t5 = math.min(r5, 4)
    while (t5 >= 2) {
      val p5 = p + t5
      // [-. ]? : consume first, then skip
      var sepCase = 0
      while (sepCase < 2) {
        val p6 = if (sepCase == 0) {
          if (p5 < n && cls(b, p5, isSep)) p5 + 1 else -1
        } else p5
        if (p6 >= 0) {
          val r7 = digitRun(b, p6, 11)
          if (r7 >= 1) return p6 + math.min(r7, 10)
        }
        sepCase += 1
      }
      t5 -= 1
    }
    -1
  }

  /** alt1 after the leading '+' (already matched by the caller). */
  private def tryPhoneAlt1(b: Array[Byte], p: Int): Int = {
    val n = b.length
    val r1 = digitRun(b, p, 4)
    var t1 = math.min(r1, 3)
    while (t1 >= 1) {
      val p1 = p + t1
      var sep1 = 0
      while (sep1 < 2) {
        val p2 = if (sep1 == 0) {
          if (p1 < n && cls(b, p1, isSep)) p1 + 1 else -1
        } else p1
        if (p2 >= 0) {
          // optional parenthesized group, with-group first
          if (p2 < n && b(p2) == '(') {
            val rg = digitRun(b, p2 + 1, 5)
            var tg = math.min(rg, 4)
            while (tg >= 1) {
              val close = p2 + 1 + tg
              if (close < n && b(close) == ')') {
                val p3 = close + 1
                var sepg = 0
                while (sepg < 2) {
                  val p4 = if (sepg == 0) {
                    if (p3 < n && cls(b, p3, isSep)) p3 + 1 else -1
                  } else p3
                  if (p4 >= 0) {
                    val e = phoneTailAlt1(b, p4)
                    if (e > 0) return e
                  }
                  sepg += 1
                }
              }
              tg -= 1
            }
          }
          val e = phoneTailAlt1(b, p2) // without the group
          if (e > 0) return e
        }
        sep1 += 1
      }
      t1 -= 1
    }
    -1
  }

  /** `[0-9]{3,4}[-. ][0-9]{2,6}` — the shared tail of alt2. */
  private def phoneTailAlt2(b: Array[Byte], p: Int): Int = {
    val n = b.length
    val r2 = digitRun(b, p, 5)
    var t2 = math.min(r2, 4)
    while (t2 >= 3) {
      val ps = p + t2
      if (ps < n && cls(b, ps, isSep)) {
        val r3 = digitRun(b, ps + 1, 7)
        if (r3 >= 2) return ps + 1 + math.min(r3, 6)
      }
      t2 -= 1
    }
    -1
  }

  private def tryPhoneAlt2(b: Array[Byte], s: Int): Int = {
    val n = b.length
    // branch A: \( [0-9]{2,4} \) [-. ]?
    if (b(s) == '(') {
      val rg = digitRun(b, s + 1, 5)
      var tg = math.min(rg, 4)
      while (tg >= 2) {
        val close = s + 1 + tg
        if (close < n && b(close) == ')') {
          val p3 = close + 1
          var sepCase = 0
          while (sepCase < 2) {
            val p4 = if (sepCase == 0) {
              if (p3 < n && cls(b, p3, isSep)) p3 + 1 else -1
            } else p3
            if (p4 >= 0) {
              val e = phoneTailAlt2(b, p4)
              if (e > 0) return e
            }
            sepCase += 1
          }
        }
        tg -= 1
      }
    }
    // branch B: [0-9]{2,4} [-. ]  (mandatory separator)
    if (cls(b, s, isDigit)) {
      val r = digitRun(b, s, 5)
      var t = math.min(r, 4)
      while (t >= 2) {
        val ps = s + t
        if (ps < n && cls(b, ps, isSep)) {
          val e = phoneTailAlt2(b, ps + 1)
          if (e > 0) return e
        }
        t -= 1
      }
    }
    -1
  }
}
