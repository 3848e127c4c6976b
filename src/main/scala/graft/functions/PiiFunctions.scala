package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scanning and redaction for training-corpus hygiene: detect and
  * mask email addresses, IPv4 addresses and phone numbers before text
  * reaches a training mix (the C4/CCNet-style scrub step).
  *
  * Pure `Column` algebra over codegen'd built-ins (`regexp_count`,
  * `regexp_replace`) with DuckDB-SQL twins — patterns are kept to the
  * common subset of Java regex and RE2 (no lookaround, no backrefs) so
  * one pattern string drives both engines identically.
  *
  * Scale shape: a per-row map-only projection — no shuffle, survives any
  * corpus size by partition parallelism alone.
  */
object PiiFunctions {

  /** (name, pattern, replacement tag) in redaction order. Order matters
    * for overlapping matches: ipv4 runs before phone, so a dotted IP is
    * already `<IP>` when the phone pass sees the text (a dotted local
    * phone `555.123.4567` and a dotted IP overlap syntactically; the
    * per-class raw counts count each class independently).
    *
    * Phone covers the shapes a real scrubber meets, not just the
    * `+CC-NNN-N…` fixture: international with optional `-`/`.`/space
    * separators and an optional parenthesized area code
    * (`+31 (0)20 123 4567`, `+1.555.0100`), and local forms with a
    * parenthesized area code or at least two separator-joined digit
    * groups (`(020) 1234 5678`, `555-123-4567`) — the two-separator
    * floor keeps bare digit runs (ids, years, zips) unredacted. */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "([0-9]{1,3}\\.){3}[0-9]{1,3}", "<IP>"),
    ("phone",
     "(\\+[0-9]{1,3}[-. ]?(\\([0-9]{1,4}\\)[-. ]?)?[0-9]{2,4}[-. ]?[0-9]{1,10}" +
       "|(\\([0-9]{2,4}\\)[-. ]?|[0-9]{2,4}[-. ])[0-9]{3,4}[-. ][0-9]{2,6})",
     "<PHONE>"))

  /** Per-class match count columns, aliased `n_<name>`. */
  def counts(text: Column): Seq[Column] =
    patterns.map { case (name, re, _) =>
      regexp_count(text, lit(re)).as(s"n_$name")
    }

  def countsSql(e: String): Seq[(String, String)] =
    patterns.map { case (name, re, _) =>
      s"n_$name" -> s"len(regexp_extract_all($e, '$re'))"
    }

  /** Text with every PII match replaced by its class tag. */
  def redact(text: Column): Column =
    patterns.foldLeft(text) { case (c, (_, re, tag)) =>
      regexp_replace(c, lit(re), lit(tag))
    }

  def redactSql(e: String): String =
    patterns.foldLeft(e) { case (s, (_, re, tag)) =>
      s"regexp_replace($s, '$re', '$tag', 'g')"
    }
}
