package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** S7 — HTML measurement-table source, zero-dependency.
  *
  * The reference scrapes government air-quality pages by regex-walking
  * the HTML line stream (`scripts/Get_data.pl:1684-3040`:
  * `parse_NRWF_heute :1746` finds the measurements `<table>`, treats each
  * `<tr>` as an hourly record, `<th scope=col>` cells as column labels,
  * and sanitizes `<td>` text to numbers with `s/[^0-9:.]//g`). The fetch
  * itself is driver-side `wget` in the reference — out of scope here
  * (zero egress); this source consumes fetched/archived page files.
  *
  * Spark-first shape: like [[XlsxSource]], files distribute via the
  * `binaryFile` source and each page is parsed ON AN EXECUTOR from its
  * bytes; only schema inference touches one file on the driver. Pages are
  * small human-facing artifacts — the value is turning a directory of
  * thousands of archived scrapes into one typed DataFrame in one pass.
  *
  * Parsing contract (the reference's, made total): first `<table>` per
  * page; `<tr>` → row; `<th>`/`<td>` → cell with tags stripped and
  * entities decoded; the first row containing `<th>` is the header;
  * ragged rows null-pad. Numeric cleanup mirrors `:1812`: a cell that
  * contains a digit and reduces to a number after dropping junk (units,
  * `&nbsp;`, thousands separators) parses as that number — `"12,3 µg/m³"`
  * → 12.3. Nested tables and colspans are out of contract (the reference
  * 's line regexes don't survive them either).
  */
object HtmlTableSource {

  private val TableRe = "(?is)<table[^>]*>(.*?)</table>".r
  private val RowRe   = "(?is)<tr[^>]*>(.*?)</tr>".r
  private val CellRe  = "(?is)<(th|td)[^>]*>(.*?)</t[hd]>".r
  private val TagRe   = "(?s)<[^>]*>".r

  // hoisted: these run once per CELL on executors — no per-call Map
  // allocation or regex compilation in the hot path
  private val NamedEntities = Map("amp" -> "&", "lt" -> "<", "gt" -> ">",
    "quot" -> "\"", "apos" -> "'", "nbsp" -> "\u00A0")
  private val EntityRe = "&(#x?[0-9a-fA-F]+|[a-zA-Z]+);".r

  private[sources] def decodeEntities(s: String): String = {
    val named = NamedEntities
    EntityRe.replaceAllIn(s, m => {
      val e = m.group(1)
      val out =
        if (e.startsWith("#x") || e.startsWith("#X"))
          // Character.toChars: astral codepoints (> U+FFFF) need a surrogate
          // pair — Int.toChar would silently truncate &#128512; to a BMP char
          scala.util.Try(new String(Character.toChars(Integer.parseInt(e.drop(2), 16))))
            .getOrElse(m.matched)
        else if (e.startsWith("#"))
          scala.util.Try(new String(Character.toChars(e.drop(1).toInt)))
            .getOrElse(m.matched)
        else named.getOrElse(e, m.matched)
      java.util.regex.Matcher.quoteReplacement(out)
    })
  }

  /** One cell: strip inner tags, decode entities, collapse whitespace. */
  private def cellText(html: String): String =
    decodeEntities(TagRe.replaceAllIn(html, " "))
      .replace('\u00A0', ' ').replaceAll("\\s+", " ").trim

  /** A header/data cell: (isHeader, text). */
  private def parseHtml(bytes: Array[Byte]): Vector[Vector[(Boolean, String)]] = {
    val html = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    TableRe.findFirstMatchIn(html) match {
      case None => Vector.empty
      case Some(t) =>
        RowRe.findAllMatchIn(t.group(1)).map { r =>
          CellRe.findAllMatchIn(r.group(1)).map { c =>
            (c.group(1).equalsIgnoreCase("th"), cellText(c.group(2)))
          }.toVector
        }.toVector
    }
  }

  /** The reference's `:1812` sanitizer, made total: digits present and a
    * number remains after dropping non-numeric junk → Some(number text).
    * The decimal comma (German/Dutch pages) maps to a point first.
    * Divergence: time-of-day cells (`01:00`) stay text — the reference
    * rewrites `:` to `.` because its MySQL layer wants hour.minute
    * pseudo-numbers (`:1813-1819`); a typed DataFrame keeps them strings
    * for a real timestamp parse downstream. */
  // hoisted for the same per-cell reason as EntityRe
  private val JunkRe = java.util.regex.Pattern.compile("[^0-9.\\-]")
  private val InnerDashRe = java.util.regex.Pattern.compile("(?<=.)-")
  private val NumberRe =
    java.util.regex.Pattern.compile("-?[0-9]+(\\.[0-9]*)?|-?\\.[0-9]+")

  private[sources] def numericText(s: String): Option[String] = {
    if (!s.exists(_.isDigit) || s.contains(":")) None
    else {
      val t0 = JunkRe.matcher(s.replace(',', '.')).replaceAll("")
      val t = InnerDashRe.matcher(t0).replaceAll("") // inner dashes are junk
      val clean = if (t.count(_ == '.') > 1)
        t.takeWhile(_ != '.') + "." + t.dropWhile(_ != '.').replace(".", "")
      else t
      if (NumberRe.matcher(clean).matches()) Some(clean)
      else None
    }
  }

  /** Reads the first table of each .html file at `path` (file or glob)
    * into a typed DataFrame. Header = first row containing `<th>` cells;
    * columns without a usable label get `c<i>`. A column whose every
    * non-empty cell passes [[numericText]] types long/double. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val bin = spark.read.format("binaryFile").load(path)
      .select("path", "content")
    val first = bin.orderBy("path").select("content")
      .as(org.apache.spark.sql.Encoders.BINARY).head()
    val rows0 = parseHtml(first)
    require(rows0.nonEmpty, "no <table> found in the first HTML file")
    val headerIdx = rows0.indexWhere(_.exists(_._1))
    val header = if (headerIdx >= 0) rows0(headerIdx) else Vector.empty
    val width = rows0.map(_.length).max
    val names = (0 until width).map { i =>
      val h = if (i < header.length) header(i)._2 else ""
      if (h.nonEmpty) h else s"c$i"
    }
    def dataRows(rows: Vector[Vector[(Boolean, String)]]) = {
      val hi = rows.indexWhere(_.exists(_._1))
      rows.drop(hi + 1).filter(_.exists(!_._1))
    }

    val types: Seq[DataType] = (0 until width).map { i =>
      val cells = dataRows(rows0)
        .map(r => if (i < r.length) r(i)._2 else "").filter(_.nonEmpty)
      if (cells.isEmpty) StringType
      else {
        val nums = cells.map(numericText)
        if (nums.forall(_.isDefined)) {
          if (nums.flatten.forall(_.matches("-?[0-9]+"))) LongType
          else DoubleType
        } else StringType
      }
    }
    val schema = StructType(names.zip(types).map { case (n, t) =>
      StructField(n, t, nullable = true) })
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val w = width; val ts = types
    bin.select("content").as(org.apache.spark.sql.Encoders.BINARY)
      .mapPartitions { it =>
        it.flatMap { bytes =>
          dataRows(parseHtml(bytes)).map { r =>
            Row.fromSeq((0 until w).map { i =>
              val raw = if (i < r.length) r(i)._2 else ""
              if (raw.isEmpty) null
              else ts(i) match {
                case LongType =>
                  numericText(raw).flatMap(t =>
                    scala.util.Try(t.toLong).toOption).orNull
                case DoubleType =>
                  numericText(raw).flatMap(t =>
                    scala.util.Try(t.toDouble).toOption).orNull
                case _ => raw
              }
            })
          }
        }
      }(enc)
  }
}
