package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** S6 — XLSX source. The fixture is hand-authored ECMA-376 part XML (not
  * produced by the reader under test), covering: sharedStrings with
  * multi-`<t>` runs, inline strings, builtin (14) and custom (164) date
  * numFmts, sparse out-of-order `r=` cells, ragged rows, booleans.
  * Semantics under test mirror statistics/MyRegression.py:699-757: typed
  * columns selectable by position, date column as real timestamps, range
  * filter on the date column. */
class XlsxSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Excel serial for an instant (days since 1899-12-30T00:00Z). */
  private def serial(iso: String): Double = {
    val t = java.time.Instant.parse(iso)
    (t.getEpochSecond - (-2209161600L)) / 86400.0
  }

  private def zipEntries(out: Path, entries: (String, String)*): Unit = {
    val z = new ZipOutputStream(Files.newOutputStream(out))
    try entries.foreach { case (name, content) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes(UTF_8))
      z.closeEntry()
    } finally z.close()
  }

  private val contentTypes =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
      |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
      |<Default Extension="xml" ContentType="application/xml"/>
      |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
      |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
      |<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
      |<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
      |</Types>""".stripMargin

  private val rootRels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
      |</Relationships>""".stripMargin

  private val workbook =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
      | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
      |<sheets><sheet name="data" sheetId="1" r:id="rId1"/></sheets>
      |</workbook>""".stripMargin

  private val workbookRels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
      |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
      |<Relationship Id="rId3" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>
      |</Relationships>""".stripMargin

  // style 1 = builtin date (numFmt 14), style 2 = custom date (164),
  // style 3 = plain number format (custom, NOT a date)
  private val styles =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
      |<numFmts count="2">
      |<numFmt numFmtId="164" formatCode="yyyy&quot;y&quot;\ mm&quot;m&quot;\ dd hh:mm"/>
      |<numFmt numFmtId="165" formatCode="0.00&quot; days&quot;"/>
      |</numFmts>
      |<cellXfs count="4">
      |<xf numFmtId="0"/>
      |<xf numFmtId="14" applyNumberFormat="1"/>
      |<xf numFmtId="164" applyNumberFormat="1"/>
      |<xf numFmtId="165" applyNumberFormat="1"/>
      |</cellXfs>
      |</styleSheet>""".stripMargin

  // "pm25" assembled from two <t> runs — readers must concatenate
  private val sharedStrings =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="6" uniqueCount="6">
      |<si><t>date</t></si>
      |<si><r><t>pm</t></r><r><t>25</t></r></si>
      |<si><t>label</t></si>
      |<si><t>count</t></si>
      |<si><t>Vredepeel</t></si>
      |<si><t>Horst aan de Maas</t></si>
      |</sst>""".stripMargin

  private def sheet(rows: String) =
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
       |<sheetData>
       |$rows
       |</sheetData>
       |</worksheet>""".stripMargin

  private def writeXlsx(path: Path, sheetRows: String): Unit =
    zipEntries(path,
      "[Content_Types].xml" -> contentTypes,
      "_rels/.rels" -> rootRels,
      "xl/workbook.xml" -> workbook,
      "xl/_rels/workbook.xml.rels" -> workbookRels,
      "xl/styles.xml" -> styles,
      "xl/sharedStrings.xml" -> sharedStrings,
      "xl/worksheets/sheet1.xml" -> sheet(sheetRows))

  test("typed read: dates, doubles, longs, shared/inline strings, sparse cells") {
    val dir = Files.createTempDirectory("graft_xlsx_")
    val s1 = serial("2020-01-01T12:00:00Z")
    val s2 = serial("2020-01-02T00:00:00Z")
    val s3 = serial("2020-01-03T06:30:00Z")
    val rows =
      s"""<row r="1">
         |<c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>
         |<c r="C1" t="s"><v>2</v></c><c r="D1" t="s"><v>3</v></c>
         |</row>
         |<row r="2">
         |<c r="A2" s="1"><v>$s1</v></c><c r="B2"><v>12.5</v></c>
         |<c r="C2" t="s"><v>4</v></c><c r="D2" s="3"><v>7</v></c>
         |</row>
         |<row r="3">
         |<c r="A3" s="2"><v>$s2</v></c><c r="B3"><v>8.25</v></c>
         |<c r="C3" t="inlineStr"><is><t>Grubbenvorst</t></is></c><c r="D3"><v>11</v></c>
         |</row>
         |<row r="4">
         |<c r="D4"><v>3</v></c><c r="A4" s="1"><v>$s3</v></c>
         |</row>""".stripMargin
    val f = dir.resolve("sensors.xlsx")
    writeXlsx(f, rows)

    val df = XlsxSource.read(spark, f.toString)
    assert(df.columns.toSeq == Seq("date", "pm25", "label", "count"))
    assert(df.schema.fields.map(_.dataType).toSeq ==
      Seq(TimestampType, DoubleType, StringType, LongType))

    val got = df.orderBy("date").collect()
    assert(got.length == 3)
    // builtin-14 and custom-164 date styles both decode to real instants
    assert(got(0).getTimestamp(0).toInstant ==
      java.time.Instant.parse("2020-01-01T12:00:00Z"))
    assert(got(1).getTimestamp(0).toInstant ==
      java.time.Instant.parse("2020-01-02T00:00:00Z"))
    assert(got(2).getTimestamp(0).toInstant ==
      java.time.Instant.parse("2020-01-03T06:30:00Z"))
    // custom NON-date numFmt (165) stays numeric: count is a long column
    assert(got(0).getLong(3) == 7L && got(1).getLong(3) == 11L)
    // shared multi-run + inline strings
    assert(got(0).getString(2) == "Vredepeel")
    assert(got(1).getString(2) == "Grubbenvorst")
    // ragged row 4: missing B/C cells read as null (out-of-order r= refs)
    assert(got(2).isNullAt(1) && got(2).isNullAt(2) && got(2).getLong(3) == 3L)
  }

  test("MyRegression GetXLSX semantics: positional select + date-range filter") {
    val dir = Files.createTempDirectory("graft_xlsx2_")
    val rows = (0 until 48).map { i =>
      val s = serial("2020-03-01T00:00:00Z") + i / 24.0
      s"""<row r="${i + 2}"><c r="A${i + 2}" s="1"><v>$s</v></c>
         |<c r="B${i + 2}"><v>${10.0 + i * 0.5}</v></c>
         |<c r="C${i + 2}"><v>${20.0 + i}</v></c></row>""".stripMargin
    }.mkString("\n")
    val hdr = """<row r="1"><c r="A1" t="inlineStr"><is><t>time</t></is></c>
                |<c r="B1" t="inlineStr"><is><t>pm25</t></is></c>
                |<c r="C1" t="inlineStr"><is><t>pm10</t></is></c></row>""".stripMargin
    val f = dir.resolve("series.xlsx")
    writeXlsx(f, hdr + "\n" + rows)

    val df = XlsxSource.read(spark, f.toString)
    // the reference selects date + value columns BY INDEX (sensors[i]['column'])
    val dateCol = df.columns(0)
    val valCol = df.columns(1)
    val sel = df.select(col(dateCol), col(valCol))
      .where(col(dateCol) >= lit("2020-03-01 00:00:00").cast("timestamp") &&
             col(dateCol) <= lit("2020-03-01 23:00:00").cast("timestamp"))
    assert(sel.count() == 24)
    // epoch-seconds conversion like FromXLSX's `.value // 10**9`
    val firstEpoch = sel.orderBy(col(dateCol))
      .select(unix_timestamp(col(dateCol))).head.getLong(0)
    assert(firstEpoch == java.time.Instant.parse("2020-03-01T00:00:00Z").getEpochSecond)
  }

  test("multiple .xlsx files parse on executors and union") {
    val dir = Files.createTempDirectory("graft_xlsx3_")
    val hdr = """<row r="1"><c r="A1" t="inlineStr"><is><t>k</t></is></c>
                |<c r="B1" t="inlineStr"><is><t>v</t></is></c></row>""".stripMargin
    def body(offset: Int, n: Int) = (0 until n).map { i =>
      s"""<row r="${i + 2}"><c r="A${i + 2}"><v>${offset + i}</v></c>
         |<c r="B${i + 2}"><v>${(offset + i) * 1.5}</v></c></row>""".stripMargin
    }.mkString("\n")
    writeXlsx(dir.resolve("a.xlsx"), hdr + "\n" + body(0, 5))
    writeXlsx(dir.resolve("b.xlsx"), hdr + "\n" + body(100, 7))

    val df = XlsxSource.read(spark, dir.toString + "/*.xlsx")
    assert(df.count() == 12)
    assert(df.agg(sum(col("k"))).head.getLong(0) == (0 until 5).sum + (100 until 107).sum)
  }
}
