package graft.sources

import java.nio.file.Files
import java.util.zip.ZipFile

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** K9 — XLSX report writer. The strongest check is the round trip through
  * [[XlsxSource]] (an independent parser: the reader consumes the OOXML
  * parts, not the writer's in-memory model), covering typed columns —
  * long, double, string (with XML-hostile characters), timestamp (via the
  * date-style contract). Multi-sheet grouping mirrors Things2XLSX's
  * per-region sheets. */
class XlsxWriterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("single-sheet round trip through XlsxSource preserves types and values") {
    import spark.implicits._
    val dir = Files.createTempDirectory("xlsxw").toFile
    val file = new java.io.File(dir, "report.xlsx").getAbsolutePath
    val df = Seq(
      (1L, 12.5, "Grubbenvorst", "2024-01-01 10:30:00"),
      (2L, -3.25, "Horst a/d <Maas> & \"co\"", "2024-06-15 23:59:59"),
      (3L, 490.02, "Venray", "2025-12-31 00:00:00"))
      .toDF("station", "pm25", "name", "ts_s")
      .select($"station", $"pm25", $"name",
        $"ts_s".cast("timestamp").as("placed"))
    XlsxWriter.write(df, file)

    val back = XlsxSource.read(spark, file)
    assert(back.columns.toSeq == Seq("station", "pm25", "name", "placed"))
    assert(back.schema("station").dataType.typeName == "long")
    assert(back.schema("pm25").dataType.typeName == "double")
    assert(back.schema("name").dataType.typeName == "string")
    assert(back.schema("placed").dataType.typeName == "timestamp")
    val rows = back.orderBy("station").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows.map(_.getDouble(1)).toSeq == Seq(12.5, -3.25, 490.02))
    assert(rows(1).getString(2) == "Horst a/d <Maas> & \"co\"")
    // timestamps round-trip to the second (serial double carries micros)
    val ts = back.select(date_format($"placed", "yyyy-MM-dd HH:mm:ss"))
      .orderBy("placed").as[String].collect()
    assert(ts.toSeq == Seq("2024-01-01 10:30:00", "2024-06-15 23:59:59",
      "2025-12-31 00:00:00"))
  }

  test("pre-epoch fractional timestamps round-trip (floorDiv, not truncate)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("xlsxw").toFile
    val file = new java.io.File(dir, "preepoch.xlsx").getAbsolutePath
    // 1969-12-31T23:59:59.500Z: getTime = -500 ms — truncating division
    // would shift it one second late
    val df = Seq((1L, "1969-12-31 23:59:59.5")).toDF("id", "t")
      .select($"id", $"t".cast("timestamp").as("placed"))
    XlsxWriter.write(df, file)
    val back = XlsxSource.read(spark, file)
      .select(date_format(col("placed"), "yyyy-MM-dd HH:mm:ss.S"))
      .as[String].head()
    assert(back == "1969-12-31 23:59:59.5")
  }

  test("nulls survive the round trip as nulls") {
    import spark.implicits._
    val dir = Files.createTempDirectory("xlsxw").toFile
    val file = new java.io.File(dir, "nulls.xlsx").getAbsolutePath
    val df = Seq((1L, Some(2.5), Some("a")), (2L, None, None))
      .toDF("id", "v", "s")
    XlsxWriter.write(df, file)
    val rows = XlsxSource.read(spark, file).orderBy("id").collect()
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
    assert(rows(0).getDouble(1) == 2.5 && rows(0).getString(2) == "a")
  }

  test("non-finite doubles render as blank cells, not invalid <v>NaN</v>") {
    import spark.implicits._
    val dir = Files.createTempDirectory("xlsxw").toFile
    val file = new java.io.File(dir, "nonfinite.xlsx").getAbsolutePath
    val df = Seq((1L, 1.5), (2L, Double.NaN), (3L, Double.PositiveInfinity),
      (4L, Double.NegativeInfinity)).toDF("id", "v")
    XlsxWriter.write(df, file)
    val zf = new ZipFile(file)
    try {
      val s1 = new String(zf.getInputStream(
        zf.getEntry("xl/worksheets/sheet1.xml")).readAllBytes(), "UTF-8")
      assert(!s1.contains("NaN") && !s1.contains("Infinity"))
    } finally zf.close()
    // the independent reader sees them as nulls, like SQL NULL
    val rows = XlsxSource.read(spark, file).orderBy("id").collect()
    assert(rows(0).getDouble(1) == 1.5)
    assert(rows(1).isNullAt(1) && rows(2).isNullAt(1) && rows(3).isNullAt(1))
  }

  test("sheet names are sanitized for Excel-invalid chars and deduped on truncation") {
    import spark.implicits._
    val dir = Files.createTempDirectory("xlsxw").toFile
    val file = new java.io.File(dir, "names.xlsx").getAbsolutePath
    // two regions that collide after 31-char truncation, one with every
    // Excel-forbidden character
    val longA = "Gemeente Horst aan de Maas regio Noord"
    val longB = "Gemeente Horst aan de Maas regio Zuid"
    val df = Seq((longA, 1L), (longB, 2L), ("bad[]:*?/\\name", 3L))
      .toDF("region", "v")
    XlsxWriter.write(df, file, sheetBy = Some("region"))
    val zf = new ZipFile(file)
    try {
      val wb = new String(zf.getInputStream(
        zf.getEntry("xl/workbook.xml")).readAllBytes(), "UTF-8")
      val names = """name="([^"]*)"""".r.findAllMatchIn(wb).map(_.group(1)).toSeq
      assert(names.length == 3)
      assert(names.distinct.length == 3, s"duplicate sheet names: $names")
      assert(names.forall(_.length <= 31))
      assert(names.forall(n => !"[]:*?/\\".exists(n.contains(_))))
      assert(names.contains("bad_______name")) // 7 forbidden chars → 7 _
    } finally zf.close()
  }

  test("groups over the row limit spill to continuation sheets") {
    import spark.implicits._
    val dir = Files.createTempDirectory("xlsxw").toFile
    val file = new java.io.File(dir, "spill.xlsx").getAbsolutePath
    // 7 data rows, limit 4 → 3 data rows per sheet (header takes row 1)
    // → sheets of 3, 3, 1
    val df = (1L to 7L).map(i => ("R", i)).toDF("region", "v")
    XlsxWriter.write(df, file, Some("region"), rowLimit = 4)
    val zf = new ZipFile(file)
    try {
      val wb = new String(zf.getInputStream(
        zf.getEntry("xl/workbook.xml")).readAllBytes(), "UTF-8")
      val names = """name="([^"]*)"""".r.findAllMatchIn(wb).map(_.group(1)).toSeq
      assert(names == Seq("R", "R (2)", "R (3)"))
      val counts = (1 to 3).map { i =>
        val s = new String(zf.getInputStream(
          zf.getEntry(s"xl/worksheets/sheet$i.xml")).readAllBytes(), "UTF-8")
        "<row ".r.findAllMatchIn(s).length - 1 // minus header row
      }
      assert(counts == Seq(3, 3, 1))
    } finally zf.close()
    // first sheet still reads back cleanly
    assert(XlsxSource.read(spark, file).count() == 3)
  }

  test("sheetBy groups rows into per-region worksheets (Things2XLSX shape)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("xlsxw").toFile
    val file = new java.io.File(dir, "regions.xlsx").getAbsolutePath
    val df = Seq(
      ("Limburg", "Grubbenvorst", 3L), ("Limburg", "Horst", 5L),
      ("Brabant", "Eindhoven", 7L))
      .toDF("region", "station", "sensors")
    XlsxWriter.write(df, file, sheetBy = Some("region"))

    val zf = new ZipFile(file)
    try {
      val names = zf.stream().map(_.getName).toArray.map(_.toString).toSet
      assert(names.contains("xl/worksheets/sheet1.xml"))
      assert(names.contains("xl/worksheets/sheet2.xml"))
      assert(!names.contains("xl/worksheets/sheet3.xml"))
      val wb = new String(zf.getInputStream(
        zf.getEntry("xl/workbook.xml")).readAllBytes(), "UTF-8")
      // sheets sorted by region name
      assert(wb.indexOf("name=\"Brabant\"") < wb.indexOf("name=\"Limburg\""))
      val s2 = new String(zf.getInputStream(
        zf.getEntry("xl/worksheets/sheet2.xml")).readAllBytes(), "UTF-8")
      assert(s2.contains("Grubbenvorst") && s2.contains("Horst"))
      assert(!s2.contains("Eindhoven"))
    } finally zf.close()

    // XlsxSource reads the first sheet (Brabant) of a multi-sheet book
    val first = XlsxSource.read(spark, file).collect()
    assert(first.length == 1 && first(0).getString(1) == "Eindhoven")
  }

}
