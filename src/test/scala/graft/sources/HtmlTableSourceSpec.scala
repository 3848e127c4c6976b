package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** S7 — HTML scrape source. The fixture mimics the NRWF measurement pages
  * the reference walks (Get_data.pl:1746-1830): a station table with
  * `<th scope=col>` labels, unit-bearing numeric cells, `&nbsp;` empties,
  * and surrounding page chrome that must be ignored. */
class HtmlTableSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def page(body: String): String =
    s"""<!DOCTYPE html><html><head><title>Messwerte</title></head>
       |<body><h1>Station Nettetal-Kaldenkirchen</h1>
       |$body
       |<p>Impressum</p></body></html>""".stripMargin

  private def write(dir: Path, name: String, html: String): Unit =
    Files.write(dir.resolve(name), html.getBytes(UTF_8))

  test("NRWF-shaped measurement table: header, units, types, empties") {
    val dir = Files.createTempDirectory("html")
    write(dir, "heute.html", page(
      """<table class="mwtab">
        |<tr><th scope=col class=mw_k>Zeit</th>
        |    <th scope=col class=mw_k>Ozon</th>
        |    <th scope=col class=mw_k>Staub/PM10</th>
        |    <th scope=col class=mw_k>LTem</th></tr>
        |<tr><td class=mw_v>01:00</td><td class=mw_v>48&nbsp;µg/m³</td>
        |    <td class=mw_v>12,3</td><td class=mw_v>-1,5 &#176;C</td></tr>
        |<tr><td class=mw_v>02:00</td><td class=mw_leer>&nbsp;</td>
        |    <td class=mw_v>8</td><td class=mw_v>-2,0</td></tr>
        |</table>""".stripMargin))
    val df = HtmlTableSource.read(spark, dir.resolve("heute.html").toString)
    assert(df.columns.toSeq == Seq("Zeit", "Ozon", "Staub/PM10", "LTem"))
    assert(df.schema("Ozon").dataType.typeName == "long")
    assert(df.schema("Staub/PM10").dataType.typeName == "double")
    assert(df.schema("LTem").dataType.typeName == "double")
    val rows = df.orderBy("Zeit").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "01:00")
    assert(rows(0).getLong(1) == 48L)      // unit text stripped
    assert(rows(0).getDouble(2) == 12.3)   // decimal comma
    assert(rows(0).getDouble(3) == -1.5)   // sign kept, degree junk dropped
    assert(rows(1).isNullAt(1))            // mw_leer empty cell
  }

  test("many pages distribute: one DataFrame over a directory glob") {
    val dir = Files.createTempDirectory("html")
    (1 to 5).foreach { d =>
      write(dir, s"day$d.html", page(
        s"""<table><tr><th>h</th><th>pm10</th></tr>
           |<tr><td>0$d:00</td><td>${d * 10}</td></tr>
           |<tr><td>0$d:30</td><td>${d * 10 + 1}</td></tr></table>""".stripMargin))
    }
    val df = HtmlTableSource.read(spark, dir.toString + "/*.html")
    assert(df.count() == 10)
    assert(df.agg(org.apache.spark.sql.functions.sum("pm10")).head.getLong(0)
      == (1 to 5).map(d => d * 20 + 1).sum)
  }

  test("entity decoding and nested markup inside cells") {
    val dir = Files.createTempDirectory("html")
    write(dir, "x.html", page(
      """<table><tr><th>name</th><th>v</th></tr>
        |<tr><td><b>Horst</b> &amp; <i>Maas</i></td><td>7</td></tr>
        |<tr><td>&#72;uis &lt;3&gt;</td><td>9</td></tr></table>""".stripMargin))
    val df = HtmlTableSource.read(spark, dir.resolve("x.html").toString)
    val names = df.orderBy("v").collect().map(_.getString(0)).toSeq
    assert(names == Seq("Horst & Maas", "Huis <3>"))
  }

  test("astral numeric character references decode via surrogate pairs") {
    // U+1F600 in decimal and hex — Int.toChar would truncate to a wrong
    // BMP char; Character.toChars must yield the real astral codepoint
    assert(HtmlTableSource.decodeEntities("&#128512;") == "😀")
    assert(HtmlTableSource.decodeEntities("&#x1F600;") == "😀")
    // out-of-range reference stays literal instead of throwing
    assert(HtmlTableSource.decodeEntities("&#1114112;") == "&#1114112;")
    assert(HtmlTableSource.decodeEntities("a&#72;&#x1F4A9;b") == "aH💩b")
  }

  test("numericText property: every Some parses as a finite Double") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genCell = Gen.oneOf(
      Gen.chooseNum(-1e6, 1e6).map(d => f"$d%.2f µg/m³"),
      Gen.chooseNum(-1e6, 1e6).map(d => f"$d%.1f".replace('.', ',')),
      Gen.alphaStr, Gen.asciiPrintableStr)
    val p = Prop.forAll(genCell) { s =>
      HtmlTableSource.numericText(s).forall { t =>
        val d = t.toDouble // throws → property fails
        java.lang.Double.isFinite(d)
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.passed, res.status.toString)
  }

  test("numericText mirrors the reference sanitizer") {
    assert(HtmlTableSource.numericText("48 µg/m³").contains("48"))
    assert(HtmlTableSource.numericText("12,3").contains("12.3"))
    assert(HtmlTableSource.numericText("-1,5 °C").contains("-1.5"))
    assert(HtmlTableSource.numericText("n/a").isEmpty)
    assert(HtmlTableSource.numericText("").isEmpty)
    assert(HtmlTableSource.numericText("v1.2.3").contains("1.23"))
  }
}
