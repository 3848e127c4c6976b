package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Things2HTML station map (SamenMetenTools/Things2HTML.py:296-358
  * GetMarkerAttr, :502-585 Data2Map): the marker-attr regex cascade with
  * the reference's quirks, per-sensor year fan-out, the union-sensor
  * "Geen metingen" circle, and the render→parse round trip. */
class MapDocSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def attrs(pols: Seq[String]): (String, String, Option[String]) = {
    import spark.implicits._
    val r = Seq(pols).toDF("p")
      .select(MapDoc.markerAttrs(sort_array(col("p"))).as("a"))
      .select(col("a.color"), col("a.icon"), col("a.description"))
      .collect().head
    (r.getString(0), r.getString(1),
      if (r.isNullAt(2)) None else Some(r.getString(2)))
  }

  test("GetMarkerAttr cascade incl. the reference's quirks") {
    assert(attrs(Seq("pm1", "pm25", "pm10")) ==
      (("cadetblue", "spinner", Some("PM₁, PM₂.₅, PM₁₀"))))
    assert(attrs(Seq("pm25", "pm10")) == (("cadetblue", "cogs", Some("PM₂.₅, PM₁₀"))))
    assert(attrs(Seq("pm1", "pm25")) == (("cadetblue", "cogs", Some("PM₁, PM₂.₅"))))
    // quirk: {pm1, pm10} hits the pm10 test first → reports PM₂.₅, PM₁₀
    assert(attrs(Seq("pm1", "pm10")) == (("cadetblue", "cogs", Some("PM₂.₅, PM₁₀"))))
    // quirk: lone trailing pm1 fails pm(1)[^\d] (needs a char after) →
    // lightgray cog with no description; a sensor after it restores PM₁
    assert(attrs(Seq("pm1")) == (("lightgray", "cog", None)))
    assert(attrs(Seq("pm1", "rh")) == (("lightblue", "cog", Some("PM₁"))))
    assert(attrs(Seq("pm25")) == (("cadetblue", "cog", Some("PM₂.₅"))))
    assert(attrs(Seq("pm10")) == (("blue", "cog", Some("PM₁₀"))))
    // gas cascade order co → no → o → nh; pm wins over gas
    assert(attrs(Seq("co2", "no2", "o3")) == (("lightgray", "cloud", Some("CO₂"))))
    assert(attrs(Seq("no2", "o3")) == (("lightgray", "cloud", Some("stikstof"))))
    assert(attrs(Seq("o3")) == (("lightgray", "cloud", Some("ozon"))))
    assert(attrs(Seq("nh3")) == (("lightgray", "cloud", Some("ammoniak"))))
    assert(attrs(Seq("palmes")) == (("lightgray", "cloud-downloud", Some("gas (Palmes)"))))
    assert(attrs(Seq("temperatuur", "RH")) ==
      (("lightgray", "thermometer-3", Some("°C en RH%"))))
    assert(attrs(Seq()) == (("lightgray", "guestion", None)))
  }

  // (station, sensor, tSeconds) with fixed synthetic location per station
  private def markers(rows: Seq[(Int, String, Long)]) = {
    import spark.implicits._
    MapDoc.stationYearMarkers(rows.toDF("st", "sensor", "t"),
      col("st"), col("sensor"), col("t"),
      lit(51.0) + col("st") * 0.0005, lit(5.0) + col("st") * 0.001)
  }

  private val Y2023 = 1672531200L // 2023-01-01T00:00:00Z

  test("sensor active years fan the station onto every overlay in range") {
    val y = 365L * 86400
    val got = markers(Seq(
      (1, "pm25", Y2023), (1, "pm25", Y2023 + 2 * y),     // 2023..2024
      (1, "no2", Y2023 + 2 * y),                          // 2024 only
      (2, "no2", Y2023 + 30))).collect()
    val byKey = got.map(r => (r.getInt(0),
      if (r.isNullAt(1)) None else Some(r.getInt(1))) -> r).toMap
    // station 1: pm25 spans 2023-2024, no2 only 2024 → 2023 marker is
    // pm25-alone (cadetblue cog), 2024 is {no2, pm25} (still pm wins)
    assert(byKey((1, Some(2023))).getAs[String]("pols") == "pm25")
    assert(byKey((1, Some(2023))).getAs[String]("icon") == "cog")
    assert(byKey((1, Some(2024))).getAs[String]("pols") == "no2,pm25")
    assert(byKey((1, Some(2024))).getAs[String]("description") == "PM₂.₅")
    // station 2 lacks pm25 (a union sensor) → gets the Geen-metingen
    // circle; station 1 lacks nothing → no circle row
    assert(byKey.contains((2, None)))
    assert(!byKey.contains((1, None)))
    assert(byKey((2, None)).getAs[String]("color") == "cadetblue")
    assert(byKey((2, None)).getAs[String]("icon") == null)
    // popup dates are station-level first/last
    assert(byKey((1, Some(2023))).getAs[String]("first_d") == "2023-01-01")
    assert(byKey((1, Some(2024))).getAs[String]("last_d") == "2024-12-31")
    // marker locations round to 3 decimals
    assert(byKey((2, None)).getAs[Double]("lat") == 51.001)
  }

  test("document → parseMarkers round trip recovers every marker row") {
    val y = 365L * 86400
    val rows = (0 until 6).flatMap { st =>
      Seq((st, if (st % 2 == 0) "pm25" else "o3", Y2023 + st * 1000),
        (st, "RH", Y2023 + y + st * 1000))
    }
    val m = markers(rows)
    val f = java.nio.file.Files.createTempDirectory("mapdoc").resolve("m.html")
    java.nio.file.Files.writeString(f, MapDoc.document(m))
    val doc = java.nio.file.Files.readString(f)
    assert(doc.contains("L.markerClusterGroup()") && doc.contains("OV_none"))
    assert(doc.contains("L.circleMarker"))
    val back = MapDoc.parseMarkers(spark, f.toString)
    val a = m.orderBy("st", "yr").collect().map(_.toString).toSeq
    val b = back.orderBy("st", "yr").collect().map(_.toString).toSeq
    assert(a == b)
  }
}
