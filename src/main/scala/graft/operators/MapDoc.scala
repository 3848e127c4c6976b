package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Leaflet station-map document — the reference's regional map page
  * (`SamenMetenTools/Things2HTML.py`). The Python walks a pandas frame of
  * station info and builds a folium map: one MarkerCluster overlay per
  * calendar year in the observed period plus a "stations zonder metingen"
  * layer (`InitOverlays` :223-252), a marker per station per year it was
  * active (`Data2Map` :502-585), marker color/icon/description decided by
  * a regex cascade over the station's joined sensor names
  * (`GetMarkerAttr` :296-358), and a popup with first/last measurement
  * dates. Data semantics kept exactly (the part an oracle can check):
  *
  *  - a sensor with observations puts its station on EVERY year overlay
  *    from `first.year` through `last.year` (:560-564 `range(first.year,
  *    last.year+1)`), and the marker's attrs come from the set of sensors
  *    active that year;
  *  - the attr cascade counts `pm` occurrences in the comma-joined sensor
  *    set (1 → cog, 2 → cogs, ≥3 → spinner/cadetblue) and then picks
  *    color/description by which PM fractions appear, including the
  *    reference's quirks: `pm1` alone at end-of-string matches nothing
  *    (`pm(1|₁)[^\d]` needs a trailing char, :317) and a {pm1, pm10} pair
  *    reports `PM₂.₅, PM₁₀` (:311 tests only for pm10); gas branches
  *    co→no→o→nh in that order, then palmes, then temperatuur/RH;
  *  - the reference joins the sensor *set* in Python iteration order,
  *    which is run-nondeterministic — this engine canonicalizes to the
  *    binary-sorted join so the same data always renders the same map;
  *  - a station missing ANY sensor present elsewhere in the corpus gets a
  *    cadetblue "Geen metingen" CircleMarker on the no-measurements layer
  *    (:544-547 `add_year(None,None)` fires per union-sensor the station
  *    lacks; :425 renders it);
  *  - locations round to 3 decimals on the marker (:401), popup carries
  *    station-level `Eerste/Laatste meting` dates (:577-581).
  *
  * Spark-first shape: two aggregations — (station, sensor) first/last
  * with map-side combine, then the year explode and (station, year)
  * sensor-set collect — plus one scalar broadcast for the corpus-wide
  * sensor count. Everything is codegen'd Column algebra; only the final
  * document splice collects, bounded by stations×years (a report
  * artifact, same contract as ChartDoc/XlsxWriter). `parseMarkers` reads
  * the emitted marker vars back distributively, so render→parse is an
  * oracle-checkable round trip (q90).
  */
object MapDoc {

  /** folium.Icon attrs from a sorted sensor-name array — the
    * `GetMarkerAttr` cascade on the comma-joined, lowercased set. Returns
    * struct(color, icon, prefix, icon_color, description). */
  def markerAttrs(pols: Column): Column = {
    val m = lower(concat_ws(",", pols))
    val pmc = ((length(m) - length(regexp_replace(m, "pm", ""))) / 2)
      .cast("int")
    val cogIcon = when(pmc >= 2, "cogs").otherwise("cog")
    def a(color: Column, icon: Column, desc: Column) =
      struct(color.as("color"), icon.as("icon"), lit("fa").as("prefix"),
        lit("white").as("icon_color"), desc.as("description"))
    def g(icon: String, desc: String) =
      a(lit("lightgray"), lit(icon), lit(desc))
    val noDesc = lit(null).cast("string")
    when(pmc >= 1,
      when(pmc >= 3, a(lit("cadetblue"), lit("spinner"),
          lit("PM₁, PM₂.₅, PM₁₀")))
        .when(pmc === 2 && m.rlike("pm(10|₁₀)"),
          a(lit("cadetblue"), lit("cogs"), lit("PM₂.₅, PM₁₀")))
        .when(pmc === 2 && m.rlike("pm(2[.,]?5|₂.₅)"),
          a(lit("cadetblue"), lit("cogs"), lit("PM₁, PM₂.₅")))
        .when(m.rlike("pm(1|₁)[^0-9]"), a(lit("lightblue"), cogIcon, lit("PM₁")))
        .when(m.rlike("pm(2[.,]?5|₂.₅)"), a(lit("cadetblue"), cogIcon, lit("PM₂.₅")))
        .when(m.rlike("pm(10|₁₀)"), a(lit("blue"), cogIcon, lit("PM₁₀")))
        .otherwise(a(lit("lightgray"), cogIcon, noDesc)))
      .when(m.rlike("co[0-9]"), g("cloud", "CO₂"))
      .when(m.rlike("no[0-9]"), g("cloud", "stikstof"))
      .when(m.rlike("o[0-9]"), g("cloud", "ozon"))
      .when(m.rlike("nh[0-9]"), g("cloud", "ammoniak"))
      .when(m.rlike("palmes"), g("cloud-downloud", "gas (Palmes)"))
      .when(m.rlike("temperatuur|rh"), g("thermometer-3", "°C en RH%"))
      .otherwise(a(lit("lightgray"), lit("guestion"), noDesc))
  }

  /** One row per map marker: `(st, yr, lat, lon, color, icon, prefix,
    * icon_color, description, pols, first_d, last_d)` — `yr` NULL for the
    * "Geen metingen" circle a station gets when it lacks a union sensor
    * (those rows carry color=cadetblue and NULL icon attrs, the
    * CircleMarker's rendering). Distributed end to end; two shuffles,
    * both post-aggregation tiny. */
  def stationYearMarkers(events: DataFrame, station: Column, sensor: Column,
                         tsS: Column, lat: Column, lon: Column): DataFrame = {
    val base = events.select(station.as("st"), sensor.as("sensor"),
      tsS.as("t"), lat.as("lat"), lon.as("lon"))
    val perSensor = base.groupBy(col("st"), col("sensor"))
      .agg(min(col("t")).as("tf"), max(col("t")).as("tl"),
        max(col("lat")).as("lat"), max(col("lon")).as("lon"))
    val stationLevel = perSensor.groupBy(col("st"))
      .agg(min(col("tf")).as("t0"), max(col("tl")).as("t1"),
        countDistinct(col("sensor")).as("nsens"),
        max(col("lat")).as("lat"), max(col("lon")).as("lon"))
      .withColumn("first_d",
        date_format(timestamp_seconds(col("t0")), "yyyy-MM-dd"))
      .withColumn("last_d",
        date_format(timestamp_seconds(col("t1")), "yyyy-MM-dd"))
    val unionCount = base.agg(countDistinct(col("sensor")).as("total"))
    val byYear = perSensor
      .select(col("st"), col("sensor"),
        explode(sequence(year(timestamp_seconds(col("tf"))),
          year(timestamp_seconds(col("tl"))))).as("yr"))
      .groupBy(col("st"), col("yr"))
      .agg(sort_array(collect_set(col("sensor"))).as("pols_arr"))
      .withColumn("attrs", markerAttrs(col("pols_arr")))
      .select(col("st"), col("yr"),
        concat_ws(",", col("pols_arr")).as("pols"), col("attrs.*"))
    val yearRows = byYear.join(stationLevel
        .select(col("st"), col("lat"), col("lon"),
          col("first_d"), col("last_d")), Seq("st"))
    val circleRows = stationLevel
      .crossJoin(broadcast(unionCount)) // single-row scalar bound
      .where(col("nsens") < col("total"))
      .select(col("st"), lit(null).cast("int").as("yr"),
        lit(null).cast("string").as("pols"),
        lit("cadetblue").as("color"), lit(null).cast("string").as("icon"),
        lit(null).cast("string").as("prefix"),
        lit(null).cast("string").as("icon_color"),
        lit(null).cast("string").as("description"),
        col("lat"), col("lon"), col("first_d"), col("last_d"))
    yearRows.unionByName(circleRows)
      .select(col("st"), col("yr"), round(col("lat"), 3).as("lat"),
        round(col("lon"), 3).as("lon"), col("color"), col("icon"),
        col("prefix"), col("icon_color"), col("description"), col("pols"),
        col("first_d"), col("last_d"))
  }

  /** Splice markers into one Leaflet document: per-year overlay clusters
    * plus the no-measurements layer, a JSON var per marker and the
    * L.marker/L.circleMarker call referencing it (Things2HTML.py
    * InitOverlays/AddMarker2Layer). Driver-side, bounded by marker count
    * — a report artifact. */
  def document(markers: DataFrame, title: String = "Things stations"): String = {
    val js = markers.select(to_json(struct(
        col("st"), col("yr"), col("lat"), col("lon"), col("color"),
        col("icon"), col("prefix"), col("icon_color"), col("description"),
        col("pols"), col("first_d"), col("last_d"))).as("j"),
        col("st"), col("yr"), col("lat"), col("lon"))
      .collect() // bounded: one row per station×year marker
      .map(r => (r.getString(0), r.getInt(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        r.getDouble(3), r.getDouble(4)))
      .sortBy { case (_, st, yr, _, _) => (st, yr.getOrElse(-1)) }
    val sb = new StringBuilder
    sb.append("<html><head><script src=\"leaflet.js\"></script></head><body>\n")
    sb.append(s"""<h1 style="position:absolute;z-index:100000;left:40vw">$title</h1>\n""")
    sb.append("<div id=\"map\"></div>\n<script>\n")
    sb.append(
      """function icn(m) { return L.AwesomeMarkers.icon({icon: m.icon,
        |  prefix: m.prefix, markerColor: m.color, iconColor: m.icon_color}); }
        |function pop(m) { var t = '<h4 align="left">Station S' + m.st + '</h4>';
        |  if (m.pols) t += '<h5><i>Sensors</i>: ' + m.pols + '</h5>';
        |  if (m.first_d) t += '<br>Eerste meting: ' + m.first_d + '</br>';
        |  if (m.last_d) t += '<br>Laatste meting: ' + m.last_d + '</br>';
        |  return t; }
        |""".stripMargin)
    val lats = js.map(_._4); val lons = js.map(_._5)
    sb.append(s"var map = L.map('map').setView([${r3(avg0(lats))}, ${r3(avg0(lons))}], 11);\n")
    sb.append(s"map.fitBounds([[${r3(lats.min)}, ${r3(lons.min)}], [${r3(lats.max)}, ${r3(lons.max)}]]);\n")
    sb.append("var OV_none = L.markerClusterGroup();\n")
    js.flatMap(_._3).distinct.sorted.foreach { y =>
      sb.append(s"var OV_$y = L.markerClusterGroup();\n")
    }
    js.zipWithIndex.foreach { case ((j, _, yr, lat, lon), i) =>
      sb.append(s"var MK_$i = $j;\n")
      yr match {
        case Some(y) => sb.append(
          s"L.marker([$lat, $lon], {icon: icn(MK_$i)})" +
            s".bindPopup(pop(MK_$i)).addTo(OV_$y);\n")
        case None => sb.append(
          s"L.circleMarker([$lat, $lon], {stroke: false, fill: true, " +
            s"fillOpacity: 0.6, radius: 10, color: 'cadetblue'})" +
            s".bindPopup(pop(MK_$i) + '<h5>Geen metingen</h5>').addTo(OV_none);\n")
      }
    }
    sb.append("</script>\n</body></html>\n")
    sb.toString
  }

  private def avg0(xs: Array[Double]): Double =
    if (xs.isEmpty) 0.0 else xs.sum / xs.length
  private def r3(x: Double): Double = math.rint(x * 1000) / 1000

  private val MarkerSchema =
    "st INT, yr INT, lat DOUBLE, lon DOUBLE, color STRING, icon STRING, " +
      "prefix STRING, icon_color STRING, description STRING, pols STRING, " +
      "first_d STRING, last_d STRING"

  /** Distributed parse-back of an emitted map document: recovers every
    * marker row, NULL `yr` for the no-measurements circles. */
  def parseMarkers(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(regexp_extract(col("value"),
        "^var MK_\\d+ = (\\{.*\\});$", 1).as("j"))
      .where(col("j") =!= "")
      .select(from_json(col("j"), org.apache.spark.sql.types.StructType
        .fromDDL(MarkerSchema)).as("m"))
      .select(col("m.*"))
}
