package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.AirQuality

/** The forecast-page assembly pipeline (`scripts/forecast.pl`, 1,739
  * lines): the reference downloads a per-location hourly AQI forecast
  * (aqicn.org), zero-fills missing hours (`:333-351` pushes `0` into the
  * pm25 array for every gap hour), converts each AQI value back to a PM2.5
  * concentration (`GET_PM25`, `:232-244` — numeric inversion of the US EPA
  * AQI routine), maps the concentrations onto the presentation index
  * (LKI), rounds the index half-up to one decimal
  * (`int($aqi[0]*10+0.5)/10`, `:428`), attaches the class colour
  * (`sprintf("#%0.6X")`, `:429`) and quality qualifier (`:430`), and emits
  * the per-location JSON series arrays for the HTML template (`:416-446`
  * json_PM_forecast).
  *
  * Spark-first shape: the whole pipeline is one hash aggregate (hourly
  * AQI), a broadcast spine join (gap fill — the spine is one row per
  * bucket, tiny next to the facts), a stack of codegen'd scalar
  * expressions (closed-form AQI inverse + LKI piecewise + threshold
  * classification, zero UDFs), and a final per-location sort-collect.
  * At 100 TB the only shuffles are the hourly aggregate (map-side
  * partial) and the per-location collect, both keyed by (location, hour)
  * / location — no all-pairs or driver-side step anywhere.
  */
object Forecast {

  /** Assemble per-location forecast series.
    *
    * @param events raw observations
    * @param loc    location key column
    * @param ts     timestamp column
    * @param value  the hourly-averaged value is floored to an integer AQI
    *               forecast (aqicn.org serves integer AQI values)
    * @return one row per location: `loc, start_s, hours, pm25_json,
    *         lki_json, colors_json, qual_json` — start epoch + hour count
    *         (`forecast.pl:380-384` rts{start}/rts{hours}) and the four
    *         JSON arrays, hour-ordered, `null` entries for gap hours
    *         (`:419-426` emits undef for missing/zero values).
    */
  def assemble(events: DataFrame, loc: Column, ts: Column,
               value: Column): DataFrame = {
    // Hourly integer AQI forecast per location. roundStable before floor:
    // a group mean on a rounding boundary must floor identically in both
    // engines regardless of summation order.
    val hourly = events
      .groupBy(loc.as("loc"), Resample.bucketEpochS(ts, 3600).as("hr"))
      .agg(floor(Resample.roundStable(avg(value), 4)).as("aqi"))

    // Gap fill: every location gets the full global hour spine; missing
    // hours carry AQI 0 (forecast.pl:333-351's zero-push).
    val bounds = hourly.agg(min(col("hr")).as("lo"), max(col("hr")).as("hi"))
    val spine = hourly.select(col("loc")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("loc"),
        explode(sequence(col("lo"), col("hi"), lit(3600L))).as("hr"))
    val filled = spine.join(hourly, Seq("loc", "hr"), "left")
      .withColumn("aqi", coalesce(col("aqi"), lit(0L)))

    // Staged selects (the q51 pattern): each scalar is a large when-tree
    // referenced downstream — materialize as attributes so CollapseProject
    // doesn't inline the chain once per reference.
    val pm25 = filled.select(col("loc"), col("hr"),
      AirQuality.aqiPm25.inverseColumn(col("aqi")).as("pm25"))
    val lki = pm25.select(col("loc"), col("hr"), col("pm25"),
      (floor(AirQuality.lkiPm25.column(col("pm25")) * 10 + 0.5) / 10.0)
        .as("lki"))
    val classified = lki.select(col("loc"), col("hr"), col("pm25"), col("lki"),
      AirQuality.classify(col("lki"),
        AirQuality.lkiColorIndex, AirQuality.lkiColors).as("color"),
      AirQuality.classify(col("lki"),
        AirQuality.lkiQualityIndex, AirQuality.lkiQuality).as("qual"))

    // Hour-ordered series arrays: struct sort on the leading hr field
    // keeps the collect order-deterministic across partitioned runs.
    classified
      .groupBy(col("loc"))
      .agg(min(col("hr")).as("start_s"), count(lit(1)).as("hours"),
        sort_array(collect_list(struct(col("hr"), col("pm25"), col("lki"),
          col("color"), col("qual")))).as("s"),
        // The reference's stated PM10→PM2.5 regression (forecast.pl:36),
        // exercised over the series mean (pm10 proxied as 2×pm25, the same
        // synthetic pairing q51 uses).
        Resample.roundStable(
          pm10ToPm25(avg(col("pm25")) * 2), 1).as("pm25_from_pm10"))
      .select(col("loc"), col("start_s"), col("hours"),
        to_json(transform(col("s"), _.getField("pm25"))).as("pm25_json"),
        to_json(transform(col("s"), _.getField("lki"))).as("lki_json"),
        to_json(transform(col("s"), _.getField("color"))).as("colors_json"),
        to_json(transform(col("s"), _.getField("qual"))).as("qual_json"),
        col("pm25_from_pm10"))
  }

  /** PM10 → PM2.5 regression stated by the reference
    * (`scripts/forecast.pl:36`: "PM10 -> PM2.5 ~= 814.2 + 0.468*PM10" —
    * coefficients reproduced verbatim, intercept oddity included). */
  def pm10ToPm25(pm10: Column): Column = lit(814.2) + lit(0.468) * pm10

  /** SQL twin of [[pm10ToPm25]]. */
  def pm10ToPm25Sql(pm10: String): String = s"(814.2 + 0.468 * ($pm10))"

  // ------------------------------------------------------- weather half

  /** Epoch seconds → `yyyy-MM-ddTHH:mm:ssZ` by pure date/integer
    * arithmetic — NO `date_format(timestamp)` / `to_timestamp(pattern)`,
    * which render through the SESSION time zone and silently corrupt the
    * round-trip under a non-UTC session with DST (two fall-back instants
    * share one wall string). DATE arithmetic has no zone; `pmod` keeps it
    * total for pre-epoch instants. */
  private def epochToIsoZ(epochS: Column): Column = {
    val days = floor(epochS / 86400.0).cast("int")
    val rem = pmod(epochS, lit(86400L))
    concat(
      date_add(lit(java.sql.Date.valueOf("1970-01-01")), days).cast("string"),
      lit("T"), lpad((rem / 3600).cast("long").cast("string"), 2, "0"),
      lit(":"), lpad((pmod(rem, lit(3600L)) / 60).cast("long").cast("string"), 2, "0"),
      lit(":"), lpad(pmod(rem, lit(60L)).cast("string"), 2, "0"), lit("Z"))
  }

  /** Inverse of [[epochToIsoZ]] — same zone-free arithmetic. */
  private def isoZToEpoch(iso: Column): Column =
    datediff(to_date(substring(iso, 1, 10)),
        lit(java.sql.Date.valueOf("1970-01-01"))).cast("long") * 86400 +
      substring(iso, 12, 2).cast("long") * 3600 +
      substring(iso, 15, 2).cast("long") * 60 +
      substring(iso, 18, 2).cast("long")

  /** The yr.no document schema the reference consumes
    * (`forecast.pl:502-534` shows the payload shape;
    * `Get_weather_forecast :557-660` walks `timeseries[*].time` for the
    * start epoch / hour count and passes the series to the template). */
  private val YrNoSchema = org.apache.spark.sql.types.StructType.fromDDL(
    """properties STRUCT<timeseries: ARRAY<STRUCT<
      |  time: STRING,
      |  data: STRUCT<instant: STRUCT<details: STRUCT<
      |    air_temperature: DOUBLE,
      |    air_pressure_at_sea_level: DOUBLE,
      |    cloud_area_fraction: DOUBLE>>>>>>""".stripMargin.replace("\n", " "))

  /** The weather half of the forecast page: assemble a per-location
    * yr.no-shaped JSON forecast document, then do what the reference does
    * with one — parse the nested timeseries, find the earliest `time` as
    * the start epoch, count the hours, and emit the per-variable hourly
    * arrays for the chart template.
    *
    * The ENCODE leg is fixture plumbing (the sandbox has no egress, so
    * the document is synthesized from `events` exactly like the PNG/WAV
    * fixtures); the decode leg is the real operator: a full nested
    * `from_json` + explode + ISO-8601 parse — the semi-structured
    * ingestion shape every external-API source needs. An oracle computes
    * the same output closed-form from the base table, so a hash match
    * proves the JSON round-trip, not string plumbing.
    */
  def weatherSeries(events: DataFrame, loc: Column, ts: Column,
                    value: Column): DataFrame = {
    // hourly weather variables (deterministic synthetic mapping)
    val hourly = events
      .groupBy(loc.as("loc"), Resample.bucketEpochS(ts, 3600).as("hr"))
      .agg(Resample.roundStable(avg(value) / 10, 1).as("air_temperature"),
        Resample.roundStable(lit(990.0) + avg(value) / 20, 1)
          .as("air_pressure_at_sea_level"),
        Resample.roundStable(least(avg(value) / 5, lit(100.0)), 1)
          .as("cloud_area_fraction"))

    // ENCODE: one yr.no-shaped document per location
    val doc = hourly
      .groupBy(col("loc"))
      .agg(to_json(struct(struct(sort_array(collect_list(struct(
        epochToIsoZ(col("hr")).as("time"),
        struct(struct(struct(
          col("air_temperature"),
          col("air_pressure_at_sea_level"),
          col("cloud_area_fraction")).as("details")).as("instant"))
          .as("data")))).as("timeseries")).as("properties")))
        .as("payload"))

    // DECODE: the reference's walk — nested parse, explode, time scan
    val parsed = doc.select(col("loc"),
      from_json(col("payload"), YrNoSchema).as("w"))
    val rows = parsed
      .select(col("loc"), explode(col("w.properties.timeseries")).as("t"))
      .select(col("loc"),
        isoZToEpoch(col("t.time")).as("hr"),
        col("t.data.instant.details.air_temperature").as("temp"),
        col("t.data.instant.details.air_pressure_at_sea_level").as("pres"),
        col("t.data.instant.details.cloud_area_fraction").as("cloud"))
    rows.groupBy(col("loc"))
      .agg(min(col("hr")).as("start_s"), count(lit(1)).as("hours"),
        sort_array(collect_list(struct(col("hr"), col("temp"), col("pres"),
          col("cloud")))).as("s"))
      .select(col("loc"), col("start_s"), col("hours"),
        to_json(transform(col("s"), _.getField("temp"))).as("temp_json"),
        to_json(transform(col("s"), _.getField("pres"))).as("pressure_json"),
        to_json(transform(col("s"), _.getField("cloud"))).as("cloud_json"))
  }
}
