package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SensorTypes packed-fields parser — SURVEY §2.4 F2 proper.
  *
  * The reference keeps its whole per-product field/unit/calibration
  * catalogue in ONE packed varchar per product
  * (`MyDatacollector/MySQLdbSetup.sql:74`, data `:85`):
  *
  *   fields  := entry (';' entry)*
  *   entry   := name ',' unit [',' cal]
  *   cal     := ref ('|' ref)*          — per-reference Taylor coefficients
  *   ref     := REFTYPE '/' a0 '/' a1
  *
  * e.g. `pm25,ug/m3,PMSx003/1.6190/1.5450|SPS30/2.1630/0.7645|BAM1020/…`.
  *
  * `MyDatacollector.py:351-390 (SensorInfo)` splits this on `;`/`,` and
  * `getCalibration` (`:351-360`) resolves the coefficients against the
  * configured `CalRefs` priority list: for each ref (in priority order)
  * it first applies the self-calibration guard — the compiled regex
  * `ref + "/.*"` matched (case-insensitively, anchored) against the
  * product's own `matching` type; a hit returns None ("do not calibrate
  * against similar sensor type"), note the literal pattern only fires on
  * slash-suffixed type strings — then returns the first `|`-entry the
  * same regex matches. No entry for any ref → None → identity [0,1]
  * Taylor.
  *
  * Everything here is pure `Column` string algebra (codegen'd, no UDFs):
  * the dimension is a handful of rows broadcast into the fact-side
  * calibration joins, exactly like the reference's 12-h SensorsCache.
  */
object SensorTypes {

  /** Verbatim rows from the reference catalogue (MySQLdbSetup.sql:85) —
    * published hardware constants: (product, matching, producer,
    * category, fields). Subset: the dust products with calibrations plus
    * representative meteo/location products without. */
  val CatalogRows: Seq[(String, String, String, String, String)] = Seq(
    ("SDS011", "SDS011", "Nova", "dust",
      "pm25,ug/m3,PMSx003/1.6190/1.5450|SPS30/2.1630/0.7645|BAM1020/5.7590/0.3769;" +
      "pm10,ug/m3,PMSx003/3.7600/1.1570|SPS30/1.6890/0.6322|BAM1020/1.4370/0.4130"),
    ("SPS30", "SPS30", "Sensirion", "dust",
      "pm1,ug/m3;pm25,ug/m3,PMSx003/-1.0990/1.8350|SDS011/-2.1630/1.3080|BAM1020/4.2550/0.5371;" +
      "pm10,ug/m3,PMSx003/2.3970/1.6660|SDS011/-1.6890/1.5817|BAM1020/13.1300/0.6438;" +
      "pm05_cnt,pcs/cm3;pm1_cnt,pcs/cm3;pm25_cnt,pcs/cm3;pm4_cnt,pcs/cm3;pm10_cnt,pcs/cm3;grain,um"),
    ("PMSx003", "PMS[57X]003", "Plantower", "dust",
      "pm1,ug/m3,SDS011/-1.6190/0.6472|SPS30/1.0990/0.5450|BAM1020/-4.7860/3.8476;" +
      "pm25,ug/m3,SDS011/-1.6190/0.6472|SPS30/1.0990/0.5450|BAM1020/-4.7860/3.8476;" +
      "pm10,ug/m3,SDS011/-3.7600/0.8643|SPS30/-2.3970/0.6002|BAM1020/-13.6900/3.8417;" +
      "pm03_cnt,pcs/dm3;pm05_cnt,pcs/dm3;pm1_cnt,pcs/dm3;pm25_cnt,pcs/dm3;pm5_cnt,pcs/dm3;pm10_cnt,pcs/dm3;grain,um"),
    ("PPD42NS", "PPD42NS", "Shiney", "dust", "pm25,pcs/0.01qft;pm10,pcs/0.01qft"),
    ("DC1100 PRO", "DC1100.*", "Dylos", "dust", "pm25,pcs/0.01qft;pm10,pcs/0.01qft"),
    ("DHT22", "DHT(11|22)", "Adafruit", "meteo", "temp,C;rv,%"),
    ("BME280", "BME280", "Bosch", "meteo", "temp,C;rv,%;luchtdruk,hPa"),
    ("BME680", "BME680", "Bosch", "meteo", "temp,C;rv,%;luchtdruk,hPa;gas,kOhm;aqi,%"),
    ("SHT31", "SHT[23]1", "Sensirion", "meteo", "temp,C;rv,%"),
    ("NEO-6", "NEO-6", "NEO", "location", "geohash,geohash;altitude,m"))

  /** The catalogue as a (broadcastable) dimension frame. */
  def catalog(spark: SparkSession): DataFrame = {
    import spark.implicits._
    CatalogRows.toDF("product", "matching", "producer", "category", "fields")
  }

  /** `fields` varchar → array<struct<field,unit,cal>>; `cal` is the raw
    * `REF/a0/a1|…` tail, null when the entry has no calibration part. */
  def parseFields(packed: Column): Column =
    transform(split(packed, ";"), one => struct(
      get(split(one, ","), lit(0)).as("field"),
      get(split(one, ","), lit(1)).as("unit"),
      when(size(split(one, ",")) >= 3, get(split(one, ","), lit(2))).as("cal")))

  private val coefType = "struct<ref:string,a0:double,a1:double>"

  /** `getCalibration` as a column: resolve `cal` against the CalRefs
    * priority list given the product's `matching` type. Returns
    * struct(ref, a0, a1) or null (= identity Taylor). Mirrors the
    * reference exactly, including the guard's literal `ref + "/.*"`
    * pattern (`MyDatacollector.py:351-360`). */
  def resolveCalibration(cal: Column, matching: Column,
                         refs: Seq[String]): Column = {
    val entries = split(cal, "\\|")
    val nul = lit(null).cast(coefType)
    refs.foldRight(nul) { (ref, rest) =>
      val pat = lit(s"(?i)^$ref/.*")
      val entry = get(filter(entries, e => regexp_like(e, pat)), lit(0))
      when(regexp_like(matching, pat), nul) // self-calibration guard
        .when(entry.isNotNull, struct(
          get(split(entry, "/"), lit(0)).as("ref"),
          get(split(entry, "/"), lit(1)).cast("double").as("a0"),
          get(split(entry, "/"), lit(2)).cast("double").as("a1")))
        .otherwise(rest)
    }
  }

  /** Parsed + resolved per-(product, field) calibration dimension:
    * columns product, field, unit, ref, a0, a1 (identity [0,1] when no
    * ref resolves — the reference's "similar to [0,1] Taylor"). */
  def fieldDim(spark: SparkSession, refs: Seq[String]): DataFrame = {
    val f = catalog(spark)
      .select(col("product"), col("matching"),
        explode(parseFields(col("fields"))).as("f"))
    f.select(col("product"), col("f.field").as("field"),
        col("f.unit").as("unit"),
        resolveCalibration(col("f.cal"), col("matching"), refs).as("c"))
      .select(col("product"), col("field"), col("unit"),
        coalesce(col("c.ref"), lit("none")).as("ref"),
        coalesce(col("c.a0"), lit(0.0)).as("a0"),
        coalesce(col("c.a1"), lit(1.0)).as("a1"))
  }

  // ------------------------------------------------------------ SQL twins

  /** The catalogue as a DuckDB VALUES list — generated from the SAME
    * literals as [[catalog]]. */
  def catalogSqlValues: String =
    CatalogRows.map { case (p, m, _, _, f) =>
      s"('${p.replace("'", "''")}', '$m', '$f')"
    }.mkString(", ")

  /** DuckDB twin of [[resolveCalibration]]: emits the entry-string CASE
    * chain; callers split the result on '/'. */
  def resolveCalSqlCase(cal: String, matching: String,
                        refs: Seq[String]): String = {
    val arms = refs.map { ref =>
      val pat = s"(?i)^$ref/.*"
      val hit = s"len(list_filter(string_split($cal, '|'), e -> regexp_matches(e, '$pat'))) > 0"
      val first = s"list_filter(string_split($cal, '|'), e -> regexp_matches(e, '$pat'))[1]"
      s"WHEN regexp_matches($matching, '$pat') THEN NULL WHEN $hit THEN $first"
    }.mkString(" ")
    s"CASE $arms ELSE NULL END"
  }

  /** DuckDB CTE block producing the same (product, field, unit, ref,
    * a0, a1) rows as [[fieldDim]]; embed with `WITH $x, …`. */
  def fieldDimSqlCtes(refs: Seq[String]): String =
    s"""sensor_dim(product, matching, fields) AS (VALUES $catalogSqlValues),
        sd_f AS (SELECT product, matching,
                   unnest(string_split(fields, ';')) AS one FROM sensor_dim),
        sd_p AS (SELECT product, matching, string_split(one, ',') AS parts FROM sd_f),
        sd_pf AS (SELECT product, matching, parts[1] AS field, parts[2] AS unit,
                    CASE WHEN len(parts) >= 3 THEN parts[3] END AS cal FROM sd_p),
        sd_e AS (SELECT product, field, unit,
                   ${resolveCalSqlCase("cal", "matching", refs)} AS entry FROM sd_pf),
        sensor_fields AS (SELECT product, field, unit,
                   coalesce(string_split(entry, '/')[1], 'none') AS ref,
                   coalesce(TRY_CAST(string_split(entry, '/')[2] AS DOUBLE), 0.0) AS a0,
                   coalesce(TRY_CAST(string_split(entry, '/')[3] AS DOUBLE), 1.0) AS a1
                 FROM sd_e)"""
}
