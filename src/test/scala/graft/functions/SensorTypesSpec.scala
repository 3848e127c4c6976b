package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SensorTypesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("parseFields splits the packed varchar into (field, unit, cal)") {
    val out = Seq("pm25,ug/m3,SDS011/-2.163/1.308|BAM1020/4.255/0.5371;temp,C")
      .toDF("fields")
      .select(explode(SensorTypes.parseFields(col("fields"))).as("f"))
      .select("f.field", "f.unit", "f.cal").collect()
    assert(out.length == 2)
    assert(out(0).getString(0) == "pm25" && out(0).getString(1) == "ug/m3" &&
      out(0).getString(2) == "SDS011/-2.163/1.308|BAM1020/4.255/0.5371")
    assert(out(1).getString(0) == "temp" && out(1).getString(1) == "C" &&
      out(1).isNullAt(2))
  }

  test("resolveCalibration honours CalRefs priority order") {
    val cal = "PMSx003/-1.099/1.835|SDS011/-2.163/1.308|BAM1020/4.255/0.5371"
    def resolve(refs: Seq[String]) =
      Seq((cal, "SPS30")).toDF("cal", "matching")
        .select(SensorTypes.resolveCalibration(col("cal"), col("matching"), refs).as("c"))
        .select("c.ref", "c.a0", "c.a1").head()
    val r1 = resolve(Seq("SDS011", "BAM1020"))
    assert(r1.getString(0) == "SDS011" && r1.getDouble(1) == -2.163 &&
      r1.getDouble(2) == 1.308)
    val r2 = resolve(Seq("BAM1020", "SDS011"))
    assert(r2.getString(0) == "BAM1020" && r2.getDouble(1) == 4.255)
    // case-insensitive, like the reference's re.I
    assert(resolve(Seq("bam1020")).getString(0) == "BAM1020")
  }

  test("self-calibration guard fires on slash-suffixed types, else falls through") {
    val cal = "SDS011/-2.163/1.308|BAM1020/4.255/0.5371"
    def resolve(matching: String, refs: Seq[String]) =
      Seq((cal, matching)).toDF("cal", "matching")
        .select(SensorTypes.resolveCalibration(col("cal"), col("matching"), refs).as("c"))
        .head()
    // The reference guard pattern is `ref + "/.*"` (MyDatacollector.py:
    // 355): it matches only a slash-suffixed own-type string → None,
    // aborting resolution entirely (not skipping to the next ref).
    assert(resolve("SDS011/nova", Seq("SDS011", "BAM1020")).isNullAt(0))
    // a plain own-type string does NOT match the literal pattern, so
    // resolution proceeds (the catalogue never lists a product under its
    // own cal string, which is what prevents self-calibration in data)
    assert(resolve("SDS011", Seq("SDS011", "BAM1020"))
      .getStruct(0).getString(0) == "SDS011")
  }

  test("fieldDim: identity [0,1] for products without a resolvable ref") {
    val dim = SensorTypes.fieldDim(spark, Seq("SDS011", "BAM1020"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // PPD42NS pm25 carries no cal → identity
    val ppd = dim(("PPD42NS", "pm25"))
    assert(ppd.getAs[String]("ref") == "none" &&
      ppd.getAs[Double]("a0") == 0.0 && ppd.getAs[Double]("a1") == 1.0)
    // SDS011 pm25 has no SDS011 entry → falls through to BAM1020
    val sds = dim(("SDS011", "pm25"))
    assert(sds.getAs[String]("ref") == "BAM1020" &&
      sds.getAs[Double]("a0") == 5.759 && sds.getAs[Double]("a1") == 0.3769)
    // SPS30 pm25 resolves SDS011 first (priority), not BAM1020
    assert(dim(("SPS30", "pm25")).getAs[String]("ref") == "SDS011")
    // unit-only meteo entries parse too
    assert(dim(("BME280", "luchtdruk")).getAs[String]("unit") == "hPa")
  }
}
