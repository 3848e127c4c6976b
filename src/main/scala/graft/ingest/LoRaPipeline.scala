package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Column-level entry points for the LoRa codec (SURVEY D2 note: the
  * struct-unpack decoder is one of the two sanctioned thin UDFs — the
  * byte-twiddling rule engine has no `functions._` equivalent).
  *
  * The encode∘decode pair quantizes exactly like the node firmware:
  * raw = trunc(v·scale + 0.5) (SetVal, lib/MyLoRaCode.py:315-320), so
  * round-tripping a measurement equals `trunc(v·scale + 0.5)/scale` —
  * a plain SQL expression, which is what makes q38 oracle-checkable.
  */
object LoRaPipeline {

  /** Encode (temp, rv, luchtdruk) as a port-12 weerDIY1 BME280 frame. */
  val encodeBme280 = udf((temp: Double, rv: Double, press: Double) =>
    LoRaDecode.RuleCodec.encode(1.8,
      Seq(1 -> Seq(Some(temp), Some(rv), Some(press)))))

  /** Decode a port-12 frame back to (temp, rv, luchtdruk). */
  val decodeBme280 = udf((bytes: Array[Byte]) => {
    val (_, data, _) = LoRaDecode.RuleCodec.decode(bytes)
    val f = data("BME280")
    (f("temp"), f("rv"), f("luchtdruk"))
  })

  def roundTripBme280(temp: Column, rv: Column, press: Column): Column =
    decodeBme280(encodeBme280(temp, rv, press))
}
