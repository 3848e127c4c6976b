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

  /** Field-name synonym translation — SURVEY P1 (reference:
    * MyDatacollector.py:332-348, dict :240-276): decoded field names are
    * normalized through a synonym map (NL/EN aliases, punctuation
    * variants); unknown names pass through unchanged (the reference
    * prefixes them, callers decide). Pure `element_at` on a literal map
    * — codegen'd, no UDF. */
  private val fieldSynonyms: Map[String, String] = Map(
    "pm2.5" -> "pm25", "pm_25" -> "pm25", "pm1.0" -> "pm1",
    "pm_10" -> "pm10", "temperature" -> "temp", "temperatuur" -> "temp",
    "humidity" -> "rv", "hum" -> "rv", "rh" -> "rv",
    "pressure" -> "luchtdruk", "pres" -> "luchtdruk",
    "windspeed" -> "ws", "winddirection" -> "wr", "geolocation" -> "geohash")

  def normalizeFieldName(c: Column): Column = {
    import org.apache.spark.sql.functions.{coalesce, element_at, lower, map, lit, typedLit}
    coalesce(element_at(typedLit(fieldSynonyms), lower(c)), lower(c))
  }

  // ------------------------------------------------ D7 event extraction

  /** Event-number → name table (MyDatacollector.py:1022). Numbers outside
    * the table raise in the reference (`{...}[event]` KeyError) and the
    * telegram carries no event — here they map to null and the caller
    * filters. */
  private val eventNames: Map[Int, String] =
    Map(13 -> "Accu level", 14 -> "Watch Dog", 15 -> "Controller Reset")

  /** Encode a port-3 meta EVENT telegram: `[version, 0, event]` — byte 1
    * = 0 is the event discriminator ([[LoRaDecode.decodeMeta]] reads the
    * version from byte 0 and the event number from the last byte). Thin
    * byte-codec UDF, same sanction as the BME280 pair. */
  val encodeMetaEvent = udf((version: Int, event: Int) =>
    Array[Byte](version.toByte, 0.toByte, event.toByte))

  /** Decode a port-3 meta telegram to (version, event). */
  val decodeMetaEvent = udf((bytes: Array[Byte]) => {
    val m = LoRaDecode.decodeMeta(bytes)
    (m.nums("version"), m.nums("event").toInt)
  })

  /** D7 — HasEvent (MyDatacollector.py:1019-1035): translate the decoded
    * event number to its name and build the notice message + artifact
    * line. Returns a struct (event_name, notice, artifact); name is null
    * for numbers outside the table (the reference's KeyError → `return
    * []` path). NOTE the reference as-written then `del meta['event']`
    * BEFORE interpolating `meta['event']` into the message, so its
    * notice path dies on a KeyError swallowed by the caller's bare
    * except (MyDatacollector.py:1646) — we implement the evident intent
    * (the message with the raw number) and keep the artifact format
    * `Raised event: <name>.` verbatim. */
  def extractEvent(kitId: Column, eventNum: Column): Column = {
    import org.apache.spark.sql.functions.{concat, element_at, lit, struct, typedLit}
    val name = element_at(typedLit(eventNames), eventNum.cast("int"))
    struct(
      name.as("event_name"),
      concat(lit("Measurement kit with id "), kitId,
        lit(" raised event "), name,
        lit(", value "), eventNum.cast("int")).as("notice"),
      concat(lit("Raised event: "), name, lit(".")).as("artifact"))
  }
}
