package graft.ingest

import java.math.RoundingMode

import graft.functions.GeoFunctions

/** LoRa payload decoders — SURVEY §2.3 D2.
  *
  * Two distinct encodings exist in the reference:
  *
  *  1. Ports 2/3/4 — the fixed "MySense node" layouts. The golden
  *     `payload_fields` embedded in the replay fixtures
  *     (reference: MyDatacollector/inputtests/inputtestP{2,3,4}.mqtt,
  *     testdata/TTNMQTTexample.json) were produced by the TTN-side
  *     JavaScript decoder (reference: PyCom/TTN-decode.js:330-383
  *     `Decoder`), so [[decodeFlat]] reproduces the JS semantics exactly —
  *     including its unrounded float chain-additions in the Sensirion
  *     branch (TTN-decode.js:134-138; the Python twin
  *     lib/MyLoRaCode.py:567-571 rounds each step — the fixtures prove
  *     the JS variant generated them, e.g. pm10_cnt 666.0000000000001).
  *
  *  2. Ports 10/12 — the table-driven rule engine
  *     (lib/MyLoRaCode.py:203-278 rules, :434-530 DecodePort10or12):
  *     sensor-id byte → list of (field, pack-code, NaN-sentinel,
  *     [offset, scale] linear map). [[RuleCodec]] implements the
  *     big-endian `weerDIY1` table (port 12) including NaN handling,
  *     per-field rounding and the lat/lon → geohash conversion
  *     (:519-523); [[LibeliumCodec]] the little-endian `Libelium`
  *     WaspMote tiny-frame table (port 10, PortMap :294-295), golden-
  *     tested against the reference decoder's own output on
  *     inputtests/inputtestP10.mqtt. Note the repo's
  *     port-12 fixtures carry `payload_fields` from an *older* rule
  *     table (different names/scales — e.g. inputtestP12.mqtt has
  *     BME280 temp 17.06 where the current [0,10] scale yields 17.1),
  *     so port-12 correctness is established by the encode∘decode
  *     round-trip (q38) and unit tests instead of fixture goldens.
  */
object LoRaDecode {

  /** JS `round(value, d)` (TTN-decode.js:103-105): decimal rounding on
    * the shortest double representation, half toward +∞ (Math.round).
    * Scala's `Double.toString` is the same shortest-round-trip repr. */
  def jsRound(v: Double, d: Int): Double = {
    if (v.isNaN || v.isInfinite) return v
    val mode = if (v >= 0) RoundingMode.HALF_UP else RoundingMode.HALF_DOWN
    new java.math.BigDecimal(v.toString).setScale(d, mode).doubleValue()
  }

  // ------------------------------------------------- fixed layouts (JS)

  /** Unsigned byte view. */
  private def u(bytes: Array[Byte]): Array[Int] = bytes.map(_ & 0xff)

  private def notZero(b: Array[Int], nr: Int): Boolean =
    nr + 1 < b.length && ((b(nr) | b(nr + 1)) != 0)

  private def bytes2(b: Array[Int], nr: Int, cnt: Double): Double =
    jsRound(((b(nr) << 8) + b(nr + 1)) / cnt, 1)

  /** Signed 32-bit big-endian (JS `<<` coerces to int32). */
  private def bytes2rat(b: Array[Int], nr: Int): Int =
    (b(nr) << 24) + (b(nr + 1) << 16) + (b(nr + 2) << 8) + b(nr + 3)

  val dustTypes = Array("unknown", "PPD42NS", "SDS011", "PMS7003", "SPS30",
    "unknown", "unknown")
  val meteoTypes = Array("unknown", "DHT11", "SHT85", "BME280", "BME680", "SHT31")
  // TTN-decode.js:283-297 uses DHT22 at index 2; MyLoRaCode.py:198-202
  // uses SHT85. Fixture P3 goldens only exercise indices 3/4.

  private def decodePM(b: Array[Int]): Map[String, Double] = {
    var out = Map.empty[String, Double]
    var strt = 0
    if (b.length > 4) {
      if (notZero(b, 0)) out += "pm1" -> bytes2(b, 0, 10)
      strt += 2
    }
    if (notZero(b, strt)) out += "pm25" -> bytes2(b, strt, 10)
    if (notZero(b, strt + 2)) out += "pm10" -> bytes2(b, strt + 2, 10)
    out
  }

  private def decodeMeteo(b: Array[Int]): Map[String, Double] = {
    var out = Map.empty[String, Double]
    if (notZero(b, 0)) out += "temperature" -> jsRound(bytes2(b, 0, 10) - 30, 1)
    if (notZero(b, 2)) out += "humidity" -> bytes2(b, 2, 10)
    if (b.length <= 4) return out
    if (notZero(b, 4)) out += "pressure" -> jsRound(bytes2(b, 4, 1), 1)
    if (b.length <= 6) return out
    if (notZero(b, 6)) out += "gas" -> jsRound(bytes2(b, 6, 1), 1)
    if (notZero(b, 8)) out += "aqi" -> bytes2(b, 8, 10)
    out
  }

  private def decodePort2Counts(b: Array[Int]): Map[String, Double] = {
    var out = Map.empty[String, Double]
    if (notZero(b, 0)) out += "pm03_cnt" -> bytes2(b, 0, 10)
    if (notZero(b, 2)) out += "pm05_cnt" -> bytes2(b, 2, 10)
    if (notZero(b, 4)) out += "pm1_cnt" -> bytes2(b, 4, 10)
    if (b.length > 6 && b(6) != 0) out += "pm25_cnt" -> jsRound(b(6) / 10.0, 1)
    if (b.length > 7 && b(7) != 0) out += "pm5_cnt" -> jsRound(b(7) / 10.0, 1)
    if (b.length > 8 && b(8) != 0) out += "pm10_cnt" -> jsRound(b(8) / 10.0, 1)
    out
  }

  private def decodePort4Counts(b0: Array[Int]): Map[String, Double] = {
    val b = b0.clone()
    var out = Map.empty[String, Double]
    var expl = true
    var pm4 = false
    if ((b(0) & 0x80) != 0) { expl = false; b(0) = b(0) & 0x7f }
    if ((b(4) & 0x80) != 0) { pm4 = true; b(4) = b(4) & 0x7f }
    out += "pm10_cnt" -> bytes2(b, 0, 10)
    out += "pm05_cnt" -> bytes2(b, 2, 10)
    out += "pm1_cnt" -> bytes2(b, 4, 10)
    out += "pm25_cnt" -> bytes2(b, 6, 10)
    var pm45 = bytes2(b, 8, 10)
    if (expl) out += "pm03_cnt" -> bytes2(b, 10, 10)
    else {
      // Sensirion PMi→cumulative conversion: unrounded double adds, the
      // JS float artifact visible in the fixtures (TTN-decode.js:131-138).
      out += "grain" -> jsRound(((b(10) << 8) + b(11)) / 100.0, 1)
      out += "pm1_cnt" -> (out("pm1_cnt") + out("pm05_cnt"))
      out += "pm25_cnt" -> (out("pm25_cnt") + out("pm1_cnt"))
      pm45 += out("pm25_cnt")
      out += "pm10_cnt" -> (out("pm10_cnt") + pm45)
    }
    out += (if (pm4) "pm4_cnt" else "pm5_cnt") -> pm45
    out
  }

  private def decodeGps(b: Array[Int]): Map[String, Double] = {
    val lat = bytes2rat(b, 0)
    if (lat == 0) Map.empty
    else Map(
      "latitude" -> jsRound(lat / 100000.0, 6),
      "longitude" -> jsRound(bytes2rat(b, 4) / 100000.0, 6),
      "altitude" -> jsRound(bytes2rat(b, 8) / 10.0, 6))
  }

  private def decodeWind(b: Array[Int]): Map[String, Double] = {
    var speed = jsRound(b(0) / 5.0, 1)
    if ((b(1) & 0x80) != 0) speed += 0.1
    var out = Map("wspeed" -> speed)
    val direct = b(1) & 0x7f
    if (direct > 0) out += "wdirection" -> ((direct * 3) % 360).toDouble
    out
  }

  private def decodeAccu(b: Array[Int]): Map[String, Double] =
    if (b.nonEmpty && b(0) > 0) Map("accu" -> jsRound(b(0) / 10.0, 2))
    else Map.empty

  /** Port-3 meta telegram: numbers + sensor-type tags. */
  case class Meta(nums: Map[String, Double], tags: Map[String, String])

  def decodeMeta(bytes: Array[Byte]): Meta = {
    val b = u(bytes)
    var nums = Map("version" -> b(0) / 10.0)
    var tags = Map.empty[String, String]
    if (b(1) == 0) return Meta(nums + ("event" -> b(b.length - 1).toDouble), tags)
    // Total on unknown sensor ids: the JS golden generator yields
    // `undefined` for out-of-table indices (dust 7, meteo 6+) and its
    // try/catch swallows the rest — we map every out-of-range id to
    // "unknown" instead of throwing (one bad telegram must not kill a
    // task).
    val dustIdx = b(1) & 7
    tags += "dust" -> (if (dustIdx < dustTypes.length) dustTypes(dustIdx) else "unknown")
    if ((b(1) & 8) != 0) nums += "gps" -> 1.0
    val meteoIdx = (b(1) >> 4) & 15
    tags += "meteo" -> (if (meteoIdx < meteoTypes.length) meteoTypes(meteoIdx) else "unknown")
    val lati = bytes2rat(b, 2)
    if (lati != 0) {
      nums += "latitude" -> jsRound(lati / 100000.0, 6)
      nums += "longitude" -> jsRound(bytes2rat(b, 6) / 100000.0, 6)
      nums += "altitude" -> jsRound(bytes2rat(b, 10) / 10.0, 6)
    }
    Meta(nums, tags)
  }

  /** Ports 2/4 measurement telegram → flat field map, exactly as the TTN
    * JS `Decoder` (TTN-decode.js:330-383) that produced the fixtures. */
  def decodeFlat(bytes: Array[Byte], port: Int): Map[String, Double] = {
    val b = u(bytes)
    var out = Map.empty[String, Double]
    var tpe = 0
    var strt = 0
    if ((b(0) & 0x80) != 0) { strt = 1; tpe = b(0) }
    else if (port == 2) {
      if (b.length == 10) {
        out ++= decodeMeteo(b.slice(0, 6))
        out ++= decodePM(b.slice(6, 10))
        // deprecated layout has pm10/pm25 swapped
        val pm10 = out.get("pm10")
        val pm25 = out.get("pm25")
        out = out -- Seq("pm10", "pm25")
        pm25.foreach(v => out += "pm10" -> v)
        pm10.foreach(v => out += "pm25" -> v)
        return out
      } else if (b.length >= 16) tpe |= 0x5
    }
    var end = strt + 4
    if ((tpe & 0x1) != 0) end += 2
    out ++= decodePM(b.slice(strt, end))
    strt = end
    if ((tpe & 0x2) != 0) {
      if (port == 2) { out ++= decodePort2Counts(b.slice(strt, strt + 9)); strt += 9 }
      else if (port == 4) { out ++= decodePort4Counts(b.slice(strt, strt + 12)); strt += 12 }
    }
    end = strt + 6
    if (b.length < end) return out
    if ((tpe & 0x4) != 0) end += 4
    out ++= decodeMeteo(b.slice(strt, end))
    strt = end
    if (b.length >= strt + 11 && (tpe & 0x8) != 0) {
      out ++= decodeGps(b.slice(strt, strt + 12)); strt += 12
    }
    if (b.length >= strt + 1 && (tpe & 0x10) != 0) {
      out ++= decodeWind(b.slice(strt, strt + 2)); strt += 2
    }
    if (b.length >= strt && (tpe & 0x20) != 0) {
      out ++= decodeAccu(b.slice(strt, strt + 1)); strt += 1
    }
    out
  }

  // ------------------------------------------- rule engine (ports 10/12)

  /** One field rule: pack code ∈ {B,b,H,h,L,l,f}, NaN = all-ones sentinel
    * of the width, linear map value = (raw − offset) / scale
    * (lib/MyLoRaCode.py:322-325 GetVal). */
  case class FieldRule(name: String, pack: Char, offset: Double, scale: Double)

  case class SensorRule(id: Int, sensor: String, fields: Seq[FieldRule])

  /** The `weerDIY1` table (lib/MyLoRaCode.py:215-258), big-endian, one
    * leading version byte [0,10]. Rule 254 (`time`) is malformed in the
    * reference (no NaN slot) and never emitted by kits — unsupported. */
  val WeerDIY1: Seq[SensorRule] = Seq(
    SensorRule(1, "BME280", Seq(FieldRule("temp", 'h', 0, 10), FieldRule("rv", 'h', 0, 10),
      FieldRule("luchtdruk", 'H', 0, 1))),
    SensorRule(2, "BME680", Seq(FieldRule("temp", 'h', 0, 10), FieldRule("rv", 'H', 0, 10),
      FieldRule("luchtdruk", 'H', 0, 1), FieldRule("voc", 'H', 0, 1),
      FieldRule("aqi", 'B', 0, 1))),
    SensorRule(3, "SHT31", Seq(FieldRule("temp", 'h', 0, 10), FieldRule("rv", 'H', 0, 10))),
    SensorRule(19, "NEO-6", Seq(FieldRule("lon", 'f', 0, 1), FieldRule("lat", 'f', 0, 1),
      FieldRule("alt", 'L', 0, 10))),
    SensorRule(20, "windDIY1", Seq(FieldRule("wr", 'H', 0, 1), FieldRule("ws", 'H', 0, 10))),
    SensorRule(21, "Argent", Seq(FieldRule("wr", 'H', 0, 1), FieldRule("ws", 'H', 0, 20))),
    SensorRule(22, "Ultrasonic", Seq(FieldRule("wr", 'H', 0, 1), FieldRule("ws", 'H', 0, 10))),
    SensorRule(23, "RainCounter", Seq(FieldRule("rain", 'H', 0, 10))))

  private def width(pack: Char): Int = pack match {
    case 'B' | 'b' => 1
    case 'H' | 'h' => 2
    case 'L' | 'l' | 'f' => 4
  }

  object RuleCodec {

    private def readRaw(b: Array[Byte], off: Int, pack: Char): Long = {
      def ub(i: Int): Long = b(i) & 0xffL
      pack match {
        case 'B' => ub(off)
        case 'b' => b(off).toLong
        case 'H' => (ub(off) << 8) | ub(off + 1)
        case 'h' => (((ub(off) << 8) | ub(off + 1)).toShort).toLong
        case 'L' | 'f' => (ub(off) << 24) | (ub(off + 1) << 16) | (ub(off + 2) << 8) | ub(off + 3)
        case 'l' => ((ub(off) << 24) | (ub(off + 1) << 16) | (ub(off + 2) << 8) | ub(off + 3)).toInt.toLong
      }
    }

    private def isNan(raw: Long, pack: Char): Boolean = pack match {
      case 'B' => raw == 0xffL
      case 'b' => raw == 0x7fL
      case 'H' => raw == 0xffffL
      case 'h' => raw == 0x7fffL
      case 'L' => raw == 0xffffffffL
      case 'l' => raw == 0x7fffffffL
      case 'f' => java.lang.Float.intBitsToFloat(raw.toInt).isNaN
    }

    /** Decode a port-12 payload to sensor → field → value (None = NaN
      * sentinel). Per-field rounding and lat/lon → geohash follow
      * DecodePort10or12 (MyLoRaCode.py:483-496, 519-523). */
    def decode(bytes: Array[Byte]): (Double, Map[String, Map[String, Option[Double]]],
        Map[String, String]) = {
      var i = 0
      val version = (bytes(0) & 0xff) / 10.0
      i += 1
      var data = Map.empty[String, Map[String, Option[Double]]]
      var tags = Map.empty[String, String]
      var done = false
      while (!done && i < bytes.length) {
        val id = bytes(i) & 0xff
        i += 1
        WeerDIY1.find(_.id == id) match {
          case None => done = true // unknown sensor id: stop (reference logs + aborts)
          case Some(rule) =>
            var fields = Map.empty[String, Option[Double]]
            var lat: Option[Double] = None
            var lon: Option[Double] = None
            rule.fields.foreach { f =>
              val raw = readRaw(bytes, i, f.pack)
              i += width(f.pack)
              val v: Option[Double] =
                if (isNan(raw, f.pack)) None
                else {
                  val x =
                    if (f.pack == 'f') java.lang.Float.intBitsToFloat(raw.toInt).toDouble
                    else raw.toDouble
                  Some((x - f.offset) / f.scale)
                }
              val rounded = v.map { x =>
                if (f.name.startsWith("lon") || f.name.startsWith("lat"))
                  jsRound(x, 7)
                else if (f.name == "wr" || f.name == "luchtdruk") x.toLong.toDouble
                else jsRound(x, 1)
              }
              if (f.name == "lat") lat = rounded
              else if (f.name == "lon") lon = rounded
              else fields += f.name -> rounded
            }
            // lat/lon collapse to a precision-11 geohash (MyLoRaCode.py:519-523)
            (lat, lon) match {
              case (Some(la), Some(lo)) =>
                tags += rule.sensor -> GeoFunctions.geohashEncode(la, lo, 11)
              case _ =>
            }
            data += rule.sensor -> fields
        }
      }
      (version, data, tags)
    }

    /** Encode sensor readings into a port-12 payload (the node-side
      * `SetVal` packing, MyLoRaCode.py:315-320: raw = ⌊v·scale + offset
      * + 0.5⌋) — used for the encode∘decode round-trip proof (q38). */
    def encode(version: Double, readings: Seq[(Int, Seq[Option[Double]])]): Array[Byte] = {
      val buf = scala.collection.mutable.ArrayBuffer[Byte]()
      buf += ((version * 10).toInt & 0xff).toByte
      readings.foreach { case (id, vals) =>
        val rule = WeerDIY1.find(_.id == id).getOrElse(
          throw new IllegalArgumentException(s"unknown sensor id $id"))
        buf += id.toByte
        rule.fields.zip(vals).foreach { case (f, v) =>
          val raw: Long = v match {
            case None => f.pack match {
              case 'B' => 0xffL
              case 'b' => 0x7fL
              case 'H' => 0xffffL
              case 'h' => 0x7fffL
              case 'L' => 0xffffffffL
              case 'l' => 0x7fffffffL
              case 'f' => java.lang.Float.floatToIntBits(Float.NaN).toLong & 0xffffffffL
            }
            case Some(x) =>
              if (f.pack == 'f') java.lang.Float.floatToIntBits(x.toFloat).toLong & 0xffffffffL
              else (x * f.scale + f.offset + 0.5).toLong
          }
          width(f.pack) match {
            case 1 => buf += (raw & 0xff).toByte
            case 2 => buf += ((raw >> 8) & 0xff).toByte += (raw & 0xff).toByte
            case 4 => buf += ((raw >> 24) & 0xff).toByte += ((raw >> 16) & 0xff).toByte +=
              ((raw >> 8) & 0xff).toByte += (raw & 0xff).toByte
          }
        }
      }
      buf.toArray
    }
  }

  // ------------------------------------------- Libelium tiny frame (port 10)

  /** Python 3 `round(x, d)`: correctly-rounded on the EXACT binary double
    * (not its shortest decimal repr), ties to even — e.g. round(2.675, 2)
    * = 2.67 because the stored double is 2.67499999…; round(0.25, 1) =
    * 0.2. Used by the port-10/12 decoder, whose goldens come from the
    * Python reference (vs [[jsRound]] for the JS-generated port-2/3/4
    * fixtures). */
  def pyRound(v: Double, d: Int): Double = {
    if (v.isNaN || v.isInfinite) return v
    new java.math.BigDecimal(v).setScale(d, RoundingMode.HALF_EVEN).doubleValue()
  }

  /** One Libelium sensor-id rule: the WaspMote tiny frame carries ONE
    * field per id byte (unlike weerDIY1's multi-field records). `unit`
    * is kept only when not in the reference's DefaultUnits list
    * (MyLoRaCode.py:202 — '%','C','hPa','mm/h',… are elided). */
  case class LibeliumField(sensor: String, name: String, pack: Char,
                           offset: Double, scale: Double, unit: Option[String] = None)

  /** The `Libelium` table (lib/MyLoRaCode.py:259-277), LITTLE-endian —
    * WaspMote Data Frame Guide v7.7 tiny frame, selected v15 sensor ids. */
  val Libelium: Map[Int, LibeliumField] = Map(
    52 -> LibeliumField("energy", "accu", 'B', 0, 1.0),
    74 -> LibeliumField("BME280", "temp", 'f', 0, 1.0),
    76 -> LibeliumField("BME280", "rv", 'f', 0, 1.0),
    77 -> LibeliumField("BME280", "luchtdruk", 'f', 0, 100.0),
    158 -> LibeliumField("WASPrain", "rain", 'f', 0, 1.0),
    159 -> LibeliumField("WASPrain", "prevrain", 'f', 0, 1.0),
    160 -> LibeliumField("WASPrain", "dayrain", 'f', 0, 1.0, Some("mm/24h")),
    157 -> LibeliumField("WASPwind", "wr", 'B', 0, 0.25),
    156 -> LibeliumField("WASPwind", "ws", 'f', 0, 1.0))

  /** Parsed `'<3sBBQ#s?B'` header (MyLoRaCode.py:268): '<=>' magic, wasp
    * type, payload size, 64-bit serial, node id up to the '#' separator,
    * sequence nr. Only `waspType` (L-type) and `serial` (L-serial) are
    * promoted into the output record (names not starting with '?',
    * MyLoRaCode.py:526-537); serial keeps the reference's decimal-string
    * form (the `'%x'` hex rewrite applies to key 'serial', not
    * 'L-serial'). */
  case class LibeliumHeader(waspType: Int, size: Int, serial: String,
                            nodeId: String, seq: Int)

  object LibeliumCodec {

    private def leU32(b: Array[Byte], off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

    /** Decode a port-10 WaspMote frame → (header, sensor → field →
      * value, units). Mirrors DecodePort10or12 (MyLoRaCode.py:434-530)
      * with the Libelium rules: value = (raw − offset) / scale, floats
      * rounded to 1 decimal except wr/luchtdruk → int truncation
      * (`:483-496`). An unknown sensor id aborts with the partial record
      * (reference GetFrm raises, caught at `:469-471`). Divergence
      * (documented): the reference's float-NaN sentinel check `val ==
      * NANf` is always false in Python (NaN ≠ NaN), so an encoded NaN
      * leaks through as NaN — we normalize it to None/null instead. */
    def decode(bytes: Array[Byte]): (LibeliumHeader,
        Map[String, Map[String, Option[Double]]], Map[String, String]) = {
      require(bytes.length >= 13 &&
        bytes(0) == '<' && bytes(1) == '=' && bytes(2) == '>',
        "not a Libelium tiny frame: missing <=> start marker")
      val waspType = bytes(3) & 0xff
      val size = bytes(4) & 0xff
      val serial = java.lang.Long.toUnsignedString(
        (0 until 8).map(k => (bytes(5 + k) & 0xffL) << (8 * k)).reduce(_ | _))
      // '#s' in the pack string: variable-length node id, scanned up to
      // the '#' separator; the separator byte itself is consumed by the
      // format's '?' slot (calcsize, MyLoRaCode.py:396-420).
      val hashIdx = bytes.indexWhere(_ == '#'.toByte, 13)
      require(hashIdx >= 13 && hashIdx + 1 < bytes.length,
        "no '#' node-id separator (or truncated seq) in Libelium header")
      val nodeId = new String(bytes, 13, hashIdx - 13, "ASCII")
      val seq = bytes(hashIdx + 1) & 0xff
      var i = hashIdx + 2

      var data = Map.empty[String, Map[String, Option[Double]]]
      var units = Map.empty[String, String]
      var done = false
      while (!done && i < bytes.length) {
        val id = bytes(i) & 0xff
        i += 1
        Libelium.get(id) match {
          case None => done = true
          // radio-truncated value bytes: abort with the partial record,
          // same degraded path as an unknown id (one malformed telegram
          // must not kill a task — the reference's catch at :469-471)
          case Some(f) if i + width(f.pack) > bytes.length => done = true
          case Some(f) =>
            val (isNanV, x) = f.pack match {
              case 'B' =>
                val raw = bytes(i) & 0xffL; i += 1
                (raw == 0xffL, raw.toDouble)
              case 'f' =>
                val v = java.lang.Float.intBitsToFloat(leU32(bytes, i).toInt); i += 4
                (v.isNaN, v.toDouble)
            }
            val v: Option[Double] =
              if (isNanV) None
              else {
                val mapped = (x - f.offset) / f.scale
                Some(
                  if (f.name == "wr" || f.name == "luchtdruk") mapped.toLong.toDouble
                  else pyRound(mapped, 1))
              }
            data += f.sensor -> (data.getOrElse(f.sensor, Map.empty) + (f.name -> v))
            f.unit.foreach(u => units += s"${f.sensor}.${f.name}" -> u)
        }
      }
      (LibeliumHeader(waspType, size, serial, nodeId, seq), data, units)
    }
  }
}
