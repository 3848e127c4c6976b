package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the r12 direct RIFF/WAVE walker (the q68 hot path) to the JDK's
  * own decode: for every synthetic WAV the walker must yield EXACTLY
  * the row `javax.sound.sampled.AudioSystem` yields, and anything the
  * walker declines must still decode through the SPI fallback — the
  * differential contract `decodeAudio`'s scaladoc states. */
class MultimodalAudioSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Reference decode straight through the JDK (the pre-r12 path). */
  private def jdkDecode(id: Long, bytes: Array[Byte]): (Long, Int, Int, Double, Double, Double) = {
    val ain = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val fmt = ain.getFormat
      val b = ain.readAllBytes()
      val bb = java.nio.ByteBuffer.wrap(b).order(
        if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
        else java.nio.ByteOrder.LITTLE_ENDIAN)
      val n = b.length / 2
      var sumSq = 0L; var peak = 0L; var i = 0
      while (i < n) {
        val s = bb.getShort(i * 2).toLong
        sumSq += s * s
        if (math.abs(s) > peak) peak = math.abs(s)
        i += 1
      }
      val rate = fmt.getSampleRate.toInt
      (id, rate, n, n.toDouble / rate,
        if (n == 0) 0.0
        else math.sqrt(sumSq.toDouble / (n.toDouble * 32768.0 * 32768.0)),
        peak.toDouble / 32768.0)
    } finally ain.close()
  }

  test("direct walker == JDK decode on the synthetic corpus") {
    import spark.implicits._
    val ids = (0L until 300L) ++ Seq(64L, 65L, 128L, 12345L)
    val media = spark.createDataset(ids.map(i =>
      Multimodal.MediaRecord(i, "audio/wav", Multimodal.syntheticWav(i))))
    val got = Multimodal.decodeAudio(media).collect()
      .map(d => d.media_id -> ((d.sample_rate, d.n_samples, d.duration_s, d.rms, d.peak))).toMap
    ids.foreach { i =>
      val (_, r, n, dur, rms, peak) = jdkDecode(i, Multimodal.syntheticWav(i))
      assert(got(i) === ((r, n, dur, rms, peak)), s"id $i diverged from JDK decode")
    }
  }

  test("walker declines odd shapes; SPI fallback and error rows still work") {
    import spark.implicits._
    // a WAV with an extra chunk between fmt and data (walker must walk it),
    // a truncated blob, and garbage — plus a plain one as control
    val plain = Multimodal.syntheticWav(7L)
    val extraChunk = {
      val base = Multimodal.syntheticWav(7L)
      val junk = "LIST".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0, 0, 1, 2, 3, 0)
      // splice junk after the fmt chunk (ends at offset 36), fix RIFF size
      val out = base.take(36) ++ junk ++ base.drop(36)
      val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(4, out.length - 8)
      out
    }
    val media = spark.createDataset(Seq(
      Multimodal.MediaRecord(1L, "audio/wav", plain),
      Multimodal.MediaRecord(2L, "audio/wav", extraChunk),
      Multimodal.MediaRecord(3L, "audio/wav", plain.take(30)),
      Multimodal.MediaRecord(4L, "audio/wav", Array[Byte](9, 9, 9, 9))))
    val got = Multimodal.decodeAudio(media).collect()
      .map(d => d.media_id -> d).toMap
    val ref = jdkDecode(1L, plain)
    assert(got(1L).rms === ref._5 && got(1L).n_samples === ref._3)
    // the spliced file carries the same data chunk → identical stats
    assert(got(2L).rms === ref._5 && got(2L).n_samples === ref._3)
    assert(got(3L).sample_rate === -1 && got(4L).sample_rate === -1)
  }
}
