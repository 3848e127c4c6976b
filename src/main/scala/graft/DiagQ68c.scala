package graft
object DiagQ68c {
  def main(args: Array[String]): Unit = {
    val rs = {
      val l = java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
      val b = scala.collection.mutable.ArrayBuffer[javax.sound.sampled.spi.AudioFileReader]()
      l.forEach(r => b += r); b.toSeq
    }
    val wavs = (0L until 50000L).map(operators.Multimodal.syntheticWav).toArray
    def headerOnly(i: Int): Long = {
      val s = new java.io.ByteArrayInputStream(wavs(i))
      val ain = rs.iterator.flatMap { r => s.reset()
        try Some(r.getAudioInputStream(s)) catch { case _: javax.sound.sampled.UnsupportedAudioFileException => None }
      }.next()
      val f = ain.getFormat.getSampleRate.toLong
      ain.close(); f
    }
    def readBody(i: Int): Long = {
      val s = new java.io.ByteArrayInputStream(wavs(i))
      val ain = rs.iterator.flatMap { r => s.reset()
        try Some(r.getAudioInputStream(s)) catch { case _: javax.sound.sampled.UnsupportedAudioFileException => None }
      }.next()
      val n = ain.readAllBytes().length.toLong; ain.close(); n
    }
    def run(label: String, nThreads: Int, f: Int => Long): Unit = {
      (0 until 2000).foreach(f)
      val per = 50000 / nThreads
      val t0 = System.nanoTime()
      val ts = (0 until nThreads).map { t => new Thread(() => { (0 until per).foreach(i => f(t*per+i)) }) }
      ts.foreach(_.start()); ts.foreach(_.join())
      println(f"$label%-24s threads=$nThreads%2d  ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    run("header-only", 1, headerOnly); run("header-only", 32, headerOnly)
    run("header+readAllBytes", 1, readBody); run("header+readAllBytes", 32, readBody)
    // manual RIFF scan baseline: how fast SHOULD this be
    def manual(i: Int): Long = {
      val b = java.nio.ByteBuffer.wrap(wavs(i)).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.getInt(24).toLong // sample rate straight from fmt chunk
    }
    run("manual-riff", 32, manual)
  }
}
