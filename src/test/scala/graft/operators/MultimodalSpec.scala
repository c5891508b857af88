package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Pins the REAL ImageIO decode path: genuine PNG bytes decode back to
  * the exact fixture pixels, both directly and through the q195 Spark
  * pipeline. The expectation recomputes the pixel hash from the fixture
  * formula WITHOUT ImageIO, so an encoder/decoder that altered even one
  * channel of one pixel would fail.
  */
class MultimodalSpec extends SparkSpec {

  /** Expected hash straight from the fixture formula: ARGB ints (alpha
    * 0xff, as TYPE_INT_RGB reads back) in row-major order.
    */
  private def expectedHash(id: Long): String = {
    val (w, h) = Multimodal.fixtureDims(id)
    val buf = java.nio.ByteBuffer.allocate(w * h * 4)
    for (y <- 0 until h; x <- 0 until w)
      buf.putInt(0xff000000 | Multimodal.pixel(id, x, y))
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(buf.array).map("%02x".format(_)).mkString
  }

  /** Expected position-weighted checksums straight from the fixture
    * formula — the integer twins of [[expectedHash]] that the DuckDB
    * oracle also recomputes (so a drift here would surface twice).
    */
  private def expectedCsums(id: Long): (Long, Long) = {
    val (w, h) = Multimodal.fixtureDims(id)
    var c1 = 0L
    var c2 = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = Multimodal.pixel(id, x, y).toLong
      val wgt = (y * w + x + 1).toLong
      c1 += wgt * rgb
      c2 += wgt * rgb * rgb
    }
    (c1, c2)
  }

  test("ImageIO round-trip recovers the exact fixture pixels") {
    for (id <- Seq(0L, 7L, 13L, 42L)) {
      val (w, h) = Multimodal.fixtureDims(id)
      val png = Multimodal.encodePng(id, w, h)
      // real container bytes: PNG magic, not a fake
      assert(png.take(4).map(_ & 0xff).toSeq === Seq(0x89, 0x50, 0x4e, 0x47),
        s"id=$id payload is not PNG")
      val feats = Multimodal.decodeImage(MediaRecord(id, png, "image/png", 0L))
      assert(feats.width === w && feats.height === h, s"id=$id dims")
      assert(feats.pixel_hash === expectedHash(id), s"id=$id pixels differ")
      assert((feats.pix_csum, feats.pix_csum2) === expectedCsums(id),
        s"id=$id pixel checksums differ")
    }
  }

  test("q195 decodes PNG payloads distributed, one row per document") {
    val rows = SparkEntry.queries("q195_multimodal_imageio")(spark, sf0001)
      .collect()
    assert(rows.length === 50)
    val r7 = rows.find(_.getLong(0) == 7L).get
    val (w, h) = Multimodal.fixtureDims(7L)
    val (c1, c2) = expectedCsums(7L)
    assert(r7.getLong(1) === w && r7.getLong(2) === h)
    assert(r7.getLong(3) === c1 && r7.getLong(4) === c2)
  }

  /** Expected PCM hash + energy + weighted checksum straight from the
    * fixture formula (little-endian 16-bit frames), WITHOUT going through
    * AudioSystem.
    */
  private def expectedPcm(id: Long): (String, Long, Long) = {
    val n = Multimodal.fixtureSamples(id)
    val raw = new Array[Byte](n * 2)
    var energy = 0L
    var csum = 0L
    for (i <- 0 until n) {
      val s = Multimodal.pcmSample(id, i)
      raw(i * 2) = (s & 0xff).toByte
      raw(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      energy += math.abs(s.toLong)
      csum += (i + 1).toLong * s.toLong
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    (md.digest(raw).map("%02x".format(_)).mkString, energy, csum)
  }

  test("WAV round-trip recovers the exact fixture samples") {
    for (id <- Seq(0L, 7L, 13L, 42L)) {
      val wav = Multimodal.encodeWav(id)
      // real container bytes: RIFF magic, not a fake
      assert(new String(wav.take(4), "US-ASCII") === "RIFF",
        s"id=$id payload is not RIFF/WAVE")
      val feats = Multimodal.decodeWav(MediaRecord(id, wav, "audio/wav", 0L))
      val (hash, energy, csum) = expectedPcm(id)
      assert(feats.n_samples === Multimodal.fixtureSamples(id).toLong)
      assert(feats.sample_rate === 16000L)
      assert(feats.energy === energy, s"id=$id energy differs")
      assert(feats.pcm_hash === hash, s"id=$id decoded PCM differs")
      assert(feats.pcm_csum === csum, s"id=$id PCM checksum differs")
    }
  }

  test("q217 decodes WAV payloads distributed, one row per document") {
    val rows = SparkEntry.queries("q217_multimodal_wav")(spark, sf0001)
      .collect()
    assert(rows.length === 50)
    val r13 = rows.find(_.getLong(0) == 13L).get
    val (_, energy, csum) = expectedPcm(13L)
    assert(r13.getLong(1) === Multimodal.fixtureSamples(13L).toLong)
    assert(r13.getLong(3) === energy)
    assert(r13.getLong(4) === csum)
  }

  test("q215 lands PNGs and re-reads them via binaryFile, row-identical to q195") {
    val landed = SparkEntry.queries("q215_multimodal_binaryfile")(spark, sf0001)
    // the scan must be the real binaryFile source, not an in-plan synth
    assert(landed.queryExecution.executedPlan.toString.contains("binaryFile"),
      "q215 does not read through the binaryFile FileScan")
    val inPlan = SparkEntry.queries("q195_multimodal_imageio")(spark, sf0001)
    val a = landed.collect().map(_.toSeq).toSeq
    val b = inPlan.collect().map(_.toSeq).toSeq
    assert(a.length === 50)
    // decode-from-landed-bytes must recover the exact same pixels as
    // decode-from-in-plan bytes: the write→re-read cycle is lossless
    assert(a === b, "landed binaryFile decode differs from in-plan decode")
  }
}
