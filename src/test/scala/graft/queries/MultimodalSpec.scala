package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** №32 real-codec path: the PNG encode → ImageIO decode → resize chain
  * must be pixel-exact (PNG is lossless), matching the closed-form pixel
  * function the oracle uses. */
class MultimodalSpec extends SparkSpec {

  private def pixel(d: Long, x: Int, y: Int): Long = (13 * d + 31 * x + 17 * y) % 256

  test("multimodal_decode: ImageIO round trip is pixel-exact vs the closed form") {
    val rows = MultimodalQueries.multimodalDecode(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getLong(0)
      val (iw, ih) = (r.getInt(1), r.getInt(2))
      assert(iw == (8 + d % 32).toInt && ih == (8 + d % 24).toInt,
        s"doc $d: decoded dims ($iw,$ih) != metadata")
      assert(r.getInt(3) == iw / 2 && r.getInt(4) == ih / 2, s"doc $d: resize dims wrong")
      var expect = 0L
      for (y <- 0 until ih / 2; x <- 0 until iw / 2)
        expect += 3 * pixel(d, 2 * x, 2 * y)
      assert(r.getLong(5) == expect,
        s"doc $d: decoded px_sum ${r.getLong(5)} != closed form $expect — codec round trip not lossless")
    }
  }

  test("multimodal_audio: WAV round trip is sample-exact vs the closed form") {
    val rows = MultimodalQueries.multimodalAudio(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getLong(0)
      val n = r.getInt(1)
      assert(n == (64 + d % 128).toInt, s"doc $d: decoded frame count $n != metadata")
      assert(r.getInt(2) == 8000, s"doc $d: sample rate ${r.getInt(2)}")
      def s16(i: Int): Long = (7 * d + 13 * i) % 65536 - 32768
      val expAll = (0 until n).map(s16).sum
      val expStr = (0 until n by 4).map(s16).sum
      assert(r.getLong(3) == expAll, s"doc $d: sum_all ${r.getLong(3)} != $expAll — PCM round trip not lossless")
      assert(r.getLong(4) == expStr, s"doc $d: sum_strided mismatch")
    }
  }

  test("multimodal_video: container parse + sampled-frame decode matches closed form") {
    val rows = MultimodalQueries.multimodalVideo(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getLong(0)
      val n = r.getInt(1)
      assert(n == (2 + d % 3).toInt, s"doc $d: frame count")
      assert(r.getInt(2) == (n + 1) / 2, s"doc $d: sampled count")
      assert(r.getInt(3) == 8 && r.getInt(4) == 8, s"doc $d: frame dims")
      var expect = 0L
      for (f <- 0 until n if f % 2 == 0; y <- 0 until 8; x <- 0 until 8)
        expect += 3 * ((13 * d + 7 * f + 31 * x + 17 * y) % 256)
      assert(r.getLong(5) == expect,
        s"doc $d: px_sum ${r.getLong(5)} != $expect — container/frame decode drift")
    }
  }

  test("multimodal_jpeg: lossy round trip lands inside the calibrated tolerance bands") {
    val rows = MultimodalQueries.multimodalJpeg(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getLong(0)
      assert(r.getInt(1) == (8 + d % 16).toInt && r.getInt(2) == (8 + d % 12).toInt,
        s"doc $d: decoded dims != metadata")
      assert(r.getInt(3) == 3, s"doc $d: band count ${r.getInt(3)} != 3")
      assert(r.getInt(4) == r.getInt(1) / 2 && r.getInt(5) == r.getInt(2) / 2, s"doc $d: resize dims")
      assert(r.getBoolean(6), s"doc $d: decoded channel means outside ±${MultimodalQueries.JpegMeanTol}")
      assert(r.getBoolean(7), s"doc $d: decoded variance outside ${MultimodalQueries.JpegVarRelTol * 100}%")
    }
  }

  test("multimodal_jpeg: tolerance bands are tight — geometry and channel bugs all flip verdicts") {
    // off-by-one resize sample (2x+1, 2y+1): the ramp shifts every mean by
    // kx+ky = 8 ≫ band, but translation preserves variance (var_ok stays)
    val shifted = MultimodalQueries.jpegVerify(spark, sf, dx = 1, dy = 1).collect()
    assert(shifted.nonEmpty && shifted.forall(r => !r.getBoolean(6)),
      "an off-by-one resize sample must flip every mean verdict")
    assert(shifted.forall(_.getBoolean(7)),
      "translation on a linear ramp must NOT flip variance — if it does, the var band is noise-tight")
    // channel swap (decoded g read as r): base offsets differ by ≥ 20 ≫ band
    val swapped = MultimodalQueries.jpegVerify(spark, sf, perm = Seq(1, 0, 2)).collect()
    assert(swapped.nonEmpty && swapped.forall(r => !r.getBoolean(6)),
      "a channel swap must flip every mean verdict")
    // crop-instead-of-resize (stride 1): the sampled ramp spans half the
    // range, collapsing variance ~4x — outside the relative band everywhere
    val cropped = MultimodalQueries.jpegVerify(spark, sf, stride = 1).collect()
    assert(cropped.nonEmpty && cropped.forall(r => !r.getBoolean(7)),
      "crop-for-resize must flip every variance verdict")
  }

  test("multimodal_ulaw: JDK codec round trip is bit-equal to closed-form G.711 over the whole sample domain") {
    import javax.sound.sampled._
    // exhaustive: every 16-bit value the generator can produce (±32500)
    val lo = -32500; val hi = 32500
    val n = hi - lo + 1
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) { val s = lo + i; pcm(2 * i) = (s & 0xff).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte }
    val srcFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false)
    val ulawFmt = new AudioFormat(AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1, 8000f, false)
    val enc = AudioSystem.getAudioInputStream(ulawFmt,
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), srcFmt, n.toLong)).readAllBytes()
    val dec = AudioSystem.getAudioInputStream(srcFmt,
      new AudioInputStream(new java.io.ByteArrayInputStream(enc), ulawFmt, n.toLong)).readAllBytes()
    // the oracle's integer G.711 (same ladder as multimodalUlawSql)
    def g711(s: Int): Int = {
      val m = math.min(math.abs(s), 32635) + 132
      val div = if (m < 256) 8 else if (m < 512) 16 else if (m < 1024) 32 else if (m < 2048) 64
        else if (m < 4096) 128 else if (m < 8192) 256 else if (m < 16384) 512 else 1024
      val mag = ((m / div) % 16) * 8 * (div / 8) + 132 * (div / 8) - 132
      if (s < 0) -mag else mag
    }
    var i = 0
    while (i < n) {
      val s = lo + i
      val jd = ((dec(2 * i + 1) << 8) | (dec(2 * i) & 0xff)).toShort.toInt
      assert(jd == g711(s), s"s=$s: JDK decoded $jd != closed-form ${g711(s)}")
      i += 1
    }
    // and the quantization error behaves like mu-law: tiny near zero,
    // segment-sized near full scale
    assert(math.abs(g711(10) - 10) <= 4, "near-zero error not tight")
    assert(math.abs(g711(32000) - 32000) <= 1024, "full-scale error outside the top segment width")
  }

  test("multimodal_decode: blob column carries genuine PNG bytes (magic + codec parse)") {
    import spark.implicits._
    // pngFrame is private — drive one doc through the public query and
    // independently re-encode to confirm the codec path is exercised; the
    // magic-byte check guards against the stub's raw-md5 blobs sneaking back
    val d = graft.Tables(spark, sf).documents.select(min($"doc_id")).collect()(0).getLong(0)
    val img = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    assert(png.length >= 8 && (png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G',
      "JDK PNG writer did not produce PNG magic bytes")
    assert(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png)) != null)
    assert(d >= 0)
  }

  test("multimodal_mjpeg: lossy-video round trip lands inside the calibrated bands, metadata exact") {
    val rows = MultimodalQueries.multimodalMjpeg(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getLong(0)
      val n = r.getInt(1)
      assert(n == (2 + d % 4).toInt, s"doc $d: frame count $n != metadata")
      assert(r.getInt(2) == (n + 1) / 2, s"doc $d: sampled count")
      assert(r.getInt(3) == MultimodalQueries.MjpegW && r.getInt(4) == MultimodalQueries.MjpegH,
        s"doc $d: decoded frame dims (${r.getInt(3)},${r.getInt(4)})")
      assert(r.getInt(5) == 3, s"doc $d: band count")
      assert(r.getBoolean(6), s"doc $d: a sampled frame's channel means left ±${MultimodalQueries.JpegMeanTol}")
      assert(r.getBoolean(7), s"doc $d: a sampled frame's variance left the relative band")
    }
  }

  test("multimodal_mjpeg: bands are tight — geometry, channel AND frame-offset bugs all flip verdicts") {
    // off-by-one resize sample: ramp shifts every mean by 3+5 = 8 ≫ band;
    // translation preserves variance on a linear ramp
    val shifted = MultimodalQueries.mjpegVerify(spark, sf, dx = 1, dy = 1).collect()
    assert(shifted.nonEmpty && shifted.forall(r => !r.getBoolean(6)),
      "an off-by-one resize sample must flip every mean verdict")
    assert(shifted.forall(_.getBoolean(7)), "translation must NOT flip variance")
    // channel swap: base offsets differ by ≥ 20 ≫ band
    val swapped = MultimodalQueries.mjpegVerify(spark, sf, perm = Seq(1, 0, 2)).collect()
    assert(swapped.nonEmpty && swapped.forall(r => !r.getBoolean(6)),
      "a channel swap must flip every mean verdict")
    // crop-instead-of-resize: sampled ramp spans half the range → variance
    // collapses ~4x, outside the relative band everywhere
    val cropped = MultimodalQueries.mjpegVerify(spark, sf, stride = 1).collect()
    assert(cropped.nonEmpty && cropped.forall(r => !r.getBoolean(7)),
      "crop-for-resize must flip every variance verdict")
    // the VIDEO-specific bug class: comparing against the wrong frame
    // (mis-parsed container / off-by-one frame boundary) — the 7·(f mod 4)
    // frame term shifts every channel mean by 7 ≫ band; constant-per-frame,
    // so variance must survive
    val offFrame = MultimodalQueries.mjpegVerify(spark, sf, frameOff = 1).collect()
    assert(offFrame.nonEmpty && offFrame.forall(r => !r.getBoolean(6)),
      "a wrong-frame comparison must flip every mean verdict")
    assert(offFrame.forall(_.getBoolean(7)), "a constant frame shift must NOT flip variance")
  }

  test("multimodal_phash: every injected brightness variant is recalled (same group or paired)") {
    import spark.implicits._
    val fp = MultimodalQueries.phashFingerprints(spark, sf)
      .collect().map(p => p.doc_id -> (p.hi, p.lo)).toMap
    val variants = fp.keys.filter(_ >= 1000000L).toSeq
    assert(variants.nonEmpty)
    val missed = variants.filterNot { v =>
      val (hiV, loV) = fp(v)
      val (hiB, loB) = fp(v - 1000000L)
      java.lang.Long.bitCount(hiV ^ hiB) + java.lang.Long.bitCount(loV ^ loB) <=
        MultimodalQueries.PHashHammingMax
    }
    assert(missed.isEmpty,
      s"brightness near-dups beyond Hamming ${MultimodalQueries.PHashHammingMax}: $missed")
    // and the radius is TIGHT on this corpus: at least one variant
    // actually needs the near-dup path (not all collapse to hash equality)
    assert(variants.exists { v =>
      val (hiV, loV) = fp(v); val (hiB, loB) = fp(v - 1000000L)
      (hiV, loV) != (hiB, loB)
    }, "all variants hash-identical — the Hamming radius is untested by this corpus")
  }

  test("multimodal_phash: 4x16-bit band join is lossless at Hamming <= 3 (pigeonhole, verified)") {
    import spark.implicits._
    // exhaustive pairs over distinct-fingerprint groups, computed here
    // independently of the production band join
    val groups = MultimodalQueries.phashFingerprints(spark, sf)
      .groupBy($"hi", $"lo").agg(min($"doc_id").as("rep"))
      .collect().map(r => (r.getLong(2), r.getLong(0), r.getLong(1)))
    val exhaustive = (for {
      (ra, hiA, loA) <- groups; (rb, hiB, loB) <- groups if ra < rb
      h = java.lang.Long.bitCount(hiA ^ hiB) + java.lang.Long.bitCount(loA ^ loB)
      if h <= MultimodalQueries.PHashHammingMax
    } yield (ra, rb, h)).toSet
    val banded = MultimodalQueries.multimodalPhash(spark, sf)
      .select($"doc_a", $"doc_b", $"hamming")
      .as[(Long, Long, Int)].collect().toSet
    assert(banded == exhaustive)
  }

  test("multimodal_audio_fp: every injected re-encode is recalled, radius tight, band join lossless") {
    import spark.implicits._
    val fp = MultimodalQueries.afpFingerprints(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    graft.CacheRegistry.releaseAll(spark)
    val variants = fp.keys.filter(_ >= 1000000L).toSeq
    assert(variants.nonEmpty)
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    // recall: every lower-bit-depth re-encode within the radius
    val missed = variants.filterNot(v => ham(fp(v), fp(v - 1000000L)) <= MultimodalQueries.AfpHammingMax)
    assert(missed.isEmpty, s"re-encodes beyond Hamming ${MultimodalQueries.AfpHammingMax}: $missed")
    // tight: some variant actually exercises the near-dup path
    assert(variants.exists(v => fp(v) != fp(v - 1000000L)),
      "all re-encodes hash-identical — the Hamming radius is untested by this corpus")
    // discrimination: distinct tracks never collide into the radius
    // (band join ≡ exhaustive pairs, computed independently)
    val groups = fp.toSeq.groupBy(_._2).map { case (k, vs) => (vs.map(_._1).min, k) }.toSeq
    val exhaustive = (for {
      (ra, fa) <- groups; (rb, fb) <- groups if ra < rb
      h = ham(fa, fb) if h <= MultimodalQueries.AfpHammingMax
    } yield (ra, rb, h)).toSet
    val banded = MultimodalQueries.multimodalAudioFp(spark, sf)
      .select($"doc_a", $"doc_b", $"hamming")
      .as[(Long, Long, Int)].collect().toSet
    graft.CacheRegistry.releaseAll(spark)
    assert(banded == exhaustive, "band LSH diverged from the exhaustive distinct-group join")
  }
}
