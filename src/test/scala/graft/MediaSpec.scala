package graft

import graft.multimodal.MediaCodec

class MediaSpec extends SparkSpecBase {

  test("real ImageIO codec: encode → decode round-trips envelope AND pixels") {
    for (text <- Seq("the quick brown fox", "a" * 300, "")) {
      val a = MediaCodec.encode(7L, text)
      // the payload is a real container some JDK reader recognizes
      val m = MediaCodec.decode(a)
      assert(MediaCodec.Formats.contains(m.fmt), m)
      assert(m.width >= 16 && m.width < 80 && m.height >= 15 && m.height < 79, m)
      if (m.fmt == "gif") assert(m.n_frames >= 1 && m.n_frames <= 16, m)
      else assert(m.n_frames == 1, m)
      // lossless: the decoded luma grid IS the deterministic scene
      val img = MediaCodec.decodeImage(a)
      assert(img.getWidth == m.width && img.getHeight == m.height)
      val buf = MediaCodec.pixelBuf(text)
      val got = (0 until MediaCodec.PhashPixels)
        .map(i => img.getRaster.getSample(i % m.width, i / m.width, 0))
      assert(got == buf.toSeq, s"decoded pixels differ for fmt=${m.fmt}")
      // determinism: same doc → byte-identical container
      assert(java.util.Arrays.equals(a.payload, MediaCodec.encode(7L, text).payload))
    }
  }

  test("multi-frame gif: real container frame count matches the envelope") {
    // find a text whose envelope picks gif with >1 frame, then verify the
    // READER's getNumImages agrees — the frame count is parsed, not assumed
    val t = (1 to 200).map(i => s"doc text variant $i")
      .find { t =>
        val m = MediaCodec.decode(MediaCodec.encode(1L, t))
        m.fmt == "gif" && m.n_frames > 1
      }
    assert(t.isDefined, "no gif>1frame envelope in 200 variants (formula broke?)")
    val m = MediaCodec.decode(MediaCodec.encode(1L, t.get))
    assert(m.n_frames > 1 && m.n_frames <= 16)
  }

  test("decode covers every document exactly once") {
    val rows = run("mm_decode_meta").collect()
    assert(rows.length == 500)
    assert(rows.map(_.getLong(0)).distinct.length == 500)
  }

  test("frame sampling keeps every 4th frame of gif assets only") {
    val meta = run("mm_decode_meta").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(4))).toMap
    val frames = run("mm_frame_sample").collect()
    val byDoc = frames.groupBy(_.getLong(0))
    byDoc.foreach { case (doc, fr) =>
      val (fmt, nFrames) = meta(doc)
      assert(fmt == "gif")
      val expected = (0 until nFrames).count(_ % 4 == 0)
      assert(fr.length == expected)
      assert(fr.forall(r => r.getLong(2) == r.getLong(1) * 40))
    }
    val gifDocs = meta.collect { case (d, ("gif", _)) => d }.toSet
    assert(byDoc.keySet == gifDocs)
  }

  test("phash from decoded pixels equals phash from the source scene") {
    // the property the lossless round-trip buys: hashing the DECODED image
    // gives exactly the hash the oracle derives from the text
    for (text <- Seq("hello world, a modestly long document text for hashing",
        "x" * 500)) {
      val a = MediaCodec.encode(3L, text)
      val fromImage = MediaCodec.phash60(a)
      val buf = MediaCodec.pixelBuf(text).map(_.toLong)
      val tot = buf.sum
      val expected = (0 until 60).foldLeft(0L) { (h, b) =>
        val s = (0 until 4).map(j => buf(b * 4 + j)).sum
        if (s * 60 > tot) h | (1L << b) else h
      }
      assert(fromImage == expected)
    }
  }
}
