package graft

import graft.multimodal.{MediaAsset, MediaCodec}

class MediaSpec extends SparkSpecBase {

  test("stub codec is deterministic and total over payload bytes") {
    val a = MediaAsset(1L, Array.tabulate(16)(_.toByte))
    val m1 = MediaCodec.decode(a); val m2 = MediaCodec.decode(a)
    assert(m1 == m2)
    assert(MediaCodec.Formats.contains(m1.fmt))
    assert(m1.width >= 64 && m1.height >= 64 && m1.n_frames >= 1 && m1.n_frames <= 16)
  }

  test("decode covers every document exactly once") {
    val rows = run("mm_decode_meta").collect()
    assert(rows.length == 500)
    assert(rows.map(_.getLong(0)).distinct.length == 500)
  }

  test("frame sampling keeps every 4th frame of webp assets only") {
    val meta = run("mm_decode_meta").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(4))).toMap
    val frames = run("mm_frame_sample").collect()
    val byDoc = frames.groupBy(_.getLong(0))
    byDoc.foreach { case (doc, fr) =>
      val (fmt, nFrames) = meta(doc)
      assert(fmt == "webp")
      val expected = (0 until nFrames).count(_ % 4 == 0)
      assert(fr.length == expected)
      assert(fr.forall(r => r.getLong(2) == r.getLong(1) * 40))
    }
    val webpDocs = meta.collect { case (d, ("webp", _)) => d }.toSet
    assert(byDoc.keySet == webpDocs)
  }
}
