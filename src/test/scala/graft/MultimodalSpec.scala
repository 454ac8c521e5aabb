package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

/** The image-decode path: header synthesis in `mediaTable` and the pure-JVM
  * PNG/JPEG dimension parse in the decoder. The DuckDB oracle already
  * hash-checks the end-to-end round trip; these tests additionally prove
  * the parsers are REAL parsers (segment scanning, not fixed offsets) on
  * inputs the synthesized table never produces. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf0001 = TestSpark.sf0001

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be16(v: Long): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def hexBytes(h: String): Array[Byte] =
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("pngDims reads IHDR width/height; rejects non-PNG bytes") {
    val png = hexBytes("89504E470D0A1A0A0000000D49484452") ++
      be32(800) ++ be32(600) ++ hexBytes("080200000000000000") ++ "content".getBytes
    assert(Multimodal.pngDims(png) === Some((800L, 600L)))
    assert(Multimodal.pngDims("not a png at all, just text".getBytes) === None)
    assert(Multimodal.pngDims(Array.empty[Byte]) === None)
  }

  test("jpegDims walks marker segments, skipping APPn/COM before the SOF") {
    // JFIF-style layout the synthesized table never emits: SOI, APP0
    // (16-byte segment), COM, then SOF0 — a fixed-offset "parser" fails
    val app0 = hexBytes("FFE00010") ++ new Array[Byte](14)
    val com = hexBytes("FFFE0005") ++ "abc".getBytes
    val sof0 = hexBytes("FFC0001108") ++ be16(480) ++ be16(640) ++
      hexBytes("03011100021101031101")
    val jpeg = hexBytes("FFD8") ++ app0 ++ com ++ sof0 ++ "entropy".getBytes
    assert(Multimodal.jpegDims(jpeg) === Some((640L, 480L)))
    // progressive (SOF2) must also be recognized
    val sof2 = hexBytes("FFC2001108") ++ be16(33) ++ be16(44) ++
      hexBytes("03011100021101031101")
    assert(Multimodal.jpegDims(hexBytes("FFD8") ++ sof2) === Some((44L, 33L)))
    assert(Multimodal.jpegDims("plain bytes".getBytes) === None)
    // a truncated segment chain must stop cleanly, not throw
    assert(Multimodal.jpegDims(hexBytes("FFD8FFE0")) === None)
  }

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  test("wavMeta walks RIFF chunks (LIST before fmt), reads rate and duration") {
    // layout the synthesized table never emits: a LIST chunk precedes
    // fmt — a fixed-offset reader returns garbage, a chunk walker works
    val list = "LIST".getBytes ++ le32(6) ++ "INFOab".getBytes
    val fmt = "fmt ".getBytes ++ le32(16) ++
      Array[Byte](1, 0, 2, 0) ++ le32(44100) ++ le32(44100 * 4) ++ Array[Byte](4, 0, 16, 0)
    val data = "data".getBytes ++ le32(88200) // 0.5 s at 44.1kHz stereo 16-bit
    val wav = "RIFF".getBytes ++ le32(1000) ++ "WAVE".getBytes ++ list ++ fmt ++ data
    assert(Multimodal.wavMeta(wav) === Some((44100L, 500L)))
    assert(Multimodal.wavMeta("RIFFxxxxNOPE".getBytes) === None)
    assert(Multimodal.wavMeta("plain text".getBytes) === None)
    assert(Multimodal.wavMeta(Array.empty[Byte]) === None)
  }

  test("mp4DurationMs walks boxes (free before moov), handles v0 and v1 mvhd") {
    def box(name: String, body: Array[Byte]): Array[Byte] =
      be32(8 + body.length) ++ name.getBytes ++ body
    val ftyp = box("ftyp", "isom".getBytes ++ be32(0x200))
    val free = box("free", new Array[Byte](5))
    // v0: ver/flags, creation, modification, timescale 600, duration 1500 (= 2500 ms)
    val mvhd0 = box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(600) ++ be32(1500))
    val mp40 = ftyp ++ free ++ box("moov", mvhd0)
    assert(Multimodal.mp4DurationMs(mp40) === Some(2500L))
    // v1: 64-bit creation/modification/duration, timescale 90000, duration 180000 (= 2000 ms)
    val mvhd1 = box("mvhd", Array[Byte](1, 0, 0, 0) ++ new Array[Byte](16) ++
      be32(90000) ++ be32(0) ++ be32(180000))
    assert(Multimodal.mp4DurationMs(ftyp ++ box("moov", mvhd1)) === Some(2000L))
    assert(Multimodal.mp4DurationMs("not an mp4".getBytes) === None)
    assert(Multimodal.mp4DurationMs(ftyp) === None) // no moov at all
  }

  test("decoded audio/video metadata equals the values the headers declare") {
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), length(col("text").cast("binary")).cast("long").as("tlen"))
    val rows = Multimodal.mmPayloadMeta(spark, sf0001)
      .filter(col("kind") =!= "image")
      .join(docs, "doc_id")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id"); val tlen = r.getAs[Long]("tlen")
      if (r.getAs[String]("kind") == "audio") {
        val sr = 8000 + (tlen % 8) * 1000
        val br = sr * (tlen % 2 + 1) * 2
        assert(r.getAs[Long]("sample_rate") === sr, s"doc $id sample_rate")
        assert(r.getAs[Long]("duration_ms") === tlen * 1000 / br, s"doc $id audio duration")
        assert(r.getAs[Long]("byte_len") === tlen + Multimodal.wavHeaderLen, s"doc $id byte_len")
      } else {
        val dur = tlen % 90000 + 1000
        assert(r.getAs[Long]("duration_ms") === dur, s"doc $id video duration")
        assert(r.getAs[Long]("n_frames") === dur / 100, s"doc $id n_frames")
        assert(r.getAs[Long]("byte_len") === tlen + Multimodal.mp4HeaderLen, s"doc $id byte_len")
      }
    }
  }

  test("tiled mm_feature_ann equals the naive broadcast-join + window form") {
    // The round-16 rewrite replaced the all-pairs join + row_number form
    // (alpha 1.78 in the 10×-row scaling sweep) with the fused
    // cell_topk_pairs tile kernel. The claim is BIT-identical results —
    // same left-fold dot, same (cosine DESC, cand_id ASC) tie-break,
    // same self-pair exclusion — so compare against the naive form
    // exactly, doubles included (the DuckDB oracle's row hash already
    // demands exact equality; this pins WHICH side a future drift is on).
    import org.apache.spark.sql.expressions.Window
    val dot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      graft.plans.VectorFunctions.vec_dot(a, b)
    val n = Multimodal.featureVectors(spark, sf0001)
      .withColumn("nrm", sqrt(dot(col("features"), col("features"))))
      .filter(col("nrm") > 0)
    val q = n.filter(col("kind") === "image" && col("doc_id") % Multimodal.annQueryStride === 0)
      .select(col("doc_id").as("q_id"), col("features").as("q_f"), col("nrm").as("q_nrm"))
    val c = n.select(col("doc_id").as("cand_id"), col("features").as("c_f"), col("nrm").as("c_nrm"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("cand_id"))
    val naive = c.join(broadcast(q), col("cand_id") =!= col("q_id"))
      .withColumn("cosine", dot(col("q_f"), col("c_f")) / (col("q_nrm") * col("c_nrm")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= Multimodal.annTopK)
      .select(col("q_id"), col("rk"), col("cand_id"), col("cosine"))
      .orderBy(col("q_id"), col("rk"))
      .collect().toSeq
    val tiled = Multimodal.mmFeatureAnn(spark, sf0001).collect().toSeq
    assert(naive.nonEmpty)
    assert(tiled === naive)
  }

  test("exact mm_feature_ann REFUSES an over-limit corpus (guard survives optimization)") {
    // round 17 (r16 scaling sweep flag 2): the tiled kernel bounded the
    // exact form's intermediates, but compute is still Q × N cosines —
    // the plan must refuse full corpora like dedup_embedding_cosine.
    // Bound injected below the sf0.001 row count so the raise_error
    // arm fires; the filter consumes the guard column so optimization
    // cannot prune it.
    val overLimit = Multimodal.mmFeatureAnnBounded(spark, sf0001, maxRows = 10L)
    val ex = intercept[Exception] { overLimit.collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("refuses")),
      s"expected the guard's refusal message, got: ${ex.getMessage}")
    assert(Multimodal.mmFeatureAnnBounded(spark, sf0001, maxRows = 10L)
      .queryExecution.optimizedPlan.toString.contains("raise_error"),
      "guard pruned from optimized plan")
    // the in-limit path is unchanged (the oracled sf0.001 shape)
    assert(Multimodal.mmFeatureAnn(spark, sf0001).count() > 0)
  }

  test("mm_feature_ann_blocked: top-1 self-evident properties + recall vs exact") {
    // the IVF-blocked twin's contract: per-query rows ≤ annTopK, ranks
    // dense from 1, every (q, cand) pair's cosine EQUALS the exact
    // form's for that pair (same vec_dot arithmetic), and recall@k vs
    // the exact ground truth is real (blocking may only DROP pairs,
    // never invent or re-score them).
    val exact = Multimodal.mmFeatureAnn(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val blocked = Multimodal.mmFeatureAnnBlocked(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(blocked.nonEmpty)
    val perQ = blocked.groupBy(_._1)
    assert(perQ.values.forall(rows =>
      rows.length <= Multimodal.annTopK &&
        rows.map(_._2).sorted.toSeq == (1L to rows.length).toSeq),
      "blocked ranks not dense 1..k per query")
    val exactCos = exact.map(t => (t._1, t._3) -> t._4).toMap
    val shared = blocked.filter(t => exactCos.contains((t._1, t._3)))
    assert(shared.forall(t => exactCos((t._1, t._3)) == t._4),
      "blocked cosine diverges from the exact form's for the same pair")
    val exactPairs = exact.map(t => (t._1, t._3)).toSet
    val blockedPairs = blocked.map(t => (t._1, t._3)).toSet
    val recall = (exactPairs intersect blockedPairs).size.toDouble / exactPairs.size
    info(f"blocked feature-ANN recall vs exact top-k: $recall%.3f (${exactPairs.size} exact pairs)")
    assert(recall >= 0.3, f"recall $recall%.3f below 0.3")
  }

  test("decoded image dimensions equal the values the headers declare") {
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), length(col("text").cast("binary")).cast("long").as("tlen"))
    val rows = Multimodal.mmPayloadMeta(spark, sf0001)
      .filter(col("kind") === "image")
      .join(docs, "doc_id")
      .select(col("doc_id"), col("width"), col("height"), col("tlen"), col("byte_len"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, w, h, tlen, blen) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(w === tlen % 640 + 1, s"doc $id width")
      assert(h === tlen % 480 + 1, s"doc $id height")
      val header = if (id % 6 == 0) Multimodal.pngHeaderLen else Multimodal.jpegHeaderLen
      assert(blen === tlen + header, s"doc $id byte_len")
    }
  }
}
