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
