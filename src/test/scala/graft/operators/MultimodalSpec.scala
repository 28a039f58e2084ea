package graft.operators

import graft.SparkSpec
import graft.operators.Multimodal.{Frame, MediaRow}
import org.apache.spark.sql.Encoders

class MultimodalSpec extends SparkSpec {

  private def md5HexOfHex(bytes: Array[Byte]): String = {
    val hex = bytes.map(b => f"${b & 0xff}%02X").mkString
    java.security.MessageDigest.getInstance("MD5")
      .digest(hex.getBytes("US-ASCII")).map(b => f"${b & 0xff}%02x").mkString
  }

  test("extractFrames chunks into 256-byte frames with md5-of-hex checksums") {
    implicit val enc = Encoders.product[MediaRow]
    val payload = Array.tabulate[Byte](600)(i => (i % 251).toByte)
    val ds = spark.createDataset(Seq(MediaRow(7L, payload)))
    val frames = Multimodal.extractFrames(ds).collect().sortBy(_.frame_idx)
    assert(frames.map(f => (f.frame_idx, f.frame_bytes)).toSeq ===
      Seq((0L, 256L), (1L, 256L), (2L, 88L)))
    assert(frames(0).checksum === md5HexOfHex(payload.slice(0, 256)))
    assert(frames(2).checksum === md5HexOfHex(payload.slice(512, 600)))
  }

  test("extractFeatures: normalized high-nibble histogram") {
    implicit val enc = Encoders.product[MediaRow]
    // 0x00..0x0F once each → one count in bin 0..0 ... all 16 values have
    // high nibble 0 → bin0 = 16/16 = 1.0
    val lowNibbles = Array.tabulate[Byte](16)(_.toByte)
    val ds = spark.createDataset(Seq(MediaRow(1L, lowNibbles), MediaRow(2L, Array[Byte](0x70, 0x7F, 0x10))))
    val out = Multimodal.extractFeatures(ds).collect().map(f => f.doc_id -> f.features).toMap
    assert(out(1L)(0) === 1.0 && out(1L).sum === 1.0)
    assert(out(2L)(7) === 2.0 / 3.0 && out(2L)(1) === 1.0 / 3.0)
    assert(out(2L).size === 16)
  }

  test("resizePayloads keeps every step-th byte") {
    implicit val enc = Encoders.product[MediaRow]
    val ds = spark.createDataset(Seq(MediaRow(1L, Array[Byte](0, 1, 2, 3, 4, 5, 6, 7, 8))))
    val out = Multimodal.resizePayloads(ds, step = 4).collect().head
    assert(out.payload.toSeq === Seq[Byte](0, 4, 8))
  }

  test("extractFrames yields one empty frame for an empty payload") {
    implicit val enc = Encoders.product[MediaRow]
    val ds = spark.createDataset(Seq(MediaRow(1L, Array.emptyByteArray)))
    val frames: Array[Frame] = Multimodal.extractFrames(ds).collect()
    assert(frames.toSeq === Seq(Frame(1L, 0L, 0L, md5HexOfHex(Array.emptyByteArray))))
  }
}
