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

  test("decodePpm parses a hand-written P6 with header comments; rejects other magics") {
    implicit val enc = Encoders.product[MediaRow]
    // 2x2 image, maxval 255, comments between header tokens — the layout
    // a real tool (e.g. GIMP export) produces. Pixels: R=10/20/30/40,
    // G=50/60/70/80, B=90/100/110/120.
    val header = "P6\n# made by hand\n2 2\n# maxval next\n255\n".getBytes("US-ASCII")
    val body = Array[Int](
      10, 50, 90, 20, 60, 100,
      30, 70, 110, 40, 80, 120).map(_.toByte)
    val ppm = header ++ body
    val out = Multimodal.decodePpm(
      spark.createDataset(Seq(MediaRow(7L, ppm)))).collect().head
    assert(out === Multimodal.PpmStats(7L, 2L, 2L, 255L, 25.0, 65.0, 105.0))

    val bad = "P5\n2 2\n255\n".getBytes("US-ASCII") ++ body.take(4)
    val err = intercept[org.apache.spark.SparkException] {
      Multimodal.decodePpm(spark.createDataset(Seq(MediaRow(8L, bad)))).collect()
    }
    assert(err.getMessage.contains("not a binary PPM")
      || Option(err.getCause).exists(_.getMessage.contains("not a binary PPM")))
  }

  test("decodeWav walks chunks by declared size (junk + pad byte) and rejects non-RIFF") {
    implicit val enc = Encoders.product[MediaRow]
    // hand-built: RIFF/WAVE, fmt (PCM mono 8kHz 16-bit), a 3-byte junk
    // chunk whose pad byte must be skipped, data = samples 100, -200, 300
    val bb = java.nio.ByteBuffer.allocate(66).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(54).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(16000).putShort(2).putShort(16)
    bb.put("LIST".getBytes).putInt(3).put(Array[Byte](9, 9, 9)).put(0.toByte)
    bb.put("data".getBytes).putInt(6).putShort(100).putShort(-200).putShort(300)
    val out = Multimodal.decodeWav(
      spark.createDataset(Seq(MediaRow(3L, bb.array())))).collect().head
    assert(out === Multimodal.WavStats(3L, 3L, 8000L, 1L, 16L, (100 - 200 + 300) / 3.0, 300L))

    val err = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeWav(spark.createDataset(
        Seq(MediaRow(4L, "FORM0000AIFF".getBytes)))).collect()
    }
    assert(err.getMessage.contains("not a RIFF")
      || Option(err.getCause).exists(_.getMessage.contains("not a RIFF")))

    // 2× decimation of the same hand-built file keeps samples 0 and 2
    // (100, 300) and halves the declared rate through the parsed fmt
    val half = Multimodal.resampleWav(
      spark.createDataset(Seq(MediaRow(3L, bb.array()))), 2).collect().head
    assert(half === Multimodal.WavResampled(3L, 2L, 4000L, (100 + 300) / 2.0, 300L))
    // factor 1 degenerates to the identity stream
    val same = Multimodal.resampleWav(
      spark.createDataset(Seq(MediaRow(3L, bb.array()))), 1).collect().head
    assert((same.n_out, same.rate_out, same.peak_amp) === ((3L, 8000L, 300L)))
  }

  test("encodePpm -> decodePpm round-trips header-declared dimensions") {
    implicit val le = Encoders.LONG
    val ids = spark.createDataset(Seq(0L, 5L, 13L).map(java.lang.Long.valueOf))
    val got = Multimodal.decodePpm(Multimodal.encodePpm(ids))
      .collect().map(p => p.doc_id -> p).toMap
    Seq(0L, 5L, 13L).foreach { id =>
      val p = got(id)
      assert(p.width === 8 + id % 9, s"width of $id")
      assert(p.height === 6 + id % 5, s"height of $id")
      assert(p.maxval === 255L)
      // closed-form channel mean, computed independently of the codec
      def mean(c: Int): Double = {
        val n = (p.width * p.height).toInt
        (0 until n).map(px => (id * 131 + (3 * px + c) * 7) % 256).sum.toDouble / n
      }
      assert(p.mean_r === mean(0) && p.mean_g === mean(1) && p.mean_b === mean(2))
    }
  }

  test("resizePpm gathers true (x, y) pixels through the header, comments included") {
    implicit val enc = Encoders.product[MediaRow]
    import spark.implicits._
    // 2×2 image with a comment in the header; pixel (x,y) has channels
    // (3(y·2+x), +1, +2): (0,0)=(0,1,2) (1,0)=(3,4,5) (0,1)=(6,7,8) (1,1)=(9,10,11)
    val header = "P6\n# thumbnail fixture\n2 2\n255\n".getBytes("US-ASCII")
    val body = Array.tabulate[Byte](12)(_.toByte)
    val media = Seq(MediaRow(7L, header ++ body)).toDS()

    // 1×1: NN picks source (0,0) only
    val one = Multimodal.resizePpm(media, 1, 1).collect().head
    assert((one.src_w, one.src_h) === ((2L, 2L)))
    assert((one.mean_r, one.mean_g, one.mean_b) === ((0.0, 1.0, 2.0)))

    // 2×2: identity — means equal the full-image decode means
    val same = Multimodal.resizePpm(media, 2, 2).collect().head
    assert((same.mean_r, same.mean_g, same.mean_b) === ((4.5, 5.5, 6.5)))

    // 4×3 upsample: sx per x = 0,0,1,1; sy per y = 0,0,1 → rows y0,y1
    // replicate source row 0, y2 is source row 1; each row doubles pixels
    val up = Multimodal.resizePpm(media, 4, 3).collect().head
    val reds = Seq(0, 0, 3, 3, 0, 0, 3, 3, 6, 6, 9, 9)
    assert(up.mean_r === reds.sum.toDouble / 12)
    assert(up.mean_g === reds.map(_ + 1).sum.toDouble / 12)
    assert(up.mean_b === reds.map(_ + 2).sum.toDouble / 12)
  }

  test("vadWav counts maximal runs on a hand-built alternating-energy stream") {
    import spark.implicits._
    // 4 frames of 4 samples: loud, quiet, loud, loud -> 3 active, 2 runs
    val loud = Seq(20000, -20000, 20000, -20000)
    val quiet = Seq(1, -1, 1, -1)
    val samples = loud ++ quiet ++ loud ++ loud
    val data = samples.flatMap(v =>
      Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)).toArray
    val header = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    header.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(data.length)
    val payload = header.array() ++ data
    val media = Seq(Multimodal.MediaRow(7L, payload)).toDS()
    val got = Multimodal.vadWav(media, frame = 4, threshold = 16384L).collect().head
    assert(got.n_frames === 4L)
    assert(got.n_active === 3L, "loud frames clear the threshold, the quiet one doesn't")
    assert(got.n_segments === 2L, "the quiet frame splits the actives into two runs")
    assert(got.active_ratio === 0.75)
  }
}
