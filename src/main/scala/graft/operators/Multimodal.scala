package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.VectorOps
import org.apache.spark.sql.{Encoder, Encoders, SparkSession, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: opaque `binary` payloads with typed
  * metadata, joint text⋈vector analytics, and a batch frame-extraction
  * path shaped like a real media decoder.
  *
  * The container has no image/audio codecs, so the payload here is the
  * document text encoded as bytes and the "decoder" is a deterministic
  * fake (fixed-size frames + md5 checksums) — but the Spark-side plumbing
  * is the real thing: binary columns flow through scans/projections as
  * opaque bytes, metadata is extracted with codegen'd expressions, and the
  * per-frame path runs as typed `mapPartitions` batches exactly where a
  * JNI/FFmpeg/pillow call would sit on a real cluster (one decoder init
  * per partition, streaming over rows — never per-row setup).
  */
object Multimodal {

  /** A row carrying an opaque media payload. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  /** One decoded "frame": `frame_idx`-th 256-byte chunk of the payload. */
  final case class Frame(doc_id: Long, frame_idx: Long, frame_bytes: Long, checksum: String)

  private val FrameSize = 256

  private val hexDigits = "0123456789ABCDEF".toCharArray

  private def toHex(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sb.append(hexDigits(b >>> 4)).append(hexDigits(b & 0xf))
      i += 1
    }
    sb.toString
  }

  /** The stubbed decode: in a real pipeline this partition-batch loop is
    * where the codec runs (`???` boundary). Here it chunks the payload into
    * fixed frames and checksums each — deterministic, oracle-checkable. */
  def extractFrames(media: Dataset[MediaRow]): Dataset[Frame] = {
    implicit val enc: Encoder[Frame] = Encoders.product[Frame]
    media.mapPartitions { rows =>
      // One digest instance per partition — the "decoder init" slot.
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        val n = r.payload.length
        val nFrames = math.max((n + FrameSize - 1) / FrameSize, 1)
        (0 until nFrames).iterator.map { f =>
          val lo = f * FrameSize
          val hi = math.min(lo + FrameSize, n)
          val chunk = java.util.Arrays.copyOfRange(r.payload, lo, hi)
          md.reset()
          // Checksum over the UPPERCASE hex rendering so a SQL oracle
          // (which cannot md5 raw blobs) reproduces it: md5(hex(frame)).
          val digest = md.digest(toHex(chunk).getBytes("US-ASCII"))
          Frame(r.doc_id, f.toLong, (hi - lo).toLong, toHex(digest).toLowerCase)
        }
      }
    }
  }

  /** Deterministic stand-in "feature extractor": 16-bin histogram of the
    * payload's high nibbles, normalized — the shape (fixed-length
    * `array<double>` per item, batch iteration, per-partition init) is
    * exactly what a real embedding/feature model invocation has. */
  final case class Features(doc_id: Long, features: Seq[Double])

  def extractFeatures(media: Dataset[MediaRow]): Dataset[Features] = {
    implicit val enc: Encoder[Features] = Encoders.product[Features]
    media.mapPartitions { rows =>
      // per-partition "model load" slot
      rows.map { r =>
        val bins = new Array[Double](16)
        var i = 0
        while (i < r.payload.length) {
          bins((r.payload(i) & 0xff) >>> 4) += 1.0
          i += 1
        }
        val n = math.max(r.payload.length, 1).toDouble
        Features(r.doc_id, bins.map(_ / n).toSeq)
      }
    }
  }

  /** Deterministic "resize": keep every `step`-th byte of the payload —
    * the 1-D stand-in for image downsampling, through the same batch
    * decode path (real resize swaps the byte picker for a codec call). */
  def resizePayloads(media: Dataset[MediaRow], step: Int): Dataset[MediaRow] = {
    require(step > 0)
    implicit val enc: Encoder[MediaRow] = Encoders.product[MediaRow]
    media.mapPartitions { rows =>
      rows.map { r =>
        val out = new Array[Byte]((r.payload.length + step - 1) / step)
        var i = 0
        while (i < out.length) { out(i) = r.payload(i * step); i += 1 }
        MediaRow(r.doc_id, out)
      }
    }
  }

  /** Decoded P6 image stats: header fields as parsed + per-channel means. */
  final case class PpmStats(doc_id: Long, width: Long, height: Long, maxval: Long,
                            mean_r: Double, mean_g: Double, mean_b: Double)

  /** Builds a VALID binary PPM (P6) per doc: `P6\n<w> <h>\n255\n` + w·h·3
    * RGB bytes with byte k = (doc_id·131 + k·7) mod 256. The closed-form
    * pixel body is what lets a SQL oracle check the decode without ever
    * seeing the bytes; the header is what makes the payload a real image
    * file any PPM reader opens. */
  def encodePpm(ids: Dataset[java.lang.Long]): Dataset[MediaRow] = {
    implicit val enc: Encoder[MediaRow] = Encoders.product[MediaRow]
    ids.mapPartitions { rows =>
      rows.map { idBoxed =>
        val id = idBoxed.longValue()
        val w = (8 + id % 9).toInt
        val h = (6 + id % 5).toInt
        val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
        val body = new Array[Byte](w * h * 3)
        var k = 0
        while (k < body.length) {
          body(k) = ((id * 131 + k * 7) % 256).toByte
          k += 1
        }
        val out = new Array[Byte](header.length + body.length)
        System.arraycopy(header, 0, out, 0, header.length)
        System.arraycopy(body, 0, out, header.length, body.length)
        MediaRow(id, out)
      }
    }
  }

  /** The REAL codec at the decode seam: a general binary-PPM (P6) parser
    * — magic, `#` comments, whitespace-separated width/height/maxval,
    * single post-maxval whitespace byte, then the raw RGB body — run as
    * a typed `mapPartitions` batch exactly like [[extractFrames]]'s stub.
    * Nothing about the image dimensions is trusted from outside the
    * payload: width/height/maxval come from the parsed header, so any
    * off-by-one in header parsing or body offset shifts every channel
    * mean and fails the byte-exact oracle. */
  /** Parsed P6 header: width, height, maxval, and the byte offset of the
    * first body byte. General parser — magic, `#` comments,
    * whitespace-separated fields, single post-maxval whitespace byte —
    * shared by the stats decode and the pixel-addressed resize so both
    * trust ONLY the payload's own header. */
  private def parsePpmHeader(b: Array[Byte]): (Int, Int, Int, Int) = {
    var pos = 0
    def skipWsAndComments(): Unit = {
      var go = true
      while (go && pos < b.length) {
        val c = b(pos)
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r') pos += 1
        else if (c == '#') { while (pos < b.length && b(pos) != '\n') pos += 1 }
        else go = false
      }
    }
    def token(): String = {
      skipWsAndComments()
      val start = pos
      while (pos < b.length && !Character.isWhitespace(b(pos).toChar)) pos += 1
      new String(b, start, pos - start, "US-ASCII")
    }
    val magic = token()
    require(magic == "P6", s"not a binary PPM: magic '$magic'")
    val w = token().toInt
    val h = token().toInt
    val maxval = token().toInt
    pos += 1 // exactly ONE whitespace byte separates maxval from the body
    require(b.length - pos == w * h * 3,
      s"body is ${b.length - pos} bytes, expected ${w * h * 3}")
    (w, h, maxval, pos)
  }

  def decodePpm(media: Dataset[MediaRow]): Dataset[PpmStats] = {
    implicit val enc: Encoder[PpmStats] = Encoders.product[PpmStats]
    media.mapPartitions { rows =>
      rows.map { r =>
        val b = r.payload
        val (w, h, maxval, body) = parsePpmHeader(b)
        val sums = new Array[Long](3)
        var pos = body
        var k = 0
        while (pos < b.length) {
          sums(k % 3) += b(pos) & 0xff
          pos += 1
          k += 1
        }
        val n = (w * h).toDouble
        PpmStats(r.doc_id, w.toLong, h.toLong, maxval.toLong,
          sums(0) / n, sums(1) / n, sums(2) / n)
      }
    }
  }

  /** Stats of a nearest-neighbor resize to `tw`×`th`. */
  final case class PpmResized(doc_id: Long, src_w: Long, src_h: Long,
                              mean_r: Double, mean_g: Double, mean_b: Double)

  /** REAL pixel-addressed image resize at the codec seam: decode the P6
    * payload, gather the nearest-neighbor source pixel for every target
    * pixel (sx = ⌊x·w/tw⌋, sy = ⌊y·h/th⌋ — the standard NN downsample),
    * and emit per-channel means of the RESIZED image. Unlike
    * [[resizePayloads]]'s 1-D byte picker, this addresses true (x, y)
    * pixel coordinates through the parsed header, so any row-stride or
    * channel-interleave mistake lands on wrong bytes and fails the
    * byte-exact oracle. Same typed `mapPartitions` batch slot as every
    * codec op. */
  def resizePpm(media: Dataset[MediaRow], tw: Int, th: Int): Dataset[PpmResized] = {
    require(tw > 0 && th > 0)
    implicit val enc: Encoder[PpmResized] = Encoders.product[PpmResized]
    media.mapPartitions { rows =>
      rows.map { r =>
        val b = r.payload
        val (w, h, _, body) = parsePpmHeader(b)
        val sums = new Array[Long](3)
        var y = 0
        while (y < th) {
          val sy = y * h / th
          var x = 0
          while (x < tw) {
            val sx = x * w / tw
            val p = body + 3 * (sy * w + sx)
            sums(0) += b(p) & 0xff
            sums(1) += b(p + 1) & 0xff
            sums(2) += b(p + 2) & 0xff
            x += 1
          }
          y += 1
        }
        val n = (tw * th).toDouble
        PpmResized(r.doc_id, w.toLong, h.toLong,
          sums(0) / n, sums(1) / n, sums(2) / n)
      }
    }
  }

  /** Decoded WAV stats: fmt-chunk fields as parsed + sample statistics. */
  final case class WavStats(doc_id: Long, n_samples: Long, sample_rate: Long,
                            channels: Long, bits: Long, mean_amp: Double, peak_amp: Long)

  /** Builds a VALID RIFF/WAVE file per doc: `RIFF` header, canonical
    * 16-byte PCM `fmt ` chunk (mono, 8 kHz, 16-bit), a 7-byte `JUNK`
    * chunk WITH its RIFF pad byte (real files carry LIST/cue chunks —
    * the decoder must walk, not assume, the layout), then the `data`
    * chunk: little-endian int16 samples with sample n =
    * ((doc_id·37 + n·11) mod 65536) − 32768. */
  def encodeWav(ids: Dataset[java.lang.Long]): Dataset[MediaRow] = {
    implicit val enc: Encoder[MediaRow] = Encoders.product[MediaRow]
    ids.mapPartitions { rows =>
      rows.map { idBoxed =>
        val id = idBoxed.longValue()
        val n = (64 + id % 33).toInt
        val dataBytes = n * 2
        val riffSize = 4 + (8 + 16) + (8 + 7 + 1) + (8 + dataBytes)
        val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        buf.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
          .put("WAVE".getBytes("US-ASCII"))
        buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1) // PCM
          .putShort(1) // mono
          .putInt(8000) // sample rate
          .putInt(8000 * 2) // byte rate
          .putShort(2) // block align
          .putShort(16) // bits per sample
        buf.put("JUNK".getBytes("US-ASCII")).putInt(7)
          .put(Array.tabulate[Byte](7)(i => i.toByte)).put(0.toByte) // pad to even
        buf.put("data".getBytes("US-ASCII")).putInt(dataBytes)
        var s = 0
        while (s < n) {
          buf.putShort((((id * 37 + s * 11) % 65536) - 32768).toShort)
          s += 1
        }
        MediaRow(id, buf.array())
      }
    }
  }

  /** A REAL RIFF/WAVE chunk walker at the decode seam: verifies the
    * RIFF/WAVE magic, then iterates chunks by their declared sizes —
    * parsing `fmt `, skipping unknown chunks INCLUDING the odd-size pad
    * rule, and computing PCM sample stats from `data` using the
    * fmt-declared bit depth and channel count. Nothing about the layout
    * is assumed: a decoder that didn't honor chunk sizes or the pad
    * byte would misread every sample and fail the closed-form oracle. */
  /** Parsed RIFF/WAVE layout: fmt fields + the data chunk's byte extent.
    * One chunk walker (junk skipping, odd-size pad rule) shared by the
    * stats decode and the resampler, so both trust only the payload. */
  private def parseWav(payload: Array[Byte]): (Long, Long, Long, Int, Int) = {
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourCC(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(fourCC() == "RIFF", "not a RIFF file")
    buf.getInt // riff size
    require(fourCC() == "WAVE", "not a WAVE form")
    var channels = 0L; var rate = 0L; var bits = 0L
    var dataStart = -1; var dataSize = 0
    while (buf.remaining() >= 8) {
      val cc = fourCC()
      val size = buf.getInt
      val next = buf.position() + size + (size & 1) // chunks pad to even
      cc match {
        case "fmt " =>
          buf.getShort // audio format (1 = PCM)
          channels = buf.getShort.toLong
          rate = buf.getInt.toLong
          buf.getInt // byte rate
          buf.getShort // block align
          bits = buf.getShort.toLong
        case "data" =>
          require(bits == 16 && channels == 1,
            s"unsupported PCM layout: $bits-bit, $channels ch")
          dataStart = buf.position()
          dataSize = size
        case _ => () // JUNK/LIST/cue — skip by declared size
      }
      buf.position(math.min(next, buf.limit()))
    }
    require(dataStart >= 0, "no data chunk")
    (channels, rate, bits, dataStart, dataSize)
  }

  private def leShort(b: Array[Byte], p: Int): Long =
    (((b(p + 1) << 8) | (b(p) & 0xff)).toShort).toLong

  def decodeWav(media: Dataset[MediaRow]): Dataset[WavStats] = {
    implicit val enc: Encoder[WavStats] = Encoders.product[WavStats]
    media.mapPartitions { rows =>
      rows.map { r =>
        val (channels, rate, bits, dataStart, dataSize) = parseWav(r.payload)
        var nSamples = 0L; var sum = 0L; var peak = 0L
        var p = dataStart
        while (p + 1 < dataStart + dataSize) {
          val v = leShort(r.payload, p)
          sum += v
          if (math.abs(v) > peak) peak = math.abs(v)
          nSamples += 1
          p += 2
        }
        WavStats(r.doc_id, nSamples, rate, channels, bits,
          sum.toDouble / math.max(nSamples, 1), peak)
      }
    }
  }

  /** Stats of a decimated (every `factor`-th sample) PCM stream. */
  final case class WavResampled(doc_id: Long, n_out: Long, rate_out: Long,
                                mean_amp: Double, peak_amp: Long)

  /** REAL audio downsample at the codec seam: walk the RIFF layout, keep
    * every `factor`-th 16-bit sample of the data chunk (8 kHz → 8/factor
    * kHz decimation — the cheap resample a feature-extraction pipeline
    * runs before windowed analysis), and emit stats of the RESAMPLED
    * stream. Sample addressing goes through the parsed chunk extent, so
    * a pad-byte or offset slip selects different samples and fails the
    * closed-form oracle. */
  def resampleWav(media: Dataset[MediaRow], factor: Int): Dataset[WavResampled] = {
    require(factor > 0)
    implicit val enc: Encoder[WavResampled] = Encoders.product[WavResampled]
    media.mapPartitions { rows =>
      rows.map { r =>
        val (_, rate, _, dataStart, dataSize) = parseWav(r.payload)
        var nOut = 0L; var sum = 0L; var peak = 0L
        var p = dataStart
        val step = 2 * factor
        while (p + 1 < dataStart + dataSize) {
          val v = leShort(r.payload, p)
          sum += v
          if (math.abs(v) > peak) peak = math.abs(v)
          nOut += 1
          p += step
        }
        WavResampled(r.doc_id, nOut, rate / factor,
          sum.toDouble / math.max(nOut, 1), peak)
      }
    }
  }

  /** Frame-energy segmentation of a PCM stream (VAD shape). */
  final case class WavVad(doc_id: Long, n_frames: Long, n_active: Long,
                          n_segments: Long, active_ratio: Double)

  /** Energy-based voice-activity segmentation at the codec seam — the
    * speech-curation step that decides which parts of an audio corpus
    * are worth transcribing/training on: the data chunk is windowed
    * into fixed `frame`-sample frames, a frame is ACTIVE iff its
    * summed |amplitude| clears `threshold`·frame (all-integer compare —
    * no fp anywhere, so the oracle is exact by arithmetic), and
    * segments are maximal runs of active frames. Sample addressing goes
    * through the parsed chunk extent, same trust contract as
    * [[decodeWav]]/[[resampleWav]]. */
  def vadWav(media: Dataset[MediaRow], frame: Int, threshold: Long): Dataset[WavVad] = {
    require(frame > 0)
    implicit val enc: Encoder[WavVad] = Encoders.product[WavVad]
    media.mapPartitions { rows =>
      rows.map { r =>
        val (_, _, _, dataStart, dataSize) = parseWav(r.payload)
        val nf = dataSize / 2 / frame // trailing partial frame dropped
        var f = 0; var nAct = 0L; var nSeg = 0L; var prev = false
        while (f < nf) {
          var j = 0; var sabs = 0L
          while (j < frame) {
            sabs += math.abs(leShort(r.payload, dataStart + 2 * (f * frame + j)))
            j += 1
          }
          val act = sabs >= threshold * frame
          if (act) { nAct += 1; if (!prev) nSeg += 1 }
          prev = act
          f += 1
        }
        WavVad(r.doc_id, nf, nAct, nSeg,
          nAct.toDouble / math.max(nf, 1))
      }
    }
  }

  /** Per-doc zero-crossing count of a PCM stream. */
  final case class WavZcr(doc_id: Long, n_samples: Long, n_crossings: Long,
                          zcr: Double)

  /** Zero-crossing rate at the codec seam — with frame energy (m15) the
    * other classic O(n) audio feature (voiced/unvoiced and noise-vs-
    * tone discrimination in speech curation): count sign CHANGES
    * between consecutive samples (zero itself is non-negative — the
    * `v < 0` convention on both sides, so the count is exact integer
    * arithmetic end to end). */
  def zcrWav(media: Dataset[MediaRow]): Dataset[WavZcr] = {
    implicit val enc: Encoder[WavZcr] = Encoders.product[WavZcr]
    media.mapPartitions { rows =>
      rows.map { r =>
        val (_, _, _, dataStart, dataSize) = parseWav(r.payload)
        val n = dataSize / 2
        var i = 1; var crossings = 0L
        while (i < n) {
          val a = leShort(r.payload, dataStart + 2 * (i - 1)) < 0
          val b = leShort(r.payload, dataStart + 2 * i) < 0
          if (a != b) crossings += 1
          i += 1
        }
        WavZcr(r.doc_id, n, crossings,
          crossings.toDouble / math.max(n - 1, 1))
      }
    }
  }

  /** m01/m07 share one oracle: same logical query, two physical layouts. */
  private val jointStatsOracle =
    """SELECT d.lang, e.label, count(*) AS n,
      |       round(avg(d.n_chars), 6) AS avg_chars,
      |       round(avg(sqrt(list_sum(list_transform(range(1, len(e.embedding)+1),
      |           i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)))), 6) AS avg_norm
      |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
      |GROUP BY d.lang, e.label""".stripMargin

  private def jointStats(docs: org.apache.spark.sql.DataFrame,
                         embs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.join(embs, col("doc_id") === col("vec_id"))
      .groupBy("lang", "label")
      .agg(count(lit(1)).as("n"),
        // averages rounded at the edge: summation order differs between
        // engines, and a bit-exact comparator would flag the fp noise
        round(avg("n_chars"), 6).as("avg_chars"),
        round(avg(VectorOps.norm(col("embedding"))), 6).as("avg_norm"))

  val defs: Seq[QueryDef] = Seq(

    // Joint text ⋈ embedding analytics: per (lang, label) corpus stats.
    // At scale this is the canonical shuffle join on the shared id
    // (both sides can be bucketed on it to make the join shuffle-free —
    // m07 below is exactly that).
    QueryDef.sql("m01_joint_stats", jointStatsOracle) {
      (s, dir) =>
        jointStats(Tables.documents(s, dir), Tables.embeddings(s, dir))
    },

    // The SAME joint query over the bucketed layout
    // (operators.Bucketing.llmTables): documents bucket-sorted by doc_id,
    // embeddings by vec_id, equal bucket counts — the doc_id = vec_id
    // join plans with ZERO Exchange on either side (plan-asserted in
    // BucketingSpec). The layout is written once per (session, source)
    // and reused; at 100 TB that write is the amortized shuffle and every
    // downstream dedup/ANN join rides it. Oracle: identical to m01 —
    // layout must never change results.
    QueryDef.sql("m07_joint_stats_bucketed", jointStatsOracle) {
      (s, dir) => {
        val (docs, embs) = Bucketing.llmTables(s, dir)
        jointStats(docs, embs)
      }
    },

    // Binary-column metadata: payload as opaque bytes; length, leading
    // "magic" bytes, content checksum — all codegen'd expressions, the
    // binary never leaves the JVM row format.
    QueryDef.sql("m02_binary_meta",
      """SELECT doc_id,
        |       CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
        |       substr(upper(hex(text::BLOB)), 1, 8) AS magic4,
        |       md5(upper(hex(text::BLOB))) AS checksum,
        |       CAST(ceil(octet_length(text::BLOB) / 256.0) AS BIGINT) AS n_frames
        |FROM documents""".stripMargin) {
      (s, dir) =>
        val bin = col("text").cast("binary")
        Tables.documents(s, dir).select(
          col("doc_id"),
          length(bin).cast("long").as("n_bytes"),
          substring(upper(hex(bin)), 1, 8).as("magic4"),
          md5(upper(hex(bin))).as("checksum"),
          ceil(length(bin) / lit(256.0)).cast("long").as("n_frames"))
    },

    // Frame extraction through the typed mapPartitions decode path.
    QueryDef.sql("m03_frame_extract",
      """SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
        |       CAST(len(fh) / 2 AS BIGINT) AS frame_bytes,
        |       md5(fh) AS checksum
        |FROM (
        |  SELECT doc_id, f,
        |         substr(upper(hex(text::BLOB)), CAST(f * 512 + 1 AS BIGINT), 512) AS fh
        |  FROM documents,
        |       unnest(range(0, greatest(CAST(ceil(octet_length(text::BLOB) / 256.0) AS BIGINT), 1))) AS u(f))""".stripMargin) {
      (s, dir) => {
        implicit val enc: Encoder[MediaRow] = Encoders.product[MediaRow]
        val media = Tables.documents(s, dir)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[MediaRow]
        extractFrames(media).toDF()
      }
    },

    // "Resize" (every-4th-byte downsample) through the batch decode path,
    // verified byte-for-byte by the oracle over the hex rendering.
    QueryDef.sql("m05_resize",
      """SELECT doc_id,
        |       CAST(len(rh) / 2 AS BIGINT) AS n_bytes,
        |       md5(rh) AS checksum
        |FROM (
        |  SELECT doc_id,
        |         array_to_string(list_transform(
        |           range(0, CAST(ceil(octet_length(text::BLOB) / 4.0) AS BIGINT)),
        |           i -> substr(upper(hex(text::BLOB)), CAST(i * 8 + 1 AS BIGINT), 2)), '') AS rh
        |  FROM documents)""".stripMargin) {
      (s, dir) => {
        implicit val enc: Encoder[MediaRow] = Encoders.product[MediaRow]
        val media = Tables.documents(s, dir)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[MediaRow]
        resizePayloads(media, step = 4).toDF()
          .select(col("doc_id"),
            length(col("payload")).cast("long").as("n_bytes"),
            md5(upper(hex(col("payload")))).as("checksum"))
      }
    },

    // Frame SAMPLING — the keyframe-style path a video pipeline runs:
    // decode, keep every 4th frame. The filter composes onto the typed
    // decode output and prunes BEFORE any downstream feature work; on a
    // real codec the sampler would push into the decoder (seek-to-frame)
    // — the operator contract (doc, sampled frame set, checksums) is the
    // same and is what the oracle pins.
    QueryDef.sql("m06_frame_sample",
      """SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
        |       CAST(len(fh) / 2 AS BIGINT) AS frame_bytes,
        |       md5(fh) AS checksum
        |FROM (
        |  SELECT doc_id, f,
        |         substr(upper(hex(text::BLOB)), CAST(f * 512 + 1 AS BIGINT), 512) AS fh
        |  FROM documents,
        |       unnest(range(0, greatest(CAST(ceil(octet_length(text::BLOB) / 256.0) AS BIGINT), 1))) AS u(f))
        |WHERE f % 4 = 0""".stripMargin) {
      (s, dir) => {
        implicit val enc: Encoder[MediaRow] = Encoders.product[MediaRow]
        val media = Tables.documents(s, dir)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[MediaRow]
        // column predicate, not a typed lambda: the lambda form would
        // deserialize every Frame just to test the modulus
        extractFrames(media).toDF().filter(col("frame_idx") % 4 === 0)
      }
    },

    // Feature extraction through the same batch-decode path. The 16-bin
    // high-nibble histogram IS SQL-expressible over the hex rendering
    // (nibble j of the payload = hex char 2j+1), so the oracle recomputes
    // three probe bins exactly: bin value = count(nibble == digit) / n,
    // an integer/integer division both engines perform in doubles.
    QueryDef.sql("m04_feature_extract", {
      def bin(d: Char, alias: String) =
        s"round(len(list_filter(range(0, CAST(octet_length(text::BLOB) AS BIGINT)), " +
          s"j -> substr(upper(hex(text::BLOB)), CAST(2*j+1 AS BIGINT), 1) = '$d')) " +
          s"/ greatest(octet_length(text::BLOB), 1), 6) AS $alias"
      s"""SELECT doc_id,
         |       ${bin('0', "bin0")},
         |       ${bin('6', "bin6")},
         |       ${bin('F', "bin15")},
         |       CAST(16 AS BIGINT) AS n_bins
         |FROM documents""".stripMargin
    }) {
      (s, dir) => {
        implicit val enc: Encoder[MediaRow] = Encoders.product[MediaRow]
        val media = Tables.documents(s, dir)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[MediaRow]
        extractFeatures(media).toDF()
          .select(col("doc_id"),
            round(element_at(col("features"), 1), 6).as("bin0"),
            round(element_at(col("features"), 7), 6).as("bin6"),
            round(element_at(col("features"), 16), 6).as("bin15"),
            size(col("features")).cast("long").as("n_bins"))
      }
    },

    // Media batch assembly: pack binary payloads into ~4 KB byte-budget
    // batches per shard — t12's sequence packing applied to MEDIA bytes
    // (the collate step before GPU transfer, where batches are sized by
    // payload bytes, not item count). Same per-shard running-sum design:
    // packing parallelizes across shards, one window shuffle total.
    QueryDef.sql("m08_batch_pack",
      """WITH base AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |         CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
        |  FROM documents),
        |packed AS (
        |  SELECT shard, n_bytes,
        |         CAST(floor((sum(n_bytes) OVER (PARTITION BY shard ORDER BY doc_id
        |              ROWS UNBOUNDED PRECEDING) - n_bytes) / 4096.0) AS BIGINT) AS pack
        |  FROM base)
        |SELECT shard, pack, count(*) AS n_items,
        |       CAST(sum(n_bytes) AS BIGINT) AS pack_bytes
        |FROM packed GROUP BY 1, 2""".stripMargin) {
      (s, dir) =>
        Packing.packByBudget(
          Tables.documents(s, dir)
            .select(col("doc_id"), (col("doc_id") % 8).as("shard"),
              length(col("text").cast("binary")).cast("long").as("n_bytes")),
          "n_bytes", budget = 4096.0, "n_items", "pack_bytes")
    },

    // Media dedup on the DOWNSAMPLED payload — the perceptual-hash shape:
    // two assets that resize to identical bytes are the same content at
    // different fidelity; keep the highest-resolution copy (longest
    // payload — resize is monotone in length, so the resized length IS
    // the quality rank; tie → lowest doc_id). One typed decode pass, one
    // partial-aggregable shuffle on the content hash, nothing pairwise.
    // A real pipeline swaps the byte-picker for pHash/chromaprint at the
    // same seam; the grouping contract is identical.
    QueryDef.sql("m09_media_dedup",
      """WITH r AS (
        |  SELECT doc_id,
        |         array_to_string(list_transform(
        |           range(0, CAST(ceil(octet_length(text::BLOB) / 4.0) AS BIGINT)),
        |           i -> substr(upper(hex(text::BLOB)), CAST(i * 8 + 1 AS BIGINT), 2)), '') AS rh
        |  FROM documents)
        |SELECT phash, keep_id, kept_bytes, n_copies FROM (
        |  SELECT md5(rh) AS phash, doc_id AS keep_id,
        |         CAST(len(rh) / 2 AS BIGINT) AS kept_bytes,
        |         row_number() OVER (PARTITION BY md5(rh)
        |                            ORDER BY len(rh) DESC, doc_id) AS rk,
        |         count(*) OVER (PARTITION BY md5(rh)) AS n_copies
        |  FROM r) WHERE rk = 1""".stripMargin) {
      (s, dir) => {
        implicit val enc: Encoder[MediaRow] = Encoders.product[MediaRow]
        val media = Tables.documents(s, dir)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[MediaRow]
        resizePayloads(media, step = 4).toDF()
          .select(col("doc_id"), md5(upper(hex(col("payload")))).as("phash"),
            length(col("payload")).cast("long").as("r_bytes"))
          .groupBy("phash")
          .agg(min(struct((-col("r_bytes")).as("neg"), col("doc_id"))).as("m"),
            count(lit(1)).as("n_copies"))
          .select(col("phash"), col("m.doc_id").as("keep_id"),
            (-col("m.neg")).as("kept_bytes"), col("n_copies"))
      }
    },

    // Text↔media alignment filtering — the CLIP-score gate of multimodal
    // corpus prep (LAION-style: embed both sides, keep pairs whose
    // cosine clears a threshold). Media side: the m04 feature extractor
    // (16-bin payload histogram through the batch-decode seam where the
    // vision tower runs); text side: the s15 stand-in encoder (16 dims
    // of half-integer token-hash sums — exact in fp, the language tower
    // slot). The score is one id-keyed join (bucketable: m07's layout
    // makes it zero-Exchange) + a codegen'd in-order 16-dim cosine;
    // nothing about the plan changes when real towers replace the
    // deterministic stand-ins at the mapPartitions boundary.
    QueryDef.sql("m10_alignment_filter", {
      val hx = "upper(hex(text::BLOB))"
      val n = "octet_length(text::BLOB)"
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'),
         |                             x -> x <> '') AS t
         |  FROM documents),
         |tv AS (
         |  SELECT doc_id,
         |         list_transform(range(1, 17), i ->
         |           list_sum(list_transform(t, tok ->
         |             strpos('0123456789abcdef', substr(md5(tok), i, 1)) - 8.5))) AS tv
         |  FROM toks WHERE len(t) > 0),
         |mv AS (
         |  SELECT doc_id,
         |         list_transform(range(0, 16), d ->
         |           len(list_filter(range(0, CAST($n AS BIGINT)),
         |             j -> substr($hx, CAST(2*j+1 AS BIGINT), 1)
         |                  = substr('0123456789ABCDEF', CAST(d+1 AS BIGINT), 1)))
         |           / greatest($n, 1)) AS mv
         |  FROM documents WHERE $n > 0),
         |sc AS (
         |  SELECT t.doc_id,
         |         list_sum(list_transform(range(1, 17), i -> tv[i] * mv[i])) AS dt,
         |         list_sum(list_transform(range(1, 17), i -> tv[i] * tv[i])) AS tn,
         |         list_sum(list_transform(range(1, 17), i -> mv[i] * mv[i])) AS mn
         |  FROM tv t JOIN mv m ON t.doc_id = m.doc_id)
         |SELECT doc_id, round(dt / (sqrt(tn) * sqrt(mn)), 6) AS align,
         |       round(dt / (sqrt(tn) * sqrt(mn)), 6) >= 0.0 AS kept
         |FROM sc WHERE tn > 0 AND mn > 0""".stripMargin
    }) {
      (s, dir) => {
        implicit val enc: Encoder[MediaRow] = Encoders.product[MediaRow]
        // fanOut: BOTH towers run expensive per-row encoders straight
        // above the scan (guide §2.5 — the single-row-group fixture
        // file serializes them onto one core; a production layout makes
        // this a no-op). Downstream is a keyed join, order-free.
        val docs = Tables.fanOut(Tables.documents(s, dir))
        val media = docs
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[MediaRow]
        def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
          aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
        // Each tower's output is MATERIALIZED before the gate filter:
        // predicate pushdown substitutes column aliases into predicates
        // it pushes below a Project, so filtering on the norm above a
        // live encoder projection re-inlines the whole encoder into the
        // Filter — 3 encoder evaluations per row (measured: it dominated
        // the query). The media side already has that barrier in its
        // mapPartitions; the text side checkpoints its (id, vec, norm)
        // table — which is also the production shape: tower outputs are
        // embedded once and STORED (this corpus's embeddings table is
        // exactly such a materialization), never recomputed per predicate.
        val mv = extractFeatures(media).toDF()
          .select(col("doc_id"), col("features").as("mv"))
          .withColumn("mn", dot(col("mv"), col("mv")))
          .filter(col("mn") > 0)
        val t = graft.functions.Exprs.tokens(col("text"))
        val tv = docs.select(col("doc_id"), t.as("t"))
          .filter(size(col("t")) > 0)
          .select(col("doc_id"), VectorOps.tokenHashEmbedding(col("t")).as("tv"))
          .withColumn("tn", dot(col("tv"), col("tv")))
          .localCheckpoint(true)
          .filter(col("tn") > 0)
        val align = round(dot(col("tv"), col("mv")) /
          (sqrt(col("tn")) * sqrt(col("mn"))), 6)
        tv.join(mv, Seq("doc_id"))
          .select(col("doc_id"), align.as("align"), (align >= 0.0).as("kept"))
      }
    },

    // A REAL codec at the multimodal seam — the proof behind the "swap a
    // codec in at the mapPartitions boundary" claim m03-m10 make with a
    // stub: every doc gets a VALID binary PPM (P6) built by
    // [[encodePpm]] (real header + closed-form RGB body), and
    // [[decodePpm]] is a genuine PPM parser (magic, # comments,
    // header-declared dimensions, post-maxval whitespace, raw body)
    // running in the same typed batch-decode slot. The oracle knows
    // NOTHING about PPM: it recomputes width/height/channel means from
    // the closed-form pixel function alone, so the decode only hashes
    // green if the parser reads the header and body offsets exactly
    // right. Scale shape identical to m03: one typed mapPartitions
    // pass, per-partition decoder init, no shuffle at all before the
    // final projection.
    QueryDef.sql("m11_ppm_decode",
      """WITH dims AS (
        |  SELECT doc_id,
        |         CAST(8 + doc_id % 9 AS BIGINT) AS w,
        |         CAST(6 + doc_id % 5 AS BIGINT) AS h
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, w, h,
        |    CAST(list_sum(list_transform(range(0, w*h), p -> (doc_id*131 + (3*p+0)*7) % 256)) AS DOUBLE) AS sr,
        |    CAST(list_sum(list_transform(range(0, w*h), p -> (doc_id*131 + (3*p+1)*7) % 256)) AS DOUBLE) AS sg,
        |    CAST(list_sum(list_transform(range(0, w*h), p -> (doc_id*131 + (3*p+2)*7) % 256)) AS DOUBLE) AS sb
        |  FROM dims)
        |SELECT doc_id, w AS width, h AS height, CAST(255 AS BIGINT) AS maxval,
        |       round(sr / (w*h), 6) AS mean_r,
        |       round(sg / (w*h), 6) AS mean_g,
        |       round(sb / (w*h), 6) AS mean_b
        |FROM px""".stripMargin) {
      (s, dir) => {
        implicit val le: Encoder[java.lang.Long] = Encoders.LONG
        val ids = Tables.documents(s, dir)
          .select(col("doc_id")).as[java.lang.Long]
        decodePpm(encodePpm(ids)).toDF()
          .select(col("doc_id"), col("width"), col("height"), col("maxval"),
            round(col("mean_r"), 6).as("mean_r"),
            round(col("mean_g"), 6).as("mean_g"),
            round(col("mean_b"), 6).as("mean_b"))
      }
    },

    // The audio sibling of m11: a real RIFF/WAVE chunk walker decoding
    // valid in-engine-built PCM files — fmt parse, junk-chunk skipping
    // WITH the odd-size pad rule, sample stats from the fmt-declared
    // layout. The oracle recomputes everything from the closed-form
    // sample function, so chunk-size or pad-byte mistakes shift every
    // sample and fail the hash. Same typed batch-decode slot, zero
    // shuffles before the final projection.
    QueryDef.sql("m12_wav_decode",
      """WITH dims AS (
        |  SELECT doc_id, CAST(64 + doc_id % 33 AS BIGINT) AS n FROM documents),
        |sm AS (
        |  SELECT doc_id, n,
        |    CAST(list_sum(list_transform(range(0, n),
        |      i -> (doc_id*37 + i*11) % 65536 - 32768)) AS DOUBLE) AS s,
        |    CAST(list_max(list_transform(range(0, n),
        |      i -> abs((doc_id*37 + i*11) % 65536 - 32768))) AS BIGINT) AS peak
        |  FROM dims)
        |SELECT doc_id, n AS n_samples, CAST(8000 AS BIGINT) AS sample_rate,
        |       CAST(1 AS BIGINT) AS channels, CAST(16 AS BIGINT) AS bits,
        |       round(s / n, 6) AS mean_amp, peak AS peak_amp
        |FROM sm""".stripMargin) {
      (s, dir) => {
        implicit val le: Encoder[java.lang.Long] = Encoders.LONG
        val ids = Tables.documents(s, dir)
          .select(col("doc_id")).as[java.lang.Long]
        decodeWav(encodeWav(ids)).toDF()
          .select(col("doc_id"), col("n_samples"), col("sample_rate"),
            col("channels"), col("bits"),
            round(col("mean_amp"), 6).as("mean_amp"), col("peak_amp"))
      }
    },

    // Nearest-neighbor resize through the REAL pixel path: every target
    // pixel of a 4×3 thumbnail gathers its source pixel through the
    // parsed header's row stride (sx = ⌊x·w/4⌋, sy = ⌊y·h/3⌋), so the
    // oracle — which recomputes the SAME 12 gathered bytes from the
    // closed-form pixel function — fails on any stride, interleave, or
    // rounding slip. This is the decode→transform→featurize hop of an
    // image-pretraining pipeline with the transform doing real pixel
    // addressing, not a byte subsample.
    QueryDef.sql("m13_ppm_resize",
      """WITH dims AS (
        |  SELECT doc_id,
        |         CAST(8 + doc_id % 9 AS BIGINT) AS w,
        |         CAST(6 + doc_id % 5 AS BIGINT) AS h
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, w, h,
        |    CAST(list_sum(list_transform(range(0, 12), p ->
        |      (doc_id*131 + (3*((((p//4)*h)//3)*w + (((p%4)*w)//4)) + 0)*7) % 256)) AS DOUBLE) AS sr,
        |    CAST(list_sum(list_transform(range(0, 12), p ->
        |      (doc_id*131 + (3*((((p//4)*h)//3)*w + (((p%4)*w)//4)) + 1)*7) % 256)) AS DOUBLE) AS sg,
        |    CAST(list_sum(list_transform(range(0, 12), p ->
        |      (doc_id*131 + (3*((((p//4)*h)//3)*w + (((p%4)*w)//4)) + 2)*7) % 256)) AS DOUBLE) AS sb
        |  FROM dims)
        |SELECT doc_id, w AS src_w, h AS src_h,
        |       round(sr / 12, 6) AS mean_r,
        |       round(sg / 12, 6) AS mean_g,
        |       round(sb / 12, 6) AS mean_b
        |FROM px""".stripMargin) {
      (s, dir) => {
        implicit val le: Encoder[java.lang.Long] = Encoders.LONG
        val ids = Tables.documents(s, dir)
          .select(col("doc_id")).as[java.lang.Long]
        resizePpm(encodePpm(ids), tw = 4, th = 3).toDF()
          .select(col("doc_id"), col("src_w"), col("src_h"),
            round(col("mean_r"), 6).as("mean_r"),
            round(col("mean_g"), 6).as("mean_g"),
            round(col("mean_b"), 6).as("mean_b"))
      }
    },

    // 2× decimation through the REAL RIFF walker (the audio sibling of
    // m13): every second 16-bit sample of the data chunk, addressed
    // through the parsed chunk extent (the JUNK chunk + pad byte sit in
    // front of it), stats recomputed by the oracle from the closed-form
    // sample function at the even indices only.
    QueryDef.sql("m14_wav_resample",
      """WITH dims AS (
        |  SELECT doc_id, CAST(64 + doc_id % 33 AS BIGINT) AS n FROM documents),
        |sm AS (
        |  SELECT doc_id, (n + 1) // 2 AS n_out,
        |    CAST(list_sum(list_transform(range(0, (n + 1) // 2),
        |      i -> (doc_id*37 + (2*i)*11) % 65536 - 32768)) AS DOUBLE) AS s,
        |    CAST(list_max(list_transform(range(0, (n + 1) // 2),
        |      i -> abs((doc_id*37 + (2*i)*11) % 65536 - 32768))) AS BIGINT) AS peak
        |  FROM dims)
        |SELECT doc_id, CAST(n_out AS BIGINT) AS n_out,
        |       CAST(4000 AS BIGINT) AS rate_out,
        |       round(s / n_out, 6) AS mean_amp, peak AS peak_amp
        |FROM sm""".stripMargin) {
      (s, dir) => {
        implicit val le: Encoder[java.lang.Long] = Encoders.LONG
        val ids = Tables.documents(s, dir)
          .select(col("doc_id")).as[java.lang.Long]
        resampleWav(encodeWav(ids), factor = 2).toDF()
          .select(col("doc_id"), col("n_out"), col("rate_out"),
            round(col("mean_amp"), 6).as("mean_amp"), col("peak_amp"))
      }
    },

    // Energy-based VAD segmentation through the REAL RIFF walker — the
    // speech-corpus curation step (which stretches of audio carry
    // signal worth training on): 16-sample frames, a frame is active
    // iff Σ|amplitude| ≥ 16384·16 (ALL-INTEGER compare — threshold,
    // sums and run counting never touch floating point, so both
    // engines agree by arithmetic, not by rounding contract), segments
    // are maximal active runs counted at their starts. The oracle
    // recomputes frame sums from the closed-form sample function at
    // the exact frame offsets — any frame-addressing slip through the
    // parsed chunk extent shifts every sum and fails the hash.
    QueryDef.sql("m15_vad_segments",
      """WITH dims AS (
        |  SELECT doc_id, CAST(64 + doc_id % 33 AS BIGINT) AS n FROM documents),
        |fr AS (
        |  SELECT doc_id, n // 16 AS nf,
        |    list_transform(range(0, n // 16), f ->
        |      CASE WHEN list_sum(list_transform(range(0, 16),
        |             j -> abs((doc_id*37 + (16*f + j)*11) % 65536 - 32768)))
        |           >= 16384*16 THEN 1 ELSE 0 END) AS af
        |  FROM dims)
        |SELECT doc_id, CAST(nf AS BIGINT) AS n_frames,
        |       CAST(list_sum(af) AS BIGINT) AS n_active,
        |       CAST(list_sum(list_transform(range(0, nf), f ->
        |         CASE WHEN af[f+1] = 1 AND (f = 0 OR af[f] = 0)
        |              THEN 1 ELSE 0 END)) AS BIGINT) AS n_segments,
        |       round(list_sum(af) * 1.0 / nf, 6) AS active_ratio
        |FROM fr""".stripMargin) {
      (s, dir) => {
        implicit val le: Encoder[java.lang.Long] = Encoders.LONG
        val ids = Tables.documents(s, dir)
          .select(col("doc_id")).as[java.lang.Long]
        vadWav(encodeWav(ids), frame = 16, threshold = 16384L).toDF()
          .select(col("doc_id"), col("n_frames"), col("n_active"),
            col("n_segments"), round(col("active_ratio"), 6).as("active_ratio"))
      }
    },

    // Zero-crossing rate through the REAL RIFF walker — m15's sibling
    // feature (voiced/unvoiced discrimination): sign CHANGES between
    // consecutive samples, `v < 0` on both engines so zero is uniformly
    // non-negative and the count is exact integer arithmetic end to
    // end. The oracle recomputes the pairwise sign flips from the
    // closed-form sample function — an off-by-one in sample addressing
    // shifts every pair and fails the hash.
    QueryDef.sql("m16_zero_crossings",
      """WITH dims AS (
        |  SELECT doc_id, CAST(64 + doc_id % 33 AS BIGINT) AS n FROM documents),
        |zc AS (
        |  SELECT doc_id, n,
        |    CAST(list_sum(list_transform(range(1, n), i ->
        |      CASE WHEN ((doc_id*37 + (i-1)*11) % 65536 - 32768 < 0)
        |             <> ((doc_id*37 + i*11) % 65536 - 32768 < 0)
        |           THEN 1 ELSE 0 END)) AS BIGINT) AS n_crossings
        |  FROM dims)
        |SELECT doc_id, n AS n_samples, n_crossings,
        |       round(n_crossings * 1.0 / (n - 1), 6) AS zcr
        |FROM zc""".stripMargin) {
      (s, dir) => {
        implicit val le: Encoder[java.lang.Long] = Encoders.LONG
        val ids = Tables.documents(s, dir)
          .select(col("doc_id")).as[java.lang.Long]
        zcrWav(encodeWav(ids)).toDF()
          .select(col("doc_id"), col("n_samples"), col("n_crossings"),
            round(col("zcr"), 6).as("zcr"))
      }
    }
  )
}
