package graft.queries

import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** Multimodal-column plumbing (training-data brief): media as opaque
  * `binary` columns with typed metadata, decode/feature-extract as a
  * partition-parallel operator.
  *
  * Since r14 decode and resize are REAL: `javax.imageio` PNG/JPEG decode
  * (ships with the JVM — no external codec, works offline) plus a
  * deterministic nearest-neighbor resize ([[graft.multimodal.ImageCodec]]),
  * oracle-gated on pinned pixel digests of the checked-in fixture images.
  * The Spark side is the production shape: broadcast-joined binary
  * column, mapPartitions with a fixed output schema, no driver collect.
  * Reference analog: the S3-Vectors / media path in
  * bodo/pandas/physical/write_s3_vectors.h.
  */
object MultimodalQueries extends QueryModule {

  /** Pinned decode/resize facts of the checked-in fixture images
    * (img_id, width, height, pixel_md5, mean_r, mean_g, mean_b,
    * out_w, out_h, resized_md5). Produced by graft.tools.GenImg from
    * the formula-generated PNGs; ImageCodecSpec re-derives them from
    * an INDEPENDENT formula + naive resize, so a platform decode drift
    * fails the spec before it can fail the oracle. */
  private[graft] val pins: Seq[(Int, Int, Int, String, Double, Double, Double, Int, Int, String)] = Seq(
    (0, 16, 12, "982bdbe8ac78d10bfac4f4ae75c13076", 69.0, 86.5, 121.0, 64, 48, "a66472f4879db73468d29a632acb1df2"),
    (1, 21, 15, "0a588da68d294691878d8c2886edcdda", 102.0, 116.0, 132.74285714285713, 64, 45, "166f7f67ae3b80f660deb3bbd5388bc3"),
    (2, 26, 18, "77f6cc4a630a287157f1564bb41aa034", 135.0, 134.55982905982907, 122.04273504273505, 64, 44, "6abc65ad34e114c3a5ce3b9da30e3822"),
    (3, 31, 21, "7628e42704f173f63938467463331a25", 142.43932411674348, 122.6989247311828, 124.45468509984639, 64, 43, "3f6b3118da0a84669b1ab4ec4d1d1ebd"),
    (4, 36, 24, "fc4c488a41cdd852e9a7e1242efe2493", 128.40740740740742, 118.27777777777777, 132.11111111111111, 64, 42, "40e8239580a53ca2a654b9167b5aa4fb"),
    (5, 41, 27, "c5bc5e98c2e078b88a4fa2c6f9003902", 125.07859078590786, 121.60975609756098, 130.82023486901537, 64, 42, "79af5e308629d9183706cedd1719382b"),
    (6, 46, 30, "68db491387e92cba346f921aae7334fb", 129.91014492753624, 130.3057971014493, 127.69565217391305, 64, 41, "eabae48b66654e1e36768cf54d8ba590"),
    (7, 51, 33, "a615f2f507ab9700aba136205976ab41", 139.22043969102793, 136.17528223410577, 128.4230540701129, 64, 41, "2a9bd44b31a04271ef3d778c375d8fb7"))

  /** Pinned decode/decimate facts of the checked-in WAV fixtures
    * (clip_id, sample_rate, channels, n_samples, pcm_md5, rms, peak,
    * zero_cross, ds_samples, ds_md5). Produced by graft.tools.GenAudio;
    * AudioCodecSpec re-derives every value from the integer generating
    * formulas (no trig — bit-identical on every platform). */
  private[graft] val audioPins: Seq[(Int, Int, Int, Long, String, Double, Int, Long, Long, String)] = Seq(
    (0, 8000, 1, 400L, "879fc303d8159c8f8e345163dd14a5ac", 12000.0, 12000, 15L, 100L, "358ad37d585fc1f97b9b706e7807c02a"),
    (1, 8000, 1, 480L, "e8facac719cb1bce940efd54cc726324", 11486.804023167919, 19600, 19L, 120L, "4ec04bbbfae599701a61c4863bac296c"),
    (2, 8000, 1, 560L, "e0a5e41202657efb25e607ab43b103a9", 9243.376006633074, 16000, 14L, 140L, "71551d23f891f8357b1a14bc96a540a9"),
    (3, 8000, 2, 1280L, "39181d2ab8c702e9fb94587de336f628", 9295.409474910182, 15989, 628L, 320L, "64fa9c6c258592068a9eceb3fe5c7b43"))

  /** Pinned per-sampled-frame decode facts of the checked-in MJPEG-style
    * clips (clip_id, frame_id, width, height, frame_md5, mean_r).
    * Produced by graft.tools.GenVideo; frames share the image formulas,
    * so ImageCodecSpec's formula canary covers their ground truth too. */
  private[graft] val videoPins: Seq[(Int, Int, Int, Int, String, Double)] = Seq(
    (0, 0, 16, 12, "982bdbe8ac78d10bfac4f4ae75c13076", 69.0),
    (0, 3, 31, 21, "7628e42704f173f63938467463331a25", 142.43932411674348),
    (0, 6, 46, 30, "68db491387e92cba346f921aae7334fb", 129.91014492753624),
    (0, 9, 21, 15, "0a588da68d294691878d8c2886edcdda", 102.0),
    (1, 0, 31, 21, "7628e42704f173f63938467463331a25", 142.43932411674348),
    (1, 3, 46, 30, "68db491387e92cba346f921aae7334fb", 129.91014492753624),
    (1, 6, 21, 15, "0a588da68d294691878d8c2886edcdda", 102.0),
    (1, 9, 36, 24, "fc4c488a41cdd852e9a7e1242efe2493", 128.40740740740742))

  override def queries: Map[String, QueryFn] = Map(
    // Binary payload + typed metadata struct; pure column ops.
    "multimodal_meta" -> ((s, d) => {
      documents(s, d)
        .select(col("doc_id"),
          col("text").cast("binary").as("media"),
          struct(
            (lit(64) + (col("doc_id") % 16) * 8).cast("int").as("width"),
            (lit(48) + (col("doc_id") % 9) * 8).cast("int").as("height"),
            lit(3).as("channels")).as("meta"))
        .select(col("doc_id"),
          length(col("media")).cast("long").as("media_bytes"),
          col("meta.width").as("width"),
          col("meta.height").as("height"),
          col("meta.channels").as("channels"))
    }),

    // REAL image decode (r14): each document carries the checked-in PNG
    // img(doc_id % 8) as a broadcast-joined binary column; mapPartitions
    // decodes via javax.imageio per row and emits dimensions + the md5
    // of the row-major RGB buffer + exact per-channel means. The oracle
    // joins the PINNED per-image facts — decode must be bit-exact.
    "multimodal_decode" -> ((s, d) => {
      import graft.multimodal.{ImageCodec, ImageFixtures}
      val imgs = s.createDataFrame(
        (0 until ImageFixtures.N).map(i => (i, ImageFixtures.pngBytes(i))))
        .toDF("img_id", "media")
      val in = documents(s, d)
        .select(col("doc_id"), (col("doc_id") % ImageFixtures.N).cast("int").as("img_id"))
        .join(broadcast(imgs), "img_id")
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("width", IntegerType), StructField("height", IntegerType),
        StructField("pixel_md5", StringType),
        StructField("mean_r", DoubleType), StructField("mean_g", DoubleType),
        StructField("mean_b", DoubleType)))
      in.mapPartitions { rows =>
        rows.map { r =>
          val dec = ImageCodec.decodeCached(r.getAs[Array[Byte]]("media"))
          val (mr, mg, mb) = ImageCodec.channelMeans(dec)
          Row(r.getAs[Long]("doc_id"), dec.width, dec.height,
            ImageCodec.md5Hex(dec.rgb), mr, mg, mb)
        }
      }(Encoders.row(outSchema))
    }),

    // REAL resize (r14): decode + deterministic nearest-neighbor fit
    // into a 64x64 box (our own arithmetic — Graphics2D scaling is
    // platform-dependent; pinned digests need bit-exact pixels). Output
    // is the fitted dims, resized-buffer md5, and payload size.
    "multimodal_resize" -> ((s, d) => {
      import graft.multimodal.{ImageCodec, ImageFixtures}
      val imgs = s.createDataFrame(
        (0 until ImageFixtures.N).map(i => (i, ImageFixtures.pngBytes(i))))
        .toDF("img_id", "media")
      val in = documents(s, d)
        .select(col("doc_id"), (col("doc_id") % ImageFixtures.N).cast("int").as("img_id"))
        .join(broadcast(imgs), "img_id")
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("out_w", IntegerType), StructField("out_h", IntegerType),
        StructField("resized_md5", StringType),
        StructField("out_bytes", LongType)))
      in.mapPartitions { rows =>
        rows.map { r =>
          val dec = ImageCodec.decodeCached(r.getAs[Array[Byte]]("media"))
          val (ow, oh) = ImageCodec.fitBox(dec.width, dec.height, 64)
          val rs = ImageCodec.resizeNearest(dec, ow, oh)
          Row(r.getAs[Long]("doc_id"), ow, oh,
            ImageCodec.md5Hex(rs.rgb), ow.toLong * oh * 3)
        }
      }(Encoders.row(outSchema))
    }),

    // REAL audio decode (r14): each document carries the checked-in WAV
    // clip(doc_id % 4) as a broadcast-joined binary column; mapPartitions
    // decodes 16-bit PCM via javax.sound.sampled per row and emits the
    // format, sample digest, and exact integer feature kernels (RMS,
    // peak, zero crossings). Oracle joins the PINNED per-clip facts.
    "multimodal_audio_decode" -> ((s, d) => {
      import graft.multimodal.{AudioCodec, AudioFixtures}
      val clips = s.createDataFrame(
        (0 until AudioFixtures.N).map(i => (i, AudioFixtures.wavBytes(i))))
        .toDF("clip_id", "media")
      val in = documents(s, d)
        .select(col("doc_id"), (col("doc_id") % AudioFixtures.N).cast("int").as("clip_id"))
        .join(broadcast(clips), "clip_id")
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("sample_rate", IntegerType),
        StructField("channels", IntegerType),
        StructField("n_samples", LongType),
        StructField("pcm_md5", StringType),
        StructField("rms", DoubleType),
        StructField("peak", IntegerType),
        StructField("zero_cross", LongType)))
      in.mapPartitions { rows =>
        rows.map { r =>
          val dec = AudioCodec.decodeWavCached(r.getAs[Array[Byte]]("media"))
          Row(r.getAs[Long]("doc_id"), dec.sampleRate, dec.channels,
            dec.samples.length.toLong, AudioCodec.pcmMd5(dec),
            AudioCodec.rms(dec), AudioCodec.peak(dec),
            AudioCodec.zeroCrossings(dec))
        }
      }(Encoders.row(outSchema))
    }),

    // Deterministic decimation (keep every 4th frame, all channels) —
    // the audio analog of frame sampling, digest-pinned like resize.
    "multimodal_audio_downsample" -> ((s, d) => {
      import graft.multimodal.{AudioCodec, AudioFixtures}
      val clips = s.createDataFrame(
        (0 until AudioFixtures.N).map(i => (i, AudioFixtures.wavBytes(i))))
        .toDF("clip_id", "media")
      val in = documents(s, d)
        .select(col("doc_id"), (col("doc_id") % AudioFixtures.N).cast("int").as("clip_id"))
        .join(broadcast(clips), "clip_id")
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("ds_samples", LongType),
        StructField("ds_md5", StringType),
        StructField("ds_rate", IntegerType)))
      in.mapPartitions { rows =>
        rows.map { r =>
          val dec = AudioCodec.decodeWavCached(r.getAs[Array[Byte]]("media"))
          val ds = AudioCodec.decimate(dec, 4)
          Row(r.getAs[Long]("doc_id"), ds.samples.length.toLong,
            AudioCodec.pcmMd5(ds), ds.sampleRate)
        }
      }(Encoders.row(outSchema))
    }),

    // REAL video frame sampling (r14): each document carries an
    // MJPEG-style clip (length-prefixed independently-decodable frames,
    // the only honest video form with JVM-builtin codecs — and a real
    // one, MJPEG is what capture pipelines emit). The container walk
    // picks every 3rd frame WITHOUT decoding the skipped ones, then
    // each sampled frame decodes through the real image codec.
    "multimodal_video_frames" -> ((s, d) => {
      import graft.multimodal.{ImageCodec, ImageFixtures, VideoContainer}
      val clips = s.createDataFrame(
        (0 until ImageFixtures.VideoN).map(v => (v, ImageFixtures.videoBytes(v))))
        .toDF("clip_id", "media")
      val in = documents(s, d)
        .select(col("doc_id"),
          (col("doc_id") % ImageFixtures.VideoN).cast("int").as("clip_id"))
        .join(broadcast(clips), "clip_id")
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("frame_id", IntegerType),
        StructField("width", IntegerType), StructField("height", IntegerType),
        StructField("frame_md5", StringType),
        StructField("mean_r", DoubleType)))
      in.mapPartitions { rows =>
        rows.flatMap { r =>
          val media = r.getAs[Array[Byte]]("media")
          val docId = r.getAs[Long]("doc_id")
          val n = VideoContainer.frameCount(media)
          (0 until n by 3).iterator.map { f =>
            val dec = ImageCodec.decodeCached(VideoContainer.frame(media, f))
            val (mr, _, _) = ImageCodec.channelMeans(dec)
            Row(docId, f, dec.width, dec.height,
              ImageCodec.md5Hex(dec.rgb), mr)
          }
        }
      }(Encoders.row(outSchema))
    }),

    // Frame sampling: the binary payload read as a "video" of 16-byte
    // frames, keeping every 4th frame — posexplode of the sampled frame
    // offsets (pure codegen'd lateral, no UDF) plus a per-frame slice of
    // the binary column. The fixture text is ASCII so the frame's first
    // byte round-trips through a string cast byte-faithfully.
    "multimodal_frame_sample" -> ((s, d) => {
      documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("media"))
        .withColumn("n_frames",
          ((length(col("media")) + 15) / lit(16)).cast("int"))
        .withColumn("frame_id",
          explode(sequence(lit(0), col("n_frames") - 1, lit(4))))
        .select(col("doc_id"), col("frame_id").cast("long").as("frame_id"),
          length(expr("substring(media, frame_id * 16 + 1, 16)")).cast("long")
            .as("frame_len"),
          (ascii(expr("cast(substring(media, frame_id * 16 + 1, 1) AS string)")) / 255.0)
            .as("f0"))
    })
  )


  override def oracle: Map[String, String] = Map(
    // ASCII fixture text: byte length == n_chars, byte k == ascii(char k).
    "multimodal_meta" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS media_bytes,
        |  CAST(64 + (doc_id % 16) * 8 AS INTEGER) AS width,
        |  CAST(48 + (doc_id % 9) * 8 AS INTEGER) AS height,
        |  3 AS channels
        |FROM documents""".stripMargin,

    // pinned per-image decode facts (see `pins`): the engine must
    // reproduce exact dimensions, RGB md5, and channel means
    "multimodal_decode" -> {
      val rows = pins.map { case (i, w, h, md5p, mr, mg, mb, _, _, _) =>
        s"($i, $w, $h, '$md5p', $mr, $mg, $mb)" }.mkString(",\n    ")
      s"""WITH pins(img_id, width, height, pixel_md5, mean_r, mean_g, mean_b) AS (
         |  VALUES $rows)
         |SELECT d.doc_id, p.width, p.height, p.pixel_md5,
         |       p.mean_r, p.mean_g, p.mean_b
         |FROM documents d JOIN pins p ON p.img_id = d.doc_id % 8""".stripMargin
    },

    // pinned resize facts: fitted dims + resized-buffer md5 + size
    "multimodal_resize" -> {
      val rows = pins.map { case (i, _, _, _, _, _, _, ow, oh, md5r) =>
        s"($i, $ow, $oh, '$md5r', ${ow.toLong * oh * 3})" }.mkString(",\n    ")
      s"""WITH pins(img_id, out_w, out_h, resized_md5, out_bytes) AS (
         |  VALUES $rows)
         |SELECT d.doc_id, p.out_w, p.out_h, p.resized_md5,
         |       CAST(p.out_bytes AS BIGINT) AS out_bytes
         |FROM documents d JOIN pins p ON p.img_id = d.doc_id % 8""".stripMargin
    },

    "multimodal_audio_decode" -> {
      val rows = audioPins.map { case (i, sr, ch, n, md5p, rms, pk, zc, _, _) =>
        s"($i, $sr, $ch, $n, '$md5p', $rms, $pk, $zc)" }.mkString(",\n    ")
      s"""WITH pins(clip_id, sample_rate, channels, n_samples, pcm_md5, rms, peak, zero_cross) AS (
         |  VALUES $rows)
         |SELECT d.doc_id, p.sample_rate, p.channels,
         |       CAST(p.n_samples AS BIGINT) AS n_samples, p.pcm_md5, p.rms,
         |       p.peak, CAST(p.zero_cross AS BIGINT) AS zero_cross
         |FROM documents d JOIN pins p ON p.clip_id = d.doc_id % 4""".stripMargin
    },

    "multimodal_audio_downsample" -> {
      val rows = audioPins.map { case (i, sr, _, _, _, _, _, _, dn, dmd5) =>
        s"($i, $dn, '$dmd5', ${sr / 4})" }.mkString(",\n    ")
      s"""WITH pins(clip_id, ds_samples, ds_md5, ds_rate) AS (
         |  VALUES $rows)
         |SELECT d.doc_id, CAST(p.ds_samples AS BIGINT) AS ds_samples,
         |       p.ds_md5, p.ds_rate
         |FROM documents d JOIN pins p ON p.clip_id = d.doc_id % 4""".stripMargin
    },

    "multimodal_video_frames" -> {
      val rows = videoPins.map { case (v, f, w, h, md5f, mr) =>
        s"($v, $f, $w, $h, '$md5f', $mr)" }.mkString(",\n    ")
      s"""WITH pins(clip_id, frame_id, width, height, frame_md5, mean_r) AS (
         |  VALUES $rows)
         |SELECT d.doc_id, p.frame_id, p.width, p.height, p.frame_md5, p.mean_r
         |FROM documents d JOIN pins p ON p.clip_id = d.doc_id % 2""".stripMargin
    },

    "multimodal_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id, text,
        |    unnest(range(0, (length(text) + 15) // 16, 4)) AS frame_id
        |  FROM documents)
        |SELECT doc_id, CAST(frame_id AS BIGINT) AS frame_id,
        |  CAST(length(substring(text, CAST(frame_id * 16 + 1 AS INTEGER), 16)) AS BIGINT) AS frame_len,
        |  ascii(substring(text, CAST(frame_id * 16 + 1 AS INTEGER), 1)) / 255.0 AS f0
        |FROM f""".stripMargin
  )
}
