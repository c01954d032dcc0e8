package graft.queries

import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** Multimodal-column plumbing (training-data brief): media as opaque
  * `binary` columns with typed metadata, decode/feature-extract as a
  * partition-parallel operator.
  *
  * The container has no image/audio codecs, so DECODE IS A DETERMINISTIC
  * STUB (first bytes scaled into [0,1]) — but everything Spark-side is
  * real: binary column, metadata struct, mapPartitions operator with a
  * fixed output schema, per-row feature vectors. A real decoder swaps into
  * `decodeStub` without touching the plan shape. Reference analog: the
  * S3-Vectors / media path in bodo/pandas/physical/write_s3_vectors.h.
  */
object MultimodalQueries extends QueryModule {

  /** Stub "decoder": 4 leading bytes -> [0,1] features; payloads shorter
    * than 4 bytes are zero-padded (mirrored in the oracle) instead of
    * throwing and failing the whole partition. */
  private def decodeStub(bytes: Array[Byte]): Array[Double] =
    (0 until 4).map(i => (if (i < bytes.length) bytes(i) & 0xff else 0) / 255.0).toArray

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

    // Decode via mapPartitions over the binary column: the real operator
    // shape (schema in/out, batch iteration, no driver collect).
    "multimodal_decode" -> ((s, d) => {
      val in = documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("media"))
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("f0", DoubleType), StructField("f1", DoubleType),
        StructField("f2", DoubleType), StructField("f3", DoubleType)))
      in.mapPartitions { rows =>
        rows.map { r =>
          val f = decodeStub(r.getAs[Array[Byte]]("media"))
          Row(r.getLong(0), f(0), f(1), f(2), f(3))
        }
      }(Encoders.row(outSchema))
    }),

    // Resize planning: aspect-preserving fit into a 64x64 box from the
    // metadata struct, plus the resized payload size — the pure-arithmetic
    // half of an image resize (the pixel transform itself would live in
    // the decodeStub slot). Same mapPartitions operator shape as decode:
    // fixed schema in/out, no driver collect, IEEE double scale math the
    // oracle replays exactly.
    "multimodal_resize" -> ((s, d) => {
      val in = documents(s, d)
        .select(col("doc_id"),
          (lit(64) + (col("doc_id") % 16) * 8).cast("int").as("width"),
          (lit(48) + (col("doc_id") % 9) * 8).cast("int").as("height"))
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("out_w", IntegerType), StructField("out_h", IntegerType),
        StructField("out_bytes", LongType)))
      in.mapPartitions { rows =>
        rows.map { r =>
          val w = r.getInt(1); val h = r.getInt(2)
          val scale = math.min(64.0 / w, 64.0 / h)
          val ow = math.max(1, math.floor(w * scale).toInt)
          val oh = math.max(1, math.floor(h * scale).toInt)
          Row(r.getLong(0), ow, oh, ow.toLong * oh * 3)
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

    // coalesce-with-0 mirrors the stub's zero padding of short payloads
    "multimodal_decode" ->
      """SELECT doc_id,
        |  CASE WHEN length(text) >= 1 THEN ascii(substring(text, 1, 1)) ELSE 0 END / 255.0 AS f0,
        |  CASE WHEN length(text) >= 2 THEN ascii(substring(text, 2, 1)) ELSE 0 END / 255.0 AS f1,
        |  CASE WHEN length(text) >= 3 THEN ascii(substring(text, 3, 1)) ELSE 0 END / 255.0 AS f2,
        |  CASE WHEN length(text) >= 4 THEN ascii(substring(text, 4, 1)) ELSE 0 END / 255.0 AS f3
        |FROM documents""".stripMargin,

    // identical IEEE double ops: least(64/w, 64/h), floor, greatest-1 clamp
    "multimodal_resize" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(64 + (doc_id % 16) * 8 AS INTEGER) AS w,
        |    CAST(48 + (doc_id % 9) * 8 AS INTEGER) AS h
        |  FROM documents),
        |r AS (
        |  SELECT doc_id,
        |    CAST(greatest(1, CAST(floor(w * least(64.0 / w, 64.0 / h)) AS INTEGER)) AS INTEGER) AS out_w,
        |    CAST(greatest(1, CAST(floor(h * least(64.0 / w, 64.0 / h)) AS INTEGER)) AS INTEGER) AS out_h
        |  FROM m)
        |SELECT doc_id, out_w, out_h,
        |  CAST(out_w AS BIGINT) * out_h * 3 AS out_bytes
        |FROM r""".stripMargin,

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
