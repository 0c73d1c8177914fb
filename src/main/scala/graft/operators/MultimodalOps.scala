package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video-as-binary) pipeline operators.
  *
  * Media are opaque `binary` columns with typed metadata — the pattern a
  * 100 TB training-data pipeline needs (media bytes never leave the
  * executor; metadata is columnar and prunable). The actual codec DECODE
  * step is STUBBED with a deterministic fake (no image/audio libraries in
  * this container — clearly marked below); everything Spark-side is real:
  * binary schema, header parsing on the binary column, frame slicing,
  * batch-shaped partition processing, and the metadata projections.
  *
  * Synthetic media are minted deterministically from the `embeddings`
  * table: an ASCII-safe container format so the DuckDB oracle can mirror
  * construction and parsing byte-for-byte on VARCHAR while Spark carries
  * true BinaryType end-to-end:
  *
  *   "IMG1" + w(4 digits) + h(4 digits) + nframes(2) + frames…
  *   frame i = md5(vec_id + ":" + i)  (32 ASCII chars each)
  */
object MultimodalOps {
  import Tables.t

  /** embeddings → (vec_id, media: binary, media_type) — the media table. */
  def mediaTable(df: DataFrame): DataFrame = {
    val w = format_string("%04d", lit(16) * (pmod(col("vec_id"), lit(32)) + 1))
    val h = format_string("%04d", lit(9) * (pmod(col("vec_id"), lit(18)) + 1))
    val nf = pmod(col("vec_id"), lit(7)) + 4
    val frames = array_join(
      transform(sequence(lit(0), nf - 1),
        i => md5(concat(col("vec_id").cast("string"), lit(":"), i.cast("string")))),
      "")
    df.select(
      col("vec_id"),
      encode(concat(lit("IMG1"), w, h, format_string("%02d", nf), frames),
        "utf-8").as("media"),
      when(pmod(col("vec_id"), lit(3)) === 0, "image")
        .when(pmod(col("vec_id"), lit(3)) === 1, "audio")
        .otherwise("video").as("media_type"),
    )
  }

  /** SQL twin of the container format (VARCHAR side). */
  private val sqlMedia =
    """SELECT vec_id,
         'IMG1' || lpad(CAST(16 * (vec_id % 32 + 1) AS VARCHAR), 4, '0')
                || lpad(CAST(9  * (vec_id % 18 + 1) AS VARCHAR), 4, '0')
                || lpad(CAST(vec_id % 7 + 4 AS VARCHAR), 2, '0')
                || list_aggregate(list_transform(range(0, CAST(vec_id % 7 + 4 AS BIGINT)),
                     i -> md5(CAST(vec_id AS VARCHAR) || ':' || CAST(i AS VARCHAR))),
                     'string_agg', '') AS m,
         CASE vec_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                         ELSE 'video' END AS media_type
       FROM embeddings"""

  /** DECODE STUB — deterministic fake standing in for a codec call. A real
    * deployment swaps this body for an image/audio library invoked per
    * partition batch; the signature, batching and schema stay identical.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    (s.substring(4, 8).toInt, s.substring(8, 12).toInt,
      s.substring(12, 14).toInt)
  }

  def entries: Seq[QueryEntry] = Seq(
    // ---- header metadata parsed from the binary column --------------------
    QueryEntry(
      "q_media_meta",
      (s, dir) => {
        mediaTable(t(s, dir, "embeddings"))
          .select(
            col("vec_id"), col("media_type"),
            decode(substring(col("media"), 5, 4), "utf-8").cast("int").as("width"),
            decode(substring(col("media"), 9, 4), "utf-8").cast("int").as("height"),
            decode(substring(col("media"), 13, 2), "utf-8").cast("int").as("n_frames"),
            length(col("media")).as("n_bytes"))
          .orderBy("vec_id")
      },
      Some(s"""SELECT vec_id, media_type,
          CAST(substr(m, 5, 4) AS INT) AS width,
          CAST(substr(m, 9, 4) AS INT) AS height,
          CAST(substr(m, 13, 2) AS INT) AS n_frames,
          CAST(length(m) AS INT) AS n_bytes
        FROM ($sqlMedia) ORDER BY vec_id"""),
    ),
    // ---- video frame sampling: every 2nd frame, fingerprinted -------------
    QueryEntry(
      "q_media_frame_sample",
      (s, dir) => {
        val m = mediaTable(t(s, dir, "embeddings"))
          .filter(col("media_type") === "video")
        val nf = decode(substring(col("media"), 13, 2), "utf-8").cast("int")
        m.select(col("vec_id"), col("media"),
            explode(sequence(lit(0), nf - 1, lit(2))).as("frame_idx"))
          .select(col("vec_id"), col("frame_idx"),
            md5(substring(col("media"), lit(15) + col("frame_idx") * 32, lit(32)))
              .as("frame_sig"))
          .orderBy("vec_id", "frame_idx")
      },
      Some(s"""SELECT vec_id, CAST(frame_idx AS INT) AS frame_idx,
          md5(substr(m, CAST(15 + frame_idx * 32 AS INT), 32)) AS frame_sig
        FROM ($sqlMedia), range(0, 10, 2) r(frame_idx)
        WHERE media_type = 'video' AND frame_idx < CAST(substr(m, 13, 2) AS INT)
        ORDER BY vec_id, frame_idx"""),
    ),
    // ---- batch decode via mapPartitions (the mapInPandas shape) -----------
    // The partition iterator is the batch; decodeStub is the codec seam.
    // Oracle: the header fields the stub extracts are mirrorable in SQL.
    QueryEntry(
      "q_media_decode_batch",
      (s, dir) => {
        import s.implicits._
        mediaTable(t(s, dir, "embeddings"))
          .select(col("vec_id"), col("media"))
          .as[(Long, Array[Byte])]
          .mapPartitions { batch =>
            batch.map { case (id, bytes) =>
              val (w, h, nf) = decodeStub(bytes)
              (id, w.toLong * h, nf, bytes.length)
            }
          }
          .toDF("vec_id", "n_pixels", "n_frames", "n_bytes")
          .orderBy("vec_id")
      },
      Some(s"""SELECT vec_id,
          CAST(substr(m, 5, 4) AS BIGINT) * CAST(substr(m, 9, 4) AS BIGINT) AS n_pixels,
          CAST(substr(m, 13, 2) AS INT) AS n_frames,
          CAST(length(m) AS INT) AS n_bytes
        FROM ($sqlMedia) ORDER BY vec_id"""),
    ),
  )
}
