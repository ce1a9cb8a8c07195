package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Multimodal-column plumbing (SURVEY.md §2.3): media as opaque
  * `binary` payloads with typed metadata, decode/feature-extraction as
  * typed partition-wise transforms, and deterministic frame sampling.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake; the Spark-side plumbing (binary
  * schema, batch shape, partition-wise execution, typed Encoders) is
  * real and is what the tests exercise.
  */
object Multimodal {

  /** A decoded media record produced by the (stubbed) decoder. */
  final case class Decoded(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      feature: Array[Double]
  )

  /** STUB: stands in for a real codec (libjpeg/ffmpeg/...). Produces a
    * deterministic fake "decode" from the payload bytes so pipelines
    * and tests are reproducible. Signature and batch shape match what
    * a real partition-wise decoder would use.
    */
  def decodeStub(spark: SparkSession, dir: String): Dataset[Decoded] = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select($"doc_id", $"media_type", $"payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // partition-wise: a real decoder would batch payloads here
        it.map { case (id, kind, bytes) =>
          val n = bytes.length.toLong
          val w = 64 + (bytes.headOption.map(_.toInt & 0x7f).getOrElse(0) % 64)
          val h = 64 + (bytes.lastOption.map(_.toInt & 0x7f).getOrElse(0) % 64)
          val feat = Array.tabulate(4) { i =>
            bytes.iterator.zipWithIndex
              .filter(_._2 % 4 == i)
              .map(_._1.toInt & 0xff)
              .sum
              .toDouble / math.max(n, 1L)
          }
          Decoded(id, kind, n, w, h, feat)
        }
      }
  }

  /** Documents re-cast as a media table: opaque binary payload +
    * media_type discriminator (the multimodal column pattern).
    */
  private def mediaTable(spark: SparkSession, dir: String) = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(
        $"doc_id",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          ($"doc_id" % 3 + 1).cast("int")).as("media_type"),
        $"text".cast("binary").as("payload")
      )
  }

  val all: Seq[Q] = Seq(
    Q(
      "m01_multimodal_meta",
      "Binary payload + typed metadata extraction (columnar, no decode)",
      (spark, dir) => {
        import spark.implicits._
        mediaTable(spark, dir)
          .select(
            $"doc_id",
            $"media_type",
            length($"payload").cast("long").as("n_bytes"),
            (lit(64) + expr("ascii(substr(CAST(payload AS STRING), 1, 1))") % 64)
              .cast("int").as("width"),
            (lit(64) + expr("ascii(right(CAST(payload AS STRING), 1))") % 64)
              .cast("int").as("height")
          )
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
        ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        CAST(64 + ascii(substr(text, 1, 1)) % 64 AS INT) AS width,
        CAST(64 + ascii(right(text, 1)) % 64 AS INT) AS height
        FROM documents ORDER BY doc_id""")
    ),

    Q(
      "m02_frame_sample",
      "Deterministic frame sampling for video payloads (every 10th of n_bytes/50 frames)",
      (spark, dir) => {
        import spark.implicits._
        mediaTable(spark, dir)
          .filter($"media_type" === "video")
          .withColumn("n_frames", (length($"payload").cast("long") / 50).cast("long"))
          .filter($"n_frames" > 0)
          .select(
            $"doc_id",
            explode(expr("sequence(CAST(0 AS BIGINT), n_frames - 1, 10)")).as("frame_idx")
          )
          .withColumn("frame_key", md5(concat($"doc_id", lit(":"), $"frame_idx")))
          .orderBy($"doc_id", $"frame_idx")
      },
      Some("""WITH v AS (
          SELECT doc_id, octet_length(encode(text)) // 50 AS n_frames
          FROM documents WHERE doc_id % 3 = 2 AND octet_length(encode(text)) // 50 > 0)
        SELECT doc_id,
          unnest(generate_series(CAST(0 AS BIGINT), n_frames - 1, 10)) AS frame_idx,
          md5(doc_id || ':' || unnest(generate_series(CAST(0 AS BIGINT), n_frames - 1, 10))) AS frame_key
        FROM v ORDER BY doc_id, frame_idx""")
    )
  )
}
