package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed by per-partition batch operators.
  *
  * The media codecs are NOT in this container, so the decode kernel is a
  * clearly-marked DETERMINISTIC STUB (arithmetic on the payload bytes). What
  * is real — and tested — is the Spark-side plumbing a 100 TB media pipeline
  * needs: binary column + metadata struct schema, mapPartitions batching
  * (connection/model-handle amortized per partition, the Scala analogue of a
  * Pandas-UDF `mapInPandas` batch), and partition-count control so one
  * executor core handles one shard of media blobs.
  */
object Multimodal {

  case class MediaIn(id: Long, kind: String, payload: Array[Byte])
  case class MediaFeat(id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, checksum: Long, feat: Array[Double])

  /** Derive a deterministic binary "media" table from documents (payload =
    * UTF-8 bytes of the text; kind cycles by doc_id). */
  def mediaTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "documents").select(
      $"doc_id".as("id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        ($"doc_id" % 3 + 1).cast("int")).as("kind"),
      encode($"text", "UTF-8").as("payload"))
  }

  /** STUB decode kernel — stands in for an image/audio decoder. Deterministic
    * arithmetic over the payload so tests and the SQL oracle can reproduce
    * it. A real deployment swaps ONLY this function body for e.g. a JNI
    * decoder; the mapPartitions plumbing around it is production-shaped. */
  def decodeStub(m: MediaIn): MediaFeat = {
    val n = m.payload.length
    // ??? real codec goes here — fake dims/checksum derived from bytes:
    val width = 64 + n % 512
    val height = 64 + (n * 7) % 512
    var sum = 0L
    var i = 0
    while (i < n) { sum += (m.payload(i) & 0xff).toLong * (i % 31 + 1); i += 1 }
    val feat = Array.tabulate(8)(j => ((sum >> j) % 256).toDouble / 256.0)
    MediaFeat(m.id, m.kind, n, width, height, sum, feat)
  }

  /** Feature extraction over media blobs: one decoder instantiation per
    * partition, rows streamed through it (never materialized per-partition).
    */
  def extractFeatures(s: SparkSession, media: DataFrame, partitions: Int): DataFrame = {
    import s.implicits._
    media.select($"id", $"kind", $"payload").as[MediaIn]
      .repartition(partitions, $"id")
      .mapPartitions { it =>
        // per-partition init (decoder/model handle) happens here — once
        it.map(decodeStub)
      }
      .toDF()
  }

  /** Oracle-checked query: stub features from the derived media table. The
    * checksum/dims arithmetic is reproduced in SQL over the same bytes. */
  val qMultimodalFeatures: Q = Q(
    "q_multimodal_features",
    (s, dir) => {
      import s.implicits._
      extractFeatures(s, mediaTable(s, dir), partitions = 8)
        .select($"id", $"kind", $"n_bytes", $"width", $"height", $"checksum")
        .orderBy($"id")
    },
    Some("""WITH m AS (
           |  SELECT doc_id AS id,
           |         ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
           |         text, length(text) AS n
           |  FROM documents)
           |SELECT id, kind, CAST(n AS INTEGER) AS n_bytes,
           |       CAST(64 + n % 512 AS INTEGER) AS width,
           |       CAST(64 + (n * 7) % 512 AS INTEGER) AS height,
           |       CAST(list_sum(list_transform(range(1, n + 1),
           |         i -> ascii(substr(text, CAST(i AS INTEGER), 1)) * ((i - 1) % 31 + 1)))
           |         AS BIGINT) AS checksum
           |FROM m ORDER BY id""".stripMargin))

  val all: Seq[Q] = Seq(qMultimodalFeatures)
}
