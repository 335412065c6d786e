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
      // ASCII-sanitize BEFORE encoding: the deterministic fake payload's
      // oracle reads per-CHARACTER (ascii(substr(text, …))) while the
      // engine reads per-BYTE — identical only when every char is one
      // byte, so pin that by construction instead of trusting the fixture
      // generator to stay ASCII (round-7-style drift insurance). A non-ASCII
      // RUN collapses to one '?' — run-collapsing makes the guard identical
      // whether a regex engine iterates code units or codepoints (a
      // supplementary-plane char is 2 UTF-16 units but 1 codepoint; '+'
      // erases the difference on both engines).
      encode(regexp_replace($"text", "[^\\x00-\\x7F]+", "?"), "UTF-8")
        .as("payload"))
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
           |         regexp_replace(text, '[^\x00-\x7F]+', '?', 'g') AS text,
           |         length(regexp_replace(text, '[^\x00-\x7F]+', '?', 'g')) AS n
           |  FROM documents)
           |SELECT id, kind, CAST(n AS INTEGER) AS n_bytes,
           |       CAST(64 + n % 512 AS INTEGER) AS width,
           |       CAST(64 + (n * 7) % 512 AS INTEGER) AS height,
           |       CAST(coalesce(list_sum(list_transform(range(1, n + 1),
           |         i -> ascii(substr(text, CAST(i AS INTEGER), 1)) * ((i - 1) % 31 + 1))), 0)
           |         AS BIGINT) AS checksum
           |FROM m ORDER BY id""".stripMargin))

  case class Resized(id: Long, kind: String, orig_bytes: Int, stride: Int,
      resized_bytes: Int, resized_checksum: Long)

  /** STUB resize kernel: strided byte subsampling standing in for a
    * resample-to-target resize (a real deployment swaps the body for a
    * codec call; the stride arithmetic and batching are the real part).
    * Deterministic, SQL-reproducible. */
  def resizeStub(m: MediaIn, targetBytes: Int): Resized = {
    val n = m.payload.length
    val stride = math.max(1, n / targetBytes)
    var j = 0; var i = 0; var sum = 0L
    while (i < n) {
      sum += (m.payload(i) & 0xff).toLong * (j % 31 + 1)
      j += 1; i += stride
    }
    Resized(m.id, m.kind, n, stride, j, sum)
  }

  /** Resize pass over media blobs — same mapPartitions batch shape as
    * [[extractFeatures]] (decoder handle amortized per partition). */
  def resizeAll(s: SparkSession, media: DataFrame, targetBytes: Int,
      partitions: Int): DataFrame = {
    import s.implicits._
    media.select($"id", $"kind", $"payload").as[MediaIn]
      .repartition(partitions, $"id")
      .mapPartitions(it => it.map(resizeStub(_, targetBytes)))
      .toDF()
  }

  /** q_media_resize: strided-resize metadata + checksum per blob, exactly
    * reproduced by the oracle over the same bytes. */
  val qMediaResize: Q = Q(
    "q_media_resize",
    (s, dir) => {
      import s.implicits._
      resizeAll(s, mediaTable(s, dir), targetBytes = 256, partitions = 8)
        .orderBy($"id")
    },
    Some("""WITH m AS (
           |  SELECT doc_id AS id,
           |         ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
           |         regexp_replace(text, '[^\x00-\x7F]+', '?', 'g') AS text,
           |         length(regexp_replace(text, '[^\x00-\x7F]+', '?', 'g')) AS n,
           |         greatest(1, length(regexp_replace(text, '[^\x00-\x7F]+', '?', 'g')) // 256) AS stride
           |  FROM documents)
           |SELECT id, kind, CAST(n AS INTEGER) AS orig_bytes,
           |       CAST(stride AS INTEGER) AS stride,
           |       CAST((n + stride - 1) // stride AS INTEGER) AS resized_bytes,
           |       CAST(coalesce(list_sum(list_transform(range(0, (n + stride - 1) // stride),
           |         j -> ascii(substr(text, CAST(j * stride + 1 AS INTEGER), 1))
           |              * (j % 31 + 1))), 0) AS BIGINT) AS resized_checksum
           |FROM m ORDER BY id""".stripMargin))

  case class Frame(id: Long, frame_idx: Int, frame_len: Int, head: String,
      frame_checksum: Long)

  /** Frame sampling for "video" blobs: fixed-size byte windows as frames,
    * every k-th kept — one output row per SAMPLED frame (the fan-out shape
    * of a real frame extractor), flatMapped inside the same per-partition
    * batch. */
  def sampleFrames(s: SparkSession, media: DataFrame, frameBytes: Int,
      every: Int, partitions: Int): DataFrame = {
    import s.implicits._
    media.filter($"kind" === "video")
      .select($"id", $"kind", $"payload").as[MediaIn]
      .repartition(partitions, $"id")
      .mapPartitions(_.flatMap { m =>
        val n = m.payload.length
        val nFrames = (n + frameBytes - 1) / frameBytes
        (0 until nFrames by every).iterator.map { fi =>
          val start = fi * frameBytes
          val len = math.min(frameBytes, n - start)
          var sum = 0L; var i = 0
          while (i < len) {
            sum += (m.payload(start + i) & 0xff).toLong * (i % 31 + 1); i += 1
          }
          Frame(m.id, fi, len,
            new String(m.payload, start, math.min(8, len), "UTF-8"), sum)
        }
      })
      .toDF()
  }

  /** q_media_frames: every 3rd 100-byte frame of each video blob with
    * per-frame checksum — the oracle rebuilds the identical frames
    * relationally (unnest over the frame index range). */
  val qMediaFrames: Q = Q(
    "q_media_frames",
    (s, dir) => {
      import s.implicits._
      sampleFrames(s, mediaTable(s, dir), frameBytes = 100, every = 3,
        partitions = 8)
        .orderBy($"id", $"frame_idx")
    },
    Some("""WITH v AS (
           |  SELECT doc_id AS id,
           |         regexp_replace(text, '[^\x00-\x7F]+', '?', 'g') AS text,
           |         length(regexp_replace(text, '[^\x00-\x7F]+', '?', 'g')) AS n
           |  FROM documents WHERE doc_id % 3 = 2),
           |idx AS (
           |  SELECT id, text, n,
           |         unnest(range(0, CAST((n + 99) // 100 AS BIGINT))) AS fi
           |  FROM v)
           |SELECT id, CAST(fi AS INTEGER) AS frame_idx,
           |       CAST(least(100, n - fi * 100) AS INTEGER) AS frame_len,
           |       substr(text, CAST(fi * 100 + 1 AS INTEGER),
           |              CAST(least(8, least(100, n - fi * 100)) AS INTEGER)) AS head,
           |       CAST(coalesce(list_sum(list_transform(
           |         range(0, least(100, n - fi * 100)),
           |         i -> ascii(substr(text, CAST(fi * 100 + i + 1 AS INTEGER), 1))
           |              * (i % 31 + 1))), 0) AS BIGINT) AS frame_checksum
           |FROM idx WHERE fi % 3 = 0
           |ORDER BY id, frame_idx""".stripMargin))

  val all: Seq[Q] = Seq(qMultimodalFeatures, qMediaResize, qMediaFrames)
}
