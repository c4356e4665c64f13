package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY.md §2.8c L5; builder brief):
  * image/audio/video as opaque `binary` payload columns with typed
  * metadata, plus decode / feature-extract / resize / frame-sample
  * operators.
  *
  * The Spark-side plumbing is real: schemas, per-partition batched
  * processing (the Scala analogue of `mapInPandas` — an iterator of rows
  * per partition, never a driver collect), deterministic outputs, tested
  * shapes. The codec itself is STUBBED deterministically (no image/audio
  * libraries ship in this environment): "decoding" derives features from
  * the payload bytes via a fixed histogram transform, so tests are exact
  * and the operator swaps to a real codec by replacing one function.
  */
object Multimodal {

  case class MediaMeta(format: String, width: Int, height: Int,
                       durationMs: Long)
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                      meta: MediaMeta)
  case class MediaFeatures(media_id: Long, kind: String,
                           features: Array[Float], n_bytes: Long)
  case class Frame(media_id: Long, frame_idx: Int, ts_ms: Long,
                   payload: Array[Byte])

  /** Deterministic synthetic media table derived from the documents
    * fixture: payload = UTF-8 bytes of the text (an opaque blob as far as
    * the pipeline is concerned), kind/metadata derived from doc_id. */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (id, text) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val bytes = text.getBytes("UTF-8")
        MediaRow(id, kind, bytes,
          MediaMeta(format = kind match {
            case "image" => "png"; case "audio" => "wav"; case _ => "mp4"
          }, width = 64 + (id % 8).toInt * 32,
            height = 64 + (id % 5).toInt * 32,
            durationMs = if (kind == "image") 0L else 1000L + id * 10))
    }
  }

  /** STUB codec: a 16-bin byte histogram, L1-normalized. Replace with a
    * real decoder (JPEG/PNG/PCM) to productionize; the operator contract
    * (binary in, fixed-dim float features out) is unchanged. */
  def stubDecodeFeatures(payload: Array[Byte], dim: Int = 16): Array[Float] = {
    val hist = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      hist(((payload(i) & 0xFF) * dim) / 256) += 1f
      i += 1
    }
    val total = math.max(1, payload.length).toFloat
    hist.map(_ / total)
  }

  /** Feature extraction over batched partitions — the mapInPandas-shaped
    * path: one iterator pass per partition, constant memory, no shuffle. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        MediaFeatures(m.media_id, m.kind,
          stubDecodeFeatures(m.payload, dim), m.payload.length.toLong)
      }
    }
  }

  /** Resize: metadata transform + stub payload rewrite (truncation keeps
    * it deterministic; a real impl re-encodes). Pure projection. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { m =>
      val scale = math.max(1, (m.meta.width.toLong * m.meta.height)
        / math.max(1, w.toLong * h)).toInt
      m.copy(payload = m.payload.grouped(scale).map(_.head).toArray,
        meta = m.meta.copy(width = w, height = h))
    }
  }

  /** Frame sampling for video rows: one frame every `everyMs`, payload
    * stub-sliced from the source blob. flatMap = Catalyst Generate-shaped:
    * streams per partition, output can exceed input rowcount safely. */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long = 1000L): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val n = math.min(32, (m.meta.durationMs / everyMs).toInt)
      (0 until n).map { i =>
        val start = (m.payload.length.toLong * i / math.max(1, n)).toInt
        val end = math.min(m.payload.length,
          start + math.max(1, m.payload.length / math.max(1, n)))
        Frame(m.media_id, i, i * everyMs,
          java.util.Arrays.copyOfRange(m.payload, start, end))
      }
    }
  }
}
