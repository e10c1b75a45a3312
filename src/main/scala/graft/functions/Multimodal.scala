package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for training-data pipelines: image/audio/
  * video payloads ride as opaque `binary` columns with typed metadata;
  * decode/feature-extraction runs per-partition over a typed Dataset so a
  * real decoder (JNI/ffmpeg/image lib) drops in without changing the
  * pipeline shape.
  *
  * The decode step itself is STUBBED (media libraries are not in this
  * container): [[StubDecoder]] derives deterministic fake dimensions from
  * the payload hash. Everything around it — schema, encoders, partition
  * independence, batch shape — is real and tested, which is the part that
  * matters at 100 TB: rows never leave their partition, the decoder is
  * instantiated once per partition (not per row), and the output is a flat
  * columnar frame ready for filtering/joins.
  */
object Multimodal {

  /** One media payload + metadata (binary column convention). */
  final case class MediaRow(id: Long, modality: String, payload: Array[Byte])

  /** Extracted features (decode output). */
  final case class MediaFeatures(id: Long, modality: String, byteLen: Long,
      width: Int, height: Int, frames: Int, ok: Boolean)

  implicit val mediaRowEnc: Encoder[MediaRow] = Encoders.product[MediaRow]
  implicit val mediaFeatEnc: Encoder[MediaFeatures] =
    Encoders.product[MediaFeatures]

  /** A per-partition decoder handle. A real implementation opens native
    * resources in the constructor; the contract is one instance per
    * partition (see [[extractFeatures]]). */
  trait Decoder extends Serializable {
    def decode(modality: String, payload: Array[Byte]): (Int, Int, Int)
  }

  /** Deterministic fake decode: dimensions derived from payload bytes.
    * Replace with a real decoder in deployment — the seam is this class. */
  object StubDecoder extends Decoder {
    def decode(modality: String, payload: Array[Byte]): (Int, Int, Int) = {
      val h = java.util.Arrays.hashCode(payload)
      val w = 64 + math.floorMod(h, 1920)
      val ht = 64 + math.floorMod(h >> 8, 1080)
      val frames = modality match {
        case "image" => 1
        case "audio" => 1 + math.floorMod(h >> 16, 4096)
        case _ => 1 + math.floorMod(h >> 4, 600)
      }
      (w, ht, frames)
    }
  }

  /** Partition-parallel decode/feature-extract: `mapPartitions` so the
    * decoder is constructed once per partition and rows stream through it
    * (the Scala analog of `mapInPandas` batch processing). */
  def extractFeatures(media: Dataset[MediaRow],
      decoder: Decoder = StubDecoder): Dataset[MediaFeatures] =
    media.mapPartitions { rows =>
      rows.map { r =>
        val ok = r.payload != null && r.payload.nonEmpty
        val (w, h, f) =
          if (ok) decoder.decode(r.modality, r.payload) else (0, 0, 0)
        MediaFeatures(r.id, r.modality,
          if (r.payload == null) 0L else r.payload.length.toLong, w, h, f, ok)
      }
    }

  /** Uniform frame sampling: `n` deterministic frame indices over a
    * `framesCol`-long clip (stride = frames/n, integer arithmetic — the
    * "which frames to decode" plan computed WITHOUT touching payload
    * bytes; the decoder then seeks exactly these). Fewer frames than
    * requested → every frame once. `framesCol` is a column NAME. */
  def frameSampleIndices(framesCol: String, n: Int)
      : org.apache.spark.sql.Column =
    expr(s"""transform(
            |  sequence(0, CAST(least($n, $framesCol) AS INT) - 1),
            |  i -> CAST((CAST(i AS BIGINT) * $framesCol)
            |         DIV least($n, $framesCol) AS INT))"""
      .stripMargin.replace("\n", " "))

  /** Fit-within-box resize plan (aspect preserved, integer-only: scale
    * by the limiting axis via cross multiplication — no FP, so every
    * engine computes identical target dims). Returns struct(fit_w, fit_h);
    * never upscales. `wCol`/`hCol` are column NAMES. */
  def resizePlan(wCol: String, hCol: String, maxW: Int, maxH: Int)
      : org.apache.spark.sql.Column =
    expr(s"""CASE WHEN $wCol * $maxH <= $hCol * $maxW
            |  THEN struct(CAST(($wCol * least($maxH, $hCol)) DIV $hCol
            |         AS INT) AS fit_w,
            |       CAST(least($maxH, $hCol) AS INT) AS fit_h)
            |  ELSE struct(CAST(least($maxW, $wCol) AS INT) AS fit_w,
            |       CAST(($hCol * least($maxW, $wCol)) DIV $wCol AS INT)
            |         AS fit_h)
            |END""".stripMargin.replace("\n", " "))

  /** Columnar entry: binary payload column → features frame. */
  def extractFeaturesDf(df: DataFrame, idCol: String, modalityCol: String,
      payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed = df.select(col(idCol).cast("long").as("id"),
      col(modalityCol).cast("string").as("modality"),
      col(payloadCol).cast("binary").as("payload")).as[MediaRow]
    extractFeatures(typed).toDF()
  }
}
