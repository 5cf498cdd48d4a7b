package graft.api

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Deterministic per-item features extracted from an opaque media
  * payload. `n_bytes`/`first_byte`/`byte_fp` are byte-level stats the
  * stub decoder produces; a real decoder would append modality features
  * (pixels, spectrogram stats, ...) in the same row shape.
  */
case class MediaFeatures(doc_id: Long, n_bytes: Int, first_byte: Int, byte_fp: Long)

/** One sampled frame from a media payload (see Multimodal.frameSample). */
case class FrameFeature(doc_id: Long, frame_idx: Int, frame_bytes: Int, frame_fp: Long)

/** A strided-downsample "resize" of a media payload (see
  * Multimodal.resize): original size, resized size, and a fingerprint
  * of the resized bytes. */
case class MediaResized(doc_id: Long, n_bytes: Int, resized_bytes: Int, resized_fp: Long)

/** Multimodal columns: media as opaque `binary` + typed metadata in a
  * struct column, with decode/feature-extraction as a partition-wise
  * operator.
  *
  * The decode step is a STUB (image/audio libraries are not in this
  * container): it computes deterministic byte-level statistics instead of
  * pixel/audio features. The Spark-side plumbing is the real thing —
  * binary column through parquet, typed Dataset, mapPartitions batch
  * shape (one decoder instance per partition, the same structure a JNI or
  * Python-worker decoder needs), schema'd output.
  */
object Multimodal {

  /** Pack media + metadata into a single struct column `m` (parquet
    * keeps nested columns separately — nested pruning works).
    */
  def pack(df: DataFrame, payloadFrom: String, metaCols: Seq[String]): DataFrame =
    df.select(struct(metaCols.map(col) :+
      col(payloadFrom).cast("binary").as("payload"): _*).as("m"))

  /** Partition-wise "decode" + feature extraction over (id, payload).
    *
    * mapPartitions — not a per-row UDF — so a real decoder could
    * amortize model/codec initialization once per partition and process
    * items in batches. The stub features are deterministic byte stats,
    * so the operator is oracle-verifiable end to end.
    */
  /** Frame sampling (video-style payloads): every `stride`-th
    * `frameSize`-byte frame becomes ONE OUTPUT ROW with per-frame
    * features — the flatMap batch shape a real frame sampler has (rows
    * out ≠ rows in, decoder init once per partition). The stub "decoder"
    * slices byte ranges; a real codec swaps in without touching the
    * plumbing. Only complete frames are emitted (payloads shorter than
    * one frame yield nothing), and sampling is deterministic, so the
    * operator is oracle-verifiable end to end.
    */
  def frameSample(df: DataFrame, idCol: String, payloadCol: String,
                  frameSize: Int = 100, stride: Int = 3): Dataset[FrameFeature] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // >>> STUB DECODER <<< (real impl: init codec once per partition)
        it.flatMap { case (id, bytes) =>
          val nFrames = bytes.length / frameSize
          (0 until nFrames by stride).iterator.map { f =>
            val fr = bytes.slice(f * frameSize, (f + 1) * frameSize)
            val fp = fr.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
            FrameFeature(id, f, fr.length, fp)
          }
        }
      }
  }

  /** Resize (image-style payloads): a strided byte downsample — every
    * `stride`-th byte of the payload survives — standing in for a real
    * resampling kernel the same way the stub decoder stands in for a
    * codec: the mapPartitions batch shape, binary-in/binary-derived-out
    * row contract, and per-partition init point are the real plumbing,
    * and the stub arithmetic is deterministic so the operator is
    * oracle-verifiable end to end. Emits sizes + a fingerprint of the
    * resized bytes rather than the bytes themselves, keeping declared
    * output hash-friendly.
    */
  def resize(df: DataFrame, idCol: String, payloadCol: String,
             stride: Int = 4): Dataset[MediaResized] = {
    require(stride >= 1, s"resize stride must be >= 1, got $stride " +
      "(a non-positive stride would silently emit empty resamples or " +
      "crash inside an executor task)")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // >>> STUB RESAMPLER <<< (real impl: init resize kernel once per
        // partition, then resample each payload)
        it.map { case (id, bytes) =>
          val sampled = bytes.indices.by(stride).map(bytes(_))
          val fp = sampled.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
          MediaResized(id, bytes.length, sampled.length, fp)
        }
      }
  }

  def decodeFeatures(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // >>> STUB DECODER <<<  (real impl: init codec/model HERE, once
        // per partition, then decode each payload)
        it.map { case (id, bytes) =>
          val fp = bytes.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
          MediaFeatures(id, bytes.length,
            if (bytes.nonEmpty) bytes(0) & 0xff else -1, fp)
        }
      }
  }
}
