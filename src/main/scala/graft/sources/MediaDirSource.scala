package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed media-directory ingestion — the cluster-scale path for
  * landing a crawl of real media files (.png/.gif/.wav/.y4m/.avi …) as
  * the engine's binary payload-column layout:
  *
  *   (doc_id BIGINT, file_name STRING, modality STRING,
  *    byte_len BIGINT, payload BINARY)
  *
  * Built on Spark's `binaryFile` source, so file reads distribute
  * across executors, `pathGlobFilter` pushes into the listing, and the
  * payload bytes never leave the executor that read them — at 100 TB
  * the bytes ARE the cost, and this plan moves each file once.  The
  * driver-side one-shot twin is tools/media_dir_to_parquet.py (the
  * h5ad-converter pattern); the two paths assign IDENTICAL doc_ids
  * (FNV-1a of the file name) and identical modality routing, which
  * R20MediaIngestSpec asserts over the committed foreign-written
  * fixture directory (tools/fixtures/media/, written by
  * tools/make_media_fixtures.py).  Unknown extensions are dropped by
  * both paths — a crawl directory always carries stray sidecar files.
  * Two filename edge rules are pinned so the paths cannot diverge:
  * dot- and underscore-prefixed names are SKIPPED by both (Spark's
  * FileIndex hidden-file rule, mirrored explicitly by the Python
  * twin — staging conventions like "_part.wav"/".sync.png" mean
  * "not landed yet", not "ingest me"), and a DOTLESS name never
  * routes (an extension requires a '.'; a file named exactly "png"
  * is a sidecar, not an image).
  */
object MediaDirSource {

  /** extension → modality routing, mirrored in media_dir_to_parquet.py. */
  val ModalityByExt: Map[String, String] = Map(
    "png" -> "image", "gif" -> "image", "bmp" -> "image",
    "ppm" -> "image", "pgm" -> "image", "pbm" -> "image",
    "tif" -> "image", "tiff" -> "image", "jpg" -> "image",
    "jpeg" -> "image",
    "wav" -> "audio", "au" -> "audio", "aiff" -> "audio",
    "aif" -> "audio", "flac" -> "audio",
    "y4m" -> "video", "avi" -> "video")

  /** 64-bit FNV-1a of the file name — the stable doc id both ingest
    * paths assign (a name hash, not a listing position: positions shift
    * when files land, hashes do not). */
  def fnv1a64(name: String): Long = {
    var h = 0xcbf29ce484222325L
    name.getBytes("UTF-8").foreach { b =>
      h ^= (b & 0xffL)
      h *= 0x100000001b3L
    }
    h
  }

  private val fnvUdf = udf((name: String) => fnv1a64(name))

  /** Read every known-modality file under `dir` (optionally narrowed by
    * a `pathGlobFilter` glob) into the payload-column layout. */
  def read(spark: SparkSession, dir: String,
      glob: String = "*"): DataFrame = {
    val modality = typedLit(ModalityByExt)
    spark.read.format("binaryFile").option("pathGlobFilter", glob)
      .load(dir)
      .select(substring_index(col("path"), "/", -1).as("file_name"),
        col("length").as("byte_len"), col("content").as("payload"))
      // extension requires a '.': substring_index on a dotless name
      // returns the whole name, which must NOT route (a file named
      // exactly "png" is a sidecar) — matching the Python twin
      .withColumn("__ext",
        when(col("file_name").contains("."),
          lower(substring_index(col("file_name"), ".", -1))))
      .withColumn("modality", element_at(modality, col("__ext")))
      .where(col("modality").isNotNull) // stray sidecar files: dropped
      .select(fnvUdf(col("file_name")).as("doc_id"), col("file_name"),
        col("modality"), col("byte_len"), col("payload"))
  }
}
