package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch (test scope): the round-20 probe behind `pipe_video_dedup` /
  * `pipe_video_dedup_compact` — the video-ingestion loop at 100× the
  * sf0.1 documents table (default 500 000 docs = 1.5 M decoded frames),
  * asserting PER-CATCH-UP COST STAYS O(delta) as the persisted index
  * grows, the one scale claim r19 proved only at 10×.
  *
  * Planted structure: docs with id % 5000 == 0 (100 docs) share one
  * base text — a duplicate family whose 3 frames each form a 100-way
  * equal-hash clique; every other doc is unique.
  *
  * Asserted per catch-up (4 staged shards, id % 4):
  *
  *  1. DECODE COUNT (the cost that dominates at 100 TB): a
  *     LongAccumulator inside the decode UDF must grow by ~3·|delta|
  *     per catch-up — an O(corpus) regression (re-decoding the stored
  *     index) would grow it by 3·|total| and trips the bound at the
  *     2nd shard already;
  *  2. INDEX FILE COUNT stays bounded by the retention policy
  *     (PersistedIndex.maybeCompact after every append) while
  *     candidates stay exact;
  *  3. BUCKET LAW: the largest frame-hash bucket == the planted family
  *     size (dup density, not corpus size);
  *  4. EXACTNESS: the staged pair union == the closed-form planted
  *     truth, 3 · C(100, 2) = 14 850 pairs.
  *
  * Run:  sbt 'Test/runMain graft.XR20Scale [nDocs]' */
object XR20Scale {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 500000L
    val famStride = 5000L
    val famSize = (nDocs + famStride - 1) / famStride
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.{LayoutOps, MultimodalOps, PersistedIndex, VideoCodec}

    val root = java.nio.file.Files.createTempDirectory("xr20").toString
    val lake = s"$root/lake"; val ckp = s"$root/ckp"
    val idx = s"$root/idx"; val cand = s"$root/cand"

    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
      md5(concat(lit("v20"),
        when(col("id") % famStride === 0, lit(-1L)).otherwise(col("id"))
          .cast("string"))).as("text"))

    val decodes = spark.sparkContext.longAccumulator("frame_decodes")
    val frameHashes = udf((id: Long, text: String) => {
      val src = MultimodalOps.asciiBytes(text)
      decodes.add(3)
      VideoCodec.decodeY4mFrames(VideoCodec.encodeY4m(8, 8,
        (0 until 3).map { f =>
          (x: Int, y: Int) => src((y * 8 + x + 29 * f) % src.length) & 0xff
        }, chroma = "420"))
        .map(r => r.lumaSum3.mkString(","))
    })

    var done = 0L
    var prevDecodes = 0L
    (0 until 4).foreach { k =>
      val shard = docs.where(col("doc_id") % 4 === k)
      val shardN = shard.count()
      LayoutOps.commitAppend(shard, lake)
      val t0 = System.nanoTime()
      LayoutOps.lakeTail(spark, lake, ckp) { (delta, _) =>
        val fr = delta.select(col("doc_id"),
            posexplode(frameHashes(col("doc_id"), col("text"))))
          .select(col("doc_id"), col("pos").cast("long").as("frame"),
            col("col").as("luma"), md5(col("col")).as("__k"))
          .persist()
        val seeded = new java.io.File(idx).exists
        val within = fr.as("a").join(fr.as("b"),
            col("a.__k") === col("b.__k") &&
              col("a.luma") === col("b.luma") &&
              (col("a.doc_id") < col("b.doc_id") ||
                (col("a.doc_id") === col("b.doc_id") &&
                  col("a.frame") < col("b.frame"))))
          .select(col("a.doc_id").as("doc_a"), col("a.frame").as("frame_a"),
            col("b.doc_id").as("doc_b"), col("b.frame").as("frame_b"))
        val pairs =
          if (!seeded) within
          else {
            val old = spark.read.parquet(idx)
            val joined = old.as("a").join(fr.as("b"),
              col("a.__k") === col("b.__k") &&
                col("a.luma") === col("b.luma"))
            val aFirst = col("a.doc_id") < col("b.doc_id")
            joined.select(
                when(aFirst, col("a.doc_id")).otherwise(col("b.doc_id"))
                  .as("doc_a"),
                when(aFirst, col("a.frame")).otherwise(col("b.frame"))
                  .as("frame_a"),
                when(aFirst, col("b.doc_id")).otherwise(col("a.doc_id"))
                  .as("doc_b"),
                when(aFirst, col("b.frame")).otherwise(col("a.frame"))
                  .as("frame_b"))
              .unionByName(within)
          }
        pairs.write.mode("append").parquet(cand)
        fr.select("doc_id", "frame", "luma", "__k")
          .write.mode("append").parquet(idx)
        fr.unpersist()
        PersistedIndex.maybeCompact(spark, idx, maxFiles = 48,
          targetFiles = 16)
      }
      val secs = (System.nanoTime() - t0) / 1e9
      done += shardN
      // 1. decode count grew by O(delta), not O(total): the stored
      // index must never be re-decoded (tolerance covers task retries)
      val dNow = decodes.value
      val grew = dNow - prevDecodes
      prevDecodes = dNow
      require(grew <= 3 * shardN * 3 / 2,
        s"catch-up $k decoded $grew frames for a $shardN-doc delta — " +
          "O(corpus) re-decode regression")
      require(grew >= 3 * shardN,
        s"catch-up $k decoded only $grew frames for $shardN docs")
      // 2. retention holds as the index grows
      val files = PersistedIndex.dataFileCount(spark, idx)
      require(files <= 48 + 32,
        s"index fragmented past the retention bound: $files files")
      println(f"PROBE catch-up $k: docs=$shardN ($secs%.1f s) " +
        f"decodes+=$grew indexFiles=$files")
    }

    // 3. bucket law: max frame-hash bucket == the planted family size
    val maxBucket = spark.read.parquet(idx)
      .groupBy("__k").agg(count(lit(1)).as("c"))
      .agg(max(col("c"))).head().getLong(0)
    require(maxBucket == famSize,
      s"max bucket $maxBucket != planted family $famSize")

    // 4. exactness: staged union == closed-form planted truth
    val got = spark.read.parquet(cand).distinct().count()
    val want = 3 * famSize * (famSize - 1) / 2
    require(got == want, s"staged pairs $got != planted truth $want")

    val total = spark.read.parquet(idx).count()
    require(total == 3 * done, s"index rows $total != ${3 * done}")
    println(f"PROBE nDocs=$nDocs frames=${3 * done} | pairs=$got " +
      f"(= 3*C($famSize,2)) | maxBucket=$maxBucket | " +
      f"decodes=${decodes.value} (once per frame) | " +
      f"indexFiles=${PersistedIndex.dataFileCount(spark, idx)}")
    spark.stop()
  }
}
