package graft

import org.apache.spark.sql.SparkSession

/** Scratch (test scope): the per-round BANKED plan audit — writes
  * `PLANS_r<N>.md` so plan regressions diff across rounds the way
  * correctness artifacts do.
  *
  * Section 1: the global XPlanAll gate over EVERY SparkEntry query
  * (Window-over-SinglePartition = the one shape that cannot scale out).
  * Section 2: a per-query physical census of the bench's most expensive
  * queries — exchange counts, scan counts, pushed/partition filters,
  * bucketed-scan flags, codegen spans.
  *
  * Run:  sbt 'Test/runMain graft.XPlanBank [sfDir] [outFile]' */
object XPlanBank {

  // the bench's top tier by r14/r15 wall time, plus the headline
  // pipeline/join queries — the set whose plans matter most
  val census = Seq(
    "dd_spans", "graph_reach_sketch", "dd_funnel_report",
    "o3_weighted_rounds", "dd_nn_dist_hist", "dd_substr_pairs",
    "dd_incremental_winnow", "ml_cv_accuracy", "dd_minhash_recall",
    "text_dsir_incremental", "ml_nb_classify", "graph_reach",
    "o4_class_balanced", "dd_fuzzy_keep", "dd_embed_banded",
    "dd_tf_cosine", "sim_knn_join", "sim_assign2_learned",
    "tpch_q9", "tpch_q21", "ev_asof_native", "o1_streaming",
    // r16 additions: the new top-tier + the fused/sketch shapes
    "ml_kmeans_resident", "sim_hybrid_topk", "sim_rrf_fuse",
    "text_overlap_topk", "sketch_cms_grid", "sketch_hdr_quantiles",
    "mm_real_ahash_banded", "mm_wav_ahash_banded",
    // r16 late additions: packing / hard-negative / PNG / composition tier
    "sim_hard_neg_ivf", "sim_hard_negatives", "text_pack_shelf",
    "text_pack_ffd", "text_curriculum", "pipeline_sft_pack", "mm_gif_ahash_banded",
    "pipeline_contrastive", "mm_png_ahash_banded", "emb_gram_merge",
    // r17 additions: the re-planned kcore (shared layout + driver-gated
    // peel: the census row shows the final assembly over the landed pair
    // table — the bench's formerly most expensive query, now diffable),
    // the lossy JPEG tier, the per-group HDR histogram
    "graph_kcore", "mm_jpeg_decode", "mm_jpeg_ahash_banded",
    "sketch_hdr_hist_by_lang", "mm_jpeg_color_decode", "mm_jpeg420_decode",
    "mm_jpeg_prog_decode", "mm_jpeg_sa_decode",
    // r17b additions: the remaining sampling geometries, progressive
    // color, the lossy audio tier (G.711 + IMA ADPCM), and the new
    // containers (TIFF, FLAC, Adam7 PNG, PCM breadth)
    "mm_jpeg422_decode", "mm_jpeg411_decode", "mm_jpeg_prog_color_decode",
    "mm_wav_ulaw", "mm_wav_alaw", "mm_wav_adpcm",
    "mm_tiff_decode", "mm_flac_decode", "mm_png_interlaced",
    "mm_wav_formats", "mm_gif_interlaced", "mm_bmp_shapes",
    "mm_pnm_formats", "mm_jpeg_quality_gauge",
    // r18 additions: the 64-bit re-landed near-dup layout consumers are
    // already above (their rows should show the unchanged 1-scan shape);
    // plus the new containers — stereo FLAC, tiled/planar TIFF, PNG
    // shapes, PBM, animated GIF
    "mm_flac_stereo", "mm_tiff_tiled", "mm_tiff_planar",
    "mm_png_shapes", "mm_pbm_bitmaps", "mm_gif_animated",
    "mm_y4m_frames", "mm_y4m_frame_dedup",
    // r19 additions: the perceptual video near-dup (banded join over
    // per-frame hashes — the row must show the band-bucket shape, not
    // an all-pairs join), GIF disposal/transparency compositing, and
    // the incremental video-dedup pipeline's final union
    "mm_y4m_frame_neardup", "mm_gif_disposal", "mm_gif_transparency",
    "pipe_video_dedup", "mm_avi_frames", "mm_avi_mjpeg",
    "mm_y4m_scene_cuts",
    // r20 additions: the digest-keyed clip near-dup (the row must show
    // the md5-key equality join — one shuffle on a 16-byte key), the
    // interlaced field-split decode, and the rec-list/table-less AVI
    // conformance gauges
    "mm_clip_dedup_digest", "mm_y4m_interlaced", "mm_avi_rec",
    "mm_avi_mjpeg_notables", "mm_jpeg_prog420_decode",
    "pipe_video_dedup_compact")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val outFile = if (args.length > 1) args(1) else "/root/repo/PLANS_r15.md"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE off: the unexecuted adaptive plan string hides codegen
      // stages; the audit wants the full static shape
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("# PLANS — banked physical-plan audit\n\n")
    sb.append(s"Scale: `$sfDir`.  Regenerate: " +
      "`sbt 'Test/runMain graft.XPlanBank'`.\n\n")

    // ---- section 1: global single-partition-window gate ----------------
    var flagged = List.empty[String]
    var errs = List.empty[String]
    var n = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        n += 1
        val lines = plan.split("\n")
        val bad = lines.zipWithIndex.exists { case (l, i) =>
          l.contains("Window") &&
            lines.slice(i + 1, i + 4)
              .exists(_.contains("Exchange SinglePartition"))
        }
        if (bad) flagged ::= name
        graft.core.CacheScope.release()
      } catch { case e: Throwable =>
        errs ::= s"$name: ${e.toString.take(80)}"
      }
    }
    sb.append("## 1. Global gate: Window over SinglePartition\n\n")
    sb.append(s"$n queries audited; ${flagged.size} flagged" +
      (if (flagged.isEmpty) " — every window runs on a partitioned key.\n\n"
       else s": ${flagged.sorted.mkString(", ")}\n\n"))
    errs.sorted.foreach(e => sb.append(s"- ERROR $e\n"))

    // ---- section 2: per-query physical census --------------------------
    sb.append("## 2. Physical census (bench top tier)\n\n")
    sb.append("| query | hash ex | range ex | single ex | scans | " +
      "pushed filters | partition filters | bucketed | codegen spans |\n")
    sb.append("|---|---|---|---|---|---|---|---|---|\n")
    census.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => sb.append(s"| $name | (not registered) |\n")
        case Some(fn) =>
          try {
            val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
            def c(p: String) = p.r.findAllIn(plan).length
            val scans = c("FileScan ")
            // a pushed/partition filter column counts only when non-empty
            val pushed = c("PushedFilters: \\[[^\\]]") +
              c("PushedAggregation: \\[[^\\]]")
            val part = c("PartitionFilters: \\[[^\\]]")
            // codegen stages print as the star notation `*(n)` in
            // executedPlan.toString — count DISTINCT stage ids
            val codegen = "\\*\\((\\d+)\\)".r
              .findAllMatchIn(plan).map(_.group(1)).toSet.size
            sb.append(s"| $name | ${c("Exchange hashpartitioning")} | " +
              s"${c("Exchange rangepartitioning")} | " +
              s"${c("Exchange SinglePartition")} | $scans | $pushed | " +
              s"$part | ${plan.contains("Bucketed: true")} | " +
              s"$codegen |\n")
          } catch { case e: Throwable =>
            sb.append(s"| $name | ERROR ${e.toString.take(60)} |\n")
          } finally graft.core.CacheScope.release()
      }
    }
    sb.append("\nSingle-partition exchanges in the census feed one-row " +
      "global aggregates (count/argmax reads), not windows — the gate in " +
      "§1 holds.\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile),
      sb.toString)
    println(s"PLANBANK wrote $outFile: $n audited, ${flagged.size} flagged, " +
      s"${errs.size} errors")
    spark.stop()
  }
}
