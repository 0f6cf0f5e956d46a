package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch (test scope): 10×+ scale probes for the round-16 packing /
  * curriculum / hard-negative tier.  Run:
  *   sbt 'Test/runMain graft.XR16cScale [nDocs] [nVecs]' */
object XR16cScale {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 2000000L
    val nVecs = if (args.length > 1) args(1).toInt else 50000
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.{SimilarityOps, SplitOps, TextOps}

    // synthetic doc token counts, heavy-tailed-ish, all <= cap
    val cap = 2048L
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
      (pmod(col("id") * 2654435761L, lit(2000)) + 16L).as("n_tokens"))

    var t0 = System.nanoTime()
    val shelf = TextOps.packBinsShelf(docs, col("n_tokens"), col("doc_id"),
      cap)
    val shelfBins = shelf.select(countDistinct(
      concat_ws(":", col("size_class"), col("bin_in_class")))).head().getLong(0)
    val tShelf = (System.nanoTime() - t0) / 1e9

    t0 = System.nanoTime()
    val ffd = TextOps.packBinsFfd(docs, col("n_tokens"), col("doc_id"),
      cap, numGroups = 256)
    val over = ffd.groupBy("grp", "bin_in_group")
      .agg(sum("n_tokens").as("f")).where(col("f") > cap).count()
    val ffdBins = ffd.select(countDistinct(
      concat_ws(":", col("grp"), col("bin_in_group")))).head().getLong(0)
    val tFfd = (System.nanoTime() - t0) / 1e9
    require(over == 0, "FFD bin over capacity at scale")

    t0 = System.nanoTime()
    val cur = SplitOps.curriculumOrder(docs, col("n_tokens"),
      col("doc_id"), 32)
    val nCur = cur.count()
    val tCur = (System.nanoTime() - t0) / 1e9
    require(nCur == nDocs)

    // hard negatives: nVecs synthetic embeddings d=32, 64 labels,
    // ~sqrt(nVecs) cells, every vector a query
    val d = 32
    val vecs = spark.range(nVecs).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(d - 1)), j =>
        (pmod(col("id") * 31 + j * 17, lit(97)).cast("double") / 97.0)
          .cast("float")).as("embedding"),
      pmod(col("id"), lit(64)).cast("int").as("label"))
    val cells = math.max(8, math.sqrt(nVecs.toDouble).toInt)
    t0 = System.nanoTime()
    val hn = SimilarityOps.hardNegativesIvf(vecs, col("embedding"),
      col("vec_id"), col("label"), vecs, col("embedding"), col("vec_id"),
      col("label"), vecs.where(col("vec_id") < cells), col("embedding"),
      col("vec_id"), k = 3, nprobe = 2)
    val nHn = hn.count()
    val tHn = (System.nanoTime() - t0) / 1e9

    val lbBins = docs.agg((sum("n_tokens") / cap)).head().getDouble(0)
    println(f"PROBE pack n=$nDocs cap=$cap lb=${math.ceil(lbBins)}%.0f " +
      f"shelf_bins=$shelfBins shelf_s=$tShelf%.1f " +
      f"ffd_bins=$ffdBins ffd_s=$tFfd%.1f waste_shelf=" +
      f"${(shelfBins - lbBins) / lbBins * 100}%.1f%% waste_ffd=" +
      f"${(ffdBins - lbBins) / lbBins * 100}%.1f%%")
    println(f"PROBE curriculum n=$nDocs sec=$tCur%.1f")
    println(f"PROBE hard_neg_ivf n=$nVecs cells=$cells rows=$nHn " +
      f"sec=$tHn%.1f")
    spark.stop()
  }
}
