package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column utilities beyond search ([[SimilarityOps]]) and
  * near-dup mining ([[DedupOps]]): normalization and exact class centroids —
  * the vector preprocessing a training-data pipeline runs before ANN
  * indexing (IVF init, class prototypes, curriculum scoring).
  *
  * Exactness contract: cross-row float SUMS are order-dependent, so the
  * centroid aggregates integerize each component to micro-units
  * (`floor(x * 1e6)` as long) and sum exactly — associative, bit-identical
  * under any partitioning, and reproducible in the SQL oracle.  The same
  * hardening as [[graft.streaming.StreamingOps]]' value sums.
  */
object EmbedOps {

  /** L2-normalized copy of a vector (components in double).  Per-row
    * expression: no shuffle, codegen'd norm kernel.  An all-zero vector is
    * returned unchanged (as doubles) rather than dividing by sqrt(0) — a
    * NaN here would silently poison every downstream centroid/ANN
    * consumer. */
  def l2Normalize(vec: Column): Column = {
    val n = sqrt(graft.functions.VecKernels.norm2(vec))
    when(n > 0.0, transform(vec.cast("array<double>"), x => x / n))
      .otherwise(vec.cast("array<double>"))
  }

  /** Exact per-label centroids in long format: (label, dim, centroid, n).
    *
    * Physical shape: posexplode to (label, dim, micro-unit component) then
    * ONE hash aggregate on (label, dim).  The explode looks wide (dims× the
    * rows) but partial aggregation collapses each task's output to
    * |labels|·dims rows before the shuffle — at 100 TB the exchange carries
    * kilobytes per task, not the corpus.  The division happens once per
    * (label, dim) after the exact integer sums. */
  def centroids(df: DataFrame, vec: Column, label: Column): DataFrame =
    df.select(label.as("label"),
        posexplode(vec.cast("array<double>")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim").cast("long").as("dim"))
      .agg(sum(floor(col("x") * lit(1000000.0)).cast("long")).as("__s"),
        count(lit(1)).as("n"))
      .select(col("label"), col("dim"),
        // NO rounding: sum and n are exact integers, so this single IEEE
        // division is already bit-identical across engines — a 6-decimal
        // round would only ADD disagreement (exact .5 ties round HALF_UP
        // in Spark's decimal round but half-to-even in DuckDB's float one)
        (col("__s").cast("double") /
          (col("n").cast("double") * lit(1000000.0))).as("centroid"),
        col("n"))

  /** Per-label centroid drift between two corpus snapshots: the cosine of
    * each label's [[centroids]] vector computed on A vs on B — the
    * embedding-space counterpart of `TextOps.jsDriftByGroup` (did this
    * class's representation move between crawls / model versions?).
    *
    * Exactness: centroid components are already exact-integer-derived
    * doubles; the per-dim products are pico-unit-floored to longs BEFORE
    * the per-label sums, so the cosine is summation-order-immune and
    * oracle-reproducible.  Joins and aggregates run on |labels|×dims
    * rows — nothing corpus-scale after the two centroid passes.
    * Output: (label, cos, n_a, n_b), cosine 6-dp. */
  def centroidDrift(dfA: DataFrame, dfB: DataFrame, vec: Column,
      label: Column): DataFrame = {
    val ca = centroids(dfA, vec, label)
      .select(col("label"), col("dim"), col("centroid").as("ca"),
        col("n").as("na"))
    val cb = centroids(dfB, vec, label)
      .select(col("label"), col("dim"), col("centroid").as("cb"),
        col("n").as("nb"))
    ca.join(cb, Seq("label", "dim"))
      .groupBy("label")
      .agg(sum(floor(col("ca") * col("cb") * 1e12).cast("long")).as("num"),
        sum(floor(col("ca") * col("ca") * 1e12).cast("long")).as("da"),
        sum(floor(col("cb") * col("cb") * 1e12).cast("long")).as("db"),
        max("na").as("n_a"), max("nb").as("n_b"))
      .select(col("label"),
        round(col("num").cast("double") /
          (sqrt(col("da").cast("double")) * sqrt(col("db").cast("double"))),
          6).as("cos"),
        col("n_a"), col("n_b"))
  }

  /** Semantic outlier flags: each vector's cosine to its OWN label
    * centroid (the exact [[centroids]] aggregate), `is_outlier` when it
    * falls below `minCosine` — the prototype-distance prune a curation
    * pipeline runs before training (mislabeled / off-cluster embeddings;
    * the cluster-distance signal of SemDeDup, Abbas et al. 2023, applied
    * to pruning rather than dedup).
    *
    * Shape: the centroid table is |labels| rows — rebuilt into vectors
    * with a per-label array_sort (tiny), then BROADCAST into a single
    * narrow pass over the corpus; the only corpus-scale shuffle is the
    * one inside [[centroids]] (already collapsed map-side to
    * |labels|·dims partials).  The flag is a pushdown-able predicate once
    * written out.  Output: (vec_id, label, ccos, is_outlier). */
  def centroidOutliers(df: DataFrame, vec: Column, label: Column,
      id: Column, minCosine: Double): DataFrame = {
    val cent = centroids(df, vec, label)
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("dim"),
        col("centroid")))), x => x("centroid")).as("cv"))
    df.select(id.cast("long").as("vec_id"), label.as("label"), vec.as("v"))
      .join(broadcast(cent), Seq("label"))
      .select(col("vec_id"), col("label"),
        round(SimilarityOps.cosine(col("v"), col("cv")), 6).as("ccos"))
      .withColumn("is_outlier", col("ccos") < minCosine)
  }

  /** Embedding-space decontamination: each corpus vector's max cosine to
    * a benchmark/probe embedding set, with the count of probes at or
    * above `minCosine` and the contamination flag — the semantic tier of
    * benchmark decontamination (n-gram tiers catch verbatim leakage;
    * this catches paraphrased eval items the way SemDeDup catches
    * paraphrased dups).  Output: (vec_id, max_cos, n_hits,
    * is_contaminated), one row per corpus vector, self-pairs excluded.
    *
    * Scale shape: the probe side is an eval benchmark — thousands of
    * rows, not corpus-scale — so it is BROADCAST and the whole operator
    * is one narrow pass over the corpus followed by a hash aggregate on
    * vec_id (map-side combined to one row per corpus vector per task).
    * The corpus never shuffles by probe; per-pair cosine is the codegen'd
    * dot kernel.  Cosines are 6-dp rounded BEFORE max/threshold so the
    * aggregate is order-free and oracle-replayable. */
  def semanticContam(corpus: DataFrame, vec: Column, id: Column,
      probe: DataFrame, pvec: Column, pid: Column,
      minCosine: Double): DataFrame = {
    val p = probe.select(pid.cast("long").as("probe_id"), pvec.as("pv"))
    corpus.select(id.cast("long").as("vec_id"), vec.as("v"))
      .join(broadcast(p), col("vec_id") =!= col("probe_id"))
      .select(col("vec_id"),
        round(SimilarityOps.cosine(col("v"), col("pv")), 6).as("cos"))
      .groupBy("vec_id")
      .agg(max("cos").as("max_cos"),
        sum(when(col("cos") >= minCosine, 1L).otherwise(0L)).as("n_hits"))
      .withColumn("is_contaminated", col("n_hits") > 0L)
  }
}
