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

  /** Exact Gram statistics of the embedding column as a long-format table:
    * one [[graft.functions.GramAgg]] pass reduces the corpus to
    * `1 + d + d(d+1)/2` integers; rows are
    *   - `(0, 0, n)`          — vector count,
    *   - `(0, j, s_j)`        — Σ floor(x_j·10⁹), j in 1..d,
    *   - `(i, j, q_ij)`       — Σ floor(x_i·x_j·10¹²), 1 ≤ i ≤ j ≤ d,
    * (1-based dims).  All integers — the engine-portable sufficient
    * statistics from which mean/covariance/PCA derive; nothing float ever
    * crosses the compare.  At 100 TB this is the whole point: the corpus
    * never shuffles, only the d² longs do. */
  def gramTable(df: DataFrame, vec: Column, d: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val gram = udaf(new graft.functions.GramAgg(d))
    val arr = df.select(vec.cast("array<float>").as("v"))
      .agg(gram(col("v")).as("g")).head().getSeq[Long](0)
    val rows = Seq((0, 0, arr(0))) ++
      (1 to d).map(j => (0, j, arr(j))) ++ {
        var qOff = 1 + d
        (1 to d).flatMap { i =>
          val r = (i to d).map(j => (i, j, arr(qOff + (j - i))))
          qOff += d - i + 1
          r
        }
      }
    rows.toDF("i", "j", "q")
  }

  /** PCA top-k projection: covariance from the [[gramTable]] sufficient
    * statistics (one distributed pass), eigenvectors by power iteration
    * with deflation on the DRIVER (the d×d matrix is executor-irrelevant —
    * 64×64 here; MLlib draws the same line), then one broadcast
    * matrix-multiply pass projects every centered vector.  Returns
    * (id, pc) with `pc` the k projection doubles.
    *
    * Deterministic: fixed e_1.. init vectors and a fixed iteration count —
    * no randomness; sign convention: each eigenvector's
    * largest-magnitude component is made positive. */
  def pcaProject(df: DataFrame, id: Column, vec: Column, d: Int,
      k: Int, iters: Int = 100): DataFrame = {
    val m = pcaFit(df, vec, d, k, iters)
    projectWith(df, id, vec, m.mean, m.components)
  }

  /** The PCA model [[pcaFit]] returns: data mean, top-k eigenvectors
    * (rows, unit length, largest-|component| sign-positive), their
    * eigenvalues (descending), and the covariance trace (= total
    * variance, exact up to the fixed-point statistics). */
  final case class PcaModel(mean: Array[Double],
      components: Array[Array[Double]], eigenvalues: Array[Double],
      trace: Double, n: Long)

  /** Fit the top-k PCA basis: covariance from the [[gramTable]] fixed-
    * point sufficient statistics (ONE distributed pass — only
    * 1 + d + d(d+1)/2 longs ever leave the executors), then deterministic
    * power iteration + deflation on the driver's d×d (64×64 here; MLlib
    * draws the same driver/cluster line).  No randomness: fixed init
    * vectors, fixed iteration count, sign convention largest-|component|
    * positive. */
  def pcaFit(df: DataFrame, vec: Column, d: Int, k: Int,
      iters: Int = 100): PcaModel = {
    require(k > 0 && k <= d, "k must be in 1..d")
    val stats = gramTable(df, vec, d).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val nL = stats((0, 0))
    require(nL > 0, "pcaFit: empty input")
    val n = nL.toDouble
    val mean = Array.tabulate(d)(j => stats((0, j + 1)).toDouble / 1e9 / n)
    val cov = Array.tabulate(d, d) { (a, b) =>
      val (i, j) = (math.min(a, b) + 1, math.max(a, b) + 1)
      stats((i, j)).toDouble / 1e12 / n - mean(a) * mean(b)
    }
    // exact-integer trace (scale 1e18·n²), one double conversion at the
    // end — the SQL oracle reproduces this bit-for-bit from the same
    // fixed-point sums
    val traceFp = (0 until d).map { i =>
      BigInt(stats((i + 1, i + 1))) * BigInt(1000000) * BigInt(nL) -
        BigInt(stats((0, i + 1))) * BigInt(stats((0, i + 1)))
    }.sum
    val trace = traceFp.toDouble / 1e18 / n / n
    def matVec(m: Array[Array[Double]], v: Array[Double]): Array[Double] =
      Array.tabulate(d)(r => {
        var s = 0.0; var c = 0
        while (c < d) { s += m(r)(c) * v(c); c += 1 }; s
      })
    def dotD(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < d) { s += a(i) * b(i); i += 1 }; s
    }
    def normalize(v: Array[Double]): Array[Double] = {
      val nn = math.sqrt(v.map(x => x * x).sum)
      if (nn == 0.0) v else v.map(_ / nn)
    }
    val work = cov.map(_.clone())
    val comps = new Array[Array[Double]](k)
    val eigs = new Array[Double](k)
    (0 until k).foreach { c =>
      // re-orthogonalize against the accepted components every iteration
      // (orthogonal iteration): deflation alone leaves O(gap⁻¹) cross-talk
      // on near-degenerate spectra — real embedding corpora are close to
      // isotropic, so the gaps ARE tiny
      def orth(v: Array[Double]): Array[Double] = {
        val out = v.clone()
        var p = 0
        while (p < c) {
          val proj = dotD(out, comps(p))
          var i = 0
          while (i < d) { out(i) -= proj * comps(p)(i); i += 1 }
          p += 1
        }
        out
      }
      var v = normalize(orth(
        Array.tabulate(d)(i => if (i == c) 1.0 else 1e-4)))
      (0 until iters).foreach { _ => v = normalize(orth(matVec(work, v))) }
      // sign convention
      val m = v.indices.maxBy(i => math.abs(v(i)))
      val vv = if (v(m) < 0) v.map(x => -x) else v
      // deflate: work -= λ vvᵀ
      val lam = {
        val av = matVec(work, vv)
        vv.zip(av).map { case (a, b) => a * b }.sum
      }
      for (r <- 0 until d; cc <- 0 until d) work(r)(cc) -= lam * vv(r) * vv(cc)
      comps(c) = vv
      eigs(c) = lam
    }
    PcaModel(mean, comps, eigs, trace, nL)
  }

  private def projectWith(df: DataFrame, id: Column, vec: Column,
      mean: Array[Double], comps: Array[Array[Double]]): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast((mean, comps))
    val project = udf((v: Seq[Float]) => {
      val (mu, cs) = bc.value
      cs.map { comp =>
        var s = 0.0; var i = 0
        while (i < mu.length) { s += (v(i).toDouble - mu(i)) * comp(i); i += 1 }
        s
      }.toSeq
    })
    df.select(id.as("id"), vec.cast("array<float>").as("v"))
      .select(col("id"), project(col("v")).as("pc"))
  }

  /** PCA whitening: project onto the top-k basis and scale component c by
    * 1/√(λ_c + eps), so the output coordinates have (near-)unit variance —
    * the standard preprocessing before cosine-based semantic dedup and
    * ANN quantization (decorrelated, isotropic space).  Same distributed
    * shape as [[pcaProject]]: one stats pass + one broadcast projection. */
  def pcaWhiten(df: DataFrame, id: Column, vec: Column, d: Int, k: Int,
      iters: Int = 100, eps: Double = 1e-9): DataFrame =
    pcaWhitenWith(df, id, vec, pcaFit(df, vec, d, k, iters), eps)

  /** [[pcaWhiten]] against an already-fitted [[PcaModel]] — the form for
    * callers that fit once and whiten many frames (shards, streams, or a
    * gauge that also inspects the model), avoiding a refit per call. */
  def pcaWhitenWith(df: DataFrame, id: Column, vec: Column, m: PcaModel,
      eps: Double = 1e-9): DataFrame = {
    val scaled = m.components.zip(m.eigenvalues).map { case (comp, lam) =>
      val s = 1.0 / math.sqrt(math.max(lam, 0.0) + eps)
      comp.map(_ * s)
    }
    projectWith(df, id, vec, m.mean, scaled)
  }
}
