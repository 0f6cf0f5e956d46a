package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The Spark analogue of the reference's "indexable collection" — any object
  * with `__len__` + positional batched `__getitem__`
  * (reference: src/scdataset/scdataset.py:33-36).  Here a collection is a
  * DataFrame carrying a stable, contiguous 0-based `rowId` column; all
  * sampling strategies address rows positionally through it.
  *
  * `unstructured` mirrors MultiIndexable's non-row-aligned metadata that
  * passes through row subsetting unchanged
  * (reference: src/scdataset/multiindexable.py:244-287).
  *
  * A multi-modal record (reference: src/scdataset/multiindexable.py:20) is
  * simply a multi-column DataFrame — modality alignment is by construction,
  * column selection is `select`, row subsetting is `filter`.
  */
final case class ScCollection(
    df: DataFrame,
    rowId: String = ScCollection.RowId,
    unstructured: Map[String, String] = Map.empty,
    /** True while rowId is known to still be the contiguous 0-based rank
      * (holds from the constructors and under select/limit/union; broken by
      * where/subset).  Strategies skip an entire re-rank — a full sort +
      * zipWithIndex pass — when this holds. */
    contiguous: Boolean = true,
    /** Cardinality-equivalent frame to count instead of `df`.  Ranking
      * preserves cardinality, so constructors point this at the PRE-rank
      * scan: counting it is a parquet metadata read, while counting the
      * ranked frame would re-execute the whole rank sort. */
    countFrom: Option[DataFrame] = None) {

  @transient private lazy val cachedCount: Long =
    countFrom.getOrElse(df).count()

  /** Exact row count (cached — used by batch-count formulas). */
  def length: Long = cachedCount

  /** Column projection (reference P1/P2): keeps rowId. */
  def select(cols: String*): ScCollection =
    copy(df = df.select((rowId +: cols).distinct.map(col): _*))

  /** Row subsetting by predicate. Row ids are NOT re-ranked — strategies
    * re-rank internally, mirroring the reference's `indices=` parameter
    * (reference: src/scdataset/strategy.py:65-116). */
  def where(pred: Column): ScCollection =
    copy(df = df.where(pred), contiguous = false, countFrom = None)

  /** Row subsetting by an id table (large subsets: shuffle-free if idsDf is
    * broadcastable, left-semi join otherwise). */
  def subset(idsDf: DataFrame, idCol: String): ScCollection =
    copy(df = df.join(idsDf.select(col(idCol).as(rowId)), Seq(rowId), "left_semi"),
      contiguous = false, countFrom = None)

  /** Pilot mode — first n rows by rowId (reference P5:
    * training_experiments/data/loader.py:159-169). */
  def limit(n: Int): ScCollection =
    copy(df = df.orderBy(col(rowId)).limit(n), countFrom = None)

  /** Prepare-once, in-memory: persist the ranked frame so the rank sort
    * runs once per session instead of once per epoch/query — the cache
    * analogue of [[materialize]] for working sets that fit the cluster
    * cache (MEMORY_AND_DISK: spills, never OOMs).  Mirrors the reference's
    * usage shape: the collection is opened once and every epoch iterates
    * over the same handle (reference: benchmarks/evaluate_scdataset.py:70-93). */
  def cached(): ScCollection =
    copy(df = df.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Prepare-once materialization: write the ranked collection as parquet
    * (rowId-range-ordered files) and reopen it.  Positional access on the
    * reopened collection is a plain parquet scan with rowId predicate
    * pushdown — the one-time rank cost is paid once per dataset, not once
    * per epoch/query.  This is the intended 100 TB deployment shape. */
  def materialize(dir: String): ScCollection = {
    df.repartitionByRange(df.sparkSession.sparkContext.defaultParallelism,
        col(rowId))
      .write.mode("overwrite").parquet(dir)
    copy(df = df.sparkSession.read.parquet(dir))
  }
}

object ScCollection {
  val RowId = "row_id"

  /** Reads a parquet table and attaches a contiguous rowId ranked by
    * `orderBy` (a unique natural key — deterministic across engines and
    * runs, unlike file-position ids). */
  def fromParquet(spark: SparkSession, path: String, orderBy: Seq[String],
                  columns: Seq[String] = Nil): ScCollection = {
    var df = spark.read.parquet(path)
    if (columns.nonEmpty) df = df.select((orderBy ++ columns).distinct.map(col): _*)
    fromDataFrame(df, orderBy.map(col): _*)
  }

  /** [[fromParquet]] as a prepare-once session handle: the ranked frame is
    * persisted (caller-owned), so the rank sort stops executing once the
    * cache fills and every epoch/query thereafter reads the ranked cache.
    * (Measured alternative: also persisting the pre-zip SORTED frame costs
    * more than the one re-sort it saves — a wide columnar cache build is
    * dearer than a reduce-side merge sort.)  The reference's open-once
    * usage shape. */
  def fromParquetCached(spark: SparkSession, path: String,
                        orderBy: Seq[String],
                        columns: Seq[String] = Nil): ScCollection =
    fromParquet(spark, path, orderBy, columns).cached()

  /** Wraps a DataFrame, attaching the contiguous rowId.  The unranked
    * input is kept as the count source: ranking preserves cardinality and
    * counting a raw scan is metadata-cheap, while counting the ranked
    * frame would re-run the rank sort. */
  def fromDataFrame(df: DataFrame, orderBy: Column*): ScCollection =
    ScCollection(Ranker.withRank(df, RowId, orderBy: _*), countFrom = Some(df))

  /** Generic source adapter (S3/S5 analogue): any Spark DataSource format
    * (csv, json, orc, parquet, custom) becomes an indexable collection —
    * the counterpart of the reference's per-format adapters
    * (reference: src/scdataset/transforms.py), except the format zoo is
    * Spark's reader registry instead of hand-written glue. */
  def fromSource(spark: SparkSession, path: String, format: String,
      orderBy: Seq[String],
      options: Map[String, String] = Map.empty): ScCollection =
    fromDataFrame(
      spark.read.format(format).options(options).load(path),
      orderBy.map(col): _*)

  /** A BioNeMo-style CSR memmap directory (data/indices/indptr `.npy`)
    * as an indexable collection — the reference's third format adapter
    * (reference src/scdataset/transforms.py:267-302), read through
    * [[graft.sources.NpySource.readCsrDir]]'s distributed range reader
    * into the (cell_id, genes, expressions) schema and ranked on
    * cell_id.  `cell_id` is already positional in the memmap, so the
    * rank is an identity re-label, not a reorder. */
  def fromCsrNpy(spark: SparkSession, dir: String,
      slices: Int = 0): ScCollection = {
    val cells = graft.sources.NpySource.readCsrDir(spark, dir, slices)
    // the row count is free driver-side (indptr header: rows+1 entries) —
    // counting the reader frame would re-slurp every CSR byte just to
    // count, so give `length` a metadata-only frame instead
    val rows = graft.sources.NpySource
      .header(spark, s"$dir/indptr.npy").rows - 1
    ScCollection(Ranker.withRank(cells, RowId, col("cell_id")),
      countFrom = Some(spark.range(rows).toDF("n")))
  }

  /** Ordered union of per-file collections with per-file rowId offsets —
    * the AnnCollection analogue (reference:
    * benchmarks/evaluate_scdataset.py:70-78: ordered concatenation of
    * backed files). Each part keeps its source id in `fileCol`. */
  def union(parts: Seq[(String, DataFrame)], orderBy: Seq[Column],
            fileCol: String = "source_file"): ScCollection = {
    require(parts.nonEmpty, "union of zero collections")
    var offset = 0L
    val ranked = parts.map { case (name, df) =>
      val r = Ranker.withRank(df.withColumn(fileCol, lit(name)), RowId, orderBy: _*)
        .withColumn(RowId, col(RowId) + lit(offset))
      offset += df.count()
      r
    }
    ScCollection(ranked.reduce(_ unionByName _))
  }
}
