package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The persisted-dedup-index pattern, extracted from the MinHash triad so
  * every banding tier (MinHash bands, winnow fingerprints, SimHash bands)
  * shares one write/validate/append surface:
  *
  *  - an index is a parquet directory holding the tier's per-document key
  *    table (whatever the tier joins on to find candidates);
  *  - the hashing PARAMETERS that produced the keys are persisted beside
  *    the data in `_graft_params` (underscore prefix: invisible to parquet
  *    directory reads).  Keys hashed under different parameters never
  *    collide, which silently reads as "no duplicates" — so every reader
  *    validates parameters FIRST and fails loudly on mismatch;
  *  - appends re-validate, then add the new shard's keys with
  *    mode(append) — no rewrite of the existing index.
  *
  * At 100 TB the index is the small side: per-document keys only (a few
  * dozen bytes/doc), scanned map-side against a broadcast shard table in
  * the steady state of continuous ingestion (see
  * [[DedupOps.minhashCandidatesAgainst]]).
  */
object PersistedIndex {

  /** Write `table` as a fresh index at `dir` with its named integer
    * parameters. */
  def write(table: DataFrame, dir: String, params: Seq[(String, Int)]): Unit = {
    table.write.mode("overwrite").parquet(dir)
    val spark = table.sparkSession
    import spark.implicits._
    params.toDF("param", "value").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/_graft_params")
  }

  /** Marker present while a [[compact]] swap is in flight.  A crash
    * mid-swap leaves it behind, and every subsequent parameter
    * validation fails loudly instead of reading a half-swapped
    * (duplicated or partial) key table — a partial index silently
    * reads as "no duplicates", the exact failure mode the parameter
    * check exists to prevent. */
  private def compactingMarker(dir: String) =
    new org.apache.hadoop.fs.Path(dir.stripSuffix("/"), "_graft_compacting")

  private def requireNoCrashedCompaction(
      fs: org.apache.hadoop.fs.FileSystem, dir: String): Unit =
    require(!fs.exists(compactingMarker(dir)),
      s"index at $dir carries a _graft_compacting marker: a compaction " +
        "crashed mid-swap and the data files may be duplicated or " +
        "partial — rebuild the index from its source before reading it")

  /** Fail loudly unless the index at `dir` was written with exactly
    * `params` (same names, same values), and no compaction swap died
    * midway through rewriting its data files. */
  def requireParams(spark: SparkSession, dir: String,
      params: Seq[(String, Int)]): Unit = {
    val path = new org.apache.hadoop.fs.Path(dir)
    requireNoCrashedCompaction(
      path.getFileSystem(spark.sessionState.newHadoopConf()), dir)
    val stored = spark.read.parquet(s"$dir/_graft_params").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val passed = params.toMap
    require(stored == passed,
      s"index at $dir was built with $stored; caller passed $passed — " +
        "keys hashed under different parameters never collide (reads as " +
        "'no duplicates'), so the parameters must match exactly")
  }

  /** Append a shard's key table to an existing index after validating the
    * parameters it was hashed with. */
  def append(table: DataFrame, dir: String, params: Seq[(String, Int)]): Unit = {
    requireParams(table.sparkSession, dir, params)
    table.write.mode("append").parquet(dir)
  }

  /** Data (part) files currently in the index directory — the
    * fragmentation measure the retention policy acts on. */
  def dataFileCount(spark: SparkSession, dir: String): Int = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(path)) 0
    else fs.listStatus(path).count(_.getPath.getName.startsWith("part-"))
  }

  /** COMPACT an index that has fragmented under continuous [[append]]
    * ingest: rewrite the key table into `targetFiles` files, preserving
    * `_graft_params` (underscore paths are invisible to the directory
    * read, so the rewrite never touches them) and validating the
    * parameters first when given.  A year of ingest loops otherwise
    * leaves thousands of tiny append files, and at 100 TB the index
    * scan cost is dominated by file-open overhead, not bytes — the
    * same rot the lake tier's OPTIMIZE pass fixes
    * ([[LayoutOps.compactSnapshot]]), applied to the plain-parquet
    * index layout.  SINGLE-WRITER contract (the ingest-loop discipline:
    * compaction runs between catch-ups, never concurrently with a
    * reader of the same index — the lake tier is the tool when
    * concurrent readers need snapshot isolation). */
  def compact(spark: SparkSession, dir: String,
      params: Seq[(String, Int)] = Nil, targetFiles: Int = 1): Unit = {
    require(targetFiles > 0, "bad targetFiles")
    if (params.nonEmpty) requireParams(spark, dir, params)
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(path), s"no index at $dir")
    requireNoCrashedCompaction(fs, dir)
    val tmp = new org.apache.hadoop.fs.Path(dir.stripSuffix("/") +
      "__compacting")
    if (fs.exists(tmp))
      require(fs.delete(tmp, true), s"could not clear stale $tmp")
    spark.read.parquet(dir).repartition(targetFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    // swap under a marker, checking every FileSystem boolean (the Hadoop
    // contract REPORTS failure through the return value — an unchecked
    // false rename after the old files were dropped would silently
    // destroy the index).  Order: marker up, rewritten files IN (part
    // names are UUID-unique, so renames cannot collide with the old
    // files), old files OUT, marker down — any crash between marker
    // up/down is caught by requireNoCrashedCompaction at the next read.
    val oldData = fs.listStatus(path).filter { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
    fs.create(compactingMarker(dir), true).close()
    fs.listStatus(tmp)
      .filter(_.getPath.getName.startsWith("part-"))
      .foreach { st =>
        val dst = new org.apache.hadoop.fs.Path(path, st.getPath.getName)
        require(fs.rename(st.getPath, dst),
          s"compaction rename ${st.getPath} -> $dst failed")
      }
    oldData.foreach(st => require(fs.delete(st.getPath, false),
      s"compaction could not delete old data file ${st.getPath}"))
    require(fs.delete(compactingMarker(dir), false),
      s"could not clear the compaction marker under $dir")
    require(fs.delete(tmp, true), s"could not clear $tmp")
  }

  /** The retention policy a continuously-appending ingest loop calls
    * after each catch-up: compact only once the index has fragmented
    * past `maxFiles` data files (the [[LayoutOps.maybeCompact]]
    * amortization argument: with roughly-equal batches each key is
    * rewritten every `maxFiles` appends, keeping rewrite cost a small
    * multiple of ingest cost).  Returns true when a compaction ran. */
  def maybeCompact(spark: SparkSession, dir: String,
      params: Seq[(String, Int)] = Nil, maxFiles: Int = 64,
      targetFiles: Int = 1): Boolean = {
    val frag = dataFileCount(spark, dir)
    if (frag <= maxFiles) false
    else { compact(spark, dir, params, targetFiles); true }
  }
}
