package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters (Spark 4
  * moved `Column.expr` behind the ColumnNode abstraction).  Together with
  * graft.sources.LakeFileIndex (which implements the execution-side
  * `FileIndex` listing contract), this is the only place the project
  * reaches into Spark internals; everything else uses the public API. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Builds a DataFrame from InternalRows without the external-Row
    * conversion round-trip (`createDataFrame(RDD[Row])` converts every
    * value through type converters; rank/cumsum run on every sampling
    * query, so the constant factor matters). */
  def internalDF(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)

  /** Builds a DataFrame over a custom LogicalPlan (the entry point for
    * whole-operator plan nodes like graft.plans.AsOfJoin). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Builds a parquet-backed DataFrame over a caller-supplied
    * [[org.apache.spark.sql.execution.datasources.FileIndex]] — the
    * entry point for listing-level data skipping (the planner hands its
    * pushed data filters to `FileIndex.listFiles`, so the index decides
    * which files exist for this query; see graft.sources.LakeFileIndex). */
  def parquetTable(spark: SparkSession,
      index: execution.datasources.FileIndex,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val relation = execution.datasources.HadoopFsRelation(
      index, new org.apache.spark.sql.types.StructType(), schema, None,
      new execution.datasources.parquet.ParquetFileFormat(),
      Map.empty[String, String])(cs)
    classic.Dataset.ofRows(cs,
      execution.datasources.LogicalRelation(relation, false))
  }

  /** The ANALYZED catalyst form of `predicate` against `df`'s schema —
    * resolved `AttributeReference`s and catalyst comparison nodes, not
    * the lazy ColumnNode wrappers `expression(Column)` returns in
    * Spark 4 (those read as "unsupported shape" to interval logic like
    * LakeFileIndex.mayMatch).  Falls back to a literal TRUE (the
    * conservative "could match anything") if no Filter node is found. */
  def analyzedCondition(df: DataFrame, predicate: Column): Expression =
    df.filter(predicate).asInstanceOf[classic.Dataset[_]]
      .queryExecution.analyzed.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition
      }.getOrElse(
        org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral)

  /** Spark's own schema union (`StructType.merge` is `private[sql]`):
    * nested-struct aware, type-conflict checked — the semantics
    * `spark.read.option("mergeSchema", true)` uses. */
  def mergeSchemas(a: org.apache.spark.sql.types.StructType,
      b: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType = a.merge(b)

  /** Executor-side parquet row reader for a caller-scheduled file split —
    * the reading half of a custom DSv2 source (graft.sources
    * .LakeStreamSource schedules lake commit files as input partitions
    * and reads them through this).  Built once on the driver (it
    * captures a broadcast Hadoop conf); the returned function is
    * serializable and called per `PartitionedFile` on executors.  The
    * vectorized reader hands back `ColumnarBatch`es disguised as rows
    * (FileSourceScanExec's private contract), so the wrapper flattens
    * them to `InternalRow`s. */
  def parquetReadFunc(spark: SparkSession,
      dataSchema: org.apache.spark.sql.types.StructType)
      : execution.datasources.PartitionedFile =>
        Iterator[org.apache.spark.sql.catalyst.InternalRow] = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val fmt = new execution.datasources.parquet.ParquetFileFormat()
    val conf = cs.sessionState.newHadoopConfWithOptions(Map.empty)
    val f = fmt.buildReaderWithPartitionValues(cs, dataSchema,
      new org.apache.spark.sql.types.StructType(), dataSchema, Nil,
      // rows, not ColumnarBatches: the DSv2 PartitionReader contract
      // here is row-based (the flatten below is belt-and-braces)
      Map(execution.datasources.FileFormat.OPTION_RETURNING_BATCH ->
        "false"), conf)
    pf => f(pf).asInstanceOf[Iterator[Any]].flatMap {
      case b: org.apache.spark.sql.vectorized.ColumnarBatch =>
        scala.jdk.CollectionConverters.IteratorHasAsScala(b.rowIterator())
          .asScala
      case r =>
        Iterator.single(
          r.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])
    }
  }
}
