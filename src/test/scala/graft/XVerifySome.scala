package graft
import org.apache.spark.sql.SparkSession
/** Scratch (test scope): dump a subset of SparkEntry.queries + their oracle
  * SQL for a targeted DuckDB compare.  Run:
  *   sbt 'Test/runMain graft.XVerifySome <outDir> <name>...' */
object XVerifySome {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val names = args.drop(1)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val sfDir = sys.env.getOrElse("XVERIFY_SF", "/root/testdata/sf0.01")
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      graft.core.CacheScope.release()
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString } + "\""
    val json = names.map(n => s"${q(s"$n.parquet")}: ${q(SparkEntry.oracleSql(n))}")
      .mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
