package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, retry-safe pseudo-randomness derived from data + seed.
  *
  * The reference engine threads a NumPy RNG through every strategy
  * (reference: src/scdataset/strategy.py:150-180) and derives epoch seeds as
  * `base + 1000*epoch` (reference: src/scdataset/scdataset.py:472-478).  On
  * Spark, `rand()` is re-evaluated on task retry and under speculative
  * execution, so ALL randomness here is a pure function of (seed, tag,
  * row-identifying columns) — plans stay deterministic under retries and
  * identical across epochs with the same seed.
  *
  * Two interchangeable implementations:
  *  - [[Rng.Xx]]  — xxhash64-based, codegen'd, production default.
  *  - [[Rng.Md5]] — md5-hex based; its sort keys and uniforms are exactly
  *    reproducible in ANSI SQL (DuckDB et al.), used for oracle-checked
  *    queries. md5 hex ordering and `('0x'||hex)::bigint` conversion agree
  *    across engines.
  */
sealed trait Rng extends Serializable {

  /** Orderable deterministic pseudo-random key (uniformly shuffles rows when
    * used as a sort key). Collisions are broken by callers with a stable
    * tiebreaker column. */
  def sortKey(seed: Long, tag: String, cols: Column*): Column

  /** Deterministic uniform double in [0, 1). */
  def uniform(seed: Long, tag: String, cols: Column*): Column

  /** Driver-side scalar uniform in [0,1) for (seed, tag).  For [[Rng.Md5]]
    * this equals `uniform(seed, tag)` with no data columns (bit-exact,
    * oracle-reproducible).  For [[Rng.Xx]] it is an INDEPENDENT deterministic
    * stream (MurmurHash3-based) — callers must not assume column/scalar
    * equivalence there. */
  def scalarUniform(seed: Long, tag: String): Double
}

object Rng {

  /** Production RNG: xxhash64 over (tag, seed, cols). Whole-stage-codegen
    * friendly, one hash per row. */
  case object Xx extends Rng {
    private def h(seed: Long, tag: String, cols: Seq[Column]): Column =
      xxhash64((lit(tag) +: lit(seed) +: cols): _*)
    def sortKey(seed: Long, tag: String, cols: Column*): Column =
      h(seed, tag, cols)
    def uniform(seed: Long, tag: String, cols: Column*): Column =
      // top 53 bits of the unsigned hash → exact double in [0,1)
      shiftrightunsigned(h(seed, tag, cols), 11).cast("double") / lit(9007199254740992.0)
    def scalarUniform(seed: Long, tag: String): Double = {
      // XXH64 of the UTF-8 concat is not worth replicating driver-side;
      // derive from a stable JVM hash instead (only used for offsets).
      val x = scala.util.hashing.MurmurHash3.stringHash(s"$tag:$seed").toLong & 0xffffffffL
      x / 4294967296.0
    }
  }

  /** Oracle-parity RNG: keys are md5 hex strings of a ':'-joined key string;
    * uniforms are the first 8 hex chars as a 32-bit integer / 2^32.  Both are
    * reproducible in DuckDB SQL:
    *   sortKey  ≡ md5(concat_ws(':', tag, seed, cols...))
    *   uniform  ≡ ('0x' || substr(md5(...), 1, 8))::BIGINT / 4294967296.0
    * (Spark side uses conv(hex,16,10) for the same conversion.)
    */
  case object Md5 extends Rng {
    private def key(seed: Long, tag: String, cols: Seq[Column]): Column =
      concat_ws(":", (lit(tag) +: lit(seed.toString) +: cols.map(_.cast("string"))): _*)
    def sortKey(seed: Long, tag: String, cols: Column*): Column =
      md5(key(seed, tag, cols))
    def uniform(seed: Long, tag: String, cols: Column*): Column =
      conv(substring(md5(key(seed, tag, cols)), 1, 8), 16, 10).cast("long") / lit(4294967296.0)
    def scalarUniform(seed: Long, tag: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$tag:$seed".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) / 4294967296.0
    }

    /** The DuckDB SQL text equivalent of [[uniform]], for oracle queries. */
    def uniformSql(seed: Long, tag: String, colsSql: Seq[String]): String = {
      val key = (s"'$tag'" +: s"'$seed'" +: colsSql.map(c => s"($c)::VARCHAR"))
        .mkString("concat_ws(':', ", ", ", ")")
      s"(('0x' || substr(md5($key), 1, 8))::BIGINT / 4294967296.0)"
    }

    /** The DuckDB SQL text equivalent of [[sortKey]]. */
    def sortKeySql(seed: Long, tag: String, colsSql: Seq[String]): String = {
      val key = (s"'$tag'" +: s"'$seed'" +: colsSql.map(c => s"($c)::VARCHAR"))
        .mkString("concat_ws(':', ", ", ", ")")
      s"md5($key)"
    }
  }
}
