package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction over a text column.
  *
  * Training-data pipelines scrub personally-identifiable information before
  * anything else touches the corpus (the reference ships the same
  * scan-then-transform hook surface; reference: src/scdataset/scdataset.py
  * hook pipeline).  Here the detectors are pure codegen'd regexp columns —
  * no UDF, no shuffle, fully pushdown-compatible — so a 100 TB scrub is a
  * single narrow map over the scan.
  *
  * The regex dialect is the intersection of Java `util.regex` (Spark) and
  * RE2 (DuckDB/CockroachDB et al.): character classes, bounded repetition,
  * `\b`, non-capturing groups — no backreferences, no lookaround — so the
  * exact same patterns run in the SQL oracle.
  */
object PiiOps {

  /** RFC-5322-ish practical email matcher (the full grammar is not regular;
    * this is the form every major scrubber uses). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (no octet-range check — scrubbers over-redact). */
  val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** International-prefix phone numbers: +C[C] NNN-NNN-NNNN with space/dot/
    * dash separators and optional parens around the area code. */
  val PhoneRe = "\\+\\d{1,2}[ .-]?\\(?\\d{3}\\)?[ .-]\\d{3}[ .-]\\d{4}"

  /** Sentinels in redaction order: emails first (their domains contain
    * dots that the IPv4 matcher must not see), then phones, then IPs. */
  val Redactions: Seq[(String, String)] = Seq(
    EmailRe -> "<EMAIL>", PhoneRe -> "<PHONE>", Ipv4Re -> "<IP>")

  /** Per-row match counts for one pattern (null text counts 0 — `size`
    * over a null extract list is null/-1 depending on the legacy flag,
    * never what a count column should carry). */
  def countMatches(text: Column, pattern: String): Column =
    when(text.isNull, lit(0L))
      .otherwise(size(regexp_extract_all(text, lit(pattern), lit(0)))
        .cast("long"))

  /** Match counts per category, each taken against the text AFTER every
    * earlier category's sentinels were substituted — exactly the cascade
    * [[redact]] applies, so one substring is never double-counted across
    * categories (in `a@1.2.3.4.com` the dotted quad is part of the email,
    * and the IPv4 matcher never sees it).  Returned keyed by sentinel, in
    * [[Redactions]] order. */
  private def stagedCounts(text: Column): Map[String, Column] = {
    val (counts, _) = Redactions.foldLeft(
      (Map.empty[String, Column], text)) {
      case ((m, cur), (pat, sub)) =>
        (m + (sub -> countMatches(cur, pat)),
          regexp_replace(cur, lit(pat), lit(sub)))
    }
    counts
  }

  /** (id, n_emails, n_ipv4, n_phones, has_pii) per document, counted
    * against the progressively-redacted text (see [[stagedCounts]]) so the
    * numbers agree with what [[redact]] substitutes.  One narrow
    * projection; Catalyst prunes the scan to (id, text). */
  def scan(df: DataFrame, text: Column, idCol: Column): DataFrame = {
    val c = stagedCounts(text)
    df.select(
      idCol.as("doc_id"),
      c("<EMAIL>").as("n_emails"),
      c("<IP>").as("n_ipv4"),
      c("<PHONE>").as("n_phones"))
      .withColumn("has_pii",
        col("n_emails") + col("n_ipv4") + col("n_phones") > 0)
  }

  /** Text with every PII match replaced by its sentinel, applied in
    * [[Redactions]] order.  Still a single narrow projection. */
  def redact(df: DataFrame, text: Column, idCol: Column): DataFrame = {
    val clean = Redactions.foldLeft(text) { case (c, (pat, sub)) =>
      regexp_replace(c, lit(pat), lit(sub))
    }
    df.select(idCol.as("doc_id"), clean.as("clean_text"))
  }

  /** Documents whose PII density passes: at most `maxMatches` total PII
    * hits (0 = drop any document containing PII), counted with the same
    * cascade as [[scan]]. */
  def filter(df: DataFrame, text: Column, maxMatches: Long = 0L): DataFrame = {
    val c = stagedCounts(text)
    df.where(c("<EMAIL>") + c("<IP>") + c("<PHONE>") <= maxMatches)
  }

  /** Differentially-private count release: per-group counts with Laplace
    * (sensitivity 1 / ε) noise via the inverse CDF — the
    * privacy-preserving form of a group-by census for stats shared outside
    * the data boundary.  ε is the privacy budget (smaller = noisier).
    *
    * The noise uniform is [[graft.core.Rng.Md5]] over (seed, group), so
    * the release is reproducible for the correctness oracle and stable
    * under task retry; a PRODUCTION release must draw fresh true
    * randomness per publication instead (determinism across releases
    * would let an observer cancel the noise).  One map-side-combinable
    * aggregate; the noise arithmetic is per-GROUP (dimension-sized). */
  def dpNoisyCounts(df: DataFrame, group: Column, epsilon: Double,
      seed: Long): DataFrame = {
    require(epsilon > 0, "epsilon must be positive")
    val b = 1.0 / epsilon
    val counts = df.groupBy(group.as("grp")).agg(count(lit(1)).as("n"))
    val u = graft.core.Rng.Md5.uniform(seed, "dp", col("grp"))
    val v = u - lit(0.5)
    val noise = -lit(b) * signum(v) * log(lit(1.0) - lit(2.0) * abs(v))
    counts.select(col("grp"), round(col("n") + noise, 6).as("noisy_n"))
  }

  /** k-anonymity audit over quasi-identifier columns (Sweeney 2002):
    * one row per equivalence class (the distinct quasi-identifier
    * combination) with its size and whether it violates k — a class
    * smaller than k re-identifies its members by the quasi-identifiers
    * alone.  One map-side-combined aggregation; nulls form their own
    * class (a null quasi value still links records).  Output:
    * (quasi..., class_size, violates_k). */
  def kAnonymityAudit(df: DataFrame, quasi: Seq[Column],
      k: Int): DataFrame = {
    require(quasi.nonEmpty && k >= 1)
    df.groupBy(quasi: _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("violates_k", col("class_size") < k)
  }

  /** l-diversity audit (Machanavajjhala 2007): per equivalence class,
    * the number of DISTINCT sensitive values — a k-anonymous class
    * whose sensitive attribute is constant still leaks it (homogeneity
    * attack).  Distinct-count is exact (count_distinct, map-side
    * partials).  Output: (quasi..., class_size, distinct_sensitive,
    * diverse_l). */
  def lDiversityAudit(df: DataFrame, quasi: Seq[Column],
      sensitive: Column, l: Int): DataFrame = {
    require(quasi.nonEmpty && l >= 1)
    df.groupBy(quasi: _*)
      .agg(count(lit(1)).as("class_size"),
        count_distinct(sensitive).as("distinct_sensitive"))
      .withColumn("diverse_l", col("distinct_sensitive") >= l)
  }
}
