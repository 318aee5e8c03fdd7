package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.Portable._

/** Text-analysis operators for the LLM-data pipeline surface
  * (BASELINE.json north star): token statistics, quality scoring,
  * language identification, and document fingerprinting over the
  * `documents` table.
  *
  * All operators are per-row scalar expression chains — no shuffle; at
  * 100 TB they pipeline inside the scan stage. Each has a DuckDB-dialect
  * twin generated from the same constants (see Portable).
  */
object TextAnalysis {

  /** Stopword profiles for the n-gram/stopword language-ID heuristic.
    * Tiny on purpose — the heuristic is the operator; real deployments
    * swap in larger profiles. Order = tie-break priority. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "de", "y", "que", "en"),
    "fr" -> Seq("le", "la", "de", "et", "les", "un"))

  /** Count of tokens contained in a fixed set. */
  def countIn(toks: Column, set: Seq[String]): Column =
    size(filter(toks, t => t.isin(set: _*))).cast("long")
  def countInSql(toks: String, set: Seq[String]): String = {
    val lst = set.map(s => s"'$s'").mkString(", ")
    s"len(list_filter($toks, t -> list_contains([$lst], t)))::BIGINT"
  }

  /** Sum of token lengths (for mean-token-length). */
  def tokenLenSum(toks: Column): Column =
    sumFold(transform(toks, t => length(t).cast("long")))
  def tokenLenSumSql(toks: String): String =
    sumFoldSql(s"list_transform($toks, t -> length(t)::BIGINT)")

  /** Language-ID argmax with deterministic tie-break (profile order wins). */
  def langScores(toks: Column): Seq[(String, Column)] =
    LangProfiles.map { case (lang, set) => lang -> countIn(toks, set) }

  def langPick(scores: Seq[(String, Column)]): Column = {
    // first profile whose score is >= all later ones and > 0, else "und"
    def chain(rest: Seq[(String, Column)]): Column = rest match {
      case (lang, s) +: tail =>
        val geAll = tail.map { case (_, t) => s >= t }
          .foldLeft(s > 0)(_ && _)
        when(geAll, lit(lang)).otherwise(chain(tail))
      case _ => lit("und")
    }
    chain(scores)
  }
  def langPickSql(scoreExpr: String => String): String = {
    val names = LangProfiles.map(_._1)
    val cases = names.zipWithIndex.map { case (lang, i) =>
      val s = scoreExpr(lang)
      val conds = (s"$s > 0") +: names.drop(i + 1).map(o => s"$s >= ${scoreExpr(o)}")
      s"WHEN ${conds.mkString(" AND ")} THEN '$lang'"
    }
    s"CASE ${cases.mkString(" ")} ELSE 'und' END"
  }

  /** Quality score ∈ [0,1]: length term + stopword-density term + size-band
    * term. Fixed left-associated double arithmetic (deterministic).
    * Zero-token documents score 0.0 — dividing by nTok unguarded would
    * raise DIVIDE_BY_ZERO under Spark 4's default ANSI mode and NaN-diverge
    * from the DuckDB oracle. */
  def qualityScore(nTok: Column, stopN: Column, nChars: Column): Column =
    when(nTok > 0,
      least(lit(1.0), nTok.cast("double") / lit(200.0)) * lit(0.5) +
        least(lit(1.0), stopN.cast("double") * lit(10.0) / nTok.cast("double")) * lit(0.3) +
        when(nChars.between(100, 2000), lit(0.2)).otherwise(lit(0.0)))
      .otherwise(lit(0.0))
  def qualityScoreSql(nTok: String, stopN: String, nChars: String): String =
    s"CASE WHEN $nTok > 0 THEN " +
      s"least(1.0::DOUBLE, CAST($nTok AS DOUBLE) / 200.0) * 0.5 + " +
      s"least(1.0::DOUBLE, CAST($stopN AS DOUBLE) * 10.0 / CAST($nTok AS DOUBLE)) * 0.3 + " +
      s"(CASE WHEN $nChars BETWEEN 100 AND 2000 THEN 0.2::DOUBLE ELSE 0.0::DOUBLE END) " +
      s"ELSE 0.0::DOUBLE END"

  /** Document fingerprint: rolling char hash of the whole text (portable
    * replacement for a 64-bit content hash). */
  def fingerprint(text: Column): Column = charFold(text)
  def fingerprintSql(e: String): String = charFoldSql(e)

  /** PII detection patterns (q57) — a deliberately simple, cross-engine
    * subset (Java regex ∩ RE2: no backreferences or lookaround). Real
    * deployments extend the pattern set; the scrub/count plumbing is the
    * operator. */
  val PiiEmailRe = "[a-z0-9._]+@[a-z0-9.]+"
  val PiiPhoneRe = "555-[0-9]{4}"
}
