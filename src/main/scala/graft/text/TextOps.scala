package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID heuristic, fingerprinting.
  * All pure Column arithmetic/builtins (whole-stage codegen), each with a
  * textually-mirrored DuckDB oracle. */
object TextOps {

  /** Whitespace tokens of trimmed text. The separator class is spelled
    * explicitly — exactly Java's ASCII \s — because Java \s and RE2 \s
    * disagree on \x0B (the same cross-engine trap [[BpeTokenRegex]]
    * documents); the explicit class makes Spark and DuckDB split
    * identically on any input. */
  val WsClass: String = "[ \\t\\n\\r\\f\\x0B]+"
  def tokens(text: Column): Column = split(trim(text), WsClass)
  def tokensSql(e: String): String = s"regexp_split_to_array(trim($e), '$WsClass')"

  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Quality metrics per document (length/token/punct/stopword features used
    * by pretraining quality filters). All counts exact. */
  def qualityMetrics(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nChars = length(t)
    val nTokens = size(toks)
    val punct = nChars - length(regexp_replace(t, "[.,;:!?]", ""))
    val stopHits = size(filter(toks, w => stopwords.foldLeft(lit(false))((acc, s) => acc || w === s)))
    val alnum = length(regexp_replace(t, "[^a-zA-Z0-9]", ""))
    docs.select(col("doc_id"),
      nChars.as("n_chars"),
      nTokens.as("n_tokens"),
      punct.as("n_punct"),
      stopHits.as("n_stopwords"),
      alnum.as("n_alnum"),
      (nChars.cast("double") / nTokens).as("chars_per_token"),
      (stopHits.cast("double") / nTokens).as("stopword_ratio"))
  }

  def qualityMetricsSql(table: String): String = {
    val toks = tokensSql("text")
    val stopList = stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""SELECT doc_id,
       |  length(text) AS n_chars,
       |  len($toks) AS n_tokens,
       |  length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
       |  len(list_filter($toks, w -> list_contains($stopList, w))) AS n_stopwords,
       |  length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) AS n_alnum,
       |  CAST(length(text) AS DOUBLE) / len($toks) AS chars_per_token,
       |  CAST(len(list_filter($toks, w -> list_contains($stopList, w))) AS DOUBLE)
       |    / len($toks) AS stopword_ratio
       |FROM $table ORDER BY doc_id""".stripMargin
  }

  /** BPE-ish subword segmentation regex: letter runs, digit runs, and single
    * non-alnum marks — the GPT-2-style pre-tokenizer class structure without
    * a merges table. Whitespace is spelled as an explicit class (Java \\s
    * and RE2 \\s disagree on \\x0B) so Spark (java.util.regex) and DuckDB
    * (RE2) match identically. */
  val BpeTokenRegex: String = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r]"

  /** Token counting per document: whitespace tokens + BPE-ish regex tokens
    * (the two standard size proxies for pretraining-data accounting). */
  def tokenCounts(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(col("doc_id"),
      size(tokens(t)).as("n_ws_tokens"),
      size(regexp_extract_all(t, lit(BpeTokenRegex), lit(0))).as("n_bpe_tokens"))
  }

  def tokenCountsSql(table: String): String =
    s"""SELECT doc_id,
       |  len(${tokensSql("text")}) AS n_ws_tokens,
       |  len(regexp_extract_all(text, '$BpeTokenRegex')) AS n_bpe_tokens
       |FROM $table ORDER BY doc_id""".stripMargin

  /** Language-ID by stopword-profile hits (n-gram-heuristic family).
    * Deterministic argmax with fixed tie-break order. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "es" -> Seq("el", "los", "y", "es", "una"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"))

  def langId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(lower(col(textCol)))
    val scores = langProfiles.map { case (lang, words) =>
      val hits = size(filter(toks, w => words.foldLeft(lit(false))((acc, s) => acc || w === s)))
      (lang, hits)
    }
    val scoreCols = scores.map { case (l, h) => h.as(s"score_$l") }
    val withScores = docs.select(col("doc_id") +: scoreCols: _*)
    // deterministic argmax: first profile in declaration order wins ties
    val best = langProfiles.map(_._1).tail.foldLeft(
      (lit(langProfiles.head._1), col(s"score_${langProfiles.head._1}"))) {
      case ((bl, bs), lang) =>
        val s = col(s"score_$lang")
        (when(s > bs, lit(lang)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }
    withScores.select(col("doc_id"), best._1.as("pred_lang"), best._2.as("best_score"))
  }

  def langIdSql(table: String): String = {
    val toks = tokensSql("lower(text)")
    val scoreExprs = langProfiles.map { case (lang, words) =>
      val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter($toks, w -> list_contains($lst, w))) AS score_$lang"
    }
    // same left-to-right argmax
    val (l0, _) = langProfiles.head
    var bl = s"'$l0'"; var bs = s"score_$l0"
    langProfiles.tail.foreach { case (lang, _) =>
      bl = s"CASE WHEN score_$lang > $bs THEN '$lang' ELSE $bl END"
      bs = s"CASE WHEN score_$lang > $bs THEN score_$lang ELSE $bs END"
    }
    s"""WITH s AS (SELECT doc_id, ${scoreExprs.mkString(", ")} FROM $table)
       |SELECT doc_id, $bl AS pred_lang, $bs AS best_score
       |FROM s ORDER BY doc_id""".stripMargin
  }

  /** md5 fingerprint of whitespace-normalized lowercase text (exact-dedup
    * key; document fingerprinting). */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), WsClass, " ")).cast("binary"))
  def fingerprintSql(e: String): String =
    s"md5(lower(regexp_replace(trim($e), '$WsClass', ' ', 'g')))"

  /** 64-bit polynomial rolling hash (Rabin-Karp) of the text — per-char loop,
    * implemented as a custom codegen'd Catalyst expression. */
  def rollingHash(text: Column): Column = graft.functions.RollingHash.column(text)
}
