package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis column builders for the training-data pipeline operators:
 * tokenization, shingling, quality metrics, language-ID heuristic. All are
 * compositions of built-in (codegen'd) functions — no UDFs — so Catalyst
 * can pipeline them inside whole-stage codegen.
 *
 * Tokenization is a literal single-space split to stay bit-identical with
 * the DuckDB oracle (`string_split(text, ' ')`); the synthetic corpus is
 * single-space separated.
 */
object TextFunctions {

  def tokens(text: Column): Column = split(text, " ")

  def distinctTokens(text: Column): Column = array_distinct(tokens(text))

  /** 3-word shingles (distinct). Empty for docs shorter than 3 tokens. */
  def shingles3(text: Column): Column = {
    val t = tokens(text)
    val n = size(t)
    array_distinct(
      when(n >= 3,
        transform(sequence(lit(0), n - 3), i =>
          concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2), element_at(t, i + 3))))
        .otherwise(array().cast("array<string>")))
  }

  /** OpenRefine-style normalization fingerprint: sorted distinct tokens,
    * md5'd — collapses token-order permutations to one key. */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", sort_array(array_distinct(tokens(lower(text))))))

  /** GPT-2-ish pre-tokenizer: contraction suffix, space-prefixed letter
    * run, space-prefixed digit run, space-prefixed punctuation run.
    * Restricted to syntax RE2 and java.util.regex agree on (no
    * lookarounds), so the Spark query and the DuckDB oracle segment
    * identically. */
  val BpeishPattern: String =
    "'[a-z]+| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+"

  /** PII patterns, restricted to constructs Java regex and RE2 evaluate
    * identically (no backrefs/lookaround) so the DuckDB oracle agrees. */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern: String = "\\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{4}"

  val stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "on")

  def stopwordCount(text: Column): Column = {
    val sw = stopwords.map(lit(_))
    size(filter(tokens(lower(text)), t => t.isInCollection(stopwords)))
  }

  /** Per-language marker tokens for the n-gram/stopword language-ID
    * heuristic. Ordered — ties resolve to the earlier entry. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "is", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"),
    "es" -> Seq("el", "los", "las", "es", "un", "una"),
    "zh" -> Seq("的", "是", "了", "在", "我", "不"))

  def langScore(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(lower(text)), t => t.isInCollection(markers)))

  /** argmax over language scores; ties and all-zero fall through in
    * langMarkers order ("en" first). */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (l, m) => l -> langScore(text, m) }
    val best = greatest(scores.map(_._2): _*)
    scores.tail.foldLeft(when(scores.head._2 === best, lit(scores.head._1))) {
      case (acc, (l, sc)) => acc.when(sc === best, lit(l))
    }.otherwise(lit(scores.head._1))
  }
}
