package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic byte-pair-encoding tokenizer — tokenizer-TRUE token
  * counts for the LLM-pipeline operators (chunking/packing budgets that
  * match what a training pipeline actually packs, not a chars/4
  * estimate).
  *
  * The tokenizer is fully specified so two engines reproduce it
  * bit-for-bit:
  *
  *  1. sanitize: lowercase, every run of chars outside [a-z0-9 ]
  *     becomes one space, runs of spaces collapse, trim;
  *  2. apply the trained merge list in rank order: each merge replaces
  *     every (left-to-right, non-overlapping) occurrence of a two-char
  *     pair with one private-use-area char (U+E000+rank) — Java
  *     `String.replace` and SQL `replace()` share these semantics, so
  *     the whole application is expressible in BOTH engines as a fold
  *     of 48 plain `replace` calls;
  *  3. token count = length of the result, spaces excluded (every
  *     remaining char — base or merged unit — is one token).
  *
  * TRAINING is classic greedy BPE: repeatedly merge the most frequent
  * adjacent within-word pair (ties break to the lexicographically
  * smallest pair), on a deterministic in-code corpus — a weighted
  * word-frequency text compiled into the library, NOT the fixture
  * (fixture documents differ per scale factor, and the oracle SQL must
  * be one static statement valid at every sf). The merges land in the
  * oracle as literal `replace` chains — the DuckDB oracle replays the
  * exact same merge applications over the same raw documents.
  *
  * Spark-first note: the hot path is a fold of builtin `StringReplace`
  * expressions — whole-stage-codegen'd, no UDF and no custom Expression
  * needed (composition of existing ops beats a custom kernel in the
  * engine's preference order).
  */
object BpeTokenizer {

  /** Deterministic training corpus: a weighted vocabulary of common
    * English + pipeline terms (weights ≈ frequency), joined by spaces.
    * Purely synthetic — compiled constant, same on every host. */
  private[functions] val corpus: String = Seq(
    "the" -> 64, "of" -> 48, "and" -> 44, "to" -> 40, "in" -> 36,
    "is" -> 30, "that" -> 26, "it" -> 24, "for" -> 22, "with" -> 20,
    "as" -> 18, "was" -> 16, "on" -> 16, "are" -> 14, "this" -> 14,
    "data" -> 28, "model" -> 22, "training" -> 20, "token" -> 20,
    "pipeline" -> 18, "document" -> 18, "language" -> 16, "text" -> 16,
    "learning" -> 14, "corpus" -> 12, "quality" -> 12, "filter" -> 10,
    "duplicate" -> 10, "partition" -> 10, "shuffle" -> 8, "stream" -> 8,
    "batch" -> 8, "vector" -> 8, "embedding" -> 8, "cluster" -> 6,
    "sample" -> 6, "merge" -> 6, "encode" -> 6, "decode" -> 6,
    "compute" -> 6, "storage" -> 6, "engine" -> 6, "result" -> 4,
    "number" -> 4, "value" -> 4, "record" -> 4, "string" -> 4
  ).flatMap { case (w, n) => Seq.fill(n)(w) }.mkString(" ")

  /** Greedy BPE training: `n` merges of the most frequent adjacent
    * within-word pair (never across a space), each replaced by one
    * private-use-area unit char. Deterministic: ties break to the
    * lexicographically smallest pair; merging stops early if no pair
    * occurs twice. */
  private[functions] def train(text: String, n: Int): Seq[(String, Char)] = {
    var cur = text
    val out = Seq.newBuilder[(String, Char)]
    var unit = '\uE000' // private-use area: rank r merges to U+E000+r
    var i = 0
    var done = false
    while (i < n && !done) {
      val counts = mutable.HashMap.empty[String, Int]
      var j = 0
      while (j < cur.length - 1) {
        if (cur.charAt(j) != ' ' && cur.charAt(j + 1) != ' ') {
          val p = cur.substring(j, j + 2)
          counts.update(p, counts.getOrElse(p, 0) + 1)
        }
        j += 1
      }
      val best = counts.toSeq.sortBy { case (p, c) => (-c, p) }.headOption
      best match {
        case Some((pair, c)) if c >= 2 =>
          out += (pair -> unit)
          cur = cur.replace(pair, unit.toString)
          unit = (unit + 1).toChar
        case _ => done = true
      }
      i += 1
    }
    out.result()
  }

  /** The trained merge list (48 ranks — enough to absorb the corpus's
    * common stems; tiny enough that 48 chained `replace`s stay well
    * inside both planners' expression limits). */
  val merges: Seq[(String, Char)] = train(corpus, 48)

  /** REPLACE-ALL regexp, built as the catalyst expression directly:
    * Spark 4's `functions.regexp_replace` resolves through the session
    * FUNCTION REGISTRY, and graft's DuckDB-dialect shim rebinds the
    * 3-arg name to DuckDB's first-match-only semantics — this tokenizer
    * needs Spark's native global replace on every run of every
    * document, independent of the session dialect. */
  private def rxAll(c: Column, pattern: String, rep: String): Column =
    org.apache.spark.sql.graft.GraftExpressions
      .regexpReplaceAll(c, pattern, rep)

  /** Sanitized text: the tokenizer's step-1 normal form. Non-ASCII is
    * stripped BEFORE lowercasing, so `lower` only ever sees ASCII —
    * unicode casing tables (Turkish I, combining marks) can differ
    * between engines and must never reach the parity surface. */
  def sanitize(c: Column): Column =
    trim(rxAll(lower(rxAll(c, "[^A-Za-z0-9 ]+", " ")), " +", " "))

  /** Tokenizer-true token count, as a codegen'd column expression:
    * fold of 48 builtin replaces + a space-stripped length. */
  def tokenCount(c: Column): Column = {
    val applied = merges.foldLeft(sanitize(c)) { case (acc, (pair, unit)) =>
      replace(acc, lit(pair), lit(unit.toString)) }
    length(replace(applied, lit(" "), lit("")))
  }

  /** The IDENTICAL computation as portable SQL over column expression
    * `col` — the DuckDB oracle replays the same sanitize + merge chain
    * (merge pairs may contain earlier units; PUA chars embed raw in the
    * literal, valid in both dialects). */
  def tokenCountSql(col: String): String = {
    def escape(s: String) = s.replace("'", "''")
    val sanitized =
      s"trim(regexp_replace(lower(regexp_replace($col, '[^A-Za-z0-9 ]+', ' ', 'g')), ' +', ' ', 'g'))"
    val applied = merges.foldLeft(sanitized) { case (acc, (pair, unit)) =>
      s"replace($acc, '${escape(pair)}', '${escape(unit.toString)}')" }
    s"length(replace($applied, ' ', ''))"
  }
}
