package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for a training-data pipeline, as pure
  * Column expressions (whole-stage-codegen'd; no UDFs, no driver loops —
  * every operator here is a per-row expression that scales embarrassingly).
  *
  * The reference has no text operators (its only string work is LOWER +
  * date reformatting, ref `spark/jobs/pr-wallet-data-tf.py:81-85`,
  * `dags/s3-etl-wallet-csv.py:53-55`); this module is the `north_star`
  * extension surface (BASELINE.json): tokenization, quality scoring,
  * language ID, fingerprinting.
  *
  * Engine-parity notes (the DuckDB oracle mirrors every formula):
  *  - token counts from single-space `split`; DuckDB `string_split`
  *  - all ratios are INT/INT → DOUBLE divisions of identical integers,
  *    so results are bit-identical across engines
  *  - hashes are MD5 hex strings (identical everywhere); MinHash minima
  *    are *lexicographic string minima* of MD5s — portable, no integer
  *    hex parsing needed
  */
object TextFunctions {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(text, " ")

  /** Language-marker stopword sets (public, frequency-based top words). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "a", "in", "is", "it", "for", "on"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "no"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "du", "est"),
    "de" -> Seq("der", "die", "und", "das", "von", "mit", "ein", "zu", "den", "ist"))

  private def inList(ws: Seq[String]): String = ws.map(w => s"'$w'").mkString(", ")

  /** Count of tokens belonging to a word set (codegen'd higher-order
    * filter, no shuffle). `toksCol` must name a column holding the token
    * array. */
  def wordSetCount(toksCol: String, ws: Seq[String]): Column =
    expr(s"size(filter($toksCol, t -> t IN (${inList(ws)})))")

  /** Per-language stopword-hit scores; the argmax (ties broken in fixed
    * en→es→fr→de order) is the predicted language; all-zero → 'unknown'. */
  def langPredicted(sEn: Column, sEs: Column, sFr: Column, sDe: Column): Column =
    when(sEn === 0 && sEs === 0 && sFr === 0 && sDe === 0, "unknown")
      .when(sEn >= greatest(sEs, sFr, sDe), "en")
      .when(sEs >= greatest(sFr, sDe), "es")
      .when(sFr >= sDe, "fr")
      .otherwise("de")

  /** Canonical-form document fingerprint: MD5 of the lower-cased,
    * whitespace-collapsed text. Identical MD5 on both engines → usable as
    * an exact-dedup key. */
  def fingerprint(text: Column): Column =
    md5(lower(trim(regexp_replace(text, "\\s+", " "))))

  /** Token n-grams (n consecutive tokens joined by one space), empty array
    * below n tokens. NOTE: guarded `when` because Spark's
    * `sequence(1, 0)` yields a DESCENDING [1,0], not empty. */
  def tokenNgrams(toksCol: String, n: Int): Column = {
    val joined = (1 to n).map(k => s"element_at($toksCol, i + ${k - 1})")
      .mkString("concat_ws(' ', ", ", ", ")")
    when(expr(s"size($toksCol) >= $n"),
      expr(s"transform(sequence(1, size($toksCol) - ${n - 1}), i -> $joined)"))
      .otherwise(typedLit(Seq.empty[String]))
  }

  /** Jaccard similarity of two token-array columns (distinct-set
    * semantics, matching DuckDB list_intersect / list_distinct∘concat). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val union = size(array_union(a, b))
    inter.cast("double") / when(union === 0, lit(null)).otherwise(union)
  }

  /** MinHash component i: the lexicographically smallest MD5 of
    * `"i:" + shingle` over the document's shingle set. K independent
    * "hash functions" come from the seed prefix — portable across engines
    * because the min is over hex STRINGS. */
  def minhash(shinglesCol: String, seed: Int): Column =
    expr(s"array_min(transform($shinglesCol, s -> md5(concat('$seed:', s))))")

  /** LSH band key: hash of a slice of the MinHash signature. Documents
    * sharing any band key become near-dup candidates (band-join). */
  def band(sig: Column*): Column = md5(concat(sig: _*))

  /** SimHash over the first `bits` bits of each token's MD5: bit b of the
    * signature is 1 iff the (+1/-1) vote sum over tokens is >= 0.
    * Returned as a '0'/'1' string of length `bits` (portable; no 64-bit
    * sign issues). Formula mirrored verbatim in the DuckDB oracle. */
  def simhashBits(toksHashCol: String, bits: Int): Column = {
    val bitCols = (0 until bits).map { b =>
      val nibble = b / 4 + 1
      val shift = 3 - b % 4
      val vote = s"CASE WHEN (shiftright(instr('0123456789abcdef', substr(h, $nibble, 1)) - 1, $shift) & 1) = 1 THEN 1 ELSE -1 END"
      expr(s"CASE WHEN aggregate($toksHashCol, 0, (acc, h) -> acc + ($vote)) >= 0 THEN '1' ELSE '0' END")
    }
    concat(bitCols: _*)
  }
}
