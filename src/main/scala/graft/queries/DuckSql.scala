package graft.queries

/** Snippet builders for the DuckDB oracle SQL. */
object DuckSql {

  /** Inline n-gram stream over single-space-separated `text` of `src`:
    * yields one column `ngram` (space-joined), full windows only — same
    * semantics as graft.functions.Tokenizer.ngramsJoinedUtf8.
    */
  def ngrams(n: Int, src: String = "documents", as: String = "ngram"): String =
    s"SELECT unnest(list_transform(generate_series(1, len(t) - ${n - 1}), " +
      s"i -> array_to_string(list_slice(t, i, i + ${n - 1}), ' '))) AS $as " +
      s"FROM (SELECT string_split(text, ' ') AS t FROM $src)"

  /** DuckDB string literal for arbitrary BMP text: printable-ASCII runs
    * stay quoted, everything else becomes `chr(n)` — the mechanical end of
    * the "unicode escapes Scala-side, chr(n) SQL-side" parity rule, so
    * Scala string constants can be inlined into oracle SQL byte-exactly.
    */
  def lit(s: String): String = {
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    val run = new StringBuilder
    def flush(): Unit =
      if (run.nonEmpty) { parts += "'" + run.toString.replace("'", "''") + "'"; run.clear() }
    s.foreach { c =>
      if (c >= ' ' && c.toInt < 127) run += c
      else { flush(); parts += s"chr(${c.toInt})" }
    }
    flush()
    // variadic concat, not a || chain: DuckDB binds || as a nested binary
    // tree and overflows its 128-deep binder recursion on non-Latin seeds
    // where nearly every char is a chr(n) part
    if (parts.isEmpty) "''"
    else if (parts.size == 1) parts.head
    else s"concat(${parts.mkString(", ")})"
  }

  /** Golden-fixture oracle for queries DuckDB cannot express (iterative
    * BPE merges, L-BFGS fits, DEFLATE): the expected output — produced by
    * the golden-tested kernels and pinned bit-deterministic across JVM
    * runs — is committed as parquet under fixtures/golden, keyed by the
    * md5 of the documents table so each scale factor self-selects its
    * fixture and a regenerated corpus can never silently match a stale
    * one. Turns the rows-only checks into full value checks.
    */
  def golden(name: String): String =
    s"""SELECT * EXCLUDE (filename)
       |FROM read_parquet('/root/repo/fixtures/golden/${name}_*.parquet', filename=true)
       |WHERE filename LIKE '%' ||
       |  (SELECT md5(string_agg(text, '|' ORDER BY doc_id)) FROM documents) || '%'""".stripMargin

  /** Cavnar–Trenkle padded char n-gram stream (1..5-grams of `_word_`)
    * over a (keyCol, textExpr) source — mirrors
    * graft.functions.expressions.CtKernel.grams exactly: lowercase, split
    * on non-letter runs, pad, all substrings of length 1..5.
    */
  def ctGrams(keyCol: String, textExpr: String, src: String): String =
    s"""SELECT $keyCol, unnest(flatten(list_transform([1,2,3,4,5], n ->
       |   list_transform(generate_series(1, length(pw) - n + 1), i -> substr(pw, i, n))))) AS g
       | FROM (SELECT $keyCol, '_' || w || '_' AS pw FROM (
       |   SELECT $keyCol, unnest(regexp_split_to_array(lower($textExpr), '[^\\p{L}\\p{M}]+')) AS w
       |   FROM $src) WHERE w <> '')""".stripMargin
}
