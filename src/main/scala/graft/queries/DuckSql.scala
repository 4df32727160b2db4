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
}
