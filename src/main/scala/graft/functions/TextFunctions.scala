package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

import graft.functions.expressions.{NGramsJoined, Tokenize}

/** Column-API surface for the text kernels. Everything here produces stock
  * Catalyst plans (custom expressions are codegen'd scalar calls, so they sit
  * inside WholeStageCodegen like built-ins).
  */
object TextFunctions {

  private def col2e(c: Column) = Bridge.expression(c)
  private def e2col(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    Bridge.column(e)

  /** UAX-29 word tokenize (reference src/tokens.rs:8-17). */
  def tokenize(c: Column): Column = e2col(Tokenize(col2e(c)))

  /** n-grams of a token array, space-joined strings. */
  def ngrams(tokens: Column, n: Int): Column =
    e2col(NGramsJoined(col2e(tokens), col2e(lit(n))))

  /** tokenize + n-grams in one call. */
  def textNgrams(text: Column, n: Int): Column = ngrams(tokenize(text), n)

  /** Builtin-only n-gram variant (transform/sequence/slice/concat_ws) — used
    * where a plan made of 100% stock expressions is preferred; semantics are
    * identical to [[ngrams]].
    */
  def ngramsBuiltin(tokens: Column, n: Int): Column =
    when(size(tokens) >= n,
      transform(sequence(lit(1), size(tokens) - (n - 1)),
        i => concat_ws(" ", slice(tokens, i, lit(n)))))
    .otherwise(array().cast("array<string>"))

  /** Whitespace tokenizer (for corpora known to be single-space separated;
    * cheaper than UAX-29 and exactly reproducible in ANSI SQL oracles).
    */
  def splitTokens(text: Column): Column = split(text, " ")
}
