package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared text primitives for the dedup / text-analysis packs.
  *
  * Tokenization is `lower(text)` split on `\s+` — mirrored verbatim in every
  * DuckDB oracle as `regexp_split_to_array(lower(text), '\s+')` so the two
  * engines see identical token streams.
  */
object TextOps {

  def tokens(c: Column): Column = split(lower(c), "\\s+")

  /** Distinct word k-shingles, e.g. k=3 → "a b c" strings. Uses only
    * codegen'd higher-order functions (no UDF).
    */
  def shingleSet(toks: Column, k: Int): Column =
    array_distinct(
      transform(
        sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))

  /** Sum of an integer-valued array (exact — no FP concerns). */
  def intArraySum(arr: Column): Column =
    aggregate(arr, lit(0L), (acc, x) => acc + x)

  /** Exact dot product of two numeric vectors in double (left-to-right
    * accumulation — same order DuckDB's list_sum uses; results additionally
    * rounded at the query layer). Backed by the codegen'd
    * [[graft.functions.VecDot]] expression — FP-identical to the
    * `aggregate(zip_with(...))` formulation it replaced, ~10× faster.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VecDot(a, b)

  def norm(a: Column): Column = sqrt(graft.functions.VecDot(a, a))
}
