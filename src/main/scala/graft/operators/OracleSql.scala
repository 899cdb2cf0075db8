package graft.operators

import graft.functions.TextFunctions._

/** Shared DuckDB SQL fragments that replicate the Spark-side arithmetic of
  * [[graft.functions.TextFunctions]] exactly (same fold order, same
  * moduli, same init values) so results hash-match bit-for-bit. */
object OracleSql {

  /** CTEs `tok` and `sh`: one row per distinct 3-token shingle per doc —
    * mirrors TextFunctions.shingles + explode. */
  val shingleCte: String =
    """tok AS (SELECT doc_id, string_split(text, ' ') toks FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
      |         range(1, len(toks)-1),
      |         i -> array_to_string(toks[i:i+2], ' ')))) s
      |       FROM tok)""".stripMargin

  /** Polynomial rolling hash of string expr `c` mod `p`, init 7 — mirrors
    * TextFunctions.polyHash (left fold, same op order). */
  def polyHashSql(c: String, p: Long): String =
    s"""list_reduce(list_concat([CAST(7 AS BIGINT)],
       |  list_transform(range(1, length($c)+1),
       |    i -> ascii(substr($c, i, 1))::BIGINT)),
       |  (acc, ch) -> (acc*31 + ch) % $p)""".stripMargin

  /** L2 norm of a DOUBLE[] expr — left fold from 0.0, mirroring
    * sqrt(aggregate(transform(v, x*x), 0.0, +)). */
  def normSql(v: String): String =
    s"sqrt(list_reduce(list_concat([0.0], list_transform($v, x -> x*x)), (a, b) -> a + b))"

  /** Dot product of two DOUBLE[] exprs — left fold from 0.0, mirroring
    * aggregate(zip_with(a, b, *), 0.0, +). */
  def dotSql(a: String, b: String): String =
    s"""list_reduce(list_concat([0.0],
       |  list_transform(range(1, len($a)+1), i -> $a[i] * $b[i])),
       |  (x, y) -> x + y)""".stripMargin
}
