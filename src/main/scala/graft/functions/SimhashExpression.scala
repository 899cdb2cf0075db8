package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass simhash over a document's distinct n-token shingles.
  *
  * Semantically identical to the explode + groupBy formulation (and the
  * DuckDB oracle): bit `b` of the result is set iff
  * `sum over distinct shingles of ((polyhash(s) >> b & 1) * 2 - 1) > 0`,
  * with polyhash = fold `(acc*31 + byte) % prime` from 7 ([[PolyHash]])
  * and shingle semantics exactly [[Shingles]] (split on single spaces
  * keeping empties, first-occurrence distinct).
  *
  * The point is the plan shape: the aggregate formulation explodes every
  * shingle into a row and shuffles them into a 48-sum hash aggregate —
  * at 100 TB that exchange carries ~token-count rows for what is a
  * row-local computation. This expression computes the signature where
  * the document already is: no explode, no shuffle, one tight loop per
  * row. Round 18: evaluation moved to the shared byte-slice body
  * ([[ShingleOps.simhash]] — a shingle IS its byte span, so the
  * split/StringBuilder/String/re-encode chain collapses to span
  * hashing with a no-copy distinct set), and the expression generates
  * code (one static call), so the scan pipeline stays whole-stage with
  * no CodegenFallback row-boxing. A document with no shingles has NO
  * signature: the aggregate formulation (and the oracle) never emit a
  * row for it, so banding it at an all-zero signature would pair every
  * short doc with every other — NULL keeps it out of the join. */
case class SimhashText(child: Expression, n: Int, prime: Long, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    ShingleOps.simhash(input.asInstanceOf[UTF8String], n, prime, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("sim")
      s"""
         |java.lang.Long $boxed =
         |  graft.functions.ShingleOps.simhash($c, $n, ${prime}L, $bits);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimhashText =
    copy(child = newChild)
}

object SimhashText {
  /** Column-API entry point: 48-bit simhash of `c`'s distinct 3-shingles;
    * NULL when the text has no shingles (fewer than n tokens). */
  def simhashFast(c: Column, n: Int, prime: Long, bits: Int): Column =
    Bridge.column(SimhashText(Bridge.expression(c), n, prime, bits))
}
