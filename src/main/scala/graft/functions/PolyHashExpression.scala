package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd polynomial rolling hash: fold (acc*31 + byte) % prime from
  * init 7 over the UTF-8 bytes of the input string.
  *
  * Identical results to [[TextFunctions.polyHash]] (and the DuckDB oracle
  * fold) for ASCII inputs, where bytes == character codes — but evaluated
  * as a tight generated loop instead of an interpreted
  * transform+aggregate chain over a materialized codes array. This is the
  * hot inner operation of the minhash/simhash/fingerprint pipeline
  * (millions of shingles), so it follows the brief's preference order:
  * native Catalyst Expression with doGenCode over higher-order functions
  * over UDFs. */
case class PolyHash(child: Expression, prime: Long) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var acc = 7L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31 + (bytes(i) & 0xffL)) % prime
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $acc = 7L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $acc = ($acc * 31L + ($bytes[$i] & 0xffL)) % ${prime}L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  /** Column-API entry point. */
  def polyHashFast(c: Column, prime: Long): Column =
    Bridge.column(PolyHash(Bridge.expression(c), prime))
}
