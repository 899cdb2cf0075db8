package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd sign-random-projection key: bit b of the result is the sign
  * of the dot product of the input `array<double>` with deterministic
  * pseudo-random hyperplane (first + b), where plane j's value at
  * 1-based dimension i is `((1103515245·(j+7)·i + 12345·(j+1)) mod 2000)
  * / 1000 − 1` — exact rational arithmetic, reproducible in the DuckDB
  * oracles ([[graft.operators.Similarity.planeDotSql]]).
  *
  * Identical results to composing `aggregate(zip_with(v, transform(
  * sequence(...), planeVal)))` per bit — but that HOF formulation builds
  * a ~50-node Catalyst tree PER PLANE; a 6-bit key over 8 bands meant
  * hundreds of nodes and a multi-second janino compile every time a
  * query referenced it (the dominant cost of the banded ANN operators on
  * small inputs). This expression is one compact generated loop. The
  * accumulation is the same left fold, so signs are bit-identical. */
case class SignKey(child: Expression, first: Int, bits: Int) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    // A null element nulls every plane's dot in the HOF formulation
    // (zip_with → null slot → null fold), so `dot > 0` is false for all
    // bits: the key is 0. Mirror that exactly — reading getDouble on a
    // null slot would return unspecified bits instead.
    var z = 0
    while (z < n) {
      if (v.isNullAt(z)) return 0L
      z += 1
    }
    var key = 0L
    var b = 0
    while (b < bits) {
      val j = first + b
      val a1 = 1103515245L * (j + 7)
      val a0 = 12345L * (j + 1)
      var acc = 0.0
      var i = 1
      while (i <= n) {
        acc += v.getDouble(i - 1) * (((a1 * i + a0) % 2000L).toDouble / 1000.0 - 1.0)
        i += 1
      }
      if (acc > 0) key |= 1L << b
      b += 1
    }
    key
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val key = ctx.freshName("key")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val a1 = ctx.freshName("a1")
      val a0 = ctx.freshName("a0")
      val j = ctx.freshName("j")
      s"""
         |int $n = $v.numElements();
         |long $key = 0L;
         |boolean ${key}_hasNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($v.isNullAt($i)) { ${key}_hasNull = true; break; }
         |}
         |if (!${key}_hasNull)
         |for (int $b = 0; $b < $bits; $b++) {
         |  int $j = $first + $b;
         |  long $a1 = 1103515245L * ($j + 7);
         |  long $a0 = 12345L * ($j + 1);
         |  double $acc = 0.0;
         |  for (int $i = 1; $i <= $n; $i++) {
         |    $acc += $v.getDouble($i - 1) * ((double) (($a1 * $i + $a0) % 2000L) / 1000.0 - 1.0);
         |  }
         |  if ($acc > 0) $key |= 1L << $b;
         |}
         |${ev.value} = $key;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignKey =
    copy(child = newChild)
}

object SignKey {
  /** Column-API entry point. */
  def signKeyFast(v: Column, first: Int, bits: Int): Column =
    Bridge.column(SignKey(Bridge.expression(v), first, bits))
}
