package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Codegen'd HyperLogLog estimate over a register array — the
  * cardinality read-out of [[graft.graph.HyperBall]]'s sketches with
  * the standard small-range linear-counting correction:
  *
  *   raw = α·m² / Σᵢ 2^(−rᵢ);  if raw ≤ 2.5m and z > 0 (z = zero
  *   registers): m·ln(m/z), else raw.
  *
  * HyperBall evaluates this over EVERY node's sketch at EVERY
  * radius (harmonic estimation) — with Spark HOFs that inner Σ runs
  * interpreted per register (`aggregate` is CodegenFallback), the
  * same hot-path problem the signature expressions solved. This is
  * one primitive loop inside whole-stage codegen, bit-compatible
  * with the HOF formulation (ascending-index fold, `StrictMath.pow`/
  * `StrictMath.log` exactly as Spark's built-in math expressions
  * compile to) — equivalence is
  * spec-asserted on random registers.
  *
  * α is the m = 64 bias constant (the library's sketch width); the
  * estimate still computes m from the array so callers with other
  * widths get the right shape (they must supply their own α via the
  * companion's parameter to stay unbiased). */
case class HllEstimate(child: Expression, alpha: Double)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int> registers, got ${other.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_hll_estimate"

  override protected def nullSafeEval(a: Any): Any = {
    val regs = a.asInstanceOf[ArrayData]
    val m = regs.numElements()
    var s = 0.0
    var z = 0
    var i = 0
    while (i < m) {
      val r = regs.getInt(i)
      s += java.lang.StrictMath.pow(2.0, -r.toDouble)
      if (r == 0) z += 1
      i += 1
    }
    val raw = alpha * m * m / s
    if (raw <= 2.5 * m && z > 0) m.toDouble * java.lang.StrictMath.log(m.toDouble / z)
    else raw
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, regs => {
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val z = ctx.freshName("z")
      val r = ctx.freshName("r")
      val raw = ctx.freshName("raw")
      s"""
         |int $m = $regs.numElements();
         |double $s = 0.0;
         |int $z = 0;
         |for (int $i = 0; $i < $m; $i++) {
         |  int $r = $regs.getInt($i);
         |  $s += java.lang.StrictMath.pow(2.0, -((double) $r));
         |  if ($r == 0) $z++;
         |}
         |double $raw = $alpha * $m * $m / $s;
         |if ($raw <= 2.5 * $m && $z > 0) {
         |  ${ev.value} = ((double) $m) * java.lang.StrictMath.log(((double) $m) / $z);
         |} else {
         |  ${ev.value} = $raw;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
}
