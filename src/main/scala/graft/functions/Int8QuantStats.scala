package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Symmetric int8 quantization stats for an `array<double>` embedding,
  * in ONE in-row loop: max_abs (the scale numerator — scale =
  * max_abs/127), and the integer-exact digest of the quantized vector
  * q_i = floor(x_i/scale + 0.5): count of zeroed dims, Σq_i, Σq_i².
  * The explicit floor(+0.5) (instead of an engine `round`) makes the
  * integers bit-reproducible across engines — IEEE division and floor
  * are exact, so any engine computing the same formula gets the same
  * ints, while float outputs (mse and friends) would hang the oracle
  * compare on summation order. A zero vector quantizes to all zeros.
  *
  * One interpreted call per row; the alternative HOF pipeline
  * (`aggregate` for the max, `transform` + `aggregate` for the sums)
  * pays 4·dims interpreted lambda evals per row (HOFs are
  * CodegenFallback) — see the ExpressionEquivalenceSpec pin. */
case class Int8QuantStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("max_abs", DoubleType, nullable = false),
    StructField("n_zero", LongType, nullable = false),
    StructField("qsum", LongType, nullable = false),
    StructField("qnorm2", LongType, nullable = false)))

  override def prettyName: String = "graft_int8_quant_stats"

  // A null ELEMENT nulls the whole result (matching what the HOF
  // aggregate/transform formulation would do) instead of silently
  // reading a 0 — so the output is nullable even over non-null arrays.
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) return null
      val a = math.abs(xs.getDouble(i))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    var nZero = 0L
    var qsum = 0L
    var qnorm2 = 0L
    if (maxAbs == 0.0) {
      nZero = n.toLong
    } else {
      val scale = maxAbs / 127.0
      i = 0
      while (i < n) {
        val q = math.floor(xs.getDouble(i) / scale + 0.5).toLong
        if (q == 0L) nZero += 1
        qsum += q
        qnorm2 += q * q
        i += 1
      }
    }
    InternalRow(maxAbs, nZero, qsum, qnorm2)
  }

  override protected def withNewChildInternal(newChild: Expression): Int8QuantStats =
    copy(child = newChild)
}

object Int8QuantStats {
  def apply(c: Column): Column =
    ColumnBridge.column(Int8QuantStats(ColumnBridge.expression(c)))
}
