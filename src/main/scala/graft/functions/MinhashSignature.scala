package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole minhash signature in ONE expression: distinct char-5-grams of
  * the input string, `nMd5` md5 digests per gram ("k:gram"), each
  * sliced into 8 × 4-hex lanes, min per lane — plus the distinct-gram
  * count. Output: struct<nn:int, lanes:array<string>> with
  * 8·nMd5 lanes.
  *
  * Why an expression and not `transform`/`array_min` HOFs: Spark's
  * higher-order functions are CodegenFallback and evaluate their
  * lambda interpreted PER ELEMENT — 8·nMd5 lane extractions over a
  * ~10³-gram doc cost millions of interpreted evals per partition.
  * This expression makes one interpreted call per ROW and runs a
  * tight JVM loop inside (hash-set gram dedup, one digest per
  * (k, gram), branchless lane mins), producing byte-identical lane
  * values to the HOF formulation and the DuckDB oracle
  * (min over lowercase-hex slices).
  */
case class MinhashSignature(child: Expression, nMd5: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("nn", IntegerType, nullable = false),
    StructField("lanes", ArrayType(StringType, containsNull = false),
      nullable = false)))

  // Strings shorter than 5 code points eval to null regardless of the
  // child's nullability — declare it so the optimizer never elides the
  // null handling downstream.
  override def nullable: Boolean = true

  override def prettyName: String = "graft_minhash_signature"

  private val hexChars = "0123456789abcdef".toCharArray

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // Code-point windows, matching Spark `substring`/`length` and
    // DuckDB substr semantics (UTF-16 code units would shift gram
    // boundaries on supplementary characters).
    val cps = s.codePoints().toArray
    if (cps.length < 5) return null
    val grams = new java.util.HashSet[String]()
    var i = 0
    while (i + 5 <= cps.length) { grams.add(new String(cps, i, 5)); i += 1 }
    val md = MessageDigest.getInstance("MD5")
    val nLanes = 8 * nMd5
    val lanes = new Array[String](nLanes)
    val it = grams.iterator()
    while (it.hasNext) {
      val g = it.next()
      var k = 0
      while (k < nMd5) {
        md.reset()
        val digest = md.digest(s"$k:$g".getBytes(StandardCharsets.UTF_8))
        // lowercase hex, sliced into 8 4-char lanes (2 bytes each)
        var l = 0
        while (l < 8) {
          val b0 = digest(2 * l) & 0xff
          val b1 = digest(2 * l + 1) & 0xff
          val slice = new String(Array(
            hexChars(b0 >> 4), hexChars(b0 & 0xf),
            hexChars(b1 >> 4), hexChars(b1 & 0xf)))
          val idx = 8 * k + l
          if (lanes(idx) == null || slice.compareTo(lanes(idx)) < 0)
            lanes(idx) = slice
          l += 1
        }
        k += 1
      }
    }
    InternalRow(grams.size,
      new GenericArrayData(lanes.map(s => UTF8String.fromString(s)).toArray[Any]))
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

object MinhashSignature {
  def apply(c: Column, nMd5: Int): Column =
    ColumnBridge.column(MinhashSignature(ColumnBridge.expression(c), nMd5))
}
