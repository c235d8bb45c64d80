package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `char_shingles(text, k)` — all character k-grams as
  * `array<string>` ("abcd", 3 → ["abc", "bcd"]).
  *
  * The character-level sibling of [[WordShingles]], and an expression
  * for the same reason: the `transform(sequence(...), i ->
  * substring(...))` higher-order form re-evaluates lambda frames per
  * output gram when feeding a Generate — this one-pass eval runs once
  * per document row, narrow (no shuffle). Character positions are
  * UTF-8 code points (`UTF8String.substringSQL`), so multi-byte text
  * shingles by character, not byte. Texts shorter than k characters
  * yield an empty array (explode drops them, matching the SQL-composed
  * semantics).
  */
case class CharShingles(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, IntegerType) if right.foldable => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"char_shingles expects (STRING, foldable INT), got ($l, $r)")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private lazy val k: Int = right.eval().asInstanceOf[Int]

  override def nullSafeEval(t: Any, kAny: Any): Any = {
    val s = t.asInstanceOf[UTF8String]
    val n = s.numChars() - k + 1
    if (n <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        out(i) = s.substringSQL(i + 1, k) // 1-based, char-counted
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharShingles =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "char_shingles"
}

object CharShingles {
  /** Column-API form. Requires graft.plans.GraftExtensions.register. */
  def char_shingles(text: Column, k: Int): Column =
    call_function("char_shingles", text, lit(k))
}
