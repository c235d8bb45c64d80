package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, LambdaFunction, Literal, Md5, NamedLambdaVariable, SortArray}
import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, ArrayTransform}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, BinaryType, BooleanType, IntegerType, StringType}

import graft.functions.{FpSet, HexSliceLong}

/** Optimizer rule: rewrite the COMPOSABLE fingerprint-set chain
  *
  *   sort_array(array_distinct(transform(arr,
  *     x -> hex_slice_long(md5(cast(x as binary)), 0))))
  *
  * into the fused native [[FpSet]] (`fp32_set(arr)`). The two forms
  * are semantically identical on null-free string arrays (same md5
  * slice, same distinct, same ascending sort — FpSet's documented
  * contract), but the composable form is a higher-order-function
  * chain: CodegenFallback, a lambda frame per element, and an md5
  * through generic eval — measured as the dominant cost of the
  * containment index build before it was hand-fused. This rule gives
  * SQL users and composable-API callers the fused form for free —
  * declare the semantics, let the optimizer pick the implementation.
  *
  * Correctness guard: fires ONLY when the array's element type is a
  * non-nullable STRING — FpSet skips null elements, while the
  * composable chain would carry a null through md5 and sort it
  * first, so a nullable input keeps its literal semantics.
  *
  * Active on sessions built `withExtensions(new GraftExtensions)`
  * (injectOptimizerRule) AND on driver-handed sessions via
  * [[GraftExtensions.register]], which appends this rule to
  * `spark.experimental.extraOptimizations` (idempotently).
  */
class FuseFingerprintSets extends Rule[LogicalPlan] {

  private def isFingerprintLambda(fn: Expression): Boolean = fn match {
    case LambdaFunction(HexSliceLong(md5e: Md5, Literal(0, IntegerType)),
        Seq(v: NamedLambdaVariable), _) =>
      md5e.child match {
        case c: Cast if c.dataType == BinaryType =>
          c.child match {
            case v2: NamedLambdaVariable => v2.exprId == v.exprId
            case _ => false
          }
        case _ => false
      }
    case _ => false
  }

  private def nonNullStringArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, containsNull) => !containsNull
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case SortArray(ArrayDistinct(at: ArrayTransform), Literal(true, BooleanType))
        if isFingerprintLambda(at.function) && nonNullStringArray(at.argument) =>
      FpSet(at.argument)
  }
}
