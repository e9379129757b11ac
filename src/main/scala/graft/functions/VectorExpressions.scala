package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the vector dot product — the hot loop of
  * the similarity stack (SURVEY §2 D5/D5b/D6).
  *
  * Why a custom expression and not `aggregate(zip_with(...))`: Spark's
  * higher-order functions evaluate their lambda once per element through
  * interpreted `LambdaFunction` machinery and allocate an intermediate
  * array per row; this expression compiles (`doGenCode`) to a tight
  * primitive `for` loop inside whole-stage codegen — no allocation, no
  * per-element virtual calls. On a 100 TB corpus scan the dot product runs
  * once per (row × query/plane), so this is the single most
  * codegen-sensitive spot in the engine.
  *
  * Semantics (kept bit-identical to the DuckDB oracle's `list_reduce`
  * left fold): `acc = 0.0; for i: acc += (double)a[i] * (double)b[i]` in
  * index order — IEEE addition in the same order produces the same double
  * on both engines, so rankings and LSH bucket signs agree exactly.
  *
  * Null handling: null array → null result; mismatched lengths → null
  * (dense embeddings are expected equal-length; silently truncating to
  * min(length) would produce a number where the SQL oracle's fixed-range
  * indexing yields NULL — ragged data should surface, not disappear);
  * null *elements* are not expected (embeddings are dense) and read as
  * 0.0 via ArrayData's primitive getters.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects array<float|double> inputs, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null on mismatched lengths
  override def prettyName: String = "graft_dot"

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val la = l.asInstanceOf[ArrayData]
    val ra = r.asInstanceOf[ArrayData]
    val n = la.numElements()
    if (n != ra.numElements()) null
    else {
      val lf = elemIsFloat(left); val rf = elemIsFloat(right)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (lf) la.getFloat(i).toDouble else la.getDouble(i)
        val y = if (rf) ra.getFloat(i).toDouble else ra.getDouble(i)
        acc += x * y
        i += 1
      }
      acc
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $l.numElements();
         |if ($n != $r.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ((double) $l.$lGet($i)) * ((double) $r.$rGet($i));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Registration for graft's native expressions — as a session-builder call
  * (`GraftFunctions.register`) or via `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object GraftFunctions {
  val dotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[ArrayDotProduct].getName, "graft_dot"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, s"graft_dot takes 2 arguments, got ${exprs.length}")
      ArrayDotProduct(exprs.head, exprs(1))
    })

  val bottomkDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bottomk"),
    new ExpressionInfo(classOf[BottomK].getName, "graft_bottomk"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, s"graft_bottomk takes (expr, k), got ${exprs.length} args")
      require(exprs(1).foldable, "graft_bottomk's k must be a constant")
      BottomK(exprs.head, exprs(1).eval(null).asInstanceOf[Number].intValue)
    })

  /** Idempotent in-session registration (used by the operator builders so
    * `selectExpr("graft_dot(a, b)")` resolves without extensions config). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      dotDescriptor._1, dotDescriptor._2, dotDescriptor._3)
    spark.sessionState.functionRegistry.registerFunction(
      bottomkDescriptor._1, bottomkDescriptor._2, bottomkDescriptor._3)
  }
}

/** `spark.sql.extensions` entry point: injects graft's native functions
  * into every session built with the extension configured. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.dotDescriptor)
    ext.injectFunction(GraftFunctions.bottomkDescriptor)
  }
}
