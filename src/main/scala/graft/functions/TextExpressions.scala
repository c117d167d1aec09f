package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode NFC normalization — the
  * canonical-composition pass a multilingual corpus needs before ANY
  * string-equality-based operator (exact dedup, shingles, vocabulary
  * counts): "é" arrives from the web both precomposed (U+00E9) and
  * decomposed (e + U+0301), and without normalization those are two
  * different tokens, two different shingles, and two different md5
  * digests. Spark ships no normalization builtin; a Scala UDF would
  * break whole-stage codegen in exactly the hot projections dedup
  * runs, so this is a codegen `UnaryExpression` over the JDK's
  * `java.text.Normalizer` (pure JVM, Unicode-standard NFC — the same
  * algorithm DuckDB's `nfc_normalize` implements, which is what makes
  * the operator oracle-checkable).
  */
case class NfcNormalizeExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        "java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  private val NfcName = "graft_nfc"

  /** Register (idempotent) and return the codegen'd NFC Column. */
  def nfcFast(spark: SparkSession)(c: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      NfcName, exprs => NfcNormalizeExpr(exprs.head), "built-in")
    call_function(NfcName, c)
  }
}
