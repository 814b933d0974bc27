package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** nfc_normalize(str) — Unicode NFC normalization as a codegen'd Catalyst
  * expression. A web-crawled corpus mixes composed ("é", U+00E9) and
  * decomposed ("e" + U+0301) spellings of identical text: exact dedup,
  * shingling, and tokenizer vocabularies all treat them as different
  * bytes unless a normalization pass runs first, silently halving dedup
  * recall on accented languages. Spark has no builtin for this;
  * `java.text.Normalizer` is in every JVM (zero new deps) and DuckDB's
  * `nfc_normalize` replays it exactly for the oracle. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = StringType
  // type not annotated: AbstractDataType is private[sql] in Spark 4
  override def inputTypes = Seq(StringType)
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static so generated code can call it directly. Already-normalized
    * strings (the overwhelmingly common case — all of ASCII) short-cut
    * through the quick-check without allocating. */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def nfc_normalize(str: Column): Column =
    graftshim.column(NfcNormalize(graftshim.expression(str)))
}
