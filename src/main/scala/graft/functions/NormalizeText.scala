package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode text canonicalization — the first
  * normalization pass of any multilingual training-data pipeline (the same
  * logical text must dedup/fingerprint identically whether a crawler
  * delivered it composed or decomposed):
  *
  *  - `stripAccents = false`: NFC canonical composition (é as e+◌́ and é as
  *    one code point become the same bytes);
  *  - `stripAccents = true`: NFD decomposition, combining marks dropped,
  *    recomposed to NFC — the classic accent fold (é→e, ö→o, ñ→n), matching
  *    DuckDB/utf8proc `strip_accents` on Latin text (the oracle pins it).
  *
  * Spark has no normalizer built-in, and a Scala UDF would break
  * whole-stage codegen around a per-row operation that sits in the hottest
  * scan of the pipeline — so this is the brief's extension preference (b):
  * a custom `Expression` whose `doGenCode` emits one static call
  * (`java.text.Normalizer` under the hood, already ICU-correct in the JDK).
  * ASCII rows short-circuit without allocating.
  */
case class NormalizeText(child: Expression, stripAccents: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"normalize_text requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NormalizeText.compute(input.asInstanceOf[UTF8String], stripAccents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeText.compute($c, $stripAccents);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "normalize_text"
}

object NormalizeText {
  import java.text.Normalizer

  import org.apache.spark.sql.{Column, SparkSession}
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
  import org.apache.spark.sql.functions.call_function

  /** NFC composition as a Column (registers the expression once). */
  def nfc(spark: SparkSession, c: Column): Column = {
    register(spark); call_function("graft_nfc", c)
  }

  /** Accent fold (NFD → drop marks → NFC) as a Column. */
  def foldAccents(spark: SparkSession, c: Column): Column = {
    register(spark); call_function("graft_fold_accents", c)
  }

  private def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def one(name: String, strip: Boolean): Unit = {
      val id = FunctionIdentifier(name)
      if (!reg.functionExists(id)) reg.registerFunction(
        id, new ExpressionInfo("graft.functions.NormalizeText", name),
        (children: Seq[Expression]) => NormalizeText(children.head, strip))
    }
    one("graft_nfc", strip = false)
    one("graft_fold_accents", strip = true)
  }

  /** Shared kernel for the interpreted and generated paths. */
  def compute(s: UTF8String, stripAccents: Boolean): UTF8String = {
    // fast path: pure-ASCII bytes are NFC-normal and accent-free already
    val n = s.numBytes()
    var ascii = true
    var i = 0
    while (ascii && i < n) { if ((s.getByte(i) & 0x80) != 0) ascii = false; i += 1 }
    if (ascii) return s
    val str = s.toString
    val out =
      if (!stripAccents) Normalizer.normalize(str, Normalizer.Form.NFC)
      else {
        val d = Normalizer.normalize(str, Normalizer.Form.NFD)
        val sb = new java.lang.StringBuilder(d.length)
        // iterate CODE POINTS, not chars: a supplementary-plane combining
        // mark (surrogate pair) must be stripped too, or the fold diverges
        // from utf8proc/strip_accents on non-BMP text
        var j = 0
        while (j < d.length) {
          val cp = d.codePointAt(j)
          if (Character.getType(cp) != Character.NON_SPACING_MARK)
            sb.appendCodePoint(cp)
          j += Character.charCount(cp)
        }
        Normalizer.normalize(sb.toString, Normalizer.Form.NFC)
      }
    UTF8String.fromString(out)
  }
}
