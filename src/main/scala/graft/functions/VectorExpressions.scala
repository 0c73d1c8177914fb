package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst twins of the similarity hot-path column forms — the
  * brief's extension preference (b): custom `Expression`s whose `doGenCode`
  * emits one static call, replacing chains of higher-order functions
  * (`aggregate`/`zip_with`/`transform`) that are interpreted per element
  * (lambda dispatch + boxing per array slot) and sit inside the quadratic
  * pair-expansion loops of the similarity flagships. Every kernel
  * reproduces the composable form's IEEE operation order exactly
  * (left-to-right folds, same null padding), so results are bit-identical
  * — pinned by the golden specs in DedupSimilaritySpec.
  */
// ---------------------------------------------------------------------------
/** cosine(a, b) = dot/(sqrt(na)·sqrt(nb)) with sequential left-to-right
  * accumulation — bit-identical to
  * `aggregate(zip_with(a,b,_*_),0.0,_+_) / (sqrt(aggregate(transform(a,x*x)))
  *  · sqrt(...))` including the null semantics: a null element (or a length
  * mismatch, which zip_with pads with nulls) nulls the dot product and so
  * the whole expression. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine requires two array<double>, got ${l.catalogString}, " +
          r.catalogString)
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.freshName("cosRes")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      Double $res = graft.functions.VectorKernels.cosine($a, $b);
      if ($res == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $res.doubleValue(); }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_cosine"
}

// ---------------------------------------------------------------------------
/** All `nBands` random-hyperplane LSH band values of an array<double> in
  * ONE pass over the vector — bit-identical per band to the composable
  * `Σ_r when(dot_j > 0, 1, 0)·2^r` form where
  * `dot_j = aggregate(zip_with(planes(j), v, _*_), 0.0, _+_)`: each bit's
  * dot accumulates in dimension order, and any null element / length
  * mismatch (zip_with pads with nulls) nulls every dot, turning all bits 0
  * via the `otherwise(0)` branch. Plane signs are the same md5-derived
  * Rademacher matrix (sign(j,d) = +1 iff the first hex char of md5("j:d")
  * has its high bit set). */
case class LshBandValues(child: Expression, lshBits: Int, bandBits: Int,
    dim: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_bands requires array<double>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    VectorKernels.lshBands(input.asInstanceOf[ArrayData], lshBits, bandBits, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernels.lshBands($c, $lshBits, $bandBits, $dim);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_lsh_bands"
}

// ---------------------------------------------------------------------------
/** 16-bit SimHash of a text column in ONE pass — bit-identical to the
  * composable form (split on single space, md5 per word, per hex digit
  * 1..16 a ±1 majority counter, bit i set iff counter > 0): hex digit i of
  * the digest is nibble i, whose high bit is set iff the nibble value ≥ 8.
  * Split semantics match `split(text, " ")` (Java regex split with
  * limit -1: trailing empty strings kept, "" yields [""]). */
case class Simhash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash16 requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    VectorKernels.simhash16(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernels.simhash16($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash16"
}

// ---------------------------------------------------------------------------
object VectorKernels {

  /** Boxed so codegen can signal null (length mismatch / null element —
    * the HOF form's zip_with padding nulls the fold). */
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  // sign matrix cache keyed by (lshBits, dim) — tiny, computed once per JVM
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def signs(lshBits: Int, dim: Int): Array[Array[Double]] =
    signCache.computeIfAbsent((lshBits, dim), { case (bits, d) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(bits) { j =>
        Array.tabulate(d) { k =>
          md.reset()
          val first = md.digest(s"$j:$k".getBytes("UTF-8"))(0)
          if (((first >> 4) & 0xf) >= 8) 1.0 else -1.0
        }
      }
    })

  def lshBands(v: ArrayData, lshBits: Int, bandBits: Int, dim: Int): ArrayData = {
    val nBands = lshBits / bandBits
    val out = new Array[Any](nBands)
    val n = v.numElements()
    // HOF twin: zip_with pads length mismatches with null and a null
    // element nulls every dot -> when(null > 0) takes otherwise(0)
    var clean = n == dim
    var i = 0
    while (clean && i < n) {
      if (v.isNullAt(i)) clean = false
      i += 1
    }
    if (!clean) {
      java.util.Arrays.fill(out.asInstanceOf[Array[Object]], Integer.valueOf(0))
      return new GenericArrayData(out)
    }
    val sm = signs(lshBits, dim)
    val dots = new Array[Double](lshBits)
    var d = 0
    while (d < dim) {
      val x = v.getDouble(d)
      var j = 0
      while (j < lshBits) {
        dots(j) += sm(j)(d) * x
        j += 1
      }
      d += 1
    }
    var b = 0
    while (b < nBands) {
      var bv = 0
      var r = 0
      while (r < bandBits) {
        if (dots(b * bandBits + r) > 0) bv |= 1 << r
        r += 1
      }
      out(b) = bv
      b += 1
    }
    new GenericArrayData(out)
  }

  def simhash16(text: UTF8String): Long = {
    // split(text, " ") semantics: Java regex split, limit -1
    val words = text.toString.split(" ", -1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val counters = new Array[Int](16)
    var w = 0
    while (w < words.length) {
      md.reset()
      md.update(words(w).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val dg = md.digest()
      // hex digits 1..16 = nibbles of the first 8 bytes
      var i = 0
      while (i < 16) {
        val byte = dg(i / 2)
        val nib = if (i % 2 == 0) (byte >> 4) & 0xf else byte & 0xf
        if (nib >= 8) counters(i) += 1 else counters(i) -= 1
        i += 1
      }
      w += 1
    }
    var res = 0L
    var i = 0
    while (i < 16) {
      if (counters(i) > 0) res |= 1L << i
      i += 1
    }
    res
  }

  // ---- Column builders (via the GraftSqlShim Column⇄Expression seam) ------
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.GraftSqlShim.{column, expression}

  def cosineCol(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))

  def lshBandsCol(v: Column, lshBits: Int, bandBits: Int, dim: Int): Column =
    column(LshBandValues(expression(v), lshBits, bandBits, dim))

  def simhash16Col(text: Column): Column =
    column(Simhash16(expression(text)))
}
