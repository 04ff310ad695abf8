package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the streaming LM-quality and DSIR document scorers.
  *
  * The HOF formulations (`zip_with`/`transform` over the token array with
  * md5-bucketed `element_at` lookups into a broadcast model row) are
  * CodegenFallback: every bigram walked an interpreted expression tree and
  * paid one or two md5 calls purely to pick the model BUCKET. These
  * kernels score a whole document in one compiled pass against the same
  * model, collected once per corpus snapshot:
  *
  *  - LM bits: the bucketed lookup `element_at(element_at(um, md5bucket),
  *    key)` equals a direct key lookup in the flattened map, so the md5
  *    disappears and every per-bigram bits value is IDENTICAL (same
  *    counts, same integer arithmetic).
  *  - DSIR: the model is KEYED by md5 bucket, so the kernel keeps the
  *    exact `hash56(bigram) % buckets` identity and only removes the
  *    interpreted walk.
  *
  * All arithmetic is integer (long division, floor log2 via bin-length),
  * so kernel and HOF agree bit-for-bit and the DuckDB oracles re-verify.
  */
object LmScoreExprs {

  /** length(bin(x)) - 1 for x >= 0 — floor(log2(x)) with bin(0) -> 0. */
  private def binLen1(x: Long): Long =
    if (x <= 0) 0L else 63L - java.lang.Long.numberOfLeadingZeros(x)

  def lmDocBitsKernel(text: UTF8String, uni: java.util.HashMap[String, Long],
      bg: java.util.HashMap[String, Long], v: Long): InternalRow = {
    // tokenization folded in (PortableHashExprs.tokenize — the kernel
    // tokenizer already documented/tested to match the oracles'
    // string_split_regex(lower(text), '\s+') IF t <> ''): the DataFrame
    // form's filter(split(lower(…))) is itself an interpreted HOF
    val t = PortableHashExprs.tokenize(text)
    val n = t.length
    var bits = 0L
    var i = 0
    while (i < n - 1) {
      val w1 = t(i)
      val k = w1 + " " + t(i + 1)
      val c1 = uni.getOrDefault(w1, 0L)
      val c12 = bg.getOrDefault(k, 0L)
      bits += binLen1((c1 + v) / (c12 + 1L))
      i += 1
    }
    new GenericInternalRow(Array[Any](math.max(n - 1, 0), bits))
  }

  /** struct(nb int, bits_sum long) of a text under the flattened
    * LM model — see [[lmDocBitsKernel]]. */
  case class LmDocBits(child: Expression,
      uni: java.util.HashMap[String, Long],
      bg: java.util.HashMap[String, Long], v: Long)
      extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("nb", IntegerType, nullable = false),
      StructField("bits_sum", LongType, nullable = false)))
    override def prettyName: String = "lm_doc_bits"

    override def nullSafeEval(input: Any): Any =
      lmDocBitsKernel(input.asInstanceOf[UTF8String], uni, bg, v)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val uniRef = ctx.addReferenceObj("lmUni", uni, "java.util.HashMap")
      val bgRef = ctx.addReferenceObj("lmBg", bg, "java.util.HashMap")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.LmScoreExprs.lmDocBitsKernel(" +
          s"$c, $uniRef, $bgRef, ${v}L);")
    }
    override protected def withNewChildInternal(c: Expression): LmDocBits =
      copy(child = c)
  }

  def dsirDocScoreKernel(text: UTF8String, dm: Array[java.lang.Long],
      fallback: Long): InternalRow = {
    val t = PortableHashExprs.tokenize(text)
    val n = t.length
    val buckets = dm.length
    var dsum = 0L
    var i = 0
    while (i < n - 1) {
      val g = t(i) + " " + t(i + 1)
      // the model is keyed by this exact md5 bucket — identity preserved
      val b = (PortableHashExprs.hash56(g) % buckets).toInt
      val d = dm(b)
      dsum += (if (d == null) fallback else d.longValue())
      i += 1
    }
    new GenericInternalRow(Array[Any](math.max(n - 1, 0), dsum))
  }

  /** struct(n int, dsum long) of a text under the DSIR delta
    * array — see [[dsirDocScoreKernel]]. */
  case class DsirDocScore(child: Expression, dm: Array[java.lang.Long],
      fallback: Long)
      extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("n", IntegerType, nullable = false),
      StructField("dsum", LongType, nullable = false)))
    override def prettyName: String = "dsir_doc_score"

    override def nullSafeEval(input: Any): Any =
      dsirDocScoreKernel(input.asInstanceOf[UTF8String], dm, fallback)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val dmRef = ctx.addReferenceObj("dsirDm", dm, "java.lang.Long[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.LmScoreExprs.dsirDocScoreKernel(" +
          s"$c, $dmRef, ${fallback}L);")
    }
    override protected def withNewChildInternal(c: Expression): DsirDocScore =
      copy(child = c)
  }

  import org.apache.spark.sql.GraftShims.{column, expression}

  /** `text` is the raw text column — tokenization happens in-kernel. */
  def lm_doc_bits(text: Column, uni: java.util.HashMap[String, Long],
      bg: java.util.HashMap[String, Long], v: Long): Column =
    column(LmDocBits(expression(text), uni, bg, v))

  /** `text` is the raw text column — tokenization happens in-kernel. */
  def dsir_doc_score(text: Column, dm: Array[java.lang.Long],
      fallback: Long): Column =
    column(DsirDocScore(expression(text), dm, fallback))

  /** The scorers' shared fallback term:
    * `(length(bin(x DIV 1)) - 1)` on a positive long. */
  def floorLog2(x: Long): Long = binLen1(x)
}
