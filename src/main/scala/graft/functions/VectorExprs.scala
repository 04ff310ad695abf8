package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native kernels for the hot vector paths.
  *
  * The DataFrame formulation of a per-row centroid argmax —
  * `aggregate(centroids, init, (acc, c) => when(cosine(v, c) > acc.best,
  * …))` with `cosine = dot/(norm·norm)` and `dot` an in-order
  * `zip_with`+`aggregate` fold — is correct and deterministic, but every
  * higher-order function is CodegenFallback: per row it walks an
  * interpreted expression tree k·(3·dim) deep (r15 StreamProbe measured
  * the streaming IVF assignment spending ~1.5 s of its 2 s addBatch
  * there). The kernel below does the same double-precision arithmetic in
  * the same order — left-to-right fold from 0.0, cosine as
  * dot/(norm(v)·norm(c)), strict `>` replacement scanning cells in
  * ascending cell-id order — so every score and the chosen cell are
  * bit-identical to the HOF's, which is what keeps the DuckDB oracle
  * (it mirrors the same fold) green.
  */
object VectorExprs {

  /** In-order dot of two double arrays: ((0.0 + a0·b0) + a1·b1) + … —
    * the exact fold `aggregate(zip_with(a, b, _*_), 0.0, _+_)` performs. */
  private def dotInOrder(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s = s + a(i) * b(i); i += 1 }
    s
  }

  def bestIvfCellKernel(emb: ArrayData, cents: Array[Array[Double]],
      ids: Array[Long], centNorms: Array[Double]): Long = {
    val n = emb.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) { v(i) = emb.getDouble(i); i += 1 }
    val nv = math.sqrt(dotInOrder(v, v))
    var best = Double.NegativeInfinity
    var cell = -1L
    var c = 0
    while (c < cents.length) {
      // dimension mismatch replicates zip_with's null-padding: the HOF's
      // cosine is null there, null > best is false, the cell is skipped
      if (cents(c).length == n) {
        val cs = dotInOrder(v, cents(c)) / (nv * centNorms(c))
        if (cs > best) { best = cs; cell = ids(c) }
      }
      c += 1
    }
    cell
  }

  /** Best-cosine centroid id of a double-array vector (−1 when no cell
    * scores above −∞, e.g. a zero/empty vector whose cosine is NaN) —
    * see [[bestIvfCellKernel]]. `cents` must be sorted by cell id, the
    * order the HOF fold scanned. */
  case class BestIvfCell(child: Expression, ids: Array[Long],
      cents: Array[Array[Double]])
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "best_ivf_cell"

    // norm(c) per cell is row-invariant: precomputed once with the same
    // fold, so the product nv·norm(c) is bit-identical to the HOF's
    private lazy val centNorms: Array[Double] =
      cents.map(c => math.sqrt(dotInOrder(c, c)))

    override def nullSafeEval(input: Any): Any =
      bestIvfCellKernel(input.asInstanceOf[ArrayData], cents, ids, centNorms)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val centsRef = ctx.addReferenceObj("ivfCents", cents, "double[][]")
      val idsRef = ctx.addReferenceObj("ivfIds", ids, "long[]")
      val normsRef = ctx.addReferenceObj("ivfNorms", centNorms, "double[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.VectorExprs.bestIvfCellKernel(" +
          s"$c, $centsRef, $idsRef, $normsRef);")
    }
    override protected def withNewChildInternal(c: Expression): BestIvfCell =
      copy(child = c)
  }

  import org.apache.spark.sql.GraftShims.{column, expression}

  /** `v` must be array<double> (cast float embeddings first — exact
    * widening, the same cast the HOF's dot applied per element). */
  def best_ivf_cell(v: Column, cells: Seq[(Long, Array[Double])]): Column =
    column(BestIvfCell(expression(v), cells.map(_._1).toArray,
      cells.map(_._2).toArray))
}
