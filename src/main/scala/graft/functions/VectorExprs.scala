package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types._

/** Codegen'd vector kernels (SURVEY.md §4.2 "custom Catalyst Expression
  * only if BENCH demands it" — it does: the zip_with/aggregate
  * formulation of a dot product runs interpreted lambdas per element,
  * which dominates the embedding-similarity operators' runtime).
  *
  * DotProduct accumulates in double over array<float> or array<double>
  * inputs — numerically identical to the higher-order
  * `aggregate(zip_with(a,b,*),0d,+)` left fold it replaces, so the
  * DuckDB oracle twins are unchanged. Null propagation also matches the
  * composed form: mismatched array lengths (zip_with pads with null) or
  * a null element both yield a null result, never a silent truncation.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects array<float|double> inputs, got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def mayHaveNullElems(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    val xf = elemIsFloat(left)
    val yf = elemIsFloat(right)
    val xN = mayHaveNullElems(left)
    val yN = mayHaveNullElems(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if ((xN && x.isNullAt(i)) || (yN && y.isNullAt(i))) return null
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val yGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      // element null checks compiled away when the schema says
      // containsNull=false — the hot embedding path stays branch-free
      val nullCheck =
        if (mayHaveNullElems(left) || mayHaveNullElems(right)) {
          val xc = if (mayHaveNullElems(left)) s"$x.isNullAt($i)" else "false"
          val yc = if (mayHaveNullElems(right)) s"$y.isNullAt($i)" else "false"
          s"if ($xc || $yc) { ${ev.isNull} = true; break; }"
        } else ""
      s"""
         |int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $acc += ((double) $x.$xGet($i)) * ((double) $y.$yGet($i));
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** PQ encode + ADC lookup in one kernel (round 20): for each of the m
  * subspaces, L2-argmin the row's subvector against the broadcast
  * codebook (micro-scaled exact integers, ties to the smaller codeword
  * id) and sum the query's precomputed distance-table entries for the
  * chosen codes. Replaces q_sim_pq's nested
  * aggregate(sequence, struct-argmin(aggregate(zip_with(...)))) tree,
  * whose interpreted per-element lambdas dominated the corpus pass
  * (42.6 s solo at sf10). Numerically IDENTICAL to the composed form:
  * squares accumulate in dimension order in a double, d6 =
  * (long) floor(acc·1e6 + 0.5), strict `<` keeps the earlier codeword
  * on ties — the oracle twin is unchanged.
  *
  * Children: v array<float|double> (the row vector; float elements are
  * widened exactly, so raw embeddings skip the corpus-wide cast pass),
  * cbn array<array<array<double>>> (codebook[s][j] = codeword), tabn
  * array<array<long>> (query table[s][j] = micro-L2). m = cbn length,
  * sub = v length / m. Null input → null (matches the composed form's
  * null propagation); malformed widths are upstream `require`s.
  */
case class PqAdc(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val vOk = first.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    // round-21 (r20 ADVICE): validate the codebook and table children
    // too — a misuse should fail at analysis, not as an opaque
    // ClassCastException at execution
    val cbOk = second.dataType match {
      case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => true
      case _ => false
    }
    val tabOk = third.dataType match {
      case ArrayType(ArrayType(LongType, _), _) => true
      case _ => false
    }
    if (vOk && cbOk && tabOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "pq_adc expects (array<float|double>, array<array<array<double>>>, " +
          "array<array<bigint>>), got " +
          Seq(first, second, third).map(_.dataType.simpleString).mkString(" / "))
  }

  private def vIsFloat: Boolean =
    first.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any, cbn: Any, tabn: Any): Any =
    PqAdc.adc(v.asInstanceOf[ArrayData], vIsFloat,
      cbn.asInstanceOf[ArrayData], tabn.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cbn, tabn) => {
      s"${ev.value} = graft.functions.PqAdc.adc($v, $vIsFloat, $cbn, $tabn);"
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object PqAdc {
  /** The loop the generated code and the interpreted eval both call. */
  def adc(v: ArrayData, vIsFloat: Boolean, cbn: ArrayData, tabn: ArrayData): Long = {
    val m = cbn.numElements()
    // round-21 (r20 ADVICE): the composed form sliced with the
    // corpus-max-derived width while this kernel derives sub from the
    // ROW's own length — on a ragged corpus they would silently read
    // different subvector boundaries, so reject any row whose length
    // is not an exact m-multiple (the upstream require checks only the
    // corpus max); an empty codebook subspace would otherwise surface
    // as an AIOOBE at the table lookup.
    if (m == 0 || v.numElements() % m != 0)
      throw new IllegalStateException(
        s"pq_adc: vector length ${v.numElements()} is not a multiple of m=$m")
    val sub = v.numElements() / m
    var adm = 0L
    var s = 0
    while (s < m) {
      val cws = cbn.getArray(s)
      val tab = tabn.getArray(s)
      val k = cws.numElements()
      if (k == 0)
        throw new IllegalStateException(s"pq_adc: empty codebook subspace $s")
      var bestD = Long.MaxValue
      var bestJ = -1
      var j = 0
      while (j < k) {
        val cw = cws.getArray(j)
        var acc = 0.0
        var i = 0
        while (i < sub) {
          val x = if (vIsFloat) v.getFloat(s * sub + i).toDouble
                  else v.getDouble(s * sub + i)
          val d = x - cw.getDouble(i)
          acc += d * d
          i += 1
        }
        val d6 = math.floor(acc * 1000000.0 + 0.5).toLong
        if (d6 < bestD) { bestD = d6; bestJ = j }
        j += 1
      }
      adm += tab.getLong(bestJ)
      s += 1
    }
    adm
  }
}

/** Nearest-centroid-by-cosine in one kernel (round 21): argmax of
  * dot(v,c)/(nv·nc) over a broadcast centroid table, ties to the
  * smaller id — the semantic-dedup assignment step as a MAP-ONLY
  * projection. Replaces the crossJoin-explode + max_by(id, struct(cos,
  * -id)) groupBy formulation, which shuffled the corpus VECTORS through
  * an N-row exchange per assignment stage (4 exchanges per semantic
  * query; guide §2.3 "shuffle keys, not payloads" — here not even keys
  * need to move). Numerically IDENTICAL to the composed form: the dot
  * accumulates in dimension order (DotProduct's loop), cos compares via
  * SQLOrderingUtil.compareDoubles — the exact comparator Spark's struct
  * ordering applies inside max_by (NaN greatest, -0.0 = 0.0) — and
  * equal cos resolves to the smaller id like the struct's -id key.
  *
  * Children: v array<double>, nv double, gid bigint (< 0 = consider
  * every entry; ≥ 0 = only entries whose gid matches — the two-level
  * coarse assignment's stage 2), cents array<struct<gid:long, id:long,
  * nc:double, c:array<double>>>. Null v/nv/gid/cents → null (the
  * composed form emits no assignment for such rows either); an empty
  * or non-matching centroid table, or a dimension mismatch, throws —
  * malformed inputs fail loudly (round-20 ADVICE convention).
  */
case class NearestCid(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val vOk = first.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val centsOk = fourth.dataType match {
      case ArrayType(StructType(fs), _) if fs.length == 4 =>
        fs(0).dataType == LongType && fs(1).dataType == LongType &&
          fs(2).dataType == DoubleType &&
          (fs(3).dataType match {
            case ArrayType(DoubleType, _) => true
            case _ => false
          })
      case _ => false
    }
    if (vOk && second.dataType == DoubleType && third.dataType == LongType && centsOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "nearest_cid expects (array<double>, double, bigint, " +
          "array<struct<gid:bigint,id:bigint,nc:double,c:array<double>>>), got " +
          Seq(first, second, third, fourth).map(_.dataType.simpleString).mkString(" / "))
  }

  override def nullSafeEval(v: Any, nv: Any, gid: Any, cents: Any): Any =
    NearestCid.nearest(v.asInstanceOf[ArrayData], nv.asInstanceOf[Double],
      gid.asInstanceOf[Long], cents.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, nv, gid, cents) => {
      s"${ev.value} = graft.functions.NearestCid.nearest($v, $nv, $gid, $cents);"
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
  override def prettyName: String = "nearest_cid"
}

object NearestCid {
  /** The loop the generated code and the interpreted eval both call. */
  def nearest(v: ArrayData, nv: Double, gid: Long, cents: ArrayData): Long = {
    val n = cents.numElements()
    val dim = v.numElements()
    var found = false
    var bestCos = 0.0
    var bestId = 0L
    var i = 0
    while (i < n) {
      val e = cents.getStruct(i, 4)
      if (gid < 0L || e.getLong(0) == gid) {
        val id = e.getLong(1)
        val nc = e.getDouble(2)
        val c = e.getArray(3)
        if (c.numElements() != dim)
          throw new IllegalStateException(
            s"nearest_cid: centroid $id has ${c.numElements()} dims, vector has $dim")
        var acc = 0.0
        var j = 0
        while (j < dim) { acc += v.getDouble(j) * c.getDouble(j); j += 1 }
        val cos = acc / (nv * nc)
        val cmp =
          if (!found) 1
          else org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareDoubles(cos, bestCos)
        if (cmp > 0 || (cmp == 0 && id < bestId)) {
          bestCos = cos; bestId = id; found = true
        }
      }
      i += 1
    }
    if (!found)
      throw new IllegalStateException(s"nearest_cid: no centroid matches gid $gid")
    bestId
  }
}

object VectorExprs {
  /** Double dot product of two array<float>/array<double> columns. */
  def dot_product(a: Column, b: Column): Column =
    GraftShim.column(DotProduct(GraftShim.expression(a), GraftShim.expression(b)))

  /** PQ encode + ADC sum against broadcast codebook/table columns. */
  def pq_adc(v: Column, cbn: Column, tabn: Column): Column =
    GraftShim.column(PqAdc(GraftShim.expression(v),
      GraftShim.expression(cbn), GraftShim.expression(tabn)))

  /** Nearest centroid id by cosine against a broadcast centroid table. */
  def nearest_cid(v: Column, nv: Column, gid: Column, cents: Column): Column =
    GraftShim.column(NearestCid(GraftShim.expression(v), GraftShim.expression(nv),
      GraftShim.expression(gid), GraftShim.expression(cents)))
}
