package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._

/** Mergeable KLL quantile sketches (Datasketches) as native Catalyst
  * aggregates — the quantile twin of Spark's built-in hll_sketch_agg /
  * hll_union_agg / hll_sketch_estimate trio, which Spark 4 does not
  * ship for quantiles.
  *
  * Why TypedImperativeAggregate and not an Aggregator UDAF: the buffer
  * is the live heap sketch object, serialized ONLY at partial-exchange
  * boundaries (one toByteArray per map task, not per row); an
  * Aggregator with a BINARY encoder would round-trip the sketch through
  * bytes on every reduce call. This is the "custom Catalyst Expression
  * beats a Scala UDF" preference applied to aggregation state.
  *
  * 100 TB role: per-group/per-partition/per-day sketches are computed
  * once (map-side, bounded ~[K=200] buffer each), persisted as BINARY,
  * and re-aggregated along any rollup dimension with kll_merge_agg —
  * quantile rollups without rescanning, the property exact quantiles
  * fundamentally lack. Rank error for K=200 is ~1.65% (normalized),
  * which the operator query pins with an exact-vs-merged agreement
  * bound, same convention as q_agg_hll_merge.
  */
case class KllSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  /** Sketch accuracy parameter (normalized rank error ~1.65%). */
  private val SketchK = 200

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_sketch_agg expects a DOUBLE input, got ${child.dataType.simpleString}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(SketchK)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray

  override def deserialize(storage: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(storage))

  override def withNewMutableAggBufferOffset(n: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "kll_sketch_agg"
}

/** Union of serialized KLL sketches — the rollup re-aggregation step.
  * Input rows are BINARY images produced by [[KllSketchAgg]] (or an
  * earlier kll_merge_agg); the buffer merges them heap-side and emits
  * the merged image. */
case class KllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_merge_agg expects BINARY sketch images, got ${child.dataType.simpleString}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(200)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray

  override def deserialize(storage: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(storage))

  override def withNewMutableAggBufferOffset(n: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
  override def prettyName: String = "kll_merge_agg"
}

/** kll_sketch_quantile(sketch_bytes, fraction) → the sketch's quantile
  * estimate (INCLUSIVE search criteria), NULL for an empty sketch.
  * Evaluated once per sketch image (a handful of rows after the
  * aggregate), so CodegenFallback costs nothing measurable. */
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "kll_sketch_quantile expects (BINARY, DOUBLE), got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(bytes: Any, frac: Any): Any = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else sk.getQuantile(frac.asInstanceOf[Double], QuantileSearchCriteria.INCLUSIVE)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "kll_sketch_quantile"
}

/** Frequency (heavy-hitter) sketch aggregate over LONG items —
  * Datasketches LongsSketch, the Misra-Gries-family summary. Unlike
  * KLL it is fully DETERMINISTIC: while the item domain stays under
  * the map capacity no eviction occurs and every estimate is EXACT;
  * above capacity the guarantee degrades gracefully to the
  * [[FreqLowerBound]]/[[FreqUpperBound]] envelope (±n/maxMapSize),
  * which ALWAYS brackets the true frequency — the property the
  * operator query pins (round 19: the former exact-equality pin held
  * only below capacity — sf0.01's 100 suppliers — and was measured
  * FALSE at sf0.1's 1000). Completes the mergeable-sketch triad (HLL
  * distinct / KLL quantile / frequency). */
case class FreqSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.datasketches.frequencies.LongsSketch]
  with UnaryLike[Expression] {

  private type FSketch = org.apache.datasketches.frequencies.LongsSketch

  /** Map capacity (power of two); exact while #distinct items < ~0.75·this. */
  private val MaxMapSize = 512

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_sketch_agg expects a BIGINT input, got ${child.dataType.simpleString}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): FSketch =
    new org.apache.datasketches.frequencies.LongsSketch(MaxMapSize)

  override def update(buffer: FSketch, input: InternalRow): FSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: FSketch, other: FSketch): FSketch =
    buffer.merge(other)

  override def eval(buffer: FSketch): Any = buffer.toByteArray
  override def serialize(buffer: FSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(storage: Array[Byte]): FSketch =
    org.apache.datasketches.frequencies.LongsSketch.getInstance(Memory.wrap(storage))

  override def withNewMutableAggBufferOffset(n: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): FreqSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "freq_sketch_agg"
}

/** Weighted frequency-sketch build (round 20): updates the LongsSketch
  * with (item, weight) pairs — `update(v, w)` — so a sketch can be fed
  * from an ALREADY-AGGREGATED histogram instead of re-scanning raw
  * rows. Misra-Gries' deterministic guarantee (lowerBound ≤ true ≤
  * upperBound after any update sequence, weighted or not) is exactly
  * the property the operator queries pin, so building from the
  * histogram keeps every pinned output identical while removing a full
  * raw-row pass. Null item or null/≤0 weight contributes nothing
  * (matching the unweighted agg's null skip). */
case class FreqSketchAggW(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.datasketches.frequencies.LongsSketch]
  with BinaryLike[Expression] {

  private type FSketch = org.apache.datasketches.frequencies.LongsSketch

  private val MaxMapSize = 512

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_sketch_agg_w expects (BIGINT item, BIGINT weight), got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): FSketch =
    new org.apache.datasketches.frequencies.LongsSketch(MaxMapSize)

  override def update(buffer: FSketch, input: InternalRow): FSketch = {
    val v = left.eval(input)
    val w = right.eval(input)
    if (v != null && w != null && w.asInstanceOf[Long] > 0L)
      buffer.update(v.asInstanceOf[Long], w.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: FSketch, other: FSketch): FSketch =
    buffer.merge(other)

  override def eval(buffer: FSketch): Any = buffer.toByteArray
  override def serialize(buffer: FSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(storage: Array[Byte]): FSketch =
    org.apache.datasketches.frequencies.LongsSketch.getInstance(Memory.wrap(storage))

  override def withNewMutableAggBufferOffset(n: Int): FreqSketchAggW =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): FreqSketchAggW =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): FreqSketchAggW = copy(left = l, right = r)
  override def prettyName: String = "freq_sketch_agg_w"
}

/** Union of serialized frequency sketches — the rollup step. */
case class FreqMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.datasketches.frequencies.LongsSketch]
  with UnaryLike[Expression] {

  private type FSketch = org.apache.datasketches.frequencies.LongsSketch

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_merge_agg expects BINARY sketch images, got ${child.dataType.simpleString}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): FSketch =
    new org.apache.datasketches.frequencies.LongsSketch(512)

  override def update(buffer: FSketch, input: InternalRow): FSketch = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(org.apache.datasketches.frequencies.LongsSketch
        .getInstance(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(buffer: FSketch, other: FSketch): FSketch =
    buffer.merge(other)

  override def eval(buffer: FSketch): Any = buffer.toByteArray
  override def serialize(buffer: FSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(storage: Array[Byte]): FSketch =
    org.apache.datasketches.frequencies.LongsSketch.getInstance(Memory.wrap(storage))

  override def withNewMutableAggBufferOffset(n: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): FreqMergeAgg =
    copy(child = newChild)
  override def prettyName: String = "freq_merge_agg"
}

/** freq_sketch_estimate(sketch_bytes, item) → the sketch's frequency
  * estimate for the item (exact below capacity). */
case class FreqEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "freq_sketch_estimate expects (BINARY, BIGINT), got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(bytes: Any, item: Any): Any =
    org.apache.datasketches.frequencies.LongsSketch
      .getInstance(Memory.wrap(bytes.asInstanceOf[Array[Byte]]))
      .getEstimate(item.asInstanceOf[Long])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FreqEstimate =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "freq_sketch_estimate"
}

/** Deterministic Misra-Gries LOWER bound for an item's true frequency:
  * `lower ≤ trueFreq ≤ upper` holds at EVERY scale, eviction or not —
  * the scale-robust agreement pin (round 19: the former exact-equality
  * pin in q_agg_freq_merge was measured FALSE at sf0.1, where the
  * 1000-supplier domain exceeds the 512-entry map and eviction begins;
  * the sf0.01 driver gate's 100-supplier domain had hidden it). */
case class FreqLowerBound(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "freq_sketch_lower expects (BINARY, BIGINT), got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(bytes: Any, item: Any): Any =
    org.apache.datasketches.frequencies.LongsSketch
      .getInstance(Memory.wrap(bytes.asInstanceOf[Array[Byte]]))
      .getLowerBound(item.asInstanceOf[Long])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FreqLowerBound =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "freq_sketch_lower"
}

/** Deterministic Misra-Gries UPPER bound — see [[FreqLowerBound]]. */
case class FreqUpperBound(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "freq_sketch_upper expects (BINARY, BIGINT), got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(bytes: Any, item: Any): Any =
    org.apache.datasketches.frequencies.LongsSketch
      .getInstance(Memory.wrap(bytes.asInstanceOf[Array[Byte]]))
      .getUpperBound(item.asInstanceOf[Long])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FreqUpperBound =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "freq_sketch_upper"
}

/** Column-API entry points (the operator library path; the SQL names are
  * registered by [[GraftExtensions]] for the gateway surface). */
object SketchExprs {
  import org.apache.spark.sql.{Column, GraftShim}
  import org.apache.spark.sql.catalyst.expressions.Literal

  def kllSketchAgg(c: Column): Column =
    GraftShim.column(KllSketchAgg(GraftShim.expression(c)).toAggregateExpression())
  def kllMergeAgg(c: Column): Column =
    GraftShim.column(KllMergeAgg(GraftShim.expression(c)).toAggregateExpression())
  def kllQuantile(c: Column, p: Double): Column =
    GraftShim.column(KllQuantile(GraftShim.expression(c), Literal(p)))
  def freqSketchAgg(c: Column): Column =
    GraftShim.column(FreqSketchAgg(GraftShim.expression(c)).toAggregateExpression())
  def freqSketchAggW(item: Column, weight: Column): Column =
    GraftShim.column(FreqSketchAggW(GraftShim.expression(item),
      GraftShim.expression(weight)).toAggregateExpression())
  def freqMergeAgg(c: Column): Column =
    GraftShim.column(FreqMergeAgg(GraftShim.expression(c)).toAggregateExpression())
  def freqEstimate(sk: Column, item: Column): Column =
    GraftShim.column(FreqEstimate(GraftShim.expression(sk), GraftShim.expression(item)))
  def freqLowerBound(sk: Column, item: Column): Column =
    GraftShim.column(FreqLowerBound(GraftShim.expression(sk), GraftShim.expression(item)))
  def freqUpperBound(sk: Column, item: Column): Column =
    GraftShim.column(FreqUpperBound(GraftShim.expression(sk), GraftShim.expression(item)))
}
