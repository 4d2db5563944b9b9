package graft.functions

import graft.ops.GkSketch
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `graft_gk_quantile(value, eps, phis)` — Greenwald–Khanna
  * ε-approximate quantiles as a native [[TypedImperativeAggregate]],
  * the custom-AGGREGATE extension tier (the scalar tier is
  * [[DotProduct]], the whole-operator tier is the as-of join): Spark
  * plans it as a real two-level aggregate, so each partition builds a
  * local [[GkSketch]] (map-side partial, O((1/ε)·log(εn)) tuples of
  * state), the shuffle carries only serialized sketches, and the final
  * merge combines them with the rank-bracket merge whose error bound
  * survives any merge order — the exact distributive shape a
  * 1000-executor percentile needs, versus the exact `percentile`'s
  * all-values-to-one-reducer collect per group.
  *
  * Returns `array<double>` of one estimate per requested φ, each
  * guaranteed within `⌈εn⌉` RANKS of `⌈φn⌉` (deterministic guarantee,
  * non-deterministic witness — see [[GkSketch]]'s determinism note;
  * registry row sk7 hashes the bound VERDICT, not the witness).
  * `eps` and `phis` must be foldable (literals), mirroring
  * `percentile_approx(col, percentage, accuracy)`'s contract.
  * Null values are skipped; an all-null/empty group returns NULL.
  */
case class GkQuantile(
    child: Expression,
    epsExpr: Expression,
    phisExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GkSketch] with ImplicitCastInputTypes {

  private lazy val eps: Double = epsExpr.eval() match {
    case d: Double => d
    case other => throw new IllegalArgumentException(
      s"graft_gk_quantile eps must be a double literal, got $other")
  }

  private lazy val phis: Array[Double] =
    phisExpr.eval().asInstanceOf[ArrayData].toDoubleArray()

  override def inputTypes: Seq[DataType] =
    Seq(DoubleType, DoubleType, ArrayType(DoubleType))

  override def checkInputDataTypes(): TypeCheckResult = {
    val defaultCheck = super.checkInputDataTypes()
    if (defaultCheck.isFailure) defaultCheck
    else if (!epsExpr.foldable || !phisExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires literal eps and phis arguments")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): GkSketch = new GkSketch(eps)

  override def update(buffer: GkSketch, input: InternalRow): GkSketch = {
    val v = child.eval(input)
    if (v != null) buffer.insert(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: GkSketch, other: GkSketch): GkSketch =
    buffer.mergeWith(other)

  override def eval(buffer: GkSketch): Any =
    if (buffer.n == 0L) null
    else new GenericArrayData(phis.map(buffer.query))

  override def serialize(buffer: GkSketch): Array[Byte] = buffer.serialize()

  override def deserialize(storageFormat: Array[Byte]): GkSketch =
    GkSketch.deserialize(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): GkQuantile =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): GkQuantile =
    copy(inputAggBufferOffset = newOffset)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_gk_quantile"

  override def children: Seq[Expression] = Seq(child, epsExpr, phisExpr)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GkQuantile =
    copy(child = newChildren(0), epsExpr = newChildren(1),
      phisExpr = newChildren(2))
}
