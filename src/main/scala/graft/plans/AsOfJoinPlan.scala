package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  BindReferences, Descending, Expression, GenericInternalRow, JoinedRow,
  SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan,
  SparkStrategy}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** AS-OF JOIN as a first-class operator — the full tier-(c) extension
  * surface (custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`,
  * registered through `SparkSessionExtensions.injectPlannerStrategy`),
  * complementing the repo's tier-(a) compositions (j15's union-ffill),
  * tier-(b) expression/rule extensions (`graft_dot`, BandJoinRewrite).
  *
  * Semantics: inclusive as-of, both directions — backward (default):
  * for every left row, the right row with the greatest rightTime ≤
  * leftTime within the same key (DuckDB's `ASOF LEFT JOIN` with
  * `l.t >= r.t`, pandas `merge_asof(direction="backward")`); forward:
  * the SMALLEST rightTime ≥ leftTime (`direction="forward"`), executed
  * as the identical merge over time-DESCENDING child order — the
  * direction only flips the sort and the comparison, not the O(1)
  * algorithm. Optional `toleranceUs` bounds |leftTime − rightTime|
  * (applied at emit: the held candidate is by construction the nearest
  * eligible row, so out-of-tolerance ⇒ no row qualifies). Unmatched
  * left rows null-extend. j19's oracle runs DuckDB's NATIVE ASOF JOIN
  * against the backward exec; j20 proves forward+tolerance against a
  * naive range-join replay.
  *
  * Scale/plan shape: `requiredChildDistribution` clusters both sides on
  * the key and `requiredChildOrdering` sorts (key, time), so
  * EnsureRequirements plans exactly one hash exchange + sort per side —
  * the SortMergeJoin cost envelope — and the merge itself is a single
  * forward scan per partition holding ONE buffered right row (no
  * per-key candidate set, no window, O(1) state). Contrast: a naive
  * range-join + argmax enumerates O(clicks × purchases) pairs per key
  * (ScaleProbe `asof` measured that contrast on the composed variant).
  *
  * Restrictions (asserted at construction): key and time must be
  * integral/timestamp-typed (both are Long-backed internally) and the
  * two sides must carry disjoint expression ids (alias the right side's
  * columns when self-joining one table). Null keys/times follow DuckDB
  * `ASOF LEFT JOIN` semantics: a null left key or time never matches
  * (the row null-extends); a null right key or time is never a match
  * candidate (skipped by the merge). Both are safe against the merge's
  * sort invariants because Spark sorts nulls first under Ascending and
  * last under Descending — the skip cases sit at a key-group boundary
  * either way.
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression,
    forward: Boolean = false,
    toleranceUs: Option[Long] = None) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Physical merge-scan for [[AsOfJoin]]. */
case class AsOfJoinExec(leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression,
    forward: Boolean, toleranceUs: Option[Long],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  private def timeDir = if (forward) Descending else Ascending

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, timeDir)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, timeDir)))

  override def outputPartitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, timeDir))

  /** Boxed eval: LongType eval already returns a boxed java.lang.Long,
    * so the null check costs no extra allocation. */
  private def evalLong(e: Expression, row: InternalRow): java.lang.Long =
    e.eval(row).asInstanceOf[java.lang.Long]

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lk = BindReferences.bindReference(leftKey, lOut)
      val lt = BindReferences.bindReference(leftTime, lOut)
      val rk = BindReferences.bindReference(rightKey, rOut)
      val rt = BindReferences.bindReference(rightTime, rOut)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      // bind against NULLABLE right attrs: the input side of the
      // projection must read the null bits of the null-extension row,
      // or non-nullable right columns silently decode as 0 on a miss
      val toUnsafe =
        UnsafeProjection.create(outAttrs, lOut ++ rOut.map(_.withNullability(true)))
      // single-row buffered right state: the latest right row whose
      // (key, time) is ≤ the current left cursor — O(1) per partition
      var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
      var held: InternalRow = null
      var heldKey = 0L
      var heldTime = 0L
      var heldValid = false
      val fwd = forward
      val tol = toleranceUs
      lIter.map { l =>
        val lkvB = evalLong(lk, l)
        val ltvB = evalLong(lt, l)
        if (lkvB == null || ltvB == null) {
          // null left key/time never matches anything — null-extend
          // (DuckDB ASOF LEFT JOIN). Sorted nulls-first/-last, so the
          // held state for real keys is untouched.
          joined(l, nullRight)
          toUnsafe(joined)
        } else {
          val lkv = lkvB.longValue
          val ltv = ltvB.longValue
          if (heldValid && heldKey != lkv) heldValid = false
          var continue = rRow != null
          while (continue) {
            var advance = false
            val rkvB = evalLong(rk, rRow)
            if (rkvB == null) advance = true // null right key: no one's match
            else {
              val rkv = rkvB.longValue
              if (rkv < lkv) advance = true
              else if (rkv == lkv) {
                val rtvB = evalLong(rt, rRow)
                if (rtvB == null) advance = true // null right time: skip —
                // stopping here would strand eligible rows behind it in
                // the nulls-first (backward) layout
                else {
                  val rtv = rtvB.longValue
                  if (if (fwd) rtv >= ltv else rtv <= ltv) {
                    // rows are reused by the upstream sort — copy to
                    // hold; the LAST eligible row consumed is the
                    // nearest one (greatest ≤ lt backward; smallest ≥
                    // lt forward, since forward scans time-descending)
                    held = rRow.copy()
                    heldKey = rkv
                    heldTime = rtv
                    heldValid = true
                    advance = true
                  }
                }
              }
            }
            if (advance) {
              rRow = if (rIter.hasNext) rIter.next() else null
              continue = rRow != null
            } else continue = false
          }
          val matched = heldValid &&
            tol.forall(t => math.abs(ltv - heldTime) <= t)
          joined(l, if (matched) held else nullRight)
          toUnsafe(joined)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical node to the exec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, lt, rk, rt, fwd, tol) =>
      AsOfJoinExec(lk, lt, rk, rt, fwd, tol, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Public builder: `AsOf.join(clicks, purchases, "user_id", "ts",
  * "p_user", "p_ts")`. */
object AsOf {
  private val longBacked =
    Set[org.apache.spark.sql.types.DataType](LongType, TimestampType,
      TimestampNTZType)

  def join(left: DataFrame, right: DataFrame, leftKey: String,
      leftTime: String, rightKey: String, rightTime: String,
      forward: Boolean = false,
      toleranceUs: Option[Long] = None): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String, side: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"as-of $side column '$n' not in ${p.output.map(_.name)}"))
    val (lk, lt) = (attr(lPlan, leftKey, "left"), attr(lPlan, leftTime, "left"))
    val (rk, rt) =
      (attr(rPlan, rightKey, "right"), attr(rPlan, rightTime, "right"))
    Seq(lk, lt, rk, rt).foreach(a => require(longBacked(a.dataType),
      s"as-of key/time must be long/timestamp, got ${a.dataType} for ${a.name}"))
    val dup = lPlan.outputSet.intersect(rPlan.outputSet)
    require(dup.isEmpty,
      s"as-of sides share expression ids (${dup.take(3)}) — alias the " +
        "right side's columns when self-joining one table")
    toleranceUs.foreach(t => require(t >= 0, s"negative tolerance $t"))
    org.apache.spark.sql.graftbridge.Bridge.ofRows(left.sparkSession,
      AsOfJoin(lPlan, rPlan, lk, lt, rk, rt, forward, toleranceUs))
  }
}
