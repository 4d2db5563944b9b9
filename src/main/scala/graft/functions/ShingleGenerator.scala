package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_shingles(text, k)` — a native codegen'd table-valued
  * GENERATOR emitting one row per DISTINCT word k-gram of `text`:
  * `(nsh INT, sh STRING)` where `nsh` is the document's distinct-
  * shingle count (the Jaccard denominator every dedup consumer needs)
  * stamped on each row, so one generator pass feeds both the inverted
  * index and the set-size arithmetic.
  *
  * This is the fourth Catalyst extension tier (scalar Expression →
  * `graft_dot`; TypedImperativeAggregate → `graft_gk_quantile`;
  * physical operator → `AsOfJoinExec`; and now a Generator/UDTF):
  * a `CollectionGenerator` with `inline=true` whose `doGenCode`
  * produces the array-of-struct directly inside the parent
  * WholeStageCodegen span — `GenerateExec.supportCodegen` is true
  * because the expression is NOT a `CodegenFallback`, so the shingle
  * emission fuses with the scan (no typed serialize/deserialize
  * boundary, unlike the previous `mapPartitions` spelling which forced
  * the whole pipeline out of codegen and re-encoded every row).
  *
  * Semantics are identical to the retired Dataset spelling (and to the
  * DuckDB `duckShingles` oracle device): tokens = text split on single
  * spaces with empties dropped; fewer than k tokens → no rows; shingle
  * = k consecutive tokens joined by one space; DISTINCT per document
  * (first-occurrence emission order — consumers aggregate, but the
  * order is still deterministic for both the interpreted and codegen
  * paths, which share [[ShingleGenerator.build]]).
  *
  * Scale: per-row work is O(|text|) scan-local string slicing with a
  * per-document (not per-partition) working set; output rows carry no
  * reference to the input row, so the generate is embarrassingly
  * parallel and nothing shuffles until a consumer aggregates. At
  * 100 TB this is the map side of every shingle-keyed dedup plan.
  */
case class ShingleGenerator(child: Expression, kExpr: Expression)
    extends Expression with CollectionGenerator {

  override def children: Seq[Expression] = Seq(child, kExpr)

  override def prettyName: String = "graft_shingles"

  override val inline: Boolean = true
  override val position: Boolean = false

  override def elementSchema: StructType = new StructType()
    .add("nsh", IntegerType, nullable = false)
    .add("sh", StringType, nullable = false)

  override def collectionType: DataType =
    ArrayType(elementSchema, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != StringType || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_shingles(text, k) expects (STRING, INT), got " +
          s"(${child.dataType.sql}, ${kExpr.dataType.sql})")
    else if (!kExpr.foldable || kExpr.eval() == null)
      TypeCheckResult.TypeCheckFailure(
        "graft_shingles(text, k): k must be a non-null integer literal")
    else if (kExpr.eval().asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure(
        "graft_shingles(text, k): k must be >= 1")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val k: Int = kExpr.eval().asInstanceOf[Int]

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else {
      val arr = ShingleGenerator.build(t.asInstanceOf[UTF8String], k)
      (0 until arr.numElements()).iterator.map(arr.getStruct(_, 2))
    }
  }

  /** The collection (array-of-struct) the Generate loop iterates —
    * same contract as the built-in `Inline`: emit the ArrayData, let
    * `GenerateExec.codeGenCollection` unroll it field-by-field. */
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val textCode = child.genCode(ctx)
    val arrCls = classOf[ArrayData].getName
    ev.copy(code = code"""
      |${textCode.code}
      |boolean ${ev.isNull} = ${textCode.isNull};
      |$arrCls ${ev.value} = null;
      |if (!${ev.isNull}) {
      |  ${ev.value} =
      |    graft.functions.ShingleGenerator.build(${textCode.value}, $k);
      |}""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object ShingleGenerator {

  /** Shared kernel for the interpreted and generated paths: distinct
    * word k-grams in first-occurrence order, each row stamped with the
    * document's distinct count. Called from generated Java via the
    * companion's static forwarder. */
  def build(text: UTF8String, k: Int): ArrayData = {
    val toks = text.toString.split(" ").filter(_.nonEmpty)
    if (toks.length < k) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      val sb = new java.lang.StringBuilder
      while (i + k <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val n = seen.size()
      val rows = new Array[Any](n)
      val it = seen.iterator()
      var r = 0
      while (it.hasNext) {
        rows(r) = new GenericInternalRow(
          Array[Any](n, UTF8String.fromString(it.next())))
        r += 1
      }
      new GenericArrayData(rows)
    }
  }
}
