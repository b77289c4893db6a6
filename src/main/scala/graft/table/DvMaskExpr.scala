package graft.table

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side resolver from a scan's ABSOLUTE file path to that
  * file's broadcast payload (sorted deletion-vector positions, or the
  * position-diff pair the change feed uses). The broadcast map is keyed
  * by TABLE-RELATIVE path; the scan emits absolute paths — resolved once
  * per distinct file by suffix match, then cached for every following
  * row of the task. Shared by the interpreted and generated code paths,
  * so both evaluate identically. */
private[table] final class DvPathResolver[T <: AnyRef](
    bc: Broadcast[Map[String, T]], empty: T) extends Serializable {
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, T]()
  def payloadFor(fp: UTF8String): T = {
    val k = fp.toString
    var v = cache.get(k)
    if (v == null) {
      v = bc.value.collectFirst { case (rel, p) if k.endsWith(rel) => p }
        .getOrElse(empty)
      cache.put(k, v)
    }
    v
  }
}

/** Codegen'd deletion-vector mask — the row-survival predicate of every
  * DV'd scan: TRUE iff (file, position) is absent from the file's sorted
  * vector. Replaces the boxed Scala UDF that previously sat on the DV
  * read hot path: whole-stage codegen calls straight into a primitive
  * binary search with no row boxing, no ScalaUDF bridge, and the scan's
  * codegen span stays unbroken (SURVEY §4: widen WholeStageCodegen). */
private[table] case class DvKeepExpr(left: Expression, right: Expression,
                                     resolver: DvPathResolver[Array[Long]])
    extends BinaryExpression with Predicate {

  override def prettyName: String = "dv_keep"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(fp: Any, ri: Any): Any =
    java.util.Arrays.binarySearch(
      resolver.payloadFor(fp.asInstanceOf[UTF8String]),
      ri.asInstanceOf[Long]) < 0

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (fp, ri) => {
      val res = ctx.addReferenceObj("dvResolver", resolver,
        classOf[DvPathResolver[Array[Long]]].getName)
      s"""
         |${ev.value} = java.util.Arrays.binarySearch(
         |  (long[]) $res.payloadFor($fp), $ri) < 0;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd change-feed swap weight: +1 where the OLD vector masked and
  * the new does not (resurrected), −1 where the NEW vector masks
  * (deleted), 0 elsewhere — the per-row classification of the CDF's
  * DV-swap fast path, over the broadcast (insert, delete) position
  * pair. Same shape and rationale as [[DvKeepExpr]]. */
private[table] case class DvSwapWeightExpr(
    left: Expression, right: Expression,
    resolver: DvPathResolver[(Array[Long], Array[Long])])
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dv_swap_weight"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(fp: Any, ri: Any): Any = {
    val (ins, del) = resolver.payloadFor(fp.asInstanceOf[UTF8String])
    val r = ri.asInstanceOf[Long]
    if (java.util.Arrays.binarySearch(ins, r) >= 0) 1L
    else if (java.util.Arrays.binarySearch(del, r) >= 0) -1L
    else 0L
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (fp, ri) => {
      val res = ctx.addReferenceObj("dvSwapResolver", resolver,
        classOf[DvPathResolver[(Array[Long], Array[Long])]].getName)
      val pair = ctx.freshName("pair")
      s"""
         |scala.Tuple2 $pair = (scala.Tuple2) $res.payloadFor($fp);
         |${ev.value} =
         |  java.util.Arrays.binarySearch((long[]) $pair._1(), $ri) >= 0 ? 1L :
         |  (java.util.Arrays.binarySearch((long[]) $pair._2(), $ri) >= 0 ? -1L : 0L);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
