package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst membership probe against a pre-built broadcast Bloom
  * filter (the scan-side prune of [[graft.operators.BloomJoin]]): returns
  * whether `child` (a LongType join key) MIGHT be in the filter. Replaces
  * the closure-UDF probe that broke whole-stage codegen on the fact scan —
  * the filter bytes ride the serialized expression (same mechanism Spark's
  * own runtime-bloom `might_contain` uses), deserialized once per JVM via a
  * transient lazy, and the generated code is a single virtual call per row
  * inside the scan's codegen span.
  *
  * NULL keys probe to `false` — a NULL never survives the inner equi-join
  * the probe guards, so dropping it at the scan is result-identical. Never
  * returns NULL itself (nullable=false), which lets the planner keep the
  * filter in the pushed-predicate pipeline.
  */
case class BloomContainsLong(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression with Predicate {

  override def prettyName: String = "bloom_contains_long"
  override def nullable: Boolean = false

  @transient private lazy val filter: BloomFilter = BloomFilter.readFrom(filterBytes)

  /** Called from generated code — keep public and cheap. */
  def probe(k: Long): Boolean = filter.mightContainLong(k)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    v != null && filter.mightContainLong(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomContainsLong].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        boolean ${ev.value} = !${c.isNull} && $ref.probe(${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomContainsLong {
  /** Column-level entry point. */
  def apply(key: Column, filter: BloomFilter): Column = {
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      filter.writeTo(bos)
      bos.toByteArray
    }
    org.apache.spark.sql.GraftShims.column(
      BloomContainsLong(org.apache.spark.sql.GraftShims.expression(key), bytes))
  }
}
