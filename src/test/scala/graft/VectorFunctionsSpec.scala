package graft

import graft.functions.{CosineSimilarity, VectorFunctions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Vector math: composed higher-order form vs native codegen expression must
  * agree bit-for-bit (same fold order, same double math). */
class VectorFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("native cosine_sim equals composed form bit-for-bit on real data") {
    val e = Tables.embeddings(spark, TestSpark.sf0001)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val both = e.crossJoin(broadcast(q)).select(
      VectorFunctions.cosineSim(col("embedding"), col("qe")).as("composed"),
      CosineSimilarity(col("embedding"), col("qe")).as("native"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("cosine_sim basics: self=1, orthogonal=0, range [-1,1]") {
    import spark.implicits._
    val df = Seq(
      (Array(1f, 0f, 2f), Array(1f, 0f, 2f)),
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
      (Array(1f, 1f, 0f), Array(-1f, -1f, 0f)))
      .toDF("a", "b")
    val sims = df.select(CosineSimilarity(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(math.abs(sims(0) - 1.0) < 1e-12)
    assert(sims(1) == 0.0)
    assert(math.abs(sims(2) + 1.0) < 1e-12)
  }

  test("cosine_sim edge cases: zero-norm and length mismatch yield NULL, matching composed form") {
    import spark.implicits._
    val df = Seq(
      (Array(0f, 0f, 0f), Array(1f, 2f, 3f)),  // zero left norm
      (Array(1f, 2f, 3f), Array(0f, 0f, 0f)),  // zero right norm
      (Array(1f, 2f), Array(1f, 2f, 3f)))      // length mismatch
      .toDF("a", "b")
    val rows = df.select(
      CosineSimilarity(col("a"), col("b")).as("native"),
      VectorFunctions.cosineSim(col("a"), col("b")).as("composed")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0), s"native should be NULL, got $r")
      assert(r.isNullAt(1), s"composed should be NULL, got $r")
    }
    // and the interpreted (non-codegen) path agrees
    val interp = CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(0f, 0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1f, 2f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
      .eval(null)
    assert(interp == null)
  }

  test("int8_quantize native expression matches the composed HOF form") {
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, TestSpark.sf0001)
    val composed = e
      .withColumn("scale",
        array_max(transform(col("embedding"), x => abs(x.cast("double")))))
      .filter(col("scale") > 0)
      .withColumn("qv", transform(col("embedding"),
        x => (x.cast("double") * 127.0 / col("scale")).cast("long")))
      .select(col("vec_id"), col("qv"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Long](1)).toMap
    val native = e
      .withColumn("qv", graft.functions.Int8Quantize(col("embedding")))
      .filter(col("qv").isNotNull)
      .select(col("vec_id"), col("qv"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Byte](1).map(_.toLong)).toMap
    assert(native.nonEmpty && native.keySet == composed.keySet)
    native.foreach { case (id, qv) => assert(qv == composed(id), s"vec $id") }
    // zero vector → NULL (interpreted path)
    val interp = graft.functions.Int8Quantize(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(0f, 0f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
      .eval(null)
    assert(interp == null)
  }

  test("int8_quantize registered for SQL via GraftExtensions injector") {
    new graft.plans.GraftExtensions()
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "int8_quantize",
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.Int8Quantize(args(0)),
      "built-in")
    val r = spark.sql(
      "SELECT int8_quantize(array(CAST(0.5 AS FLOAT), CAST(-1.0 AS FLOAT))) AS q")
      .head.getSeq[Byte](0)
    assert(r == Seq(63.toByte, -127.toByte))
  }

  test("cosine_sim registered for SQL via GraftExtensions injector") {
    // function injection happens at session build; register directly here to
    // exercise the same builder on the shared session
    new graft.plans.GraftExtensions()
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.CosineSimilarity(args(0), args(1)),
      "built-in")
    val r = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS s")
      .head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }
}
