package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted and hot-key-split joins must produce exactly the rows of the
  * plain equi-join they replace. */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val li = Tables.lineitem(spark, TestSpark.sf0001)
    .select(col("l_orderkey"), col("l_suppkey"), col("l_quantity"))
  private lazy val supp = Tables.supplier(spark, TestSpark.sf0001)
    .select(col("s_suppkey").as("l_suppkey"), col("s_name"))

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("l_orderkey"), col("l_suppkey"), col("s_name"))
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  test("salted inner join equals plain join") {
    val plain = li.join(supp, Seq("l_suppkey"))
    val salted = SkewJoin.saltedInnerJoin(li, supp, Seq("l_suppkey"), saltFactor = 7)
    assert(sortedRows(salted) == sortedRows(plain))
  }

  test("salted join no-ops to the plain join when the right side is broadcast-sized") {
    // salting guards reducer skew; a broadcast join has no reducers, so a
    // broadcast-sized right side must take the plain (broadcastable) plan —
    // no __salt column, no rand, no 7× build replication (r11 q63 lesson)
    assert(SkewJoin.rightIsBroadcastable(supp))
    val salted = SkewJoin.saltedInnerJoin(li, supp, Seq("l_suppkey"), saltFactor = 7)
    val plan = salted.queryExecution.optimizedPlan.toString
    assert(!plan.contains("__salt") && !plan.contains("rand("), plan)
  }

  test("salting engages (and stays lossless) when broadcast is off the table") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      assert(!SkewJoin.rightIsBroadcastable(supp))
      val salted = SkewJoin.saltedInnerJoin(li, supp, Seq("l_suppkey"), saltFactor = 7)
      val plan = salted.queryExecution.optimizedPlan.toString
      assert(plan.contains("__salt"), plan)
      assert(sortedRows(salted) == sortedRows(li.join(supp, Seq("l_suppkey"))))
    } finally spark.conf.set(key, prev)
  }

  test("hot-key split join equals plain join") {
    val hot = SkewJoin.skewedKeys(li, "l_suppkey", 0.01)
      .collect().map(_.getLong(0)).toSeq
    // with or without detected hot keys, the split plan must be lossless;
    // force at least one key through the hot path
    val hotKeys = if (hot.nonEmpty) hot else Seq(1L)
    val plain = li.join(supp, Seq("l_suppkey"))
    val split = SkewJoin.hotKeySplitJoin(li, supp, "l_suppkey", hotKeys)
    assert(sortedRows(split) == sortedRows(plain))
  }

  test("skewedKeys finds planted skew") {
    import spark.implicits._
    val df = (Seq.fill(900)(1L) ++ (2L to 101L)).toDF("k")
    val found = SkewJoin.skewedKeys(df, "k", 0.5).collect()
    assert(found.map(_.getLong(0)).toSeq == Seq(1L) && found.head.getLong(1) == 900L)
  }
}
