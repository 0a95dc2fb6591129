package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Banded range join must equal the naive theta join and must plan as an
  * equi-join on the band (shuffle/broadcast hash), not a nested loop. */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sides = {
    val ev = Tables.events(spark, TestSpark.sf0001)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      .withColumn("lo", col("p_ts") - expr("INTERVAL 30 MINUTE"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("ts").as("v_ts"))
    (p, v)
  }

  test("banded join equals naive theta join for several band widths") {
    val (p, v) = sides
    val naive = v.join(p, col("v_ts") >= col("lo") && col("v_ts") <= col("p_ts"))
      .select(col("view_id"), col("purchase_id"))
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(naive.nonEmpty)
    Seq(600L * 1000000, 1800L * 1000000, 7200L * 1000000).foreach { band =>
      val banded = RangeJoin.bandedIntervalJoin(v, "v_ts", p, "lo", "p_ts", band)
        .select(col("view_id"), col("purchase_id"))
        .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
      assert(banded == naive, s"band=$band")
    }
  }

  /** Run `f` with the auto-band rule set to `seconds` (0 = off), restoring
    * the session default afterwards. */
  private def withBandConf[T](seconds: Long)(f: => T): T = {
    val key = "spark.graft.rangeJoin.bandSeconds"
    val prev = spark.conf.get(key)
    spark.conf.set(key, seconds.toString)
    try f finally spark.conf.set(key, prev)
  }

  test("banded join plans as an equi join, naive plans as nested loop") {
    val (p, v) = sides
    val bandedPlan = RangeJoin
      .bandedIntervalJoin(v, "v_ts", p, "lo", "p_ts", 60L * 1000000)
      .queryExecution.executedPlan.toString
    assert(!bandedPlan.contains("NestedLoop"), s"unexpected BNLJ:\n$bandedPlan")
    assert(bandedPlan.contains("Join") || bandedPlan.contains("HashJoin"))
    withBandConf(0) {
      val naivePlan = v.join(p,
          col("v_ts") >= col("lo") && col("v_ts") <= col("p_ts"))
        .queryExecution.executedPlan.toString
      assert(naivePlan.contains("NestedLoop"),
        "naive range predicate with the rule off should be the nested-loop baseline")
    }
  }

  test("optimizer rule rewrites the naive interval join to a banded equi join") {
    val (p, v) = sides
    def naive = v.join(p,
        col("v_ts") >= col("lo") && col("v_ts") <= col("p_ts"))
      .select(col("view_id"), col("purchase_id"))
    val baseline = withBandConf(0) {
      naive.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    }
    // default session conf (86400 s): the SAME naive query plans banded
    val qe = naive.queryExecution
    assert(qe.optimizedPlan.toString.contains("__band"),
      s"rule did not fire:\n${qe.optimizedPlan}")
    assert(!qe.executedPlan.toString.contains("NestedLoop"),
      s"still a BNLJ:\n${qe.executedPlan}")
    val got = naive.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(got == baseline)
    assert(got.nonEmpty)
  }

  test("optimizer rule infers the band from the interval's literal span") {
    val (p, v) = sides
    // lo = p_ts − 30 min, hi = p_ts: the rule must band at the 30-minute
    // span (1.8e9 µs), NOT the 86400 s session width — day-wide bands made
    // every same-day pair a residual candidate (10.7 s vs 2.4 s at the ×10
    // yardstick, quadratic in corpus density at scale)
    val naive = v.join(p,
        col("v_ts") >= col("lo") && col("v_ts") <= col("p_ts"))
      .select(col("view_id"), col("purchase_id"))
    val opt = naive.queryExecution.optimizedPlan.toString
    assert(opt.contains("__band"), s"rule did not fire:\n$opt")
    assert(opt.contains("1.8E9"),
      s"expected the inferred 30-minute band (1.8E9 µs) in:\n$opt")
    assert(!opt.contains("8.64E10"),
      s"session-width band used despite an inferable span:\n$opt")
    // an interval whose bounds are NOT one base ± literal (two independent
    // columns) falls back to the session width
    val p2 = p.withColumn("hi2", col("p_ts") + expr("INTERVAL 10 MINUTE"))
      .select(col("purchase_id"), col("lo"), col("hi2"),
        // break the shared base: lo2 comes from a different column
        (col("lo") - expr("INTERVAL 5 MINUTE")).as("lo2"))
    val mixed = v.join(p2,
        col("v_ts") >= col("lo2") && col("v_ts") <= col("hi2"))
    val opt2 = mixed.queryExecution.optimizedPlan.toString
    // lo2 and hi2 both linearize to p_ts ± literal — span = 45 min
    assert(opt2.contains("__band") && opt2.contains("2.7E9"),
      s"chained literal offsets should still infer (45 min = 2.7E9):\n$opt2")
  }

  test("optimizer rule leaves equi-conjunct and open-interval joins alone") {
    val (p, v) = sides
    // equi conjunct present (the q23 shape): no rewrite
    val equi = v.withColumn("k", col("view_id") % 10)
      .join(p.withColumn("k", col("purchase_id") % 10),
        Seq("k"))
      .filter(col("v_ts") >= col("lo") && col("v_ts") <= col("p_ts"))
    assert(!equi.queryExecution.optimizedPlan.toString.contains("__band"))
    // single open bound: no rewrite
    val open = v.join(p, col("v_ts") <= col("p_ts"))
    assert(!open.queryExecution.optimizedPlan.toString.contains("__band"))
  }
}
