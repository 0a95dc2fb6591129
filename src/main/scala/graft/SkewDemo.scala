package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only salted-join regime demo (r12): q63's fixture measured three
  * ways at a replica scale, so the operator's benefit is evidenced in the
  * regime it exists for — reducer skew on a shuffle join — while the
  * production guard's broadcast choice is shown as the engine's default.
  *
  *   1. engine choice: saltedInnerJoin as declared (guard may pick the
  *      plain/broadcast plan — that IS the right call when the side fits)
  *   2. broadcast OFF, unsalted: the skewed sort-merge join — one reducer
  *      drags the 25%-of-fact hot key (the straggler salting targets;
  *      this is the AQE-disabled/stateful-join regime of the scaladoc)
  *   3. broadcast OFF, salted ×8: the hot key spread across 8 reducers
  *
  * Prints one JSON line for bench/r12/skew_demo.json.
  * Usage: runMain graft.SkewDemo <sfDir>
  */
object SkewDemo {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]"), "32", "graft-skewdemo")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def hotFact = Tables.lineitem(spark, dir).select(
      when(col("l_linenumber") === 1, lit(1L))
        .otherwise(col("l_suppkey")).as("s_suppkey"),
      col("l_quantity"))
    def supp = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_name"))
    def agg(j: org.apache.spark.sql.DataFrame) =
      j.groupBy(col("s_name"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).cast("long").as("qty"))
    def time(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val n = f; (n, (System.nanoTime() - t0) / 1e9)
    }
    val (n1, t1) = time(agg(operators.SkewJoin
      .saltedInnerJoin(hotFact, supp, Seq("s_suppkey"), 8)).count())
    val bc = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(bc)
    spark.conf.set(bc, "-1")
    val (n2, t2) = time(agg(hotFact.join(supp, Seq("s_suppkey"))).count())
    val (n3, t3) = time(agg(operators.SkewJoin
      .saltedInnerJoin(hotFact, supp, Seq("s_suppkey"), 8)).count())
    spark.conf.set(bc, prev)
    require(n1 == n2 && n2 == n3, s"row counts diverge: $n1 $n2 $n3")
    println(f"""{"dir":"$dir","groups":$n1,""" +
      f""""engineChoiceSec":$t1%.2f,""" +
      f""""unsaltedSmjSec":$t2%.2f,"saltedSmjSec":$t3%.2f}""")
    spark.stop()
  }
}
