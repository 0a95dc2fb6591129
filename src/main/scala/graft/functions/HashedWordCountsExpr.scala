package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: hashed bag-of-words count features of a
  * text column as one `array<long>` of length `nF` — element b = #words
  * whose portable 31-bit polynomial hash lands in bucket b. The classifier
  * and DSIR hot path ([[graft.operators.Classifier.hashedCounts]]).
  *
  * Why native (the [[LshBuckets]]/[[PqEncode]] lesson applied to TEXT):
  * the composed form — `transform(filter(split(text,' '), …),
  * w -> aggregate(transform(split(w,''), ascii), …))` plus nF
  * `filter+size` passes — evaluates every per-word lambda through
  * Catalyst's INTERPRETED higher-order-function path (HOF lambdas never
  * enter whole-stage codegen) and allocates a char-array per word; the
  * round-9 wide yardstick measured it at ~45 s per corpus pass at the
  * ×10 replica (q161 151 s, q157 94 s, q152 49 s — 13–161× DuckDB on
  * identical algorithms). Here the whole feature vector is ONE generated
  * loop over the string's code points: no splits, no per-word arrays, no
  * HOF dispatch — the scan stays inside WholeStageCodegen.
  *
  * Bit-compatibility with the composed form (and so with the DuckDB
  * oracle's `list_reduce(list_transform(string_split(w,''), ascii), …)`):
  * words are maximal runs between single 0x20 spaces (consecutive spaces
  * yield empty words, which are skipped — `filter(w =!= "")`); each
  * word's hash folds left-to-right over its CODE POINTS as
  * `h = (h*31 + cp) % 2147483647` from 0; bucket = `h % nF` (h ≥ 0, so
  * the Spark and ANSI `%` agree). The corpus contract is ASCII text
  * (driver-generated; verified), where code points, code units, and
  * bytes coincide across all three formulations. One deliberate delta:
  * NULL text nulls out (array-typed null), where the composed form
  * produced an nF-array of null ELEMENTS — downstream scores are null
  * either way; ClassifierSpec pins both the ASCII equivalence and the
  * null shape. */
case class HashedWordCounts(child: Expression, nF: Int)
    extends UnaryExpression {
  require(nF > 0 && nF <= 65536, s"nF=$nF out of range")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_word_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val counts = new Array[Long](nF)
    var h = 0L
    var inWord = false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      if (cp == 0x20) {
        if (inWord) counts((h % nF).toInt) += 1L
        h = 0L
        inWord = false
      } else {
        h = (h * 31L + cp) % 2147483647L
        inWord = true
      }
    }
    if (inWord) counts((h % nF).toInt) += 1L
    new GenericArrayData(counts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val s = ctx.freshName("s")
      val counts = ctx.freshName("counts")
      val h = ctx.freshName("h")
      val inWord = ctx.freshName("inWord")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $s = $str.toString();
         |long[] $counts = new long[$nF];
         |long $h = 0L;
         |boolean $inWord = false;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $i += java.lang.Character.charCount($cp);
         |  if ($cp == 0x20) {
         |    if ($inWord) $counts[(int) ($h % $nF)] += 1L;
         |    $h = 0L;
         |    $inWord = false;
         |  } else {
         |    $h = ($h * 31L + $cp) % 2147483647L;
         |    $inWord = true;
         |  }
         |}
         |if ($inWord) $counts[(int) ($h % $nF)] += 1L;
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($counts);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedWordCounts {
  /** Column-level entry point. */
  def apply(text: org.apache.spark.sql.Column, nF: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftShims.column(
      HashedWordCounts(org.apache.spark.sql.GraftShims.expression(text), nF))
}
