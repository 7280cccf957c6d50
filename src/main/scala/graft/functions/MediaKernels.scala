package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled media-payload kernels for the multimodal operators — the same
  * fold semantics as the nested HOF formulations in [[graft.ops.Multimodal]]
  * (per-frame polynomial hash, then modular sum; every-Nth-char
  * downsample), in one tight loop per row instead of per-element
  * interpreted lambdas. */
object MediaKernels {
  private val P = 1000000007L

  /** Sum over frames of the rolling hash of each frame's code points:
    * frames are `frameLen` chars at offsets k*stride, k in [0, nFrames). */
  def frameSum(s: UTF8String, frameLen: Int, stride: Int): Long = {
    val str = s.toString
    val n = str.length
    // floorDiv: for 0 < n < frameLen, (n-frameLen)/stride must round DOWN
    // (truncating division would fabricate one frame)
    val nFrames = math.max(0, Math.floorDiv(n - frameLen, stride) + 1)
    var total = 0L
    var k = 0
    while (k < nFrames) {
      var h = 0L
      var i = 0
      while (i < frameLen) {
        h = (h * 31 + str.codePointAt(k * stride + i)) % P
        i += 1
      }
      total = (total + h) % P
      k += 1
    }
    total
  }

  /** Scene cuts: count of consecutive frame pairs (k, k+1) whose
    * `frameLen`-char frames at offsets k·stride differ in ≥ `minDiff`
    * positions. Same frame model as [[frameSum]]; one pass, no
    * re-scanning — the HOF formulation's per-comparison substr walk made
    * it quadratic in payload length. */
  def frameCuts(s: UTF8String, frameLen: Int, stride: Int, minDiff: Int): Long = {
    val str = s.toString
    val n = str.length
    val nFrames = math.max(0, Math.floorDiv(n - frameLen, stride) + 1)
    var cuts = 0L
    var k = 0
    while (k < nFrames - 1) {
      var diff = 0
      var i = 0
      while (i < frameLen) {
        if (str.charAt(k * stride + i) != str.charAt((k + 1) * stride + i)) diff += 1
        i += 1
      }
      if (diff >= minDiff) cuts += 1
      k += 1
    }
    cuts
  }

  /** Every `step`-th character of the payload (the downsample/"resize"). */
  def downsample(s: UTF8String, step: Int): UTF8String = {
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length / step + 1)
    var i = 0
    while (i < str.length) {
      sb.append(str.charAt(i))
      i += step
    }
    UTF8String.fromString(sb.toString)
  }
}

case class FrameSum(child: Expression, frameLen: Int, stride: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"frame_sum expects string, got ${t.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    MediaKernels.frameSum(input.asInstanceOf[UTF8String], frameLen, stride)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MediaKernels.frameSum($c, $frameLen, $stride);")
  override protected def withNewChildInternal(newChild: Expression): FrameSum =
    copy(child = newChild)
  override def prettyName: String = "frame_sum"
}

case class Downsample(child: Expression, step: Int) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"downsample expects string, got ${t.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    MediaKernels.downsample(input.asInstanceOf[UTF8String], step)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MediaKernels.downsample($c, $step);")
  override protected def withNewChildInternal(newChild: Expression): Downsample =
    copy(child = newChild)
  override def prettyName: String = "downsample"
}

case class FrameCuts(child: Expression, frameLen: Int, stride: Int, minDiff: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"frame_cuts expects string, got ${t.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    MediaKernels.frameCuts(input.asInstanceOf[UTF8String], frameLen, stride, minDiff)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MediaKernels.frameCuts($c, $frameLen, $stride, $minDiff);")
  override protected def withNewChildInternal(newChild: Expression): FrameCuts =
    copy(child = newChild)
  override def prettyName: String = "frame_cuts"
}

object FrameSum {
  import org.apache.spark.sql.graftbridge.Bridge
  def apply(c: Column, frameLen: Int, stride: Int): Column =
    Bridge.column(FrameSum(Bridge.expression(c), frameLen, stride))
}

object FrameCuts {
  import org.apache.spark.sql.graftbridge.Bridge
  def apply(c: Column, frameLen: Int, stride: Int, minDiff: Int): Column =
    Bridge.column(FrameCuts(Bridge.expression(c), frameLen, stride, minDiff))
}

object Downsample {
  import org.apache.spark.sql.graftbridge.Bridge
  def apply(c: Column, step: Int): Column =
    Bridge.column(Downsample(Bridge.expression(c), step))
}

/** Code-point histogram summary of a payload string: the count of the
  * most frequent code point and the number of distinct code points, in
  * one compiled walk. Character (not byte) indexed so the DuckDB mirror
  * (`text[i]` + GROUP BY) counts the identical units on any BMP text.
  * Which character holds the mode is deliberately NOT emitted — MAX of
  * counts is tiebreak-free where argmax would not be. */
case class CharStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("mode_cnt", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"char_stats expects string, got ${t.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    CharStats.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharStats.compute($c);")
  override protected def withNewChildInternal(newChild: Expression): CharStats =
    copy(child = newChild)
  override def prettyName: String = "char_stats"
}

object CharStats {
  import org.apache.spark.sql.graftbridge.Bridge
  def apply(c: Column): Column = Bridge.column(CharStats(Bridge.expression(c)))

  /** Static kernel shared by interpreted eval and generated code.
    * ASCII rides a flat 128-slot array (the common case at memory speed);
    * anything above falls into a small map. */
  def compute(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val str = s.toString
    val ascii = new Array[Long](128)
    var high: java.util.HashMap[Integer, Long] = null
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      if (cp < 128) ascii(cp) += 1L
      else {
        if (high == null) high = new java.util.HashMap[Integer, Long]()
        val prev = high.get(cp)
        high.put(cp, if (prev == null) 1L else prev + 1L)
      }
      i += Character.charCount(cp)
    }
    var mode = 0L
    var distinct = 0L
    var k = 0
    while (k < 128) {
      val c = ascii(k)
      if (c > 0) { distinct += 1; if (c > mode) mode = c }
      k += 1
    }
    if (high != null) {
      val it = high.values().iterator()
      while (it.hasNext) {
        val c: Long = it.next()
        distinct += 1
        if (c > mode) mode = c
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](mode, distinct))
  }
}

/** Non-overlapping fixed-width window energy profile of a payload string
  * — the voice-activity-detection (VAD) shape of an audio pipeline over
  * the container's text-derived payloads: the payload is cut into
  * `win`-code-point windows (trailing partial window dropped, like a
  * fixed-size audio frame), each window's "energy" is the exact integer
  * sum of its code points, and the profile reports window count, total
  * and peak energy, and how many windows fall under `quietMax` (the
  * silence threshold a VAD would gate on). One compiled walk per row;
  * the DuckDB mirror is `range` + character slicing + `list_sum`.
  * A real audio deployment swaps code-point sum for sample RMS inside
  * the same frame loop — the plumbing (framing, thresholds, per-doc
  * rollup) is what this pins. */
case class WindowEnergy(child: Expression, win: Int, quietMax: Long)
    extends UnaryExpression {
  require(win >= 1, s"window width must be >= 1, got $win")

  override def dataType: DataType = StructType(Seq(
    StructField("n_windows", LongType, nullable = false),
    StructField("energy_sum", LongType, nullable = false),
    StructField("peak_energy", LongType, nullable = false),
    StructField("n_quiet", LongType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"window_energy expects string, got ${t.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    WindowEnergy.compute(input.asInstanceOf[UTF8String], win, quietMax)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WindowEnergy.compute($c, $win, ${quietMax}L);")
  override protected def withNewChildInternal(newChild: Expression): WindowEnergy =
    copy(child = newChild)
  override def prettyName: String = "window_energy"
}

object WindowEnergy {
  import org.apache.spark.sql.graftbridge.Bridge
  def apply(c: Column, win: Int, quietMax: Long): Column =
    Bridge.column(WindowEnergy(Bridge.expression(c), win, quietMax))

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(s: UTF8String, win: Int, quietMax: Long)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val str = s.toString
    val n = str.length
    var nWin = 0L
    var total = 0L
    var peak = 0L
    var quiet = 0L
    // walk code points; close a window every `win` code points. The
    // trailing partial window (fewer than `win` code points) is dropped.
    var e = 0L
    var inWin = 0
    var i = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      e += cp
      inWin += 1
      if (inWin == win) {
        nWin += 1
        total += e
        if (e > peak) peak = e
        if (e < quietMax) quiet += 1
        e = 0L
        inWin = 0
      }
      i += Character.charCount(cp)
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nWin, total, peak, quiet))
  }
}
