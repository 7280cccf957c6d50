package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled per-document shingling kernels. Shingling, like the SimHash/
  * fingerprint kernels, is pure per-row work — these expressions keep it
  * map-side in one compiled pass instead of a `transform`+`sequence`+
  * `concat_ws`+`array_distinct` HOF chain whose lambdas evaluate
  * interpreted per element. */
object ShingleKernels {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column API: distinct word-3-gram shingles of a word array. */
  def shingles3(ws: Column): Column =
    Bridge.column(Shingles3(Bridge.expression(ws)))

  /** Column API: distinct word-k-gram shingles of a word array. */
  def shinglesK(ws: Column, k: Int): Column =
    Bridge.column(ShinglesK(Bridge.expression(ws), k))

  /** Column API: multiplicity-counted word-n-grams of a word array as an
    * array of (g, c) structs — the per-document half of a corpus n-gram
    * frequency table, computed narrowly so the corpus aggregation is the
    * FIRST (and only) shuffle. */
  def ngramCounts(ws: Column, n: Int): Column =
    Bridge.column(NgramCounts(Bridge.expression(ws), n))

  /** Column API: [[shinglesK]] fused with tokenization — distinct word-
    * k-gram shingles sliced straight from the text bytes (no regex
    * split, no word array). Exactly `shinglesK(split(text, ' ', -1), k)`. */
  def shinglesText(text: Column, k: Int): Column =
    Bridge.column(ShinglesText(Bridge.expression(text), k))

  /** Column API: [[ngramCounts]] fused with tokenization — takes the raw
    * text column, no `split()` (regex) pass, no intermediate word array.
    * Exactly `ngram_counts(split(text, ' ', -1), n)`: single-space-joined
    * word windows reconstruct the original byte span verbatim (empty
    * tokens from adjacent separators included, like split's), so each
    * gram is one slice of the source bytes. */
  def ngramCountsText(text: Column, n: Int): Column =
    Bridge.column(NgramCountsText(Bridge.expression(text), n))

  /** Column API: 64-perm minhash signature of a (shingle) string array —
    * `sig[j] = min over distinct shingles of ((2j+1)·poly31(s) + j) mod
    * 1e9+7`, identical to `MinHashAgg(rolling_hash(s), 64)` over the
    * exploded shingles (property-tested in ExpressionsSpec). */
  def minHash64(arr: Column): Column =
    Bridge.column(MinHash64(Bridge.expression(arr)))

  /** Column API: distinct xxhash64 values of the word-k-gram shingles of
    * raw text — [[shinglesText]] with the string materialization deleted.
    * See [[ShingleHashesText]] for semantics and the collision bound. */
  def shingleHashesText(text: Column, k: Int): Column =
    Bridge.column(ShingleHashesText(Bridge.expression(text), k))
}

/** Distinct word-3-gram shingles: `shingles3(ws)[k] = ws[k] ⧺ ' ' ⧺
  * ws[k+1] ⧺ ' ' ⧺ ws[k+2]`, first-occurrence order, duplicates dropped —
  * exactly `array_distinct(transform(sequence(0, size-3), i ->
  * concat_ws(' ', ws[i], ws[i+1], ws[i+2])))`. Arrays with fewer than 3
  * elements yield an empty array (DuckDB's generate_series analog). */
case class Shingles3(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingles3 expects array<string>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    Shingles3.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Shingles3.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Shingles3 =
    copy(child = newChild)

  override def prettyName: String = "shingles3"
}

object Shingles3 {
  private val SPACE = UTF8String.fromString(" ")

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(ws: ArrayData): GenericArrayData = {
    val n = ws.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](n * 2)
    var i = 0
    while (i <= n - 3) {
      // concatWs skips null elements, exactly like the concat_ws SQL
      // form this kernel compiles — a null word never poisons the
      // shingle into a null inside a containsNull=false array
      val s = UTF8String.concatWs(SPACE,
        ws.getUTF8String(i), ws.getUTF8String(i + 1), ws.getUTF8String(i + 2))
      seen.add(s)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}

/** Distinct word-k-gram shingles — the generalization of [[Shingles3]]
  * used by the decontamination pass (k = 8, the published n-gram-overlap
  * window for eval-set leakage checks). First-occurrence order, duplicates
  * dropped; arrays with fewer than k elements yield an empty array. */
case class ShinglesK(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle width must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingles$k expects array<string>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    ShinglesK.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShinglesK.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): ShinglesK =
    copy(child = newChild)

  override def prettyName: String = s"shingles$k"
}

object ShinglesK {
  private val SPACE = UTF8String.fromString(" ")

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(ws: ArrayData, k: Int): GenericArrayData = {
    val n = ws.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](n * 2)
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i <= n - k) {
      var m = 0
      while (m < k) { parts(m) = ws.getUTF8String(i + m); m += 1 }
      // concatWs skips nulls like the concat_ws SQL form — see Shingles3
      seen.add(UTF8String.concatWs(SPACE, parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next(); p += 1 }
    new GenericArrayData(out)
  }
}

/** Per-document n-gram frequency vector: `ngram_counts(ws, n)` yields one
  * `(g, c)` struct per DISTINCT word-n-gram of `ws` (first-occurrence
  * order) with its multiplicity — exactly the rows
  * `explode(ngrams) → groupBy(doc, g) → count` would produce, but as
  * per-row work with no shuffle. At 100 TB this turns the per-(doc, gram)
  * pre-aggregation the two-level n-gram queries (t12, t20) paid a
  * corpus-sized exchange for into a pure map-side scan; only the
  * already-collapsed (gram, count) rows ever reach an exchange. Arrays
  * with fewer than n elements yield an empty array. */
case class NgramCounts(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"ngram width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("g", StringType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ngram_counts expects array<string>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    NgramCounts.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NgramCounts.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): NgramCounts =
    copy(child = newChild)

  override def prettyName: String = s"ngram_counts$n"
}

object NgramCounts {
  private val SPACE = UTF8String.fromString(" ")

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(ws: ArrayData, k: Int): GenericArrayData = {
    val n = ws.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val counts = new java.util.LinkedHashMap[UTF8String, java.lang.Long](n * 2)
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i <= n - k) {
      var m = 0
      while (m < k) { parts(m) = ws.getUTF8String(i + m); m += 1 }
      // concatWs skips nulls like the concat_ws SQL form — see Shingles3
      val g = UTF8String.concatWs(SPACE, parts: _*)
      val prev = counts.get(g)
      counts.put(g, if (prev == null) 1L else prev.longValue() + 1L)
      i += 1
    }
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var p = 0
    while (it.hasNext) {
      val e = it.next()
      out(p) = org.apache.spark.sql.catalyst.InternalRow(e.getKey, e.getValue)
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** Tokenizing distinct-shingle kernel: `shingles_text(text, k)` ≡
  * `shingles$k(split(text, ' ', -1))` in one compiled pass — the same
  * byte-scan word boundaries and verbatim gram slices as
  * [[NgramCountsText]], deduplicated in first-occurrence order like
  * [[ShinglesK]]. Texts with fewer than k words yield an empty array. */
case class ShinglesText(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle width must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingles_text expects string, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    ShinglesText.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShinglesText.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): ShinglesText =
    copy(child = newChild)

  override def prettyName: String = s"shingles_text$k"
}

object ShinglesText {

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(text: UTF8String, k: Int): GenericArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    var nWords = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' '.toByte) nWords += 1; i += 1 }
    if (nWords < k) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nWords)
    var w = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' '.toByte) { starts(w) = i + 1; w += 1 }
      i += 1
    }
    val seen = new java.util.LinkedHashSet[UTF8String](nWords * 2)
    var j = 0
    val nGrams = nWords - k + 1
    while (j < nGrams) {
      val from = starts(j)
      val until = if (j + k < nWords) starts(j + k) - 1 else len
      seen.add(UTF8String.fromBytes(bytes, from, until - from))
      j += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next(); p += 1 }
    new GenericArrayData(out)
  }
}

/** Hashed-key shingling: the distinct word-k-gram shingles of raw text as
  * xxhash64 values (sorted ascending), never materializing the gram
  * strings — each hash is computed directly over the verbatim byte slice
  * `bytes[start(i) .. end(i+k-1)]` (grams join consecutive words with the
  * original single-space separators, so the slice IS the gram). This is
  * the inverted-index key form for corpus scale (the trade documented at
  * Dedup.allPostings): 8-byte fixed keys through the posting-list
  * exchange instead of ~25-byte strings, no per-gram allocation at all
  * on the map side.
  *
  * Distinct-by-hash equals distinct-by-string except under an xxhash64
  * collision between two grams of the SAME corpus — probability
  * ~ n²/2⁶⁵ (~10⁻⁶ even at 10⁸ distinct grams), detectable as a df
  * merge, and bit-exactness against the string-keyed oracle is verified
  * at every tested SF. Fewer than k words yields an empty array. */
case class ShingleHashesText(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"shingle width must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes_text expects string, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleHashesText.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashesText.compute($c, $k);")

  override protected def withNewChildInternal(
      newChild: Expression): ShingleHashesText =
    copy(child = newChild)

  override def prettyName: String = s"shingle_hashes_text$k"
}

object ShingleHashesText {

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(text: UTF8String, k: Int): GenericArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    var nWords = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' '.toByte) nWords += 1; i += 1 }
    if (nWords < k) return new GenericArrayData(Array.empty[Long])
    val starts = new Array[Int](nWords)
    var w = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' '.toByte) { starts(w) = i + 1; w += 1 }
      i += 1
    }
    val nGrams = nWords - k + 1
    val hs = new Array[Long](nGrams)
    var j = 0
    while (j < nGrams) {
      val from = starts(j)
      val until = if (j + k < nWords) starts(j + k) - 1 else len
      hs(j) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from,
        until - from, 42L)
      j += 1
    }
    // sorted distinct (order is irrelevant to every consumer — the arrays
    // feed explode+group — and a primitive sort beats any boxed set)
    java.util.Arrays.sort(hs)
    var uniq = 1
    j = 1
    while (j < nGrams) {
      if (hs(j) != hs(j - 1)) { hs(uniq) = hs(j); uniq += 1 }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, uniq))
  }
}

/** Tokenizing n-gram frequency vector: `ngram_counts_text(text, n)` ≡
  * `ngram_counts(split(text, ' ', -1), n)` in ONE compiled pass over the
  * source bytes — word boundaries are single 0x20 separators (split
  * semantics: adjacent separators yield empty tokens, trailing kept), and
  * because grams join consecutive words with the same single space, every
  * gram is a verbatim slice `bytes[start(i) .. end(i+n-1)]` of the input.
  * No regex, no word-array materialization — at 100 TB this keeps the
  * per-document half of a corpus frequency table at memory-bandwidth
  * speed inside the scan stage. Texts with fewer than n words yield an
  * empty array. */
case class NgramCountsText(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"ngram width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("g", StringType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ngram_counts_text expects string, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    NgramCountsText.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NgramCountsText.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): NgramCountsText =
    copy(child = newChild)

  override def prettyName: String = s"ngram_counts_text$n"
}

object NgramCountsText {

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(text: UTF8String, k: Int): GenericArrayData = {
    val bytes = text.getBytes // contiguous copy iff the UTF8String is offset
    val len = bytes.length
    // word start offsets: 0 and every position after a 0x20 separator.
    // (UTF-8 multi-byte sequences never contain 0x20, so a raw byte scan
    // is character-exact.)
    var nWords = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' '.toByte) nWords += 1; i += 1 }
    if (nWords < k) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nWords)
    var w = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' '.toByte) { starts(w) = i + 1; w += 1 }
      i += 1
    }
    val counts = new java.util.LinkedHashMap[UTF8String, java.lang.Long](nWords * 2)
    var j = 0
    val nGrams = nWords - k + 1
    while (j < nGrams) {
      val from = starts(j)
      val until = if (j + k < nWords) starts(j + k) - 1 else len
      val g = UTF8String.fromBytes(bytes, from, until - from)
      val prev = counts.get(g)
      counts.put(g, if (prev == null) 1L else prev.longValue() + 1L)
      j += 1
    }
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var p = 0
    while (it.hasNext) {
      val e = it.next()
      out(p) = org.apache.spark.sql.catalyst.InternalRow(e.getKey, e.getValue)
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** 64-perm minhash signature computed narrowly from the shingle array:
  * per shingle the poly-31 rolling hash (same kernel as [[RollingHash]]),
  * then the running min of each affine permutation ((2j+1)·h + j) mod
  * 1e9+7 — the sketch never needs a shuffle, which at 100 TB turns
  * signature generation into a pure scan (only band keys get exchanged).
  * Bit-identical to `MinHashAgg(rolling_hash(s), 64)` over the exploded
  * array. Empty arrays yield sig[j] = Long.MaxValue (no elements), which
  * callers filter out upstream (docs with < 3 words have no shingles). */
case class MinHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash64 expects array<string>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): MinHash64 =
    copy(child = newChild)

  override def prettyName: String = "minhash64"
}

object MinHash64 {
  private val P = 1000000007L

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): GenericArrayData = {
    val sig = Array.fill(64)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = RollingHash.compute(arr.getUTF8String(i), 31L)
      var j = 0
      while (j < 64) {
        val p = ((2L * j + 1) * h + j) % P
        if (p < sig(j)) sig(j) = p
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** One-walk feature-hashed bag-of-words summary of `text`: tokens are the
  * single-space splits (trailing/consecutive empties INCLUDED — Java
  * split(-1)/DuckDB string_split semantics), each token is bucketed by
  * the t04 polynomial rolling hash mod `buckets`, and the bucket-count
  * vector is folded to (nnz, ‖v‖², max_cnt, top_bucket) without ever
  * materializing words, hashes, or the counts array per row in the plan.
  * Semantically identical to the HOF chain
  * `transform(split(text,' '), w -> rolling_hash(w) % B)` → per-bucket
  * `size(filter(...))` → nnz/l2/argmax folds — but one compiled loop per
  * row instead of O(B·n) interpreted lambda evaluations. First-maximal
  * bucket wins ties (strict `>` while scanning ascending bucket ids). */
case class HashedBow(child: Expression, buckets: Int)
    extends UnaryExpression {
  require(buckets >= 1, s"bucket count must be >= 1, got $buckets")

  override def dataType: DataType = StructType(Seq(
    StructField("nnz", LongType, nullable = false),
    StructField("l2sq", LongType, nullable = false),
    StructField("max_cnt", LongType, nullable = false),
    StructField("top_bucket", LongType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hashed_bow expects string, got ${t.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    HashedBow.compute(input.asInstanceOf[UTF8String], buckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashedBow.compute($c, $buckets);")
  override protected def withNewChildInternal(newChild: Expression): HashedBow =
    copy(child = newChild)
  override def prettyName: String = "hashed_bow"
}

object HashedBow {
  private val P = 1000000007L

  import org.apache.spark.sql.graftbridge.Bridge
  def apply(c: Column, buckets: Int): Column =
    Bridge.column(HashedBow(Bridge.expression(c), buckets))

  /** Dense bucket-count vector of the feature-hashed BOW — the shared
    * walk behind [[compute]] and [[HashedBowCounts]]. */
  def computeCounts(s: UTF8String, buckets: Int): Array[Long] = {
    val str = s.toString
    val cnt = new Array[Long](buckets)
    var h = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      if (cp == ' ') { cnt((h % buckets).toInt) += 1; h = 0L }
      else h = (h * 31 + cp) % P
      i += Character.charCount(cp)
    }
    cnt((h % buckets).toInt) += 1 // final token; trailing empty included
    cnt
  }

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(s: UTF8String, buckets: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val cnt = computeCounts(s, buckets)
    var nnz = 0L; var l2 = 0L; var max = 0L; var arg = 0L
    var b = 0
    while (b < buckets) {
      val c = cnt(b)
      if (c > 0) nnz += 1
      l2 += c * c
      if (c > max) { max = c; arg = b.toLong }
      b += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nnz, l2, max, arg))
  }
}

/** The dense bucket-count VECTOR of the feature-hashed bag-of-words —
  * [[HashedBow]]'s walk, but returning all `buckets` counts (zeros
  * included, index = bucket id) instead of the folded summary. One
  * compiled loop per row; the array is `buckets` longs regardless of
  * document length, so downstream positional ops (`zip_with` against a
  * broadcast weight vector, positional explode for distribution fits)
  * stay aligned with no sparse-key join. */
case class HashedBowCounts(child: Expression, buckets: Int)
    extends UnaryExpression {
  require(buckets >= 1, s"bucket count must be >= 1, got $buckets")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hashed_bow_counts expects string, got ${t.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    HashedBowCounts.compute(input.asInstanceOf[UTF8String], buckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashedBowCounts.compute($c, $buckets);")
  override protected def withNewChildInternal(newChild: Expression): HashedBowCounts =
    copy(child = newChild)
  override def prettyName: String = "hashed_bow_counts"
}

object HashedBowCounts {
  import org.apache.spark.sql.graftbridge.Bridge
  def apply(c: Column, buckets: Int): Column =
    Bridge.column(HashedBowCounts(Bridge.expression(c), buckets))

  def compute(s: UTF8String, buckets: Int): GenericArrayData =
    new GenericArrayData(HashedBow.computeCounts(s, buckets))
}

/** DISTINCT character k-grams of a string, first-occurrence order — the
  * character-level sibling of [[ShinglesK]] (which works on word
  * arrays): one compiled walk emitting each distinct k-code-point
  * window, for the char-trigram language-ID profile (t38). Equivalent
  * to `list_distinct(list_transform(range(length(s)-k+1), i ->
  * substr(s, i+1, k)))` in DuckDB; strings shorter than k yield an
  * empty array. */
case class CharGrams(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"gram width must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_grams expects string, got ${t.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    CharGrams.compute(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharGrams.compute($c, $k);")
  override protected def withNewChildInternal(newChild: Expression): CharGrams =
    copy(child = newChild)
  override def prettyName: String = s"char_grams$k"
}

object CharGrams {
  import org.apache.spark.sql.graftbridge.Bridge
  def apply(c: Column, k: Int): Column =
    Bridge.column(CharGrams(Bridge.expression(c), k))

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(s: UTF8String, k: Int): GenericArrayData = {
    val str = s.toString
    // code-point boundaries so windows slice whole characters
    val cps = str.codePoints().toArray
    val n = cps.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](n * 2)
    var i = 0
    while (i <= n - k) {
      seen.add(UTF8String.fromString(new String(cps, i, k)))
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next(); p += 1 }
    new GenericArrayData(out)
  }
}
