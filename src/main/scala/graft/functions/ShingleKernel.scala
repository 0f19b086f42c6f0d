package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Fused text→shingle kernels (optimization guide §1.2 step 2 /
  * §4: per-task work): ONE byte-level pass per document replacing
  * the Catalyst HOF chain
  *
  *   split(trim(text), "\\s+") → slice×2 → zip_with(concat) →
  *   array_distinct → [xxhash64 transform + array_sort | minhash60]
  *
  * which allocates a UTF8String per token, another per bigram, a
  * hash set of UTF8Strings for the distinct, and (in MinHash60) a
  * concat per (permutation × shingle). The kernels here tokenize the
  * doc's bytes in place, assemble each bigram once into a reusable
  * buffer, and hash from that buffer — no per-shingle allocation.
  *
  * Exact-equivalence contract (pinned by ShingleKernelSpec):
  *  - trim == Spark `trim`: strips 0x20 only.
  *  - tokenize == Spark `split(s, "\\s+")` (limit −1): separators
  *    are maximal runs of [ \t\n\f\r] (ASCII — safe to scan
  *    bytewise in UTF-8), a leading separator yields a leading empty
  *    token, a trailing separator a trailing empty token, and the
  *    empty string yields one empty token.
  *  - bigram i == concat(tok(i), ' ', tok(i+1)).
  *  - xx == Spark `xxhash64(string)` (XXH64, seed 42, same bytes).
  *  - mh(k) == min over bigrams of md5_hash60(concat(k + ":", w)) —
  *    duplicates cannot change a min, so [[MinHashText]] needs no
  *    distinct pass at all and is unconditionally exact.
  *  - [[ShingleSigExpr]] dedups by xx VALUE, so its (vtoks, n)
  *    equal the string-distinct chain's exactly when xxhash64 is
  *    injective on the corpus' bigrams — the contract its ONLY
  *    caller (Dedup.minhashPairsFused's useHash branch) already
  *    proves with its memoized injectivity verdict before choosing
  *    this path.
  */
object ShingleKernel {

  private val Seed = 42L

  /** "k:" md5 prefixes as raw bytes, interned once. */
  private val prefixes: Array[Array[Byte]] =
    Array.tabulate(64)(i => (i + ":").getBytes("UTF-8"))

  /** Per-thread scratch: token offsets, bigram assembly buffer,
    * generation-stamped open-addressing long set, one MessageDigest.
    * Nothing escapes a call except the result arrays.
    */
  private final class Scratch {
    var tokOff = new Array[Int](128)
    var tokEnd = new Array[Int](128)
    var nTok = 0
    var big = new Array[Byte](512)
    var keys = new Array[Long](1024) // open addressing, power of two
    var stamp = new Array[Int](1024)
    var gen = 0
    var setSize = 0
    var xs = new Array[Long](256) // distinct xx values, insertion order
    val md = java.security.MessageDigest.getInstance("MD5")
    val out16 = new Array[Byte](16)

    def growTokens(): Unit = {
      tokOff = java.util.Arrays.copyOf(tokOff, tokOff.length * 2)
      tokEnd = java.util.Arrays.copyOf(tokEnd, tokEnd.length * 2)
    }
    def ensureBig(n: Int): Unit =
      if (big.length < n) big = new Array[Byte](Integer.highestOneBit(n) * 2)

    def resetSet(): Unit = { gen += 1; setSize = 0 }
    /** Adds xx to the set; returns true when it was absent. */
    def add(xx: Long): Boolean = {
      if ((setSize + 1) * 4 > keys.length * 3) rehash()
      val mask = keys.length - 1
      var i = (java.lang.Long.hashCode(xx * 0x9e3779b97f4a7c15L)) & mask
      while (stamp(i) == gen) {
        if (keys(i) == xx) return false
        i = (i + 1) & mask
      }
      keys(i) = xx; stamp(i) = gen
      if (setSize == xs.length) xs = java.util.Arrays.copyOf(xs, xs.length * 2)
      xs(setSize) = xx; setSize += 1
      true
    }
    private def rehash(): Unit = {
      val nk = new Array[Long](keys.length * 2)
      val ns = new Array[Int](keys.length * 2)
      val mask = nk.length - 1
      var j = 0
      while (j < setSize) {
        val xx = xs(j)
        var i = (java.lang.Long.hashCode(xx * 0x9e3779b97f4a7c15L)) & mask
        while (ns(i) == gen) i = (i + 1) & mask
        nk(i) = xx; ns(i) = gen
        j += 1
      }
      keys = nk; stamp = ns
    }
  }
  private val scratch = new ThreadLocal[Scratch] {
    override def initialValue(): Scratch = new Scratch
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** Tokenize `bytes[lo, hi)` (already trim'd) into s.tokOff/tokEnd
    * with Spark split(s, "\\s+") (limit −1) semantics.
    */
  private def tokenize(s: Scratch, bytes: Array[Byte], lo: Int, hi: Int): Unit = {
    s.nTok = 0
    var pos = lo
    var done = false
    while (!done) {
      var j = pos
      while (j < hi && !isWs(bytes(j))) j += 1
      if (s.nTok == s.tokOff.length) s.growTokens()
      s.tokOff(s.nTok) = pos; s.tokEnd(s.nTok) = j; s.nTok += 1
      if (j >= hi) done = true
      else {
        var k = j
        while (k < hi && isWs(bytes(k))) k += 1
        if (k >= hi) { // trailing separator → trailing empty token
          if (s.nTok == s.tokOff.length) s.growTokens()
          s.tokOff(s.nTok) = hi; s.tokEnd(s.nTok) = hi; s.nTok += 1
          done = true
        } else pos = k
      }
    }
  }

  private def trimRange(bytes: Array[Byte]): (Int, Int) = {
    var lo = 0
    var hi = bytes.length
    while (lo < hi && bytes(lo) == ' ') lo += 1
    while (hi > lo && bytes(hi - 1) == ' ') hi -= 1
    (lo, hi)
  }

  /** Assemble the k-gram starting at token i (tokens joined by a
    * single space, matching concat(tok, ' ', tok, …)) into s.big;
    * returns its byte length.
    */
  private def assemble(s: Scratch, bytes: Array[Byte], i: Int, k: Int = 2): Int = {
    var len = 0
    var j = 0
    while (j < k) {
      val o = s.tokOff(i + j); val l = s.tokEnd(i + j) - o
      if (j > 0) { s.ensureBig(len + 1); s.big(len) = ' '; len += 1 }
      s.ensureBig(len + l)
      System.arraycopy(bytes, o, s.big, len, l)
      len += l
      j += 1
    }
    len
  }

  /** min-fold all `numPerms` md5_hash60("k:" + bigram) into mins. */
  private def foldMd5(s: Scratch, len: Int, mins: Array[Long], numPerms: Int): Unit = {
    var k = 0
    while (k < numPerms) {
      s.md.reset()
      s.md.update(prefixes(k))
      s.md.update(s.big, 0, len)
      s.md.digest(s.out16, 0, 16)
      var acc = 0L
      var b = 0
      while (b < 8) { acc = (acc << 8) | (s.out16(b) & 0xffL); b += 1 }
      val h = acc >>> 4
      if (h < mins(k)) mins(k) = h
      k += 1
    }
  }

  def tokenCount(str: UTF8String): Int = {
    val s = scratch.get()
    val bytes = str.getBytes
    val (lo, hi) = trimRange(bytes)
    tokenize(s, bytes, lo, hi)
    s.nTok
  }

  def minhashText(str: UTF8String, numPerms: Int): GenericArrayData = {
    val s = scratch.get()
    val bytes = str.getBytes
    val (lo, hi) = trimRange(bytes)
    tokenize(s, bytes, lo, hi)
    val mins = new Array[Long](numPerms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < s.nTok - 1) {
      val len = assemble(s, bytes, i)
      foldMd5(s, len, mins, numPerms)
      i += 1
    }
    new GenericArrayData(mins)
  }

  def shingleSig(str: UTF8String, numPerms: Int): InternalRow = {
    val s = scratch.get()
    val bytes = str.getBytes
    val (lo, hi) = trimRange(bytes)
    tokenize(s, bytes, lo, hi)
    s.resetSet()
    val mins = new Array[Long](numPerms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < s.nTok - 1) {
      val len = assemble(s, bytes, i)
      val xx = XXH64.hashUnsafeBytes(s.big, Platform.BYTE_ARRAY_OFFSET, len, Seed)
      if (s.add(xx)) foldMd5(s, len, mins, numPerms)
      i += 1
    }
    val sorted = java.util.Arrays.copyOf(s.xs, s.setSize)
    java.util.Arrays.sort(sorted)
    new GenericInternalRow(Array[Any](new GenericArrayData(sorted),
      s.setSize, new GenericArrayData(mins)))
  }

  /** Distinct-by-xx k-gram shingle hashes (insertion order) — the
    * fused form of `explode(array_distinct(kgrams))` → `xxhash64(w)`
    * for consumers that only ever see the hash (dfOrderedPrep's
    * injective branch; the verdict that gates it proves xx-equality
    * ⟺ string-equality on the corpus vocabulary, so the distinct
    * set — and every df count built on it — is unchanged).
    */
  def shingleXx(str: UTF8String, k: Int): GenericArrayData = {
    val s = scratch.get()
    val bytes = str.getBytes
    val (lo, hi) = trimRange(bytes)
    tokenize(s, bytes, lo, hi)
    s.resetSet()
    var i = 0
    while (i <= s.nTok - k) {
      val len = assemble(s, bytes, i, k)
      s.add(XXH64.hashUnsafeBytes(s.big, Platform.BYTE_ARRAY_OFFSET, len, Seed))
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(s.xs, s.setSize))
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_count", exprs => TokenCount(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash60_text", exprs => MinHashText(exprs.head,
        exprs(1).eval().asInstanceOf[Int]), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_sig", exprs => ShingleSigExpr(exprs.head,
        exprs(1).eval().asInstanceOf[Int]), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_xx", exprs => ShingleXxExpr(exprs.head,
        exprs(1).eval().asInstanceOf[Int]), "scala_udf")
  }

  def token_count(c: Column): Column = call_function("token_count", c)
  def shingle_xx(c: Column, k: Int): Column =
    call_function("shingle_xx", c, lit(k))
  def minhash60_text(c: Column, numPerms: Int): Column =
    call_function("minhash60_text", c, lit(numPerms))
  def shingle_sig(c: Column, numPerms: Int): Column =
    call_function("shingle_sig", c, lit(numPerms))
}

/** Number of split(trim(text), "\\s+") tokens — the cheap form of
  * the ≥ 2 words LSH pre-filter (`token_count(text) >= 2` ⟺
  * `size(split(trim(text), "\\s+")) >= 2`), without materializing a
  * token array inside a Filter.
  */
case class TokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")
  override def nullSafeEval(v: Any): Any =
    ShingleKernel.tokenCount(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleKernel.tokenCount($c);")
  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

/** The full `numPerms` MinHash signature straight from raw text —
  * byte-identical to `minhash60(array_distinct(bigrams), numPerms)`
  * (min over a multiset equals min over its set, so no distinct pass
  * is needed; exact regardless of hash collisions).
  */
case class MinHashText(child: Expression, numPerms: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash60_text"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && numPerms > 0 && numPerms <= 64)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument and 0 < numPerms <= 64")
  override def nullSafeEval(v: Any): Any =
    ShingleKernel.minhashText(v.asInstanceOf[UTF8String], numPerms)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleKernel.minhashText($c, $numPerms);")
  override protected def withNewChildInternal(newChild: Expression): MinHashText =
    copy(child = newChild)
}

/** struct(vtoks: sorted distinct xxhash64 of the bigrams, n: their
  * count, mh: the MinHash signature) in one pass — the whole per-doc
  * payload of Dedup.minhashPairsFused's useHash branch. Distinctness
  * is by xx value; see the object scaladoc for why that is exact
  * under the caller's injectivity verdict (and only used there).
  */
/** Distinct-by-xx k-gram shingle hashes straight from raw text — see
  * [[ShingleKernel.shingleXx]] for the exactness contract (injective
  * callers only).
  */
case class ShingleXxExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_xx"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument and k > 0")
  override def nullSafeEval(v: Any): Any =
    ShingleKernel.shingleXx(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleKernel.shingleXx($c, $k);")
  override protected def withNewChildInternal(newChild: Expression): ShingleXxExpr =
    copy(child = newChild)
}

case class ShingleSigExpr(child: Expression, numPerms: Int) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("vtoks", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("n", IntegerType, nullable = false),
    StructField("mh", ArrayType(LongType, containsNull = false), nullable = false)))
  override def prettyName: String = "shingle_sig"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && numPerms > 0 && numPerms <= 64)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument and 0 < numPerms <= 64")
  override def nullSafeEval(v: Any): Any =
    ShingleKernel.shingleSig(v.asInstanceOf[UTF8String], numPerms)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleKernel.shingleSig($c, $numPerms);")
  override protected def withNewChildInternal(newChild: Expression): ShingleSigExpr =
    copy(child = newChild)
}
