package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Vector + sketch expressions for the LLM-pipeline operators
 * (SURVEY.md §2.9/§2.10): embedding similarity, MinHash signatures,
 * SimHash, random-hyperplane LSH. All single-pass scalar expressions over
 * array columns — the surrounding plumbing (shingling, banding, bucket
 * joins) stays in codegen'd Spark builtins.
 *
 * Every expression implements real `doGenCode` (one virtual call into the
 * pre-compiled loop per row, children inlined in whole-stage codegen) —
 * no CodegenFallback row materialization in the dedup/ANN hot paths.
 */

private[functions] object VecKit {
  /** Float/double array element as double (embeddings are float; centroids double). */
  def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  def dot(a: ArrayData, af: Boolean, b: ArrayData, bf: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += elem(a, i, af) * elem(b, i, bf); i += 1 }
    s
  }

  def norm(a: ArrayData, af: Boolean): Double = {
    var s = 0.0
    var i = 0
    while (i < a.numElements()) { val v = elem(a, i, af); s += v * v; i += 1 }
    math.sqrt(s)
  }
}
import VecKit._

/** Dot product of two numeric arrays (double accumulation). */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  @transient private lazy val lf = isFloatArray(left)
  @transient private lazy val rf = isFloatArray(right)
  def compute(a: ArrayData, b: ArrayData): Double = dot(a, lf, b, rf)
  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: codegen.CodegenContext, ev: codegen.ExprCode): codegen.ExprCode = {
    val ref = ctx.addReferenceObj("vecDot", this, classOf[VecDot].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }
  override def prettyName: String = "vec_dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** L2 norm. */
case class VecNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  @transient private lazy val f = isFloatArray(child)
  def compute(a: ArrayData): Double = norm(a, f)
  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: codegen.CodegenContext, ev: codegen.ExprCode): codegen.ExprCode = {
    val ref = ctx.addReferenceObj("vecNorm", this, classOf[VecNorm].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }
  override def prettyName: String = "vec_norm"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Cosine similarity (0 when either norm is 0). */
case class VecCosine(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  @transient private lazy val lf = isFloatArray(left)
  @transient private lazy val rf = isFloatArray(right)
  def compute(x: ArrayData, y: ArrayData): Double = {
    val nx = norm(x, lf); val ny = norm(y, rf)
    if (nx == 0.0 || ny == 0.0) 0.0 else dot(x, lf, y, rf) / (nx * ny)
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: codegen.CodegenContext, ev: codegen.ExprCode): codegen.ExprCode = {
    val ref = ctx.addReferenceObj("vecCos", this, classOf[VecCosine].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }
  override def prettyName: String = "vec_cosine"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/**
 * MinHash signature: array<int> shingle hashes -> array<long> of
 * `numHashes` minima under universal hashes h_j(x) = (a_j*x + b_j) mod p,
 * seeds fixed by `seed` (deterministic across the cluster).
 */
case class MinHashSig(left: Expression, right: Expression, seed: Long = 42L)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private val P = 4294967311L // prime > 2^32

  // parallel PRIMITIVE coefficient arrays (same values, same draw order
  // as the original (a, b) tuple array): the inner loop below runs
  // shingles * k times per row — at corpus scale hundreds of millions of
  // iterations — and a boxed-tuple deref per iteration was measurably
  // the hottest allocation-free overhead in the near-dup pipeline
  @transient private lazy val coefA: Array[Long] = {
    val rnd = new java.util.Random(seed)
    val a = new Array[Long](1024)
    val b = new Array[Long](1024)
    var i = 0
    while (i < 1024) {
      // a < 2^31 so a*x (x < 2^32) stays below 2^63 — no signed overflow,
      // which would bias the hash and break Pr[collision] ≈ Jaccard
      a(i) = 1L + rnd.nextInt(Int.MaxValue - 1).toLong
      b(i) = (rnd.nextLong() & Long.MaxValue) % P
      i += 1
    }
    coefBRef = b
    a
  }
  @transient private var coefBRef: Array[Long] = _
  @transient private lazy val coefB: Array[Long] = { coefA; coefBRef }

  def compute(sh: ArrayData, nh: Object): ArrayData = {
    val k = StKit.int(nh)
    require(k >= 1 && k <= 1024, s"minhash_sig supports 1..1024 hashes, got $k")
    val ca = coefA; val cb = coefB
    val out = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < sh.numElements()) {
      val x = (sh.getInt(i).toLong & 0xffffffffL)
      var j = 0
      while (j < k) {
        val h = (ca(j) * x + cb(j)) % P
        if (h < out(j)) out(j) = h
        j += 1
      }
      i += 1
    }
    // empty shingle set -> all MaxValue (still deterministic)
    new GenericArrayData(out)
  }
  override def nullSafeEval(sh: Any, nh: Any): Any =
    compute(sh.asInstanceOf[ArrayData], nh.asInstanceOf[Object])
  override protected def doGenCode(ctx: codegen.CodegenContext, ev: codegen.ExprCode): codegen.ExprCode = {
    val ref = ctx.addReferenceObj("minhash", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, ${StCodegen.box(b, right.dataType)});")
  }
  override def prettyName: String = "minhash_sig"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** SimHash64 over per-token 64-bit hashes (from xxhash64 builtin). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  def compute(hs: ArrayData): Long = {
    val acc = new Array[Int](64)
    var i = 0
    while (i < hs.numElements()) {
      val h = hs.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }
  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: codegen.CodegenContext, ev: codegen.ExprCode): codegen.ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }
  override def prettyName: String = "simhash64"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/**
 * Portable 16-bit SimHash over whitespace tokens, computed in ONE pass
 * (tokenize, per-token base-31 codepoint fold mod 2^20, Knuth-multiplier
 * mix onto the 32-bit ring, per-bit ±1 votes, bit set when the vote sum
 * is >= 0). Arithmetic contract is EXACTLY Dedup.portableTokenHash /
 * the dedup_simhash_pairs DuckDB oracle — change neither without the
 * other. The contract is ASCII-only: the three definitions iterate text
 * differently outside ASCII (this one per Unicode codepoint, the HOF
 * twin per Spark split("") element, DuckDB per grapheme cluster), so
 * surrogate pairs / combining marks may hash differently across them —
 * identical results are guaranteed only for ASCII input, which is all
 * three call sites' documented domain. Exists because the HOF
 * formulation re-evaluates the interpreted
 * tokenize+hash lambda tree once per signature bit (16x); this is the
 * codegen'd single-pass form.
 */
case class PortableSimHash16(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName, Seq(child -> "string"))
  def compute(s: Object): Long = {
    val t = s.toString.trim
    // split semantics of Spark's split(trim(text), ' +'): "" yields [""]
    val toks: Array[String] = if (t.isEmpty) Array("") else t.split(" +", -1)
    val acc = new Array[Int](16)
    var ti = 0
    while (ti < toks.length) {
      val tok = toks(ti)
      var poly = 0L
      var i = 0
      while (i < tok.length) {
        val cp = tok.codePointAt(i)
        poly = (poly * 31 + cp) % 1048576L
        i += Character.charCount(cp)
      }
      val h = (poly * 2654435761L) % 4294967296L
      var b = 0
      while (b < 16) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      ti += 1
    }
    var out = 0L
    var b = 0
    while (b < 16) { if (acc(b) >= 0) out |= (1L << b); b += 1 }
    out
  }
  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[Object])
  override protected def doGenCode(ctx: codegen.CodegenContext, ev: codegen.ExprCode): codegen.ExprCode = {
    val ref = ctx.addReferenceObj("psimhash", this, classOf[PortableSimHash16].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }
  override def prettyName: String = "simhash16"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/**
 * Random-hyperplane LSH signature: embedding -> `nbits`-bit bucket id.
 * Hyperplane components are seeded Gaussians — identical on every executor.
 */
case class HyperplaneSig(left: Expression, right: Expression, seed: Long = 7L)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  @transient private lazy val lf = isFloatArray(left)

  @transient private lazy val planes: Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(64)(Array.fill(4096)(rnd.nextGaussian()))
  }

  def compute(vec: ArrayData, nb: Object): Long = {
    val nbits = StKit.int(nb)
    require(nbits >= 1 && nbits <= 64, s"hyperplane_sig supports 1..64 bits, got $nbits")
    // fail loudly instead of silently truncating to a 4096-dim prefix
    // (which would quietly degrade bucket recall)
    require(vec.numElements() <= 4096,
      s"hyperplane_sig supports vectors up to 4096 dims, got ${vec.numElements()}")
    var sig = 0L
    var b = 0
    while (b < nbits) {
      val p = planes(b)
      var s = 0.0
      var i = 0
      val n = math.min(vec.numElements(), p.length)
      while (i < n) { s += elem(vec, i, lf) * p(i); i += 1 }
      if (s >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
  override def nullSafeEval(v: Any, nb: Any): Any =
    compute(v.asInstanceOf[ArrayData], nb.asInstanceOf[Object])
  override protected def doGenCode(ctx: codegen.CodegenContext, ev: codegen.ExprCode): codegen.ExprCode = {
    val ref = ctx.addReferenceObj("hplane", this, classOf[HyperplaneSig].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, ${StCodegen.box(b, right.dataType)});")
  }
  override def prettyName: String = "hyperplane_sig"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/**
 * Banded random-hyperplane LSH: embedding -> array of `bands` independent
 * sub-signatures of `bitsPerBand` bits each, every band drawn from its own
 * seeded hyperplanes. Two vectors are near-dup candidates when ANY band
 * matches exactly — the same band-OR construction as MinHash LSH — so the
 * bucket join stays an equi-join with 2^bitsPerBand keys per band and the
 * within-bucket pair count is controlled by `bitsPerBand`, not by corpus
 * size (the fix for the quadratic exact-signature bucket flagged in
 * round-2 review of ops/Similarity.scala).
 */
case class BandedHyperplaneSig(first: Expression, second: Expression, third: Expression,
                               seed: Long = 7L)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  @transient private lazy val vf = isFloatArray(first)

  // Planes are generated lazily from one seeded Gaussian stream, so plane i
  // is identical on every executor and independent of how many are asked
  // for. Sized on demand: bands*bitsPerBand rows of 4096 doubles.
  @transient private lazy val planeBuf = new java.util.ArrayList[Array[Double]]()
  @transient private lazy val planeRnd = new java.util.Random(seed)
  private def ensurePlanes(n: Int): java.util.ArrayList[Array[Double]] = planeBuf.synchronized {
    while (planeBuf.size < n) planeBuf.add(Array.fill(4096)(planeRnd.nextGaussian()))
    planeBuf
  }

  def compute(vec: ArrayData, bb: Object, nb: Object): ArrayData = {
    val bitsPerBand = StKit.int(bb)
    val bands = StKit.int(nb)
    require(bitsPerBand >= 1 && bitsPerBand <= 63,
      s"banded_hyperplane_sig supports 1..63 bits per band, got $bitsPerBand")
    require(bands >= 1 && bands <= 256,
      s"banded_hyperplane_sig supports 1..256 bands, got $bands")
    require(vec.numElements() <= 4096,
      s"banded_hyperplane_sig supports vectors up to 4096 dims, got ${vec.numElements()}")
    val planes = ensurePlanes(bands * bitsPerBand)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var sig = 0L
      var j = 0
      while (j < bitsPerBand) {
        val p = planes.get(b * bitsPerBand + j)
        var s = 0.0
        var i = 0
        val n = math.min(vec.numElements(), p.length)
        while (i < n) { s += elem(vec, i, vf) * p(i); i += 1 }
        if (s >= 0) sig |= (1L << j)
        j += 1
      }
      out(b) = sig
      b += 1
    }
    new GenericArrayData(out)
  }
  override def nullSafeEval(v: Any, bb: Any, nb: Any): Any =
    compute(v.asInstanceOf[ArrayData], bb.asInstanceOf[Object], nb.asInstanceOf[Object])
  override protected def doGenCode(ctx: codegen.CodegenContext, ev: codegen.ExprCode): codegen.ExprCode = {
    val ref = ctx.addReferenceObj("bandedHplane", this, classOf[BandedHyperplaneSig].getName)
    nullSafeCodeGen(ctx, ev, (a, b, c) => s"${ev.value} = $ref.compute($a, ${StCodegen.box(b, children(1).dataType)}, ${StCodegen.box(c, children(2).dataType)});")
  }
  override def prettyName: String = "banded_hyperplane_sig"
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(f, s, t)
}

/**
 * word_ngram_hashes(text, n): distinct xxhash64 fingerprints of the word
 * n-grams of `text` — the one-pass fused form of
 * `array_distinct(transform(wordNgrams(text, n), g => xxhash64(g)))`.
 * Higher-order functions are interpreted per element in Spark; the fused
 * loop tokenizes (space runs, after a space trim — exactly
 * `split(trim(text), " +")`), joins each n-gram with single spaces into a
 * reused buffer, and hashes with the same XXH64 seed 42 Spark's
 * `xxhash64` uses — so every produced hash is bit-identical to the HOF
 * chain while running ~10x faster (the decontamination hot path).
 */
case class WordNgramHashes(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() =
    graft.functions.StKit.checkTypes(prettyName, Seq(left -> "string", right -> "numeric"))

  def compute(raw: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val bytes = raw.trim().getBytes
    // token [start, end) offsets over space-run boundaries
    val starts = new scala.collection.mutable.ArrayBuffer[Int]()
    val ends = new scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    var inTok = false
    while (i < bytes.length) {
      if (bytes(i) != ' ') { if (!inTok) { starts += i; inTok = true } }
      else if (inTok) { ends += i; inTok = false }
      i += 1
    }
    if (inTok) ends += bytes.length
    val t = starts.length
    // split("") yields ONE empty token, so for n == 1 the HOF chain emits
    // the single hash of zero bytes — mirror it; for n >= 2 an empty text
    // still has < n tokens -> no grams
    if (t == 0 && n == 1)
      return new GenericArrayData(Array(
        org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, 0, 42L)))
    if (t < n) return new GenericArrayData(Array.empty[Long])
    var buf = new Array[Byte](64)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var g = 0
    while (g <= t - n) {
      var len = n - 1
      var j = g
      while (j < g + n) { len += ends(j) - starts(j); j += 1 }
      if (buf.length < len) buf = new Array[Byte](math.max(len, buf.length * 2))
      var off = 0
      j = g
      while (j < g + n) {
        val tl = ends(j) - starts(j)
        System.arraycopy(bytes, starts(j), buf, off, tl)
        off += tl
        if (j < g + n - 1) { buf(off) = ' '; off += 1 }
        j += 1
      }
      seen.add(org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, 42L))
      g += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(t: Any, nv: Any): Any =
    compute(t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      nv.asInstanceOf[Number].intValue())
  def evalBoxed(t: org.apache.spark.unsafe.types.UTF8String, nv: Int): ArrayData = compute(t, nv)
  override protected def doGenCode(ctx: codegen.CodegenContext, ev: codegen.ExprCode): codegen.ExprCode = {
    val ref = ctx.addReferenceObj("wng", this, classOf[WordNgramHashes].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.evalBoxed($a, (int)($b));")
  }
  override def prettyName: String = "word_ngram_hashes"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/**
 * char_ngram_hashes(text, k): murmur3 hashes of the char k-gram shingles —
 * the one-pass fused form of Dedup.shinglesExpr's
 * `array_distinct(transform(sequence(...), i => hash(substr(text, i, k))))`
 * (distinct, first-occurrence order, same `hash()` seed 42; positions are
 * code points like Spark's substr, so multibyte text shingles
 * identically). Texts shorter than k produce one whole-text shingle,
 * matching the `greatest(len-k+1, 1)` guard in the HOF chain.
 */
case class CharNgramHashes(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() =
    graft.functions.StKit.checkTypes(prettyName, Seq(left -> "string", right -> "numeric"))

  def compute(raw: org.apache.spark.unsafe.types.UTF8String, k: Int): ArrayData = {
    val bytes = raw.getBytes
    // byte offsets of each code-point start (UTF-8 continuation = 10xxxxxx);
    // two passes over the bytes fill a primitive array — no boxing
    var nChars = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) nChars += 1
      i += 1
    }
    val offs = new Array[Int](nChars + 1)
    var oi = 0; i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) { offs(oi) = i; oi += 1 }
      i += 1
    }
    offs(nChars) = bytes.length
    @inline def hashOf(from: Int, until: Int): Int =
      org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + offs(from),
        offs(until) - offs(from), 42)
    if (nChars <= k - 1)
      return new GenericArrayData(Array(hashOf(0, nChars)))
    // first-occurrence-order dedup via a primitive open-addressing set:
    // the gram loop runs len(text) times per row — a boxed LinkedHashSet
    // here was one allocation per gram across the whole corpus
    val nGrams = nChars - k + 1
    var cap = 8
    while (cap < nGrams * 2) cap <<= 1
    val mask = cap - 1
    val table = new Array[Int](cap)
    val used = new Array[Boolean](cap)
    val order = new Array[Int](nGrams)
    var n = 0
    var g = 0
    while (g <= nChars - k) {
      val v = hashOf(g, g + k)
      var idx = (v * -1640531527) & mask // Fibonacci spread, linear probe
      var done = false
      while (!done) {
        if (!used(idx)) {
          used(idx) = true; table(idx) = v; order(n) = v; n += 1; done = true
        } else if (table(idx) == v) done = true
        else idx = (idx + 1) & mask
      }
      g += 1
    }
    val out = new Array[Int](n)
    System.arraycopy(order, 0, out, 0, n)
    new GenericArrayData(out)
  }

  override def nullSafeEval(t: Any, kv: Any): Any =
    compute(t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      kv.asInstanceOf[Number].intValue())
  def evalBoxed(t: org.apache.spark.unsafe.types.UTF8String, kv: Int): ArrayData = compute(t, kv)
  override protected def doGenCode(ctx: codegen.CodegenContext, ev: codegen.ExprCode): codegen.ExprCode = {
    val ref = ctx.addReferenceObj("cng", this, classOf[CharNgramHashes].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.evalBoxed($a, (int)($b));")
  }
  override def prettyName: String = "char_ngram_hashes"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/**
 * Product-quantization encoder: vector -> `m` codebook indices (argmin
 * L2 per subspace over the L2-NORMALIZED input, first index wins ties).
 * The codebooks ride INSIDE the expression (flattened to primitive
 * arrays at first use); one virtual call into this pre-compiled loop per
 * row — the interpreted higher-order-function formulation of the same
 * argmin cost ~60 s at sf0.1 where this runs in milliseconds.
 */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  @transient private lazy val cf = isFloatArray(child)
  private val m = codebooks.length
  private val k = codebooks.head.length
  private val dsub = codebooks.head.head.length
  // flat per-subspace [k * dsub] layout: the inner loop is pure primitive
  // array math, no nested-array derefs
  @transient private lazy val flat: Array[Array[Double]] =
    codebooks.map { cs =>
      val a = new Array[Double](k * dsub)
      var c = 0
      while (c < k) {
        var i = 0
        while (i < dsub) { a(c * dsub + i) = cs(c)(i); i += 1 }
        c += 1
      }
      a
    }

  def compute(v: ArrayData): ArrayData = {
    val dim = m * dsub
    val x = new Array[Double](dim) // zero-padded when the input is shorter
    val n = math.min(v.numElements(), dim)
    var i = 0
    var s = 0.0
    while (i < n) { val e = elem(v, i, cf); x(i) = e; s += e * e; i += 1 }
    if (s > 0.0) {
      val inv = 1.0 / math.sqrt(s)
      i = 0
      while (i < dim) { x(i) *= inv; i += 1 }
    }
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cb = flat(j)
      val off = j * dsub
      var best = 0
      var bd = Double.MaxValue
      var c = 0
      while (c < k) {
        var d = 0.0
        var t = 0
        while (t < dsub) { val dd = x(off + t) - cb(c * dsub + t); d += dd * dd; t += 1 }
        if (d < bd) { bd = d; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: codegen.CodegenContext, ev: codegen.ExprCode): codegen.ExprCode = {
    val ref = ctx.addReferenceObj("pqEnc", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }
  override def prettyName: String = "pq_encode"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * Asymmetric-distance score: sum over subspaces of `lut(j)(code_j)` —
 * the per-query lookup table rides inside the expression, the row cost
 * is `m` primitive lookups. Out-of-range codes (corrupt input) score
 * -Inf rather than throwing: the rerank discards them.
 */
case class PqAdcScore(child: Expression, lut: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  private val m = lut.length
  private val k = lut.head.length

  def compute(codes: ArrayData): Double = {
    // a code array of the wrong arity is as corrupt as an out-of-range
    // code: a truncated sum could rank ABOVE complete rows when the
    // missing subspaces' lut entries are negative
    if (codes.numElements() != m) return Double.NegativeInfinity
    var s = 0.0
    var j = 0
    while (j < m) {
      val c = codes.getInt(j)
      if (c < 0 || c >= k) return Double.NegativeInfinity
      s += lut(j)(c)
      j += 1
    }
    s
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: codegen.CodegenContext, ev: codegen.ExprCode): codegen.ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdcScore].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }
  override def prettyName: String = "pq_adc_score"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
