package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions (SURVEY.md §2.6) for the hot paths
  * where composing built-ins costs extra passes:
  *
  *  - [[CosineSimilarity]]: one fused codegen loop (dot + both norms)
  *    instead of three interpreted higher-order-function folds —
  *    accumulation order identical to the fold, so results are
  *    bit-identical (oracle parity preserved).
  *  - [[RollingPolyHash]]: codegen rolling polynomial hash over a
  *    string, replacing a split/transform/aggregate expression chain.
  *  - [[SimHashAgg]]: native 64-bit SimHash aggregate with a 64-int
  *    buffer, replacing 64 separate sum() aggregates (1 buffer column
  *    through the shuffle instead of 64).
  */
object GraftExpressions {

  /** Column API: fused cosine similarity over two Array[Float] cols. */
  def cosineSim(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))

  /** Column API: rolling polynomial hash (base 131, mod 1e9+7). */
  def polyHash(c: Column): Column = column(RollingPolyHash(expression(c)))

  /** Column API: SimHash aggregate over a per-token 64-bit hash col. */
  def simHashAgg(h: Column): Column =
    column(SimHashAgg(expression(h)).toAggregateExpression())

  /** Column API: word n-gram shingles of a text column in one pass. */
  def wordShingles(text: Column, n: Int, distinct: Boolean): Column =
    column(WordShingles(expression(text), n, distinct))

  /** Column API: non-empty space-separated token count, one byte pass. */
  def wordCount(text: Column): Column = column(WordCount(expression(text)))

  /** Column API: embedded-BPE token count of a text column. */
  def bpeCount(text: Column): Column = column(BpeCount(expression(text)))

  /** Column API: embedded-BPE token-ID array of a text column (X15). */
  def bpeEncode(text: Column): Column = column(BpeEncode(expression(text)))

  /** Column API: text decoded from a token-ID array column (X16). */
  def bpeDecode(ids: Column): Column = column(BpeDecode(expression(ids)))

  /** Column API: joined-decimal id n-grams of an int-array column in
    * one pass (X17).
    */
  def idGrams(ids: Column, n: Int): Column = column(IdGrams(expression(ids), n))

  /** Column API: all minhash permutations of a shingle array in one
    * pass (X8).
    */
  def minHashHex(shingles: Column, perms: Int): Column =
    column(MinHashHex(expression(shingles), perms))

  /** Column API: 16-bin high-nibble histogram of a binary column in
    * one pass (X9).
    */
  def nibbleHistogram(payload: Column): Column =
    column(NibbleHistogram(expression(payload)))

  /** Column API: struct(format, distinct body byte-gram hex strings)
    * via the structural header walk, one codegen pass (X12).
    */
  def rasterBodyGrams(payload: Column, width: Int): Column =
    column(RasterBodyGrams(expression(payload), width))

  /** Column API: struct(format, 60-bit average-hash of the raster
    * body) via the structural header walk, one codegen pass (X13).
    */
  def avgHash60(payload: Column): Column =
    column(AvgHash60(expression(payload)))

  /** Column API: decode bytes via a (possibly sloppy) charset label
    * (X18).
    */
  def charsetDecode(bin: Column, label: Column): Column =
    column(CharsetDecode(expression(bin), expression(label)))

  /** Column API: encode text into a labeled charset's bytes (X19). */
  def charsetEncode(text: Column, label: Column): Column =
    column(CharsetEncode(expression(text), expression(label)))

  /** Column API: does the charset label resolve to a JVM charset? */
  def charsetKnown(label: Column): Column =
    column(CharsetKnown(expression(label)))

  /** Column API: RFC 9309 rules struct for an agent (X20). */
  def robotsRules(txt: Column, agent: Column): Column =
    column(RobotsRulesExpr(expression(txt), expression(agent)))

  /** Column API: per-url RFC 9309 allow decision (X21). */
  def robotsAllowed(path: Column, allow: Column, disallow: Column): Column =
    column(RobotsAllowed(expression(path), expression(allow), expression(disallow)))

  /** Column API: one-pass canonical URL (X22). */
  def canonicalUrl(url: Column): Column =
    column(CanonicalUrl(expression(url)))

  /** Column API: one-pass URL host extraction (X23). */
  def urlHost(url: Column): Column =
    column(UrlHost(expression(url)))

  /** Column API: PSL registrable domain of a host (X24). */
  def registrableDomain(host: Column): Column =
    column(RegistrableDomain(expression(host)))

  /** Column API: href resolved against its page URL (X25). */
  def resolveUrl(base: Column, href: Column): Column =
    column(ResolveUrl(expression(base), expression(href)))

  /** Column API: magic-byte MIME sniff of a binary payload (X26). */
  def sniffMime(payload: Column): Column =
    column(MimeSniff(expression(payload)))

  /** Column API: 60-bit sign sketch of an embedding, one codegen
    * pass (X14).
    */
  def signPack60(embedding: Column): Column =
    column(SignPack60(expression(embedding)))
}

/** Word n-gram shingles of a text column in ONE pass over the UTF-8
  * bytes: tokenize on 0x20 (space never occurs inside a UTF-8
  * multibyte sequence), emit n-grams joined by a single space,
  * optionally first-occurrence-distinct. Replaces the
  * `filter(split(...))` + indexed `transform(slice(...))` +
  * `array_distinct` chain, whose higher-order functions evaluate an
  * interpreted lambda per element (~3s/pass over sf0.1 vs ~1s for
  * this). Semantics are identical to the HOF chain and the DuckDB
  * oracle's list_transform (empty tokens dropped, docs under n words
  * yield an empty array); result ORDER is irrelevant downstream —
  * every consumer explodes into set/multiset aggregations.
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles$$.MODULE$$.compute($c, $n, $distinct);")

  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}

object WordShingles {
  /** Static entry shared by eval and generated code. */
  def compute(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val bytes = text.getBytes
    // token boundaries on the space byte; empties dropped
    val tokens = new java.util.ArrayList[UTF8String]()
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' '.toByte) {
        if (i > start) tokens.add(UTF8String.fromBytes(bytes, start, i - start))
        start = i + 1
      }
      i += 1
    }
    val m = tokens.size - n + 1
    if (m <= 0) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val sep = UTF8String.fromString(" ")
    val out = new java.util.ArrayList[UTF8String](m)
    val seen = if (distinct) new java.util.HashSet[UTF8String](m * 2) else null
    var j = 0
    while (j < m) {
      val parts = new Array[UTF8String](n)
      var k = 0
      while (k < n) { parts(k) = tokens.get(j + k); k += 1 }
      val sh = UTF8String.concatWs(sep, parts: _*)
      if (seen == null || seen.add(sh)) out.add(sh)
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray.asInstanceOf[Array[AnyRef]])
  }
}

/** X17: id n-grams of an int-array column as joined decimal strings
  * ("7-12-99-…"), one pass, codegen'd — t28's gram emission. The
  * HOF formulation (`transform(sequence(0, n-8), i -> array_join(
  * transform(slice(ids, i+1, 8), cast), '-'))`) slices and casts with
  * interpreted lambdas per position: O(len·n) allocations per row and
  * no codegen. Here each gram renders digits straight into one byte
  * buffer. Value-identical to the HOF chain (spec-pinned) and to the
  * DuckDB `array_to_string(list_transform(ids[a:b], CAST), '-')`
  * form, since both print decimal ints.
  */
case class IdGrams(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    IdGrams.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.IdGrams$$.MODULE$$.compute($c, $n);")

  override protected def withNewChildInternal(c: Expression): IdGrams =
    copy(child = c)
}

object IdGrams {
  /** Static entry shared by eval and generated code. */
  def compute(ids: ArrayData, n: Int): ArrayData = {
    val len = ids.numElements()
    val m = len - n + 1
    if (m <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new Array[AnyRef](m)
    val sb = new java.lang.StringBuilder(n * 8)
    var j = 0
    while (j < m) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append('-')
        sb.append(ids.getInt(j + k))
        k += 1
      }
      out(j) = UTF8String.fromString(sb.toString)
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Non-empty space-separated token count in one pass over the UTF-8
  * bytes — no token allocation, no array build. Exists so a
  * "has at least n words" predicate (== `size(wordShingles(text, n,
  * _)) > 0`, since [[WordShingles]] drops empty tokens and emits one
  * n-gram per word window) can gate a shingle projection WITHOUT
  * evaluating the shingle expression itself: Catalyst collapses
  * Filter+Project but does NOT share the subexpression across them,
  * so `where(size(sh) > 0)` over a `select(wordShingles as sh)` pays
  * the full shingle build twice per row. Measured at sf0.1 this
  * halves the shingle-cache population of every dedup query.
  */
case class WordCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    WordCount.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordCount$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(c: Expression): WordCount =
    copy(child = c)
}

object WordCount {
  /** Static entry shared by eval and generated code. Must agree with
    * [[WordShingles.compute]]'s tokenizer: split on the space byte,
    * drop empties (WordCountSpec pins the agreement).
    */
  def compute(text: UTF8String): Long = {
    val bytes = text.getBytes
    var n = 0L
    var inTok = false
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' '.toByte) inTok = false
      else if (!inTok) { n += 1; inTok = true }
      i += 1
    }
    n
  }
}

/** Embedded-BPE token count over a text column in one codegen pass:
  * tokenize on the space byte, then apply the committed merge table
  * in rank order over a symbol array (see [[Bpe]] for the
  * equivalence argument vs the SQL replace chain the DuckDB oracle
  * runs — BpeSpec pins expression == SQL chain over the corpus).
  * Replaces an interpreted transform/aggregate fold of ~60 chained
  * replaces per word (~10x slower, measured at sf0.1).
  */
case class BpeCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(v: Any): Any =
    Bpe.countTokens(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Bpe$$.MODULE$$.countTokens($c);")

  override protected def withNewChildInternal(c: Expression): BpeCount =
    copy(child = c)
}

/** X15: token-ID emission — the committed merge table's BPE encode of
  * a text column as Array[Int] ids, one codegen pass per row (see
  * [[Bpe.encodeIds]] for the id scheme and the engine-neutral twin).
  * `size(BpeEncode(t))` = `BpeCount(t)` + (words−1) separators;
  * BpeSpec pins both that identity and decode∘encode == the corpus
  * normalization.
  */
case class BpeEncode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    Bpe.encodeIds(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Bpe$$.MODULE$$.encodeIds($c);")

  override protected def withNewChildInternal(c: Expression): BpeEncode =
    copy(child = c)
}

/** X16: inverse of [[BpeEncode]] — pure symbol concatenation (ids are
  * code points or merge ranks; no lookup join, no shuffle).
  */
case class BpeDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(v: Any): Any =
    Bpe.decodeIds(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Bpe$$.MODULE$$.decodeIds($c);")

  override protected def withNewChildInternal(c: Expression): BpeDecode =
    copy(child = c)
}

/** Fused cosine similarity: dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))
  * in a single pass. Accumulators fold left-to-right exactly like the
  * aggregate()-based formulation (and the DuckDB oracle), so the
  * result is bit-identical — see VectorFunctions.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val xb = b.asInstanceOf[ArrayData]
    val n = math.min(xa.numElements(), xb.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = xa.getFloat(i).toDouble
      val y = xb.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double x = (double) $a.getFloat($i);
          double y = (double) $b.getFloat($i);
          $dot += x * y; $na += x * x; $nb += y * y;
        }
        ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Rolling polynomial hash over a string's UTF-16 code units:
  * fold(acc, c) = (acc * 131 + c) % 1_000_000_007. Matches the
  * split('')/ascii() aggregate formulation for ASCII/BMP text (the
  * documents corpus), single codegen loop, no array materialization.
  */
case class RollingPolyHash(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val s = v.toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      acc = (acc * 131L + s.charAt(i).toLong) % 1000000007L
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        java.lang.String $s = $c.toString();
        long $acc = 0L;
        for (int $i = 0; $i < $s.length(); $i++) {
          $acc = ($acc * 131L + (long) $s.charAt($i)) % 1000000007L;
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Native 64-bit SimHash aggregate. Input: a per-token 64-bit hash.
  * Buffer: 64 signed counters (+1 per set bit, -1 per clear bit);
  * eval emits the sign bit-pattern. Equivalent to 64 separate
  * sum(when(...)) aggregates but ships ONE buffer through the partial
  * aggregation instead of 64 long columns.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Int]]
    with UnaryLike[Expression] {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) buf(i) += 1 else buf(i) -= 1
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Int]): Any = {
    var sim = 0L
    var i = 0
    while (i < 64) {
      if (buf(i) > 0) sim |= (1L << i)
      i += 1
    }
    sim
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(64 * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): SimHashAgg =
    copy(child = c)
}

/** X8: every minhash permutation of a shingle array in ONE pass.
  * Value-identical to the HOF chain
  * `array_min(transform(sh, s -> substring(md5(concat(s, '|i')), 1, 16)))`
  * repeated for i < perms — the derivation d02/d11/bandKeys (and the
  * DuckDB oracles) define — but Spark's higher-order functions are
  * CodegenFallback (an interpreted lambda per element), and the chain
  * builds `perms` intermediate arrays per row. This computes all
  * permutation minima in one traversal with no intermediates:
  * lexicographic min of fixed-width lowercase hex equals unsigned
  * byte order of the first 8 md5 bytes, so minima are tracked as raw
  * bytes and hex-encoded once at the end. Returns null for an empty
  * array (as array_min over an empty transform does).
  */
case class MinHashHex(child: Expression, perms: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    MinHashHex.compute(input.asInstanceOf[ArrayData], perms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = nullSafeCodeGen(ctx, ev, in =>
      s"""${ev.value} = graft.functions.MinHashHex$$.MODULE$$.compute($in, $perms);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
    c
  }

  override protected def withNewChildInternal(c: Expression): MinHashHex =
    copy(child = c)
}

object MinHashHex {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  // "|i" suffix bytes per permutation, cached per perm count
  private val suffixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()
  private def suffixes(perms: Int): Array[Array[Byte]] =
    suffixCache.computeIfAbsent(perms,
      p => Array.tabulate(p)(i => s"|$i".getBytes("UTF-8")))

  private val HEX = "0123456789abcdef".toCharArray

  /** Static entry shared by eval and generated code. */
  def compute(arr: ArrayData, perms: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val md = md5.get()
    val sfx = suffixes(perms)
    val mins = Array.fill(perms)(null: Array[Byte])
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j).getBytes
      var i = 0
      while (i < perms) {
        md.reset()
        md.update(s)
        md.update(sfx(i))
        val d = md.digest()
        if (mins(i) == null || unsignedLess(d, mins(i))) mins(i) = d
        i += 1
      }
      j += 1
    }
    val out = new Array[AnyRef](perms)
    var i = 0
    while (i < perms) {
      val m = mins(i)
      val cs = new Array[Char](16)
      var k = 0
      while (k < 8) {
        cs(2 * k) = HEX((m(k) >> 4) & 0xf)
        cs(2 * k + 1) = HEX(m(k) & 0xf)
        k += 1
      }
      out(i) = UTF8String.fromString(new String(cs))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var k = 0
    while (k < 8) {
      val x = a(k) & 0xff
      val y = b(k) & 0xff
      if (x != y) return x < y
      k += 1
    }
    false
  }
}

/** X9: 16-bin high-nibble histogram of a binary payload in ONE pass
  * over the bytes — (b & 0xF0) >>> 4 is exactly the odd-position hex
  * digit of hex(payload), so semantics match the engine-neutral
  * hex()/instr() formulation (and the DuckDB oracle) bit for bit
  * while replacing a 2-chars-per-byte string materialization + a
  * per-character explode with a primitive loop returning 16 longs
  * per row (m07's hot path: the explode was emitting `payload_len`
  * rows per document through codegen before the partial agg).
  */
case class NibbleHistogram(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    NibbleHistogram.compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NibbleHistogram$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(c: Expression): NibbleHistogram =
    copy(child = c)
}

object NibbleHistogram {
  def compute(bytes: Array[Byte]): ArrayData = {
    val h = new Array[Long](16)
    var i = 0
    while (i < bytes.length) {
      h((bytes(i) & 0xf0) >>> 4) += 1
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(h)
  }
}

/** X12: container-invariant raster-body byte shingles in ONE codegen
  * pass over the payload bytes — the structural header walk
  * ([[graft.operators.Multimodal.rasterStart]]: PNG IHDR chunk
  * length / JPEG SOF marker walk / GIF logical screen descriptor)
  * locates the body, then every overlapping `width`-byte window of
  * the body is emitted as an uppercase-hex gram string,
  * first-occurrence-distinct. Value-identical to the former
  * decodeBodies (mapPartitions hex materialization) +
  * `array_distinct(transform(sequence(...), substr(body_hex, ...)))`
  * chain — same walk, same hex alphabet, same distinct order — but
  * with no 2-chars-per-byte body string ever materialized and no
  * interpreted HOF lambda per gram (the X5/X9 lesson applied to
  * binary): dedup happens on the packed gram VALUE (width <= 8 bytes
  * fits a Long), and only the distinct survivors are hex-encoded.
  * The same pass also emits `sketch`, the mod-16 subsample of the
  * gram set (grams whose low nibble is 0, i.e. hex strings ending in
  * '0') — a deterministic Broder-style mod-p sketch that downstream
  * LSH banding minhashes INSTEAD of the full set, cutting the
  * band-key cost 16x while leaving the exact-verify domain (the full
  * gram set) untouched; identical bodies have identical sketches, so
  * sketch-banding still catches every re-containered duplicate. The
  * subsample is replayable in engine-neutral SQL: a gram is
  * 2*width hex chars, so the low nibble is the LAST character —
  * `list_filter(gs, s -> substr(s, 2 * width, 1) = '0')`, which at
  * the pinned width=8 (the only configuration any caller, spec, or
  * oracle uses — m08/ST16's replay hard-codes `substr(s, 16, 1)`)
  * is position 16. A caller choosing another width must derive its
  * replay position the same way or the SQL twin silently filters
  * the wrong character. Returns null for unknown/truncated
  * containers and
  * for bodies shorter than `width` (exactly the rows the old
  * `rasterStart`-None / `length(body_hex) >= 2*width` gates dropped).
  */
case class RasterBodyGrams(child: Expression, width: Int)
    extends UnaryExpression {
  require(width >= 1 && width <= 8, s"width must be in [1, 8], got $width")

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("grams", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("sketch", ArrayType(StringType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    RasterBodyGrams.compute(input.asInstanceOf[Array[Byte]], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"""${ev.value} = graft.functions.RasterBodyGrams$$.MODULE$$.compute($in, $width);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)

  override protected def withNewChildInternal(c: Expression): RasterBodyGrams =
    copy(child = c)
}

object RasterBodyGrams {

  private val HEX = "0123456789ABCDEF".toCharArray

  /** Static entry shared by eval and generated code. */
  def compute(bytes: Array[Byte], width: Int): InternalRow =
    graft.operators.Multimodal.rasterStart(bytes) match {
      case Some((fmt, start)) if bytes.length - start >= width =>
        val n = bytes.length - start - width + 1
        // first-occurrence-distinct on the PACKED gram value; hex
        // encoding deferred to the distinct survivors only
        val seen = new java.util.LinkedHashSet[java.lang.Long](
          math.min(n, 1 << 16))
        var i = 0
        while (i < n) {
          var v = 0L
          var k = 0
          while (k < width) {
            v = (v << 8) | (bytes(start + i + k) & 0xffL)
            k += 1
          }
          seen.add(v)
          i += 1
        }
        val out = new Array[AnyRef](seen.size)
        val sk = new java.util.ArrayList[AnyRef]()
        val it = seen.iterator()
        var j = 0
        while (it.hasNext) {
          val v = it.next().longValue()
          val cs = new Array[Char](2 * width)
          var k = 0
          while (k < width) {
            val b = ((v >>> (8 * (width - 1 - k))) & 0xff).toInt
            cs(2 * k) = HEX(b >> 4)
            cs(2 * k + 1) = HEX(b & 15)
            k += 1
          }
          val s = UTF8String.fromString(new String(cs))
          out(j) = s
          if ((v & 0xfL) == 0L) sk.add(s)
          j += 1
        }
        InternalRow(UTF8String.fromString(fmt),
          new org.apache.spark.sql.catalyst.util.GenericArrayData(out),
          new org.apache.spark.sql.catalyst.util.GenericArrayData(
            sk.toArray(new Array[AnyRef](sk.size()))))
      case _ => null
    }
}

/** X13: container-invariant 60-bit perceptual average-hash of a
  * raster payload's BODY — the aHash shape every production image
  * dedup runs (resize to a fixed grid, threshold each cell at the
  * global mean, pack the bits), computed in ONE codegen pass over the
  * payload bytes with the body located by the same structural header
  * walk X12/m05 use. The "resize" stand-in is the deterministic
  * 60-way equi-partition of the body byte stream (segment of byte i =
  * i*60/n): this container has no real image codecs (the brief's
  * stub-the-decode rule), but the plumbing — fixed-width hash from
  * variable-length bodies, mean thresholding, bit packing — is the
  * real aHash pipeline, and a real decoder drops in by replacing the
  * segment-mean reduction with pixel-grid means.
  *
  * Exactness discipline: bit j is set iff segment j's mean EXCEEDS
  * the global mean, decided by cross-multiplication
  * (sum_j * n > total * len_j) — pure int64, no fp division, so the
  * DuckDB oracle replays the hash bit-for-bit. Safe while
  * 255*n^2 < 2^63, i.e. bodies to ~190 MB — far past any raster.
  * 60 bits (not the classic 64) keeps the top nibble zero, so the
  * signed-int64 band arithmetic ((h >> 15k) & 32767) is portable
  * across engines without unsigned-shift traps — the hash60/SimHash
  * discipline. Null for unknown/truncated containers and for bodies
  * under 60 bytes (a segment would be empty).
  */
case class AvgHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("ahash", LongType, nullable = false)))
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    AvgHash60.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"""${ev.value} = graft.functions.AvgHash60$$.MODULE$$.compute($in);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)

  override protected def withNewChildInternal(c: Expression): AvgHash60 =
    copy(child = c)
}

object AvgHash60 {

  val Segments = 60

  /** Static entry shared by eval and generated code. */
  def compute(bytes: Array[Byte]): InternalRow =
    graft.operators.Multimodal.rasterStart(bytes) match {
      case Some((fmt, start)) if bytes.length - start >= Segments =>
        val n = bytes.length - start
        val sums = new Array[Long](Segments)
        val lens = new Array[Long](Segments)
        var total = 0L
        var i = 0
        while (i < n) {
          val seg = (i.toLong * Segments / n).toInt
          val v = (bytes(start + i) & 0xff).toLong
          sums(seg) += v
          lens(seg) += 1
          total += v
          i += 1
        }
        var h = 0L
        var j = 0
        while (j < Segments) {
          // segment mean > global mean, exactly (cross-multiplied)
          if (sums(j) * n > total * lens(j)) h |= (1L << j)
          j += 1
        }
        InternalRow(UTF8String.fromString(fmt), h)
      case _ => null
    }
}

/** X14: 60-bit sign sketch of an embedding — bit j set iff
  * element j > 0 — in one codegen pass over the float array. The
  * modern binary-quantization coarse metric: Hamming distance on the
  * packed word approximates angular distance at 8 bytes/vector
  * (vs 256 for 64 fp32 dims), so the candidate scan is a popcount
  * over longs instead of a dot product over floats; exact rerank
  * restores cosine on the survivors (s10). 60 bits, not 64 — the
  * AvgHash60/hash60 discipline: the top nibble stays zero so
  * signed-int64 arithmetic (xor, shifts, comparisons) is portable
  * across engines with no unsigned traps; the 4 dropped dims cost
  * recall the rerank step recovers. Sign test is `> 0f` on the raw
  * float — exact and engine-identical (no arithmetic before the
  * compare). Null for arrays under 60 elements.
  */
case class SignPack60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    SignPack60.compute(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { in =>
      val r = ctx.freshName("signPack")
      s"""java.lang.Long $r = graft.functions.SignPack60$$.MODULE$$.compute($in);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): SignPack60 =
    copy(child = c)
}

object SignPack60 {

  val Bits = 60

  /** Static entry shared by eval and generated code. */
  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Long =
    if (arr == null || arr.numElements() < Bits) null
    else {
      var h = 0L
      var j = 0
      while (j < Bits) {
        if (arr.getFloat(j) > 0f) h |= (1L << j)
        j += 1
      }
      java.lang.Long.valueOf(h)
    }
}

/** X18: charset-labeled byte decode — `charset_decode(bin, label)`
  * turns raw captured bytes into text using the (web-sloppy) charset
  * label, in one codegen call per row. The crawl front door's decode
  * step: labels come from Content-Type headers / meta tags / BOMs
  * ([[graft.operators.HttpPayload]] sniffs them), and are a tiny
  * distinct set corpus-wide, so resolution is cached
  * ([[Charsets.resolve]]). Unknown labels fall back to UTF-8;
  * malformed/unmappable bytes become U+FFFD — deterministic, total.
  */
/** X25: `resolve_url(base, href)` — RFC 3986 reference resolution of
  * an extracted href against its page URL (the WAT/outlink
  * primitive): absolute pass-through, protocol-relative and
  * root-relative against the base, directory merge for relative
  * paths, EXACT remove_dot_segments, fragment strip; NULL for
  * non-targets (empty/fragment-only hrefs, opaque mailto:/javascript:
  * schemes). One tree node for the same reason as X22–X24: the
  * columnar when-chain re-derives the base scheme/authority/directory
  * regexes per branch and the optimizer inlines that forest into
  * every downstream reference (the round-16 task-binary lesson), and
  * a regex formulation of remove_dot_segments is only approximable
  * by bounded passes. Semantics in [[UrlOps.resolveUrl]]; the DuckDB
  * twin restates the bounded-pass form (documented in
  * [[graft.operators.Links]]).
  */
case class ResolveUrl(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override protected def nullSafeEval(base: Any, href: Any): Any =
    UrlOps.resolveUrl(base.asInstanceOf[UTF8String], href.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { (b, h) =>
      val r = ctx.freshName("resolved")
      s"""UTF8String $r = graft.functions.UrlOps$$.MODULE$$.resolveUrl($b, $h);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ResolveUrl =
    copy(left = l, right = r)
}

/** X26: `sniff_mime(payload)` — WHATWG-style magic-byte MIME
  * detection ([[Mime.sniff]]): binary signatures, ISO-BMFF brand
  * dispatch, whitespace/BOM-tolerant HTML/XML tag probe, NUL-scan
  * text/binary fallback. One codegen node; a composed-builtin form
  * would need a dozen substring compares plus a decode that throws on
  * non-UTF-8 bytes.
  */
case class MimeSniff(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(payload: Any): Any =
    Mime.sniff(payload.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Mime$$.MODULE$$.sniff($c);")

  override protected def withNewChildInternal(c: Expression): MimeSniff =
    copy(child = c)
}

case class CharsetDecode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(bin: Any, label: Any): Any =
    Charsets.decode(bin.asInstanceOf[Array[Byte]], label.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, l) =>
      s"${ev.value} = graft.functions.Charsets$$.MODULE$$.decode($b, $l);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CharsetDecode =
    copy(left = l, right = r)
}

/** X19: inverse of [[CharsetDecode]] — `charset_encode(text, label)`
  * emits the labeled charset's bytes (unmappable chars become the
  * charset's replacement byte; unknown labels fall back to UTF-8).
  * Exists so format-true multi-charset payloads can be BUILT inside
  * a plan (the t37 oracle's round-trip evidence) and so sinks that
  * must emit legacy encodings stay one expression, not a UDF.
  */
case class CharsetEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(text: Any, label: Any): Any =
    Charsets.encode(text.asInstanceOf[UTF8String], label.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, l) =>
      s"${ev.value} = graft.functions.Charsets$$.MODULE$$.encode($t, $l);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CharsetEncode =
    copy(left = l, right = r)
}

/** Charset-label validity test — `charset_known(label)`: true iff the
  * label resolves to a JVM charset ([[Charsets.isKnown]]). The flag
  * column a crawl pipeline keeps next to the decoded text so
  * fallback-decoded (unknown-label) captures are countable.
  */
case class CharsetKnown(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(label: Any): Any =
    Charsets.isKnown(label.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, l =>
      s"${ev.value} = graft.functions.Charsets$$.MODULE$$.isKnown($l);")

  override protected def withNewChildInternal(c: Expression): CharsetKnown =
    copy(child = c)
}

/** X20: robots.txt group resolution — `robots_rules(txt, agent)` →
  * struct(allow array, disallow array): the RFC 9309 group governing
  * `agent` (most-specific agent token, `*` fallback), parsed in one
  * codegen call. Parse ONCE PER DOMAIN (robots bodies are per-host),
  * broadcast the small rules frame to the url stream — the politeness
  * gate's scale shape; the per-url check is X21.
  */
case class RobotsRulesExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("allow", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("disallow", ArrayType(StringType, containsNull = false), nullable = false)))

  override protected def nullSafeEval(txt: Any, agent: Any): Any =
    RobotsRulesExpr.eval(txt.asInstanceOf[UTF8String], agent.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, a) =>
      s"${ev.value} = graft.functions.RobotsRulesExpr$$.MODULE$$.eval($t, $a);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): RobotsRulesExpr =
    copy(left = l, right = r)
}

object RobotsRulesExpr {
  /** Static entry shared by eval and generated code. */
  def eval(txt: UTF8String, agent: UTF8String): InternalRow = {
    val (a, d) = Robots.rulesStruct(txt, agent)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      new org.apache.spark.sql.catalyst.util.GenericArrayData(a.asInstanceOf[Array[Any]]),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(d.asInstanceOf[Array[Any]])))
  }
}

/** X21: the per-url RFC 9309 decision — `robots_allowed(path, allow,
  * disallow)`: longest matching pattern wins (`*` runs, terminal `$`
  * anchor), allow wins ties, no match → allowed. One codegen call per
  * url against the X20-resolved (usually broadcast) rule arrays.
  */
case class RobotsAllowed(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(path: Any, allow: Any, disallow: Any): Any =
    Robots.allowedU(path.asInstanceOf[UTF8String],
      allow.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      disallow.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, a, d) =>
      s"${ev.value} = graft.functions.Robots$$.MODULE$$.allowedU($p, $a, $d);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): RobotsAllowed =
    copy(first = f, second = s, third = t)
}

/** X22: one-pass canonical URL — `canonical_url(url)`: t36's full
  * normalization (scheme/host lowercase, FQDN dots, userinfo drop,
  * default ports, tracking params, param sort, fragment drop) as ONE
  * tree node over one forward scan ([[UrlOps.canonicalUrl]]), byte-
  * equal to the columnar regex chain it replaces (parity-fuzzed).
  * Exists for plan weight, not semantics: the columnar forest
  * measured 1,326 regex nodes per gate projection after optimizer
  * inlining, 39.8 MiB crawl task binaries, 64 KB codegen fallbacks.
  */
case class CanonicalUrl(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override protected def nullSafeEval(url: Any): Any =
    UrlOps.canonicalUrl(url.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { in =>
      val r = ctx.freshName("canon")
      s"""UTF8String $r = graft.functions.UrlOps$$.MODULE$$.canonicalUrl($in);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): CanonicalUrl =
    copy(child = c)
}

/** X23: one-pass host extraction — `url_host(url)`: t35's hostOf
  * (scheme frame, last-'@' userinfo with regex-faithful backtracking,
  * bracketed IPv6, FQDN dot strip, lowercase) as one node.
  */
case class UrlHost(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override protected def nullSafeEval(url: Any): Any =
    UrlOps.hostOf(url.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { in =>
      val r = ctx.freshName("uhost")
      s"""UTF8String $r = graft.functions.UrlOps$$.MODULE$$.hostOf($in);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): UrlHost =
    copy(child = c)
}

/** X24: PSL registrable domain — `registrable_domain(host)`: the
  * full publicsuffix.org reduction (wildcards, exceptions, private
  * section, IP passthrough) as one node with hash-set rule probes
  * instead of three ~190-literal isin tails.
  */
case class RegistrableDomain(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override protected def nullSafeEval(host: Any): Any =
    UrlOps.registrableDomain(host.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { in =>
      val r = ctx.freshName("regdom")
      s"""UTF8String $r = graft.functions.UrlOps$$.MODULE$$.registrableDomain($in);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): RegistrableDomain =
    copy(child = c)
}
