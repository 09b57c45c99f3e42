package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst extension points — SURVEY.md §2.11: a native scalar Expression,
  * a from-scratch TypedImperativeAggregate (HLL), and a table-generating
  * Generator, all registered into the session FunctionRegistry so both the
  * DSL (via expr) and spark.sql can call them. These run inside Tungsten
  * rows with no serialization hop — the preferred escape hatch before UDFs.
  */
object CatalystExt {

  /** Scalar cosine similarity over two float arrays — double accumulation in
    * element order, exactly matching the higher-order-function formulation
    * (aggregate∘zip_with) it can replace when profiling demands (§4.3).
    * Generates whole-stage-codegen-compatible Java (doGenCode), so it fuses
    * into the surrounding pipeline instead of falling back to eval. */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val x = a.getFloat(i).toDouble
        val y = b.getFloat(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0, $na = 0.0, $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $x = (double) $a.getFloat($i);
           |  double $y = (double) $b.getFloat($i);
           |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
           |}
           |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         """.stripMargin
      })
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** From-scratch HyperLogLog (p=14, splitmix64 finalizer) as a raw
    * TypedImperativeAggregate — the §2.11 UDAF-internals extension point.
    * Registers byte-array max-merge semantics; standard bias-corrected
    * estimate with linear-counting small-range correction. */
  case class GraftHLL(child: Expression,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {
    private val p = 14
    private val m = 1 << p

    override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

    private def splitmix64(v0: Long): Long = {
      var z = v0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }

    override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
      val v = child.eval(input)
      if (v != null) {
        val x = splitmix64(v.asInstanceOf[Number].longValue())
        val idx = (x >>> (64 - p)).toInt
        val rest = x << p
        val rank = (java.lang.Long.numberOfLeadingZeros(rest | 1L) + 1).toByte
        if (rank > buf(idx)) buf(idx) = rank
      }
      buf
    }

    override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < m) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
      buf
    }

    override def eval(buf: Array[Byte]): Any = {
      val alpha = 0.7213 / (1.0 + 1.079 / m)
      var sum = 0.0; var zeros = 0; var i = 0
      while (i < m) {
        sum += java.lang.Math.pow(2.0, -buf(i))
        if (buf(i) == 0) zeros += 1
        i += 1
      }
      var e = alpha * m.toDouble * m.toDouble / sum
      if (e <= 2.5 * m && zeros > 0) e = m * math.log(m.toDouble / zeros)
      math.rint(e).toLong
    }

    override def serialize(buf: Array[Byte]): Array[Byte] = buf
    override def deserialize(storage: Array[Byte]): Array[Byte] = storage
    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(o: Int): GraftHLL =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): GraftHLL =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): GraftHLL =
      copy(child = c)
  }

  /** From-scratch Misra–Gries heavy-hitters sketch over a LongType column as
    * a TypedImperativeAggregate — the streaming-frequent-items counterpart of
    * [[GraftHLL]]. Buffer = at most k (item → lower-bound count) counters;
    * update decrements all counters when full (the classic k-counter MG);
    * merge sums same-key counters then re-shrinks by the (k+1)-th largest
    * value. Guarantees (asserted in HeavyHittersSpec, independent of merge
    * order): est ≤ true, true − est ≤ n/(k+1), and every item with true
    * frequency > n/(k+1) survives. Output: array<struct<item,est>> sorted by
    * (est desc, item asc) — deterministic for a fixed partitioning. At 100 TB
    * this replaces a full groupBy+sort with an O(k)-state partial aggregate
    * per partition — no shuffle of the raw keys at all. */
  case class MisraGries(child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[java.util.HashMap[Long, Long]]
      with UnaryLike[Expression] {

    override def createAggregationBuffer(): java.util.HashMap[Long, Long] =
      new java.util.HashMap[Long, Long]()

    override def update(buf: java.util.HashMap[Long, Long], input: InternalRow)
        : java.util.HashMap[Long, Long] = {
      val v = child.eval(input)
      if (v != null) {
        val item = v.asInstanceOf[Number].longValue()
        val cur = buf.get(item)
        if (cur != 0L || buf.containsKey(item)) buf.put(item, cur + 1L)
        else if (buf.size < k) buf.put(item, 1L)
        else {
          // decrement every counter; drop the ones that reach zero
          val it = buf.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
          }
        }
      }
      buf
    }

    override def merge(buf: java.util.HashMap[Long, Long],
        other: java.util.HashMap[Long, Long]): java.util.HashMap[Long, Long] = {
      other.forEach((item, c) => buf.merge(item, c, _ + _))
      if (buf.size > k) {
        // subtract the (k+1)-th largest count from everything, drop ≤ 0
        val counts = new Array[Long](buf.size)
        var i = 0
        val vit = buf.values().iterator()
        while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
        java.util.Arrays.sort(counts)
        val cut = counts(buf.size - k - 1) // (k+1)-th largest
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= cut) it.remove() else e.setValue(e.getValue - cut)
        }
      }
      buf
    }

    override def eval(buf: java.util.HashMap[Long, Long]): Any = {
      val entries = new Array[(Long, Long)](buf.size)
      var i = 0
      buf.forEach((item, c) => { entries(i) = (item, c); i += 1 })
      val sorted = entries.sortBy { case (item, c) => (-c, item) }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        sorted.map { case (item, c) => InternalRow(item, c) })
    }

    override def serialize(buf: java.util.HashMap[Long, Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
      bb.putInt(buf.size)
      buf.forEach((item, c) => { bb.putLong(item); bb.putLong(c) })
      bb.array()
    }
    override def deserialize(storage: Array[Byte]): java.util.HashMap[Long, Long] = {
      val bb = java.nio.ByteBuffer.wrap(storage)
      val n = bb.getInt
      val m = new java.util.HashMap[Long, Long](n * 2)
      var i = 0
      while (i < n) { m.put(bb.getLong, bb.getLong); i += 1 }
      m
    }

    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("item", LongType, nullable = false),
      StructField("est", LongType, nullable = false))), containsNull = false)
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(o: Int): MisraGries =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): MisraGries =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): MisraGries =
      copy(child = c)
  }

  /** From-scratch KLL-style quantile sketch over a DoubleType column — the
    * third mergeable sketch next to [[GraftHLL]] (cardinality) and
    * [[MisraGries]] (frequency). Multi-level compactors of capacity k:
    * a full level sorts and keeps alternating items (deterministic start
    * index by level parity — trades KLL's randomized compaction for
    * bit-reproducibility), promoting survivors with doubled weight.
    * State is O(k · log(n/k)) per group regardless of input size; merge
    * concatenates levels and re-compacts. Rank error ≤ ~2% at k=128 on the
    * tested distributions (QuantileSketchSpec). Exact — and oracle-equal to
    * percentile_disc — whenever n ≤ k: compaction fires only when a level
    * EXCEEDS k items (strict >), so the n == k boundary stays exact. */
  case class KllQuantile(child: Expression, percentile: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[scala.collection.mutable.ArrayBuffer[Double]]]
      with BinaryLike[Expression] {
    override def left: Expression = child
    override def right: Expression = percentile

    private lazy val p: Double = percentile.eval(null) match {
      case d: org.apache.spark.sql.types.Decimal => d.toDouble // SQL literal 0.5
      case n: java.lang.Number => n.doubleValue()
    }

    // buffer: levels(i) = values at weight 2^i, possibly unsorted
    type Buf = scala.collection.mutable.ArrayBuffer[scala.collection.mutable.ArrayBuffer[Double]]
    override def createAggregationBuffer(): Buf =
      scala.collection.mutable.ArrayBuffer(scala.collection.mutable.ArrayBuffer.empty[Double])

    private def compact(buf: Buf): Unit = {
      var lvl = 0
      while (lvl < buf.length) {
        if (buf(lvl).length > k) {
          val sorted = buf(lvl).sorted
          // pair up the even prefix (one survivor per pair at double weight,
          // odd or even position by level parity — deterministic); an
          // odd-length leftover stays at THIS level so total weight is
          // conserved exactly
          val even = sorted.length - (sorted.length % 2)
          val start = lvl % 2
          val kept = Array.tabulate(even / 2)(i => sorted(start + 2 * i))
          buf(lvl) = scala.collection.mutable.ArrayBuffer.empty[Double]
          if (sorted.length > even) buf(lvl) += sorted(even)
          if (lvl + 1 >= buf.length)
            buf += scala.collection.mutable.ArrayBuffer.empty[Double]
          buf(lvl + 1) ++= kept
        }
        lvl += 1
      }
    }

    override def update(buf: Buf, input: InternalRow): Buf = {
      val v = child.eval(input)
      if (v != null) {
        buf(0) += v.asInstanceOf[Number].doubleValue() // O(1) append
        if (buf(0).length > k) compact(buf)
      }
      buf
    }

    override def merge(buf: Buf, other: Buf): Buf = {
      var lvl = 0
      while (lvl < other.length) {
        if (lvl >= buf.length)
          buf += scala.collection.mutable.ArrayBuffer.empty[Double]
        buf(lvl) ++= other(lvl)
        lvl += 1
      }
      compact(buf)
      buf
    }

    override def eval(buf: Buf): Any = {
      // weighted rank query over all surviving (value, 2^level) pairs
      var total = 0L
      val items = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
      var lvl = 0
      while (lvl < buf.length) {
        val w = 1L << lvl
        buf(lvl).foreach { v => items += ((v, w)); total += w }
        lvl += 1
      }
      if (items.isEmpty) null
      else {
        val sorted = items.sortBy(_._1).toArray
        // first item whose cumulative weight fraction reaches p — the same
        // CDF rule (incl. its floating-point behavior) as percentile_disc,
        // so the n ≤ k exact case hash-matches the DuckDB oracle
        var acc = 0L; var i = 0
        while (i < sorted.length - 1 &&
            (acc + sorted(i)._2).toDouble / total < p) {
          acc += sorted(i)._2; i += 1
        }
        sorted(i)._1
      }
    }

    override def serialize(buf: Buf): Array[Byte] = {
      val n = buf.map(_.length).sum
      val bb = java.nio.ByteBuffer.allocate(4 + buf.length * 4 + n * 8)
      bb.putInt(buf.length)
      buf.foreach { lvl => bb.putInt(lvl.length); lvl.foreach(bb.putDouble) }
      bb.array()
    }
    override def deserialize(storage: Array[Byte]): Buf = {
      val bb = java.nio.ByteBuffer.wrap(storage)
      val nl = bb.getInt
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[scala.collection.mutable.ArrayBuffer[Double]]
      var i = 0
      while (i < nl) {
        buf += scala.collection.mutable.ArrayBuffer.fill(bb.getInt)(bb.getDouble)
        i += 1
      }
      buf
    }

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def withNewMutableAggBufferOffset(o: Int): KllQuantile =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KllQuantile =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): KllQuantile =
      copy(child = newLeft, percentile = newRight)
  }

  /** Bounded top-k-smallest selection as a TypedImperativeAggregate — the
    * fourth mergeable O(k)-state sketch next to [[GraftHLL]] / [[MisraGries]]
    * / [[KllQuantile]], built for ANN candidate ranking: keep the k smallest
    * (score, id) pairs under the total order (score asc, id asc). Buffer is
    * a size-k max-heap; update/merge evict the current worst, so partial
    * aggregation bounds BOTH state and shuffle at O(k) per group per map
    * task — the scale-safe replacement for `row_number() OVER (PARTITION BY
    * group ORDER BY score)` + `rank <= k`, whose window partition must hold
    * the group's ENTIRE input (the round-4 verdict's sim_pq_ann scale-killer).
    * Exact, and merge-order-independent: k-smallest under a strict total
    * order is a selection, not an estimate. Output: array<struct<score,id>>
    * sorted ascending. */
  case class TopKMin(score: Expression, id: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[java.util.PriorityQueue[(Double, Long)]]
      with BinaryLike[Expression] {
    override def left: Expression = score
    override def right: Expression = id

    // max-heap: the WORST surviving pair (largest score, then largest id)
    // sits at the head, ready for eviction
    private def cmp: java.util.Comparator[(Double, Long)] =
      (a: (Double, Long), b: (Double, Long)) => {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(b._2, a._2)
      }

    override def createAggregationBuffer(): java.util.PriorityQueue[(Double, Long)] =
      new java.util.PriorityQueue[(Double, Long)](k + 1, cmp)

    private def offer(buf: java.util.PriorityQueue[(Double, Long)],
        s: Double, i: Long): Unit =
      if (buf.size < k) buf.offer((s, i))
      else {
        val worst = buf.peek()
        if (s < worst._1 || (s == worst._1 && i < worst._2)) {
          buf.poll(); buf.offer((s, i))
        }
      }

    override def update(buf: java.util.PriorityQueue[(Double, Long)],
        input: InternalRow): java.util.PriorityQueue[(Double, Long)] = {
      val s = score.eval(input)
      val i = id.eval(input)
      if (s != null && i != null)
        offer(buf, s.asInstanceOf[Number].doubleValue(),
          i.asInstanceOf[Number].longValue())
      buf
    }

    override def merge(buf: java.util.PriorityQueue[(Double, Long)],
        other: java.util.PriorityQueue[(Double, Long)])
        : java.util.PriorityQueue[(Double, Long)] = {
      other.forEach(e => offer(buf, e._1, e._2))
      buf
    }

    override def eval(buf: java.util.PriorityQueue[(Double, Long)]): Any = {
      val arr = new Array[(Double, Long)](buf.size)
      var i = 0
      buf.forEach(e => { arr(i) = e; i += 1 })
      java.util.Arrays.sort(arr, cmp.reversed())
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        arr.map { case (s, id) => InternalRow(s, id) })
    }

    override def serialize(buf: java.util.PriorityQueue[(Double, Long)])
        : Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
      bb.putInt(buf.size)
      buf.forEach(e => { bb.putDouble(e._1); bb.putLong(e._2) })
      bb.array()
    }
    override def deserialize(storage: Array[Byte])
        : java.util.PriorityQueue[(Double, Long)] = {
      val bb = java.nio.ByteBuffer.wrap(storage)
      val n = bb.getInt
      val buf = createAggregationBuffer()
      var i = 0
      while (i < n) { buf.offer((bb.getDouble, bb.getLong)); i += 1 }
      buf
    }

    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(o: Int): TopKMin =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): TopKMin =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): TopKMin =
      copy(score = newLeft, id = newRight)
  }

  /** Table-generating bigram emitter — the custom Generator path of §2.11
    * (posexplode covers the built-in path). Emits (pos, ngram) per row.
    * Participates in whole-stage codegen: `Generator.supportCodegen` is true
    * (no CodegenFallback) and `doGenCode` yields an `IterableOnce[InternalRow]`
    * value, which GenerateExec's codeGenIterableOnce consumes with a plain
    * `.iterator()` loop — no interpreted-projection fallback in hot paths. */
  case class Bigrams(child: Expression)
      extends UnaryExpression with Generator {
    override def elementSchema: StructType = StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("ngram", StringType, nullable = false)))
    override def eval(input: InternalRow): IterableOnce[InternalRow] =
      CatalystExt.bigramRows(child.eval(input).asInstanceOf[ArrayData])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
      val childGen = child.genCode(ctx)
      val value = org.apache.spark.sql.catalyst.expressions.codegen.JavaCode
        .variable(ctx.freshName("bigrams"), ObjectType(classOf[AnyRef]))
      val resultCode =
        code"""
           |${childGen.code}
           |scala.collection.IterableOnce<InternalRow> $value =
           |  graft.ext.CatalystExt.bigramRows(
           |    ${childGen.isNull} ? null : ${childGen.value});
         """.stripMargin
      ev.copy(code = resultCode, isNull = FalseLiteral, value = value)
    }
    override protected def withNewChildInternal(c: Expression): Bigrams =
      copy(child = c)
  }

  /** Shared eval/codegen kernel for [[Bigrams]] — called from generated Java
    * via the object's static forwarder. */
  def bigramRows(arr: ArrayData): IterableOnce[InternalRow] = {
    if (arr == null || arr.numElements() < 2) Nil
    else {
      val n = arr.numElements() - 1
      new Iterator[InternalRow] {
        private var i = 0
        override def hasNext: Boolean = i < n
        override def next(): InternalRow = {
          val a = arr.getUTF8String(i)
          val b = arr.getUTF8String(i + 1)
          val r = InternalRow(i, UTF8String.fromString(a.toString + " " + b.toString))
          i += 1
          r
        }
      }
    }
  }

  /** EXACT distinct count over a bounded non-negative integral domain as a
    * fixed bitset aggregate — the exact counterpart of [[GraftHLL]] for id
    * spaces with a known bound (user/doc/item ids): O(bound/8) bytes of
    * state per group, bitwise-OR merge (commutative, associative,
    * idempotent — mergeable across partitions AND re-aggregation levels),
    * popcount eval. At 100 TB this is the segment-intersection/count
    * primitive (per-day active-user bitmaps OR-ed into monthly actives)
    * where a sketch would surrender exactness for no state saving. Values
    * outside [0, bound) fail fast — a silent drop would return a wrong
    * count while looking healthy. */
  case class GraftBitmap(child: Expression, bound: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {
    require(bound > 0 && bound <= (1 << 27), "bound must be in (0, 2^27]")

    override def createAggregationBuffer(): Array[Byte] =
      new Array[Byte]((bound + 7) >> 3)

    override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
      val v = child.eval(input)
      if (v != null) {
        val x = v.asInstanceOf[Number].longValue()
        if (x < 0 || x >= bound) throw new IllegalArgumentException(
          s"graft_bitmap_distinct: value $x outside [0, $bound)")
        buf((x >>> 3).toInt) = (buf((x >>> 3).toInt) | (1 << (x & 7)).toByte).toByte
      }
      buf
    }

    override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < buf.length) { buf(i) = (buf(i) | other(i)).toByte; i += 1 }
      buf
    }

    override def eval(buf: Array[Byte]): Any = {
      var n = 0L; var i = 0
      while (i < buf.length) {
        n += java.lang.Integer.bitCount(buf(i) & 0xFF); i += 1
      }
      n
    }

    override def serialize(buf: Array[Byte]): Array[Byte] = buf
    override def deserialize(storage: Array[Byte]): Array[Byte] = storage
    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(o: Int): GraftBitmap =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): GraftBitmap =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): GraftBitmap =
      copy(child = c)
  }

  /** Count-Min sketch (Cormode & Muthukrishnan 2005) over a non-negative
    * LongType key column, as a TypedImperativeAggregate — the
    * point-frequency member of the sketch family next to GraftHLL
    * (distinct), MisraGries (heavy hitters) and KllQuantile (quantiles).
    * d = 4 hash rows × w = 64 counters: O(d·w) state per partition
    * regardless of key cardinality, merge = elementwise add (counters are
    * linear), estimate(k) = min_i counter[i][h_i(k)] — never an
    * UNDERcount, overcount bounded by colliding mass.
    *
    * The row hashes are PORTABLE affine maps h_i(k) = ((A_i·k' + B_i) mod
    * (2^31−1)) mod 64 with k' = k mod (2^31−1) — deliberately NOT
    * xxhash64, so a SQL engine can replay the entire counter table
    * exactly (the tbucket/hbucket precedent): `agg_cms_freq` is a FULL
    * DuckDB-oracle row, unlike the HLL whose estimate only an audit can
    * gate. A_i < 2^31 and k' < 2^31 keep every product below 2^62 — no
    * BIGINT overflow on either engine.
    *
    * eval returns the flattened 4×64 counter table (row-major), so
    * lookups compose in plain column algebra (element_at) and the sketch
    * itself can be persisted/merged as data. */
  case class CountMin(child: Expression,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {
    override def createAggregationBuffer(): Array[Long] =
      new Array[Long](CmsD * CmsW)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val k = v.asInstanceOf[Number].longValue()
        if (k < 0) throw new IllegalArgumentException(
          s"graft_cms: key $k must be non-negative")
        val k1 = k % CmsP
        var i = 0
        while (i < CmsD) {
          buf(i * CmsW + (((CmsA(i) * k1 + CmsB(i)) % CmsP) % CmsW).toInt) += 1L
          i += 1
        }
      }
      buf
    }

    override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
      var i = 0
      while (i < buf.length) { buf(i) += other(i); i += 1 }
      buf
    }

    override def eval(buf: Array[Long]): Any =
      new org.apache.spark.sql.catalyst.util.GenericArrayData(buf)

    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
      buf.foreach(bb.putLong)
      bb.array()
    }
    override def deserialize(storage: Array[Byte]): Array[Long] = {
      val bb = java.nio.ByteBuffer.wrap(storage)
      Array.fill(storage.length / 8)(bb.getLong)
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(o: Int): CountMin =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): CountMin =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): CountMin =
      copy(child = c)
  }

  /** Bounded distinct-min-k set aggregate (r17, VERDICT r16 item 3): the
    * k smallest DISTINCT long values of the group, ascending — exactly
    * `slice(sort_array(collect_set(x)), 1, k)`, but with the bound applied
    * in EVERY partial buffer: a TreeSet capped at k entries (add; evict
    * largest when over), so per-cell aggregation state is O(k) = 8·k bytes
    * REGARDLESS of the cell's distinct cardinality. The collect_set form
    * this replaces in the cooc builder buffered the hottest cell's entire
    * distinct-user set in one task (80 MB at 10⁷ users — the one
    * documented r16 bound); min-k is mergeable (union-then-evict), so
    * map-side partials stay capped too. Deterministic: min-k of a set is
    * order-insensitive, which PartitionInvarianceSpec relies on. */
  case class MinKSet(child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
      with UnaryLike[Expression] {
    require(k > 0, s"graft_min_k_set: k must be positive, got $k")

    override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
      new java.util.TreeSet[java.lang.Long]()

    private def offer(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
      if (buf.size < k) { buf.add(v); () }
      else if (v < buf.last()) {
        if (buf.add(v)) { buf.pollLast(); () }
      }
    }

    override def update(buf: java.util.TreeSet[java.lang.Long],
        input: InternalRow): java.util.TreeSet[java.lang.Long] = {
      val v = child.eval(input)
      if (v != null) offer(buf, v.asInstanceOf[Number].longValue())
      buf
    }

    override def merge(buf: java.util.TreeSet[java.lang.Long],
        other: java.util.TreeSet[java.lang.Long])
        : java.util.TreeSet[java.lang.Long] = {
      other.forEach(v => offer(buf, v.longValue()))
      buf
    }

    override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
      val arr = new Array[Any](buf.size)
      var i = 0
      buf.forEach(v => { arr(i) = v.longValue(); i += 1 }) // ascending
      new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
    }

    override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
      bb.putInt(buf.size)
      buf.forEach(v => { bb.putLong(v.longValue()); () })
      bb.array()
    }
    override def deserialize(storage: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
      val bb = java.nio.ByteBuffer.wrap(storage)
      val n = bb.getInt
      val buf = createAggregationBuffer()
      var i = 0
      while (i < n) { buf.add(bb.getLong); i += 1 }
      buf
    }

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(o: Int): MinKSet =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): MinKSet =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): MinKSet =
      copy(child = c)
  }

  /** Scalar field extraction from protobuf WIRE-FORMAT bytes — the r16
    * decode-breadth stretch (VERDICT item 6) done without a protobuf jar
    * (none ships un-shaded in the image): the wire format is a public,
    * 4-rule encoding (LEB128 varints, tag = field<<3 | wiretype, fixed64,
    * length-delimited), so a scalar-field getter is ~40 lines of scanning.
    * Implements proto3 semantics the landing-zone reader depends on:
    * UNKNOWN FIELDS ARE SKIPPED by wiretype (forward compatibility — a
    * producer adding fields must not break old readers), LAST occurrence
    * of a repeated scalar wins, absent field → NULL, malformed buffer →
    * NULL (never a task failure). Codegen calls the same static scan
    * helpers [[protoGetLong]]/[[protoGetDouble]]/[[protoGetString]] the
    * interpreter uses — no CodegenFallback, stays inside whole-stage
    * codegen like [[CosineSimilarity]]. */
  case class ProtoGet(child: Expression, field: Int, dt: DataType)
      extends UnaryExpression {
    override def dataType: DataType = dt
    override def nullable: Boolean = true
    override def nullSafeEval(b: Any): Any = {
      val a = b.asInstanceOf[Array[Byte]]
      dt match {
        case LongType => CatalystExt.protoGetLong(a, field)
        case DoubleType => CatalystExt.protoGetDouble(a, field)
        case StringType => CatalystExt.protoGetString(a, field)
        case other => throw new IllegalArgumentException(
          s"graft_proto_*: unsupported type $other")
      }
    }
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, b => {
        val tmp = ctx.freshName("pv")
        val (helper, jt, unbox) = dt match {
          case LongType => ("protoGetLong", "java.lang.Long", ".longValue()")
          case DoubleType => ("protoGetDouble", "java.lang.Double", ".doubleValue()")
          case StringType =>
            ("protoGetString", "org.apache.spark.unsafe.types.UTF8String", "")
        }
        s"""
           |$jt $tmp = graft.ext.CatalystExt.$helper($b, $field);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $tmp$unbox; }
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): ProtoGet =
      copy(child = c)
  }

  /** Repeated int64 extraction from protobuf wire bytes (packed wiretype-2
    * runs + unpacked wiretype-0 occurrences, concatenated in wire order) —
    * same codegen discipline as [[ProtoGet]]: `doGenCode` calls the one
    * static kernel eval uses, no CodegenFallback, so the extraction stays
    * inside the whole-stage-codegen scan loop (pinned by NewOpsSpec under
    * CODEGEN_ONLY with fallback disabled). */
  case class ProtoGetRepeated(child: Expression, field: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def nullSafeEval(b: Any): Any =
      CatalystExt.protoGetLongs(b.asInstanceOf[Array[Byte]], field)
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, b => {
        val tmp = ctx.freshName("pr")
        s"""
           |org.apache.spark.sql.catalyst.util.ArrayData $tmp =
           |  graft.ext.CatalystExt.protoGetLongs($b, $field);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $tmp; }
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): ProtoGetRepeated =
      copy(child = c)
  }

  /** One level of nested-message access (`outer.inner`): the embedded
    * message is the LAST wiretype-2 occurrence of `outer`; its payload is
    * rescanned with the scalar kernels. Same eval/codegen sharing as
    * [[ProtoGet]]. */
  case class ProtoGetNested(child: Expression, outer: Int, inner: Int,
      dt: DataType) extends UnaryExpression {
    override def dataType: DataType = dt
    override def nullable: Boolean = true
    override def nullSafeEval(b: Any): Any = {
      val a = b.asInstanceOf[Array[Byte]]
      dt match {
        case LongType => CatalystExt.protoGetNestedLong(a, outer, inner)
        case DoubleType => CatalystExt.protoGetNestedDouble(a, outer, inner)
        case StringType => CatalystExt.protoGetNestedString(a, outer, inner)
        case other => throw new IllegalArgumentException(
          s"graft_proto_nested_*: unsupported type $other")
      }
    }
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, b => {
        val tmp = ctx.freshName("pn")
        val (helper, jt, unbox) = dt match {
          case LongType => ("protoGetNestedLong", "java.lang.Long", ".longValue()")
          case DoubleType => ("protoGetNestedDouble", "java.lang.Double", ".doubleValue()")
          case StringType =>
            ("protoGetNestedString", "org.apache.spark.unsafe.types.UTF8String", "")
        }
        s"""
           |$jt $tmp = graft.ext.CatalystExt.$helper($b, $outer, $inner);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $tmp$unbox; }
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): ProtoGetNested =
      copy(child = c)
  }

  // --- proto wire-format scan kernels (shared by eval and generated code) ---
  /** Byte length of the varint at pos, or -1 if truncated/overlong. */
  private def vlen(a: Array[Byte], pos: Int): Int = {
    var i = pos
    while (i < a.length && i - pos < 10) {
      if ((a(i) & 0x80) == 0) return i - pos + 1
      i += 1
    }
    -1
  }
  private def vval(a: Array[Byte], pos: Int, len: Int): Long = {
    var v = 0L; var i = 0
    while (i < len) { v |= (a(pos + i) & 0x7FL) << (7 * i); i += 1 }
    v
  }

  /** Scan for `field`: apply `hit(pos, payloadLen, wiretype)` on each match
    * (LAST wins — proto3 scalar semantics); returns false on malformed. */
  private def protoScan(a: Array[Byte], field: Int)(
      hit: (Int, Int, Int) => Unit): Boolean = {
    var pos = 0
    while (pos < a.length) {
      val tl = vlen(a, pos); if (tl < 0) return false
      val tag = vval(a, pos, tl); pos += tl
      val f = (tag >>> 3).toInt; val wt = (tag & 7).toInt
      val bodyLen = wt match {
        case 0 => val l = vlen(a, pos); if (l < 0) return false; l
        case 1 => 8
        case 2 =>
          val l = vlen(a, pos); if (l < 0) return false
          val n = vval(a, pos, l)
          if (n < 0 || pos + l + n > a.length) return false
          l + n.toInt
        case 5 => 4
        case _ => return false // group wiretypes 3/4: unsupported
      }
      if (pos + bodyLen > a.length) return false
      if (f == field) hit(pos, bodyLen, wt)
      pos += bodyLen
    }
    true
  }

  /** int64 field (wiretype 0) — boxed so NULL means absent/malformed. */
  def protoGetLong(a: Array[Byte], field: Int): java.lang.Long = {
    var out: java.lang.Long = null
    val ok = protoScan(a, field) { (pos, len, wt) =>
      if (wt == 0) out = java.lang.Long.valueOf(vval(a, pos, len))
    }
    if (ok) out else null
  }

  /** double field (wiretype 1, little-endian fixed64). */
  def protoGetDouble(a: Array[Byte], field: Int): java.lang.Double = {
    var out: java.lang.Double = null
    val ok = protoScan(a, field) { (pos, _, wt) =>
      if (wt == 1) {
        var bits = 0L; var i = 0
        while (i < 8) { bits |= (a(pos + i) & 0xFFL) << (8 * i); i += 1 }
        out = java.lang.Double.valueOf(java.lang.Double.longBitsToDouble(bits))
      }
    }
    if (ok) out else null
  }

  /** string field (wiretype 2, UTF-8 payload after the length varint). */
  def protoGetString(a: Array[Byte], field: Int): UTF8String = {
    var out: UTF8String = null
    val ok = protoScan(a, field) { (pos, len, wt) =>
      if (wt == 2) {
        val ll = vlen(a, pos)
        out = UTF8String.fromBytes(a, pos + ll, len - ll)
      }
    }
    if (ok) out else null
  }

  /** REPEATED int64 field → array<long> (r17 decode breadth, VERDICT r16
    * item 4): concatenates every occurrence of `field` in WIRE ORDER —
    * wiretype-0 occurrences contribute one varint each (proto2-style
    * unpacked), wiretype-2 occurrences are proto3 PACKED chunks whose
    * payload is a run of back-to-back varints (a single repeated field may
    * legally mix both across producers — the spec requires readers accept
    * either encoding). Absent field → EMPTY array (proto3: an absent
    * repeated field is the empty list, unlike absent scalars → NULL);
    * malformed buffer or truncated packed run → NULL. */
  def protoGetLongs(a: Array[Byte], field: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Any](4)
    var packedOk = true
    val ok = protoScan(a, field) { (pos, len, wt) =>
      if (wt == 0) out += vval(a, pos, len)
      else if (wt == 2) {
        val ll = vlen(a, pos)
        var p = pos + ll
        val end = pos + len
        while (packedOk && p < end) {
          val l = vlen(a, p)
          if (l < 0 || p + l > end) packedOk = false
          else { out += vval(a, p, l); p += l }
        }
      }
    }
    if (ok && packedOk)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
    else null
  }

  /** Payload byte range of the LAST wiretype-2 occurrence of `field`
    * (length-header stripped), or null. The shared nested-message hop:
    * an embedded message is just a length-delimited field whose payload is
    * itself wire format, so one level of path access = slice + rescan.
    * LAST occurrence wins (documented simplification: full proto3 merges
    * repeated singular-message occurrences field-wise; landing-zone logs
    * write each message once, and the fixture pins the last-wins rule). */
  def protoGetMessage(a: Array[Byte], field: Int): Array[Byte] = {
    var from = -1; var until = -1
    val ok = protoScan(a, field) { (pos, len, wt) =>
      if (wt == 2) {
        val ll = vlen(a, pos)
        from = pos + ll; until = pos + len
      }
    }
    if (!ok || from < 0) null
    else java.util.Arrays.copyOfRange(a, from, until)
  }

  /** Nested int64: field path `outer.inner`, one level deep. */
  def protoGetNestedLong(a: Array[Byte], outer: Int, inner: Int): java.lang.Long = {
    val m = protoGetMessage(a, outer)
    if (m == null) null else protoGetLong(m, inner)
  }

  /** Nested double: field path `outer.inner`, one level deep. */
  def protoGetNestedDouble(a: Array[Byte], outer: Int, inner: Int): java.lang.Double = {
    val m = protoGetMessage(a, outer)
    if (m == null) null else protoGetDouble(m, inner)
  }

  /** Nested string: field path `outer.inner`, one level deep. */
  def protoGetNestedString(a: Array[Byte], outer: Int, inner: Int): UTF8String = {
    val m = protoGetMessage(a, outer)
    if (m == null) null else protoGetString(m, inner)
  }

  /** Wire-format ENCODER for the fn_protobuf_decode fixture: field 7
    * (unknown varint) first and field 8 (unknown length-delimited) last so
    * the decoder's skip paths are exercised on every row, field 1 written
    * TWICE so last-wins is exercised, field 2 = UTF-8 string, field 3 =
    * little-endian fixed64 double. Staging-side only (a Scala UDF builds
    * the column); the DECODE is the native codegen'd path under test. */
  def protoEncodeEvent(id: Long, et: String, v: Double): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(48)
    def wv(x0: Long): Unit = {
      var x = x0
      while ((x & ~0x7FL) != 0) { bos.write(((x & 0x7F) | 0x80).toInt); x >>>= 7 }
      bos.write((x & 0x7F).toInt)
    }
    bos.write(0x38); wv(id % 5)       // unknown field 7, varint — must skip
    bos.write(0x08); wv(id % 3)       // field 1, first occurrence (loses)
    bos.write(0x08); wv(id)           // field 1, last occurrence (wins)
    val b = et.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    bos.write(0x12); wv(b.length); bos.write(b, 0, b.length) // field 2 string
    bos.write(0x19)                   // field 3 fixed64 double
    val bits = java.lang.Double.doubleToLongBits(v)
    var i = 0
    while (i < 8) { bos.write(((bits >>> (8 * i)) & 0xFF).toInt); i += 1 }
    val x = "skip-me".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    bos.write(0x42); wv(x.length); bos.write(x, 0, x.length) // unknown field 8
    bos.toByteArray
  }

  /** Extended wire-format encoder for the r17 breadth fixtures
    * (`fn_protobuf_repeated` / `fn_protobuf_nested`). Beyond the scalar
    * fixture's obstacles, every row carries:
    *  - field 4 REPEATED int64, deliberately MIXED encodings in one
    *    buffer: two unpacked wiretype-0 occurrences (`id%100`,
    *    `(id*3)%1000`) followed by one PACKED wiretype-2 chunk
    *    (`[id%7, id%11, id%13]`) — the reader must concatenate all five
    *    in wire order (the proto3 spec requires accepting both forms);
    *  - field 5 nested message written TWICE (decoy first — last wins),
    *    the real one carrying its own unknown-field obstacle (field 6
    *    varint) plus inner field 1 varint `id*7+3`, inner field 1 decoy
    *    BEFORE it (in-message last-wins), inner field 2 string `et+"~n"`,
    *    inner field 3 fixed64 double `v/2` (exact halving — exponent
    *    decrement, bit-replayable in the oracle).
    * All values recompute from the base event columns in DuckDB SQL, so
    * encode→decode is value-faithful end-to-end. */
  def protoEncodeEventEx(id: Long, et: String, v: Double): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(96)
    def wv(x0: Long): Unit = {
      var x = x0
      while ((x & ~0x7FL) != 0) { bos.write(((x & 0x7F) | 0x80).toInt); x >>>= 7 }
      bos.write((x & 0x7F).toInt)
    }
    def wd(d: Double): Unit = {
      val bits = java.lang.Double.doubleToLongBits(d)
      var i = 0
      while (i < 8) { bos.write(((bits >>> (8 * i)) & 0xFF).toInt); i += 1 }
    }
    def vlenOf(x0: Long): Int = {
      var x = x0; var n = 1
      while ((x & ~0x7FL) != 0) { n += 1; x >>>= 7 }
      n
    }
    bos.write(0x38); wv(id % 5)          // unknown field 7, varint — skip
    bos.write(0x08); wv(id)              // field 1 scalar (independence probe)
    // ---- field 4 repeated: unpacked, unpacked, packed ----
    bos.write(0x20); wv(id % 100)        // 4, wiretype 0
    bos.write(0x20); wv((id * 3) % 1000) // 4, wiretype 0
    val packed = Seq(id % 7, id % 11, id % 13)
    bos.write(0x22); wv(packed.map(vlenOf(_).toLong).sum) // 4, wiretype 2
    packed.foreach(wv)
    // ---- field 5 nested message, decoy occurrence first (last wins) ----
    def nested(decoy: Boolean): Unit = {
      val inner = new java.io.ByteArrayOutputStream(48)
      val save = bos
      // reuse wv/wd against a swapped sink via a tiny shim
      def wvTo(sink: java.io.ByteArrayOutputStream, x0: Long): Unit = {
        var x = x0
        while ((x & ~0x7FL) != 0) { sink.write(((x & 0x7F) | 0x80).toInt); x >>>= 7 }
        sink.write((x & 0x7F).toInt)
      }
      inner.write(0x30); wvTo(inner, id % 9)  // unknown field 6 — skip
      inner.write(0x08); wvTo(inner, 999L)    // inner field 1 decoy (loses)
      inner.write(0x08); wvTo(inner, if (decoy) 111L else id * 7 + 3)
      val s = (if (decoy) "decoy" else et + "~n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      inner.write(0x12); wvTo(inner, s.length); inner.write(s, 0, s.length)
      inner.write(0x19)                        // inner field 3 fixed64
      val bits = java.lang.Double.doubleToLongBits(if (decoy) 0.0 else v / 2)
      var i = 0
      while (i < 8) { inner.write(((bits >>> (8 * i)) & 0xFF).toInt); i += 1 }
      val body = inner.toByteArray
      save.write(0x2A); wv(body.length); save.write(body, 0, body.length)
    }
    nested(decoy = true)
    nested(decoy = false)
    val x = "skip-me".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    bos.write(0x42); wv(x.length); bos.write(x, 0, x.length) // unknown field 8
    bos.toByteArray
  }

  /** CMS geometry + hash constants — read by the aggregate, the column-
    * algebra lookup in ops/Extensions, and mirrored literally in the
    * DuckDB oracle. P = 2^31−1 (Mersenne prime); A_i, B_i fixed primes
    * (A_i ≢ 0 mod P). */
  val CmsD = 4
  val CmsW = 64
  val CmsP = 2147483647L
  val CmsA: Array[Long] = Array(1103515245L, 1299709L, 15485863L, 32452843L)
  val CmsB: Array[Long] = Array(12345L, 7919L, 104729L, 1299721L)

  /** Register every extension into the session (idempotent). */
  def register(s: SparkSession): Unit = {
    val reg = s.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_cosine",
      exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_hll",
      exprs => GraftHLL(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_heavy_hitters",
      exprs => MisraGries(exprs(0),
        exprs(1).eval(null).asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("graft_kll_quantile",
      exprs => KllQuantile(exprs(0), exprs(1),
        exprs(2).eval(null).asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("graft_bigrams",
      exprs => Bigrams(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_topk_min",
      exprs => TopKMin(exprs(0), exprs(1),
        exprs(2).eval(null).asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("graft_bitmap_distinct",
      exprs => GraftBitmap(exprs(0),
        exprs(1).eval(null).asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("graft_cms",
      exprs => CountMin(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_min_k_set",
      exprs => MinKSet(exprs(0),
        exprs(1).eval(null).asInstanceOf[Number].intValue()), "scala_udf")
    def fieldNo(e: Expression): Int =
      e.eval(null).asInstanceOf[Number].intValue()
    reg.createOrReplaceTempFunction("graft_proto_long",
      exprs => ProtoGet(exprs(0), fieldNo(exprs(1)), LongType), "scala_udf")
    reg.createOrReplaceTempFunction("graft_proto_double",
      exprs => ProtoGet(exprs(0), fieldNo(exprs(1)), DoubleType), "scala_udf")
    reg.createOrReplaceTempFunction("graft_proto_string",
      exprs => ProtoGet(exprs(0), fieldNo(exprs(1)), StringType), "scala_udf")
    reg.createOrReplaceTempFunction("graft_proto_longs",
      exprs => ProtoGetRepeated(exprs(0), fieldNo(exprs(1))), "scala_udf")
    reg.createOrReplaceTempFunction("graft_proto_nested_long",
      exprs => ProtoGetNested(exprs(0), fieldNo(exprs(1)), fieldNo(exprs(2)),
        LongType), "scala_udf")
    reg.createOrReplaceTempFunction("graft_proto_nested_double",
      exprs => ProtoGetNested(exprs(0), fieldNo(exprs(1)), fieldNo(exprs(2)),
        DoubleType), "scala_udf")
    reg.createOrReplaceTempFunction("graft_proto_nested_string",
      exprs => ProtoGetNested(exprs(0), fieldNo(exprs(1)), fieldNo(exprs(2)),
        StringType), "scala_udf")
  }
}
