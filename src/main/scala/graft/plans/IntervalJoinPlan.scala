package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.unsafe.types.UTF8String

/** The second whole-operator Catalyst path (after [[AsOfJoin]]): a
  * native keyed INTERVAL join — for each left row carrying an
  * interval (lo, hi], every right row of the same key whose ts falls
  * inside it. q24's shape, and the join every sessionized/temporal
  * workload hits: "events within 1h after each signup".
  *
  * Why Spark's own planning is the wrong shape at scale: with the
  * equi-key present Spark plans a sort-merge join whose range
  * predicates are POST-JOIN filters — inside one hot key the matcher
  * buffers every right row of the key and tests all O(n_k * m_k)
  * pairs; without an equi-key it degenerates to
  * BroadcastNestedLoopJoin past broadcast capacity. This operator
  * exploits what the predicate structure guarantees: with the left
  * sorted by (key, lo) and the right by (key, ts), each left row's
  * matches are one CONTIGUOUS ts-run, found by a sliding buffer —
  * O(n + m + output) per key, memory bounded by the occupancy of the
  * widest single interval (a degenerate unbounded interval degrades
  * to exactly SMJ's per-key buffering, never worse).
  *
  * Distribution/ordering are declared as requirements, so Catalyst's
  * standard Exchange/Sort machinery (and AQE, and exchange elision on
  * pre-partitioned/bucketed input) applies — the P1 contract.
  *
  * Semantics (q24-default bounds): emit (left ++ right) for each pair
  * with left.key == right.key and right.ts in (lo, hi] — strict lower
  * and inclusive upper by default, both flags independently
  * configurable. `leftOuter` keeps matchless left rows null-padded.
  * Null left keys/bounds match nothing; null right keys/ts are
  * skipped. An empty interval (lo > hi) matches nothing.
  */
final case class IntervalJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    lo: Attribute,
    hi: Attribute,
    rightTs: Attribute,
    leftOuter: Boolean,
    lowerInclusive: Boolean,
    upperInclusive: Boolean
) extends LogicalPlan with BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ (if (leftOuter) right.output.map(_.withNullability(true))
                    else right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[IntervalJoin]] to [[IntervalJoinExec]]. Registered
  * per-session by Ops.intervalJoinNative (idempotent) or globally via
  * GraftExtensions.
  */
object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoin(l, r, lk, rk, lo, hi, rts, outer, linc, uinc) =>
      IntervalJoinExec(planLater(l), planLater(r), lk, rk, lo, hi, rts,
        outer, linc, uinc) :: Nil
    case _ => Nil
  }
}

/** Sort-merge interval join with a sliding right-row buffer.
  *
  * Per partition (children hash-distributed on key, left sorted by
  * (key, lo), right by (key, ts)):
  *  - EVICT buffer head rows failing the lower bound against the
  *    current left's lo — left lo is nondecreasing within a key, so
  *    an evicted right can never match a later left;
  *  - PULL rights of the key while their ts passes the current upper
  *    bound (rights already failing the lower bound are dropped on
  *    pull — later lefts have lo at least as large);
  *  - EMIT the buffer prefix whose ts passes the upper bound — the
  *    buffer is ts-sorted, so the scan stops at the first miss, and
  *    leftover rows (pulled for an earlier, WIDER interval — hi is
  *    not monotonic when widths vary) stay for later lefts.
  * Buffered rows are copies (child iterators reuse their buffers);
  * output rows reuse one projection buffer (standard non-buffering
  * iterator contract).
  */
final case class IntervalJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    lo: Attribute,
    hi: Attribute,
    rightTs: Attribute,
    leftOuter: Boolean,
    lowerInclusive: Boolean,
    upperInclusive: Boolean
) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (leftOuter) right.output.map(_.withNullability(true))
                    else right.output)
  override def outputPartitioning: Partitioning = left.outputPartitioning
  // emitted rows are grouped per left row in left order, so left's
  // ordering survives on the left columns
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(lo, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending))
  )

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)

  /** Long-backed reader for an ordered column — same loud-rejection
    * contract as AsOfJoinExec.tsGetter: only single-integral-word
    * internal forms are legal, anything else raises rather than being
    * silently mis-read.
    */
  private def tsGetter(dt: org.apache.spark.sql.types.DataType, idx: Int): InternalRow => Long =
    dt match {
      case org.apache.spark.sql.types.TimestampType |
          org.apache.spark.sql.types.TimestampNTZType |
          org.apache.spark.sql.types.LongType => r => r.getLong(idx)
      case org.apache.spark.sql.types.DateType |
          org.apache.spark.sql.types.IntegerType => r => r.getInt(idx).toLong
      case other => throw new IllegalArgumentException(
        s"interval-join ordering column must be timestamp/date/integral, got $other")
    }

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val loIdx = left.output.indexWhere(_.exprId == lo.exprId)
    val hiIdx = left.output.indexWhere(_.exprId == hi.exprId)
    val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTsIdx = right.output.indexWhere(_.exprId == rightTs.exprId)
    require(lKeyIdx >= 0 && loIdx >= 0 && hiIdx >= 0 && rKeyIdx >= 0 && rTsIdx >= 0,
      "interval-join columns must resolve against their own side")
    // cross-side/cross-column agreement at one place: all three
    // ordered columns compare against each other, so all three must
    // share one type; keys must match across sides (the AsOfJoin
    // lesson: per-side checks alone let micros-vs-days slip through)
    require(lo.dataType == hi.dataType && lo.dataType == rightTs.dataType,
      s"interval-join ordered columns must share ONE type, got lo: ${lo.dataType}, " +
        s"hi: ${hi.dataType}, right ts: ${rightTs.dataType}")
    require(leftKey.dataType == rightKey.dataType,
      s"interval-join key columns must have the SAME type on both sides, " +
        s"got ${leftKey.dataType} vs ${rightKey.dataType}")
    val keyType = leftKey.dataType
    require(!keyType.isInstanceOf[org.apache.spark.sql.types.StructType] &&
      !keyType.isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
      !keyType.isInstanceOf[org.apache.spark.sql.types.MapType],
      s"interval-join key must be an atomic type, got $keyType")
    val loGet = tsGetter(lo.dataType, loIdx)
    val hiGet = tsGetter(hi.dataType, hiIdx)
    val rTsGet = tsGetter(rightTs.dataType, rTsIdx)
    val outTypes = output.map(_.dataType).toArray
    val rightWidth = right.output.size
    val outer = leftOuter
    val lInc = lowerInclusive
    val uInc = upperInclusive

    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      new Iterator[InternalRow] {
        // same hot-loop comparator specialization as AsOfJoinExec
        private val keyCmp: (Any, Any) => Int = keyType match {
          case org.apache.spark.sql.types.LongType => (a, b) =>
            java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
          case org.apache.spark.sql.types.IntegerType => (a, b) =>
            java.lang.Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
          case st: org.apache.spark.sql.types.StringType
              if st == org.apache.spark.sql.types.StringType => (a, b) =>
            a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
          case other =>
            val ord = TypeUtils.getInterpretedOrdering(other)
            (a, b) => ord.compare(a, b)
        }
        private def passLower(ts: Long, loV: Long): Boolean =
          if (lInc) ts >= loV else ts > loV
        private def passUpper(ts: Long, hiV: Long): Boolean =
          if (uInc) ts <= hiV else ts < hiV

        private def stable(v: Any): Any = v match {
          case s: UTF8String => s.clone()
          case o => o
        }

        private val joined = new JoinedRow
        private val proj = UnsafeProjection.create(outTypes)
        private val nullRight = new GenericInternalRow(rightWidth)

        // right head, pre-extracted
        private var rKey: Any = null
        private var rTs: Long = 0L
        private var rRow: InternalRow = null
        private var rValid = false
        private def advanceRight(): Unit = {
          rValid = false
          while (!rValid && ri.hasNext) {
            val r = ri.next()
            if (!r.isNullAt(rKeyIdx) && !r.isNullAt(rTsIdx)) {
              rKey = stable(r.get(rKeyIdx, keyType))
              rTs = rTsGet(r)
              rRow = r
              rValid = true
            }
          }
        }
        advanceRight()

        // Sliding buffer of copied right rows for the key in progress,
        // ts-sorted (appended in right-iterator order). A primitive
        // ring buffer, not an ArrayDeque pair: ts values stay unboxed
        // and eviction/append are two index bumps — this structure is
        // touched once per right row and once per (left, match) pair,
        // i.e. it IS the hot path.
        private var bufTs = new Array[Long](64)
        private var bufRows = new Array[InternalRow](64)
        private var bufStart = 0 // physical index of the logical head
        private var bufLen = 0
        private def bufTsAt(i: Int): Long = bufTs((bufStart + i) & (bufTs.length - 1))
        private def bufRowAt(i: Int): InternalRow = bufRows((bufStart + i) & (bufRows.length - 1))
        private def bufAdd(ts: Long, row: InternalRow): Unit = {
          if (bufLen == bufTs.length) { // grow: unwrap into a doubled array
            val n = bufTs.length
            val ts2 = new Array[Long](n * 2)
            val rows2 = new Array[InternalRow](n * 2)
            var i = 0
            while (i < n) { ts2(i) = bufTsAt(i); rows2(i) = bufRowAt(i); i += 1 }
            bufTs = ts2; bufRows = rows2; bufStart = 0
          }
          val at = (bufStart + bufLen) & (bufTs.length - 1)
          bufTs(at) = ts; bufRows(at) = row
          bufLen += 1
        }
        private def bufDropHead(): Unit = {
          bufRows(bufStart) = null // release the copied row
          bufStart = (bufStart + 1) & (bufTs.length - 1)
          bufLen -= 1
        }
        private def bufClear(): Unit = {
          java.util.Arrays.fill(bufRows.asInstanceOf[Array[AnyRef]], null)
          bufStart = 0; bufLen = 0
        }
        private var bufKey: Any = null
        private var bufKeyValid = false

        // current left row mid-emission. NOT copied: the child
        // iterator's row stays valid until its next next(), and
        // li.next() is only called after this left finishes emitting.
        private var curLeft: InternalRow = null
        private var curHi: Long = 0L
        private var emitPos = 0 // logical index into the buffer
        private var emitEnd = 0
        private var emitted = false

        private var pending: InternalRow = null

        private def loadLeft(): Unit = {
          val l = li.next()
          if (l.isNullAt(lKeyIdx) || l.isNullAt(loIdx) || l.isNullAt(hiIdx)) {
            // null key or bound: matches nothing; outer still emits
            if (outer) {
              curLeft = l; emitted = false; emitPos = 0; emitEnd = 0
            }
            return
          }
          val lk = l.get(lKeyIdx, keyType)
          val loV = loGet(l)
          val hiV = hiGet(l)
          if (!bufKeyValid || keyCmp(bufKey, lk) != 0) {
            bufClear()
            bufKey = stable(lk); bufKeyValid = true
            // rights of keys the left side skipped can never match
            while (rValid && keyCmp(rKey, lk) < 0) advanceRight()
          }
          // EVICT: head rows failing the lower bound for this (and
          // hence every later) left of the key
          while (bufLen > 0 && !passLower(bufTs(bufStart), loV)) bufDropHead()
          // PULL: rights of the key up to the upper bound
          while (rValid && keyCmp(rKey, lk) == 0 && passUpper(rTs, hiV)) {
            if (passLower(rTs, loV)) bufAdd(rTs, rRow.copy())
            // else: below every remaining interval's lower bound — drop
            advanceRight()
          }
          curLeft = l
          curHi = hiV
          emitted = false
          emitPos = 0
          emitEnd = bufLen
        }

        private def advance(): Unit = {
          while (pending == null) {
            if (curLeft != null) {
              var stop = false
              while (pending == null && !stop && emitPos < emitEnd) {
                val ts = bufTsAt(emitPos)
                if (passUpper(ts, curHi)) {
                  emitted = true
                  pending = proj(joined(curLeft, bufRowAt(emitPos)))
                  emitPos += 1
                } else stop = true // ts-sorted: nothing later matches
              }
              if (pending == null) {
                if (!emitted && outer) pending = proj(joined(curLeft, nullRight))
                curLeft = null
                emitted = true
              }
            }
            if (pending == null) {
              if (!li.hasNext) return
              loadLeft()
            }
          }
        }

        override def hasNext: Boolean = {
          if (pending == null) advance()
          pending != null
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty iterator")
          val out = pending
          pending = null
          numOutputRows += 1
          out
        }
      }
    }
  }
}
