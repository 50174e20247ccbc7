package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter summary as a native
  * [[TypedImperativeAggregate]] — the BOUNDED-MEMORY, MERGEABLE form of
  * [[graft.ext.TextStats.heavyHitters]]' exact hash-agg, and the missing
  * member of the engine's custom-Catalyst set (scalar codegen expressions
  * exist in [[DotProduct]]/[[SortedIntersectCount]]; this is the custom
  * AGGREGATE, with partial aggregation and merge driven by Spark's
  * standard two-phase plan).
  *
  * Algorithm (Misra–Gries '82, weighted form): keep ≤ `capacity` counters;
  * an arriving item increments its counter or claims a free slot; when all
  * slots are taken, every counter drops by the minimum — the classic
  * "pair cancellation". Guarantees, for true frequency f(x) over n total
  * observations: the returned estimate e(x) satisfies
  * f(x) − n/(capacity+1) ≤ e(x) ≤ f(x), and every x with
  * f(x) > n/(capacity+1) is present in the summary. Merging two summaries
  * (concatenate-then-compact) preserves the bound — which is exactly why
  * this shape survives map-side partial aggregation at 100 TB where an
  * exact token census must shuffle every distinct token.
  *
  * Output is the summary as an array of (item, count_est) structs, counter
  * desc / item asc. NOT oracle-registered: surviving counter VALUES depend
  * on merge order (any single engine run is deterministic only up to its
  * partitioning), so the cross-engine twin cannot hash-match — the
  * ε-guarantee against the exact census is property-tested instead
  * (MisraGriesSpec), the same treatment as `corpus_sketch`.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    weight: Expression = Literal(1L),
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity > 0, "graft_heavy_hitters capacity must be positive")

  override def children: Seq[Expression] = Seq(child, weight)

  // Analysis-time type guard (matching the analysis-time capacity guard in
  // the SQL builder): without it, a non-string item or a non-integral
  // weight reaches `update`'s casts and dies mid-job with a
  // ClassCastException inside the aggregate instead of a clear error.
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType != StringType)
      TypeCheckFailure(s"$prettyName requires a STRING item column, got " +
        child.dataType.catalogString)
    else if (!Seq[DataType](ByteType, ShortType, IntegerType, LongType)
        .contains(weight.dataType))
      TypeCheckFailure(s"$prettyName requires an integral weight, got " +
        weight.dataType.catalogString)
    else TypeCheckSuccess
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def add(
      buf: mutable.HashMap[String, Long], item: String, n: Long): Unit = {
    buf.update(item, buf.getOrElse(item, 0L) + n)
    if (buf.size > capacity) {
      // all slots full: cancel the minimum from every counter, drop zeros
      val d = buf.valuesIterator.min
      val dead = buf.iterator.collect { case (k, v) if v <= d => k }.toList
      buf.mapValuesInPlace((_, v) => v - d)
      dead.foreach(buf.remove)
    }
  }

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val w = weight.eval(input)
      if (w != null && w.asInstanceOf[Number].longValue() > 0L)
        add(buf, v.asInstanceOf[UTF8String].toString,
          w.asInstanceOf[Number].longValue())
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, n) => add(buf, k, n) }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toSeq.sortBy { case (k, v) => (-v, k) }
    new GenericArrayData(sorted.map { case (k, v) =>
      InternalRow(UTF8String.fromString(k), v)
    }.toArray[Any])
  }

  // length-prefixed UTF-8, not writeUTF: writeUTF caps strings at 64 KB
  // of encoded bytes and a pathological unbroken "token" must round-trip,
  // not kill the executor
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (k, v) =>
      val kb = k.getBytes("UTF-8")
      out.writeInt(kb.length); out.write(kb); out.writeLong(v)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(b: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(b))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (1 to n).foreach { _ =>
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.update(new String(kb, "UTF-8"), in.readLong())
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count_est", LongType, nullable = false))))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_heavy_hitters"

  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren(0), weight = newChildren(1))
}
