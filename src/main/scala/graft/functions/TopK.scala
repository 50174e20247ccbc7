package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded, mergeable grouped TOP-K as a native
  * [[TypedImperativeAggregate]]: keep the k largest (score, id) pairs
  * under the total order (score desc, id asc).
  *
  * Why it exists when a window `row_number() <= k` computes the same
  * rows: the window plan must SORT every group's full extent after the
  * shuffle — at 100 TB that is a whole-corpus sort whose only output is
  * k rows per group. This aggregate is map-side combinable: each task
  * reduces its slice to ≤ k pairs per group BEFORE the exchange, the
  * shuffle carries |groups|·k fixed-size buffers, and no sort of the
  * full data ever runs. (Same plan shape as Spark's own
  * ObjectHashAggregate sketches — `percentile_approx`, HLL.)
  *
  * Unlike [[MisraGriesAgg]] (whose surviving counters depend on merge
  * order), top-k under a TOTAL order is merge-order independent — the k
  * largest of a multiset are the k largest regardless of arrival or
  * partitioning — so queries built on this aggregate ARE
  * oracle-hash-checkable against a window twin.
  *
  * Buffer discipline: an unsorted pair buffer, compacted to the best k
  * whenever it reaches 4k — amortized O(1) per row with bounded memory
  * (≤ 4k pairs of 16 bytes). NaN scores are rejected at update (a NaN
  * would poison the total order); null score or id is skipped, standard
  * aggregate semantics.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  require(k > 0, "graft_topk k must be positive")

  override def children: Seq[Expression] = Seq(score, id)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    val numeric = Seq[DataType](
      ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)
    if (!numeric.contains(score.dataType))
      TypeCheckFailure(s"$prettyName requires a numeric score, got " +
        score.dataType.catalogString)
    else if (!Seq[DataType](ByteType, ShortType, IntegerType, LongType)
        .contains(id.dataType))
      TypeCheckFailure(s"$prettyName requires an integral id, got " +
        id.dataType.catalogString)
    else TypeCheckSuccess
  }

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  private def compact(buf: ArrayBuffer[(Double, Long)]): Unit =
    if (buf.length > k) {
      val best = buf.sortBy { case (s, i) => (-s, i) }.take(k)
      buf.clear()
      buf ++= best
    }

  private def add(
      buf: ArrayBuffer[(Double, Long)], s: Double, i: Long): Unit = {
    buf += ((s, i))
    if (buf.length >= 4 * k) compact(buf)
  }

  override def update(
      buf: ArrayBuffer[(Double, Long)],
      input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val sv = score.eval(input)
    val iv = id.eval(input)
    if (sv != null && iv != null) {
      val s = sv.asInstanceOf[Number].doubleValue()
      if (!s.isNaN) add(buf, s, iv.asInstanceOf[Number].longValue())
    }
    buf
  }

  override def merge(
      buf: ArrayBuffer[(Double, Long)],
      other: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    other.foreach { case (s, i) => add(buf, s, i) }
    buf
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any = {
    compact(buf)
    val sorted = buf.sortBy { case (s, i) => (-s, i) }.take(k)
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    compact(buf) // ship ≤ k pairs, never the raw 4k staging buffer
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.length)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(b: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(b))
    val n = in.readInt()
    val buf = ArrayBuffer.empty[(Double, Long)]
    (1 to n).foreach(_ => buf += ((in.readDouble(), in.readLong())))
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"

  override def withNewMutableAggBufferOffset(offset: Int): TopKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren(0), id = newChildren(1))
}
