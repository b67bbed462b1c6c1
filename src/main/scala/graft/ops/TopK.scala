package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored row inside a bounded top-k buffer. */
final case class Scored(id: Long, score: Double)

/** Bounded top-k per group as a typed Aggregator (score DESC, id ASC).
  *
  * The scale shape `row_number() OVER (PARTITION BY g ORDER BY ...)` lacks:
  * a window sorts EVERY row of a group on the group's single task, so the
  * stage's parallelism is bounded by the number of DISTINCT GROUPS (25
  * nations = at most 25 tasks, each sorting its whole nation at any data
  * scale). This Aggregator keeps at most k rows per group per partition —
  * map-side PARTIAL aggregation reduces each input split independently,
  * merge combines k-bounded buffers, and only k·|groups| rows ever shuffle.
  *
  * The buffer is a rank-sorted Seq of ≤ k elements; insert is O(k) — right
  * for the small k of top-k-per-group rollups (k=2 here), not for large k
  * (use a heap-backed buffer then).
  */
final class TopKByScore(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k > 0)

  /** a ranks strictly before b. */
  private def before(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def insert(buf: Seq[Scored], x: Scored): Seq[Scored] =
    if (buf.length >= k && before(buf.last, x)) buf // below the cut: drop early
    else {
      val (hi, lo) = buf.span(e => before(e, x))
      val merged = (hi :+ x) ++ lo
      if (merged.length > k) merged.take(k) else merged
    }

  def zero: Seq[Scored] = Seq.empty
  def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] = insert(buf, a)
  def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] = b2.foldLeft(b1)(insert)
  def finish(r: Seq[Scored]): Seq[Scored] = r
  def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
  def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
}
