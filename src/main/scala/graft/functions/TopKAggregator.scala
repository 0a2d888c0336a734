package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Per-group top-k as a typed Aggregator (SURVEY §3: custom aggregate).
  *
  * The rank-window formulation (`row_number().over(partitionBy(key))
  * <= k`) shuffles EVERY row to its key's partition before discarding
  * all but k. This aggregator keeps a bounded k-element buffer per group
  * and merges buffers, so the shuffle carries at most k rows per group
  * per map task — at 100 TB the difference between moving the table and
  * moving the answer. Ordering is (score desc, id asc): deterministic
  * under ties.
  */
object TopKAggregator {

  case class ScoredId(score: Double, id: Long)

  private def better(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  class TopK(k: Int) extends Aggregator[ScoredId, List[ScoredId], Seq[ScoredId]] {
    override def zero: List[ScoredId] = Nil

    override def reduce(buf: List[ScoredId], in: ScoredId): List[ScoredId] =
      insert(buf, in)

    override def merge(a: List[ScoredId], b: List[ScoredId]): List[ScoredId] =
      b.foldLeft(a)(insert)

    private def insert(buf: List[ScoredId], x: ScoredId): List[ScoredId] =
      if (buf.length < k) (x :: buf).sortWith(better)
      else if (better(x, buf.last)) (x :: buf.init).sortWith(better)
      else buf

    override def finish(buf: List[ScoredId]): Seq[ScoredId] = buf

    override def bufferEncoder: Encoder[List[ScoredId]] =
      ExpressionEncoder[List[ScoredId]]()
    override def outputEncoder: Encoder[Seq[ScoredId]] =
      ExpressionEncoder[Seq[ScoredId]]()
  }

  /** Untyped Column form: `df.groupBy(key).agg(topK(3)(scoreCol, idCol))`
    * yields array<struct<score,id>> of the group's top k. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopK(k), Encoders.product[ScoredId])
    (score, id) => fn(score, id)
  }
}
