package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k per group as a typed Aggregator — the scale-correct
  * alternative to `row_number().over(window)` for small k: the window
  * form SORTS every group in full after the shuffle; the aggregator
  * keeps a k-bounded buffer, combines map-side (partial aggregation
  * before the exchange — only k rows per (partition, group) ever
  * shuffle), and never materializes a group.  O(n log k) work,
  * shuffle volume k·groups instead of n.
  */
object TopK {

  /** (score, id) ordered by score DESC then id ASC — id breaks ties
    * deterministically.
    */
  type Entry = (Double, Long)

  private def rank(e: Entry): (Double, Long) = (-e._1, e._2)

  final class TopKAgg(k: Int) extends Aggregator[(String, Double, Long), List[Entry], Seq[Entry]] {
    override def zero: List[Entry] = Nil
    private def trim(buf: List[Entry]): List[Entry] = buf.sortBy(rank).take(k)
    override def reduce(buf: List[Entry], row: (String, Double, Long)): List[Entry] =
      trim((row._2, row._3) :: buf)
    override def merge(a: List[Entry], b: List[Entry]): List[Entry] = trim(a ++ b)
    override def finish(buf: List[Entry]): Seq[Entry] = buf.sortBy(rank)
    override def bufferEncoder: Encoder[List[Entry]] = Encoders.kryo[List[Entry]]
    override def outputEncoder: Encoder[Seq[Entry]] = Encoders.kryo[Seq[Entry]]
  }

  /** Top-`k` (id, score) rows per group with rank, matching
    * `ROW_NUMBER() OVER (PARTITION BY group ORDER BY score DESC, id)`
    * for rk <= k — but with k-bounded partial aggregation instead of a
    * full per-group sort.
    */
  def topKPerGroup(df: DataFrame, groupCol: String, scoreCol: String,
      idCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("string"), col(scoreCol).cast("double"),
        col(idCol).cast("long"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .agg(new TopKAgg(k).toColumn.name("topk"))
      .flatMap { case (g, items) =>
        items.iterator.zipWithIndex.map { case ((s, id), i) => (g, id, s, i + 1) }
      }
      .toDF(groupCol, idCol, scoreCol, "rk")
  }
}
