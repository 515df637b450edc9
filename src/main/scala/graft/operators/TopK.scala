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

  /** Buffer = unsorted entries + cached count + the current k-th rank
    * once known. Rows worse than the k-th are skipped outright; others
    * append, and the buffer is sorted+trimmed only when it reaches 2k —
    * amortized O(log k) per kept row, O(1) per skipped row (the
    * claimed O(n log k) total; a trim-every-row form would be
    * O(n·k log k)).
    */
  final case class Buf(entries: List[Entry], n: Int, kth: Option[(Double, Long)])

  final class TopKAgg(k: Int) extends Aggregator[(String, Double, Long), Buf, Seq[Entry]] {
    override def zero: Buf = Buf(Nil, 0, None)
    private def trim(buf: Buf): Buf =
      if (buf.n <= k) buf
      else {
        val kept = buf.entries.sortBy(rank).take(k)
        Buf(kept, k, Some(rank(kept.last)))
      }
    private def insert(buf: Buf, e: Entry): Buf = {
      import scala.math.Ordering.Implicits._
      if (buf.kth.exists(kth => rank(e) >= kth)) buf // can't enter the top k
      else {
        val grown = Buf(e :: buf.entries, buf.n + 1, buf.kth)
        if (grown.n >= 2 * k) trim(grown) else grown
      }
    }
    override def reduce(buf: Buf, row: (String, Double, Long)): Buf =
      insert(buf, (row._2, row._3))
    override def merge(a: Buf, b: Buf): Buf =
      trim(Buf(a.entries ::: b.entries, a.n + b.n, None))
    override def finish(buf: Buf): Seq[Entry] = buf.entries.sortBy(rank).take(k)
    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
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
    val groupType = df.schema(groupCol).dataType
    // fail fast on NULL score/id with a message that names the fix —
    // the tuple encoder would otherwise die with an opaque NPE, and
    // silently ranking NULLs would diverge from the ROW_NUMBER oracle.
    // assert_true returns NULL on success, so the filter keeps every
    // row while forcing the check to actually evaluate (a projected-
    // then-dropped column could be pruned away).
    val checked = df.filter(assert_true(
      col(scoreCol).isNotNull && col(idCol).isNotNull,
      lit(s"topKPerGroup: NULL in '$scoreCol' or '$idCol' — filter NULLs or rank them explicitly before calling")).isNull)
    checked.select(col(groupCol).cast("string"), col(scoreCol).cast("double"),
        col(idCol).cast("long"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .agg(new TopKAgg(k).toColumn.name("topk"))
      .flatMap { case (g, items) =>
        items.iterator.zipWithIndex.map { case ((s, id), i) => (g, id, s, i + 1) }
      }
      .toDF(groupCol, idCol, scoreCol, "rk")
      // the string key was an encoder convenience; hand back the
      // caller's group column type — but only where the value
      // round-trips through string (binary would re-encode mangled
      // bytes; array/struct casts are invalid outright)
      .transform { out =>
        import org.apache.spark.sql.types._
        groupType match {
          case StringType | BooleanType | DateType | TimestampType |
               ByteType | ShortType | IntegerType | LongType |
               FloatType | DoubleType | _: DecimalType =>
            out.withColumn(groupCol, col(groupCol).cast(groupType))
          case _ => out // binary/array/struct/map don't round-trip a string
        }
      }
  }
}
