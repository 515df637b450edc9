package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** D35 — BPE merge-pair statistics: the first `rounds` merge rounds of
  * byte-pair-encoding tokenizer training (Sennrich et al. 2016) over a
  * document corpus. Each round counts adjacent-symbol pairs weighted
  * by word frequency, picks the most frequent pair (deterministic
  * tiebreak), and applies the merge to the vocabulary.
  *
  * Scale shape at 100 TB: the corpus is touched ONCE — the word-count
  * aggregate reduces it to a vocabulary (bounded by distinct words,
  * orders of magnitude smaller), and every merge round runs over that
  * vocab alone: one partial-agg pair count plus a narrow projection.
  * The driver holds exactly one (pair, count) row per round — the
  * k-means discipline (Clustering.scala) applied to tokenizer
  * training. Vocab lineage is truncated per round via localCheckpoint
  * like Components' label propagation.
  *
  * Symbol strings use DOUBLE-space separators with single-space edges
  * (" a  b  c "): a merge is then one plain leftmost-non-overlapping
  * `replace(" l  r ", " lr ")`, which (a) is exact greedy-left BPE —
  * adjacent merge sites each keep a delimiter, so " a  b  a  b "
  * collapses to " ab  ab " in one pass — and (b) has bit-identical
  * semantics in the JVM and DuckDB, so an SQL oracle can replay every
  * round. A single-space representation is WRONG here: the pattern
  * consumes the shared delimiter and the second adjacent site is
  * silently missed.
  */
object Tokenize {

  /** Whitespace-word frequency vocab in symbol-string form, the one
    * corpus-wide exchange: (s = " c1  c2 ... cn ", n = corpus count).
    */
  def bpeVocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(coalesce(col(textCol), lit("")), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(
        concat(lit(" "),
          rtrim(regexp_replace(col("w"), "(.)", "$1  ")), lit(" ")).as("s"),
        col("n"))

  /** Adjacent-pair counts over a vocab in symbol-string form. */
  def pairCounts(vocab: DataFrame): DataFrame = {
    val syms = split(trim(col("s")), "  ")
    vocab.select(syms.as("sym"), col("n"))
      .filter(size(col("sym")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("sym")) - 1),
        i => struct(element_at(col("sym"), i).as("lhs"),
          element_at(col("sym"), i + 1).as("rhs")))).as("p"), col("n"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("n")).as("cnt"))
  }

  /** D36 — BPE encoding (the apply side): tokenize every document
    * with an already-learned merge sequence and report per-doc
    * compression (words in, tokens out). This is the production hot
    * path at corpus scale — the merge list is a handful of driver
    * strings, each merge is ONE plain codegen'd `replace` on the
    * symbol string (same greedy-left semantics as training, same
    * double-space representation), and the whole encode is a pure
    * projection: the only exchange is the final per-doc sum.
    */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val words = docs.select(col(idCol),
        explode(split(coalesce(col(textCol), lit("")), " ")).as("w"))
      .filter(col("w") =!= "")
    val sym = concat(lit(" "),
      rtrim(regexp_replace(col("w"), "(.)", "$1  ")), lit(" "))
    val enc = merges.foldLeft(sym) { case (c, (l, r)) =>
      replace(c, lit(s" $l  $r "), lit(s" $l$r "))
    }
    words.select(col(idCol), size(split(trim(enc), "  ")).as("n_tok"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"), sum(col("n_tok")).as("n_tokens"))
  }

  /** The first `rounds` BPE merges: (round, lhs, rhs, cnt), most
    * frequent pair per round, ties broken by (lhs, rhs) ascending so
    * the merge sequence is engine-exact.
    */
  def bpeMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds > 0, s"invalid merge rounds $rounds")
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = bpeVocab(docs, textCol).localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    while (r <= rounds) {
      val best = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(1).collect() // exactly ONE row on the driver per round
      if (best.nonEmpty) {
        val (l, rr, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((r, l, rr, c))
        vocab = vocab.withColumn("s",
          replace(col("s"), lit(s" $l  $rr "), lit(s" $l$rr "))).localCheckpoint()
      } else r = rounds // vocab exhausted (all words single-symbol)
      r += 1
    }
    merges.result().toDF("round", "lhs", "rhs", "cnt")
  }
}
