package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: assign documents to fixed-size
  * context windows ("concat-and-chunk" — documents are laid out in a
  * deterministic order, token offsets accumulate, and every `ctxLen`
  * tokens starts a new bin; the layout used by most large-LM data
  * loaders).
  *
  * Scale shape: a single GLOBAL order would serialize the cumulative
  * sum, so the corpus is first split into `shards` deterministic
  * shards (`doc_id % shards`); packing order and offsets are defined
  * WITHIN a shard. One shuffle on the shard key, then a window-local
  * running sum — at 1000 executors you run 1000+ shards and every
  * partition packs independently. The layout is a pure function of
  * (data, ctxLen, shards): reproducible across engines and cluster
  * sizes, which is what makes training-data order auditable.
  */
object Packing {

  /** Per-document packing assignment: shard, token count, start/end
    * token offsets within the shard, and the bin (context window
    * index) where the document STARTS. Token counting is whitespace
    * words — swap `tokensOf` for a real tokenizer's count column at
    * integration time; the layout math is tokenizer-agnostic.
    */
  def packDocs(docs: DataFrame, idCol: String, textCol: String,
      ctxLen: Int, shards: Int): DataFrame =
    packRows(
      docs.select(col(idCol).as("doc_id"),
        size(graft.functions.TextFunctions.tokens(col(textCol))).as("n_tokens")),
      nTokensCol = "n_tokens", shardOn = "doc_id", orderCols = Seq("doc_id"),
      ctxLen = ctxLen, shards = shards)

  /** Core layout math over ANY pre-tokenized row stream (documents,
    * exploded mixture copies, pre-chunked spans): shard on a numeric
    * column, accumulate offsets in `orderCols` order within the
    * shard, bin by start offset.
    */
  def packRows(rows: DataFrame, nTokensCol: String, shardOn: String,
      orderCols: Seq[String], ctxLen: Int, shards: Int): DataFrame = {
    require(ctxLen > 0 && shards > 0)
    // A non-numeric shard key would implicitly cast to NULL inside
    // pmod, silently collapsing the whole corpus into one serialized
    // shard — fail loudly instead.
    require(rows.schema(shardOn).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"shardOn column '$shardOn' must be numeric, got ${rows.schema(shardOn).dataType.sql}; " +
        "hash non-numeric keys (e.g. xxhash64) before packing")
    val w = Window.partitionBy("shard").orderBy(orderCols.map(col): _*)
    rows
      .withColumn("shard", pmod(col(shardOn), lit(shards)).cast("int"))
      .withColumn("end_off", sum(nTokensCol).over(w))
      .withColumn("start_off", (col("end_off") - col(nTokensCol)).cast("long"))
      .withColumn("bin", floor(col("start_off") / lit(ctxLen)).cast("long"))
  }

  /** Bin-level summary: documents and tokens per context window. The
    * fill diagnostic a packing pipeline watches (bins with tokens <<
    * ctxLen mean padding waste; docs spanning bins mean truncation).
    */
  def packBins(docs: DataFrame, idCol: String, textCol: String,
      ctxLen: Int, shards: Int): DataFrame =
    packDocs(docs, idCol, textCol, ctxLen, shards)
      .groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("bin_tokens"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))

  /** D46 — padding-efficiency audit: bucket documents by token length
    * (fixed `bucketWidth`) and report, per bucket, the padding waste
    * of batching each bucket to its longest member — the number a
    * data loader consults when choosing length-bucketed batching over
    * plain concat-and-chunk. Pure integer arithmetic: `pad_waste =
    * n_docs·max_tok − sum_tok`. One hash-aggregate over fixed-width
    * rows; the length projection never shuffles text.
    */
  def paddingAudit(docs: DataFrame, textCol: String, bucketWidth: Int): DataFrame = {
    require(bucketWidth >= 1, s"invalid bucketWidth $bucketWidth")
    docs.select(size(split(col(textCol), " ")).as("n_tok"))
      .groupBy(expr(s"n_tok div $bucketWidth").as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("sum_tok"),
        max(col("n_tok")).as("max_tok"))
      .withColumn("pad_waste", col("n_docs") * col("max_tok") - col("sum_tok"))
  }

  /** D117 — SFT loss-mask derivation over the packed layout: each
    * document is a (prompt, completion) pair — prompt = the first
    * `n div 2` tokens here; swap in a real prompt-length column at
    * integration time — and after concat-and-chunk packing the
    * trainer needs, PER CONTEXT WINDOW, the spans where loss is
    * ACTIVE (completion tokens) vs masked (prompt tokens). Emits one
    * row per (document, window) intersection of the document's
    * completion interval: (shard, win, doc_id, start_in_win,
    * mask_len). A loader applies these rows directly as the
    * loss-mask segments of window `win`.
    *
    * Scale shape: the same shard-parallel running-sum layout as
    * [[packDocs]] (one exchange on the shard key), then a PURE
    * projection + bounded explode — a document spans at most
    * ceil(len/ctxLen)+1 windows, so row multiplication is the
    * corpus-tokens/ctxLen factor the trainer reads anyway. All
    * integer arithmetic; the layout and masks replay bit-for-bit on
    * any engine.
    */
  def sftPackMasks(docs: DataFrame, idCol: String, textCol: String,
      ctxLen: Int, shards: Int): DataFrame = {
    require(ctxLen > 0, s"invalid ctxLen $ctxLen")
    require(shards > 0, s"invalid shard count $shards")
    val toks = split(coalesce(col(textCol), lit("")), " ")
    val t = docs.select(col(idCol).as("doc_id"),
        (col(idCol) % shards).cast("int").as("shard"),
        size(toks).cast("long").as("n"))
      .filter(col("n") >= 1)
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val laid = t.withColumn("end_off", sum("n").over(w))
      .withColumn("st", col("end_off") - col("n"))
      .withColumn("cs", col("st") + expr("n div 2")) // completion start
      .withColumn("ce", col("st") + col("n"))        // completion end (excl)
    laid.select(col("shard"), col("doc_id"), col("cs"), col("ce"),
        explode(sequence(expr(s"cs div ${ctxLen}L"),
          expr(s"(ce - 1) div ${ctxLen}L"))).as("win"))
      .select(col("shard"), col("win"), col("doc_id"),
        (greatest(col("cs"), col("win") * ctxLen) - col("win") * ctxLen)
          .as("start_in_win"),
        (least(col("ce"), (col("win") + 1) * ctxLen)
          - greatest(col("cs"), col("win") * ctxLen)).as("mask_len"))
  }
}
