package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions (SURVEY.md §5): filters and projections must
  * reach the parquet scan, dimension joins must broadcast, and the
  * scan must read only the needed columns. These are the properties
  * that survive a 100x scale-up; asserting them keeps regressions out.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q_filter_pushdown: filters pushed, 3-column read schema") {
    val plan = planOf("q_filter_pushdown")
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("GreaterThanOrEqual(l_quantity"), plan)
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"), plan)
    // projection pruned to the 3 output + 2 filter columns
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_partkey"), readSchema)
  }

  test("q1: partial aggregation before the exchange") {
    val plan = planOf("q1_pricing_summary")
    assert(plan.contains("HashAggregate"), plan)
    // map-side partial agg: two HashAggregates around one shuffle
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("LessThanOrEqual(l_shipdate"), plan)
  }

  test("q3/q5: dimension sides broadcast, fact side stays partitioned") {
    val p3 = planOf("q3_shipping_priority")
    assert(p3.contains("BroadcastHashJoin"), p3)
    assert(!p3.contains("SortMergeJoin"), p3)
    val p5 = planOf("q5_local_supplier")
    assert("BroadcastHashJoin".r.findAllIn(p5).size >= 4, p5)
  }

  test("q6: selective scan pushes all three predicates") {
    val plan = planOf("q6_revenue")
    assert(plan.contains("PushedFilters:"), plan)
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"), plan)
    assert(plan.contains("LessThan(l_shipdate"), plan)
    assert(plan.contains("LessThan(l_quantity"), plan)
  }

  test("semi/anti joins stay semi/anti (no row explosion)") {
    assert(planOf("q_semi_join").contains("LeftSemi"), planOf("q_semi_join"))
    assert(planOf("q_anti_join").contains("LeftAnti"), planOf("q_anti_join"))
  }

  test("whole-stage codegen covers the dot-product pair loop") {
    val df = SparkEntry.queries("q_neardup_embedding")(spark, sf)
    val formatted = df.queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("dot_product"), formatted)
    // scoring happens inside the join (no separate interpreted
    // projection stage for the similarity)
    assert(formatted.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") || l.contains("SortMergeJoin")), formatted)
  }

  test("knn queries broadcast the query side") {
    assert(planOf("q_knn_bruteforce").contains("BroadcastNestedLoopJoin") ||
      planOf("q_knn_bruteforce").contains("BroadcastHashJoin"))
    assert(planOf("q_knn_lsh").contains("BroadcastHashJoin"))
  }

  test("IVF corpus-side cell assignment is codegen'd, not a Scala UDF") {
    // the corpus scan+assign is the one full-data pass of knnIvf; the
    // only UDF allowed in the plan is the (broadcast-sized) query-side
    // probe. nearest_cell must appear instead, on the corpus branch.
    val plan = planOf("q_knn_ivf")
    assert(plan.contains("nearest_cell"), plan)
    val corpusSide = plan.linesIterator.filter(_.contains("cv#")).mkString("\n")
    assert(!corpusSide.contains("UDF"), corpusSide)
  }

  test("theta join hash-joins on the equi key (never a cartesian product)") {
    val plan = planOf("q_theta_join")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Join"), plan)
    // the inequality rides as a residual condition on the equi join
    assert(plan.contains("l_quantity") && plan.contains("p_size"), plan)
  }

  test("session_window aggregates with a single user-key hash exchange") {
    val plan = planOf("q_session_window")
    // one hash exchange for the session aggregation; the only other
    // exchange is the presentation ORDER BY (range partitioning)
    assert("hashpartitioning".r.findAllIn(plan).size === 1, plan)
    assert("Exchange \\(".r.findAllIn(plan).size <= 2, plan)
  }

  test("set operations resolve to joins/aggregates, not cross products") {
    assert(!planOf("q_intersect").contains("CartesianProduct"))
    assert(!planOf("q_except").contains("CartesianProduct"))
  }

  test("correlated EXISTS plans as a semi join") {
    assert(planOf("q_exists_corr").contains("LeftSemi"), planOf("q_exists_corr"))
  }

  test("topk aggregator partial-aggregates before the exchange") {
    val plan = planOf("q_topk_agg")
    // formatted explain prints each node twice (tree + detail block),
    // so a partial+final PAIR means >= 4 mentions
    val aggs = "ObjectHashAggregate|SortAggregate".r.findAllIn(plan).size
    assert(aggs >= 4, s"expected partial+final aggregate pair, plan:\n$plan")
  }

  test("string/date function gates read only the referenced columns") {
    val rs = planOf("q_string_funcs").linesIterator.find(_.contains("ReadSchema")).get
    assert(!rs.contains("p_retailprice") && !rs.contains("p_brand"), rs)
    val rd = planOf("q_date_funcs").linesIterator.find(_.contains("ReadSchema")).get
    assert(!rd.contains("o_totalprice") && !rd.contains("o_custkey"), rd)
  }

  test("bm25: corpus scalars and df broadcast; only matched terms aggregate") {
    val plan = planOf("q_bm25")
    // the corpus-stats cross join must be a broadcast, never a shuffle
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // term filter runs BEFORE the tf aggregate (generate → filter → agg)
    assert(plan.contains("Generate"), plan)
    val aggs = "HashAggregate".r.findAllIn(plan).size
    assert(aggs >= 4, s"expected partial+final aggregate pairs, plan:\n$plan")
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("kmeans: assignment is ONE codegen'd argmin, no duplicated distance tree") {
    val plan = planOf("q_kmeans")
    assert(!plan.contains("ScalaUDF"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // final assignment: quantize+argmin projection, one sort for the
    // gate's ORDER BY — no join anywhere (centroids ride in the expr)
    assert(!plan.contains("Join"), plan)
    // the whole argmin is a single nearest_centroid loop; the old
    // array_position(array(d...), array_min(array(d...))) shape built
    // the k·dim distance tree twice and would drop out of codegen at
    // large k — its markers must not reappear
    assert(plan.contains("nearest_centroid"), plan)
    assert(!plan.contains("array_position"), plan)
    assert(!plan.contains("zip_with"), plan)
    val rs = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(!rs.contains("label"), s"must not read unused columns: $rs")
  }

  test("centroid churn: two argmins in ONE projection, k²-bounded agg, no join, no UDF") {
    val plan = planOf("q_centroid_churn")
    assert(!plan.contains("ScalaUDF"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // both centroid tables ride in the nearest_centroid expressions —
    // no join, no vector shuffle; the only exchange is the ≤k²-row
    // transition aggregate
    assert(!plan.contains("Join"), plan)
    assert("nearest_centroid".r.findAllIn(plan).size >= 2,
      s"expected BOTH argmins (old and new centroids) in the projection:\n$plan")
    assert(plan.contains("HashAggregate"), plan)
  }

  test("prep gates: projection-only shapes with pruned reads") {
    // split assignment: pure projection on doc_id — no join, no UDF,
    // nothing but the id column read
    val ps = planOf("q_split_assign")
    assert(!ps.contains("Join") && !ps.contains("ScalaUDF"), ps)
    val rs = ps.linesIterator.find(_.contains("ReadSchema")).get
    assert(!rs.contains("text") && !rs.contains("lang") && !rs.contains("source"), rs)
    // chunking: explode-only — no join, no aggregate, reads id + text
    val pc = planOf("q_chunk_docs")
    assert(!pc.contains("Join") && !pc.contains("ScalaUDF"), pc)
    assert(pc.contains("Generate"), pc)
    val rc = pc.linesIterator.find(_.contains("ReadSchema")).get
    assert(!rc.contains("lang") && !rc.contains("source") && !rc.contains("n_chars"), rc)
    // deterministic shuffle: the ranking window partitions by the key
    // bucket (256-way parallel), never a corpus-wide single partition,
    // and the offsets side rides a broadcast
    val pw = planOf("q_shuffle_det")
    assert(pw.contains("__bucket"), pw)
    assert(pw.contains("BroadcastHashJoin"), pw)
    assert(!pw.contains("ScalaUDF"), pw)
  }

  /** The one shape an UNPARTITIONED window is allowed to take: its
    * input subtree is bounded by construction — an Aggregate (the
    * bucket-prefix combine: row count = bucket cardinality, never the
    * corpus), a GlobalLimit, or a literal LocalRelation. Everything
    * else is a corpus-sized single-partition sort, the scale-killer
    * the Bench/Verify mains' class-global WindowExec log silence
    * would otherwise hide.
    */
  private def unboundedWindows(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[String] = {
    import org.apache.spark.sql.catalyst.plans.logical.{
      Aggregate, GlobalLimit, LocalRelation, Window => LWindow}
    plan.collect {
      case w: LWindow if w.partitionSpec.isEmpty &&
        w.child.collectFirst {
          case a: Aggregate => a: Any
          case l: GlobalLimit => l: Any
          case r: LocalRelation => r: Any
        }.isEmpty => w.simpleString(120)
    }
  }

  test("WindowExec guardrail: EVERY gate's unpartitioned windows are aggregate-bounded") {
    // Round 13 (r12 verdict #4): the 4-gate allowlist
    // (q_shuffle_det/q_curriculum/q_quantile_sketch/q_pareto) left a
    // gap — a FUTURE operator shipping a corpus-sized unpartitioned
    // window would be invisible in both the silenced log and the
    // spec. Sweep every SparkEntry gate's optimizedPlan instead, so
    // the class-global log silence in Bench/Verify is safe by
    // construction. sf0.001 keeps the eager gate constructions
    // (index builds, streaming runs) cheap; plan SHAPE is
    // SF-independent.
    val sfSmall = "/root/testdata/sf0.001"
    val offenders = SparkEntry.gateQueries.flatMap { q =>
      val plan =
        try q.fn(spark, sfSmall).queryExecution.optimizedPlan
        catch { case e: Throwable =>
          fail(s"${q.name}: gate construction failed during the sweep: $e")
        }
      unboundedWindows(plan).map(w => s"${q.name}: $w")
    }
    assert(offenders.isEmpty,
      s"corpus-sized unpartitioned windows found:\n${offenders.mkString("\n")}")
  }

  test("WindowExec guardrail flags a deliberately-unbounded window (negative control)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val bad = Tables(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("rk", row_number().over(Window.orderBy("doc_id")))
    assert(unboundedWindows(bad.queryExecution.optimizedPlan).nonEmpty,
      "the sweep predicate must flag a corpus-wide single-partition window")
    // and the blessed shape stays allowed: prefix sum over an aggregate
    val ok = Tables(spark, "/root/testdata/sf0.001", "documents")
      .groupBy(substring(col("text"), 1, 1).as("b")).agg(count(lit(1)).as("n"))
      .withColumn("off", sum("n").over(
        Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)))
    assert(unboundedWindows(ok.queryExecution.optimizedPlan).isEmpty)
  }

  test("curriculum order: two-phase rank, corpus never in a single-partition window") {
    val p = planOf("q_curriculum")
    assert(!p.contains("ScalaUDF"), p)
    // the corpus-side window partitions by the score bucket; the only
    // single-partition window is the driver-sized bucket-count prefix
    assert(p.contains("__sb"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("incremental view maintenance: hash-only diff exchange, broadcast value attach, no cartesian") {
    val p = planOf("q_incr_agg")
    assert(!p.contains("ScalaUDF"), p)
    assert(!p.contains("CartesianProduct"), p)
    // after-image values attach behind broadcast changed-key semi-joins
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    // (the md5-before-exchange diff stage is materialized behind the
    // changelog's localCheckpoint and so invisible to this plan; its
    // shape is pinned by the q_changelog gate itself)
  }

  test("pq rerank: raw-vector read pruned to shortlist ids, no cartesian, no UDF") {
    val p = planOf("q_pq_rerank")
    assert(!p.contains("ScalaUDF"), p)
    assert(!p.contains("CartesianProduct"), p)
    // stage-2 exact re-rank: the corpus's full-width vectors enter the
    // plan only behind the broadcast shortlist-id semi join
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("pareto frontier: two-phase running min, corpus never in a single-partition window") {
    val p = planOf("q_pareto")
    assert(!p.contains("ScalaUDF"), p)
    // the per-point running min must window over the range bucket —
    // on continuous x the collapsed set is corpus-sized, so an
    // unpartitioned Window here is a single-task global sort. The
    // only unpartitioned window left is the 256-row bucket-prefix
    // combine, which this assert pins by requiring every window whose
    // frame orders by x to carry the __bucket partition spec.
    assert(p.contains("__bucket"), p)
    val winLines = p.linesIterator.filter(l =>
      l.contains("windowspecdefinition") && l.contains("x#")).toSeq
    assert(winLines.nonEmpty, p)
    winLines.foreach(l => assert(l.contains("__bucket"), l))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("runtime bloom filter prunes the fact scan behind a selective dim filter") {
    // the 100 TB lever the local thresholds hide: a selective filter on
    // the small join side injects a bloom_filter_agg subquery whose
    // BloomFilterMightContain prunes fact rows BEFORE the join shuffle.
    // Defaults only engage past multi-GB scans, so pin the behavior by
    // lowering the application-side threshold, then restore.
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import org.apache.spark.sql.functions._
      val dir = sf
      val orders = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val fact = spark.read.parquet(s"$dir/lineitem.parquet")
      val j = fact.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity"))
      val opt = j.queryExecution.optimizedPlan.toString
      assert(opt.contains("bloom_filter_agg"), opt)
      assert(opt.contains("might_contain"), opt)
      // sanity: the filtered join still computes the right total
      val got = j.collect().head.getDouble(1)
      val expect = spark.read.parquet(s"$dir/lineitem.parquet")
        .join(spark.read.parquet(s"$dir/orders.parquet")
          .filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .agg(sum("l_quantity")).collect().head.getDouble(0)
      assert(got === expect)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("simhash probe: fixed-width band join, no UDF, no cartesian, no text rescan of the index") {
    val p = planOf("q_simhash_incr")
    assert(!p.contains("ScalaUDF"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the candidate join is an equi hash join on (band, nib) — the
    // probe must never degrade to a nested loop over fingerprints
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
    // index side reads fixed-width rows only: the stored sigs carry
    // no text column to rescan
    val reads = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    val idxRead = reads.find(_.contains("simhash"))
    assert(idxRead.isDefined, p)
    assert(!idxRead.get.contains("text"), idxRead.get)
  }

  test("remove-top: zero-exchange projection (no join, no shuffle, no UDF)") {
    // the direction is a dim-length literal array, so the removal is
    // a pure zip_with projection over the quantized scan
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val plan = graft.operators.Linalg.removeTopDirection(
        emb, "vec_id", "embedding", Array.fill(64)(1000L))
      .queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("vocab pruning: keep-vocabulary join, order-preserving regroup, no UDF") {
    val p = planOf("q_prune_vocab")
    assert(!p.contains("ScalaUDF"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the rewrite attaches the keep decision by equi join on the token
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("srp projection: join-free UDF-free projection, scan pruned to id+vector") {
    val p = planOf("q_srp_project")
    assert(!p.contains("Join") && !p.contains("ScalaUDF"), p)
    // the operator is aggregation-free: p_j sums are array folds inside
    // the projection, never a shuffling aggregate
    assert(!p.contains("HashAggregate"), p)
    // all outDim sums come from the ONE codegen'd fused-loop expression
    // — per-dim aggregate(zip_with(...)) lambdas are interpreted and
    // were measured ~30× slower on the corpus pass
    assert(p.contains("signed_project"), p)
    assert(!p.contains("zip_with") && !p.contains("aggregate("), p)
    val rs = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(rs.contains("vec_id") && rs.contains("embedding"), rs)
  }

  test("dup-spans: grams reduce to md5 before exchanges, dup join stays semi") {
    val p = planOf("q_dup_spans")
    assert(!p.contains("ScalaUDF"), p)
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct"), p)
    // both aggregates (dup-set and per-doc) partial-aggregate map-side
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("winnow: md5-reduced window input, per-doc sort only, no cartesian/UDF") {
    val p = planOf("q_winnow")
    assert(!p.contains("ScalaUDF"), p)
    assert(!p.contains("CartesianProduct"), p)
    // selection is a window over fixed-width (doc_id, start, md5) rows
    assert(p.contains("Window"), p)
    // the per-doc fingerprint aggregate partial-aggregates map-side
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    // ONE gram derivation feeds the window (no second explode of the corpus)
    assert("\\(\\d+\\) Generate".r.findAllIn(p).size <= 1, p)
  }

  test("span removal: md5-reduced exchanges, fused canon aggregate, no cartesian/UDF") {
    val p = planOf("q_dedup_spans_remove")
    assert(!p.contains("ScalaUDF"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the dup test and canonical struct-min are ONE fused aggregate;
    // with the cut-set aggregate that is >= 2 map-side partials
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    // reconstruction is an array filter projection, not a corpus
    // per-token explode: Generate nodes are the two gram derivations
    // (agg + join probe) and the bounded cut-index explode. The
    // formatted plan prints each node twice (tree + details), so count
    // the numbered detail lines only.
    assert("\\(\\d+\\) Generate".r.findAllIn(p).size <= 3, p)
  }

  test("seed classifier: one vocab aggregate, partial-agg score join, no UDF") {
    val p = planOf("q_seed_classify")
    assert(!p.contains("ScalaUDF"), p)
    assert(!p.contains("CartesianProduct"), p)
    // vocab reduce + per-doc score both partial-aggregate map-side
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    // the token explode feeds the model aggregate and the join probe —
    // exactly two Generate nodes, no third corpus pass
    assert("\\(\\d+\\) Generate".r.findAllIn(p).size <= 2, p)
    // only the three referenced columns are read
    val rs = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!rs.contains("n_chars") && !rs.contains("source"), rs)
  }

  test("source overlap: fixed-width reduces before pairing, no UDF, pruned read") {
    val p = planOf("q_source_overlap")
    assert(!p.contains("ScalaUDF"), p)
    assert(!p.contains("CartesianProduct"), p)
    // distinct (source,shingle) + per-source totals + per-shingle sets
    // + pair counts all partial-aggregate map-side
    assert("HashAggregate".r.findAllIn(p).size + "ObjectHashAggregate".r.findAllIn(p).size >= 4, p)
    // only text+source are read from the corpus
    val rs = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!rs.contains("n_chars") && !rs.contains("lang"), rs)
  }

  test("zorder audit: zero-shuffle key projection, one aggregate, pruned read") {
    val p = planOf("q_zorder")
    assert(!p.contains("ScalaUDF"), p)
    // the Morton key is a projection; the only exchanges are the bin
    // aggregate's and the gate's final ORDER BY
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).size <= 2, p)
    assert(p.contains("HashAggregate"), p)
    val rs = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(rs.contains("l_partkey") && rs.contains("l_suppkey") &&
      !rs.contains("l_orderkey") && !rs.contains("l_quantity"), rs)
  }

  test("gapfill: grid joins broadcast, no UDF, pruned read") {
    val p = planOf("q_gapfill")
    assert(!p.contains("ScalaUDF"), p)
    // the hour grid and the fill join are dimension-sized broadcasts —
    // the corpus must never shuffle for them
    assert("Broadcast".r.findAllIn(p).nonEmpty, p)
    assert(!p.contains("SortMergeJoin"), p)
    val rs = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!rs.contains("props") && !rs.contains("value"), rs)
  }

  test("scd2: one entity-key exchange feeds windows and aggregate") {
    val p = planOf("q_scd2")
    assert(!p.contains("ScalaUDF"), p)
    // hash exchange on user_id (windows + segment agg reuse it), the
    // version window's, plus the gate's final ORDER BY range exchange
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).size <= 3, p)
    val rs = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!rs.contains("props") && !rs.contains("value"), rs)
  }

  test("transitions: totals broadcast, integer div, no cartesian") {
    val p = planOf("q_transitions")
    assert(!p.contains("ScalaUDF") && !p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("bloom dedup: codegen probe, no UDF, hash-only exchanges") {
    val p = planOf("q_dedup_bloom")
    assert(!p.contains("ScalaUDF"), p)
    assert(p.contains("might_contain"), p)
    // text never shuffles: the read schema carries it (hash is
    // computed in-projection) but every exchange moves hashed rows
    assert(p.contains("LeftAnti") || p.contains("LeftSemi"), p)
  }

  test("merge upsert: the base read carries a partition filter") {
    // the operator's read shape, on a committed table
    import org.apache.spark.sql.functions._
    val path = java.nio.file.Files.createTempDirectory("graft_plan_merge").toString
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").withColumn("shard", col("id") % 2)
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    val pruned = spark.read.parquet(path).filter(col("shard").isin(0))
    val p = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pf = p.linesIterator.find(_.contains("PartitionFilters:")).getOrElse("")
    assert(pf.contains("shard"), p)
  }

  test("audio/image decode tables read only the id column") {
    for (q <- Seq("q_audio_decode", "q_image_decode")) {
      val rs = planOf(q).linesIterator.find(_.contains("ReadSchema")).get
      assert(!rs.contains("text") && !rs.contains("n_chars"), s"$q: $rs")
    }
    // the phash gate localCheckpoints the codec pass (3 consumers), so
    // assert pruning on the pre-checkpoint decode table itself
    val ph = graft.multimodal.Multimodal
      .imagePhashTable(Tables(spark, sf, "documents")).toDF()
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val prs = ph.linesIterator.find(_.contains("ReadSchema")).get
    assert(!prs.contains("text") && !prs.contains("n_chars"), s"q_image_phash: $prs")
  }

  test("pagerank iteration: partial-agg contribution sum, no cartesian, no UDF") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val withDeg = e.join(deg, "src")
    val nodes = e.select(col("src").as("v")).distinct()
    val r0 = nodes.select(col("v"), lit(1000L).as("r"))
    val p = graft.operators.Graph.iterate(nodes, withDeg, r0, base = 50L, d100 = 85L)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("ScalaUDF") && !p.contains("CartesianProduct"), p)
    // contribution sum must partial-aggregate before its exchange —
    // at 100 TB the exchange carries (dst, partial sum), not edges
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("lpa round: partial-agg vote count, single-agg argmax, no window, no UDF") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val adj = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("v", "u")
    val l0 = adj.select(col("v")).distinct().select(col("v"), col("v").as("label"))
    val p = graft.operators.Graph.lpaRound(adj, l0)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("ScalaUDF") && !p.contains("CartesianProduct"), p)
    // argmax is max(struct(cnt, -label)) — one agg, NOT a row_number
    // window (a window would sort every node's full vote list)
    assert(!p.contains("Window"), p)
    // vote count partial-aggregates before its exchange: at 100 TB the
    // exchange carries (v, label, partial cnt), not raw adjacency
    assert("HashAggregate".r.findAllIn(p).size >= 4, p)
  }

  test("rendezvous assignment is a zero-shuffle projection") {
    import spark.implicits._
    val p = graft.operators.ShardExport.rendezvousAssign(
        (1L to 50L).map(Tuple1(_)).toDF("doc_id"), "doc_id", seed = 23L, nShards = 8)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("Exchange") && !p.contains("ScalaUDF") &&
      !p.contains("Window"), p)
  }

  test("linear trend: two map-side-partial aggregates, broadcast origin, no window") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val e = Seq((1L, "a", 1.0), (2L, "a", 2.0)).toDF("t", "grp", "value")
      .withColumn("ts", timestamp_micros(col("t")))
    val p = graft.operators.Timeseries.linearTrend(e, "grp", "ts", "value")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("ScalaUDF") && !p.contains("Window") &&
      !p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastExchange"), "per-group origins broadcast back: " + p)
    assert("HashAggregate".r.findAllIn(p).size >= 4, p)
  }

  test("ohlc bars: single grouped aggregate, no per-bar window sort") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val e = Seq((1L, 10L, "a", 1.0), (2L, 20L, "a", 2.0))
      .toDF("event_id", "t", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("t")))
    val p = graft.operators.Timeseries.ohlcBars(e, "event_type", "ts", "value", "event_id")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("Window") && !p.contains("ScalaUDF"), p)
    // min_by/max_by ride the SAME aggregate as max/min/count/sum (the
    // struct ordering makes it a SortAggregate) — one partial/final
    // aggregate pair, never a per-bar window sort
    assert("Exchange".r.findAllIn(p).size <= 2, p)
  }

  test("power iteration round: dim-keyed partial-agg matvec, broadcast max renorm") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val g = Seq((0, 0, 4L), (0, 1, 1L), (1, 1, 2L)).toDF("i", "j", "s")
    val v0 = Seq((0, 10000L), (1, 10000L)).toDF("j", "v")
    val p = graft.operators.Linalg.powerRound(g, v0, scale = 10000L)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("ScalaUDF"), p)
    assert(p.contains("BroadcastExchange"), "renorm max must broadcast: " + p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("sliding window: one corpus exchange with map-side partial agg") {
    val p = planOf("q_sliding_window")
    assert(!p.contains("ScalaUDF") && !p.contains("CartesianProduct"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    // window explode (×2 rows) happens BEFORE the aggregate, but the
    // exchange itself carries partial aggregates keyed by (win, type)
    val rs = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!rs.contains("props") && !rs.contains("user_id"), rs)
  }

  test("shard export: assignment is projection-only; manifest adds one exchange") {
    // raw read (Tables fans documents out with a repartition exchange
    // by design — here the operator's own shape is under test)
    val assigned = graft.operators.ShardExport.shardAssign(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text",
      seed = 17, nShards = 8)
    val pa = assigned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!pa.contains("Exchange") && !pa.contains("ScalaUDF"), pa)
    val rs = pa.linesIterator.find(_.contains("ReadSchema")).get
    assert(!rs.contains("lang") && !rs.contains("source"), rs)
    val pm = graft.operators.ShardExport.manifest(assigned)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("\\(\\d+\\) Exchange".r.findAllIn(pm).size <= 2, pm)
    assert(!pm.contains("ScalaUDF"), pm)
  }

  test("kmvSetEstimates: sketch joins pair membership on an equi key (no nested-loop)") {
    import spark.implicits._
    val rows = (for { g <- Seq("a", "b", "c"); v <- 1 to 50 } yield (g, s"u$v$g"))
      .toDF("g", "v")
    val sk = graft.operators.Sketches.kmvSketch(rows, "g", "v", 16)
    val plan = graft.operators.Sketches.kmvSetEstimates(sk, 16)
      .queryExecution.executedPlan.toString
    // the OR-condition membership join (g === ga || g === gb) planned
    // as BroadcastNestedLoopJoin over the SKETCH rows; exploding pairs
    // to (g, pair) rows keeps the sketch join hash-based and codegen'd
    // even if a caller passes high-cardinality groups (round-15
    // verdict task 6). The one cross product allowed to remain is the
    // pair GENERATION over the distinct-group dimension — inherently
    // |groups|² output — which must sit under the membership
    // broadcast, never consume sketch (h-carrying) rows.
    assert(plan.contains("BroadcastHashJoin [g#"), plan)
    val bnlj = "BroadcastNestedLoopJoin".r.findAllMatchIn(plan).map(_.start).toSeq
    assert(bnlj.size <= 1, plan)
    bnlj.foreach { pos =>
      val bcast = plan.indexOf("BroadcastExchange HashedRelationBroadcastMode")
      assert(bcast >= 0 && pos > bcast,
        s"nested-loop join outside the pair-dimension broadcast subtree\n$plan")
    }
  }

  test("count-sketch gates: partial grid aggregation before the exchange, broadcast probe joins, no UDF") {
    val plan = planOf("q_count_sketch")
    // the grid aggregate must map-side combine each partition to
    // ≤ depth·width cells before its one exchange — the property that
    // keeps the corpus-sized explode off the wire
    assert(plan.contains("partial_sum"), plan)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
    val inner = planOf("q_cs_inner")
    // two kilobyte grids join on (r, bucket) — hash join, and the only
    // cross product is the one-row estimate × one-row exact frame
    assert(!inner.contains("CartesianProduct"), inner)
    assert(inner.contains("partial_sum"), inner)
    assert(!inner.contains("ScalaUDF"), inner)
    val topk = planOf("q_cs_topk")
    // vocabulary scoring joins the broadcast kilobyte grid; the top-k
    // cut is a TakeOrdered (never a global sort of the vocabulary);
    // the exact recount shuffles only semi-join-filtered candidate
    // occurrences; no cross product anywhere
    assert(topk.contains("partial_sum"), topk)
    assert(topk.contains("TakeOrderedAndProject"), topk)
    assert(topk.contains("LeftSemi"), topk)
    assert(!topk.contains("CartesianProduct") &&
      !topk.contains("BroadcastNestedLoopJoin"), topk)
    assert(!topk.contains("ScalaUDF"), topk)
  }

  test("triangles: equi-keys extracted (no nested-loop), semi-join closure, no UDF") {
    import spark.implicits._
    val edges = (for { a <- 1L to 30L; b <- 1L to 30L if a < b && (a + b) % 3 != 0 }
      yield (a, b)).toDF("src", "dst")
    val plan = graft.operators.Graph.triangles(edges)
      .queryExecution.executedPlan.toString
    // the wedge and closure joins must extract hash keys — an OR-of-
    // directions closure would degrade to nested-loop
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("LeftSemi"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("edit-distance dedup: native levenshtein (no UDF), id-keyed text joins only") {
    import spark.implicits._
    val docs = (1L to 20L).map(i => (i, s"w$i " * 5 + "shared tail words here"))
      .toDF("doc_id", "text")
    val plan = graft.operators.Dedup
      .editDistancePairs(docs, "doc_id", "text", n = 3, maxDistPct = 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("levenshtein"), plan)
    assert(!plan.contains("ScalaUDF") && !plan.contains("CartesianProduct"), plan)
  }

  test("r13 blockings: containment and lossless jaccard plans stay hash-join shaped") {
    import spark.implicits._
    val docs = (1L to 20L).map(i => (i, s"w$i " * 5 + "shared tail words here"))
      .toDF("doc_id", "text")
    // the asymmetric prefix join (containment) and the prefix-routed
    // default jaccard path: equi-joins on the shingle key, no
    // cartesian anywhere, no UDF
    val pc = graft.operators.Dedup
      .containmentPairs(docs, "doc_id", "text", n = 3, thresholdPct = 60)
      .queryExecution.executedPlan.toString
    assert(!pc.contains("CartesianProduct") && !pc.contains("ScalaUDF"), pc)
    val pj = graft.operators.Dedup
      .jaccardPairs(docs, "doc_id", "text", 3, 0.6)
      .queryExecution.executedPlan.toString
    assert(!pj.contains("CartesianProduct") && !pj.contains("ScalaUDF"), pj)
  }

  test("q_constraints: one-scan row rules, anti-join FK, no UDF") {
    val plan = planOf("q_constraints")
    assert(plan.contains("LeftAnti"), plan)
    assert(!plan.contains("ScalaUDF") && !plan.contains("CartesianProduct"), plan)
  }

  test("quantile sketch query: reads the sketch table only, never the corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("histsk_plan").toString
    graft.operators.Sketches.writeHistogramSketch(
      (1L to 50L).map(v => (v % 2, v)).toDF("shard", "v"), "v", "shard", s"$dir/sk", 10L)
    val plan = graft.operators.Sketches
      .quantilesFromSketch(spark, s"$dir/sk", 10L, Seq(50, 95))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // one parquet source: the sketch rows; the percentile side is a
    // broadcast of a literal list
    assert("Scan parquet".r.findAllIn(plan).size <= 2, plan)
    assert(plan.contains(s"$dir/sk".substring(0, 10)) || plan.contains("sk"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("prefix-filtered similarity join: hash-only exchanges, no cartesian, no UDF, pruned read") {
    val plan = planOf("q_dedup_prefix")
    // candidates come from an equi-join on the prefix shingle key —
    // never a nested-loop over doc pairs
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
    // the gate checkpoints the exploded index (it feeds 4 consumers),
    // so assert scan pruning on the pre-checkpoint index plan itself:
    // the documents scan reads only (doc_id, text)
    val ix = graft.operators.Dedup
      .shingleIndexPlan(Tables(spark, sf, "documents"), "doc_id", "text", 3)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val reads = ix.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(reads.nonEmpty && reads.forall(r =>
      !r.contains("lang") && !r.contains("n_chars")), reads.mkString("\n"))
  }

  test("frequent itemsets: broadcast apriori prune, partial-agg passes, no cartesian, no UDF") {
    val plan = planOf("q_freq_itemsets")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
    // the frequent-item prune joins via broadcast (vocab bounded by
    // avg_basket·den/num after the support filter)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // pass-1 item support and pass-2 pair support both partial-agg
    assert("HashAggregate".r.findAllIn(plan).size >= 4, plan)
    val reads = plan.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(reads.nonEmpty && reads.forall(r => !r.contains("lang")), reads.mkString("\n"))
  }

  test("k-center round: projection-only min-dist chain, single-row argmax, no shuffle of state") {
    val st = Tables(spark, sf, "embeddings")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.transform(
          org.apache.spark.sql.functions.col("embedding"),
          x => org.apache.spark.sql.functions.floor(x.cast("double") * 256d).cast("long")).as("q"))
      .withColumn("mind", graft.functions.SqDistToCenter.sqDistToCenter(
        org.apache.spark.sql.functions.col("q"), Array.fill(64)(0L)))
      .withColumn("mind", org.apache.spark.sql.functions.least(
        org.apache.spark.sql.functions.col("mind"),
        graft.functions.SqDistToCenter.sqDistToCenter(
          org.apache.spark.sql.functions.col("q"), Array.fill(64)(1L))))
    val plan = st.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("sq_dist_to_center"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
    // two rounds of least() collapse into projections — never a
    // key-hashed shuffle of the (id, q, mind) state
    assert(!plan.contains("hashpartitioning"), plan)
  }

  test("pq search: code-table scan only, broadcast lookup join, partial-agg sum, no UDF") {
    val plan = planOf("q_pq_search")
    // ADC scans the CODES parquet and joins the broadcast distance
    // table — the raw embedding vectors are never rejoined
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    // (qid, cid) distance sum is map-side partial
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
    // corpus side reads the code table (cid, codes), not embeddings
    val reads = plan.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(reads.exists(_.contains("codes")), reads.mkString("\n"))
    assert(!reads.exists(_.contains("embedding:")), reads.mkString("\n"))
  }

  test("pq encode: one projection with codegen'd argmin loops, no UDF, pruned read") {
    val cb = Array.fill(4)(Array.fill(4)(Array.fill(16)(0L)))
    val emb = Tables(spark, sf, "embeddings")
    val q = emb.select(org.apache.spark.sql.functions.col("vec_id"),
      org.apache.spark.sql.functions.transform(
        org.apache.spark.sql.functions.col("embedding"),
        x => org.apache.spark.sql.functions.floor(x.cast("double") * 256d).cast("long")).as("qv"))
    val codes = q.select(org.apache.spark.sql.functions.col("vec_id"),
      org.apache.spark.sql.functions.array((0 until 4).map { s =>
        graft.functions.NearestCentroid.nearestCentroid(
          org.apache.spark.sql.functions.slice(
            org.apache.spark.sql.functions.col("qv"), s * 16 + 1, 16), cb(s))
      }: _*).as("codes"))
    val plan = codes.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("nearest_centroid"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
    // pure projection: the only exchange allowed is Tables()'s
    // round-robin widening of the compute-heavy scan — never a
    // key-hashed shuffle of the corpus
    assert(!plan.contains("hashpartitioning"), plan)
    val reads = plan.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(reads.nonEmpty && reads.forall(r => !r.contains("label")), reads.mkString("\n"))
  }

  test("split contamination: partial-agg counts, hash-only exchanges, no UDF, no cartesian") {
    val plan = planOf("q_split_contamination")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
    // per-doc totals and overlap counts both map-side partial
    assert("partial_count".r.findAllIn(plan).size >= 2, plan)
    // the corpus read prunes to id + text
    val reads = plan.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(reads.forall(r => !r.contains("lang") && !r.contains("source")),
      reads.mkString("\n"))
  }

  test("leakage-safe split: hash projection on the cluster id, no UDF, no cartesian") {
    val plan = planOf("q_split_leakage_safe")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
    // the split rule is the md5 projection, not a join against a rule table
    assert(plan.contains("md5"), plan)
  }

  test("heap diff: census aggregates on both sides before the diff join") {
    val plan = planOf("q_heap_diff")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
    // two type-level censuses → ≥4 HashAggregates (partial+final each side)
    assert("HashAggregate".r.findAllIn(plan).size >= 4, plan)
    assert(plan.contains("FullOuter"), plan)
  }

  test("banding plan: ONE pass computes every plan's sums, no UDF, no cartesian") {
    val plan = planOf("q_banding_plan")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
    // all 6 plans' wanted/unwanted sums ride ONE aggregate over the
    // pair frame (sw_1..su_12 emerge from a single HashAggregate's
    // attribute list), not one aggregate pass per plan
    val aggLines = plan.linesIterator.filter(_.contains("sw_1#")).toSeq
    assert(aggLines.exists(l => l.contains("sw_12#") && l.contains("su_12#")),
      plan.take(4000))
  }

  test("token budget: one corpus aggregate then projection-only plan math") {
    val plan = planOf("q_token_budget")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
    // the domain census partial-aggregates map-side; budget arithmetic
    // is projection (no join against a weight table)
    assert(plan.contains("partial_count") || plan.contains("partial_sum"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // corpus read prunes to the two consumed columns
    val reads = plan.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(reads.forall(r => !r.contains("lang") && !r.contains("doc_id")),
      reads.mkString("\n"))
  }

  test("exact heavy hitters: candidate-only exchange, pruned read, no cartesian") {
    val plan = planOf("q_heavy_exact")
    assert(!plan.contains("CartesianProduct"), plan)
    // the only exchange after the sketch filter carries surviving
    // occurrences; the final count partial-aggregates map-side
    assert(plan.contains("partial_count"), plan)
    // corpus read prunes to text only
    val reads = plan.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(reads.forall(r => !r.contains("doc_id") && !r.contains("source")),
      reads.mkString("\n"))
  }
}
