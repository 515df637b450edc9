package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every bench-flagged gate query against
  * SPARK_GRAFT_SF_DIR and prints one compact JSON line (totals, ingest
  * throughput, 25 slowest gates), writing every gate at full precision
  * to BENCH_DETAIL.json — the printed line must fit the driver's
  * ~2000-char tail capture or it records parsed:null. Results are forced
  * through the noop sink so every output column is actually computed —
  * `.count()` would let the optimizer prune the expensive projections
  * and flatter the numbers.
  *
  * Every gate runs SPARK_GRAFT_BENCH_REPS times (default 2) and
  * reports the per-gate MINIMUM: a loaded machine inflates wall-clock
  * multiplicatively, so the min is the one statistic that survives
  * co-tenant noise — round 5's driver numbers read up to 11× high on
  * untouched code, which would have masked a real regression. `value`
  * is the sum of minima (comparable round-over-round); `wall_sec` is
  * the actual elapsed loop time for context.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // WindowExec warns "No Partition Defined ... single partition" on
    // EVERY unpartitioned window, including the bucket-prefix
    // combines whose input is a bucket-count-bounded aggregate by
    // design. There is no per-plan suppression, so silence the class
    // logger here — safe by construction since round 13: PlanSpec's
    // "WindowExec guardrail" sweep asserts EVERY gate's unpartitioned
    // windows consume an aggregate/limit/literal-bounded subtree, so
    // a future corpus-sized single-partition window fails the build
    // instead of hiding in a silenced log.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec", org.apache.logging.log4j.Level.ERROR)
    // DataSource warns "All paths were ignored" for every overwrite
    // whose target dir does not exist yet (the heap exports write ~20
    // `_`-prefixed table dirs per dump — 10+ lines of noise in every
    // bench/leakcheck tail). Write-path-only noise: an accidentally
    // empty READ cannot hide behind this — every gate's result is
    // hash-checked against its DuckDB oracle.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.datasources.DataSource",
      org.apache.logging.log4j.Level.ERROR)
    // A drained streaming gate's stop() cancels its job group after
    // the last job already finished, and DAGScheduler WARNs "Failed
    // to cancel job group …" — the last benign [error]-channel line
    // in the tail (r15 verdict, What's wrong #4). Deny THAT message
    // only: the logger stays at WARN for everything else (stage
    // failures, oversized task binaries stay visible).
    locally {
      import org.apache.logging.log4j.LogManager
      import org.apache.logging.log4j.core.{Filter, LoggerContext}
      import org.apache.logging.log4j.core.filter.RegexFilter
      val name = "org.apache.spark.scheduler.DAGScheduler"
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        name, org.apache.logging.log4j.Level.WARN)
      val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
      val lc = ctx.getConfiguration.getLoggerConfig(name)
      if (lc.getName == name) {
        lc.addFilter(RegexFilter.createFilter(
          ".*Failed to cancel job group.*", null, java.lang.Boolean.FALSE,
          Filter.Result.DENY, Filter.Result.NEUTRAL))
        ctx.updateLoggers()
      }
    }
    val wall0 = System.nanoTime()
    // untimed warmup: JIT/codegen/scan setup so the first timed query
    // isn't charged for JVM startup. Exercises each hot codegen family
    // once (hash-agg, decimal sum, string split/md5, vector fold) on
    // tiny limits — the timed queries then measure the operators, not
    // the JIT.
    locally {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.DecimalType
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(2000)
        .groupBy("l_returnflag")
        .agg(sum(col("l_extendedprice").cast(DecimalType(12, 2))).cast("double").as("s"),
          count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
      spark.read.parquet(s"$sfDir/documents.parquet").limit(64)
        .select(md5(col("text").cast("binary")).as("h"),
          size(split(col("text"), " ")).as("n"))
        .groupBy("h").agg(sum("n"))
        .write.format("noop").mode("overwrite").save()
      spark.read.parquet(s"$sfDir/embeddings.parquet").limit(64)
        .select(graft.functions.VectorFunctions.l2Norm(
          graft.functions.VectorFunctions.toDouble(col("embedding"))).as("nrm"))
        .write.format("noop").mode("overwrite").save()
    }
    // Heap demo fixtures (two exports + the checkpointed ref-edge
    // derivation) are per-JVM lazy caches: the first q_heap_* gate to
    // run would otherwise pay fixture CONSTRUCTION inside its timing
    // (r10: q_heap_object_index 4.1→7.7 s, q_heap_referrers 0.7→3.0 s
    // were exactly this). Warm them before any timed loop so heap
    // gates time the QUERY. Skipped only when a gate filter excludes
    // every heap gate.
    if (sys.env.get("SPARK_GRAFT_BENCH_ONLY")
          .forall(_.split(",").exists(_.startsWith("q_heap"))))
      graft.queries.Heap.warmDemoFixtures(spark)
    def timed(f: () => Unit): Double = {
      val t0 = System.nanoTime()
      f()
      (System.nanoTime() - t0) / 1e9
    }
    // best-effort scratch cleanup (GB-scale hprof fixtures + parquet
    // exports); never lets an IO hiccup fail the bench. Files.walk
    // surfaces traversal errors as UncheckedIOException (not
    // IOException), and the stream must be closed or it leaks a
    // directory handle per call.
    def deleteRecursively(p: java.nio.file.Path): Unit =
      try {
        import scala.jdk.CollectionConverters._
        if (java.nio.file.Files.exists(p)) {
          val walk = java.nio.file.Files.walk(p)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala.foreach(q => java.nio.file.Files.deleteIfExists(q))
          finally walk.close()
        }
      } catch {
        case _: java.io.IOException => ()
        case _: java.io.UncheckedIOException => ()
      }
    // one attach/drain/detach discipline for every job-count
    // measurement (the 1x and 10x ingest points share it, so a drain
    // fix can't diverge between them)
    def countSparkJobs[T](body: => T): (T, Int) = {
      val n = new java.util.concurrent.atomic.AtomicInteger(0)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          n.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(l)
      val r =
        try body
        finally {
          // async listener bus: drain before detaching so the count is
          // stable (the HeapScaleSpec discipline)
          Thread.sleep(500)
          spark.sparkContext.removeSparkListener(l)
        }
      (r, n.get())
    }
    // PER-GATE EXCEPTION CAPTURE (round 15): a rep that throws used to
    // leave only a stderr line and NaN-poisoned minimum — and when a
    // LATER rep succeeded, nothing at all: the r14 tail shipped a full
    // stack trace beside `failed: 0` with no way to attribute it. Every
    // caught per-rep exception now lands in the detail record as
    // (phase, gate, rep, class, message) so the record explains its own
    // tail. (Errors raised on Spark's OWN threads — e.g. a streaming
    // query's micro-batch thread logging after the harness moved on —
    // don't pass through these catches; they are logged by Spark and,
    // when the gate's recorded time and hash are green, are absorbed
    // retries by construction.)
    val benchErrors = scala.collection.mutable.ArrayBuffer.empty[(String, String, Int, Throwable)]
    def recordError(phase: String, gate: String, rep: Int, e: Throwable): Unit = {
      benchErrors += ((phase, gate, rep, e))
      System.err.println(s"[bench] $phase $gate rep$rep failed: ${e.getMessage}")
    }
    // HOST-LOAD SENTINEL (round 15): a fixed CPU-bound calibration job
    // (no IO, no shuffle — sum of xxhash64 over a fixed range) timed at
    // every tier boundary. Identical work each time, so the readings'
    // spread IS the run's load envelope: a co-tenant spike that
    // inflates gate times shows up as an inflated sentinel reading at
    // that boundary, making "the host was loaded" visible IN the
    // record instead of inferred from wall-clock forensics after the
    // fact (the r13 jaccard and r14 suite-wide inflations both needed
    // replay sessions to diagnose).
    val sentinelReadings = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    // SECOND SENTINEL AXIS (round 16): the CPU job certifies CPU
    // quietness only — a diffuse page-cache/IO swing can hide under a
    // quiet CPU sentinel (the r15 builder-vs-driver few-percent gap
    // had no axis to land on). At every tier boundary also (a) time a
    // fixed IO-touching mini-job — a full-column re-read+decode of the
    // same lineitem parquet — whose spread is the run's IO/page-cache
    // envelope, and (b) record /proc/loadavg's 1-min figure, the
    // whole-host view that sees co-tenant load this JVM never executes.
    val sentinelIoReadings = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    val loadavgReadings = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    def loadavg1(): Double =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
        .split(" ")(0).toDouble
      catch { case _: Exception => Double.NaN }
    def sentinel(label: String): Unit = {
      // min of 2 back-to-back reps: a single ~1 s reading still
      // carries scheduler jitter; the minimum is the statistic every
      // other tier already trusts
      val t = (1 to 2).map(_ => timed(() =>
        spark.range(0L, 3200000000L, 1L, cpus.toInt)
          // bit_xor, not sum: summing billions of hash values
          // overflows Long and ANSI mode turns that into an
          // ArithmeticException
          .selectExpr("bit_xor(xxhash64(id)) AS s")
          .write.format("noop").mode("overwrite").save())).min
      sentinelReadings += ((label, t))
      // IO axis: single rep on purpose — min-of-2 would always read
      // the cache-warm second pass and blind the axis to exactly the
      // page-cache state it exists to sense
      val io = timed(() =>
        spark.read.parquet(s"$sfDir/lineitem.parquet")
          .write.format("noop").mode("overwrite").save())
      sentinelIoReadings += ((label, io))
      loadavgReadings += ((label, loadavg1()))
    }
    // untimed warm passes (JIT/codegen), then the baseline reading
    sentinel("jit_warm"); sentinel("jit_warm2")
    sentinelReadings.clear(); sentinelIoReadings.clear(); loadavgReadings.clear()
    sentinel("start")
    // optional comma-separated gate filter for local iteration (the
    // driver never sets it); heap ingest is skipped when filtering
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    def run(phase: String, qs: Seq[GateQuery]): Seq[(String, Double)] =
      qs.filter(q => only.forall(_.contains(q.name))).map { q =>
        val times = (1 to reps).map { rep =>
          try timed(() => q.fn(spark, sfDir).write.format("noop").mode("overwrite").save())
          catch { case e: Throwable => recordError(phase, q.name, rep, e); Double.NaN }
        }
        q.name -> times.min // NaN poisons min -> a failing gate stays visible
      }
    val results = run("fast", SparkEntry.gateQueries.filter(_.bench))
    sentinel("post_fast")
    // SLOW TIER (default ON; SPARK_GRAFT_BENCH_SLOW=0 skips it for
    // quick local loops): the 13 iterative/multi-commit batch gates
    // (k-core, BFS, SSSP, graph profile, the candidate-verified dedup
    // family, CC clusterings, the curation composition, the persisted
    // ANN index builds). They get a recorded minimum every round —
    // without one, a 3× regression in any of them ships silently —
    // but their sum is reported as `slow_total`, NOT folded into the
    // fast-tier `value`, so the headline number stays comparable with
    // rounds 1-8.
    val slowEnabled = sys.env.getOrElse("SPARK_GRAFT_BENCH_SLOW", "1") != "0"
    val slowResults =
      if (slowEnabled) run("slow", SparkEntry.gateQueries.filter(_.slow)) else Seq.empty
    if (slowEnabled) sentinel("post_slow")
    // AUX TIER (single rep): streaming gates (fixed micro-batch
    // latency — a throughput number would measure the harness) and
    // demo-heap gates (KB-sized fixture dump). Their sums are
    // meaningless as throughput, but a recorded per-gate number makes
    // a 10× harness/parser regression visible round-over-round —
    // without it these ~60 gates have no timing signal at all. One
    // rep: the point is detection, not a stable minimum.
    val auxEnabled = sys.env.getOrElse("SPARK_GRAFT_BENCH_AUX", "1") != "0"
    val auxResults =
      if (auxEnabled) {
        val qs = SparkEntry.gateQueries.filter(q => !q.bench && !q.slow)
          .filter(q => only.forall(_.contains(q.name)))
        qs.map { q =>
          val t = try timed(() =>
            q.fn(spark, sfDir).write.format("noop").mode("overwrite").save())
          catch { case e: Throwable => recordError("aux", q.name, 1, e); Double.NaN }
          q.name -> t
        }
      } else Seq.empty
    if (auxEnabled) sentinel("post_aux")
    // Heap ingest+export throughput (A1-A11): the q_heap_* gates run
    // on a tiny demo dump and are bench=false, which left ingestion
    // invisible to round-over-round comparison. This generates a
    // FIXED-SIZE seeded synthetic dump (untimed) and times the full
    // distributed path: header walk -> pass-1 index -> all system
    // tables -> single-pass per-class export. The dump is ~150 MB / 3M
    // objects so parse/export throughput dominates the ~200 per-table
    // commit fixed costs — at 15 MB the MB/s number measured commit
    // overhead, not the parse path that matters at 100×.
    // CROSS-SCALE AUDIT (slow tier only; SPARK_GRAFT_BENCH_XSCALE=0
    // skips): a superlinear plan regression — an accidental O(n²) in a
    // candidate family — is invisible at one scale factor and
    // catastrophic at 100×. Timing the slow-tier gates at a second,
    // 10×-smaller SF in the same run yields the per-gate empirical
    // scaling exponent log(t_big/t_small)/log(10); exponents > 1.3
    // are flagged in the printed line and recorded per-gate in
    // BENCH_DETAIL.json so the regression is caught mechanically,
    // round-over-round. Fixed per-job overhead at the small SF only
    // DEFLATES the exponent, so a flag is never overhead noise.
    // min-of-2 at the small SF: these gates run seconds there, and a
    // single loaded-machine rep would fake a low exponent.
    val xscaleEnabled = sys.env.getOrElse("SPARK_GRAFT_BENCH_XSCALE", "1") != "0" &&
      slowEnabled && only.isEmpty
    def siblingSf(name: String): Option[String] = {
      val d = new java.io.File(new java.io.File(sfDir).getParentFile, name)
      if (d.isDirectory && d.getAbsolutePath != new java.io.File(sfDir).getAbsolutePath)
        Some(d.getAbsolutePath) else None
    }
    val xscaleDir = sys.env.get("SPARK_GRAFT_BENCH_XSCALE_DIR").orElse(siblingSf("sf0.01"))
    // THIRD cross-scale point (round 14): sf0.001 turns the scaling
    // exponent from a 2-point ratio into a 3-point least-squares fit
    // and makes CURVATURE visible — fixed per-job overhead dominates
    // the tiny SF, so exp_lo << exp_hi means "overhead-masked" while
    // exp_lo ≈ exp_hi > 1 means genuine superlinearity. The FLAG rule
    // is unchanged: it still fires on the top segment (sf0.01→sf0.1,
    // reported as exp_hi), where overhead deflates rather than
    // inflates the reading.
    val xscaleDir2 = sys.env.get("SPARK_GRAFT_BENCH_XSCALE_DIR2").orElse(siblingSf("sf0.001"))
    def sfOf(dir: String): Double =
      "sf([0-9.]+)$".r.findFirstMatchIn(new java.io.File(dir).getName)
        .map(_.group(1).toDouble).getOrElse(Double.NaN)
    // log(sf_a / sf_b), falling back to the decade assumption (the
    // pre-r14 behavior) when either dir is not named sf<number> or
    // the ratio degenerates — env overrides may point anywhere, and a
    // NaN here would both disarm the scaling flag and corrupt the
    // detail JSON (bare NaN is not valid JSON)
    def logSfRatio(a: String, b: String): Double = {
      val r = sfOf(a) / sfOf(b)
      if (java.lang.Double.isFinite(r) && r > 0 && r != 1.0) math.log(r)
      else math.log(10.0)
    }
    def minTimeAt(q: GateQuery, dir: String): Double = {
      val times = (1 to reps.max(2)).map { rep =>
        try timed(() => q.fn(spark, dir).write.format("noop").mode("overwrite").save())
        catch { case e: Throwable => recordError(s"xscale@$dir", q.name, rep, e); Double.NaN }
      }
      times.min
    }
    // (name, tTiny [NaN when absent], tSmall)
    val xscale: Seq[(String, Double, Double)] =
      if (!xscaleEnabled || xscaleDir.isEmpty) Seq.empty
      else SparkEntry.gateQueries.filter(_.slow).flatMap { q =>
        val big = slowResults.toMap.getOrElse(q.name, Double.NaN)
        val small = minTimeAt(q, xscaleDir.get)
        if (big.isNaN || small.isNaN || small <= 0) None
        else {
          val tiny = xscaleDir2.map(minTimeAt(q, _)).getOrElse(Double.NaN)
          Some((q.name, tiny, small))
        }
      }
    if (xscale.nonEmpty) sentinel("post_xscale")
    // least-squares slope of log10(t) on log10(sf) over the available
    // points; exp_hi = the top 2-point segment (the flag + rerun basis)
    def fitExponents(big: Double, small: Double, tiny: Double): (Double, Double) = {
      val expHi = math.log(big / small) / logSfRatio(sfDir, xscaleDir.get)
      // x-coordinates as cumulative log-ratios from the big SF, so
      // un-parseable dir names degrade to decade spacing instead of NaN
      val xSmall = -logSfRatio(sfDir, xscaleDir.get) / math.log(10.0)
      val tinyPt =
        if (!tiny.isNaN && tiny > 0 && xscaleDir2.isDefined)
          Seq((xSmall - logSfRatio(xscaleDir.get, xscaleDir2.get) / math.log(10.0),
            math.log10(tiny)))
        else Seq.empty
      val pts = Seq((0.0, math.log10(big)), (xSmall, math.log10(small))) ++ tinyPt
      val mx = pts.map(_._1).sum / pts.size
      val my = pts.map(_._2).sum / pts.size
      val slope = pts.map(p => (p._1 - mx) * (p._2 - my)).sum /
        pts.map(p => (p._1 - mx) * (p._1 - mx)).sum
      (slope, expHi)
    }
    // (scaling flags are printed AFTER the isolation re-measure below —
    // r11 carried a spurious exp-1.51 flag computed from one inflated
    // co-tenant-noise reading of unchanged code)
    // the ingest bench honors the gate filter by its own name, so
    // `SPARK_GRAFT_BENCH_ONLY=q_heap_ingest_export` measures ingest
    // throughput in isolation when iterating on the export path
    val ingestSelected = only.forall(_.contains("q_heap_ingest_export"))
    // (sec_min, mb, hprof_path, tmp_dir, per-rep times) — the fixture
    // path is kept so the suite-end re-measure below can re-run the
    // SAME dump without regenerating it
    val heapIngest: (Double, Double, String, String, Seq[Double], Int) =
      if (!ingestSelected) (0.0, 0.0, "", "", Seq.empty, 0) else {
      import graft.heap.{HeapDump, HprofWriter}
      import graft.heap.HprofModel.BasicType
      val w = new HprofWriter()
      val obj = w.defineClass("java.lang.Object")
      val str = w.defineClass("java.lang.String", obj,
        instanceFields = Seq("value" -> BasicType.Object, "hash" -> BasicType.Int))
      val box = w.defineClass("java.lang.Integer", obj,
        instanceFields = Seq("value" -> BasicType.Int))
      val classes = (0 until 200).map(i => w.defineClass(s"com.bench.Gen$i", obj,
        instanceFields = Seq("a" -> BasicType.Long, "b" -> BasicType.Int, "ref" -> BasicType.Object)))
      val rnd = new scala.util.Random(7L)
      val byteIds = (0 until 1200000).map(i => w.byteArray(s"payload-${i % 50000}-${rnd.nextInt(100)}"))
      byteIds.zipWithIndex.foreach { case (b, i) =>
        w.instance(str, Seq(BasicType.Object -> b, BasicType.Int -> i))
      }
      (0 until 600000).foreach(i => w.instance(box, Seq(BasicType.Int -> i % 1024)))
      (0 until 1200000).foreach { i =>
        w.instance(classes(i % classes.length),
          Seq(BasicType.Long -> i.toLong, BasicType.Int -> i, BasicType.Object -> byteIds(i % byteIds.length)))
      }
      val dir = java.nio.file.Files.createTempDirectory("graft_bench_heap")
      val hprof = dir.resolve("bench.hprof").toString
      w.writeTo(hprof, segments = 64)
      val mb = new java.io.File(hprof).length() / 1e6
      // reps >= 3 for ingest specifically: at ~4 s per rep a min-of-2
      // still let machine load swing the MB/s signal ±50%
      // round-over-round (r8: 34.8 vs 51.4 MB/s on identical code),
      // which makes the regression threshold unusable. One extra ~4 s
      // rep buys a stable minimum.
      val ingestReps = reps.max(3)
      // job-count telemetry: the export's scale contract is O(1) Spark
      // jobs in the CLASS count (HeapScaleSpec pins 8-class == 64-class
      // counts); recording the per-export job count here gives the
      // round-over-round record the same signal at bench scale — a
      // job-count regression shows as a step in this number even when
      // wall-clock noise hides it
      val (times, ingestJobsTotal) = countSparkJobs {
        (1 to ingestReps).map { r =>
          // drop each export before the next rep — only the hprof
          // fixture persists (for the possible end-of-suite re-measure)
          val out = dir.resolve(s"pq$r")
          val t = timed(() => new HeapDump(spark, hprof).writeParquet(out.toString))
          deleteRecursively(out)
          t
        }
      }
      val jobsPerExport = ingestJobsTotal / ingestReps
      System.err.println(s"[bench] heap ingest jobs/export: $jobsPerExport (total $ingestJobsTotal over $ingestReps reps)")
      val sec = times.min
      System.err.println(f"[bench] heap ingest+export: $mb%.1f MB, 3M objects in $sec%.2f s (${mb / sec}%.1f MB/s, min of $ingestReps)")
      (sec, mb, hprof, dir.toString, times, jobsPerExport)
    }
    // 10× SCALE POINT (round-15): one ~1.5 GB / 30M-object dump —
    // the same record mix as the 156 MB point at exactly 10× —
    // generated STREAMING (untimed; StreamingHprofWriter keeps the
    // footprint at one segment buffer) and exported timed. This is
    // the scale decade the 156 MB point cannot see: a per-class
    // job-count regression or a superlinear parse/export term shows
    // here first. Since round 16 the point is DEFENDED like the 1×
    // point (r15 verdict, What's wrong #1 — its single undefended
    // reading swung 3× between the builder's and the driver's runs):
    // min-of-2 reps, every rep kept for a min/max MB/s band in the
    // record, and a suite-end isolation re-measure when the reading
    // falls >1.5× below the committed record's. (secMin, mb, jobs,
    // hprofPath, scratchDir, repTimes) — fixture kept until after the
    // re-measure decision below.
    // SPARK_GRAFT_BENCH_INGEST10X: "0" skips, "force" runs the point
    // even under a gate filter (local iteration on the defense logic)
    val ingest10xMode = sys.env.getOrElse("SPARK_GRAFT_BENCH_INGEST10X", "1")
    val ingest10x: Option[(Double, Double, Int, String, String, Seq[Double])] =
      if (!ingestSelected || ingest10xMode == "0" ||
          (only.isDefined && ingest10xMode != "force")) None
      else {
        import graft.heap.{HeapDump, StreamingHprofWriter}
        import graft.heap.HprofModel.BasicType
        val dir = java.nio.file.Files.createTempDirectory("graft_bench_heap10x")
        val hprof = dir.resolve("bench10x.hprof").toString
        val w = new StreamingHprofWriter(hprof)
        val obj = w.defineClass("java.lang.Object")
        val str = w.defineClass("java.lang.String", obj,
          instanceFields = Seq("value" -> BasicType.Object, "hash" -> BasicType.Int))
        val box = w.defineClass("java.lang.Integer", obj,
          instanceFields = Seq("value" -> BasicType.Int))
        val classes = (0 until 200).map(i => w.defineClass(s"com.bench.Gen$i", obj,
          instanceFields = Seq("a" -> BasicType.Long, "b" -> BasicType.Int, "ref" -> BasicType.Object)))
        val rnd = new scala.util.Random(7L)
        val nStr = 12000000
        val byteIds = new Array[Long](nStr)
        locally {
          var i = 0
          while (i < nStr) {
            byteIds(i) = w.byteArray(s"payload-${i % 500000}-${rnd.nextInt(100)}"); i += 1
          }
          i = 0
          while (i < nStr) {
            w.instance(str, Seq(BasicType.Object -> byteIds(i), BasicType.Int -> i)); i += 1
          }
          i = 0
          while (i < 6000000) { w.instance(box, Seq(BasicType.Int -> (i % 1024))); i += 1 }
          i = 0
          while (i < 12000000) {
            w.instance(classes(i % classes.length), Seq(BasicType.Long -> i.toLong,
              BasicType.Int -> i, BasicType.Object -> byteIds(i % nStr)))
            i += 1
          }
        }
        w.close()
        val mb = new java.io.File(hprof).length() / 1e6
        val reps10x = 2
        val (times10x, jobs10xTotal) = countSparkJobs {
          (1 to reps10x).map { r =>
            // each export is ~GB-scale scratch: time it, then drop it
            // before the next rep so at most ONE export dir exists at
            // a time (only the hprof fixture persists, for the
            // possible end-of-suite re-measure)
            val out = dir.resolve(s"pq10x_$r")
            val t = timed(() =>
              new HeapDump(spark, hprof).writeParquet(out.toString))
            deleteRecursively(out)
            t
          }
        }
        val jobs10x = jobs10xTotal / reps10x
        val sec = times10x.min
        System.err.println(f"[bench] heap ingest 10x: $mb%.1f MB, 30M objects in $sec%.2f s (${mb / sec}%.1f MB/s, min of $reps10x; $jobs10x jobs/export)")
        Some((sec, mb, jobs10x, hprof, dir.toString, times10x))
      }
    if (ingestSelected) sentinel("post_ingest")
    // FAST-TIER LATE RE-PASS (full-tier runs only): the r9 driver run
    // showed fast gates reading 2-4× their isolated minima while the
    // slow/aux tiers shared the JVM — transient machine load early in
    // the run inflates both early reps at once, and min-of-2 can't see
    // through it. One extra rep per fast gate at the very END of the
    // run (JVM warmest, tiers drained) spreads the minimum across the
    // whole wall-clock window, so a load spike has to span the entire
    // run to inflate a gate's recorded number.
    val fastFinal =
      if (only.isDefined || (!slowEnabled && !auxEnabled)) results
      else {
        val late = SparkEntry.gateQueries.filter(_.bench).map { q =>
          q.name -> (try timed(() =>
            q.fn(spark, sfDir).write.format("noop").mode("overwrite").save())
          catch { case e: Throwable => recordError("fast_late", q.name, 1, e); Double.NaN })
        }.toMap
        results.map { case (n, v) =>
          val l = late.getOrElse(n, Double.NaN)
          n -> (if (v.isNaN) l else if (l.isNaN) v else v.min(l))
        }
      }
    // ISOLATION RE-MEASURE (full-tier runs only): the official record
    // must be self-defending against run-level artifacts — r11's
    // driver record carried q_dedup_containment at 37.2 s (4.4× its
    // r10 reading) plus the round's only superlinearity flag, on
    // UNCHANGED code that read 6.6–8.3 s in quiet re-runs. Any
    // slow-tier gate reading >1.8× its prior-round COMMITTED number,
    // or any cross-scale exponent >1.1, is re-run alone here at the
    // very end of the suite (same JVM, tiers drained) and the isolated
    // minimum recorded, with the gate listed under "rerun" in the
    // detail file. A REAL regression survives isolation; a load spike
    // doesn't. The prior times come from `git show HEAD:BENCH_DETAIL
    // .json` — the r12 record took them from the WORKING-TREE file,
    // which intra-round runs overwrite, so two 2.2× noise readings
    // (q_kcore 5.72 s, q_image_clusters 3.11 s) compared against their
    // own inflated run and slid under the trigger. The committed copy
    // is the one baseline later runs cannot drift.
    def parsePriorRecord(text: String): Map[String, Any] =
      try Json.parse(text) match {
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
        case _ => Map.empty
      } catch { case _: Exception => Map.empty }
    def committedRecord(name: String): Map[String, Any] =
      try {
        val pb = new ProcessBuilder("git", "show", s"HEAD:$name")
        pb.redirectErrorStream(false)
        val proc = pb.start()
        val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
        if (proc.waitFor() == 0 && out.nonEmpty) parsePriorRecord(out) else Map.empty[String, Any]
      } catch { case _: Exception => Map.empty[String, Any] }
    val priorRecord: Map[String, Any] =
      if (only.isDefined) Map.empty
      else {
        // a low-core run compares against ITS core count's committed
        // record when one exists — 8c times read ~1.3× the 32c record
        // on identical code, which would fake isolation-re-measure
        // triggers; the 32c record stays the fallback baseline
        val committed = {
          val own =
            if (cpus != "32") committedRecord(s"BENCH_DETAIL_c$cpus.json")
            else Map.empty[String, Any]
          if (own.nonEmpty) own else committedRecord("BENCH_DETAIL.json")
        }
        if (committed.nonEmpty) committed
        else try {
          // fallback (fresh clone without the record in HEAD): the
          // checked-out file, accepting its drift risk
          val p = java.nio.file.Paths.get("BENCH_DETAIL.json")
          if (!java.nio.file.Files.isReadable(p)) Map.empty[String, Any]
          else parsePriorRecord(new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
        } catch { case _: Exception => Map.empty[String, Any] }
      }
    val priorTimes: Map[String, Double] = priorRecord.get("queries") match {
      case Some(q: Map[_, _]) => q.asInstanceOf[Map[String, Any]].collect {
        case (k, v: java.lang.Long) => k -> v.toDouble
        case (k, v: java.lang.Double) => k -> v.doubleValue
      }
      case _ => Map.empty[String, Double]
    }
    val slowResMap = slowResults.toMap
    val xscaleExp: Map[String, Double] = xscale.map { case (n, tiny, small) =>
      n -> fitExponents(slowResMap.getOrElse(n, Double.NaN), small, tiny)._2
    }.toMap
    val suspects: Seq[String] =
      if (only.isDefined) Seq.empty
      else slowResults.collect {
        case (n, v) if !v.isNaN &&
          (priorTimes.get(n).exists(p => p > 0.5 && v > 1.8 * p) ||
            xscaleExp.get(n).exists(_ > 1.1)) => n
      }
    val rerunTimes: Map[String, Double] = suspects.flatMap { n =>
      SparkEntry.gateQueries.find(_.name == n).map { q =>
        val times = (1 to reps.max(2)).map { rep =>
          try timed(() => q.fn(spark, sfDir).write.format("noop").mode("overwrite").save())
          catch { case e: Throwable => recordError("rerun", q.name, rep, e); Double.NaN }
        }
        val suiteTime = slowResults.collectFirst { case (`n`, v) => v }.getOrElse(Double.NaN)
        System.err.println(f"[bench] isolation re-measure $n: suite=$suiteTime%.2fs isolated=${times.min}%.2fs")
        n -> times.min
      }
    }.toMap
    val slowFinal = slowResults.map { case (n, v) =>
      n -> rerunTimes.get(n).map(r =>
        if (v.isNaN) r else if (r.isNaN) v else v.min(r)).getOrElse(v)
    }
    val slowFinalMap = slowFinal.toMap
    // exponents recomputed from the re-measured big-SF minima:
    // (name, tTiny, tSmall, exp3pt, expHi)
    val xscaleFinal = xscale.map { case (n, tiny, small) =>
      val big = slowFinalMap.getOrElse(n, Double.NaN)
      val (e3, eHi) = fitExponents(big, small, tiny)
      (n, tiny, small, e3, eHi)
    }
    val xscaleFlagged = xscaleFinal.count(_._5 > 1.3)
    xscaleFinal.filter(_._5 > 1.3).foreach { case (n, tiny, small, e3, eHi) =>
      System.err.println(
        f"[bench] SCALING FLAG $n: exp_hi=$eHi%.2f (3-pt exp=$e3%.2f, small=$small%.2fs, tiny=$tiny%.2fs)")
    }
    // INGEST THROUGHPUT DEFENSE: heap_ingest_mb_s swings 29.9→68.4 MB/s
    // across runs of identical code (r11 run1 vs run2) — min-of-3
    // within one run is not enough when the whole run is loaded. When
    // the reading is >1.5× BELOW the committed record's MB/s, re-run
    // the same dump at the very end of the suite (tiers drained) and
    // take the overall best; all rep times feed a min/max MB/s band in
    // the record so a residual swing reads as noise, not regression.
    // ONE defense for BOTH ingest scale points — the 1× and 10× blocks
    // were near-verbatim copies, and two copies of load-bearing
    // regression criteria drift (a threshold fix landing in one block
    // only would let the two points apply different disciplines).
    def priorMbS(key: String): Option[Double] = priorRecord.get(key) match {
      case Some(v: java.lang.Long) => Some(v.toDouble)
      case Some(v: java.lang.Double) => Some(v.doubleValue)
      case _ => None
    }
    // returns ALL rep times (suite + any isolated re-measure reps);
    // caller takes .min and feeds the whole seq into the record's band
    def defendIngest(label: String, priorKey: String, mb: Double,
        times: Seq[Double], hprof: String, scratch: String,
        rePrefix: String, reReps: Int): Seq[Double] = {
      import graft.heap.HeapDump
      val prior = priorMbS(priorKey)
      val mbS = mb / times.min
      val suspect = prior.exists(p => p > 0 && mbS < p / 1.5)
      if (!suspect) times
      else {
        val extra = (1 to reReps).map { r =>
          val out = java.nio.file.Paths.get(scratch).resolve(s"$rePrefix$r")
          val t = timed(() => new HeapDump(spark, hprof).writeParquet(out.toString))
          deleteRecursively(out)
          t
        }
        System.err.println(f"[bench] $label isolation re-measure: suite=$mbS%.1f MB/s -> isolated=${mb / (times ++ extra).min}%.1f MB/s (committed ${prior.get}%.1f)")
        times ++ extra
      }
    }
    val ingestFinal: (Double, Seq[Double]) =
      if (!ingestSelected || heapIngest._1 <= 0 || only.isDefined)
        (heapIngest._1, heapIngest._5)
      else {
        val all = defendIngest("ingest", "heap_ingest_mb_s", heapIngest._2,
          heapIngest._5, heapIngest._3, heapIngest._4, "pq_re", 3)
        (all.min, all)
      }
    // the 1× scratch (hprof fixture, held until after the re-measure
    // decision above) was previously never deleted — ~0.5 GB left in
    // /tmp per full run
    if (ingestSelected && heapIngest._4.nonEmpty)
      deleteRecursively(java.nio.file.Paths.get(heapIngest._4))
    val ingest10xFinal: Option[(Double, Double, Int, Seq[Double])] =
      ingest10x.map { case (sec, mb, jobs, hprof, dirStr, times) =>
        // finally: the ~1.5 GB hprof fixture (held across the suite
        // for exactly this decision) must drop even when a re-measure
        // rep throws — an exception here previously leaked the whole
        // scratch dir for the host to clean up
        try {
          val all = defendIngest("ingest10x", "heap_ingest10x_mb_s", mb,
            times, hprof, dirStr, "pq10x_re", 2)
          (all.min, mb, jobs, all)
        } finally deleteRecursively(java.nio.file.Paths.get(dirStr))
      }
    val withIngest =
      if (!ingestSelected) fastFinal
      else fastFinal :+ ("q_heap_ingest_export" -> ingestFinal._1)
    val allGates = withIngest ++ slowFinal ++ auxResults
    // A failing gate records NaN per-gate (rendered as null) but must
    // not poison the total — "value":NaN is not valid JSON and breaks
    // the driver's parse. Sum the gates that ran; surface failures via
    // an explicit count instead.
    val failed = allGates.count(_._2.isNaN)
    val total = withIngest.collect { case (_, v) if !v.isNaN => v }.sum
    val slowTotal = slowFinal.collect { case (_, v) if !v.isNaN => v }.sum
    val wall = (System.nanoTime() - wall0) / 1e9
    // heap_ingest_mb / _mb_s make ingest THROUGHPUT machine-comparable
    // round-over-round, not just its wall-time share of the total.
    val ingestKeys =
      if (!ingestSelected) ""
      else {
        // band = MB/s at the slowest and fastest rep across ALL reps
        // (incl. the re-measure): the honest cross-rep noise envelope
        val band =
          if (ingestFinal._2.isEmpty) ""
          else f""""heap_ingest_mb_s_band":[${heapIngest._2 / ingestFinal._2.max}%.1f,${heapIngest._2 / ingestFinal._2.min}%.1f],"""
        f""""heap_ingest_mb":${heapIngest._2}%.1f,"heap_ingest_mb_s":${heapIngest._2 / ingestFinal._1}%.1f,""" +
          s""""heap_ingest_jobs":${heapIngest._6},""" + band +
          ingest10xFinal.map { case (sec, mb, jobs, all) =>
            f""""heap_ingest10x_mb":$mb%.1f,"heap_ingest10x_mb_s":${mb / sec}%.1f,""" +
              f""""heap_ingest10x_mb_s_band":[${mb / all.max}%.1f,${mb / all.min}%.1f],""" +
              s""""heap_ingest10x_jobs":$jobs,"""
          }.getOrElse("")
      }
    def qJson(kvs: Seq[(String, Double)], dp: Int): String = kvs
      .map { case (k, v) => "\"" + k + "\":" + (if (v.isNaN) "null" else s"%.${dp}f".format(v)) }
      .mkString("{", ",", "}")
    // Full per-gate detail goes to a FILE: the stdout line grew past the
    // driver's ~2000-char tail-capture buffer (BENCH_r01..r06 all record
    // parsed:null with the line's head cut mid-key), so the printed line
    // must stay small enough to survive the tail. It carries the totals,
    // ingest throughput, and the 25 slowest gates; BENCH_DETAIL.json in
    // the repo root carries every gate at full precision.
    val auxTotal = auxResults.collect { case (_, v) if !v.isNaN => v }.sum
    // per-gate cross-scale record: the two smaller-SF minima, the
    // 3-point least-squares exponent, the top-segment exponent the
    // flag rule fires on, and the bottom-segment exponent (exp_hi vs
    // exp_lo spread = overhead curvature), so round-over-round diffs
    // of BENCH_DETAIL.json catch a scaling regression even when the
    // absolute times look plausible
    val scalingJson = xscaleFinal
      .map { case (n, tiny, small, e3, eHi) =>
        val tinyPart =
          if (tiny.isNaN) """"t_tiny":null"""
          else {
            val eLo = math.log(small / tiny) /
              logSfRatio(xscaleDir.get, xscaleDir2.get)
            f""""t_tiny":$tiny%.3f,"exp_lo":$eLo%.2f"""
          }
        f""""$n":{$tinyPart,"t_small":$small%.3f,"exp":$e3%.2f,"exp_hi":$eHi%.2f}"""
      }
      .mkString("{", ",", "}")
    sentinel("end")
    // the sentinel block: per-boundary readings plus the spread
    // (max/min) — a spread near 1.0 certifies a quiet run; a boundary
    // reading far above the minimum localizes WHEN the host was loaded
    val sentinelJson = sentinelReadings
      .map { case (l, t) => f""""$l":$t%.3f""" }.mkString("{", ",", "}")
    val sentinelSpread = {
      val ts = sentinelReadings.map(_._2)
      if (ts.isEmpty || ts.min <= 0) 1.0 else ts.max / ts.min
    }
    // the IO axis and the whole-host loadavg, keyed by the same tier
    // boundaries as the CPU sentinel so a driver-vs-builder gap lands
    // on a named axis in-record
    val sentinelIoJson = sentinelIoReadings
      .map { case (l, t) => f""""$l":$t%.3f""" }.mkString("{", ",", "}")
    val sentinelIoSpread = {
      val ts = sentinelIoReadings.map(_._2)
      if (ts.isEmpty || ts.min <= 0) 1.0 else ts.max / ts.min
    }
    val loadavgJson = loadavgReadings
      .map { case (l, v) =>
        s""""$l":""" + (if (v.isNaN) "null" else f"$v%.2f")
      }.mkString("{", ",", "}")
    // lease contention (round 16): the cross-process maintenance lease
    // is load-bearing machinery — waits/reclaims/refusals during the
    // run belong in the record (a healthy single-writer bench run
    // reads all zeros; probes-vs-maintainer contention shows here)
    val leaseJson = graft.operators.CellCommit.leaseStats
      .toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val errorsJson = benchErrors
      .map { case (phase, gate, rep, e) =>
        Json.obj(Seq(
          "phase" -> Json.str(phase), "gate" -> Json.str(gate),
          "rep" -> rep.toString, "class" -> Json.str(e.getClass.getName),
          "msg" -> Json.str(Option(e.getMessage).getOrElse("").take(500))))
      }.mkString("[", ",", "]")
    // phase attribution for the most expensive slow-tier gate: the
    // 3M-node exact-dominator audit records its driver-side phase
    // split (collect / CSR / CHK / sums) so its cost is explainable
    // from the record alone
    val domPhases = graft.heap.HeapAnalysis.lastDominatorPhases
    val domJson =
      if (domPhases.isEmpty) ""
      else s""""dominators_phases":${domPhases.map { case (k, v) =>
        f""""$k":$v%.3f""" }.mkString("{", ",", "}")},"""
    val selfDescribing =
      f""""sentinel":$sentinelJson,"sentinel_spread":$sentinelSpread%.2f,""" +
        f""""sentinel_io":$sentinelIoJson,"sentinel_io_spread":$sentinelIoSpread%.2f,""" +
        s""""loadavg":$loadavgJson,"lease":$leaseJson,""" +
        s""""errors":$errorsJson,"n_errors":${benchErrors.size},""" + domJson
    val detailJson = f"""{"metric":"total","value":$total%.3f,"unit":"sec","failed":$failed,""" +
      selfDescribing +
      f""""slow_total":$slowTotal%.3f,"n_slow":${slowResults.size},""" +
      f""""aux_total":$auxTotal%.3f,"n_aux":${auxResults.size},"queries":${qJson(allGates, 3)},""" +
      (if (xscale.nonEmpty)
        s""""scaling":$scalingJson,"xscale_flagged":$xscaleFlagged,"xscale_sf":"${xscaleDir.get}",""" +
          xscaleDir2.map(d => s""""xscale_sf_tiny":"$d",""").getOrElse("")
      else "") +
      (if (rerunTimes.nonEmpty)
        s""""rerun":${qJson(rerunTimes.toSeq, 3)},"""
      else "") +
      ingestKeys + f""""reps":$reps,"wall_sec":$wall%.1f,"cpus":"$cpus","sf":"$sfDir"}"""
    // a FILTERED run must not clobber the committed full-suite
    // record: BENCH_DETAIL.json is both the round artifact and the
    // isolation re-measure's prior-times source, so partial runs
    // write to BENCH_DETAIL_PARTIAL.json instead — and the summary
    // line's "detail" key must name the file THIS run wrote, not the
    // previous round's full record. A NON-32-CPU run (the driver's
    // low-core scaling pass) likewise writes its own per-core-count
    // file: the r16 driver's c8 rerun overwrote the official 32c
    // per-gate record, which then survived only as a top-25 tail
    // (r16 verdict, What's wrong #2) — now both records coexist.
    val detailName =
      if (only.isDefined) "BENCH_DETAIL_PARTIAL.json"
      else if (cpus != "32") s"BENCH_DETAIL_c$cpus.json"
      else "BENCH_DETAIL.json"
    try {
      val p = java.nio.file.Paths.get(detailName)
      java.nio.file.Files.write(p, detailJson.getBytes("UTF-8"))
      System.err.println(s"[bench] full per-gate detail -> ${p.toAbsolutePath}")
    } catch { case e: Exception => System.err.println(s"[bench] detail write failed: ${e.getMessage}") }
    val top = allGates.sortBy { case (_, v) => if (v.isNaN) Double.MaxValue else -v }.take(25)
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_gates":${allGates.size},"failed":$failed,""" +
      f""""n_errors":${benchErrors.size},"sentinel_spread":$sentinelSpread%.2f,"sentinel_io_spread":$sentinelIoSpread%.2f,""" +
      f""""slow_total":$slowTotal%.3f,"n_slow":${slowResults.size},""" +
      f""""aux_total":$auxTotal%.3f,"n_aux":${auxResults.size},""" +
      (if (xscale.nonEmpty) s""""xscale_flagged":$xscaleFlagged,"n_rerun":${rerunTimes.size},""" else "") +
      ingestKeys +
      f""""reps":$reps,"wall_sec":$wall%.1f,"sf":"$sfDir",""" +
      s""""detail":"$detailName","queries":${qJson(top, 2)}}""")
    spark.stop()
  }
}
