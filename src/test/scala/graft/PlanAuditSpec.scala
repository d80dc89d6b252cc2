package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits: lock in the plan shapes the operators were
  * designed around, so a regression (lost broadcast, lost column pruning,
  * an accidental n²-row exchange) fails CI instead of surfacing as a
  * 100 TB incident. Assertions target stable plan markers, not full plan
  * text. */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q01: parquet scan is column-pruned to the aggregated columns") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("ReadSchema"))
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("l_returnflag") && read.contains("l_quantity"))
    assert(!read.contains("l_comment") && !read.contains("l_shipdate"),
      s"scan reads more than the query needs: $read")
  }

  test("q02/q03: dimension joins broadcast the small side") {
    assert(plan("q02_top_parts").contains("BroadcastHashJoin"))
    val p3 = plan("q03_nation_revenue")
    assert(p3.contains("BroadcastHashJoin"))
  }

  test("doc_dedup_exact: aggregation is map-side partial") {
    val p = plan("doc_dedup_exact")
    assert(p.contains("partial_"), "hash groupBy lost its partial aggregation")
  }

  test("source cap: pruned scan + map-side WindowGroupLimit before each exchange") {
    val p = plan("doc_source_cap")
    // Partial WindowGroupLimit = per-map-task top-cap pruning BEFORE the
    // shuffle — with the salted first pass, no task ever sorts a hot
    // source's full list (the design the salted two-window pass locks)
    assert(p.contains("WindowGroupLimit"), s"lost the group-limit pushdown:\n$p")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      "expected both window passes to carry a group limit")
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("doc_id") && read.contains("source") &&
      !read.contains("text"), s"scan should prune to (doc_id, source): $read")
  }

  test("PQ ADC join scores the compressed codes relation, broadcast queries") {
    val p = plan("emb_ann_pq")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"queries side must broadcast:\n$p")
  }

  test("broadcast-index kNN adds NO shuffle exchange of its own") {
    // deterministic in-plan series (range + transform): the kNN operator's
    // own plan contribution must be exchange-free — the n² pair space
    // never becomes rows, so there is nothing to shuffle
    val series = spark.range(40).select(col("id").as("series_id"),
      transform(sequence(lit(0), lit(31)),
        t => sin(col("id") * t.cast("double") * 0.1)).as("values"))
    val p = graft.operators.Cdist.knnDtwPruned(series, series, k = 3, radius = 4)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"exchange leaked into kNN plan:\n$p")
  }

  test("native DTW expression stays inside WholeStageCodegen") {
    import graft.functions.NativeExpressions
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
    val p = e.select(NativeExpressions.dtwNative(col("v"), col("v")))
      .queryExecution.executedPlan.toString
    // codegen stages print as "*(n) Project…"; a CodegenFallback
    // expression would force a plain (un-starred) Project
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("Project")),
      s"codegen span missing:\n$p")
  }

  test("embedding pair joins use the native cosine/dot, not a boxing UDF") {
    // the hot expression of every emb_* pair join must be the native
    // codegen'd vec_cosine_native / vec_dot_native — a ScalaUDF here
    // re-introduces per-pair boxed Seq conversion (the measured GC bomb)
    Seq("emb_knn_cosine", "emb_dedup_cosine").foreach { q =>
      val p = plan(q)
      assert(p.contains("vec_cosine_native") || p.contains("vec_dot_native"),
        s"$q lost the native expression:\n$p")
      assert(!p.contains("ScalaUDF"), // l2-normalize runs pre-join, but it
        // must be materialized by the checkpoint, never inside the pair loop
        s"$q evaluates a Scala UDF inside the join plan:\n$p")
    }
  }

  test("stratified sample pushes the lang scan down and adds no shuffle") {
    val p = plan("doc_sample_stratified")
    assert(!p.contains("Exchange"), s"sample plan must be scan+filter:\n$p")
    assert(p.contains("md5_hash60_native"), s"portable hash missing:\n$p")
  }

  test("ts_hourly: single shuffle for the event-time aggregation") {
    val p = plan("ts_hourly")
    val exchanges = p.linesIterator.count(l => l.contains("Exchange") &&
      !l.contains("ReusedExchange"))
    assert(exchanges == 1, s"hourly agg should shuffle exactly once:\n$p")
  }

  test("contamination joins the eval shingles broadcast, never sort-merge") {
    val p = plan("doc_contamination")
    assert(p.contains("BroadcastHashJoin"), s"eval side lost its broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus shingles must not be shuffled for the join:\n$p")
  }

  test("shapelet transform is broadcast + map: no shuffle exchange") {
    import spark.implicits._
    val df = (0 until 8).map(i =>
      (i.toLong, Array.tabulate(16)(t => math.sin(t + i).toDouble)))
      .toDF("series_id", "values")
    val p = graft.ml.Shapelets.transform(df, Array(Array(0.1, 0.2, 0.3)))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"exchange leaked into shapelet transform:\n$p")
  }

  test("df-cap is a partial-agg groupBy + broadcast anti-join, never a window") {
    import spark.implicits._
    // a Window.partitionBy(sh) here would co-locate every row of a hot
    // shingle in one task BEFORE the cap filter — the skew shape this
    // operator exists to avoid. Lock: no Window, hot set broadcast,
    // df groupBy keeps its map-side partial.
    val stream = (0 until 50).flatMap(i => Seq((i.toLong, "the quick fox"),
      (i.toLong, s"unique shingle $i"))).toDF("doc_id", "sh")
    val p = graft.operators.Dedup.dfCapped(stream, maxDf = 10)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"df-cap regressed to a window:\n$p")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"hot-set anti-join lost its broadcast:\n$p")
    // the hot-set groupBy now materializes inside a localCheckpoint, so
    // its aggregation is not in the final plan above — audit the same
    // shape dfCapped builds (groupBy df + filter) for map-side partials
    val hotPlan = stream.groupBy("sh")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("df"))
      .where(org.apache.spark.sql.functions.col("df") > 10)
      .queryExecution.executedPlan.toString
    assert(hotPlan.contains("partial_"), s"df count lost map-side partial agg:\n$hotPlan")
    assert(!hotPlan.contains("Window"), s"df count regressed to a window:\n$hotPlan")
  }

  test("Nystrom SVC predict is a pure map: no shuffle exchange") {
    import spark.implicits._
    val df = (0 until 12).map { i =>
      (i.toLong, Array.tabulate(12)(t =>
        (i % 2) * 3.0 + math.sin(t / 2.0 + i * 0.01)), (i % 2).toString)
    }.toDF("series_id", "values", "label")
    val model = graft.ml.TimeSeriesSVC.fitNystrom(df, m = 4, seed = 1, maxIter = 5)
    val p = graft.ml.TimeSeriesSVC.predictNystrom(model, df.select("series_id", "values"))
      .queryExecution.executedPlan.toString
    // the O(n·m) feature map and the per-class margins are row-local;
    // scoring 10⁹ probes must not shuffle anything
    assert(!p.contains("Exchange"), s"exchange leaked into Nystrom predict:\n$p")
  }

  test("sequence packing: exactly one exchange (hash by source), pruned scan") {
    val p = plan("doc_pack_greedy")
    // the design is ONE shuffle + a streaming per-partition scan; a
    // second exchange would mean the mapPartitions state machine no
    // longer sits on the source-hashed, locally-sorted stream
    assert("Exchange".r.findAllIn(p).size == 1,
      s"packing must shuffle exactly once (hash by source):\n$p")
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("source") && read.contains("doc_id") && read.contains("text"))
  }

  test("SQ8 ANN: encode+ADC stay codegen'd expressions, queries broadcast") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val p = graft.operators.Ann.sqTopK(
        e.where(col("vec_id") >= 10), e.where(col("vec_id") < 10), k = 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"queries side must broadcast:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.toLowerCase.contains("scalaudf"),
      s"SQ scoring must be built-in expressions, not a UDF:\n$p")
    // one exchange total: the final per-query top-k partitioning — the
    // encode+score scan itself must stay a pure map over the candidates
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"SQ scan must add no exchange beyond the top-k window:\n$p")
    assert(p.contains("WindowGroupLimit"),
      "top-k lost its partial group-limit pushdown")
  }

  test("span dedup: both groupBys partial; no window over the corpus") {
    val p = plan("doc_span_dedup")
    assert(p.contains("partial_"), "span df lost map-side partial aggregation")
    // reassembly must be a grouped agg (state bounded by one doc's
    // spans), never a corpus-wide Window sort
    assert(!p.contains("Window"), s"unexpected window in span dedup:\n$p")
  }

  test("sketch/retrieval family: broadcasts + partial aggs, no corpus-scale windows") {
    // BM25: query-term and df tables broadcast; tf/score groupBys keep
    // map-side partials; no Window over the corpus
    val bm = plan("doc_bm25_topk")
    assert(bm.contains("BroadcastHashJoin"), "BM25 lost its query-term broadcast")
    assert(bm.contains("partial_"), "BM25 lost map-side partial aggregation")
    assert(!bm.contains("Window"), s"BM25 regressed to a window sort:\n$bm")
    // CMS / HLL: fixed-size summary relations broadcast back, corpus
    // aggregations partial
    Seq("doc_cms_heavy", "doc_hll_distinct").foreach { q =>
      val p = plan(q)
      assert(p.contains("partial_"), s"$q lost map-side partial aggregation")
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
        s"$q lost its summary-relation broadcast:\n$p")
      assert(!p.toLowerCase.contains("scalaudf"), s"$q uses a UDF:\n$p")
    }
    // DSIR scoring (r17): the d-row model is frozen into literals and
    // each doc is scored by a per-row expression over its native
    // hashed-BoW histogram — the SCORING plan must carry NO exchange,
    // no join and no UDF at all (the former shape shuffled the corpus
    // into (doc,bucket) groups and again into groupBy(doc_id))
    val dw = plan("doc_importance_weights")
    assert(!dw.contains("Exchange"),
      s"doc_importance_weights scoring regressed to a shuffle:\n$dw")
    assert(dw.contains("hashed_bow_native"),
      s"doc_importance_weights lost the native histogram projection:\n$dw")
    assert(!dw.toLowerCase.contains("scalaudf"), s"doc_importance_weights uses a UDF:\n$dw")
  }

  test("semdedup/bloom: equi-joins + broadcasts, no nested-loop pair blowup") {
    val p = plan("emb_semdedup")
    // the within-cluster pair join MUST be an equi-join on cell —
    // a nested-loop here is the n² blowup the clustering exists to avoid
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"semdedup pair join lost its cell equi-join:\n$p")
    assert(!p.contains("REPARTITION_BY"), "semdedup pinned a shuffle (AQE skew split disabled)")
    val b = plan("doc_bloom_contamination")
    assert(b.contains("BroadcastHashJoin"), "bloom bits lost their broadcast")
    assert(b.contains("partial_"), "bloom counts lost map-side partial agg")
  }

  test("inverted-index joins leave AQE skew-join applicable (no manual repartition)") {
    // AQE can only split a skewed join partition when the exchange was
    // planner-inserted (ENSURE_REQUIREMENTS); a user repartition(col)
    // pins the partitioning (REPARTITION_BY_COL) and AQE must respect
    // it, defeating runtime skew splitting. The inverted-index
    // pipelines rely on AQE as the residual defense for a hot shingle
    // that slips under the df-cap — lock that none of them pin their
    // shuffles. (packSequences' repartition(source) is deliberate and
    // exempt: its per-source scan REQUIRES all rows of a source in one
    // partition, and sourceCap's salting handles the hot-domain case.)
    Seq("doc_jaccard_pairs", "doc_containment_pairs", "doc_minhash_pairs")
      .foreach { q =>
        val p = plan(q)
        assert(!p.contains("REPARTITION_BY"),
          s"$q pins a shuffle (REPARTITION_BY_*), which disables AQE skew-join:\n" +
            p.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
      }
  }

  test("sketched containment: every join is an equi-join, partial aggs throughout") {
    // Phase 1 (sampled index self-join) and phase 2 (candidate
    // recount) must both stay equi-joins — a nested-loop anywhere
    // reintroduces exactly the pair blowup the sketch exists to prune.
    // checkpoint=false: production localCheckpoints truncate the
    // visible lineage; the audit needs the whole plan.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = graft.operators.Dedup
      .containmentPairsSketched(docs, threshold = 0.6, checkpoint = false)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"sketched containment grew a non-equi join:\n$p")
    assert(p.contains("partial_"),
      "sampled-intersection groupBy lost map-side partial aggregation")
    assert(!p.contains("REPARTITION_BY"),
      "sketched containment pinned a shuffle (AQE skew split disabled)")
  }

  test("weighted sample: top-k is a TakeOrdered, never a full corpus sort") {
    val p = plan("doc_sample_weighted")
    assert(p.contains("TakeOrderedAndProject"),
      s"A-Res top-k lost its TakeOrdered plan:\n$p")
    assert(!p.contains("GlobalSort") && !p.contains("\nSort "),
      s"weighted sample grew a full sort:\n$p")
  }

  test("pii redact: single map-only stage, no exchange") {
    val p = plan("doc_pii_redact")
    assert(!p.contains("Exchange"),
      s"per-row redaction chain grew a shuffle:\n$p")
  }

  test("tiled matrix profile: segment joins are equi-joins; min fold is partial") {
    import spark.implicits._
    val ts = Array.tabulate(400)(t => math.sin(t * 0.2))
    val df = spark.createDataset(ts.toSeq.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }).toDF("idx", "v")
    val q = graft.operators.MatrixProfileDist.matrixProfileTiled(spark, df, 8, blockSize = 64)
    val p = q.queryExecution.executedPlan.toString
    // the tile-pair build is a Range + explode(sequence) — NO join —
    // so every join left in the plan is a segment equi-join on the
    // block id; any nested-loop/cartesian anywhere is a regression
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"nested loop in tiled MP plan:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in tiled MP plan:\n$p")
    // the per-row min over tile partials must combine map-side: the
    // shuffle carries one pre-reduced row per (row, task), not every
    // tile partial
    assert(p.contains("partial_min") || p.contains("partial_"),
      s"partial-min fold lost its map-side combine:\n$p")
  }

  test("IVF candidate joins broadcast the queries side (ivfTopK == ivfPqTopK shape)") {
    // VERDICT r12 #6: ivfTopK joined qProbes without an explicit
    // broadcast while ivfPqTopK broadcast it — AQE rescued local runs,
    // but a stats misestimate at fleet scale could shuffle the corpus
    // side. Lock: the cell-keyed candidate join is a BroadcastHashJoin
    // in BOTH routes.
    for (name <- Seq("emb_ann_ivf", "emb_ann_ivfpq")) {
      val p = plan(name)
      assert("BroadcastHashJoin \\[(knownfloatingpointnormalized\\()?cell".r
          .findFirstIn(p).isDefined || p.contains("BroadcastHashJoin [cell"),
        s"$name: cell join is not broadcast-hash on the queries side:\n$p")
    }
  }

  test("lshTopK with pinned banding runs NO job at call time (guard folded into scan)") {
    // VERDICT r12 #5: the old hot-bucket guard ran a groupBy-count +
    // count() action on every call — two extra jobs even when no bucket
    // was hot. The cap is now a window count inside the candidate scan;
    // constructing the DataFrame must be purely declarative.
    import graft.operators.Ann
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val queries = e.where(col("vec_id") < 10)
    val cands = e.where(col("vec_id") >= 10)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val names = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        names.add(js.jobId + ":" + js.stageInfos.map(_.name).mkString("|"))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // the listener bus is async: earlier tests' job events can still be
      // queued. Run a sentinel action, then wait for the counter to go
      // QUIET (no new events for a full second) before baselining.
      def quiesce(): Int = {
        // RDD-level sentinel: exactly ONE job, no AQE stage splitting
        // (range(1).count() through SQL is 2 jobs under AQE)
        spark.sparkContext.parallelize(Seq(1), 1).count()
        var last = -1
        var stableSince = System.nanoTime()
        val deadline = System.nanoTime() + 15000000000L
        while (System.nanoTime() < deadline &&
               (jobs.get() != last || System.nanoTime() - stableSince < 1000000000L)) {
          if (jobs.get() != last) { last = jobs.get(); stableSince = System.nanoTime() }
          Thread.sleep(50)
        }
        jobs.get()
      }
      val base = quiesce()
      val df = Ann.lshTopK(cands, queries, 5, dim = 64, nBits = 16, nBands = 4)
      val after = quiesce()
      assert(after == base + 1, // the +1 is the second quiesce's sentinel
        s"lshTopK construction ran ${after - base - 1} eager job(s): " +
          names.toArray.mkString("[", ", ", "]"))
      // and the capped scan still produces the ranked output lazily
      assert(df.columns.contains("rank"))
      // VERDICT r13 #6: the AUTO route with an explicit size hint must
      // be just as job-free — callers that know the corpus size (the
      // cosine router does) skip the count() fallback entirely
      val base2 = quiesce()
      val dfAuto = Ann.lshTopK(cands, queries, 5, dim = 64, n = 50L)
      val after2 = quiesce()
      assert(after2 == base2 + 1,
        s"lshTopK auto-with-hint ran ${after2 - base2 - 1} eager job(s): " +
          names.toArray.mkString("[", ", ", "]"))
      assert(dfAuto.columns.contains("rank"))
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
