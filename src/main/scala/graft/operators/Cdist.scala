package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TsFunctions

/** All-pairs metric θ-join machinery — the reference's only join shape
  * (`/root/reference/tslearn/metrics/utils.py:8-85`, SURVEY §2.4).
  *
  * Scale design: the pair space is the product of the two inputs; the
  * small side (centroids, probes, shapelets — almost always ≪ the data)
  * is broadcast so NO shuffle of the big side happens. Self-joins compute
  * the upper triangle only (`a.id <= b.id`) and mirror, halving kernel
  * work exactly like `_cdist_generic`'s k=0/1 triangle optimization.
  */
object Cdist {

  /** Cross distance: every row of `left` × every row of `right`, distance
    * via `metric(leftSeries, rightSeries)`. `right` is broadcast — callers
    * put the smaller side there. Output: (left_id, right_id, dist). */
  def cross(left: DataFrame, right: DataFrame, metric: (Column, Column) => Column,
            seriesCol: String = "values"): DataFrame = {
    val l = left.select(col("series_id").as("left_id"), col(seriesCol).as("lv"))
    val r = right.select(col("series_id").as("right_id"), col(seriesCol).as("rv"))
    l.crossJoin(broadcast(r))
      .select(col("left_id"), col("right_id"), metric(col("lv"), col("rv")).as("dist"))
  }

  /** Symmetric self cross-distance, upper-triangle + mirror. The triangle
    * join halves the O(n²) kernel evaluations; the mirror is a cheap
    * column swap union (no recompute). Diagonal dist is 0 for true
    * metrics; pass computeDiagonal=false to skip it (as `compute_diagonal`
    * does). */
  def selfCross(ds: DataFrame, metric: (Column, Column) => Column,
                seriesCol: String = "values", computeDiagonal: Boolean = true): DataFrame = {
    val l = ds.select(col("series_id").as("left_id"), col(seriesCol).as("lv"))
    val r = ds.select(col("series_id").as("right_id"), col(seriesCol).as("rv"))
    val upper = l.crossJoin(broadcast(r))
      .where(col("left_id") < col("right_id"))
      .select(col("left_id"), col("right_id"), metric(col("lv"), col("rv")).as("dist"))
    val mirrored = upper.select(col("right_id").as("left_id"), col("left_id").as("right_id"), col("dist"))
    val diag =
      if (computeDiagonal)
        ds.select(col("series_id").as("left_id"), col("series_id").as("right_id"), lit(0.0).as("dist"))
      else ds.sparkSession.emptyDataFrame
        .select(lit(0L).as("left_id"), lit(0L).as("right_id"), lit(0.0).as("dist")).limit(0)
    upper.unionAll(mirrored).unionAll(diag)
  }

  /** Upper-triangle pairs (left_id < right_id) of the block-partitioned
    * self-join: each row is hashed to one of `blocks` buckets and
    * replicated to the triangle of bucket pairs, so pairs form via an
    * equi-join on the (bucket, bucket) key — shuffle volume is
    * `blocks`·|ds| rows, peak task input 2·|ds|/`blocks` rows, and NO
    * BroadcastExchange of the full relation. Requires a symmetric metric.
    * Pick `blocks` ≈ √(2·parallelism). */
  def selfBlockedUpper(ds: DataFrame, metric: (Column, Column) => Column, blocks: Int,
                       seriesCol: String = "values"): DataFrame = {
    require(blocks >= 1, "blocks must be >= 1")
    val withBlk = ds.select(col("series_id"), col(seriesCol))
      .withColumn("blk", pmod(xxhash64(col("series_id")), lit(blocks)).cast("int"))
    // a row in bucket b takes the LEFT role for pair-blocks (b, j>=b) and
    // the RIGHT role for (i<=b, b): every unordered bucket pair meets once
    val lrep = withBlk.select(col("series_id").as("left_id"),
        col(seriesCol).as("lv"), col("blk").as("pi"))
      .withColumn("pj", explode(sequence(col("pi"), lit(blocks - 1))))
    val rrep = withBlk.select(col("series_id").as("right_id"),
        col(seriesCol).as("rv"), col("blk").as("pj"))
      .withColumn("pi", explode(sequence(lit(0), col("pj"))))
    // shuffle-hash hint: this path exists precisely because the input
    // exceeds broadcast size, so never let the planner's size estimate
    // pick BroadcastHashJoin (sort order is useless here — hash beats merge)
    val joined = lrep.join(rrep.hint("shuffle_hash"), Seq("pi", "pj"))
    // same-bucket pairs: triangle filter; cross-bucket pairs appear exactly
    // once with arbitrary id order — normalize (metric is symmetric)
    val samePairs = joined.where(col("pi") === col("pj") && col("left_id") < col("right_id"))
      .select(col("left_id"), col("right_id"), metric(col("lv"), col("rv")).as("dist"))
    val crossPairs = joined.where(col("pi") =!= col("pj"))
      .select(least(col("left_id"), col("right_id")).as("left_id"),
        greatest(col("left_id"), col("right_id")).as("right_id"),
        metric(col("lv"), col("rv")).as("dist"))
    samePairs.unionAll(crossPairs)
  }

  /** Block-partitioned symmetric self cross-distance for inputs too large
    * to broadcast — [[selfBlockedUpper]] plus the mirror and diagonal.
    * Same output contract as [[selfCross]]. */
  def selfCrossBlocked(ds: DataFrame, metric: (Column, Column) => Column, blocks: Int,
                       seriesCol: String = "values",
                       computeDiagonal: Boolean = true): DataFrame = {
    val upper = selfBlockedUpper(ds, metric, blocks, seriesCol)
    val mirrored = upper.select(col("right_id").as("left_id"),
      col("left_id").as("right_id"), col("dist"))
    val diag =
      if (computeDiagonal)
        ds.select(col("series_id").as("left_id"), col("series_id").as("right_id"), lit(0.0).as("dist"))
      else ds.sparkSession.emptyDataFrame
        .select(lit(0L).as("left_id"), lit(0L).as("right_id"), lit(0.0).as("dist")).limit(0)
    upper.unionAll(mirrored).unionAll(diag)
  }

  /** Normalized soft-DTW cross-distance:
    * D(x,y) − ½(D(x,x) + D(y,y)) — `cdist_soft_dtw_normalized`
    * (`softdtw_variants.py:451-605`). The self-distances are computed
    * once per side and joined back (the reference's diagonal reuse). */
  def softDtwNormalized(left: DataFrame, right: DataFrame, gamma: Double,
                        seriesCol: String = "values"): DataFrame = {
    import graft.functions.TsFunctions
    val lSelf = left.select(col("series_id").as("left_id"),
      col(seriesCol).as("lv"),
      TsFunctions.softDtwUdf(col(seriesCol), col(seriesCol), lit(gamma)).as("l_self"))
    val rSelf = right.select(col("series_id").as("right_id"),
      col(seriesCol).as("rv"),
      TsFunctions.softDtwUdf(col(seriesCol), col(seriesCol), lit(gamma)).as("r_self"))
    lSelf.crossJoin(broadcast(rSelf))
      .select(col("left_id"), col("right_id"),
        (TsFunctions.softDtwUdf(col("lv"), col("rv"), lit(gamma))
          - (col("l_self") + col("r_self")) / 2).as("dist"))
  }

  /** k-NN: for each probe, the k nearest train series under `metric` —
    * `neighbors/neighbors.py:81-169`. crossJoin(broadcast(train)) + window
    * top-k; ties broken by train id for determinism. */
  def knn(probes: DataFrame, train: DataFrame, k: Int,
          metric: (Column, Column) => Column, seriesCol: String = "values"): DataFrame = {
    val d = cross(probes, train, metric, seriesCol)
    val w = Window.partitionBy(col("left_id")).orderBy(col("dist").asc, col("right_id").asc)
    d.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("left_id").as("probe_id"), col("rank"), col("right_id").as("neighbor_id"), col("dist"))
  }

  /** DTW k-NN with LB_Keogh pre-pruning (equal-length series required for
    * the bound) — the reference's lower-bound optimization
    * (`dtw_variants.py:1224-1296`) as a pre-join filter: the cheap O(n)
    * bound prunes candidates before the O(n²) DTW runs. `factor` keeps
    * k·factor candidates per probe by LB before the exact metric.
    *
    * Guarded dispatch: up to `maxIndexRows` train rows the whole
    * (id, series, envelope) index is broadcast and the plan is
    * exchange-free (PlanAuditSpec-locked). Beyond that — the driver-memory
    * ceiling the broadcast index would otherwise OOM on at a 100× train
    * scale-up — it degrades to [[knnDtwBlocked]], which shuffles the train
    * side into block-local indexes and produces IDENTICAL output. */
  def knnDtwPruned(probes: DataFrame, train: DataFrame, k: Int, radius: Int,
                   factor: Int = 4, seriesCol: String = "values",
                   maxIndexRows: Long = 100000, blocks: Int = 16): DataFrame = {
    // limit+count short-circuits: answers "more than maxIndexRows?" without
    // scanning the full relation; the +1 saturates instead of overflowing
    // (maxIndexRows = Long.MaxValue must mean "never blocked", not a
    // wrapped-negative limit(0))
    val cap = if (maxIndexRows >= Int.MaxValue - 1L) Int.MaxValue
              else (maxIndexRows + 1).toInt
    val over = train.select(col("series_id")).limit(cap).count() > maxIndexRows
    if (over) knnDtwBlocked(probes, train, k, radius, factor, blocks, seriesCol)
    else knnDtwBroadcastIndex(probes, train, k, radius, factor, seriesCol)
  }

  private def knnDtwBroadcastIndex(probes: DataFrame, train: DataFrame, k: Int, radius: Int,
                                   factor: Int, seriesCol: String): DataFrame = {
    // The train side was ALWAYS the broadcast side of this join — so skip
    // the pair-row materialization entirely: broadcast the (id, series,
    // envelope) index once and run the whole LB-prune → DTW → top-k per
    // probe inside one kernel call per probe row. Zero shuffles, no n²
    // row stream; each executor scans the index with O(sz) bounds and runs
    // the O(sz·radius) DTW only for the k·factor LB survivors. Envelopes
    // are precomputed once per train series (O(sz·radius) each), not per
    // pair. Same candidate-selection semantics as the former two-window
    // formulation: k·factor by (lb, id) asc, then k by (dist, id) asc.
    val spark = probes.sparkSession
    import spark.implicits._
    val index: Array[(Long, Array[Double], Array[Double], Array[Double])] =
      train.select(col("series_id").cast("long"), col(seriesCol).cast("array<double>"),
          TsFunctions.envelopeUdf(col(seriesCol), lit(radius)).as("env"))
        .select(col("series_id"), col("values"), col("env._1"), col("env._2"))
        .as[(Long, Array[Double], Array[Double], Array[Double])]
        .collect()
        .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(index)
    val kf = k * factor
    val knnUdf = udf((lv: scala.collection.Seq[Double]) => {
      val q = lv.toArray
      val idx = bc.value
      // pass 1: LB_Keogh against every train envelope, keep k·factor
      val lbs = new Array[Double](idx.length)
      var i = 0
      while (i < idx.length) {
        // LB_Keogh is UNDEFINED for unequal lengths (the reference raises,
        // `dtw_variants.py:1248-1251`): a silent min-length walk would be
        // a bound of NOTHING and prune true neighbors. Reject loudly.
        require(idx(i)._3.length == q.length,
          s"LB_Keogh requires equal-length series (probe sz=${q.length}, " +
            s"train id=${idx(i)._1} sz=${idx(i)._3.length}); " +
            "use Cdist.knnDtwRagged for variable-length input")
        lbs(i) = graft.kernels.Kernels.lbKeoghEnv(q, idx(i)._3, idx(i)._4)
        i += 1
      }
      val cand = (0 until idx.length).sortBy(i => (lbs(i), idx(i)._1)).take(kf)
      // pass 2: the kth-best cascade over the SAME candidate set
      cascade(q, cand.map(i => (lbs(i), idx(i)._1, idx(i)._2)), k, radius)
    })
    probes.select(col("series_id").as("probe_id"),
        posexplode(knnUdf(col(seriesCol))).as(Seq("rank0", "hit")))
      .select(col("probe_id"), (col("rank0") + 1).as("rank"),
        col("hit._1").as("neighbor_id"), col("hit._2").as("dist"))
  }

  /** LB-ordered k-slot early-abandon cascade — shared pass 2 of both
    * kNN paths. `cands` must be sorted ascending (lb, id); once the
    * k-slot buffer fills, a candidate whose LB strictly exceeds the
    * kth-best distance is skipped outright (dist ≥ lb), and the DP of
    * a survivor abandons past that bound ([[Kernels.dtwFlatEA]]).
    * Strict (>) comparisons everywhere, so a candidate TYING the kth
    * best is still computed exactly and (dist, id) tie-ranking is
    * bit-identical to the exhaustive pass it replaces. */
  private[graft] def cascade(q: Array[Double],
                             cands: scala.collection.Seq[(Double, Long, Array[Double])],
                             k: Int, radius: Int): Array[(Long, Double)] = {
    val ids = new Array[Long](k)
    val ds = new Array[Double](k)
    var n = 0
    cands.foreach { case (lb, id, tv) =>
      val bsf = if (n == k) ds(k - 1) else Double.PositiveInfinity
      if (!(n == k && lb > bsf)) {
        val d = graft.kernels.Kernels.dtwFlatEA(q, tv, radius, bsf)
        if (n < k || d < ds(k - 1) || (d == ds(k - 1) && id < ids(k - 1))) {
          var p = math.min(n, k - 1)
          while (p > 0 && (ds(p - 1) > d || (ds(p - 1) == d && ids(p - 1) > id))) {
            ds(p) = ds(p - 1); ids(p) = ids(p - 1); p -= 1
          }
          ds(p) = d; ids(p) = id
          if (n < k) n += 1
        }
      }
    }
    (0 until n).map(i => (ids(i), ds(i))).toArray
  }

  /** Partitioned-index DTW k-NN for train sides too large to broadcast.
    *
    * Phase 1 is LB-only: the train side's (id, envelope) index is hashed
    * into `blocks` grouped rows (series stay OUT of the index — they are
    * re-joined for the winners only); probes replicate `blocks`× and
    * equi-join — shuffle volume is blocks·|probes| + |train| rows, never
    * a pair-space stream and never a full-relation broadcast. The global
    * merge re-slices the per-block LB survivors to the k·factor best by
    * (lb, id) — bit-identical candidate selection to the broadcast
    * path's. Phase 2 equi-joins ONLY those winners' series back by id,
    * regroups per probe, and runs the same LB-ordered early-abandon
    * [[cascade]] as the broadcast path: exact DTW work is ≤ k·factor
    * DPs per probe (it was blocks·k·factor before the two-phase split),
    * each abandoning at the running kth-best. */
  private[graft] def knnDtwBlocked(probes: DataFrame, train: DataFrame, k: Int, radius: Int,
                                   factor: Int = 4, blocks: Int = 16,
                                   seriesCol: String = "values"): DataFrame = {
    require(blocks >= 1, "blocks must be >= 1")
    val kf = k * factor
    // salt the (small) index side: `blocks` alone is too few join keys
    // to occupy a fleet — without it the tile scan ran on ≤`blocks`
    // tasks regardless of cores (measured: 5 busy threads of 32 at the
    // sf1 octave). Each block row replicates `salt`×; a probe chunk
    // joins exactly the replica at chk % salt, so every tile pair still
    // meets exactly once, over blocks·salt ≥ 4·parallelism keys.
    val salt = math.max(1,
      (4 * train.sparkSession.sparkContext.defaultParallelism + blocks - 1) / blocks)
    val tEnv = train
      .select(col("series_id").cast("long").as("id"),
        TsFunctions.envelopeUdf(col(seriesCol), lit(radius)).as("env"))
      .withColumn("blk", pmod(xxhash64(col("id")), lit(blocks)).cast("int"))
      .groupBy("blk")
      .agg(collect_list(struct(col("id").as("_1"),
        col("env._1").as("_2"), col("env._2").as("_3"))).as("idx"))
      .withColumn("slt", explode(sequence(lit(0), lit(salt - 1))))
    // probes tile into chunks so one task call scans (chunk × block):
    // the block index deserializes ONCE per tile pair, not once per
    // probe row — per-row UDF decode of a thousand-entry struct array
    // was the measured bottleneck at the sf1 octave (5 effective
    // threads, minutes of pure deserialization)
    val chunks = math.max(32,
      probes.sparkSession.sparkContext.defaultParallelism * 4)
    val pChunks = probes
      .select(col("series_id").cast("long").as("probe_id"),
        col(seriesCol).cast("array<double>").as("q"))
      .withColumn("chk", pmod(xxhash64(col("probe_id")), lit(chunks)).cast("int"))
      .groupBy("chk")
      .agg(collect_list(struct(col("probe_id").as("_1"), col("q").as("_2"))).as("ps"))
      .withColumn("blk", explode(sequence(lit(0), lit(blocks - 1))))
      .withColumn("slt", pmod(col("chk"), lit(salt)).cast("int"))
    // per-(tile × block) survivors as (probe_id, lb, id) — struct field
    // ORDER after probe_id is the merge key: array_sort on (_1=lb,
    // _2=id) reproduces the broadcast path's global candidate selection
    val lbUdf = udf((ps: scala.collection.Seq[(Long, scala.collection.Seq[Double])],
                     idx: scala.collection.Seq[(Long, scala.collection.Seq[Double],
                       scala.collection.Seq[Double])]) => {
      // ARRAYS, not the converter's Seq: the deserialized Seq can be a
      // linked list, and an O(i) apply inside the sort comparator turns
      // the per-probe top-kf into O(n² log n) (measured: every executor
      // thread stuck in List.drop at the sf1 octave)
      val index = idx.iterator.map(r => (r._1, r._2.toArray, r._3.toArray)).toArray
      val lbs = new Array[Double](index.length)
      ps.iterator.flatMap { case (pid, q) =>
        val qa = q.toArray
        var i = 0
        while (i < index.length) {
          // same equal-length contract as the broadcast route: LB_Keogh
          // on sz1 != sz2 is not a lower bound (`dtw_variants.py:1248-1251`)
          require(index(i)._2.length == qa.length,
            s"LB_Keogh requires equal-length series (probe sz=${qa.length}, " +
              s"train id=${index(i)._1} sz=${index(i)._2.length}); " +
              "use Cdist.knnDtwRagged for variable-length input")
          lbs(i) = graft.kernels.Kernels.lbKeoghEnv(qa, index(i)._2, index(i)._3)
          i += 1
        }
        (0 until index.length).sortBy(i => (lbs(i), index(i)._1)).take(kf)
          .map(i => (pid, lbs(i), index(i)._1))
      }.toArray
    })
    // shuffle-hash: this path exists because train exceeds broadcast size
    val winners = pChunks.join(tEnv.hint("shuffle_hash"), Seq("blk", "slt"))
      .select(explode(lbUdf(col("ps"), col("idx"))).as("c"))
      .select(col("c._1").as("probe_id"),
        struct(col("c._2").as("_1"), col("c._3").as("_2")).as("c"))
      .groupBy("probe_id")
      .agg(slice(array_sort(collect_list(col("c"))), 1, kf).as("cands"))
      .select(col("probe_id"), explode(col("cands")).as("c"))
      .select(col("probe_id"), col("c._1").as("lb"), col("c._2").as("id"))
    val cascadeUdf = udf((q: scala.collection.Seq[Double],
                          cs: scala.collection.Seq[(Double, Long, scala.collection.Seq[Double])]) => {
      val qa = q.toArray
      cascade(qa,
        cs.sortBy(r => (r._1, r._2)).map(r => (r._1, r._2, r._3.toArray)),
        k, radius)
    })
    // shuffle_hash on both rejoins: this path exists because train (and
    // possibly probes) exceed broadcast size — never let a toy input
    // bait Catalyst into a broadcast the real scale can't afford
    winners
      .join(train.select(col("series_id").cast("long").as("id"),
        col(seriesCol).cast("array<double>").as("tv")).hint("shuffle_hash"), Seq("id"))
      .groupBy("probe_id")
      .agg(collect_list(struct(col("lb").as("_1"), col("id").as("_2"),
        col("tv").as("_3"))).as("cs"))
      .join(probes.select(col("series_id").cast("long").as("probe_id"),
        col(seriesCol).cast("array<double>").as("q")).hint("shuffle_hash"), Seq("probe_id"))
      .select(col("probe_id"),
        posexplode(cascadeUdf(col("q"), col("cs"))).as(Seq("rank0", "hit")))
      .select(col("probe_id"), (col("rank0") + 1).as("rank"),
        col("hit._1").as("neighbor_id"), col("hit._2").as("dist"))
  }

  /** Exact DTW k-NN for RAGGED input (sz1 ≠ sz2) — the prune-BYPASS
    * route. LB_Keogh is undefined for unequal lengths (the reference
    * raises, `dtw_variants.py:1248-1251`; VARIABLE_LENGTH_METRICS
    * admits dtw itself, `metrics/__init__.py:29`), so there is no cheap
    * bound to select candidates with: every (probe, train) pair enters
    * the k-slot cascade with lb = 0 — the envelope SKIP is gone, but
    * the mid-DP early abandon survives ([[Kernels.dtwFlatEA]] at the
    * running kth-best cutoff), and tie-ranking stays (dist, id)
    * bit-identical to an exhaustive pass. radius < 0 = unconstrained
    * DTW (Sakoe-Chiba on ragged pairs widens the band by |sz1−sz2|,
    * a different semantics — callers opt in explicitly).
    *
    * Same scale dispatch as [[knnDtwPruned]]: up to `maxIndexRows` the
    * (id, series) index broadcasts and the plan is exchange-free;
    * beyond it the train side shuffles into `blocks` hashed tiles,
    * each tile emits its local exact top-k, and a grouped
    * array_sort-merge keeps the global k — per-probe shuffle volume is
    * k·blocks rows, never the pair space. */
  def knnDtwRagged(probes: DataFrame, train: DataFrame, k: Int, radius: Int = -1,
                   seriesCol: String = "values", maxIndexRows: Long = 100000,
                   blocks: Int = 16): DataFrame = {
    val cap = if (maxIndexRows >= Int.MaxValue - 1L) Int.MaxValue
              else (maxIndexRows + 1).toInt
    val over = train.select(col("series_id")).limit(cap).count() > maxIndexRows
    if (over) knnDtwRaggedBlocked(probes, train, k, radius, blocks, seriesCol)
    else {
      val spark = probes.sparkSession
      import spark.implicits._
      // id-ascending with lb = 0 satisfies the cascade's (lb, id) sort
      // contract; pre-shaped ONCE before broadcast so the per-probe call
      // allocates nothing but the k-slot buffers
      val index: Array[(Double, Long, Array[Double])] =
        train.select(col("series_id").cast("long"), col(seriesCol).cast("array<double>"))
          .as[(Long, Array[Double])].collect().sortBy(_._1)
          .map(t => (0.0, t._1, t._2))
      val bc = spark.sparkContext.broadcast(index)
      val knnUdf = udf((lv: scala.collection.Seq[Double]) => {
        // every candidate runs the DP, abandoning at the running kth best
        cascade(lv.toArray, bc.value, k, radius)
      })
      probes.select(col("series_id").as("probe_id"),
          posexplode(knnUdf(col(seriesCol))).as(Seq("rank0", "hit")))
        .select(col("probe_id"), (col("rank0") + 1).as("rank"),
          col("hit._1").as("neighbor_id"), col("hit._2").as("dist"))
    }
  }

  /** Tiled no-broadcast variant of [[knnDtwRagged]]: probes group into
    * chunks, train into hashed salted blocks (same tiling as
    * [[knnDtwBlocked]], minus the LB phase it cannot have); one UDF call
    * per (chunk × block) tile decodes the tile ONCE and runs the
    * cascade per probe against the block's series, emitting that tile's
    * exact top-k. The global merge array_sorts the k·blocks survivors
    * per probe on (dist, id) and keeps k — exact, and output-identical
    * to the broadcast route (CdistBlockSpec). */
  private[graft] def knnDtwRaggedBlocked(probes: DataFrame, train: DataFrame, k: Int,
                                         radius: Int, blocks: Int = 16,
                                         seriesCol: String = "values"): DataFrame = {
    require(blocks >= 1, "blocks must be >= 1")
    val salt = math.max(1,
      (4 * train.sparkSession.sparkContext.defaultParallelism + blocks - 1) / blocks)
    val tIdx = train
      .select(col("series_id").cast("long").as("id"),
        col(seriesCol).cast("array<double>").as("tv"))
      .withColumn("blk", pmod(xxhash64(col("id")), lit(blocks)).cast("int"))
      .groupBy("blk")
      .agg(collect_list(struct(col("id").as("_1"), col("tv").as("_2"))).as("idx"))
      .withColumn("slt", explode(sequence(lit(0), lit(salt - 1))))
    val chunks = math.max(32,
      probes.sparkSession.sparkContext.defaultParallelism * 4)
    val pChunks = probes
      .select(col("series_id").cast("long").as("probe_id"),
        col(seriesCol).cast("array<double>").as("q"))
      .withColumn("chk", pmod(xxhash64(col("probe_id")), lit(chunks)).cast("int"))
      .groupBy("chk")
      .agg(collect_list(struct(col("probe_id").as("_1"), col("q").as("_2"))).as("ps"))
      .withColumn("blk", explode(sequence(lit(0), lit(blocks - 1))))
      .withColumn("slt", pmod(col("chk"), lit(salt)).cast("int"))
    val tileUdf = udf((ps: scala.collection.Seq[(Long, scala.collection.Seq[Double])],
                       idx: scala.collection.Seq[(Long, scala.collection.Seq[Double])]) => {
      // arrays up front: the converter's Seq can be a linked list and
      // O(i) applies amplify quadratically inside the cascade loop
      val index = idx.iterator.map(r => (0.0, r._1, r._2.toArray)).toArray
        .sortBy(t => t._2)
      ps.iterator.flatMap { case (pid, q) =>
        cascade(q.toArray, index, k, radius).map { case (id, d) => (pid, d, id) }
      }.toArray
    })
    pChunks.join(tIdx.hint("shuffle_hash"), Seq("blk", "slt"))
      .select(explode(tileUdf(col("ps"), col("idx"))).as("c"))
      .select(col("c._1").as("probe_id"),
        struct(col("c._2").as("_1"), col("c._3").as("_2")).as("c"))
      .groupBy("probe_id")
      .agg(slice(array_sort(collect_list(col("c"))), 1, k).as("top"))
      .select(col("probe_id"), posexplode(col("top")).as(Seq("rank0", "hit")))
      .select(col("probe_id"), (col("rank0") + 1).as("rank"),
        col("hit._2").as("neighbor_id"), col("hit._1").as("dist"))
  }
}
