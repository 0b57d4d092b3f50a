package graft

import org.apache.spark.sql.DataFrame

/** Plan-shape regression tests: the scale properties SCALE.md claims,
  * asserted against the actual optimized/executed plans on real testdata
  * (sf0.001) so a refactor that silently loses pushdown, pruning, or
  * codegen fails CI — not a 100 TB run. */
class PlanShapeSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def planOf(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  private def scanLines(plan: String, table: String): Seq[String] =
    plan.linesIterator.filter(l =>
      l.contains("FileScan") && l.contains(table)).toSeq

  test("q18 pricing summary: lineitem scan is column-pruned to 4 columns") {
    val scans = scanLines(planOf("q18_pricing_summary"), "lineitem")
    assert(scans.nonEmpty)
    scans.foreach { s =>
      val readSchema = s.substring(s.indexOf("ReadSchema:"))
      // contract: the 4 aggregation inputs, nothing else from the 11-col table
      Seq("l_quantity", "l_extendedprice", "l_returnflag", "l_linestatus")
        .foreach(c => assert(readSchema.contains(c), s"missing $c in $readSchema"))
      assert(!readSchema.contains("l_comment") && !readSchema.contains("l_shipdate"),
        s"unpruned column in $readSchema")
    }
  }

  test("q19 top customers: join-key filter is pushed to the parquet scan") {
    val plan = planOf("q19_top_customers")
    val orderScans = scanLines(plan, "orders")
    assert(orderScans.nonEmpty)
    assert(orderScans.exists(_.contains("PushedFilters: [IsNotNull(o_custkey)]")),
      orderScans.mkString("\n"))
  }

  test("anchored edge match: literal anchor equality reaches the edge scan") {
    // the edge overlay is an in-memory union (not a FileScan), so assert on
    // the optimized filter instead: the anchor literal must sit in a Filter
    // directly over the scan-side plan, not above the join
    val plan = SparkEntry.queries("q04_incoming_rels")(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("customer:1"), plan.take(2000))
  }

  test("text-analysis pipeline stays inside whole-stage codegen") {
    // codegen stages only appear in the FINAL adaptive plan — execute THIS
    // df (count() would execute a different plan tree)
    val df = SparkEntry.queries("q24_token_stats")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // '*(n)' prefixes mark whole-stage-codegen'd operators
    assert(plan.contains("*(1)"), plan.take(2000))
    // no interpreted UDF anywhere in the text path
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      plan.take(2000))
  }

  test("minhash verification joins run on codegen'd native kernels") {
    val plan = planOf("q28_minhash_pairs")
    assert(plan.contains("sorted_intersect_count"), plan.take(3000))
    assert(plan.contains("minhash_sig"), plan.take(3000))
  }

  test("q30 simhash runs on the codegen'd native kernel, no object serde") {
    val plan = planOf("q30_simhash")
    assert(plan.contains("simhash64"), plan.take(3000))
    // the old kernel was mapPartitions over a Dataset — its signature in a
    // plan is the serde pair around an object operator
    assert(!plan.contains("DeserializeToObject") && !plan.contains("MapPartitions"),
      plan.take(3000))
  }

  test("q42 set-anchored traversal broadcasts the anchor side") {
    val plan = planOf("q42_set_anchored_counts")
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q56 decontamination broadcasts the eval gram set over a pruned scan") {
    val plan = planOf("q56_decontaminate")
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    // both sides read only (doc_id, text) from the 5-column table
    scanLines(plan, "documents").foreach { s =>
      val readSchema = s.substring(s.indexOf("ReadSchema:"))
      assert(!readSchema.contains("source") && !readSchema.contains("n_chars"),
        s"unpruned column in $readSchema")
    }
  }

  test("q60 vocabulary aggregates without a countDistinct Expand") {
    val plan = planOf("q60_vocabulary")
    // df comes from the two-stage rollup, never distinct-expand; both
    // aggregation stages keep map-side partials
    assert(!plan.contains("Expand"), plan.take(3000))
    assert(plan.contains("HashAggregate"), plan.take(3000))
  }

  test("q63 running windows: one partition-key shuffle serves both " +
      "window functions") {
    val plan = planOf("q63_running_window")
    val windowExchanges = plan.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning(o_custkey")).size
    assert(windowExchanges == 1, s"expected 1 window shuffle:\n${plan.take(3000)}")
  }

  test("q64 intersect: both branch scans push the status filter down") {
    val scans = scanLines(planOf("q64_set_intersect"), "orders")
    assert(scans.size == 2, scans.mkString("\n"))
    scans.foreach(s => assert(s.contains("EqualTo(o_orderstatus,"),
      s"status filter not pushed: $s"))
  }

  test("q65 batched kNN: per-query top-k is group-limited map-side, " +
      "query batch broadcast") {
    val plan = planOf("q65_knn_join")
    // rank-limit pushdown: row_number() <= k rewrites to a PARTIAL
    // WindowGroupLimit before the window exchange, so the shuffle carries
    // at most k rows per (query, input partition) — the property that
    // keeps the final top-k from materializing |corpus|·|queries| rows
    assert(plan.contains("WindowGroupLimit"), plan.take(3000))
    assert(plan.contains("Partial"), plan.take(3000))
    // the query batch is the broadcast side of the scoring join
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("q70 sequence packing: one shuffle total (the shard window), no " +
      "global window partition") {
    val plan = planOf("q70_pack_sequences")
    // the running sum must partition by shard — a single global window
    // would serialize the corpus through one task at scale. The gate
    // query's presentation orderBy adds a rangepartitioning exchange on
    // top; the OPERATOR itself may cost exactly one hash exchange.
    val hashExchanges = plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1,
      s"expected exactly 1 hash exchange:\n${plan.take(3000)}")
    assert(plan.contains("hashpartitioning(shard"), plan.take(3000))
  }

  test("q72 token-budget sample: one shuffle total (the stratum window)") {
    val plan = planOf("q72_token_budget_sample")
    val hashExchanges = plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1,
      s"expected exactly 1 hash exchange:\n${plan.take(3000)}")
    assert(plan.contains("hashpartitioning(source"), plan.take(3000))
  }

  test("q71 repetition signals: no UDF, no serde in the scan pass") {
    val df = SparkEntry.queries("q71_repetition")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF")
      && !plan.contains("DeserializeToObject") && !plan.contains("MapPartitions"),
      plan.take(2000))
  }

  test("q69 IVF kNN: per-query top-k is group-limited map-side, query " +
      "side broadcast into the cell join") {
    val plan = planOf("q69_knn_ivf")
    // same rank-limit pushdown property as q65: the final top-k shuffle
    // carries at most k rows per (query, partition), not the scored
    // (probed-cells × queries) product
    assert(plan.contains("WindowGroupLimit"), plan.take(3000))
    assert(plan.contains("Partial"), plan.take(3000))
    // probes and query vectors meet the corpus cells by broadcast — the
    // corpus side never shuffles for scoring
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("q66 incremental cross-dedup: new batch broadcasts, corpus side " +
      "has no bucket-count window") {
    val plan = planOf("q66_cross_minhash")
    // the new-batch side is the broadcast side of BOTH the banding join
    // and the verification join — the corpus side never shuffles to meet it
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    // ZERO Windows in the final plan: the one legitimate window (the
    // new-side bucket cap) lives in the STAGED candidate chain since r22
    // (materialized once by the candidate gate count, so the final plan
    // reads its checkpoint), and the corpus side must never pay a
    // bucket-size window — that would shuffle the 100 TB side just to
    // count
    val windows = plan.linesIterator.count(_.contains("+- Window ["))
    assert(windows == 0, s"expected 0 windows (new-side cap is in the " +
      s"staged candidate chain since r22), got $windows")
    // the verify streams the corpus prep past BROADCAST candidates — no
    // shuffle exchange anywhere in the final verify plan (the top sort's
    // exchange aside)
    assert(plan.contains("Scan ExistingRDD"), plan.take(3000))
  }

  test("q07 anchored count: one pruning action at construction, bounded " +
      "jobs end-to-end") {
    // The count path runs exactly TWO driver-synchronized actions: the
    // shared far-prefix collect at construction (anchor-side prefix is
    // static), then the final aggregate. AQE materializes shuffle/broadcast
    // stages as their own Spark jobs — including, at construction, the
    // stages below the first hydration's lazy checkpoint (taking .rdd on
    // an adaptive plan finalizes it; that work is REUSED by the final
    // action, so it shifts accounting without adding work). Pin the
    // measured values (3 construction, 6 total) so a regression to
    // per-hydration collects (r8: 5 construction, 8 total) fails here.
    val st = spark.sparkContext.statusTracker
    val before = st.getJobIdsForGroup(null).length
    val df = SparkEntry.queries("q07_count_incoming")(spark, dir)
    val atPlan = st.getJobIdsForGroup(null).length
    df.collect()
    val atExec = st.getJobIdsForGroup(null).length
    assert(atPlan - before <= 3,
      s"construction ran ${atPlan - before} jobs, expected <= 3")
    assert(atExec - before <= 6,
      s"count ran ${atExec - before} jobs end-to-end, expected <= 6")
  }

  test("q88 stored-codes probe: corpus side scans the int8 code store, " +
      "never the float embedding parquet") {
    // the 4×-scan-bandwidth claim is a PLAN property: the corpus side must
    // read the QuantizedStore codes files with a tinyint-array ReadSchema.
    // (The query side's small float scan is staged behind a checkpoint and
    // so may not appear in the final plan at all — the corpus-scale scan
    // is the one that matters.)
    val plan = planOf("q88_knn_quantized_stored")
    val codeScans = scanLines(plan, "graft-quant-store")
    assert(codeScans.nonEmpty,
      "corpus side does not scan the stored codes:\n" + plan.take(3000))
    assert(codeScans.exists(_.contains("array<tinyint>")),
      "codes scan is not tinyint:\n" + codeScans.mkString("\n"))
    assert(scanLines(plan, "embeddings.parquet").isEmpty,
      "a float embeddings scan leaked into the stored-codes probe plan:\n" +
        scanLines(plan, "embeddings.parquet").mkString("\n"))
  }

  test("q144 stored PQ probe: corpus side scans m-byte codes with " +
      "map-side group-limit and a broadcast query side") {
    // the PQ bandwidth claim as a plan property: the corpus-scale scan
    // must read the PqStore codes files (tinyint arrays — 16 B/vec at
    // the gate's m=16 vs 256 B float), the per-query top-k must group-
    // limit before the window exchange, and the LUT side must broadcast
    val plan = planOf("q144_knn_pq_stored")
    val codeScans = scanLines(plan, "graft-pq-store")
    assert(codeScans.nonEmpty,
      "corpus side does not scan the stored PQ codes:\n" + plan.take(3000))
    assert(codeScans.exists(_.contains("array<tinyint>")),
      "PQ codes scan is not tinyint:\n" + codeScans.mkString("\n"))
    assert(scanLines(plan, "embeddings.parquet").isEmpty,
      "a float embeddings scan leaked into the stored-PQ probe plan:\n" +
        scanLines(plan, "embeddings.parquet").mkString("\n"))
    assert(plan.contains("WindowGroupLimit"), plan.take(3000))
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("q147 cross-span decontamination: the eval-side window frame " +
      "broadcasts under the count gate") {
    // the decontamination scale shape: the corpus side streams its
    // windows through ONE hash join against a broadcast eval side —
    // no corpus self-join, no corpus-side shuffle for the pair step.
    // The GATE's plan is a staged-frame scan (the screen output is
    // session-staged so q148/q149/q150's reps don't re-run it), so
    // assert on the LIVE operator plan the staging wraps — the same
    // input-frame discipline as the q84 pin below.
    import org.apache.spark.sql.functions.col
    val docs = Testbed.graph(spark, dir).collection("documents")
    val live = graft.ops.Dedup.crossVerbatimSpans(
      docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text",
      docs.filter(col("doc_id") % 10 === 0), "doc_id", "text",
      k = 12, minLen = 30, maxOccurrences = 50,
      hash = graft.ops.BaseHash.Md5)
    val plan = live.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "eval-side window join did not broadcast:\n" + plan.take(3000))
  }

  test("q84 bounded slice: both endpoint bounds are pushed down to the " +
      "staged near-dup edge scan") {
    // the absolute bound is what makes the uncapped gate constant-work at
    // any corpus scale — it must prune at the parquet scan (row-group
    // min/max stats), not filter post-scan. triangles() checkpoints its
    // canonicalized edge frame, hiding the scan from the gate's final
    // plan, so assert on the exact input frame the gate builds.
    import org.apache.spark.sql.functions.col
    val bound = SparkEntry.TriangleSliceBound
    val edgeScans = scanLines(
      SparkEntry.nearDupEdges(spark, dir)
        .filter(col("id_a") < bound && col("id_b") < bound)
        .queryExecution.executedPlan.toString,
      "graft-neardup-edges")
    assert(edgeScans.nonEmpty)
    assert(edgeScans.exists(s => s.contains(s"LessThan(id_a,$bound)")
        && s.contains(s"LessThan(id_b,$bound)")),
      edgeScans.mkString("\n"))
  }

  test("q34 ANN bucketing runs on the codegen'd projection kernel, " +
      "candidates on scalars") {
    // no object serde anywhere in the pair pipeline (the checkpointed
    // projection stage hides its own operators from this plan string...)
    val plan = planOf("q34_ann_lsh")
    assert(!plan.contains("DeserializeToObject") && !plan.contains("MapPartitions"),
      plan.take(3000))
    // ...so assert the native kernel on the projection stage directly
    graft.functions.GraftFunctions.register(spark)
    val projPlan = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(graft.ops.Similarity.signRandomProjection(
        org.apache.spark.sql.functions.col("embedding"), 8).as("b"))
      .queryExecution.executedPlan.toString
    assert(projPlan.contains("sign_projection"), projPlan.take(2000))
  }

  test("q92 stored cross-dedup: batch side broadcasts against the index, " +
      "corpus text is never scanned, corpus-sized tables never shuffle") {
    val plan = planOf("q92_cross_minhash_stored")
    // every corpus-facing join is a broadcast of the (tiny) batch side —
    // a SortMergeJoin here would mean the stored index shuffles per batch
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"),
      "a corpus-sized shuffle join appeared in the stored probe:\n" +
        plan.take(3000))
    // the whole point of the store: the documents TEXT is read only for
    // the batch slice; the corpus side reads the index parquet instead
    val docScans = scanLines(plan, "documents.parquet")
    assert(docScans.forall(_.contains("doc_id")), docScans.mkString("\n"))
    assert(scanLines(plan, "graft-sig-store").nonEmpty,
      "no signature-store scan in the stored probe plan:\n" + plan.take(3000))
    // exactly one Window — the new-side bucket cap; the stored side must
    // never pay one (same invariant as q66's recompute form)
    val windows = plan.linesIterator.count(_.contains("+- Window ["))
    assert(windows == 1, s"expected 1 window (new-side cap), got $windows")
  }

  test("q93 stored simhash probe: chunk join broadcasts the batch side") {
    val plan = planOf("q93_cross_simhash_stored")
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"),
      "the stored chunk table shuffled to meet the batch:\n" + plan.take(3000))
  }

  test("q97 CMS top-k: counters broadcast to the probe side, heavy-hitter " +
      "rank is group-limited map-side, probe scan is column-pruned") {
    val plan = planOf("q97_cms_topk")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftOuter"),
      "counter lookup must broadcast the bounded counter table:\n" +
        plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      "top-k must rank-push down before the group exchange:\n" +
        plan.take(3000))
    scanLines(plan, "lineitem").foreach { s =>
      val rs = s.substring(s.indexOf("ReadSchema:"))
      assert(!rs.contains("l_comment") && !rs.contains("l_extendedprice"),
        s"CMS probe scan reads columns it never uses: $rs")
    }
  }

  test("q99 bloom membership: probing is a pure map over one scan — the " +
      "densified filter is a literal, zero joins, zero shuffles before " +
      "the output sort") {
    val plan = planOf("q99_bloom_membership")
    assert(!plan.contains("Join"), "bloom probe must not join:\n" +
      plan.take(3000))
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, // only the ORDER BY range partitioning
      s"expected 1 exchange (output sort), got $exchanges:\n" +
        plan.take(3000))
    assert(plan.contains("shiftright"), "membership bits must be inline")
  }

  test("q100 bloom decontamination: only the bloom-positive sliver " +
      "reaches the verification anti-join; the clean branch is map-only") {
    val plan = planOf("q100_bloom_decontaminate")
    assert(plan.contains("LeftAnti"), plan.take(3000))
    assert(plan.contains("Union"), plan.take(3000))
    // the anti-join's corpus input must already be bloom-filtered: the
    // membership expression (shiftright over the word literal) appears in
    // a Filter, not only in the join
    assert(plan.linesIterator.exists(l =>
        l.contains("Filter") && l.contains("shiftright")),
      "bloom prune must filter the corpus BEFORE the anti-join:\n" +
        plan.take(3000))
  }

  test("q101 priority sample: priorities compute map-side before ONE " +
      "group exchange, rank is group-limited, weight filter reaches " +
      "the parquet scan") {
    val plan = planOf("q101_priority_sample")
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      plan.take(3000))
    val hashEx = plan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(hashEx == 1,
      s"expected exactly one group exchange, got $hashEx:\n" +
        plan.take(3000))
    val scans = scanLines(plan, "documents")
    assert(scans.nonEmpty && scans.forall(
        _.contains("GreaterThan(n_chars,0)")),
      "weight filter must push to the scan:\n" + scans.mkString("\n"))
  }

  test("q141 chunker: ZERO exchanges — one generate over a 2-column " +
      "pruned scan (the gate's ORDER BY is the only sort)") {
    // chunking must stay a per-row transform: any Exchange here means a
    // shuffle crept into what is a pure scan→generate pipeline. Strip
    // the gate's compare-discipline ORDER BY by planning the op itself.
    val plan = graft.ops.Corpus.chunkWindows(
        Testbed.graph(spark, dir).collection("documents"), "doc_id",
        "text", 64, 48)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      "chunker must not shuffle:\n" + plan.take(3000))
    assert(plan.contains("Generate"), plan.take(3000))
    val scans = scanLines(plan, "documents")
    assert(scans.nonEmpty)
    val readSchema = scans.head.substring(scans.head.indexOf("ReadSchema:"))
    assert(readSchema.contains("doc_id") && readSchema.contains("text")
      && !readSchema.contains("lang") && !readSchema.contains("source"),
      s"chunker scan must read only (doc_id, text): $readSchema")
  }

  test("q137 percentile rank: a RANGE exchange (the parallel total " +
      "order), never a single-partition window") {
    val plan = planOf("q137_percentile_rank")
    assert(plan.contains("Exchange rangepartitioning"),
      "percentileRank must range-partition:\n" + plan.take(3000))
    assert(!plan.contains("Exchange SinglePartition"),
      "percentileRank must not collapse to one partition:\n" +
        plan.take(3000))
  }

  test("q138 relative-df retrieval join: the df cutoff is a Filter on " +
      "the sliver window, query side broadcasts") {
    val plan = planOf("q138_bm25_join_frac")
    // the resolved bound is a literal by the time the plan exists — the
    // cutoff must appear as a comparison on the window's df output
    // BEFORE the qterms fan-out join
    assert(plan.linesIterator.exists(l =>
        l.contains("Filter") && l.contains("df")), plan.take(3000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("q164 two-stage retrieval: survivor fetch is a broadcast join, " +
      "per-query top-k is a group limit, never a global sort") {
    val plan = planOf("q164_two_stage_knn")
    assert(plan.contains("BroadcastHashJoin"),
      "the queries x m survivor list must broadcast against the corpus:\n"
        + plan.take(3000))
    assert(plan.contains("WindowGroupLimit"),
      "per-query rank must push down as a group limit:\n" + plan.take(3000))
  }

  test("q168 centroid screen: one map-side-combined group agg (partial " +
      "HashAggregate), centroids broadcast back, embeddings scan pruned") {
    val plan = planOf("q168_centroid_outliers")
    assert(plan.contains("BroadcastHashJoin"),
      "group centroids must broadcast, not shuffle the corpus:\n"
        + plan.take(3000))
    assert(plan.linesIterator.count(_.contains("HashAggregate")) >= 2,
      "group sums must partial-aggregate map-side:\n" + plan.take(3000))
  }

  test("q169 histogram quantiles: events scan pruned to (event_type, " +
      "value); the quantile list joins as a broadcast") {
    val plan = planOf("q169_histogram_quantiles")
    val scans = scanLines(plan, "events")
    assert(scans.nonEmpty)
    val readSchema = scans.head.substring(scans.head.indexOf("ReadSchema:"))
    assert(readSchema.contains("event_type") && readSchema.contains("value")
      && !readSchema.contains("props") && !readSchema.contains("user_id"),
      s"histogram scan must read only (event_type, value): $readSchema")
    assert(plan.contains("BroadcastNestedLoopJoin")
      || plan.contains("BroadcastHashJoin"),
      "the quantile list must broadcast:\n" + plan.take(3000))
  }

  test("q174 stored two-stage retrieval: the coarse pass scans (id, " +
      "prefix) only — the full vector column never enters stage 1") {
    val plan = planOf("q174_two_stage_stored")
    val storeScans = scanLines(plan, "graft-prefix-store")
    assert(storeScans.nonEmpty,
      "no prefix-store scan in the plan:\n" + plan.take(3000))
    val schemas = storeScans.map(s => s.substring(s.indexOf("ReadSchema:")))
    // the rerank fetch reads vec WITHOUT dragging prefix along (the
    // coarse stage is checkpoint-staged, so only the rerank scan
    // survives into the composed gate plan — the q88 situation)
    assert(schemas.exists(rs => rs.contains("vec:")
      && !rs.contains("prefix:")),
      "no pruned rerank (vec-only) scan:\n" + storeScans.mkString("\n"))
    // the coarse pruning claim, pinned on the stage-1 frame directly:
    // selecting (id, prefix) from the stored layout must produce a scan
    // whose ReadSchema excludes the full vector column
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val storePath = SparkEntry.prefixStorePath(spark, emb, dir)
    val coarsePlan = graft.sources.PrefixStore.data(spark, storePath)
      .select("id", "prefix").queryExecution.executedPlan.toString
    val coarseScans = scanLines(coarsePlan, "graft-prefix-store")
      .map(s => s.substring(s.indexOf("ReadSchema:")))
    assert(coarseScans.nonEmpty && coarseScans.forall(rs =>
        rs.contains("prefix:") && !rs.contains("vec:")),
      "coarse scan not pruned to (id, prefix):\n" + coarseScans.mkString("\n"))
  }

  test("q172 stored histogram read: scans the store's bin counts, " +
      "never events.parquet") {
    val plan = planOf("q172_histogram_stored")
    assert(scanLines(plan, "graft-histogram-store").nonEmpty,
      "the stored read must scan the store:\n" + plan.take(3000))
    assert(scanLines(plan, "events.parquet").isEmpty,
      "an events scan leaked into the stored quantile read:\n"
        + plan.take(3000))
  }

  test("q182 JL projection: ZERO exchanges — a pure per-row transform " +
      "over a 2-column pruned scan") {
    // plan the op itself (the gate adds the compare-discipline ORDER BY
    // and the posexplode)
    val plan = graft.ops.Similarity.jlProject(
        Testbed.graph(spark, dir).collection("embeddings"),
        "vec_id", "embedding", 64, 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      "jlProject must not shuffle:\n" + plan.take(3000))
    val scans = scanLines(plan, "embeddings")
    assert(scans.nonEmpty)
    val rs = scans.head.substring(scans.head.indexOf("ReadSchema:"))
    assert(rs.contains("vec_id") && rs.contains("embedding")
      && !rs.contains("label"),
      s"projection scan must read only (vec_id, embedding): $rs")
  }

  test("q177 zone maps: ONE map-side-combined aggregation over a scan " +
      "pruned to the stat columns; the prune adds no shuffle") {
    val df = SparkEntry.queries("q177_zonemap_prune")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val scans = scanLines(plan, "lineitem")
    assert(scans.nonEmpty)
    val rs = scans.head.substring(scans.head.indexOf("ReadSchema:"))
    assert(rs.contains("l_shipdate") && rs.contains("l_quantity")
      && !rs.contains("l_extendedprice") && !rs.contains("l_orderkey"),
      s"zone-map scan must read only the stat columns: $rs")
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      "zone-map build must map-side combine:\n" + plan.take(3000))
  }

  test("q181 sequence n-grams: ONE user-keyed shuffle serves both lead " +
      "frames (a single Window over a single sort)") {
    val plan = planOf("q181_sequence_ngrams")
    val userExchanges = plan.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning(user_id")).size
    assert(userExchanges == 1,
      s"expected 1 user-keyed shuffle:\n${plan.take(3000)}")
    val windows = plan.linesIterator.filter(_.contains("Window [")).size
    assert(windows == 1,
      s"both leads must share one Window operator:\n${plan.take(3000)}")
  }

  test("compaction plan: the manifest window range-partitions by key — " +
      "never a single-partition sort") {
    // plan the op over an in-memory manifest so only ITS exchanges show
    import spark.implicits._
    val manifest = (0 until 64).map(i => (s"k${i % 4}", i.toLong, 700L))
      .toDF("k", "file_id", "bytes")
    val plan = graft.ops.Layout.compactionPlan(manifest, Seq("k"),
        "file_id", "bytes", 1000L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Exchange hashpartitioning(k"),
      "the packing window must partition by key:\n" + plan.take(3000))
    assert(!plan.contains("Exchange SinglePartition"),
      "packing must never collapse to one partition:\n" + plan.take(3000))
  }

  test("q189 stored JL retrieval: the coarse scan reads (id, sketch) " +
      "only — the full vectors never leave parquet in stage 1") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val storePath = SparkEntry.jlStorePath(spark, emb, dir)
    val coarsePlan = graft.sources.JlStore.data(spark, storePath)
      .select("id", "sketch").queryExecution.executedPlan.toString
    val coarseScans = scanLines(coarsePlan, "graft-jl-store")
      .map(s => s.substring(s.indexOf("ReadSchema:")))
    assert(coarseScans.nonEmpty && coarseScans.forall(rs =>
        rs.contains("sketch:") && !rs.contains("vec:")),
      "coarse scan not pruned to (id, sketch):\n" +
        coarseScans.mkString("\n"))
  }

  test("q184 stored manifest prune: scans the store's stats, never " +
      "lineitem.parquet") {
    val plan = planOf("q184_zonemap_stored")
    assert(scanLines(plan, "graft-manifest-store").nonEmpty,
      "the stored prune must scan the store:\n" + plan.take(3000))
    assert(scanLines(plan, "lineitem.parquet").isEmpty,
      "a lineitem scan leaked into the stored planning read:\n"
        + plan.take(3000))
  }

  test("q190/q192 compaction executor: the plan-routing join is " +
      "broadcast-pinned — no SortMergeJoin even with auto-broadcast " +
      "off") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      Seq("q190_compaction_apply", "q192_prune_after_compaction")
        .foreach { q =>
          val plan = planOf(q)
          assert(!plan.contains("SortMergeJoin"),
            s"$q: the routing join escaped the broadcast pin:\n" +
              plan.take(3000))
          assert(plan.contains("BroadcastHashJoin"),
            s"$q:\n" + plan.take(3000))
        }
    } finally spark.conf.set(key, prev)
  }

  test("q193 clustered rewrite: the bucket-offset join is broadcast-" +
      "pinned (no SortMergeJoin with auto-broadcast off) and the " +
      "row_number window partitions by (source, z-bucket) — fine-" +
      "grained, never one task per source") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val plan = planOf("q193_cluster_rewrite")
      assert(!plan.contains("SortMergeJoin"),
        "the offset join escaped the broadcast pin:\n" + plan.take(3000))
      assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
      // the heavy window's partition spec must include the z-bucket —
      // a per-source-only window would serialize each key's rows
      val winLines = plan.linesIterator
        .filter(l => l.contains("Window") && l.contains("row_number"))
        .toSeq
      assert(winLines.exists(_.contains("_zbucket")),
        "row_number window lost its z-bucket partitioning:\n" +
          winLines.mkString("\n"))
    } finally spark.conf.set(key, prev)
  }

  test("q196 auto-salt join: the salt map broadcasts onto both sides " +
      "and the main join key carries the salt — hot keys scatter " +
      "instead of hammering one reducer") {
    val plan = planOf("q196_auto_salt_join")
    assert(plan.contains("BroadcastHashJoin"),
      "the ≤reportK-row salt map must broadcast:\n" + plan.take(3000))
    // the big join's equi-key must include _salt (the scatter); it
    // shows up in the join condition of the executed plan
    val joinLines = plan.linesIterator
      .filter(l => l.contains("Join") && l.contains("_salt")).toSeq
    assert(joinLines.nonEmpty,
      "the main join lost its salt key:\n" + plan.take(3000))
  }

  test("q202 prefix containment: every join in the pipeline is owned " +
      "by the count-gated hints — zero SortMergeJoins with auto-" +
      "broadcast off, so the corpus postings and sigs never shuffle") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val plan = planOf("q202_containment_prefix")
      assert(!plan.contains("SortMergeJoin"),
        "a containment join escaped the gates:\n" + plan.take(3000))
      assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    } finally spark.conf.set(key, prev)
  }

  test("q110/q111 BM25 retrieval joins: every join is EXPLICITLY " +
      "broadcast-pinned — the plan survives autoBroadcastJoinThreshold " +
      "= -1 with zero SortMergeJoins") {
    // The r15/r16 bench variance class: Catalyst was free to plan the
    // doc-length join from sampled sizes and flipped it run-to-run.
    // With auto-broadcast OFF, only the count-gated broadcast() hints
    // can produce a BroadcastHashJoin — so this asserts the hints, not
    // the optimizer's size estimates, own every join in the class.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      Seq("q110_bm25_join", "q111_bm25_join_stored").foreach { q =>
        val plan = planOf(q)
        assert(!plan.contains("SortMergeJoin"),
          s"$q: a join escaped the broadcast pin:\n" + plan.take(3000))
        assert(plan.contains("BroadcastHashJoin"), s"$q:\n" + plan.take(3000))
      }
    } finally spark.conf.set(key, prev)
  }
}
