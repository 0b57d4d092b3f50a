package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.api.GraphDocument
import graft.core.DocGraph
import graft.model.{DocRef, GraphSchema}
import graft.query.RelQueryPlanner

/** Temporary end-to-end smoke for the round-4 changes, driven through the
  * public API against /root/testdata parquet. Not part of the library. */
object SmokeVerify {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val s: SparkSession = spark
    val sf = "/root/testdata/sf0.001"

    // 1. sorted_intersect_count == size(array_intersect) on real shingle
    // sets (the MinHash verification kernel swap must be value-identical).
    graft.functions.GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val hs = docs.select(col("doc_id").cast("long").as("id"),
      array_sort(array_distinct(graft.ops.Dedup.shingleHashes(
        graft.ops.Dedup.charShingles(col("text"), 3)))).as("_hs"))
    val xa = hs.select(col("id").as("ia"), col("_hs").as("ha"))
    val xb = hs.select(col("id").as("ib"), col("_hs").as("hb"))
    val mism = xa.crossJoin(xb).filter(col("ia") < col("ib")).limit(5000)
      .filter(call_function("sorted_intersect_count", col("ha"), col("hb"))
        =!= size(array_intersect(col("ha"), col("hb")))).count()
    println(s"SMOKE1 sortedIntersect: mismatches=$mism (expect 0) => " +
      (if (mism == 0) "OK" else "BROKEN"))

    // 2. candidatePairs end-to-end after the scalars-only banding rewrite:
    // verify the jaccard values against the direct formula on the same pairs.
    val pairs = graft.ops.Dedup.candidatePairs(docs, "doc_id", "text",
      shingleN = 3, k = 16, bands = 4, minJaccard = 0.5)
    val direct = pairs
      .join(xa, col("id_a") === col("ia")).join(xb, col("id_b") === col("ib"))
      .withColumn("j2", round(
        size(array_intersect(col("ha"), col("hb"))).cast("double")
          / size(array_union(col("ha"), col("hb"))), 4))
    val badJ = direct.filter(col("jaccard") =!= col("j2")).count()
    val nPairs = pairs.count()
    println(s"SMOKE2 candidatePairs: pairs=$nPairs badJaccard=$badJ => " +
      (if (nPairs > 0 && badJ == 0) "OK" else "BROKEN"))

    // 2b. Incremental cross-corpus dedup: the cross slice of the self-join
    // on the union must equal crossCandidatePairs(newBatch, corpus) — same
    // permutations, same banding, exact verification on both.
    val isNew2b = col("doc_id") % 7 === 0
    val cross2b = graft.ops.Dedup.crossCandidatePairs(
        docs.filter(isNew2b), docs.filter(!isNew2b), "doc_id", "text",
        shingleN = 3, k = 16, bands = 4, minJaccard = 0.5,
        maxNewBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val selfCross2b = graft.ops.Dedup.candidatePairs(docs, "doc_id", "text",
        shingleN = 3, k = 16, bands = 4, minJaccard = 0.5,
        maxBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(p => (p._1 % 7 == 0) != (p._2 % 7 == 0))
      .map(p => if (p._2 % 7 == 0) p else p.swap).toSet
    println(s"SMOKE2b crossDedup: cross=${cross2b.size} " +
      s"selfCross=${selfCross2b.size} equal=${cross2b == selfCross2b} => " +
      (if (cross2b.nonEmpty && cross2b == selfCross2b) "OK" else "BROKEN"))

    // 3. OpsUtil widen path: a 1-partition input must fan out, a wide input
    // must pass through untouched (no shuffle inserted at 100TB scale).
    val narrow = docs.coalesce(1)
    val widened = graft.ops.Dedup.simhash(narrow, "doc_id", "text")
    val wideIn = docs.repartition(64)
    val simWide = graft.ops.Dedup.simhash(wideIn, "doc_id", "text")
    val simNarrow = widened.count()
    val simSame = widened.join(simWide.withColumnRenamed("simhash", "s2"), "id")
      .filter(col("simhash") =!= col("s2")).count()
    println(s"SMOKE3 widen: rows=$simNarrow partitionInvariant=${simSame == 0} " +
      s"=> ${if (simNarrow == docs.count() && simSame == 0) "OK" else "BROKEN"}")

    // 4. Graph overlay + analytics after the coalesce changes: components
    // and degrees on a real customer/orders graph.
    val customer = spark.read.parquet(s"$sf/customer.parquet")
      .withColumn("_id", col("c_custkey").cast(StringType))
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .withColumn("_id", col("o_orderkey").cast(StringType))
    var g = new DocGraph(spark,
      Map("customer" -> customer, "orders" -> orders),
      Map("customer" -> GraphSchema("customer"), "orders" -> GraphSchema("orders")),
      DocGraph.emptyEdges(spark))
    g = g.createRelationships("placed_by", orders.select(
      lit("orders").as("_from_collection"), col("_id").as("_from_id"),
      lit("customer").as("_to_collection"),
      col("o_custkey").cast(StringType).as("_to_id")))
    val comp = graft.graph.GraphAnalytics.connectedComponents(g)
    val nComp = comp.select(countDistinct(col("component"))).collect()(0).getLong(0)
    val nVerts = comp.count()
    println(s"SMOKE4 graphx: verts=$nVerts components=$nComp => " +
      (if (nVerts > 0 && nComp > 0 && nComp < nVerts) "OK" else "BROKEN"))

    // 5. RelQuery construction cost: hydrated relationships of a real
    // anchor. Construction legitimately runs a BOUNDED number of jobs —
    // the candidate-prefix pruning collect (RelQuery.hydrateWith: distinct
    // endpoint prefixes, catalog-bounded) that lets hydration join only
    // the collections actually referenced; everything else stays lazy
    // (lazy localCheckpoints materialize on the first action). Report the
    // count so a regression to UNBOUNDED construction work is visible.
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val rels = GraphDocument(g, DocRef("customer", "1"))
      .incomingRelationships("placed_by")
    val jobsAtPlan = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length - before
    val n = rels.count()
    println(s"SMOKE5 construction: planJobs=$jobsAtPlan (bounded pruning " +
      s"lookups) rows=$n => " +
      (if (n > 0 && jobsAtPlan <= 8) "OK" else "BROKEN"))

    // 6. Batch sessionize with out-of-order input: same result sorted or not.
    import spark.implicits._
    import streaming.EventStreams.Event
    val ev = Seq(
      Event(0L, java.sql.Timestamp.valueOf("2024-01-01 10:40:00"), 1L, "c", 2.0),
      Event(1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "c", 1.0),
      Event(2L, java.sql.Timestamp.valueOf("2024-01-01 13:00:00"), 1L, "c", 4.0)
    ).toDS()
    val sess = streaming.EventStreams.sessionize(ev, 3600 * 1000L).collect()
      .sortBy(_.start.getTime)
    val ok6 = sess.length == 2 && sess(0).n_events == 2 &&
      sess(0).total_value == 3.0 && sess(1).n_events == 1
    println(s"SMOKE6 sessionize: sessions=${sess.length} " +
      s"first=(${sess.headOption.map(x => (x.n_events, x.total_value))}) => " +
      (if (ok6) "OK" else "BROKEN"))

    // 7. salted join on real data: orders ⋈ nation-filtered customer dim,
    // salted, must equal the plain join (count + sum fingerprint).
    val ordersT = spark.read.parquet(s"$sf/orders.parquet")
    val custDim = spark.read.parquet(s"$sf/customer.parquet")
      .filter(col("c_nationkey") < 5)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val plainJ = ordersT.join(custDim, Seq("o_custkey"))
      .agg(count(lit(1)), sum(col("o_totalprice"))).collect()(0)
    val saltedJ = graft.ops.Skew.saltedJoin(ordersT, custDim, "o_custkey", 8)
      .agg(count(lit(1)), sum(col("o_totalprice"))).collect()(0)
    println(s"SMOKE7 saltedJoin: plain=(${plainJ.getLong(0)}) " +
      s"salted=(${saltedJ.getLong(0)}) => " +
      (if (plainJ.getLong(0) == saltedJ.getLong(0) &&
        plainJ.getDouble(1) == saltedJ.getDouble(1)) "OK" else "BROKEN"))

    // 8. approx distinct count through the public API on real data: the
    // HLL++ path must land within the sketch error of the exact path.
    val tg = Testbed.graph(spark, sf)
    def one(df: org.apache.spark.sql.DataFrame): Long = df.collect()(0).getLong(0)
    val anchor8 = GraphDocument(tg, DocRef("nation", "0"))
    val exact8 = one(anchor8.countRelationships("located_in",
      DocGraph.Direction.Both, part = "b", distinct = true))
    val approx8 = one(anchor8.countRelationships("located_in",
      DocGraph.Direction.Both, part = "b", distinct = true, approx = true))
    val ok8 = exact8 > 0 &&
      math.abs(approx8 - exact8) <= math.max(1L, (exact8 * 0.15).toLong)
    println(s"SMOKE8 approxCount: exact=$exact8 approx=$approx8 => " +
      (if (ok8) "OK" else "BROKEN"))

    // 9. GraphStore appendEdges dual-mirror through save/append/load on a
    // real subgraph: the appended edge must answer BOTH directions.
    val sub9 = new DocGraph(spark,
      Map("customer" -> customer, "orders" -> orders),
      Map("customer" -> GraphSchema("customer"), "orders" -> GraphSchema("orders")),
      g.edges)
    graft.sources.GraphStore.save(sub9, "graft_smoke_store", buckets = 4)
    graft.sources.GraphStore.appendEdges(spark, "graft_smoke_store",
      Seq((777L, "orders:999999", "customer:1", "placed_by", 1L,
        Map.empty[String, String]))
        .toDF("_rel_id", "_from", "_to", "rel_type", "_created_at", "props"))
    val loaded9 = graft.sources.GraphStore.load(spark, "graft_smoke_store")
    val in9 = loaded9.edgesKeyedBy(toSide = true)
      .filter(col("_to") === "customer:1" && col("_rel_id") === 777L).count()
    val out9 = loaded9.edgesKeyedBy(toSide = false)
      .filter(col("_from") === "orders:999999").count()
    println(s"SMOKE9 appendEdges: mirrorHit=$in9 primaryHit=$out9 => " +
      (if (in9 == 1 && out9 == 1) "OK" else "BROKEN"))

    // 10. embeddingNearDups (multi-probe default) on real embeddings: every
    // exact near-dup pair at the threshold should be recalled (precision is
    // 1.0 by construction — candidates are exactly rescored).
    val emb10 = spark.read.parquet(s"$sf/embeddings.parquet")
    def pairs10(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact10 = pairs10(graft.ops.Similarity.nearDupPairsExact(
      emb10, "vec_id", "embedding", 0.35))
    val lsh10 = pairs10(graft.ops.Similarity.embeddingNearDups(
      emb10, "vec_id", "embedding", threshold = 0.35, planes = 3, rotations = 14))
    val rec10 = if (exact10.isEmpty) 1.0
      else (lsh10 & exact10).size.toDouble / exact10.size
    println(f"SMOKE10 embeddingNearDups: exact=${exact10.size} lsh=${lsh10.size} " +
      f"recall=$rec10%.2f => " +
      (if (exact10.nonEmpty && rec10 >= 0.9 && (lsh10 -- exact10).isEmpty)
        "OK" else "BROKEN"))

    // 11. Corpus ops on real documents: contamination must equal a direct
    // array-intersect reformulation; stratified sample obeys per-stratum k;
    // quality gate keeps exactly the rows a sort-based median check keeps.
    val docs11 = spark.read.parquet(s"$sf/documents.parquet")
    val evalSel = col("doc_id") % 53 === 0
    val cont = graft.ops.Corpus.contamination(
      docs11.filter(!evalSel), docs11.filter(evalSel), "doc_id", "text", 3)
    val evalAll = docs11.filter(evalSel)
      .select(explode(graft.ops.Corpus.wordNgrams(col("text"), 3)).as("g"))
      .distinct().agg(collect_list(col("g")).as("gs"))
    val direct11 = docs11.filter(!evalSel).crossJoin(evalAll)
      .select(col("doc_id"), size(array_intersect(
        graft.ops.Corpus.wordNgrams(col("text"), 3), col("gs"))).as("n2"))
      .filter(col("n2") > 0)
    val contMism = cont.join(direct11, Seq("doc_id"), "full")
      .filter(col("n_shared").isNull || col("n2").isNull ||
        col("n_shared") =!= col("n2")).count()
    val contRows = cont.count()
    val strat = graft.ops.Corpus.stratifiedTopK(docs11,
      Seq(col("source")), Seq(col("lang"), col("doc_id")), 2)
    val stratBad = strat.groupBy("source").count()
      .filter(col("count") > 2).count()
    val gate = graft.ops.Corpus.aboveQuantile(
      docs11.select(col("doc_id"),
        graft.ops.TextOps.tokenCount(col("text")).as("nt")), col("nt"), 0.5)
    val sorted11 = docs11.select(graft.ops.TextOps.tokenCount(col("text"))
      .as("nt")).collect().map(_.getLong(0)).sorted
    val rank11 = (sorted11.length - 1) * 0.5
    val lo11 = rank11.toInt
    val med11 = sorted11(lo11) + (rank11 - lo11) *
      (sorted11(math.min(lo11 + 1, sorted11.length - 1)) - sorted11(lo11))
    val gateExpect = sorted11.count(_ >= med11)
    val gateRows = gate.count()
    // decontaminate must keep exactly (train − contaminated) documents
    val trainN = docs11.filter(!evalSel).count()
    val cleanN = graft.ops.Corpus.decontaminate(
      docs11.filter(!evalSel), docs11.filter(evalSel), "doc_id", "text", 3).count()
    println(s"SMOKE11 corpus: contRows=$contRows contMism=$contMism " +
      s"stratOverK=$stratBad gate=$gateRows/expect=$gateExpect " +
      s"clean=$cleanN/expect=${trainN - contRows} => " +
      (if (contRows > 0 && contMism == 0 && stratBad == 0 &&
        gateRows == gateExpect && cleanN == trainN - contRows) "OK"
      else "BROKEN"))

    // 12. Batched kNN join on real embeddings: the exact path must agree
    // with a plain driver-side brute force (independent ground truth, not
    // the library's own scorer), and the LSH path must recall >= 0.9 of it.
    val q12 = emb10.filter(col("vec_id") % 50 === 0)
    val c12 = emb10.filter(col("vec_id") % 50 =!= 0 && col("vec_id") < 200)
    def vecs12(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos12(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val corpus12 = vecs12(c12)
    val brute12 = vecs12(q12).flatMap { case (qid, qv) =>
      corpus12.map { case (cid, cv) =>
        (qid, cid, BigDecimal(cos12(qv, cv)).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.sortBy { case (_, cid, s) => (-s, cid) }.take(5)
    }.map { case (qid, cid, _) => (qid, cid) }.toSet
    def knnPairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact12 = knnPairs(graft.ops.Similarity.topKPerQueryExact(
      q12, c12, "vec_id", "embedding", k = 5))
    val lsh12 = knnPairs(graft.ops.Similarity.topKPerQuery(
      q12, c12, "vec_id", "embedding", k = 5, planes = 3, rotations = 14))
    val rec12 = if (exact12.isEmpty) 0.0
      else (lsh12 & exact12).size.toDouble / exact12.size
    println(f"SMOKE12 knnJoin: brute=${brute12.size} exact=${exact12.size} " +
      f"exactMatchesBrute=${exact12 == brute12} lshRecall=$rec12%.2f => " +
      (if (exact12.nonEmpty && exact12 == brute12 && rec12 >= 0.9)
        "OK" else "BROKEN"))

    // 13. verifyMirrors detector on the store SMOKE9 built: healthy → zero
    // deltas; a primary-only append (the documented crash window) → exactly
    // the orphaned edge; repairMirror → zero again.
    val db13 = "graft_smoke_store"
    val healthy13 = graft.sources.GraphStore.verifyMirrors(spark, db13).count()
    val aligned13 = Seq((888L, "orders:999998", "customer:2", "placed_by",
        2L, Map.empty[String, String]))
      .toDF("_rel_id", "_from", "_to", "rel_type", "_created_at", "props")
      .select(spark.table(s"$db13.edges_by_from").columns.map(col): _*)
    val spec13 = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(
        "edges_by_from", Some(db13))).bucketSpec.get
    aligned13.write.mode(org.apache.spark.sql.SaveMode.Append)
      .bucketBy(spec13.numBuckets, spec13.bucketColumnNames.head)
      .sortBy(spec13.sortColumnNames.head)
      .format("parquet").saveAsTable(s"$db13.edges_by_from")
    val deltas13 = graft.sources.GraphStore.verifyMirrors(spark, db13).collect()
    val named13 = deltas13.length == 1 && deltas13(0).getLong(0) == 888L &&
      deltas13(0).getLong(4) == 1L && deltas13(0).getLong(5) == 0L
    graft.sources.GraphStore.repairMirror(spark, db13)
    val repaired13 = graft.sources.GraphStore.verifyMirrors(spark, db13).count()
    println(s"SMOKE13 verifyMirrors: healthy=$healthy13 orphanNamed=$named13 " +
      s"afterRepair=$repaired13 => " +
      (if (healthy13 == 0 && named13 && repaired13 == 0) "OK" else "BROKEN"))

    // 14. batched IVF kNN against the same exact ground truth as SMOKE12.
    val ix14 = graft.ops.IvfIndex.build(c12, "vec_id", "embedding", k = 8)
    val ivf14 = knnPairs(graft.ops.IvfIndex.topKPerQuery(q12, ix14,
      "vec_id", "embedding", topK = 5, nProbe = 6))
    val rec14 = if (exact12.isEmpty) 0.0
      else (ivf14 & exact12).size.toDouble / exact12.size
    println(f"SMOKE14 ivfKnn: exact=${exact12.size} ivf=${ivf14.size} " +
      f"recall=$rec14%.2f => " +
      (if (exact12.nonEmpty && rec14 >= 0.9) "OK" else "BROKEN"))

    // 15. versioned IVF store + incremental append, end-to-end: train on a
    // slice, save, append the rest (no retrain), probe the appended store
    // against SMOKE12's exact ground truth; a reader holding the
    // pre-overwrite version must keep answering (grace window).
    val dir15 = java.nio.file.Files.createTempDirectory("smoke-ivf").toString
    val half15 = c12.filter(col("vec_id") < 100)
    graft.ops.IvfIndex.save(
      graft.ops.IvfIndex.build(half15, "vec_id", "embedding", k = 8), dir15)
    val held15 = graft.ops.IvfIndex.load(spark, dir15)
    val (app15, drift15) = graft.ops.IvfIndex.append(spark, dir15,
      c12.filter(col("vec_id") >= 100), "vec_id", "embedding")
    val ivf15 = knnPairs(graft.ops.IvfIndex.topKPerQuery(q12, app15,
      "vec_id", "embedding", topK = 5, nProbe = 6))
    val rec15 = if (exact12.isEmpty) 0.0
      else (ivf15 & exact12).size.toDouble / exact12.size
    // overwrite save: the held reader's version survives one swap
    graft.ops.IvfIndex.save(
      graft.ops.IvfIndex.build(c12, "vec_id", "embedding", k = 4), dir15)
    val heldOk15 = held15.cells.count() == half15.count()
    val newK15 = graft.ops.IvfIndex.load(spark, dir15).centroids.length
    println(f"SMOKE15 ivfAppend: recall=$rec15%.2f drift=$drift15%.2f " +
      s"heldReader=$heldOk15 reloadK=$newK15 => " +
      (if (rec15 >= 0.9 && drift15 > 0 && drift15 < 1.5 && heldOk15 &&
        newK15 == 4) "OK" else "BROKEN"))

    // 16. streaming near-dup ingest deduplicates against its OWN output:
    // a real MemoryStream feeding a growing parquet store the corpus thunk
    // re-reads per micro-batch; batch 2's near-dup of batch 1's admitted
    // document must drop, its fresh companion must pass.
    {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import graft.streaming.EventStreams
      implicit val sq = spark.sqlContext
      val store16 = java.nio.file.Files
        .createTempDirectory("smoke-ingest").toString + "/corpus"
      Seq((100L, "seed corpus text matching nothing else in this smoke"))
        .toDF("doc_id", "text").write.parquet(store16)
      val mem16 = MemoryStream[EventStreams.Doc]
      val q16 = EventStreams.nearDupIngestStream(mem16.toDF(),
        () => spark.read.parquet(store16), "doc_id", "text") { (clean, _) =>
        clean.select(col("doc_id"), col("text"))
          .write.mode("append").parquet(store16)
      }
      try {
        mem16.addData(EventStreams.Doc(1L,
          java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
          "the quick brown fox jumps over the lazy dog every single day"))
        q16.processAllAvailable()
        mem16.addData(
          EventStreams.Doc(2L,
            java.sql.Timestamp.valueOf("2024-01-01 10:05:00"),
            "the quick brown fox jumps over the lazy dog every single week"),
          EventStreams.Doc(3L,
            java.sql.Timestamp.valueOf("2024-01-01 10:06:00"),
            "a completely unrelated financial report from another world"))
        q16.processAllAvailable()
      } finally q16.stop()
      val ids16 = spark.read.parquet(store16)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      println(s"SMOKE16 ingestSelfDedup: store=$ids16 => " +
        (if (ids16 == Set(100L, 1L, 3L)) "OK" else "BROKEN"))
    }

    // 17. semantic (embedding) blocker on the ingest stream, run with the
    // ops-side stage checkpoints routed through reliable mode: doc 2 shares
    // no shingles with batch-1's admitted doc 1 but has cosine ~0.995 to
    // its embedding, so ONLY the vecCol blocker can drop it — and every
    // Dedup/Similarity stage inside the micro-batch pins via
    // sparkContext.checkpoint instead of localCheckpoint.
    {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import graft.streaming.EventStreams
      implicit val sq = spark.sqlContext
      spark.sparkContext.setCheckpointDir(java.nio.file.Files
        .createTempDirectory("smoke-reliable").toString)
      spark.conf.set("graft.lifecycle.checkpoint", "reliable")
      val store17 = java.nio.file.Files
        .createTempDirectory("smoke-ingest-sem").toString + "/corpus"
      Seq((100L, "seed corpus text entirely unlike anything that follows",
          Seq(0f, 0f, 1f, 0f)))
        .toDF("doc_id", "text", "embedding").write.parquet(store17)
      val mem17 = MemoryStream[EventStreams.DocEmb]
      val q17 = EventStreams.nearDupIngestStream(mem17.toDF(),
        () => spark.read.parquet(store17), "doc_id", "text",
        vecCol = Some("embedding")) { (clean, _) =>
        clean.select(col("doc_id"), col("text"), col("embedding"))
          .write.mode("append").parquet(store17)
      }
      try {
        mem17.addData(EventStreams.DocEmb(1L,
          java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
          "discussion of fiscal policy in the northern province",
          Seq(1f, 0f, 0f, 0f)))
        q17.processAllAvailable()
        mem17.addData(
          EventStreams.DocEmb(2L,
            java.sql.Timestamp.valueOf("2024-01-01 10:05:00"),
            "a chat about monetary matters up north",
            Seq(0.99f, 0.1f, 0f, 0f)),
          EventStreams.DocEmb(3L,
            java.sql.Timestamp.valueOf("2024-01-01 10:06:00"),
            "marine biology survey of reef ecosystems",
            Seq(0f, 1f, 0f, 0f)))
        q17.processAllAvailable()
      } finally q17.stop()
      spark.conf.set("graft.lifecycle.checkpoint", "local")
      val ids17 = spark.read.parquet(store17)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      println(s"SMOKE17 semanticIngest(reliable): store=$ids17 => " +
        (if (ids17 == Set(100L, 1L, 3L)) "OK" else "BROKEN"))
    }

    // 18. round-14 surface: the persisted int8 code store (QuantizedStore
    // save → params/codes → stored probe ≡ on-the-fly probe) and the
    // SHARED staged near-dup edge parquet feeding both triangle gates —
    // q84's absolute slice must be a subset of the uncapped full-corpus
    // closure, and (at this scale, where every doc_id < 2000 and max
    // degree < 20) q84, q87, and a from-scratch uncapped run must agree.
    {
      val emb18 = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      val corpus18 = emb18.filter(col("vec_id") % 50 =!= 0 && col("vec_id") < 200)
      val qs18 = emb18.filter(col("vec_id") % 50 === 0)
      val store18 = java.nio.file.Files
        .createTempDirectory("smoke-qstore").toString
      graft.sources.QuantizedStore.save(corpus18, "vec_id", "embedding", store18)
      val (mn18, mx18) = graft.sources.QuantizedStore.params(spark, store18)
      def set18(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val stored18 = set18(graft.ops.Similarity.topKPerQueryQuantizedStored(
        qs18, graft.sources.QuantizedStore.codes(spark, store18),
        mn18, mx18, "vec_id", "embedding", k = 5)
        .select("query_id", "neighbor_id", "score"))
      val fly18 = set18(graft.ops.Similarity.topKPerQueryQuantized(
        qs18, corpus18, "vec_id", "embedding", k = 5)
        .select("query_id", "neighbor_id", "score"))
      val dir18 = "/root/testdata/sf0.001"
      def tri18(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val q84 = tri18(SparkEntry.queries("q84_triangles")(spark, dir18))
      val q87 = tri18(SparkEntry.queries("q87_triangles_capped")(spark, dir18))
      val scratch = tri18 {
        graft.graph.GraphAnalytics.triangles(graft.ops.Dedup.simhashNearPairs(
          graft.ops.Dedup.simhash(Testbed.graph(spark, dir18)
            .collection("documents"), "doc_id", "text",
            hash = graft.ops.BaseHash.Md5), maxDist = 6))
      }
      // q84's slice covers every sf0.001 doc_id, so it must EQUAL the
      // from-scratch uncapped closure; q87's degree cap may legitimately
      // drop hub triangles (it does at sf0.001), so subset — the cap's
      // exactness is the oracle's job, the staging's fidelity is ours.
      println(s"SMOKE18 quantStore+stagedTriangles: stored=${stored18.size} " +
        s"parity=${stored18 == fly18} q84=${q84.size} " +
        s"sliceExact=${q84 == scratch} capSubset=${q87.subsetOf(scratch)} => " +
        (if (stored18.nonEmpty && stored18 == fly18 && q84.nonEmpty
            && q84 == scratch && q87.subsetOf(scratch)) "OK" else "BROKEN"))
    }

    // 19. round-14 signature index: store built from the real documents
    // table, stored cross probes ≡ recompute blockers, and one indexed
    // ingest micro-batch through the real streaming path (kept docs land
    // in the sink AND grow the index).
    {
      val dir19 = java.nio.file.Files
        .createTempDirectory("smoke-sigstore").toString
      val store19 = s"$dir19/store"
      val corpus19 = docs.filter(col("doc_id") % 7 =!= 0)
      val batch19 = docs.filter(col("doc_id") % 7 === 0)
      graft.sources.SignatureStore.save(corpus19, "doc_id", "text", store19)
      def keyset(df: org.apache.spark.sql.DataFrame) =
        df.select("id_a", "id_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val mh19 = keyset(graft.sources.SignatureStore
        .crossCandidatePairsStored(spark, store19, batch19, "doc_id", "text"))
      val mh19d = keyset(graft.ops.Dedup.crossCandidatePairs(
        batch19, corpus19, "doc_id", "text"))
      val sh19 = keyset(graft.sources.SignatureStore
        .crossSimhashNearPairsStored(spark, store19, batch19, "doc_id", "text"))
      val sh19d = keyset(graft.ops.Dedup.crossSimhashNearPairs(
        batch19, corpus19, "doc_id", "text"))
      val sink19 = s"$dir19/sink"
      val before19 = graft.sources.SignatureStore.sigs(spark, store19).count()
      implicit val sq = spark.sqlContext
      import spark.implicits._
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[graft.streaming.EventStreams.Doc]
      val dupText = corpus19.orderBy("doc_id").limit(1)
        .select("text").collect().head.getString(0)
      mem.addData(
        graft.streaming.EventStreams.Doc(900000001L,
          java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), dupText),
        graft.streaming.EventStreams.Doc(900000002L,
          java.sql.Timestamp.valueOf("2024-01-01 10:01:00"),
          "a genuinely fresh smoke nineteen document unlike the corpus"))
      val q19 = graft.streaming.EventStreams.nearDupIngestStreamIndexed(
        mem.toDF(), store19, "doc_id", "text") { (clean, _) =>
        clean.select(col("doc_id"), col("text"))
          .write.mode("append").parquet(sink19)
      }
      val kept19 =
        try {
          q19.processAllAvailable()
          spark.read.parquet(sink19).select("doc_id")
            .collect().map(_.getLong(0)).toSet
        } finally q19.stop()
      val after19 = graft.sources.SignatureStore.sigs(spark, store19).count()
      println(s"SMOKE19 sigStore: mhPairs=${mh19.size} mhParity=${mh19 == mh19d} " +
        s"shPairs=${sh19.size} shParity=${sh19 == sh19d} " +
        s"ingestKept=$kept19 indexGrew=${after19 - before19} => " +
        (if (mh19.nonEmpty && mh19 == mh19d && sh19 == sh19d
            && kept19 == Set(900000002L) && after19 - before19 == 1)
          "OK" else "BROKEN"))
    }

    // 20. Round-14 sketch additions end-to-end on real tables: CMS
    // heavy hitters vs exact counts, bloom-pruned decontamination vs the
    // plain anti-join, priority-sample subset-sum estimator vs truth.
    {
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      val cnt20 = graft.ops.Sketches.cmsCounters(li, Seq("l_returnflag"),
        Nil, col("l_suppkey"), depth = 4, width = 2048,
        hasher = graft.ops.BaseHash.Md5)
      val est20 = graft.ops.Sketches.cmsEstimate(cnt20, Seq("l_returnflag"),
        li, col("l_suppkey"), depth = 4, width = 2048,
        hasher = graft.ops.BaseHash.Md5)
      val exact20 = li.groupBy(col("l_returnflag"),
          col("l_suppkey").cast("string").as("key"))
        .agg(count(lit(1)).as("exact"))
      val joined20 = est20.join(exact20, Seq("l_returnflag", "key"))
      val under20 = joined20.filter(col("estimate") < col("exact")).count()
      val over20 = joined20.filter(col("estimate") > col("exact") * 2).count()
      val probedKeys = joined20.count()

      val contam20 = docs.filter(col("doc_id") % 7 === 0)
      val got20 = graft.ops.Bloom.prunedAntiJoin(docs,
          graft.ops.BaseHash.Md5.full(col("text")),
          contam20, graft.ops.BaseHash.Md5.full(col("text")),
          numBits = 4096, numHashes = 3, hasher = graft.ops.BaseHash.Md5)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val want20 = docs.join(contam20.select(col("text").as("_t")),
          col("text") === col("_t"), "left_anti")
        .select("doc_id").collect().map(_.getLong(0)).toSet

      val ps20 = graft.ops.Sketches.prioritySample(docs, Seq("lang"),
        col("doc_id"), col("n_chars"), k = 20,
        hasher = graft.ops.BaseHash.Md5)
      val estTot20 = ps20.groupBy("lang")
        .agg(sum(col("w_hat")).as("est")).orderBy("lang")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val truth20 = docs.filter(col("n_chars") > 0).groupBy("lang")
        .agg(sum(col("n_chars")).cast("double").as("t")).orderBy("lang")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val maxRel20 = truth20.map { case (l, t) =>
        math.abs(estTot20.getOrElse(l, 0.0) - t) / t }.max

      println(f"SMOKE20 sketches14: cmsProbed=$probedKeys under=$under20 " +
        f"over2x=$over20 bloomOk=${got20 == want20} " +
        f"psMaxRelErr=$maxRel20%.3f => " +
        (if (probedKeys > 0 && under20 == 0 && over20 == 0
            && got20 == want20 && maxRel20 < 0.5) "OK" else "BROKEN"))

      // 21. Lexical retrieval end-to-end: BM25 over the real corpus text,
      // direct vs posting-store vs appended-store (all three must agree
      // row-for-row), retrieval sanity (every hit contains a query term),
      // and keyword extraction rank bounds.
      val q21 = Seq("dup", "vector", "batch")
      val direct21 = graft.ops.Lexical.bm25TopK(docs, "doc_id", "text",
        q21, 10).collect().map(_.toSeq).toSeq
      val store21 = java.nio.file.Files
        .createTempDirectory("smoke-posting").toString
      graft.sources.PostingStore.save(docs, "doc_id", "text", store21)
      val stored21 = graft.sources.PostingStore.searchTopK(spark, store21,
        q21, 10).collect().map(_.toSeq).toSeq
      val grown21 = java.nio.file.Files
        .createTempDirectory("smoke-posting-app").toString
      graft.sources.PostingStore.save(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", grown21)
      graft.sources.PostingStore.append(spark, grown21,
        docs.filter(col("doc_id") % 2 =!= 0), "doc_id", "text")
      val appended21 = graft.sources.PostingStore.searchTopK(spark,
        grown21, q21, 10).collect().map(_.toSeq).toSeq
      val hitIds21 = direct21.map(_.head.asInstanceOf[Long]).toSet
      val hitsContain21 = docs
        .filter(col("doc_id").isin(hitIds21.toSeq: _*))
        .filter(!q21.map(t => col("text").contains(t)).reduce(_ || _))
        .count()
      val kw21 = graft.ops.Lexical.tfidfKeywords(docs, "doc_id", "text", 3)
      val kwBad21 = kw21.filter(col("rnk") > 3 || col("score_micro") < 0)
        .count()
      println(s"SMOKE21 lexical: hits=${direct21.size} " +
        s"storedParity=${stored21 == direct21} " +
        s"appendParity=${appended21 == direct21} " +
        s"offTopicHits=$hitsContain21 kwBadRows=$kwBad21 => " +
        (if (direct21.nonEmpty && stored21 == direct21 &&
            appended21 == direct21 && hitsContain21 == 0 && kwBad21 == 0)
          "OK" else "BROKEN"))
    }

    // 22. Product quantization (round 15): ADC probe over fly-coded,
    // stored, and appended corpora must agree bit-for-bit; recall vs the
    // exact kNN join must clear the quantization-error screen.
    {
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      val corpus22 = emb.filter(col("vec_id") % 10 =!= 0)
      val queries22 = emb.filter(col("vec_id") % 10 === 0)
      val model22 = graft.ops.Pq.train(corpus22, "embedding", m = 32, ks = 64)
      val fly22 = graft.ops.Pq.topKPerQueryAdc(queries22,
        graft.ops.Pq.encode(corpus22, "vec_id", "embedding", model22),
        model22, "vec_id", "embedding", k = 10)
        .collect().map(_.toSeq).toSet
      val dir22 = java.nio.file.Files.createTempDirectory("smoke-pq").toString
      graft.sources.PqStore.save(corpus22.filter(col("vec_id") < 300),
        "vec_id", "embedding", model22, dir22)
      graft.sources.PqStore.append(spark, dir22,
        corpus22.filter(col("vec_id") >= 300), "vec_id", "embedding")
      val stored22 = graft.ops.Pq.topKPerQueryAdc(queries22,
        graft.sources.PqStore.codes(spark, dir22),
        graft.sources.PqStore.codebooks(spark, dir22),
        "vec_id", "embedding", k = 10)
        .collect().map(_.toSeq).toSet
      val exact22 = graft.ops.Similarity.crossNearDupsExact(
          corpus22, queries22, "vec_id", "embedding", threshold = -1.0)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("id_b")
            .orderBy(col("score").desc, col("id_a"))))
        .filter(col("rank") <= 10)
        .select(col("id_b"), col("id_a"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val adcPairs22 = fly22.map(s => (s(0), s(1)))
        .map { case (q, n) => (q.asInstanceOf[Long], n.asInstanceOf[Long]) }
      val rec22 = adcPairs22.count(exact22.contains).toDouble / exact22.size
      println(s"SMOKE22 pqAdc: fly=${fly22.size} " +
        s"storedAppendParity=${stored22 == fly22} " +
        f"recall=$rec22%.2f => " +
        (if (fly22.nonEmpty && stored22 == fly22 && rec22 >= 0.65)
          "OK" else "BROKEN"))
    }

    // 23. Verbatim span extraction (round 15): every emitted span must be
    // a REAL shared substring at the claimed 1-based offsets (re-checked
    // here against the raw text, independently of the operator's own
    // verify pass), maximal-run length >= minLen, and ids ordered.
    {
      val docs23 = spark.read.parquet(s"$sf/documents.parquet")
      val spans23 = graft.ops.Dedup.verbatimSpans(
          docs23, "doc_id", "text", k = 12, minLen = 30,
          maxOccurrences = 50, hash = graft.ops.BaseHash.Md5)
        .collect()
      val text23 = docs23.select("doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val bad23 = spans23.count { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        val (sa, sb, len) = (r.getInt(2), r.getInt(3), r.getInt(4))
        val subA = text23(a).substring(sa - 1, sa - 1 + len)
        val subB = text23(b).substring(sb - 1, sb - 1 + len)
        subA != subB || len < 30 || a >= b
      }
      // excision re-check: rebuild each affected doc's clean text with
      // plain Scala string surgery and compare to the operator's output
      val cuts23 = spans23.map(r => (r.getLong(1), r.getInt(3), r.getInt(4)))
        .groupBy(_._1)
      val out23 = graft.ops.Dedup.exciseSpans(docs23, "doc_id", "text",
          spark.createDataFrame(spans23.toSeq.map(r =>
            (r.getLong(1), r.getInt(3), r.getInt(4))))
            .toDF("id", "start", "len"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val badCut23 = cuts23.count { case (id, ss) =>
        val t = text23(id)
        val keep = Array.fill(t.length)(true)
        ss.foreach { case (_, st, len) =>
          (st - 1 until math.min(st - 1 + len, t.length))
            .foreach(keep(_) = false) }
        val expect = t.zipWithIndex.collect {
          case (c, i) if keep(i) => c }.mkString
        out23.get(id) != Some(expect)
      }
      println(s"SMOKE23 verbatimSpans: spans=${spans23.length} " +
        s"badOffsets=$bad23 excisedDocs=${out23.size} badCuts=$badCut23 => " +
        (if (spans23.nonEmpty && bad23 == 0 && out23.nonEmpty &&
          badCut23 == 0) "OK" else "BROKEN"))
    }

    // 24. round-15b wave: zorder / weighted sample / attribution /
    // containment / kcore / bigram LM, each re-checked by plain Scala
    // recomputation on the collected (small-sf) inputs.
    {
      // zorder: Scala reference interleave over 200 orders rows
      val ord24 = spark.read.parquet(s"$sf/orders.parquet")
        .select(col("o_custkey").cast("long").as("a"),
          datediff(col("o_orderdate"), lit("1992-01-01")).cast("long")
            .as("b"),
          graft.ops.Layout.zorderKey2(col("o_custkey"),
            datediff(col("o_orderdate"), lit("1992-01-01")), 16).as("z"))
        .limit(200).collect()
      def ref24(a: Long, b: Long): Long = (0 until 16).map { j =>
        (((a & 0xffff) >> j & 1L) << (2 * j + 1)) |
          (((b & 0xffff) >> j & 1L) << (2 * j))
      }.reduce(_ | _)
      val zBad = ord24.count(r =>
        r.getLong(2) != ref24(r.getLong(0), r.getLong(1)))

      // weighted sample: deterministic re-run, exact k, weights positive
      val ws = graft.ops.Corpus.weightedSampleTopK(docs,
        concat(lit("s:"), col("doc_id")), col("n_chars"), k = 25)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val ws2 = graft.ops.Corpus.weightedSampleTopK(docs.repartition(7),
        concat(lit("s:"), col("doc_id")), col("n_chars"), k = 25)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val wsOk = ws.size == 25 && ws == ws2

      // attribution: per-conversion credit conservation (sum over a
      // conversion's touches is 1e6 for n<=2, 1e6 minus the dropped
      // integer-div remainder otherwise) re-checked from raw events
      val ev24 = spark.read.parquet(s"$sf/events.parquet")
      val att = graft.ops.Behavior.attributionPositional(ev24, "user_id",
        "event_type", "ts", "event_id", Seq("click", "view"), "purchase")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2))).toMap
      val raw24 = ev24.select(col("user_id"), col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("tus"),
          col("event_id"))
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getLong(2), r.getLong(3)))
      val perUser = raw24.groupBy(_._1)
      var expTouch = Map.empty[String, Long].withDefaultValue(0L)
      var expCred = Map.empty[String, Long].withDefaultValue(0L)
      perUser.values.foreach { evs =>
        val sorted = evs.sortBy(e => (e._3, if (e._2 == "purchase") 1 else 0,
          e._4))
        val convs = sorted.filter(_._2 == "purchase")
        val touches = sorted.filter(e => e._2 == "click" || e._2 == "view")
        val grouped = touches.flatMap { t =>
          convs.find(c => c._3 > t._3 ||
            (c._3 == t._3)).map(c => (c._4, t))
        }.groupBy(_._1)
        grouped.values.foreach { g =>
          val seq24 = g.map(_._2).sortBy(e => (e._3, e._4))
          val n = seq24.length
          seq24.zipWithIndex.foreach { case (t, i) =>
            val credit =
              if (n == 1) 1000000L
              else if (n == 2) 500000L
              else if (i == 0 || i == n - 1) 400000L
              else 200000L / (n - 2)
            expTouch += t._2 -> (expTouch(t._2) + 1)
            expCred += t._2 -> (expCred(t._2) + credit)
          }
        }
      }
      val attOk = Seq("click", "view").forall(ty =>
        att.get(ty).contains((expTouch(ty), expCred(ty))))

      // containment: brute-force recheck on the 40-doc slice
      val cont = graft.ops.Dedup.containmentPairs(
        docs.filter(col("doc_id") < 40), "doc_id", "text",
        shingleN = 3, minContainMicro = 400000L,
        maxDocsPerShingle = 1000L).collect()
      val sh24 = docs.filter(col("doc_id") < 40)
        .select(col("doc_id").cast("long"), col("text")).collect()
        .map(r => r.getLong(0) -> {
          val t = r.getString(1)
          if (t.length >= 3) (0 to t.length - 3).map(i =>
            t.substring(i, i + 3)).toSet
          else Set(t)
        }).toMap
      val contBad = cont.count { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        val inter = (sh24(a) intersect sh24(b)).size.toLong
        r.getLong(2) != inter ||
          r.getLong(5) != inter * 1000000L / sh24(a).size ||
          r.getLong(6) != inter * 1000000L / sh24(b).size
      }

      // kcore: brute-force peel on the collected capped edge set
      val edges24 = graft.ops.Dedup.simhashNearPairs(
        graft.ops.Dedup.simhash(docs, "doc_id", "text",
          hash = graft.ops.BaseHash.Md5), maxDist = 6)
      val core = graph.GraphAnalytics.kCore(edges24, k = 2, maxPeels = 4,
        maxDegree = Some(20L)).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      var es = edges24.select(least(col("id_a"), col("id_b")),
          greatest(col("id_a"), col("id_b"))).distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).filter(e => e._1 != e._2)
      def degs(e: Array[(Long, Long)]) =
        (e.map(_._1) ++ e.map(_._2)).groupBy(identity).map {
          case (k2, v) => k2 -> v.length.toLong }
      val d0 = degs(es)
      es = es.filter(e => d0(e._1) <= 20 && d0(e._2) <= 20)
      (1 to 4).foreach { _ =>
        val d = degs(es)
        es = es.filter(e => d(e._1) >= 2 && d(e._2) >= 2)
      }
      val coreOk = core == degs(es)

      // bigram LM: every mixture logprob is negative and doc count
      // matches the >=2-token population
      val blp = graft.ops.Corpus.bigramLogProb(docs, "doc_id", "text")
        .collect()
      val nMulti = docs.filter(size(split(col("text"), " ")) >= 2).count()
      val blpOk = blp.length == nMulti && blp.forall(_.getDouble(1) < 0)

      println(s"SMOKE24 round15b: zBad=$zBad wsOk=$wsOk attOk=$attOk " +
        s"contPairs=${cont.length} contBad=$contBad coreOk=$coreOk " +
        s"blpDocs=${blp.length} blpOk=$blpOk => " +
        (if (zBad == 0 && wsOk && attOk && cont.nonEmpty && contBad == 0 &&
          coreOk && blpOk) "OK" else "BROKEN"))
    }

    // 25. nearest-event join re-checked by per-user brute force; HITS
    // invariants (unit L2 norms, deterministic across layout) on the
    // full testdata overlay.
    {
      val ev25 = spark.read.parquet(s"$sf/events.parquet")
        .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
          col("event_id"), col("event_type"))
      val p25 = ev25.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "event_id")
      val c25 = ev25.filter(col("event_type") === "click")
        .select("user_id", "ts", "event_id")
      val near = graft.ops.TemporalJoins.nearestJoin(p25, c25,
          Seq("user_id")).collect()
        .map(r => r.getLong(2) -> Option(r.get(4)).map(_.asInstanceOf[Long]))
        .toMap
      val clicksByUser = c25.select(col("user_id"),
          unix_micros(col("ts")), col("event_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1)
      val purchases25 = p25.select(col("user_id"), unix_micros(col("ts")),
          col("event_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val nearBad = purchases25.count { case (u, t, pid) =>
        val want = clicksByUser.get(u).flatMap { cs =>
          val best = cs.minBy(c => (math.abs(c._2 - t), c._2))
          Some(best._3)
        }
        near.get(pid).flatten != want
      }

      val g25 = Testbed.graph(spark, sf)
      val hits25 = graft.graph.GraphAnalytics.hits(g25, iters = 3)
        .collect().map(r => (r.getString(0), r.getDouble(1),
          r.getDouble(2)))
      val hubNorm = math.sqrt(hits25.map(x => x._2 * x._2).sum)
      val authNorm = math.sqrt(hits25.map(x => x._3 * x._3).sum)
      val hitsOk = hits25.nonEmpty &&
        math.abs(hubNorm - 1.0) < 0.01 && math.abs(authNorm - 1.0) < 0.01 &&
        hits25.forall(x => x._2 >= 0 && x._3 >= 0)

      println(f"SMOKE25 nearest+hits: purchases=${purchases25.length} " +
        f"nearBad=$nearBad hitsNodes=${hits25.length} " +
        f"hubNorm=$hubNorm%.4f authNorm=$authNorm%.4f => " +
        (if (nearBad == 0 && hitsOk) "OK" else "BROKEN"))
    }

    // 26. round-15c wave on real data: LPA labels are node keys and
    // communities form; interval join re-checked by per-user brute
    // force; dailyTrend slope re-derived driver-side; negativeSample
    // pool/group invariants.
    {
      val g26 = Testbed.graph(spark, sf)
      val lpa = graft.graph.GraphAnalytics.labelPropagation(g26, 3)
        .collect().map(r => r.getString(0) -> r.getString(1))
      val lpaKeys = lpa.map(_._1).toSet
      val lpaOk = lpa.nonEmpty && lpa.map(_._2).forall(lpaKeys.contains) &&
        lpa.map(_._2).distinct.length < lpa.length

      val ev26 = spark.read.parquet(s"$sf/events.parquet")
        .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
          col("event_type"))
      def sess26(t: String, ix: String) =
        graft.ops.TemporalJoins.sessionIntervals(
          ev26.filter(col("event_type") === t)
            .select(col("user_id"), col("ts")),
          Seq("user_id"), gapUs = 3600L * 1000000)
          .withColumnRenamed("session_ix", ix)
      val ov = graft.ops.TemporalJoins.intervalJoin(
          sess26("click", "c_ix").withColumnRenamed("n_events", "cn"),
          sess26("error", "e_ix").withColumnRenamed("n_events", "en"),
          Seq("user_id"), "start_us", "end_us", bucketUs = 1800L * 1000000)
        .select("user_id", "c_ix", "e_ix").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      def iv(t: String) = sess26(t, "ix").select("user_id", "ix",
          "start_us", "end_us").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val want = (for {
        (u, ci, cs, ce) <- iv("click"); (u2, ei, es, ee) <- iv("error")
        if u == u2 && cs <= ee && es <= ce
      } yield (u, ci, ei)).sorted.toSeq
      val ovOk = ov == want && ov.distinct.size == ov.size

      val tr = graft.ops.Behavior.dailyTrend(
          spark.read.parquet(s"$sf/events.parquet")
            .filter(col("event_type") === "purchase"),
          "user_id", "ts", "value").collect()
        .map(r => r.getLong(0) -> r.getDouble(2)).toMap
      val daily = spark.read.parquet(s"$sf/events.parquet")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
          datediff(to_date(col("ts")), lit("2024-01-01")).cast("long")
            .as("x"),
          round(col("value") * 1000000).cast("long").as("vm"))
        .groupBy("user_id", "x").agg(sum("vm").as("y")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1)
      val trBad = tr.count { case (u, slope) =>
        val pts = daily(u).map(p => (p._2, p._3))
        val n = pts.size.toLong
        val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
        val sxx = pts.map(p => p._1 * p._1).sum
        val sxy = pts.map(p => p._1 * p._2).sum
        val s = (n * sxy - sx * sy).toDouble /
          (n * sxx - sx * sx).toDouble / 1000000.0
        math.abs(slope - BigDecimal(s).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble) > 1e-9
      }

      val negs = graft.ops.Corpus.negativeSample(docs, col("doc_id"),
          col("source"), anchorRateMicro = 200000L, poolSize = 16, k = 4,
          hash = graft.ops.BaseHash.Md5).collect()
        .map(r => (r.getString(0), r.getString(1)))
      val src = docs.select(col("doc_id").cast("string"), col("source"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val negBad = negs.count { case (a, n) => src(a) == src(n) }

      println(s"SMOKE26 round15c: lpaNodes=${lpa.length} " +
        s"communities=${lpa.map(_._2).distinct.length} ovPairs=${ov.size} " +
        s"ovOk=$ovOk trendKeys=${tr.size} trBad=$trBad " +
        s"negPairs=${negs.length} negBad=$negBad => " +
        (if (lpaOk && ovOk && trBad == 0 && negs.nonEmpty && negBad == 0)
          "OK" else "BROKEN"))
    }

    // SMOKE27: round-15d — two-stage prefix retrieval vs exact, MMR
    // rerank invariants, landmark closeness vs a driver-side BFS over
    // the real overlay.
    {
      val emb27 = spark.read.parquet(s"$sf/embeddings.parquet")
      val q27 = emb27.filter(col("vec_id") % 50 === 0)
      val c27 = emb27.filter(col("vec_id") % 50 =!= 0)
      val exact = graft.ops.Similarity.topKPerQueryExact(q27, c27,
          "vec_id", "embedding", k = 5)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // exactness law: a full-width prefix must reproduce exact kNN
      // bit-for-bit (recall under a NARROW prefix is a property of the
      // embedding distribution — the synthetic vectors are random, not
      // prefix-trained, so it is reported, not gated)
      val two64 = graft.ops.Similarity.twoStagePrefixTopK(q27, c27,
          "vec_id", "embedding", prefixDim = 64, m = 20, k = 5)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val ts64Ok = two64 == exact
      val two = graft.ops.Similarity.twoStagePrefixTopK(q27, c27,
          "vec_id", "embedding", prefixDim = 16, m = 20, k = 5)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = two.count(exact.contains).toDouble / exact.size

      val c27s = c27.filter(col("vec_id") < 200)
      val cands = graft.ops.Similarity.topKPerQueryExact(q27, c27s,
          "vec_id", "embedding", k = 10)
        .join(c27s.select(col("vec_id").as("neighbor_id"),
          col("embedding")), Seq("neighbor_id"))
      val mmr = graft.ops.Similarity.mmrRerank(cands, "neighbor_id",
          "embedding", picks = 3, lambdaMicro = 700000L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      val mmrPerQ = mmr.groupBy(_._1)
      val candSet = cands.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val rel1 = graft.ops.Similarity.topKPerQueryExact(q27, c27s,
          "vec_id", "embedding", k = 1)
        .select("query_id", "neighbor_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val mmrBad = mmrPerQ.count { case (qid, rows) =>
        rows.map(_._3).sorted.toSeq != Seq(1, 2, 3) ||
          rows.map(_._2).distinct.length != 3 ||
          rows.exists(t => !candSet.contains((t._1, t._2))) ||
          rows.find(_._3 == 1).exists(_._2 != rel1(qid))
      }

      val (sym27, nodes27) = SparkEntry.overlayFrames(spark, sf)
      val close = graph.GraphAnalytics.landmarkCloseness(sym27, nodes27,
          nLandmarks = 8, rounds = 3)
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      // driver-side BFS reference over the collected overlay
      val adj = sym27.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      val idOf = nodes27.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val keyOf = idOf.map(_.swap)
      val lms = idOf.values.toSeq.sorted.take(8)
      val distRef = scala.collection.mutable.Map[(Long, Long), Int]()
      lms.foreach { lm =>
        var frontier = Set(lm); var seen = Set(lm); var d = 0
        while (d < 3 && frontier.nonEmpty) {
          d += 1
          frontier = frontier.flatMap(n =>
            adj.getOrElse(n, Array.empty[Long])).diff(seen)
          frontier.foreach(n => distRef((n, lm)) = d)
          seen ++= frontier
        }
      }
      val wantClose = distRef.toSeq.groupBy(_._1._1).map { case (n, xs) =>
        keyOf(n) -> ((xs.size.toLong, xs.map(1000000L / _._2).sum))
      }
      val closeOk = close == wantClose

      println(s"SMOKE27 round15d: twoStage64Exact=$ts64Ok " +
        s"prefix16Recall=$recall mmrQueries=${mmrPerQ.size} " +
        s"mmrBad=$mmrBad closeNodes=${close.size} closeOk=$closeOk => " +
        (if (ts64Ok && mmrPerQ.nonEmpty && mmrBad == 0 && closeOk)
          "OK" else "BROKEN"))
    }

    // SMOKE28: round-15e — quality-aware survivors vs min-id policy on
    // real near-dup clusters, centroid outlier screen score sanity, and
    // histogram quantiles vs exact percentiles on real event values.
    {
      val d28 = docs.filter(col("doc_id") < 40)
      val pairs28 = graft.ops.Dedup.ngramJaccardPairs(d28, "doc_id",
          "text", shingleN = 3)
        .filter(col("jaccard") >= 0.5)
      val best = graft.ops.Dedup.keepBestSurvivors(d28, "doc_id",
          pairs28, col("n_chars"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val minId = graft.ops.Dedup.dropNearDuplicates(d28, "doc_id",
          pairs28)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val sameCount = best.size == minId.size // same clusters, one pick each
      val lens = d28.select(col("doc_id"), col("n_chars")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val bestTotal = best.toSeq.map(lens).sum
      val minTotal = minId.toSeq.map(lens).sum
      val bestWins = bestTotal >= minTotal // argmax length never loses chars

      val emb28 = spark.read.parquet(s"$sf/embeddings.parquet")
      val cents = graft.ops.Similarity.centroidCosine(emb28, "vec_id",
          "embedding", "label", dim = 64)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      val centOk = cents.nonEmpty && cents.forall(c =>
        c._3 >= -1.0001 && c._3 <= 1.0001)
      val nRows = emb28.count()

      val ev28 = spark.read.parquet(s"$sf/events.parquet")
        .filter(col("value").isNotNull)
      val hq = graft.ops.Sketches.histogramQuantiles(ev28, "event_type",
          "value", lo = 0.0, hi = 1000.0, bins = 256,
          qsMicro = Seq(500000L, 990000L))
        .collect().map(r => ((r.getString(0), r.getLong(1)),
          r.getLong(2))).toMap
      // the sketch reports the bin of the TYPE-1 quantile (the smallest
      // value whose cumulative fraction covers q — NOT the interpolated
      // percentile): recompute type-1 driver-side, re-bin it with the
      // same clamp arithmetic, assert bin equality
      val byKey = ev28.select("event_type", "value").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).groupBy(_._1)
        .map { case (k, v) => k -> v.map(_._2).sorted }
      def binOf(v: Double): Long = math.min(255L, math.max(0L,
        math.floor((v - 0.0) * 256.0 / 1000.0).toLong))
      val hqBad = byKey.count { case (k, xs) =>
        Seq(500000L, 990000L).exists { qm =>
          val idx = ((xs.length.toLong * qm + 999999L) / 1000000L - 1)
            .max(0L).toInt
          hq((k, qm)) != binOf(xs(idx))
        }
      }

      println(s"SMOKE28 round15e: survivors=${best.size} " +
        s"sameCount=$sameCount bestChars=$bestTotal minIdChars=$minTotal " +
        s"centRows=${cents.length}/$nRows centOk=$centOk " +
        s"hqKeys=${byKey.size} hqBad=$hqBad => " +
        (if (sameCount && bestWins && centOk && hqBad == 0)
          "OK" else "BROKEN"))
    }

    // SMOKE29: round-15f — golden records account for every named row
    // exactly once, and training triplets respect pair directionality +
    // group exclusion on real near-dup pairs.
    {
      val part29 = spark.read.parquet(s"$sf/part.parquet")
        .filter(col("p_partkey") % 5 === 0)
      val pairs29 = graft.ops.Linkage.fuzzyPairs(part29, "p_partkey",
        "p_name", substring_index(col("p_name"), " ", -2),
        maxDist = 3, maxBlock = 1000, maxBlockPerMille = Some(200L))
      val gr = graft.ops.Linkage.goldenRecords(part29, "p_partkey",
          "p_name", pairs29)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      val namedRows = part29.filter(col("p_name").isNotNull).count()
      val partition = gr.map(_._2).sum == namedRows // every row in ONE record
      val names = part29.select("p_name").collect()
        .map(_.getString(0)).toSet
      val modeReal = gr.forall(g => names.contains(g._3))

      val d29 = docs.filter(col("doc_id") < 40)
      val pos29 = graft.ops.Dedup.ngramJaccardPairs(d29, "doc_id",
          "text", shingleN = 3)
        .filter(col("jaccard") >= 0.5)
      val posSet = pos29.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0).toString, r.getLong(1).toString)).toSet
      val tri = graft.ops.Corpus.trainingTriplets(docs, col("doc_id"),
          col("source"), pos29, poolSize = 32, k = 4,
          hash = graft.ops.BaseHash.Md5)
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getString(2), r.getInt(3)))
      val src29 = docs.select(col("doc_id").cast("string"), col("source"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val triBad = tri.count { case (a, p, n, rk) =>
        !(posSet.contains((a, p)) || posSet.contains((p, a))) ||
          src29(a) == src29(n) || rk < 1 || rk > 4
      }
      val bothDirs = posSet.forall { case (x, y) =>
        tri.exists(t => t._1 == x && t._2 == y) ==
          tri.exists(t => t._1 == y && t._2 == x)
      }

      println(s"SMOKE29 round15f: records=${gr.length} " +
        s"partition=$partition modeReal=$modeReal " +
        s"triplets=${tri.length} triBad=$triBad bothDirs=$bothDirs => " +
        (if (partition && modeReal && gr.nonEmpty && tri.nonEmpty
          && triBad == 0 && bothDirs) "OK" else "BROKEN"))
    }

    // SMOKE30: round-16 — the planning layer end-to-end (zone maps →
    // prune verdicts consistent with a direct count; manifest store
    // fold == direct; compaction bins cover the manifest exactly),
    // link prediction non-edges only, pivot row/mass accounting, JL
    // stored == direct retrieval, feature-hash mass == token mass,
    // k-anonymity class sizes summing to the table.
    {
      import graft.ops.{Behavior, Layout, Lexical, Similarity}
      val li30 = spark.read.parquet(s"$sf/lineitem.parquet")
      val zm = Layout.pruneByRange(
        Layout.zoneMaps(li30, date_format(col("l_shipdate"), "yyyy-MM"),
          Seq("l_shipdate")),
        "l_shipdate", lit("1995-03-01 00:00:00").cast("timestamp"),
        lit("1995-09-30 00:00:00").cast("timestamp"))
      val zRows = zm.agg(sum("n_rows")).collect()(0).getLong(0)
      val zTotal = li30.count()
      // kept files must cover >= the rows actually matching the range
      val keptRows = zm.filter(col("keep")).agg(sum("n_rows"))
        .collect()(0).getLong(0)
      val matchRows = li30.filter(col("l_shipdate")
        .between("1995-03-01", "1995-09-30")).count()
      val zOk = zRows == zTotal && keptRows >= matchRows
      val manifestPath = java.nio.file.Files
        .createTempDirectory("smoke30-manifest").toString
      graft.sources.ManifestStore.save(
        li30.filter(col("l_orderkey") % 2 === 0), manifestPath,
        "date_format(l_shipdate, 'yyyy-MM')", Seq("l_shipdate"))
      graft.sources.ManifestStore.append(spark, manifestPath,
        li30.filter(col("l_orderkey") % 2 === 1), "rest")
      val storedRows = graft.sources.ManifestStore
        .zoneMapsStored(spark, manifestPath)
        .agg(sum("n_rows")).collect()(0).getLong(0)
      val docs30 = spark.read.parquet(s"$sf/documents.parquet")
      val manifest30 = docs30
        .groupBy(col("source"), expr("doc_id div 4").as("file_id"))
        .agg(coalesce(sum(octet_length(col("text"))), lit(0L))
          .as("bytes"))
      val packed = Layout.compactionPlan(manifest30, Seq("source"),
        "file_id", "bytes", 2048L)
      val packOk = packed.count() == manifest30.count() &&
        packed.groupBy("source", "bin").count().count() > 20
      val lp = graft.graph.GraphAnalytics.linkPrediction(
        SparkEntry.nearDupEdges(spark, sf), k = 50,
        maxDegree = Some(20L)).collect()
      val pv = Behavior.featurePivot(
        spark.read.parquet(s"$sf/events.parquet"), "user_id",
        "event_type", "value",
        Seq("view", "click", "purchase", "signup", "error"))
      val pvN = pv.count()
      val pvMass = pv.agg(sum(col("view_n")) + sum(col("click_n"))
        + sum(col("purchase_n")) + sum(col("signup_n"))
        + sum(col("error_n"))).collect()(0).getLong(0)
      val evTotal = spark.read.parquet(s"$sf/events.parquet").count()
      val emb30 = spark.read.parquet(s"$sf/embeddings.parquet")
      val jlPath = SparkEntry.jlStorePath(spark, emb30, sf)
      def pairs30(df: org.apache.spark.sql.DataFrame) = df
        .select("query_id", "neighbor_id", "rank").collect()
        .map(_.toSeq).toSet
      val q30 = emb30.filter(col("vec_id") % 50 === 0
        && col("vec_id") < 100000000L)
      val c30 = emb30.filter(col("vec_id") % 50 =!= 0)
      val jlStored = pairs30(graft.sources.JlStore.twoStageStored(
        spark, jlPath, q30, "vec_id", "embedding", 20, 5))
      val jlDirect = pairs30(Similarity.twoStageJlTopK(q30, c30,
        "vec_id", "embedding", 64, 16, 20, 5))
      val fh = Lexical.featureHash(docs30, "doc_id", "text", 64,
        graft.ops.BaseHash.Md5)
      val fhMass = fh.agg(sum(abs(col("weight")))).collect()(0)
        .getLong(0)
      val tokMass = Lexical.postings(docs30, "doc_id", "text")
        .agg(sum("tf")).collect()(0).getLong(0)
      val ka = graft.ops.Profile.kAnonymity(
        spark.read.parquet(s"$sf/customer.parquet"),
        Seq("c_nationkey", "c_mktsegment"), 20L, Some("c_acctbal"))
      val kaSum = ka.agg(sum("n_rows")).collect()(0).getLong(0)
      val custTotal = spark.read.parquet(s"$sf/customer.parquet").count()
      println(s"SMOKE30 round16: zoneOk=$zOk storedRows=$storedRows/" +
        s"$zTotal packOk=$packOk lpNonEdges=${lp.length} " +
        s"pivotUsers=$pvN pivotMass=$pvMass/$evTotal " +
        s"jlParity=${jlStored == jlDirect && jlStored.nonEmpty} " +
        s"fhMass=$fhMass<=$tokMass kaSum=$kaSum/$custTotal => " +
        (if (zOk && storedRows == zTotal && packOk && lp.nonEmpty
          && pvMass == evTotal && jlStored == jlDirect
          && jlStored.nonEmpty && fhMass <= tokMass && fhMass > 0
          && kaSum == custTotal) "OK" else "BROKEN"))
    }

    // SMOKE31: round-17 first wave — the maintenance hardening
    // end-to-end on real tables: (a) a SketchStore batch id replayed
    // AFTER compact+vacuum is still skipped and the counters are
    // byte-stable across the whole maintenance cycle; (b) JlStore
    // stored retrieval under RENAMED query columns equals the
    // original-name probe; (c) the skew advisor's share column still
    // sums to ~1e6 micros under its new per-column overflow guard.
    {
      val li31 = spark.read.parquet(s"$sf/lineitem.parquet")
      val storePath = java.nio.file.Files
        .createTempDirectory("smoke31-sketch").toString
      graft.sources.SketchStore.save(
        li31.filter(col("l_linenumber") <= 3), Seq("l_returnflag"),
        col("l_suppkey"), storePath, depth = 4, width = 512,
        hasher = graft.ops.BaseHash.Md5)
      graft.sources.SketchStore.append(spark, storePath,
        li31.filter(col("l_linenumber") > 3), col("l_suppkey"),
        batchId = "rest")
      val preMaint = graft.sources.SketchStore
        .counters(spark, storePath).collect().map(_.toSeq).toSet
      graft.sources.SketchStore.compact(spark, storePath)
      val replayAfterCompact = graft.sources.SketchStore.append(spark,
        storePath, li31.filter(col("l_linenumber") > 3),
        col("l_suppkey"), batchId = "rest")
      val vacuumed = graft.sources.SketchStore.vacuum(spark, storePath)
      val postMaint = graft.sources.SketchStore
        .counters(spark, storePath).collect().map(_.toSeq).toSet
      val emb31 = spark.read.parquet(s"$sf/embeddings.parquet")
      val jlPath31 = SparkEntry.jlStorePath(spark, emb31, sf)
      val q31 = emb31.filter(col("vec_id") % 50 === 0
        && col("vec_id") < 100000000L)
      def pairs31(df: org.apache.spark.sql.DataFrame) = df
        .select("query_id", "neighbor_id", "rank").collect()
        .map(_.toSeq).toSet
      val jlOrig = pairs31(graft.sources.JlStore.twoStageStored(
        spark, jlPath31, q31, "vec_id", "embedding", 20, 5))
      val jlRenamed = pairs31(graft.sources.JlStore.twoStageStored(
        spark, jlPath31,
        q31.select(col("vec_id").as("qid"), col("embedding").as("qv")),
        "qid", "qv", 20, 5))
      val orders31 = spark.read.parquet(s"$sf/orders.parquet")
      val cust31 = spark.read.parquet(s"$sf/customer.parquet")
      val skew = graft.ops.Skew.joinSkewReport(
        orders31.select(col("o_custkey").as("k")),
        cust31.select(col("c_custkey").as("k")), "k", k = 1000000)
      val shareSum = skew.agg(sum("share_micro")).collect()(0).getLong(0)
      println(s"SMOKE31 round17: counterStable=${preMaint == postMaint} " +
        s"replayGuard=${!replayAfterCompact} " +
        s"vacuumed=${vacuumed.size} " +
        s"jlRenamedParity=${jlOrig == jlRenamed && jlOrig.nonEmpty} " +
        s"skewShareSum=$shareSum => " +
        (if (preMaint == postMaint && preMaint.nonEmpty
          && !replayAfterCompact && vacuumed.nonEmpty
          && jlOrig == jlRenamed && jlOrig.nonEmpty
          && shareSum > 900000L && shareSum <= 1000000L)
          "OK" else "BROKEN"))
    }

    // SMOKE32: round-17 second wave — the compaction loop CLOSED and
    // k-anonymity ENFORCED, end-to-end on real tables: (a) plan → route
    // → rewriteLayout on a lineitem manifest store, then assert the
    // stored manifest equals a fresh zoneMaps pass over the rewritten
    // layout AND an append still folds under the post-rewrite naming;
    // (b) suppressSmallClasses' release re-audits 100% anonymous and
    // keeps exactly the rows of k-reaching classes.
    {
      val li32 = spark.read.parquet(s"$sf/lineitem.parquet")
        .select("l_orderkey", "l_shipdate", "l_quantity")
      val path32 = java.nio.file.Files
        .createTempDirectory("smoke32-manifest").toString
      graft.sources.ManifestStore.save(
        li32.filter(col("l_orderkey") % 2 === 0), path32,
        "date_format(l_shipdate, 'yyyy-MM')",
        Seq("l_shipdate", "l_quantity"))
      graft.sources.ManifestStore.append(spark, path32,
        li32.filter(col("l_orderkey") % 2 === 1), batchId = "rest")
      val m32 = graft.sources.ManifestStore.zoneMapsStored(spark, path32)
        .withColumn("k", lit("all"))
      val plan32 = graft.ops.Layout.compactionPlan(m32, Seq("k"),
        "file_id", "n_rows", targetBytes = 2000L)
      val routed32 = graft.ops.Layout.compactionApply(
          li32.withColumn("k", lit("all")),
          date_format(col("l_shipdate"), "yyyy-MM"), plan32,
          Seq("k"), "file_id")
        .withColumn("new_file", concat_ws("#", col("k"), col("bin")))
      graft.sources.ManifestStore.rewriteLayout(spark, path32, routed32,
        "new_file")
      val storedRw = graft.sources.ManifestStore
        .zoneMapsStored(spark, path32)
        .orderBy("file_id").collect().map(_.toSeq).toSeq
      val freshRw = graft.ops.Layout.zoneMaps(routed32, col("new_file"),
          Seq("l_shipdate", "l_quantity"))
        .orderBy("file_id").collect().map(_.toSeq).toSeq
      val appendAfterRw = graft.sources.ManifestStore.append(spark,
        path32, routed32.limit(50), batchId = "post-rw")
      val cust32 = spark.read.parquet(s"$sf/customer.parquet")
      // k = 8 discriminates at sf0.001 (150 customers over 25
      // nations): a handful of nation classes reach 8, most don't
      val released = graft.ops.Profile.suppressSmallClasses(cust32,
        Seq("c_nationkey"), k = 8L)
      val reaudit = graft.ops.Profile.kAnonymity(released,
        Seq("c_nationkey"), k = 8L)
      val badClasses = reaudit.filter(!col("anonymous")).count()
      val keptClasses = graft.ops.Profile.kAnonymity(cust32,
          Seq("c_nationkey"), k = 8L)
        .filter(col("anonymous"))
        .agg(coalesce(sum("n_rows"), lit(0L))).collect()(0).getLong(0)
      println(s"SMOKE32 round17b: rwParity=${storedRw == freshRw} " +
        s"rwFiles=${storedRw.size} appendAfterRw=$appendAfterRw " +
        s"releasedRows=${released.count()}/$keptClasses " +
        s"reauditBad=$badClasses => " +
        (if (storedRw == freshRw && storedRw.nonEmpty && appendAfterRw
          && released.count() == keptClasses && keptClasses > 0
          && released.count() < cust32.count()
          && badClasses == 0) "OK" else "BROKEN"))
    }

    // SMOKE33: round-18 second wave — (a) BPE learn→apply on the real
    // documents table with the ledger's monotonicity invariant (each
    // round's best-pair count can never exceed the previous round's:
    // old pair counts only shrink under a merge, and any NEW pair
    // involving the merged symbol inherits at most its occurrence
    // count); (b) the persisted phash index round-trip — stored probe
    // ≡ live chunk blocker, retire strictly shrinks the candidate set;
    // (c) prefix containment finds every verbatim re-idd copy at
    // containment exactly 1.0.
    {
      val docs33 = spark.read.parquet(s"$sf/documents.parquet")
      val merges33 = graft.ops.Corpus.bpeMerges(docs33, "doc_id", "text",
        rounds = 4).collect()
      val freqs33 = merges33.map(_.getLong(2)).toSeq
      val vocab33 = graft.ops.Corpus.bpeTokenFrequencies(docs33,
        "doc_id", "text", rounds = 4, k = 20).collect()
      val med33 = SparkEntry.mediaFixture(spark, sf)
      val path33 = java.nio.file.Files
        .createTempDirectory("smoke33-phash").toString
      graft.sources.PhashStore.save(
        med33.filter(col("doc_id") % 7 =!= 0), "doc_id", "media", path33)
      val batch33 = med33.filter(col("doc_id") % 7 === 0)
      val storedPairs = graft.sources.PhashStore.crossNearPairsStored(
          spark, path33, batch33, "doc_id", "media")
        .orderBy("id_a", "id_b").collect().map(_.toSeq).toSeq
      // the self-join blocker emits id_a < id_b only; a cross pair with
      // the batch id on the small side arrives flipped — canonicalize
      // both orientations to (store, batch) before comparing
      val np33 = graft.ops.Dedup.simhashNearPairs(
        graft.ops.Multimodal.dhash(med33, "doc_id", "media")
          .select(col("id"), col("phash").as("simhash")))
      val livePairs = np33
        .filter(col("id_a") % 7 =!= 0 && col("id_b") % 7 === 0)
        .unionByName(np33
          .filter(col("id_a") % 7 === 0 && col("id_b") % 7 =!= 0)
          .select(col("id_b").as("id_a"), col("id_a").as("id_b"),
            col("hamming")))
        .orderBy("id_a", "id_b").collect().map(_.toSeq).toSeq
      graft.sources.PhashStore.retire(spark, path33,
        med33.filter(col("doc_id") % 7 === 1)
          .select(col("doc_id").as("id")))
      val afterRetire = graft.sources.PhashStore.crossNearPairsStored(
        spark, path33, batch33, "doc_id", "media").count()
      val copies33 = docs33.orderBy("doc_id").limit(20)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val found33 = graft.ops.Dedup.crossContainmentPairs(docs33,
          copies33, "doc_id", "text", minContainMicro = 1000000L)
        .filter(col("id_a") === col("id_b") - 1000000L
          && col("contain_micro") === 1000000L)
        .count()
      println(s"SMOKE33 round18b: merges=${merges33.length} " +
        s"monotone=${freqs33 == freqs33.sorted.reverse} " +
        s"vocab=${vocab33.length} " +
        s"phashParity=${storedPairs == livePairs}/${storedPairs.size} " +
        s"afterRetire=$afterRetire selfContain=$found33/20 => " +
        (if (merges33.length == 4 && freqs33 == freqs33.sorted.reverse
          && vocab33.nonEmpty && storedPairs == livePairs
          && storedPairs.nonEmpty && afterRetire < storedPairs.size
          && found33 == 20L) "OK" else "BROKEN"))
    }

    // SMOKE34: round-19 — (a) the driver-local trainer's ledger is
    // IDENTICAL to the distributed loop's on the real corpus (and keeps
    // going past it: 64 requested rounds vs the per-round-shuffle
    // trainer's 4); (b) the v2 tokenizer store round-trips vocab +
    // encode, and every encoded document reconstructs to its text
    // minus spaces; (c) physical reclamation: retire + rebuildRetained
    // on a posting store leaves search byte-identical while the raw
    // rows physically shrink and a replayed ingest of a retired id
    // still lands nothing (the tombstone ledger outlives the raw rows).
    {
      val docs34 = spark.read.parquet(s"$sf/documents.parquet")
      val distLedger = graft.ops.Corpus.bpeMerges(docs34, "doc_id",
        "text", rounds = 4).collect().map(_.toSeq).toSeq
      val localLedger = graft.ops.Corpus.bpeMergesLocal(docs34, "doc_id",
        "text", rounds = 64).collect().map(_.toSeq).toSeq
      val prefixEq = localLedger.take(4) == distLedger
      val store34 = java.nio.file.Files
        .createTempDirectory("smoke34-bpe").toString
      graft.sources.BpeStore.save(docs34, "doc_id", "text", store34,
        rounds = 6)
      val enc34 = graft.sources.BpeStore.encode(spark, store34,
        docs34.filter(col("doc_id") < 20), "doc_id", "text")
      val recon = enc34.groupBy("doc_id")
        .agg(concat_ws("", sort_array(collect_list(
          struct(col("pos"), col("token")))).getField("token"))
          .as("joined"))
        .join(docs34.select(col("doc_id"),
          regexp_replace(col("text"), " ", "").as("want")), "doc_id")
      val reconBad = recon.filter(col("joined") =!= col("want")).count()
      val post34 = java.nio.file.Files
        .createTempDirectory("smoke34-post").toString
      graft.sources.PostingStore.save(docs34, "doc_id", "text", post34,
        buckets = 8)
      graft.sources.PostingStore.retire(spark, post34,
        docs34.filter(col("doc_id") % 4 === 0).select("doc_id"), "doc_id")
      val terms34 = Seq("dup", "vector", "batch")
      def hits34() = graft.sources.PostingStore
        .searchTopK(spark, post34, terms34, 10)
        .collect().map(_.toSeq).toSeq
      val beforeRb = hits34()
      val shrunk34 = graft.sources.PostingStore
        .rebuildRetained(spark, post34)
      val afterRb = hits34()
      graft.sources.PostingStore.append(spark, post34,
        docs34.filter(col("doc_id") % 4 === 0).limit(3), "doc_id", "text")
      val afterReplay = hits34()
      val rawClean = spark.read.parquet(s"$post34/docstats")
        .select("id").collect().map(_.getLong(0)).forall(_ % 4 != 0)
      println(s"SMOKE34 round19: ledgerPrefixEq=$prefixEq " +
        s"localRounds=${localLedger.length} encDocs=${recon.count()} " +
        s"reconBad=$reconBad " +
        s"rbShrunk=${shrunk34("postings")._2 < shrunk34("postings")._1} " +
        s"searchStable=${beforeRb == afterRb && afterRb == afterReplay} " +
        s"rawClean=$rawClean => " +
        (if (prefixEq && localLedger.length > 4 && reconBad == 0
          && shrunk34("postings")._2 < shrunk34("postings")._1
          && beforeRb.nonEmpty && beforeRb == afterRb
          && afterRb == afterReplay && rawClean) "OK" else "BROKEN"))
    }

    // SMOKE35: round-20 — (a) the packed-sequence artifact: fixed-32
    // token-id rows, and shard 1's sequences concatenate to exactly the
    // prefix of its per-doc id stream (tail remainder dropped); (b) the
    // v3 byte-fallback store: encode of text carrying a train-unseen
    // multi-byte character emits ZERO -1 ids, every id under
    // vocab+256, and byte rows actually flow; (c) reclamation symmetry
    // on the signature family: the stored phash probe is byte-identical
    // across rebuildRetained while the sig bytes shrink.
    {
      val docs35 = spark.read.parquet(s"$sf/documents.parquet")
      val store35 = java.nio.file.Files
        .createTempDirectory("smoke35-bpe").toString
      graft.sources.BpeStore.saveWithFallback(
        docs35.filter(col("doc_id") % 2 === 0), "doc_id", "text",
        store35, rounds = 6)
      val slice35 = docs35.filter(col("doc_id") < 60)
      val packed35 = graft.sources.BpeStore.packTokenIds(spark, store35,
        slice35, "doc_id", "text", seqLen = 32, nShards = 4)
      val lens35 = packed35.select(size(col("token_ids")).as("n"))
        .distinct().collect().map(_.getInt(0)).toSeq
      val enc35 = graft.sources.BpeStore.encode(spark, store35, slice35,
          "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      val stream1 = enc35.filter(_._1 % 4 == 1)
        .sortBy(t => (t._1, t._2)).map(_._3).toSeq
      val packed1 = packed35.filter(col("shard") === 1).orderBy("seq_ix")
        .collect().flatMap(_.getSeq[Int](2)).toSeq
      val packOk = packed1 == stream1.take(stream1.length / 32 * 32)
      val base35 = graft.sources.BpeStore.vocab(spark, store35)
        .count().toInt
      val probe35 = docs35
        .filter(col("doc_id") % 2 === 1 && col("doc_id") < 40)
        .select(col("doc_id"),
          concat(col("text"), lit(" \u00a7x")).as("text"))
      val nn35 = graft.sources.BpeStore.encodeNoOov(spark, store35,
        probe35, "doc_id", "text")
      val neg35 = nn35.filter(col("token_id") < 0).count()
      val over35 = nn35.filter(col("token_id") >= base35 + 256).count()
      val bytes35 = nn35.filter(col("token").startsWith("<0x")).count()
      val med35 = SparkEntry.mediaFixture(spark, sf)
      val ph35 = java.nio.file.Files
        .createTempDirectory("smoke35-ph").toString
      graft.sources.PhashStore.save(med35.filter(col("doc_id") % 2 === 0),
        "doc_id", "media", ph35)
      graft.sources.PhashStore.append(spark, ph35,
        med35.filter(col("doc_id") % 2 === 1), "doc_id", "media")
      graft.sources.PhashStore.retire(spark, ph35,
        med35.filter(col("doc_id") % 5 === 1)
          .select(col("doc_id").as("id")))
      def probePh() = graft.sources.PhashStore.crossNearPairsStored(
          spark, ph35, med35.filter(col("doc_id") % 7 === 0),
          "doc_id", "media", maxDist = 3)
        .orderBy("id_a", "id_b").collect().map(_.toSeq).toSeq
      val beforePh = probePh()
      val shrunk35 = graft.sources.PhashStore.rebuildRetained(spark, ph35)
      val afterPh = probePh()
      val phOk = beforePh.nonEmpty && beforePh == afterPh &&
        shrunk35("sigs")._2 < shrunk35("sigs")._1
      println(s"SMOKE35 round20: packSeqs=${packed35.count()} " +
        s"lens=${lens35.mkString(",")} packStreamEq=$packOk " +
        s"noOovNeg=$neg35 overCap=$over35 byteRows=$bytes35 " +
        s"phashRebuildStable=$phOk " +
        s"sigBytes=${shrunk35("sigs")._1}->${shrunk35("sigs")._2} => " +
        (if (lens35 == Seq(32) && packOk && neg35 == 0 && over35 == 0 &&
          bytes35 > 0 && phOk) "OK" else "BROKEN"))
    }

    spark.stop()
  }
}
