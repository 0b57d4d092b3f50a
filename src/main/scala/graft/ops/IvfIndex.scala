package graft.ops

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path next to [[Similarity.annPairs]]'s LSH: a coarse k-means quantizer
  * partitions the corpus into cells; a query probes only the `nProbe`
  * nearest cells and brute-forces within them, replacing an n-scan with
  * ~(nProbe/k)·n. Built on Spark MLlib's KMeans (seeded — deterministic)
  * with the engine's native `vec_dot` kernel for the in-cell scoring.
  *
  * The quantizer trains and probes in L2-NORMALIZED space (spherical
  * k-means): final scoring is cosine, and for unnormalized embeddings the
  * L2-nearest cells of the raw vectors need not contain the top-cosine
  * neighbors — probing raw space silently depresses recall below what
  * `nProbe` suggests. On the unit sphere L2-nearest ⇔ cosine-nearest, so
  * the probed cells are exactly the cosine-relevant ones. Zero-norm
  * vectors keep their raw (all-zero) form; they can never score anyway.
  *
  * At 100 TB: the trained centroid set is tiny (k × dim floats) and ships
  * as literals in the query plan; cell assignment is one codegen'd pass;
  * and the materialized index is written with [[save]] as parquet
  * PARTITIONED BY `cell` (+ a centroid sidecar table), so a probe over the
  * [[load]]ed form reads only the probed cells' files (partition pruning —
  * asserted in IvfIndexSpec) and a restarted cluster never retrains.
  * Corpus growth is [[append]], not retrain: new vectors are assigned to
  * the EXISTING centroids (one transform — no k-means) and committed as a
  * new cell-partitioned batch directory behind the meta pointer (crash-
  * atomic, like [[save]]'s version swap), with a drift metric saying when
  * retraining is actually warranted.
  */
object IvfIndex {

  private val logger = org.slf4j.LoggerFactory.getLogger("graft.ops")

  /** Storage layout version. Bumped whenever the on-disk shape or the
    * quantizer space changes — a stored index with a different `fmt` is
    * retrained, never reinterpreted. v3: cells live in meta-listed BATCH
    * directories (crash-atomic [[append]]) and the drift baseline is a
    * weighted running mean over the indexed corpus. */
  private val FormatVersion = 3

  final case class Index(cells: DataFrame, centroids: Array[(Int, Seq[Float])])

  /** Build identity, compared FIELD-WISE against the store's meta — no
    * string encoding, so keys/columns containing any delimiter can never
    * make two distinct parameterizations collide (each field is its own
    * parquet column). */
  private final case class Identity(key: String, idCol: String,
      vecCol: String, k: Int, seed: Long)

  /** What `$dir/meta` holds: the current version-directory name (the
    * atomic-swap pointer), the build identity (fields null for an
    * identity-less direct [[save]]), the mean assigned distance² over the
    * indexed corpus with its row count (the [[append]] drift baseline,
    * folded forward as a weighted running mean on every append), and the
    * batch subdirectories of the version that together hold the cells —
    * a batch directory not listed here does not exist as far as readers
    * are concerned, which is what makes [[append]] crash-atomic. */
  private final case class Meta(fmt: Int, version: String,
      identity: Option[Identity], meanDist: Double, nRows: Long,
      batches: Seq[String])

  /** `vec / ||vec||` as doubles; zero-norm vectors pass through raw. */
  private def normalized(vecCol: Column, norm: Column): Column =
    when(norm > 0, transform(vecCol, x => x.cast("double") / norm))
      .otherwise(transform(vecCol, x => x.cast("double")))

  // One trained index per (session, corpus key, k, seed): an ANN index
  // outlives any single query — training per probe would be like rebuilding
  // a B-tree per lookup. Mirrors Testbed.graph's "load once, query many".
  // Keyed on the (sessionHash, Identity) TUPLE, not its toString: case-class
  // toString is comma-joined, so two distinct parameterizations whose fields
  // straddle a comma would stringify identically — the very delimiter
  // collision the field-wise stored identity exists to rule out. Tuple
  // equals/hashCode compare field-wise for free.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Identity), Index]()

  /** Test hook: forget session memoizations (simulates a fresh session so
    * the [[buildCached]] storage fall-through is observable in-process).
    * Unpersists each evicted index's cells first — Dataset.persist entries
    * are only freed by explicit unpersist, and dropping the handle alone
    * would leak the cached assignment in the session for the JVM's life. */
  private[graft] def clearCache(): Unit = {
    cache.values.forEach(ix => ix.cells.unpersist(blocking = false))
    cache.clear()
  }

  /** [[build]], memoized per (session, `key`, k, seed) with the cell
    * assignment persisted — callers issuing many probes (or a benchmark
    * measuring probe latency) pay the k-means training once. `key` is the
    * caller's CORPUS IDENTITY (e.g. the table path) and is mandatory: the
    * cache cannot see through a DataFrame to know two inputs differ, and a
    * defaulted key would silently serve corpus A's index for corpus B. The
    * cells persist uses MEMORY_AND_DISK for intra-session reuse.
    *
    * `storageDir` is the cross-session form: on a cache miss the index is
    * [[load]]ed from there if present (no retraining — the restarted-
    * cluster path), and a freshly trained index is [[save]]d there before
    * use. The store carries an identity record (corpus key, columns, k,
    * seed, format version — compared field-wise, so no delimiter in a key
    * or column name can forge a match): a stored index that was built
    * under DIFFERENT parameters — two pipelines sharing a directory, or a
    * k upgrade — is detected and retrained + overwritten rather than
    * silently served with the wrong cell granularity. Omitted =
    * session-only memoization. */
  def buildCached(emb: DataFrame, idCol: String, vecCol: String,
      key: String, k: Int = 16, seed: Long = 42L,
      storageDir: Option[String] = None): Index = {
    require(key.nonEmpty, "buildCached needs a non-empty corpus key")
    val id = Identity(key, idCol, vecCol, k, seed)
    val ix = cache.computeIfAbsent(
      (emb.sparkSession.hashCode, id), _ => {
        val spark = emb.sparkSession
        val stored = storageDir.filter(dir =>
          readMeta(spark, dir).exists { m =>
            val ok = m.identity.contains(id) &&
              pathExists(spark, s"$dir/${m.version}/centroids")
            if (!ok) logger.warn(s"IvfIndex: stored index at $dir has a " +
              s"different identity (want $id); retraining and overwriting")
            ok
          })
        val built = stored match {
          case Some(dir) => load(spark, dir)
          case None =>
            val b = build(emb, idCol, vecCol, k, seed)
            // persist + materialize BEFORE save: the write then reads the
            // cached cell assignment instead of re-running the k-means
            // transform over the corpus a second time
            b.cells.persist(
              org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
            storageDir.foreach(dir => saveAs(b, dir, Some(id)))
            b
        }
        if (built.cells.storageLevel ==
            org.apache.spark.storage.StorageLevel.NONE) {
          built.cells.persist(
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
        }
        built
      })
    // Session-level cache hygiene (e.g. a benchmark unpersisting per-query
    // leftovers) may have dropped the memoized cells' blocks out from under
    // the cache. Re-pin on access: the cells plan embeds the TRAINED
    // model's cell assignment, so this re-runs one transform pass, never
    // the k-means training — and the memoization contract stays honest.
    if (ix.cells.storageLevel ==
        org.apache.spark.storage.StorageLevel.NONE) {
      ix.cells.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
    }
    ix
  }

  /** Build the IVF index: assign every vector to its nearest of `k`
    * centroids, trained and assigned in L2-normalized space (class doc).
    * `cells` = input columns + `cell: Int`; `centroids` live in normalized
    * space — probes must normalize the query side to match. */
  def build(emb: DataFrame, idCol: String, vecCol: String, k: Int = 16,
      seed: Long = 42L): Index = {
    // widen: k-means iterations inherit the input partitioning; a
    // single-file table would run every distance pass on one core
    val withVec = OpsUtil.widen(emb).withColumn("_mlvec",
      array_to_vector(normalized(col(vecCol), Similarity.l2Norm(col(vecCol)))))
    val model = new KMeans().setK(k).setSeed(seed).setFeaturesCol("_mlvec")
      .setPredictionCol("cell").fit(withVec)
    val cells = model.transform(withVec).drop("_mlvec")
    val centroids = model.clusterCenters.zipWithIndex.map {
      case (c: Vector, i) => (i, c.toArray.toSeq.map(_.toFloat))
    }
    Index(cells, centroids)
  }

  /** Write the index to `dir` as its at-scale storage form: the cell
    * assignment as parquet PARTITIONED BY `cell` (a probe over the loaded
    * table reads only the probed cells' files) and the centroids as a tiny
    * sidecar table, both under a fresh VERSION subdirectory that `meta`
    * points at. Snapshot semantics — a later save overwrites by swapping
    * the pointer, never by mutating data in place:
    *
    *   - data lands fully in `$$dir/v-<uuid>/` first; `meta` (pointer +
    *     identity + drift baseline) is rewritten only after both tables
    *     committed. A crash mid-save leaves the previous version intact
    *     and still current — a restarted [[buildCached]] either loads it
    *     (identity matched) or retrains; it can never see half-written
    *     cells or new centroids paired with old cells.
    *   - a CONCURRENT reader that resolved `meta` before the swap keeps
    *     reading its own (immutable) version directory. The previous
    *     version is retained through one save as a grace window; only
    *     older generations are garbage-collected — so a reader must
    *     re-[[load]] rather than hold an index across two saves.
    *   - the only non-atomic step is the tiny `meta` rewrite itself; a
    *     reader racing it sees a missing meta and treats the store as
    *     absent (retrain — wasteful, never wrong). */
  def save(ix: Index, dir: String): Unit = saveAs(ix, dir, None)

  private def saveAs(ix: Index, dir: String,
      identity: Option[Identity]): Unit = {
    val spark = ix.cells.sparkSession
    val version = s"v-${java.util.UUID.randomUUID()}"
    // REBALANCE by cell before the partitionBy write (guide §6): without
    // it every input partition writes one file per distinct cell it holds
    // — up to partitions × k tiny files per save (measured r22: 112 files
    // for a ~200-row index, and the per-file commit overhead dominated
    // the q77 maintenance cycle). The AQE rebalance packs each cell's
    // rows into size-targeted partitions, so small stores write ~one file
    // per cell and 100 TB stores write advisory-sized files; without AQE
    // the hint is a no-op and the write behaves as before.
    ix.cells.hint("rebalance", col("cell")).write.mode(SaveMode.Overwrite)
      .partitionBy("cell").parquet(s"$dir/$version/cells")
    centroidFrame(spark, ix.centroids)
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/$version/centroids")
    // training-time drift baseline: mean normalized-space distance² of
    // every stored vector to its assigned centroid (one map-side-partial
    // aggregate over the — typically still persisted — cell assignment),
    // with the corpus row count so later appends can fold their batch
    // means into a weighted running baseline. The vector column comes
    // from the identity when we have one, else from the schema (unique
    // array<float> column); a save that can't name it stores a zero
    // baseline, which disables the drift signal rather than guessing at
    // a column.
    val (baseline, nRows) = identity.map(_.vecCol).orElse(vecColOf(ix))
      .map(v => meanAssignedDist(ix.cells, ix.centroids, "cell", v))
      .getOrElse((0.0, ix.cells.count()))
    val previous = readMeta(spark, dir).map(_.version)
    writeMeta(spark, dir,
      Meta(FormatVersion, version, identity, baseline, nRows, Seq("cells")))
    gcVersions(spark, dir, keep = Set(version) ++ previous)
  }

  /** The vector column of an index's cells frame, when the schema names
    * it unambiguously: the unique array<float> column. */
  private def vecColOf(ix: Index): Option[String] = {
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val arrs = ix.cells.schema.fields.filter(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }).map(_.name)
    if (arrs.length == 1) Some(arrs.head) else None
  }

  private def centroidFrame(spark: SparkSession,
      cents: Array[(Int, Seq[Float])]): DataFrame = {
    import spark.implicits._
    cents.toSeq.toDF("cell", "centroid")
  }

  /** Centroid table ready for distance math: `_mc` (cell id), `centroid`,
    * `_cn2` = ||c||² — k rows, always broadcast. */
  private def centroidsWithNorm(spark: SparkSession,
      cents: Array[(Int, Seq[Float])]): DataFrame =
    centroidFrame(spark, cents)
      .withColumnRenamed("cell", "_mc")
      .withColumn("_cn2", aggregate(col("centroid"), lit(0.0),
        (s, x) => s + x.cast("double") * x.cast("double")))

  /** Squared L2 distance in normalized space from the row's `vecCol` to
    * the joined `centroid`: ||v/n - c||² = 1 - 2(v·c)/n + ||c||², with the
    * zero-norm raw-passthrough convention giving ||c||². */
  private def normDist2(vecCol: String): Column = {
    val nrm = Similarity.l2Norm(col(vecCol))
    when(nrm > 0, lit(1.0)
        - lit(2.0) * Similarity.dot(col(vecCol), col("centroid")) / nrm
        + col("_cn2"))
      .otherwise(col("_cn2"))
  }

  /** Mean [[normDist2]] of each row to its ASSIGNED centroid, with the row
    * count (same pass). One broadcast join against k rows + one partial-agg
    * pass — no shuffle of the data. */
  private def meanAssignedDist(cells: DataFrame,
      cents: Array[(Int, Seq[Float])], cellCol: String,
      vecCol: String): (Double, Long) =
    cells.join(broadcast(centroidsWithNorm(cells.sparkSession, cents)),
        col(cellCol) === col("_mc"))
      .agg(avg(normDist2(vecCol)), count(lit(1))).collect()(0) match {
        case r if r.isNullAt(0) => (0.0, r.getLong(1))
        case r => (r.getDouble(0), r.getLong(1))
      }

  /** Meta is the COMMIT POINT of both [[save]]'s version swap and
    * [[append]]'s batch-list swap, so its own write must not have a
    * window where no valid meta exists — Spark's Overwrite on the meta
    * directory is delete-job-then-write, and a crash in between would
    * leave every version's data files intact but the store unreadable.
    * Instead the new meta lands COMPLETE in `meta-next`, then a delete +
    * O(1) filesystem rename swaps it in. Both crash points recover:
    * before the delete, `meta` is untouched (the commit simply never
    * happened; the stale staging is overwritten by the next write);
    * after it, `meta-next` is complete and [[readMeta]] reads it as the
    * rolled-forward commit. */
  private def writeMeta(spark: SparkSession, dir: String, m: Meta): Unit = {
    import spark.implicits._
    Seq((m.fmt, m.version, m.identity.map(_.key).orNull,
        m.identity.map(_.idCol).orNull, m.identity.map(_.vecCol).orNull,
        m.identity.map(_.k), m.identity.map(_.seed), m.meanDist,
        m.nRows, m.batches))
      .toDF("fmt", "version", "key", "id_col", "vec_col", "k", "seed",
        "mean_dist", "n_rows", "batches")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/meta-next")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/meta"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$dir/meta-next"),
      new org.apache.hadoop.fs.Path(s"$dir/meta"))
  }

  /** `meta` when present (a complete-but-unswapped `meta-next` alongside
    * it is an uncommitted write — ignored, rolled back by the next
    * [[writeMeta]]); `meta-next` when `meta` is absent (the swap's delete
    * ran, so the staged meta IS the commit — read it forward). */
  private def readMeta(spark: SparkSession, dir: String): Option[Meta] =
    readMetaAt(spark, s"$dir/meta")
      .orElse(readMetaAt(spark, s"$dir/meta-next"))

  private def readMetaAt(spark: SparkSession, metaDir: String): Option[Meta] =
    if (!pathExists(spark, metaDir)) None
    else scala.util.Try {
      val r = spark.read.parquet(metaDir).collect()(0)
      val id =
        if (r.isNullAt(r.fieldIndex("key"))) None
        else Some(Identity(r.getString(r.fieldIndex("key")),
          r.getString(r.fieldIndex("id_col")),
          r.getString(r.fieldIndex("vec_col")),
          r.getInt(r.fieldIndex("k")), r.getLong(r.fieldIndex("seed"))))
      Meta(r.getInt(r.fieldIndex("fmt")),
        r.getString(r.fieldIndex("version")), id,
        r.getDouble(r.fieldIndex("mean_dist")),
        r.getLong(r.fieldIndex("n_rows")),
        r.getSeq[String](r.fieldIndex("batches")))
    }.toOption.filter(_.fmt == FormatVersion)

  /** Best-effort removal of version directories no longer reachable from
    * meta (minus the grace-window `keep` set). */
  private def gcVersions(spark: SparkSession, dir: String,
      keep: Set[String]): Unit = scala.util.Try {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(root).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && name.startsWith("v-") && !keep(name))
        fs.delete(st.getPath, true)
    }
  }

  /** Re-open a [[save]]d index at its current version. The cells scan
    * stays file-backed — cell filters prune to the probed partitions'
    * files in EVERY batch directory (the cell filter pushes into each
    * union branch); nothing is retrained. */
  def load(spark: SparkSession, dir: String): Index = {
    val m = readMeta(spark, dir).getOrElse(
      sys.error(s"no readable IvfIndex meta at $dir"))
    val cents = spark.read.parquet(s"$dir/${m.version}/centroids").collect()
      .map(r => (r.getInt(r.fieldIndex("cell")),
        r.getSeq[Float](r.fieldIndex("centroid"))))
      .sortBy(_._1)
    // one partition-discovered scan per meta-listed batch directory — a
    // batch dir meta doesn't list (a crashed append's staging) is invisible
    val cells = m.batches
      .map(b => spark.read.parquet(s"$dir/${m.version}/$b"))
      .reduce(_.unionByName(_))
    Index(cells, cents)
  }

  /** Incremental index maintenance — corpus growth WITHOUT retraining.
    * `newVecs` (same schema as the indexed corpus frame) are assigned to
    * the EXISTING centroids (one broadcast-join transform over k rows — no
    * k-means) and landed as a NEW cell-partitioned batch directory of the
    * current version, which meta's batch list is swapped to include — the
    * same commit discipline as [[save]]'s version pointer, at O(batch)
    * cost. A crash mid-append leaves an orphan directory no meta lists
    * (invisible to every reader, reclaimed when the next [[save]] rotates
    * the version); readers can never see a partially-committed batch.
    * Returns the re-opened index and the DRIFT RATIO: the new batch's mean
    * assigned distance² over the baseline in meta (the weighted running
    * mean over everything indexed so far, seeded at training time). Ratio
    * ≈ 1 means the new vectors fit the trained quantizer; a ratio past
    * `retrainAbove` logs a warning that retraining is warranted (the
    * centroids no longer describe the corpus — recall degrades even though
    * results stay well-formed). The batch's mean is folded into the stored
    * baseline (weighted by row counts), so after many appends drift is
    * measured against the corpus as indexed, not an ever-staler snapshot.
    *
    * Concurrency: ONE writer at a time (same as [[save]] — both end in a
    * read-modify-write of meta); readers are safe throughout. A reader
    * that resolved meta before the append keeps its immutable snapshot.
    * Session caches keyed by the stored identity are INVALIDATED here, so
    * a same-session [[buildCached]] after an append re-resolves the store
    * and sees the appended rows. */
  def append(spark: SparkSession, dir: String, newVecs: DataFrame,
      idCol: String, vecCol: String,
      retrainAbove: Double = 1.5): (Index, Double) = {
    val m = readMeta(spark, dir).getOrElse(
      sys.error(s"no readable IvfIndex meta at $dir — build + save first"))
    val stored = load(spark, dir)
    val cdf = centroidsWithNorm(spark, stored.centroids)
    // argmin over k centroids per row: the k-row centroid table broadcasts
    // and the window partitions by the row id — same distributed discipline
    // as topKPerQuery's probe ranking, with nProbe = 1
    val assigned = OpsUtil.widen(newVecs).crossJoin(broadcast(cdf))
      .withColumn("_d2", normDist2(vecCol))
      .withColumn("_pr", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
          .orderBy(col("_d2"), col("_mc"))))
      .filter(col("_pr") === 1)
      .withColumn("cell", col("_mc"))
      .select(newVecs.columns.map(col) :+ col("cell") :+ col("_d2"): _*)
      .transform(graft.core.Lifecycle.stage(_))
    val (batchMean, nBatch) =
      assigned.agg(avg(col("_d2")), count(lit(1))).collect()(0) match {
        case r if r.isNullAt(0) => (0.0, r.getLong(1))
        case r => (r.getDouble(0), r.getLong(1))
      }
    val drift = if (m.meanDist > 1e-12) batchMean / m.meanDist else 1.0
    if (drift > retrainAbove)
      logger.warn(f"IvfIndex.append at $dir: drift ratio $drift%.2f " +
        f"(batch mean dist² $batchMean%.4f vs baseline ${m.meanDist}%.4f) " +
        s"exceeds $retrainAbove — retraining is warranted")
    // land the batch fully in its own directory, THEN swap meta to list it
    // (rebalanced by cell before the write — file-count discipline, see
    // saveAs)
    val batchDir = s"cells-${java.util.UUID.randomUUID()}"
    assigned.drop("_d2").hint("rebalance", col("cell"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cell").parquet(s"$dir/${m.version}/$batchDir")
    val newBaseline =
      if (m.meanDist > 1e-12 && m.nRows + nBatch > 0)
        (m.meanDist * m.nRows + batchMean * nBatch) / (m.nRows + nBatch)
      else m.meanDist // zero baseline = drift signal disabled; keep it so
    writeMeta(spark, dir, m.copy(meanDist = newBaseline,
      nRows = m.nRows + nBatch, batches = m.batches :+ batchDir))
    // the appended store is the truth now — evict every session memoization
    // of this identity (any session in the JVM) so the next buildCached
    // re-resolves the store instead of serving the pre-append assignment
    m.identity.foreach { id =>
      val it = cache.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey._2 == id) {
          e.getValue.cells.unpersist(blocking = false)
          it.remove()
        }
      }
    }
    (load(spark, dir), drift)
  }

  private def pathExists(spark: SparkSession, p: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(p)
    path.getFileSystem(spark.sessionState.newHadoopConf()).exists(path)
  }

  /** Top-`topK` neighbors of `query` probing the `nProbe` nearest cells. */
  def query(ix: Index, idCol: String, vecCol: String, query: Seq[Float],
      topK: Int = 10, nProbe: Int = 4,
      excludeId: Option[Long] = None): DataFrame = {
    def dist2(a: Seq[Double], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // centroids live in normalized space — normalize the probe to match
    val qn = math.sqrt(query.map(x => x.toDouble * x).sum)
    val qUnit = if (qn > 0) query.map(_ / qn) else query.map(_.toDouble)
    val probed = ix.centroids.sortBy(c => dist2(qUnit, c._2))
      .take(nProbe).map(_._1)
    val q = array(query.map(lit): _*)
    val scored = ix.cells.filter(col("cell").isin(probed: _*))
      .select(col(idCol).cast("long").as("vec_id"),
        round(Similarity.cosine(col(vecCol), q), 4).as("score"))
    excludeId.fold(scored)(id => scored.filter(col("vec_id") =!= id))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(topK)
  }

  /** Batched kNN join through the IVF index: the top-`topK` corpus
    * neighbors of EVERY query row, each query probing its `nProbe`
    * nearest cells — the cell-partitioned alternative to
    * [[Similarity.topKPerQuery]]'s hyperplane LSH. IVF recall behaves
    * better when the corpus clusters (cells adapt to the data,
    * storage-free hyperplanes don't); LSH wins when no index can be
    * trained ahead of the query.
    *
    * Unlike [[query]]'s single-vector probe (centroid ranking on the
    * driver), the per-query cell choice here is fully distributed: the
    * centroid table is tiny (k × dim) and broadcast; each query ranks its
    * cells with a window over queries×k scalar rows. The query side is
    * broadcast under the same count gate as the other cross-corpus ops
    * ([[OpsUtil.broadcastGate]]); the corpus side never shuffles for
    * scoring — with cells written as the partition key, each probe reads
    * only the probed cells' files. Over the gate the cell join falls back
    * SALTED ([[Skew.saltedJoin]]), not plain: `cell` has only k distinct
    * values, and an unsalted shuffle join would collapse the corpus into
    * ≤ k reducer tasks. The final top-k is the group-limited
    * window ([[Similarity.rankTopK]] — map-side partial limit, the
    * exchange carries ≤ topK rows per (query, partition)).
    *
    * Output matches [[Similarity.topKPerQuery]]: `(query_id, neighbor_id,
    * score, rank)`; a query whose probed cells hold fewer than `topK`
    * vectors returns fewer rows. */
  def topKPerQuery(queries: DataFrame, ix: Index, idCol: String,
      vecCol: String, topK: Int, nProbe: Int = 4,
      maxBroadcastRows: Long = 1000000L): DataFrame = {
    require(nProbe >= 1, s"nProbe must be positive, got $nProbe")
    val spark = queries.sparkSession
    import spark.implicits._
    val cents = ix.centroids.toSeq.toDF("cell", "_centroid")
      // ||c||^2 once per centroid (k rows): the probe distance below uses
      // the expansion ||u - c||^2 = 1 - 2 u.c + ||c||^2, so the per-pair
      // work is one dot product — no per-element division inside the
      // (queries x k) region
      .withColumn("_cn2", aggregate(col("_centroid"), lit(0.0),
        (s, x) => s + x.cast("double") * x.cast("double")))
    // zero-norm queries can never score (the cosine filter below drops
    // them) — drop them before probing, where their normalized form would
    // be undefined
    val q = OpsUtil.widen(queries)
      .select(col(idCol).cast("long").as("id_b"), col(vecCol).as("v_b"),
        Similarity.l2Norm(col(vecCol)).as("nrm_b"))
      .filter(col("nrm_b") > 0)
      .transform(graft.core.Lifecycle.stage(_))
    val bcast = OpsUtil.broadcastGate("IvfIndex.topKPerQuery", "queries",
      q.count(), maxBroadcastRows)
    def hint(df: DataFrame) = if (bcast) broadcast(df) else df
    // squared L2 to every centroid (k rows per query — scalar-cheap) in
    // NORMALIZED space (centroids are trained on unit vectors — class
    // doc): ||v/n - c||^2 = 1 - 2 (v.c)/n + ||c||^2, ranked per query
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("_d2", lit(1.0)
        - lit(2.0) * Similarity.dot(col("v_b"), col("_centroid"))
          / col("nrm_b")
        + col("_cn2"))
      .withColumn("_pr", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("id_b"))
          .orderBy(col("_d2"), col("cell"))))
      .filter(col("_pr") <= nProbe)
      .select(col("id_b"), col("cell"))
    val corpus = ix.cells.select(col("cell"),
      col(idCol).cast("long").as("id_a"), col(vecCol).as("v_a"),
      Similarity.l2Norm(col(vecCol)).as("nrm_a"))
    // Over-gate fallback cannot be a plain shuffle join: `cell` has only k
    // distinct values, so hash-partitioning the corpus on it would collapse
    // 100 TB into ≤ k reducer tasks. Salt instead (the probes side — the
    // small-by-construction (query, cell) scalar pairs — replicates per
    // salt; the corpus scatters over the full partition count).
    val cand =
      if (bcast) corpus.join(broadcast(probes), Seq("cell"))
      else Skew.saltedJoin(corpus, probes, "cell",
        salts = spark.sessionState.conf.numShufflePartitions)
    val scored = cand
      .join(hint(q), Seq("id_b"))
      .filter(col("nrm_a") > 0 && col("nrm_b") > 0)
      .select(col("id_a"), col("id_b"),
        round(Similarity.dot(col("v_a"), col("v_b"))
          / (col("nrm_a") * col("nrm_b")), 4).as("score"))
    Similarity.rankTopK(scored, topK)
  }
}
