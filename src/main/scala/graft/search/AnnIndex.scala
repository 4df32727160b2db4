package graft.search

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** The embedding tier's "build once, query many" rung — a persisted IVF
  * index as Spark TABLES, mirroring [[InvertedIndex]]'s posture for text:
  * where [[Similarity.ivfKnn]] re-assigns the whole corpus on every call
  * (right for one-shot questions), this tier pays the assignment scan once
  * at build time and persists (id, bucket, unit vector) with one
  * PARTITION DIRECTORY PER IVF BUCKET (`pbucket=<bucket>` — the inverted
  * list AS the partition, the on-disk shape FAISS gives its inverted
  * lists) plus file-bucketing by `bucket` within. A kNN query reads ONLY
  * its `nprobe` probed lists' directories (catalog partition pruning,
  * spec-asserted on the pruned path count like the text index's term
  * lookups), and — the r18 point of the layout — maintenance rewrites
  * ONLY the lists an append batch touches ([[compactIvfIndex]]/
  * [[upsertIvfIndex]] fold per-partition instead of relaying out the
  * whole table). At 100 TB of vectors that is the difference between a
  * corpus scan per query batch and an (nprobe/lists)-sized pruned read —
  * and between a table-sized and a batch-sized maintenance pass. The
  * build pays ONE bucket-keyed shuffle for this layout (each list lands
  * in exactly one task → one file per list); that is the one-time price
  * of batch-shaped maintenance and exact list pruning.
  *
  * Side tables: centroids (index-sized: n/step rows) in
  * `<table>__centroids`; build parameters (buckets, dim, step, hashed,
  * m) in a one-row `<table>__meta` — queries validate the embedding
  * dimension against it (a mismatched query would otherwise dot to null
  * and return silent garbage), and [[registerIvfIndex]] reads the bucket
  * count from it instead of trusting a caller flag. Unit forms are
  * stored, not raw vectors, so probing never recomputes norms — the same
  * denormalization [[InvertedIndex]] applies to `dl`.
  */
object AnnIndex {

  // ---- shared internals ----

  /** Partition column of the persisted layout: one directory per IVF
    * bucket, the partition VALUE being the bucket id itself. Kept
    * alongside the `bucket` data column (a column cannot be both
    * partition key and file-bucket key) so every query path keeps
    * reading `bucket` unchanged while the writer gets per-list
    * directories. No leading underscore: Hive metastore partition-filter
    * pushdown rejects `_`-prefixed partition names, and this layout
    * should survive a metastore deployment.
    */
  private[graft] val PartCol = "pbucket"

  /** Resolved filesystem location of a cataloged table (NOT assumed to
    * be `warehouse/<name>` — a re-registered external index lives where
    * its debris was found).
    */
  private def tableLoc(spark: SparkSession,
                       name: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(name)).location)

  private def warehousePath(spark: SparkSession,
                            name: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), name)

  /** The persisted-layout writer shared by both tiers' builds, the
    * balance-guard rewrites, and the maintenance fold's staging write:
    * `df` (id/bucket/payload rows) lands partitioned by [[PartCol]] (=
    * the bucket id) and file-bucketed by `bucket` within. The
    * `repartition(bucket)` is the layout's ONE bucket-keyed shuffle —
    * it co-locates each inverted list in a single task so every
    * partition directory gets exactly one file (without it a corpus
    * scan's every task would open a writer per list it sees: tasks ×
    * lists files, the small-file explosion that killed the
    * zero-shuffle-write variant at a 40k-list rehearsal).
    */
  private def writeIndexRows(df: DataFrame, buckets: Int, table: String,
                             mode: SaveMode): Unit =
    df.withColumn(PartCol, col("bucket"))
      .repartition(col("bucket"))
      .write.mode(mode).format("parquet")
      .partitionBy(PartCol).bucketBy(buckets, "bucket").sortBy("bucket")
      .saveAsTable(table)

  /** Assign unit vectors to their argmax-cosine centroid (tie → lower
    * centroid id) — the ONE copy of the assignment the build and append
    * paths share, same arithmetic as [[Similarity.ivfAssign]]: the
    * centroid frame gathers once (cap-guarded) and the assignment is the
    * GATED codegen kernel projection — zero shuffle at any corpus size
    * (this was the last join + groupBy(id) re-aggregation shape left;
    * it shuffled every unit vector corpus-wide on each index build).
    */
  private def assignUnit(b: DataFrame, cents: DataFrame,
                         keep: Seq[String] = Nil): DataFrame =
    Similarity.assignWithCentroidFrame(b, "id", cents, "AnnIndex.assignUnit",
        keep)
      .select(col("id") +: col("bucket") +: col("bv") +: keep.map(col): _*)

  /** Rank each query against the centroid side table and keep its
    * `nprobe` best buckets — (query_id, qv, bucket), eagerly
    * checkpointed (|queries|×nprobe rows, computed once, feeds both the
    * literal-IN prune and the score join).
    */
  private[graft] def probeBucketsOf(spark: SparkSession, table: String,
                             queries: DataFrame, idCol: String,
                             vecCol: String, nprobe: Int): DataFrame =
    probeRowsOf(spark, table, queries, idCol, vecCol, nprobe,
      metaDimOf(spark, table))._1

  /** The one-row `__meta` dimension, if the completion record exists —
    * read ONCE per query call and threaded down (the dim validation and
    * the PQ residual flag each paid their own one-row head() job before).
    */
  private def metaDimOf(spark: SparkSession, table: String): Option[Int] =
    if (spark.catalog.tableExists(s"${table}__meta"))
      Some(spark.table(s"${table}__meta").head().getAs[Int]("dim"))
    else None

  /** One collected probe pass returning the LocalRelation probe frame
    * AND its driver rows plus the distinct asked query ids. The kernel
    * arm folds the per-query dimension validation (formerly its own
    * limit-count scan job) and the asked-id set (formerly
    * [[widenStarved]]'s own distinct-collect job) into the SAME collect
    * via `explode_outer` + a size column — one job where the former
    * shape paid three; the literal bucket-prune list is read from the
    * same rows instead of a distinct() job over the LocalRelation.
    * A persisted index whose centroid table exceeds the gather cap
    * (external writer, older step choice) stays QUERYABLE through the
    * join+window fallback: broadcast hash join either way, just the Q×C
    * window shuffle instead of the kernel — that arm keeps its former
    * jobs (askedIds = None; callers that need the set collect it).
    */
  private def probeRowsOf(spark: SparkSession, table: String,
                          queries: DataFrame, idCol: String, vecCol: String,
                          nprobe: Int, metaDim: Option[Int])
      : (DataFrame, Array[org.apache.spark.sql.Row], Option[Array[Any]],
         Option[Long]) = {
    val centTable = spark.table(s"${table}__centroids")
    Similarity.gatherCentroidFrameOpt(centTable) match {
      case Some(cents) =>
        val szCol = "__graft_qdim"
        val withSz = queries.withColumn(szCol,
          coalesce(size(col(vecCol)), lit(-1)))
        val q = Similarity.unitProjectKeep(withSz, idCol, "query_id",
          vecCol, "qv", Seq(szCol))
        val outer = Similarity.probeTopCentroidsOuter(q, cents, nprobe,
          Seq(szCol))
        val raw = outer.collect()
        // check dim: the caller-threaded __meta value when it already
        // holds the meta row (PQ path), else the gathered centroids'
        // own dimensionality — same number by the build contract, and
        // it saves the plain tier a one-row __meta job per call
        metaDim.orElse(cents.headOption.map(_._2.length)).foreach { dim =>
          require(!raw.exists(_.getInt(3) != dim),
            s"query frame contains a null or non-$dim-dimensional " +
              s"embedding (table $table was built over $dim-dimensional " +
              "vectors)")
        }
        val schema = org.apache.spark.sql.types.StructType(
          outer.schema.fields.take(3))
        val rows = raw.filter(!_.isNullAt(2)).map(r =>
          org.apache.spark.sql.Row(r.get(0), r.get(1), r.get(2)))
        val asked = raw.map(_.get(0)).distinct
        (spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema),
          rows, Some(asked), Some(cents.length.toLong))
      case None =>
        metaDim.orElse(metaDimOf(spark, table)).foreach { dim =>
          // EVERY row checked (query frames are small by contract): a
          // single mismatched or null vector would dot to null and
          // silently return arbitrary/empty neighbors for that query
          val bad = queries
            .where(col(vecCol).isNull || size(col(vecCol)) =!= dim)
            .limit(1).count()
          require(bad == 0,
            s"query frame contains a null or non-$dim-dimensional " +
              s"embedding (table $table was built over $dim-dimensional " +
              "vectors)")
        }
        val q = Similarity.unitProject(queries, idCol, "query_id", vecCol,
          "qv")
        val wq = Window.partitionBy("query_id")
          .orderBy(desc("csim"), asc("centroid_id"))
        // drop null-cv centroid rows to match gatherCentroidFrameOpt's
        // contract — without the filter a null csim sorts last but can
        // still be emitted as a probe bucket once nprobe exceeds the
        // non-null centroid count
        val frame = q.join(broadcast(centTable.where(col("cv").isNotNull)))
          .withColumn("csim", Similarity.dot(col("qv"), col("cv")))
          .withColumn("rn", row_number().over(wq)).where(col("rn") <= nprobe)
          .select(col("query_id"), col("qv"),
            col("centroid_id").cast("long").as("bucket"))
        val rows = frame.collect()
        (spark.createDataFrame(java.util.Arrays.asList(rows: _*),
          frame.schema), rows, None, None)
    }
  }

  /** The index table pruned to the probed buckets: the bucket ids reach
    * the scan as a LITERAL `IN` (a join key can't prune file buckets);
    * the list is bounded by |queries| × nprobe by construction.
    */
  private def prunedIndex(spark: SparkSession, table: String,
                          probeBuckets: Array[Long]): DataFrame = {
    val idx = spark.table(table).where(col("bucket").isin(probeBuckets: _*))
    // per-list layout: the same literal list prunes PARTITION directories
    // (the probed lists are the only paths listed/read); legacy bucketed-
    // only tables skip the clause and keep their file-bucket pruning
    if (idx.columns.contains(PartCol))
      idx.where(col(PartCol).isin(probeBuckets: _*))
    else idx
  }

  /** Per-query top-k over (query_id, id, cos) candidates — self-match
    * excluded upstream; ties break neighbor-id-ascending, cos round(4)
    * like every ANN surface.
    */
  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(col("cos"), 4).as("cos"), col("rank").cast("long").as("rank"))
  }

  /** `ncents` = the FINAL non-null centroid count (counted off the
    * written `__centroids`, so a balance-guard rewrite is reflected) —
    * the number [[widenStarved]]'s exhaustive-vs-probed decision reads
    * per query; recording it here removes a per-call count() over the
    * side table. `plist` = the per-list partitioned layout RECORD for
    * external readers/debugging — layout dispatch itself reads the
    * table schema's [[PartCol]] column (the table is the source of
    * truth; a hand-edited flag cannot contradict it). `resid` = the PQ
    * tier's residual-encoding flag ([[writeIvfPqIndex]]) — the query and
    * append paths branch on it.
    */
  private def writeMeta(spark: SparkSession, table: String, buckets: Int,
                        dim: Int, step: Int, hashed: Boolean, m: Int,
                        ncents: Long, plist: Boolean = true,
                        resid: Boolean = false): Unit = {
    import spark.implicits._
    Seq((buckets, dim, step, hashed, m, ncents, plist, resid))
      .toDF("buckets", "dim", "step", "hashed", "m", "ncents", "plist",
        "resid")
      .write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(s"${table}__meta")
  }

  /** The PQ tier's residual-encoding flag off `__meta` (false for plain
    * tiers and pre-resid metas). Query/maintenance paths read the flag
    * from their one threaded meta row instead; this wrapper serves
    * external probes.
    */
  private[graft] def isResidual(spark: SparkSession, table: String): Boolean =
    metaRowOf(spark, table).exists(r =>
      r.schema.fieldNames.contains("resid") && r.getAs[Boolean]("resid"))

  /** Non-null centroid count of a saved index — from `__meta`'s `ncents`
    * (one one-row read) when present; pre-ncents indices fall back to
    * counting the side table.
    */
  private[graft] def centroidCountOf(spark: SparkSession,
                                     table: String): Long = {
    val meta = s"${table}__meta"
    val fromMeta =
      if (spark.catalog.tableExists(meta)) {
        val r = spark.table(meta).head()
        if (r.schema.fieldNames.contains("ncents"))
          Some(r.getAs[Long]("ncents"))
        else None
      } else None
    fromMeta.getOrElse(
      spark.table(s"${table}__centroids").where(col("cv").isNotNull).count())
  }

  // The per-query dimension validation (a mismatched dot product
  // evaluates to null and would return arbitrary rows instead of
  // erroring) lives inside [[probeRowsOf]] (folded into the probe
  // collect on the kernel arm — one job instead of its own scan) and
  // [[assignNewWithMeta]]; both skip it for pre-meta indices.

  // ---- bucket balance (the measured 1000× hot-bucket failure mode) ----

  /** Session dial for the build-time balance guard: an index whose
    * largest bucket holds more than this multiple of the even-split
    * expectation gets its centroid selection rerun (decorrelated reseed +
    * Lloyd refinement). ≤ 0 disables. The 1000× rehearsal measured the
    * failure this guards: a degenerate id-mod-step centroid sample (step
    * divided the fixture's replica period, so every sampled centroid was
    * the same vector) collapsed 2M vectors into 3 buckets and the query
    * row degraded 18× (114.9 s vs 6.25 s healthy) — a cliff any real
    * corpus hits with an unlucky or clustered sample, previously
    * prevented only by a fixture-side sampling fix.
    */
  private[graft] val BalanceGuardRatioConf = "graft.ann.balanceGuardRatio"
  private[graft] val BalanceGuardRatioDefault = 20.0

  private[graft] def balanceGuardRatio(spark: SparkSession): Double =
    spark.conf.getOption(BalanceGuardRatioConf).map(_.toDouble)
      .getOrElse(BalanceGuardRatioDefault)

  /** Max-bucket mass over the even-split expectation for a saved index:
    * 1.0 = perfectly balanced, `centroids` = everything in one bucket.
    * One column-pruned agg over the written table (reads only `bucket`)
    * plus an index-sized centroid count — the cheap post-build check that
    * bounds worst-case query cost, since a probe reads whole buckets.
    */
  private[graft] def bucketBalanceRatio(spark: SparkSession,
                                        table: String): Double =
    balanceRatioWith(spark, table,
      spark.table(s"${table}__centroids")
        .where(col("cv").isNotNull).count())

  /** [[bucketBalanceRatio]] for callers that already hold the non-null
    * centroid count on the driver (the build fast path) — one
    * column-pruned max/total agg, no side-table count job. Same
    * degenerate-input semantics as the public wrapper.
    */
  private def balanceRatioWith(spark: SparkSession, table: String,
                               nCents: Long): Double = {
    val r = spark.table(table).where(col("bucket").isNotNull)
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .agg(max("n").as("mx"), sum("n").as("tot")).head()
    if (r.isNullAt(0) || r.getLong(1) == 0L) return 1.0
    if (nCents == 0L) 1.0
    else r.getLong(0).toDouble / (r.getLong(1).toDouble / nCents)
  }

  /** Drop an index's side tables (catalog entries AND warehouse dirs —
    * the in-memory catalog can have forgotten a dir that would otherwise
    * resurrect stale state after a restart). Called by the force-rebuild
    * paths immediately before they overwrite the main table, so every
    * crash window leaves side state ABSENT (loud at query time) rather
    * than stale (silent mismatch).
    */
  private def dropSideTables(spark: SparkSession, table: String): Unit =
    Seq("__meta", "__centroids", "__codebook").foreach(suffix =>
      InvertedIndex.dropTableAndDir(spark, table + suffix))

  // ---- build ----

  /** Build the IVF index and persist it bucketed by the centroid bucket.
    * Deterministic sample centroids (id ≡ 0 mod `step` — swap in
    * [[Similarity.kmeansCentroids]] upstream by pre-assigning if needed);
    * `buckets` is the table's file-bucket count (≈ centroid count or a
    * divisor; pruning selects file buckets by hash(bucket id)). Fails
    * fast when the centroid selection comes up EMPTY (step too large for
    * the corpus — with `hashedIds` the ~1/step hash filter is
    * probabilistic, so small corpora can select nothing), which would
    * otherwise persist an empty index without a word.
    *
    * Force-rebuild crash contract: the writes (index, `__centroids`,
    * `__meta`) are not one atomic commit, so the old side tables are
    * DROPPED immediately before the index overwrite and `__meta` is
    * written LAST as the completion record — a crash in any window
    * leaves side state absent (queries and [[registerIvfIndex]] fail
    * loudly at the missing table) rather than a complete-looking index
    * silently probing OLD centroids against the new assignment. Re-run
    * the same build to converge, or build under a fresh table name and
    * switch readers. Steady-state maintenance
    * ([[compactIvfIndex]]/[[upsertIvfIndex]]) has no such window — it
    * swaps rename-aside and never touches the centroid side.
    */
  /** `keep`: extra columns of `base` persisted verbatim alongside each
    * (id, bucket, bv) row — filterable metadata for [[ivfKnnIndexed]]'s
    * `filter` (language, source, license, …). Denormalized into the index
    * like `dl` in postings: the filter then runs at the PRUNED SCAN
    * (parquet pushdown composing with bucket pruning), no metadata join
    * at query time and no corpus join at build time (the columns ride
    * the one assignment scan projection).
    */
  def writeIvfIndex(base: DataFrame, idCol: String, vecCol: String,
                    step: Int, table: String, buckets: Int,
                    force: Boolean = false,
                    hashedIds: Boolean = false,
                    keep: Seq[String] = Nil): Unit = {
    val spark = base.sparkSession
    requireKeepNames(keep)
    val b = Similarity.unitProjectKeep(base, idCol, "id", vecCol, "bv", keep)
    val selection =
      if (!hashedIds)
        b.where(col("id") % step === 0)
          .select(col("id").cast("long").as("centroid_id"), col("bv").as("cv"))
      else
        // non-numeric ids (CLI corpora, UUID keys): select ~1/step of the
        // vectors by id hash and use the hash AS the (long) bucket id, so
        // the index schema is id-type-independent; an xxhash collision
        // merely merges two buckets — probing and assignment stay
        // consistent because both go through the same mapping
        b.where(pmod(xxhash64(col("id").cast("string")), lit(step.toLong)) === 0)
          .select(xxhash64(col("id").cast("string")).as("centroid_id"),
            col("bv").as("cv"))
    // ONE capped collect of the (index-sized by contract) selection scan
    // replaces the former localCheckpoint materialization + limit(1)
    // probe + assignment-side re-gather + two post-write count() jobs:
    // the driver rows serve the kernel broadcast, the `__centroids`
    // write, the balance guard's centroid count and `__meta`'s ncents.
    // Null-cv rows (zero/null vectors) STAY in `__centroids` (the side
    // table lists the full sample; every reader drops them) but are
    // excluded from the kernel array, exactly like the former gather.
    val cap = math.max(1, Similarity.intConf(spark,
      Similarity.MaxGatheredCentroidsConf,
      Similarity.MaxGatheredCentroidsDefault))
    var selRows = selection.limit(cap + 1).collect()
    // a truncated all-rows collect might still fit after the null drop —
    // retry non-null-only (the exact cap semantics of the former
    // assignment-side gather); `__centroids` then falls back to a
    // distributed write because the full null-bearing sample is unknown
    var centsDistributed = false
    if (selRows.length > cap) {
      selRows = selection.where(col("cv").isNotNull).limit(cap + 1).collect()
      if (selRows.length > cap) sys.error(
        "writeIvfIndex: centroid selection exceeds the gather cap " +
          s"(${Similarity.MaxGatheredCentroidsConf}, default " +
          s"${Similarity.MaxGatheredCentroidsDefault} rows) — it must be " +
          "index-sized (broadcast to every probe)")
      centsDistributed = true
    }
    require(selRows.nonEmpty,
      s"writeIvfIndex: step=$step selected ZERO centroids on this corpus " +
        "— lower step (the hashedIds filter is probabilistic: ~1/step)")
    val centArr = selRows.filter(!_.isNullAt(1))
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    require(centArr.nonEmpty,
      s"writeIvfIndex: step=$step selected only zero/null-direction " +
        "centroid rows on this corpus — lower step")
    val dim = centArr.head._2.length
    locally {
      // force-rebuild: drop the OLD side tables immediately before the
      // index overwrite (not earlier — a failed centroid require above
      // must leave a working old index whole). From here on the old
      // index is gone either way, and a crash in any window leaves the
      // side tables ABSENT (queries throw loudly at the missing
      // __centroids/__meta) instead of silently probing old centroid ids
      // against the new assignment. __codebook: a previous PQ build's
      // table that this build would otherwise leave to be re-registered
      // against bv-carrying rows.
      if (force) dropSideTables(spark, table)
      writeIndexRows(
        Similarity.assignWithCentroidArray(b, "id", centArr, keep)
          .select(col("id") +: col("bucket") +: col("bv") +:
            keep.map(col): _*),
        buckets, table,
        if (force) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      if (centsDistributed)
        selection.write.mode(SaveMode.Overwrite).format("parquet")
          .saveAsTable(s"${table}__centroids")
      else
        // ONE file: a LocalRelation write otherwise round-robins the
        // index-sized rows into defaultParallelism shards of ~2 KB, and
        // the tiny-file scan back inflates every later gather into a
        // multi-partition executeTake (r19; also plain file hygiene —
        // guide §6: small files hurt twice)
        spark.createDataFrame(java.util.Arrays.asList(selRows: _*),
            selection.schema)
          .coalesce(1)
          .write.mode(SaveMode.Overwrite).format("parquet")
          .saveAsTable(s"${table}__centroids")
      var nCents: Long =
        if (centsDistributed)
          spark.table(s"${table}__centroids")
            .where(col("cv").isNotNull).count()
        else centArr.length.toLong
      // ---- balance guard: rerun a degenerate centroid selection ----
      // Runs BEFORE writeMeta so the force-rebuild crash contract holds
      // through the guard's rewrite too: a crash between the guard's
      // index overwrite and its centroids overwrite leaves the build
      // without its completion record (__meta absent/stale) — detectably
      // unfinished — instead of a complete-looking index probing OLD
      // centroid ids against reseeded buckets (silent zero neighbors).
      // The id-mod-step sample is deterministic but BLIND to vector
      // structure: a sample of (near-)identical vectors funnels the whole
      // corpus into a handful of buckets, and probing then reads
      // corpus-sized buckets (the measured 18× query cliff). On gross
      // imbalance, reseed DECORRELATED from id arithmetic (salted-hash
      // ~1/step sample — the original failure was step dividing an id
      // period) and Lloyd-refine (2 rounds, each one corpus scan) to also
      // escape value-coincident samples, then rewrite. A same-seeded
      // kmeans alone could NOT recover: identical seeds tie-break every
      // row into the lowest id and the other centroids never move.
      // The DECISION phase (balance check, reseed gather, Lloyd rounds,
      // checkpoint of the refined centroids) is read-only and BEST-EFFORT:
      // the pre-guard build is already complete and consistent, so no
      // exception here may abort the function before writeMeta below
      // bricks it — an over-gather-cap reseed (a supported config whose
      // indexes stay queryable via the join fallback) or anything
      // unexpected warns and keeps the index. The REWRITE phase is the
      // opposite: once the index overwrite begins, exceptions PROPAGATE —
      // swallowing one after the index write but before the centroids
      // write would let writeMeta stamp a mismatched index complete,
      // exactly the silent state the crash contract forbids (unstamped,
      // it fails loudly and a re-run converges).
      val guardCents: Option[(DataFrame, Long)] = try {
        val guard = balanceGuardRatio(spark)
        // the centroid count is already on the driver (nCents) — the
        // balance check is one column-pruned max/total agg, not the
        // former agg + side-table count pair
        if (guard > 0 && balanceRatioWith(spark, table, nCents) > guard) {
          val reseed = b
            .where(pmod(xxhash64(concat(col("id").cast("string"),
              lit("#graft-balance-reseed"))), lit(step.toLong)) === 0)
            .where(col("bv").isNotNull)
            .select((if (!hashedIds) col("id").cast("long")
              else xxhash64(col("id").cast("string"))).as("centroid_id"),
              col("bv").as("cv"))
          val seeds = Similarity.gatherCentroidFrameOpt(reseed)
            .getOrElse(Array.empty[(Long, Array[Double])])
          if (seeds.isEmpty) {
            System.err.println("writeIvfIndex: balance guard found a " +
              s"degenerate id-mod-$step sample but the reseed selected " +
              "zero or over-gather-cap vectors — index kept; adjust step")
            None
          } else {
            val refined = Similarity.lloydRefine(b, "id", seeds, iters = 2)
            import spark.implicits._
            Some((refined.toSeq
              .map { case (cid, v) => (cid, v.toSeq) }
              .toDF("centroid_id", "cv").localCheckpoint(true),
              refined.length.toLong))
          }
        } else None
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"writeIvfIndex: balance guard aborted " +
            s"($e) — index kept as built")
          None
      }
      guardCents.foreach { case (cents2, nRefined) =>
        try {
          // __centroids dropped BEFORE the index overwrite: a crash
          // anywhere inside the rewrite then leaves the centroid side
          // ABSENT and every query throws loudly at the missing table.
          // Without the drop, a crash between the two writes would leave
          // refined buckets probing the STALE centroid sample — and
          // because requireQueryDim tolerates a missing __meta (pre-meta
          // indices) and the query path never reads it otherwise, that
          // index would be silently QUERYABLE and wrong, not unfinished.
          InvertedIndex.dropTableAndDir(spark, s"${table}__centroids")
          writeIndexRows(assignUnit(b, cents2, keep), buckets, table,
            SaveMode.Overwrite)
          cents2.write.mode(SaveMode.Overwrite).format("parquet")
            .saveAsTable(s"${table}__centroids")
          // the rewritten side table holds the refined (all non-null)
          // set — its count rode along from the driver-side Lloyd output
          nCents = nRefined
        } finally
          org.apache.spark.sql.graft.Bridge.releaseLocalCheckpoint(cents2)
        val after = bucketBalanceRatio(spark, table)
        System.err.println(s"writeIvfIndex: balance guard rewrote $table " +
          s"(max bucket over the guard ratio from the id-mod-$step " +
          s"sample; after reseed+kmeans: ${math.round(after * 10) / 10.0}x)")
        if (after > balanceGuardRatio(spark))
          System.err.println(s"writeIvfIndex: $table is still " +
            s"${math.round(after * 10) / 10.0}x after the guard rewrite — " +
            "the corpus itself is heavily clustered; raise nprobe for " +
            "recall or lower step for more, smaller buckets")
      }
      // the completion record, LAST (see the force-rebuild crash contract
      // in the scaladoc) — also past the guard's possible rewrite above
      writeMeta(spark, table, buckets, dim, step, hashedIds, m = 0,
        ncents = nCents)
    }
  }

  /** The memory-side completion of the persisted tier — IVF-PQ as tables
    * (FAISS `IVFx,PQy`, persisted): the index rows store m-byte PQ CODES
    * instead of d-double unit vectors (the representation that fits 1e9
    * vectors per executor group), bucketed by IVF bucket like
    * [[writeIvfIndex]]; the codebook (m × K × d/m doubles — tiny) goes in
    * a `<table>__codebook` side table, centroids in `__centroids`. Same
    * assignment and single-normalize encode arithmetic as
    * [[Similarity.ivfPqKnn]], so the persisted path reproduces it row for
    * row (spec-asserted; the same oracle replay). Numeric ids only (the
    * codebook sample is id-mod-`codeStep`); an empty centroid or codebook
    * sample fails fast inside the assignment/codebook derivation.
    */
  /** `keep` as in [[writeIvfIndex]]: metadata columns persisted verbatim
    * alongside the (id, bucket, codes) rows for [[ivfPqKnnIndexed]]'s
    * `filter` — they ride the assignment/encode scan, no build join.
    */
  /** `encodeResidual` (FAISS's IVFPQ default, off here): codes encode
    * `unit − centroid(bucket)` instead of the unit vector itself, and the
    * codebook is trained on the residual sample — the classic recall-
    * at-same-m trade. The cost is coupling: codes now DEPEND on the
    * bucket assignment, so the balance guard's recovery must re-derive
    * the codebook and every code (the residual-free tier's bit-identity
    * shortcut does not apply), and [[ivfPqKnnIndexed]] adds the bucket
    * centroid back before the ADC dot (one broadcast join of the
    * index-sized centroid table into the probe frame). Graded against
    * the residual-free default by the `ann_recall_ivfpq_resid` driver
    * query — keep whichever wins on your corpus.
    */
  def writeIvfPqIndex(base: DataFrame, idCol: String, vecCol: String,
                      step: Int, m: Int, table: String, buckets: Int,
                      codeStep: Int = 50, force: Boolean = false,
                      keep: Seq[String] = Nil,
                      encodeResidual: Boolean = false): Unit = {
    val spark = base.sparkSession
    import spark.implicits._
    requireKeepNames(keep)
    require(step > 0, s"ivf step must be positive, got $step")
    Similarity.requireIntegralId(base, idCol, "writeIvfPqIndex",
      "hash ids to a long upstream (e.g. xxhash64(id)) — the PQ build " +
        "has no hashedIds arm")
    val b = Similarity.unitProjectKeep(base, idCol, idCol, vecCol, "bv", keep)
    val selection = b.where(col(idCol) % step === 0)
      .select(col(idCol).cast("long").as("centroid_id"), col("bv").as("cv"))
    // ONE capped collect of the centroid selection, exactly as in
    // [[writeIvfIndex]]: it serves the assignment kernel, the
    // `__centroids` write, the balance guard's count, `__meta`'s ncents
    // AND — when `codeStep == step`, the driver queries' configuration —
    // the PQ codebook sample (the id-mod-codeStep rows are the SAME
    // set), replacing the former whole-corpus `.cache()` + separate
    // codebook-sample collect with two plain scans and zero cache.
    val centCap = math.max(1, Similarity.intConf(spark,
      Similarity.MaxGatheredCentroidsConf,
      Similarity.MaxGatheredCentroidsDefault))
    var selRows = selection.limit(centCap + 1).collect()
    var centsDistributed = false
    if (selRows.length > centCap) {
      selRows = selection.where(col("cv").isNotNull)
        .limit(centCap + 1).collect()
      require(selRows.length <= centCap,
        s"writeIvfPqIndex: step=$step yields more than $centCap sampled " +
          s"centroids on this corpus — raise step (or the " +
          s"${Similarity.MaxGatheredCentroidsConf} dial)")
      centsDistributed = true
    }
    val centArr = selRows.filter(!_.isNullAt(1))
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    if (centArr.isEmpty && (selRows.nonEmpty || !b.isEmpty)) sys.error(
      s"writeIvfPqIndex: step=$step selected ZERO centroids on this " +
        "corpus — lower step")
    val bucketType = base.schema(base.schema.fieldIndex(idCol)).dataType
    val assigned = Similarity.assignWithCentroidArray(b, idCol, centArr, keep)
      .select(col(idCol) +: col("bv") +:
        col("bucket").cast(bucketType).as("bucket") +: keep.map(col): _*)
    /** The frame whose `bv` is what the codes ENCODE: the unit vectors
      * themselves, or (residual mode) unit − assigned centroid, the
      * centroid arriving via one broadcast join of the sample frame.
      */
    def encodable(rows: DataFrame,
                  cents: DataFrame): DataFrame =
      if (!encodeResidual) rows
      else rows.join(
          broadcast(cents.select(col("centroid_id"), col("cv").as("__cv"))),
          rows("bucket") === col("centroid_id"), "left")
        .select(col("id") +: col("bucket") +:
          zip_with(col("bv"), col("__cv"), (a, b) => a - b).as("bv") +:
          keep.map(col): _*)
    locally {
      val sampleCents =
        if (centsDistributed) selection
        else spark.createDataFrame(java.util.Arrays.asList(selRows: _*),
          selection.schema)
      val encBase = encodable(
        assigned.select(col(idCol).as("id") +: col("bucket") +:
          col("bv") +: keep.map(col): _*), sampleCents)
      val codebook =
        if (!encodeResidual && codeStep == step && !centsDistributed)
          Similarity.codebookFromRows(
            selRows.map(r => (r.getLong(0),
              if (r.isNullAt(1)) null else r.getSeq[Double](1).toArray)),
            m, codeStep, 8192)
        else Similarity.codebookFromUnit(
          encBase.where(col("id") % codeStep === 0), "id", m, codeStep, 8192)
      // same force-rebuild crash contract as [[writeIvfIndex]]: old side
      // tables dropped just before the index overwrite (after the
      // failure-prone codebook derivation, so a failed rebuild attempt
      // leaves a working old index whole), new meta written last — a
      // crash mid-rebuild leaves queries throwing at a missing
      // __centroids/__codebook, never ADC-decoding new codes against the
      // OLD codebook (silent garbage neighbors)
      if (force) dropSideTables(spark, table)
      writeIndexRows(
        Similarity.pqEncodeOnUnit(graft.Par.fanOut(encBase), codebook)
          // LONG bucket: prunedIndex probes with long literals, and an
          // int-typed column would be wrapped in a Cast that silently
          // defeats list pruning (int-id corpora assign int buckets)
          .select(col("id") +:
            col("bucket").cast("long").as("bucket") +:
            col("codes") +: keep.map(col): _*),
        buckets, table,
        if (force) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      // local branch coalesced to ONE file (see writeIvfIndex's
      // `__centroids` write); the distributed over-cap branch keeps its
      // scan parallelism
      (if (centsDistributed) sampleCents else sampleCents.coalesce(1))
        .write.mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable(s"${table}__centroids")
      var nCents: Long =
        if (centsDistributed)
          spark.table(s"${table}__centroids")
            .where(col("cv").isNotNull).count()
        else centArr.length.toLong
      codebook.zipWithIndex.flatMap { case (ks, j) =>
        ks.zipWithIndex.map { case (c, k) => (j, k, c.toSeq) }
      }.toSeq.toDF("sub", "code", "centroid")
        .coalesce(1) // m×K rows — one file, not defaultParallelism shards
        .write.mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable(s"${table}__codebook")
      // ---- balance guard: rerun a degenerate centroid selection ----
      // Same failure mode and same recover-don't-warn posture as
      // [[writeIvfIndex]]'s guard (see there for the measured 18× query
      // cliff): a degenerate id-mod-step centroid sample funnels the
      // corpus into a handful of buckets and probing reads corpus-sized
      // code runs. Recovery cost depends on the encoding mode. DEFAULT
      // (residual-free) codes encode the unit vector itself and the
      // codebook samples those same unit vectors, so NEITHER depends on
      // the bucket assignment: the rewrite changes only `bucket`, the
      // re-encode reproduces bit-identical codes, and `__codebook` stays
      // valid verbatim (not rewritten — one fewer crash window).
      // RESIDUAL mode couples codes to the assignment (code = f(unit −
      // centroid)), so recovery re-derives EVERYTHING: new residuals,
      // a RETRAINED codebook, re-encoded codes — and `__codebook` joins
      // `__centroids` in the drop-before-overwrite crash window (a crash
      // leaves both side tables absent → loud, never new codes decoding
      // against the stale residual codebook).
      // DECISION phase (balance check, reseed gather, Lloyd rounds):
      // read-only + best-effort, must never abort a complete build before
      // writeMeta stamps it. REWRITE phase: exceptions PROPAGATE — a
      // swallowed failure between the index overwrite and the centroids
      // overwrite would let writeMeta stamp a mismatched index complete
      // (unstamped, it fails loudly and a re-run converges).
      val guardCents: Option[(DataFrame, Long)] = try {
        val guard = balanceGuardRatio(spark)
        if (guard > 0 && balanceRatioWith(spark, table, nCents) > guard) {
          val reseed = assigned
            .where(pmod(xxhash64(concat(col(idCol).cast("string"),
              lit("#graft-balance-reseed"))), lit(step.toLong)) === 0)
            .where(col("bv").isNotNull)
            .select(col(idCol).cast("long").as("centroid_id"),
              col("bv").as("cv"))
          val seeds = Similarity.gatherCentroidFrameOpt(reseed)
            .getOrElse(Array.empty[(Long, Array[Double])])
          if (seeds.isEmpty) {
            System.err.println("writeIvfPqIndex: balance guard found a " +
              s"degenerate id-mod-$step sample but the reseed selected " +
              "zero or over-gather-cap vectors — index kept; adjust step")
            None
          } else {
            val refined = Similarity.lloydRefine(
              assigned.select(col(idCol).as("id"), col("bv")), "id",
              seeds, iters = 2)
            Some((refined.toSeq
              .map { case (cid, v) => (cid, v.toSeq) }
              .toDF("centroid_id", "cv").localCheckpoint(true),
              refined.length.toLong))
          }
        } else None
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"writeIvfPqIndex: balance guard aborted " +
            s"($e) — index kept as built")
          None
      }
      guardCents.foreach { case (cents2, nRefined) =>
        try {
          // __centroids dropped before the index overwrite, exactly as in
          // [[writeIvfIndex]]'s guard: a crash anywhere inside the
          // rewrite leaves the centroid side ABSENT (queries throw
          // loudly) instead of a silently queryable index probing the
          // stale sample against refined buckets. Residual mode also
          // drops __codebook here — its contents are assignment-coupled
          // and about to be retrained (see the guard comment above).
          InvertedIndex.dropTableAndDir(spark, s"${table}__centroids")
          if (encodeResidual)
            InvertedIndex.dropTableAndDir(spark, s"${table}__codebook")
          val reassigned = Similarity.assignWithCentroidFrame(
            assigned.select(col(idCol).as("id") +: col("bv") +:
              keep.map(col): _*),
            "id", cents2, "writeIvfPqIndex.guard", keep)
          val encBase2 = encodable(reassigned
            .select(col("id") +: col("bucket") +: col("bv") +:
              keep.map(col): _*), cents2)
          val codebook2 =
            if (!encodeResidual) codebook
            else Similarity.codebookFromUnit(
              encBase2.where(col("id") % codeStep === 0), "id", m,
              codeStep, 8192)
          writeIndexRows(
            Similarity.pqEncodeOnUnit(graft.Par.fanOut(encBase2), codebook2)
              .select(col("id") +: col("bucket").cast("long").as("bucket") +:
                col("codes") +: keep.map(col): _*),
            buckets, table, SaveMode.Overwrite)
          cents2.write.mode(SaveMode.Overwrite).format("parquet")
            .saveAsTable(s"${table}__centroids")
          if (encodeResidual)
            codebook2.zipWithIndex.flatMap { case (ks, j) =>
              ks.zipWithIndex.map { case (c, k) => (j, k, c.toSeq) }
            }.toSeq.toDF("sub", "code", "centroid")
              .write.mode(SaveMode.Overwrite).format("parquet")
              .saveAsTable(s"${table}__codebook")
          nCents = nRefined
        } finally
          org.apache.spark.sql.graft.Bridge.releaseLocalCheckpoint(cents2)
        val after = bucketBalanceRatio(spark, table)
        System.err.println(s"writeIvfPqIndex: balance guard rewrote $table " +
          s"(max bucket over the guard ratio from the id-mod-$step " +
          s"sample; after reseed+kmeans: ${math.round(after * 10) / 10.0}x)")
        if (after > balanceGuardRatio(spark))
          System.err.println(s"writeIvfPqIndex: $table is still " +
            s"${math.round(after * 10) / 10.0}x after the guard rewrite — " +
            "the corpus itself is heavily clustered; raise nprobe for " +
            "recall or lower step for more, smaller buckets")
      }
      // the completion record, LAST — past the guard's possible rewrite,
      // exactly like [[writeIvfIndex]]'s crash contract
      writeMeta(spark, table, buckets,
        dim = codebook.map(_.head.length).sum, step = step, hashed = false,
        m = m, ncents = nCents, resid = encodeResidual)
    }
  }

  /** Re-register a saved ANN index whose catalog entries were lost (the
    * in-memory catalog forgets managed tables across JVM restarts while
    * the warehouse directories survive) — the [[InvertedIndex.registerIndex]]
    * recipe for this tier. The bucket count comes from the index's own
    * `__meta` table (registered first), NOT a caller flag — a wrong count
    * would silently break file-bucket pruning and lose neighbors.
    * A metastore deployment never needs this.
    */
  def registerIvfIndex(spark: SparkSession, table: String): Unit = {
    def loc(name: String) = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), name).toString
    def registerPlain(name: String): Unit =
      if (!spark.catalog.tableExists(name)) {
        val schema = spark.read.parquet(loc(name)).schema.toDDL
        spark.sql(s"CREATE TABLE `$name` ($schema) USING parquet " +
          s"LOCATION '${loc(name)}'")
      }
    registerPlain(s"${table}__meta")
    val buckets = spark.table(s"${table}__meta").head().getAs[Int]("buckets")
    if (!spark.catalog.tableExists(table)) {
      val inferred = spark.read.parquet(loc(table)).schema
      if (inferred.fieldNames.contains(PartCol)) {
        // per-list layout: the partition column's type must be pinned to
        // BIGINT explicitly — directory-name inference types small values
        // INT, and an INT pbucket under LONG probe literals would wrap
        // every partition filter in a Cast (and unionByName maintenance
        // frames in a coercion)
        val schema = org.apache.spark.sql.types.StructType(
          inferred.filterNot(_.name == PartCol) :+
            org.apache.spark.sql.types.StructField(PartCol,
              org.apache.spark.sql.types.LongType)).toDDL
        spark.sql(s"CREATE TABLE `$table` ($schema) USING parquet " +
          s"PARTITIONED BY ($PartCol) " +
          s"CLUSTERED BY (bucket) SORTED BY (bucket) INTO $buckets BUCKETS " +
          s"LOCATION '${loc(table)}'")
        // a freshly created partitioned catalog table has NO partition
        // entries — without recovery every read returns empty
        spark.catalog.recoverPartitions(table)
      } else {
        val schema = inferred.toDDL
        spark.sql(s"CREATE TABLE `$table` ($schema) USING parquet " +
          s"CLUSTERED BY (bucket) SORTED BY (bucket) INTO $buckets BUCKETS " +
          s"LOCATION '${loc(table)}'")
      }
    }
    registerPlain(s"${table}__centroids")
    val cb = s"${table}__codebook"
    if (new org.apache.hadoop.fs.Path(loc(cb))
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(new org.apache.hadoop.fs.Path(loc(cb))))
      registerPlain(cb)
  }

  // ---- maintenance ----

  /** Assign NEW vectors against the saved index's (frozen) centroids —
    * the append half of continuous maintenance: assignment given fixed
    * centroids depends only on the row itself, so arriving vectors only
    * ever APPEND (id, bucket, bv) rows — or (id, bucket, codes) rows on
    * a PQ-tier table (m > 0 in `__meta`), where arrivals are encoded
    * against the frozen `__codebook` the same way. Run inside
    * `foreachBatch` with a parquet append (exactly the
    * [[InvertedIndex.postingsStream]] recipe) — a multi-trigger loop
    * should hold a [[streamAssigner]] instead, which reads the frozen
    * sides once for the stream instead of per batch — query the union
    * `table ∪ appends`, and fold the appends back into the bucketed
    * layout with [[compactIvfIndex]] periodically; [[upsertIvfIndex]]
    * serves BOTH tiers through this one entry point. Frozen centroids
    * (and the PQ codebook) drift as the distribution moves — refit
    * (rebuild via [[writeIvfIndex]]/[[writeIvfPqIndex]]) on the cadence
    * you'd re-train any IVF index.
    */
  /** Reserved names a `keep` column may not use: the index schemas
    * themselves (plain and PQ), the query-side aliases the probe join
    * would make ambiguous (query_id/qv — an ambiguity that would surface
    * only AFTER the expensive build), the output columns, and the
    * projection internals (a keep named `__n` would be silently REPLACED
    * by the vector norm — metadata corruption, not an error; `__enc`/
    * `decoded` likewise on the PQ encode path).
    */
  private def requireKeepNames(keep: Seq[String]): Unit = {
    val reserved = Set("id", "bucket", "bv", "codes", "decoded", "query_id",
      "qv", "cos", "rank", "neighbor_id", "csim", "rn", "__v", "__n",
      "__best", "__pb", "__enc", PartCol, "__starved_id", "__cv", "__rv")
    // case-INSENSITIVE: Spark resolves columns case-insensitively by
    // default, so keep = Seq("Bucket") would slip a case-sensitive guard
    // and only fail (or silently ambiguate) after the expensive build —
    // the post-build surprise this require exists to front-load
    val lower = keep.map(_.toLowerCase(java.util.Locale.ROOT))
    require(!lower.exists(reserved),
      s"keep columns collide with reserved index/query names " +
        s"(${reserved.toSeq.sorted.mkString(", ")}): $keep")
  }

  /** The index's keep columns, derived from the PERSISTED schema — never
    * caller-threaded state: a maintenance caller re-passing a subset,
    * superset, or reorder of the build's keep list would only surface at
    * compaction's unionByName, so the one source of truth is the table.
    */
  private[graft] def keepOf(spark: SparkSession, table: String): Seq[String] =
    spark.table(table).columns.toSeq
      .filterNot(Set("id", "bucket", "bv", "codes", PartCol))

  /** The `__codebook` side table gathered to the [m][K][sub] driver
    * array [[Similarity.pqEncodeOnUnit]]/ADC consume — m × K × d/m
    * doubles, tiny by construction.
    */
  private[graft] def loadCodebook(spark: SparkSession,
                                  table: String): Array[Array[Array[Double]]] = {
    val cbRows = spark.table(s"${table}__codebook").collect()
    val mSub = cbRows.map(_.getInt(0)).max + 1
    val kCodes = cbRows.map(_.getInt(1)).max + 1
    val cb = Array.ofDim[Array[Double]](mSub, kCodes)
    cbRows.foreach(r =>
      cb(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray)
    cb
  }

  def assignNew(spark: SparkSession, table: String, vectors: DataFrame,
                idCol: String, vecCol: String): DataFrame =
    assignNewWithMeta(spark, table, vectors, idCol, vecCol,
      metaRowOf(spark, table))

  /** The one-row `__meta` record, if the completion record exists —
    * read ONCE per maintenance call and threaded down: the dim check,
    * the PQ flag and the residual flag each paid their own one-row
    * head() job before (three meta jobs per streamed micro-batch).
    */
  private def metaRowOf(spark: SparkSession,
                        table: String): Option[org.apache.spark.sql.Row] =
    if (spark.catalog.tableExists(s"${table}__meta"))
      Some(spark.table(s"${table}__meta").head())
    else None

  private def assignNewWithMeta(spark: SparkSession, table: String,
                                vectors: DataFrame, idCol: String,
                                vecCol: String,
                                meta: Option[org.apache.spark.sql.Row])
      : DataFrame = {
    meta.map(_.getAs[Int]("dim")).foreach { dim =>
      // EVERY row checked (ingest batches are bounded by contract): a
      // single mismatched or null vector would dot to null and silently
      // land in an arbitrary bucket
      val bad = vectors
        .where(col(vecCol).isNull || size(col(vecCol)) =!= dim)
        .limit(1).count()
      require(bad == 0,
        s"query frame contains a null or non-$dim-dimensional embedding " +
          s"(table $table was built over $dim-dimensional vectors)")
    }
    // keep columns come from the index's own schema, so appends ALWAYS
    // match the live table — keep-bearing indexes upsert/compact like
    // bare ones, and the incoming frame must simply carry the columns
    // (missing ones fail loudly at the projection, naming the column)
    val keep = keepOf(spark, table)
    val assigned = assignUnit(
      Similarity.unitProjectKeep(vectors, idCol, "id", vecCol, "bv", keep),
      spark.table(s"${table}__centroids"), keep)
    // PQ tier (m > 0 in __meta): encode the arrivals against the FROZEN
    // codebook, exactly as assignment uses the frozen centroids — both
    // depend only on the row itself, so the PQ tier appends/upserts/
    // compacts through the SAME maintenance surface as the plain tier
    // (one recipe for both; drift in codebook or centroids is answered
    // by the same periodic-refit posture). Output matches the live
    // table's (id, bucket, codes, keep…) schema; a bv-shaped append
    // into a codes table would instead fail loudly at unionByName.
    val isPq = meta.exists(_.getAs[Int]("m") > 0)
    if (!isPq) assigned
    else {
      val resid = meta.exists(r =>
        r.schema.fieldNames.contains("resid") && r.getAs[Boolean]("resid"))
      // residual tier: arrivals encode unit − frozen centroid (left join
      // keeps null-bucket rows, whose codes stay null like the plain
      // encode of a null vector)
      val encodable =
        if (!resid) assigned
        else withCentroidCv(spark, table, assigned, joinType = "left")
          .select(col("id") +: col("bucket") +:
            zip_with(col("bv"), col("__cv"), (a, b) => a - b).as("bv") +:
            keep.map(col): _*)
      Similarity.pqEncodeOnUnit(encodable, loadCodebook(spark, table))
        .select(col("id") +: col("bucket").cast("long").as("bucket") +:
          col("codes") +: keep.map(col): _*)
    }
  }

  /** Batch-assignment closure for a STREAM of ingest micro-batches
    * against a FROZEN index — the foreachBatch companion of
    * [[assignNew]]: `__meta`, the keep list, the gathered centroid
    * kernel array and (PQ tier) the codebook plus the residual arm's
    * centroid lookup rows are read ONCE at construction, so each batch
    * pays only its own dim-validation scan and the zero-shuffle
    * assignment/encode projections — zero per-batch side-table jobs,
    * where calling [[assignNew]] per batch re-collects the centroid
    * table and re-reads `__meta` on EVERY micro-batch (at corpus scale:
    * a side-table scan per trigger, forever). The centroids, codebook
    * and keep schema are frozen for the stream's lifetime by the
    * maintenance contract (drift is answered by periodic refit, never
    * per-batch re-reads), so the capture is semantics-free: per-batch
    * output is row-identical to [[assignNew]] on the same batch
    * (AnnIndexSpec pins all three tiers). An over-gather-cap centroid
    * table falls back to per-batch [[assignNew]] semantics unchanged.
    */
  def streamAssigner(spark: SparkSession, table: String, idCol: String,
                     vecCol: String): DataFrame => DataFrame = {
    val meta = metaRowOf(spark, table)
    Similarity.gatherCentroidFrameOpt(
        spark.table(s"${table}__centroids")) match {
      case None =>
        batch => assignNewWithMeta(spark, table, batch, idCol, vecCol, meta)
      case Some(cents) =>
        val keep = keepOf(spark, table)
        val dim = meta.map(_.getAs[Int]("dim"))
        val isPq = meta.exists(_.getAs[Int]("m") > 0)
        val resid = isPq && meta.exists(r =>
          r.schema.fieldNames.contains("resid") && r.getAs[Boolean]("resid"))
        val codebook = if (isPq) Some(loadCodebook(spark, table)) else None
        // residual arm: the bucket → centroid-vector lookup as a
        // LocalRelation over the SAME gathered rows (null-cv rows are
        // absent from the array AND unreachable — a null-cv centroid can
        // never win the assignment argmax), replacing the per-batch
        // broadcast scan of `__centroids` in [[withCentroidCv]]
        val cvLocal =
          if (!resid) None
          else {
            val schema = org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("centroid_id",
                org.apache.spark.sql.types.LongType, nullable = false),
              org.apache.spark.sql.types.StructField("__cv",
                org.apache.spark.sql.types.ArrayType(
                  org.apache.spark.sql.types.DoubleType), nullable = true)))
            val rows = cents.map { case (cid, cv) =>
              org.apache.spark.sql.Row(cid, cv.toSeq) }
            Some(spark.createDataFrame(
              java.util.Arrays.asList(rows: _*), schema))
          }
        (batch: DataFrame) => {
          dim.foreach { d =>
            // EVERY row checked, exactly as assignNew (batch-sized scan)
            val bad = batch
              .where(col(vecCol).isNull || size(col(vecCol)) =!= d)
              .limit(1).count()
            require(bad == 0,
              s"query frame contains a null or non-$d-dimensional " +
                s"embedding (table $table was built over $d-dimensional " +
                "vectors)")
          }
          // same output order as [[assignUnit]] — (id, bucket, bv, keep…)
          val assigned = Similarity.assignWithCentroidArray(
              Similarity.unitProjectKeep(batch, idCol, "id", vecCol, "bv",
                keep), "id", cents, keep)
            .select(col("id") +: col("bucket") +: col("bv") +:
              keep.map(col): _*)
          codebook match {
            case None => assigned
            case Some(cb) =>
              val encodable =
                if (!resid) assigned
                else assigned.join(broadcast(cvLocal.get),
                    assigned("bucket") === col("centroid_id"), "left")
                  .drop("centroid_id")
                  .select(col("id") +: col("bucket") +:
                    zip_with(col("bv"), col("__cv"),
                      (a, b) => a - b).as("bv") +: keep.map(col): _*)
              Similarity.pqEncodeOnUnit(encodable, cb)
                .select(col("id") +:
                  col("bucket").cast("long").as("bucket") +:
                  col("codes") +: keep.map(col): _*)
          }
        }
    }
  }

  /** The FAISS refine step off the SAVED codes table: ADC ranks a
    * `shortlist`-sized candidate set per query from the persisted m-byte
    * codes ([[ivfPqKnnIndexed]]), then the shortlist ids alone are
    * rescored against the FULL vectors of `base` (the source-of-truth
    * table the index was built from — the exact vectors are not in the
    * codes table, that is the point of PQ) via
    * [[Similarity.rerankExact]]. Per query batch the reads are (probed
    * buckets) × m bytes plus |queries| × shortlist full vectors —
    * recall recovered without ever scanning full vectors corpus-wide.
    * Output matches [[Similarity.ivfPqKnnRerank]] on the same parameters.
    */
  def ivfPqKnnRerankIndexed(spark: SparkSession, table: String,
                            base: DataFrame, queries: DataFrame,
                            idCol: String, vecCol: String, k: Int,
                            shortlist: Int = 20, nprobe: Int = 3,
                            filter: Option[Column] = None,
                            widenTo: Int = 0): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val cand = ivfPqKnnIndexed(spark, table, queries, idCol, vecCol,
      shortlist, nprobe, filter, widenTo)
    Similarity.rerankExact(base, queries, idCol, vecCol, cand, k)
  }

  /** SemDeDup off the SAVED index — the repeated-curation shape: where
    * [[Similarity.semanticDedup]] re-assigns the whole corpus on every
    * call, this reads the persisted (id, bucket, bv) rows and pays ZERO
    * exchanges on the corpus side — the in-bucket pair self-join AND the
    * bucket-size skew guard both key on `bucket`, the table's own bucket
    * layout, so the only shuffled data is the candidate-bounded pair
    * list (spec-asserted on the executed plan). Same pair semantics as
    * the per-call operator ([[Similarity.pairsFromAssigned]]: in-bucket
    * pairwise above `threshold`, buckets over `maxBucket` collapsed to
    * an exact-dup class) and the same min-id representative keep, so an
    * index built with the per-call step replays the per-call oracle.
    * Plain tier only: PQ codes are lossy — decode-and-score would change
    * the pair set, so a codes table fails loudly here.
    */
  def semanticDedupIndexed(spark: SparkSession, table: String,
                           threshold: Double,
                           maxBucket: Int = 10000): DataFrame = {
    val idx = spark.table(table)
    require(idx.columns.contains("bv"),
      s"semanticDedupIndexed: $table carries no unit vectors (a PQ codes " +
        "table?) — build the plain IVF tier for dedup, codes are lossy")
    // null-bucket rows (zero/null vectors) never pair (the bucket join
    // drops null keys) but DO pass through as survivors, matching the
    // per-call operator's unpaired-rows-pass contract
    // pairs checkpointed eagerly (candidate-bounded) so the CC rounds and
    // the representative probe never recompute the bucket join; NOT
    // released here — the returned frame may still depend on it lazily
    // (string-id and over-gather-cap drop sets take
    // keepClusterRepresentative's anti-join arm). Same block lifetime as
    // the per-call semanticDedup's pair checkpoint: a long-lived curation
    // loop calling this every round should clearCache()/unpersist on its
    // own cadence (the bench's between-query releaseBlocks discipline)
    val pairs = Similarity.pairsFromAssigned(
      idx.select(col("id"), col("bv"), col("bucket")), "id",
      threshold, maxBucket).localCheckpoint(eager = true)
    graft.operators.Dedup.keepClusterRepresentative(
      idx.select(col("id")), "id", pairs)
  }

  /** Cluster profile off the SAVED index — [[Similarity.clusterProfile]]
    * without the per-call corpus re-assignment: per-bucket mass and
    * coherence read from the persisted (id, bucket, bv) rows, the
    * centroid side table broadcast (index-sized by contract) for the
    * coherence dot. The groupBy keys on the table's own bucket layout,
    * so the corpus side plans no shuffle — the repeated-curation read
    * (mixture planning over embedding domains re-profiles every round).
    * Plain tier only (codes are lossy, as in [[semanticDedupIndexed]]).
    */
  def clusterProfileIndexed(spark: SparkSession, table: String): DataFrame = {
    val idx = spark.table(table)
    require(idx.columns.contains("bv"),
      s"clusterProfileIndexed: $table carries no unit vectors (a PQ codes " +
        "table?) — the coherence dot needs the stored unit forms")
    idx.where(col("bucket").isNotNull && col("bv").isNotNull)
      .join(broadcast(spark.table(s"${table}__centroids")
          .where(col("cv").isNotNull)),
        col("bucket") === col("centroid_id"))
      .groupBy("centroid_id")
      .agg(count(lit(1)).as("n_members"),
        round(avg(Similarity.dot(col("bv"), col("cv"))), 6)
          .as("mean_cosine"))
  }

  /** Cluster-balanced sample off the SAVED index — the third persisted
    * curation read (with [[semanticDedupIndexed]] and
    * [[clusterProfileIndexed]]): up to `perCluster` rows per bucket by
    * deterministic md5-of-id rank, straight from the persisted
    * assignment. The rank window partitions on the table's own bucket
    * layout and `rank <= n` pushes a partial WindowGroupLimit below any
    * exchange, so no task sorts more than ~perCluster rows per bucket —
    * and the corpus is never re-assigned. Output matches
    * [[Similarity.clusterBalancedSample]] on the same sample:
    * (id, bucket, rank).
    */
  def clusterBalancedSampleIndexed(spark: SparkSession, table: String,
                                   perCluster: Int): DataFrame = {
    require(perCluster > 0, s"perCluster must be positive, got $perCluster")
    // null buckets = zero/null vectors: their null similarities would
    // land them in an arbitrary bucket where small md5 ranks could evict
    // real members from the quota — same drop as the per-call operator
    val w = Window.partitionBy("bucket")
      .orderBy(asc("__cbs_h"), col("id").asc)
    spark.table(table).where(col("bucket").isNotNull)
      .withColumn("__cbs_h", md5(col("id").cast("string")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= perCluster)
      .select(col("id"), col("bucket"), col("rank").cast("long").as("rank"))
  }

  /** Fold accumulated appends back into the persisted layout,
    * BUCKET-LOCALLY: only the partitions (inverted lists) the batch
    * touches are rewritten — live∩touched ∪ appends lands in a staging
    * table (one shuffle of the TOUCHED rows, never the table) and each
    * staged partition directory is swapped in rename-aside
    * ([[finishPartitionSwap]]). Maintenance cost therefore scales with
    * the batch's bucket footprint, not the table: absorbing 2k arrivals
    * into 1e9 rows rewrites the 2k arrivals' lists. The centroid side
    * table is untouched (appends were assigned against it). Legacy
    * (pre-per-list) tables keep the old whole-table swap.
    *
    * Crash contract: the live TABLE never moves. Renames begin only
    * after the staging write commits, so any crash before that leaves
    * live whole (heal rolls the staging debris back — the batch did NOT
    * land); a crash mid-renames leaves every touched list available in
    * exactly one of live/staging and [[recoverPartitionSwap]] rolls
    * FORWARD (staging is the newer version of every directory it still
    * holds — the batch DID land). The heal always converges the
    * in-flight fold, but compact itself is APPEND-ONLY: a caller that
    * cannot tell which side of the staging commit a crash fell on must
    * not blindly re-submit the same appends (a landed batch would
    * double). Under at-least-once delivery, replay through
    * [[upsertIvfIndex]] instead — its id anti-join makes re-submission
    * idempotent.
    */
  def compactIvfIndex(spark: SparkSession, table: String, appends: DataFrame,
                      buckets: Int = -1): Unit = {
    // the bucket count is the INDEX's property (__meta), not a caller
    // dial: a staging table written with a different count than recovery
    // re-registers from __meta would silently mis-prune every later read.
    // An explicitly passed value must agree.
    val metaBuckets =
      spark.table(s"${table}__meta").head().getAs[Int]("buckets")
    require(buckets == -1 || buckets == metaBuckets,
      s"compactIvfIndex: buckets=$buckets but $table was built with " +
        s"$metaBuckets (recorded in ${table}__meta) — omit the parameter")
    if (!spark.table(table).columns.contains(PartCol)) {
      // legacy bucketed-only layout: whole-table rename-aside swap
      InvertedIndex.swapTable(spark, table)((live, staging) =>
        live.unionByName(appends)
          .write.mode(SaveMode.ErrorIfExists).format("parquet")
          .bucketBy(metaBuckets, "bucket").sortBy("bucket")
          .saveAsTable(staging))
      return
    }
    recoverPartitionSwap(spark, table) // heal any prior half-swap first
    // checkpoint: the appends frame feeds both the touched-list collect
    // and the staging write (batch-sized by contract)
    val appendsP = appends.withColumn(PartCol, col("bucket"))
      .localCheckpoint(eager = true)
    try {
      val touched = appendsP.select(col(PartCol)).distinct().collect()
        .map(r => if (r.isNullAt(0)) null else r.getLong(0))
      val merged = spark.table(table)
        .where(touchedCond(touched))
        .unionByName(appendsP)
      foldTouchedPartitions(spark, table, merged, metaBuckets,
        touched.toSeq)
    } finally
      org.apache.spark.sql.graft.Bridge.releaseLocalCheckpoint(appendsP)
  }

  /** Partition-pruning predicate over the touched list ids (null = the
    * default partition a null-bucket row lands in).
    */
  private def touchedCond(touched: Array[Any]): Column = {
    val ids = touched.collect { case l: java.lang.Long => l.longValue() }
    val base = if (ids.isEmpty) lit(false) else col(PartCol).isin(ids: _*)
    if (touched.contains(null)) base || col(PartCol).isNull else base
  }

  /** Idempotent upsert — the ANN mirror of [[InvertedIndex.upsertIndex]]:
    * assign the incoming vectors against the FROZEN centroids, anti-join
    * their ids out of the live rows (so replaying a batch whose manifest
    * extension crashed CONVERGES instead of duplicating), and fold
    * BUCKET-LOCALLY like [[compactIvfIndex]]: the rewrite touches only
    * the lists holding the arrivals' new rows or their ids' OLD rows (an
    * updated vector can change buckets, so the old rows' lists come from
    * an id-only column-pruned probe scan of the live table — a cheap
    * read, never a rewrite). Incoming frame is ingest-batch-sized — it
    * broadcasts into both the probe and the anti-join.
    */
  def upsertIvfIndex(spark: SparkSession, table: String, vectors: DataFrame,
                     idCol: String, vecCol: String): Unit = {
    // ONE meta read serves the bucket count and assignNew's dim/PQ/
    // residual flags (formerly up to four one-row head() jobs per call).
    // No meta = not a completed index — upserting into one is an error
    // (the pre-r18 path threw the same way via its direct meta read)
    val meta = metaRowOf(spark, table)
    require(meta.nonEmpty,
      s"upsertIvfIndex: ${table}__meta is missing — $table is not a " +
        "completed IVF index (build it with writeIvfIndex/writeIvfPqIndex)")
    val buckets = meta.get.getAs[Int]("buckets")
    val appends = assignNewWithMeta(spark, table, vectors, idCol, vecCol,
        meta)
      .localCheckpoint(eager = true)
    try {
      val incoming = appends.select(col("id")).distinct()
      if (!spark.table(table).columns.contains(PartCol)) {
        // legacy layout: whole-table swap
        InvertedIndex.swapTable(spark, table)((live, staging) =>
          live.join(broadcast(incoming), Seq("id"), "left_anti")
            .unionByName(appends)
            .write.mode(SaveMode.ErrorIfExists).format("parquet")
            .bucketBy(buckets, "bucket").sortBy("bucket")
            .saveAsTable(staging))
        return
      }
      recoverPartitionSwap(spark, table)
      val appendsP = appends.withColumn(PartCol, col("bucket"))
      val live = spark.table(table)
      // lists holding rows the batch REPLACES (id column + partition
      // value only — column-pruned, output bounded by the batch) UNIONED
      // with the lists receiving new rows: ONE distinct-collect job where
      // the former shape paid two (r19; the semi-join's broadcast build is
      // shared within the single execution)
      val touched = live.join(broadcast(incoming), Seq("id"), "left_semi")
        .select(col(PartCol))
        .unionByName(appendsP.select(col(PartCol)))
        .distinct().collect()
        .map(r => if (r.isNullAt(0)) null else r.getLong(0))
      val merged = live.where(touchedCond(touched))
        .join(broadcast(incoming), Seq("id"), "left_anti")
        .unionByName(appendsP)
      foldTouchedPartitions(spark, table, merged, buckets, touched.toSeq)
    } finally
      org.apache.spark.sql.graft.Bridge.releaseLocalCheckpoint(appends)
  }

  /** Write the touched partitions' replacement rows to the staging table
    * and swap them in. Staging is a full table write (ErrorIfExists —
    * debris was healed by the caller) but sized by the TOUCHED lists.
    *
    * `touched` closes the DRAINED-list hole: a touched partition whose
    * replacement row set is EMPTY (an upsert anti-join removed every
    * live row and the new rows landed elsewhere) writes no staging
    * directory, and the rename pass — which iterates staging — would
    * leave the stale live directory in place (replaced ids surviving
    * next to their new rows). Every touched partition therefore gets a
    * staging directory, an empty one if the write produced none: the
    * swap then supersedes the stale live dir with zero files (an empty
    * partition reads as zero rows and its catalog entry stays valid),
    * and the heal needs no special case. One window remains: a crash
    * between the staging commit and the empty-dir creation rolls
    * forward WITHOUT the drained list's supersede — covered by the
    * upsert replay contract (the id probe re-detects the stale rows and
    * the retry drains them; only upsert can drain, and upsert replay is
    * idempotent).
    */
  private def foldTouchedPartitions(spark: SparkSession, table: String,
                                    merged: DataFrame, buckets: Int,
                                    touched: Seq[Any]): Unit = {
    val staging = table + "__compacting"
    spark.sql(s"DROP TABLE IF EXISTS `$staging`")
    InvertedIndex.deleteIfUncataloged(spark, staging)
    writeIndexRows(merged, buckets, staging, SaveMode.ErrorIfExists)
    val stagingLoc = tableLoc(spark, staging)
    val fs = stagingLoc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    touched.foreach { t =>
      val dir = new org.apache.hadoop.fs.Path(stagingLoc,
        PartCol + "=" + (if (t == null) "__HIVE_DEFAULT_PARTITION__"
          else t.toString))
      if (!fs.exists(dir)) fs.mkdirs(dir)
    }
    finishPartitionSwap(spark, table)
  }

  /** The rename half of the bucket-local fold, shared with the heal's
    * roll-forward: every `pbucket=` directory still under the staging
    * table moves into the live table's location, the superseded live
    * directory (if any) moving aside to `<table>__old/` first. Only
    * called when the staging write is COMPLETE (catalog entry or
    * _SUCCESS), so staging is the newer version of every directory it
    * holds — re-running after a crash converges (already-moved
    * directories are simply no longer in staging). Lists the live table
    * had no directory for yet (arrivals into a previously-empty bucket)
    * are registered with the catalog afterwards; existing partitions
    * keep their locations, so only a refresh is needed.
    */
  private def finishPartitionSwap(spark: SparkSession, table: String): Unit = {
    val staging = table + "__compacting"
    val backup = table + "__old"
    val hconf = spark.sparkContext.hadoopConfiguration
    val stagingLoc =
      if (spark.catalog.tableExists(staging)) tableLoc(spark, staging)
      else warehousePath(spark, staging)
    val liveLoc = tableLoc(spark, table)
    val fs = stagingLoc.getFileSystem(hconf)
    val backupLoc = warehousePath(spark, backup)
    var newParts = false
    val partDirs =
      if (fs.exists(stagingLoc))
        fs.listStatus(stagingLoc).filter(s => s.isDirectory &&
          s.getPath.getName.startsWith(PartCol + "="))
      else Array.empty[org.apache.hadoop.fs.FileStatus]
    if (partDirs.nonEmpty && !fs.exists(backupLoc)) fs.mkdirs(backupLoc)
    partDirs.foreach { p =>
      val name = p.getPath.getName
      val livePart = new org.apache.hadoop.fs.Path(liveLoc, name)
      if (fs.exists(livePart)) {
        if (!fs.rename(livePart,
            new org.apache.hadoop.fs.Path(backupLoc, name)))
          sys.error(s"compactIvfIndex: could not move $livePart aside")
      } else newParts = true
      if (!fs.rename(p.getPath, livePart))
        sys.error(s"compactIvfIndex: could not move $name into $table")
    }
    spark.catalog.refreshTable(table)
    // partitions the live table lacked are invisible to the catalog's
    // partition listing until registered — recover re-lists the tree
    // and ADDS missing entries (touched only when the batch opened a
    // previously-empty list, so the listing cost is off the hot path)
    if (newParts) spark.catalog.recoverPartitions(table)
    spark.sql(s"DROP TABLE IF EXISTS `$staging`")
    InvertedIndex.deleteIfUncataloged(spark, staging)
    if (fs.exists(backupLoc)) fs.delete(backupLoc, true)
  }

  /** Heal a crashed bucket-local fold — idempotent, safe any time. The
    * live table never moves in this protocol, so recovery is decided by
    * the STAGING state alone: a COMPLETE staging write (catalog entry,
    * or a directory with _SUCCESS) rolls FORWARD — finish the renames;
    * an incomplete one rolls BACK — delete the debris, live is whole
    * (renames only start after the staging commit). `<table>__old`
    * holds superseded copies only and is cleared either way. After a
    * roll-forward the moved-before-crash partition set is unknown, so
    * the catalog's partition list is recovered from the tree.
    */
  private[graft] def recoverPartitionSwap(spark: SparkSession,
                                          table: String): Unit = {
    if (!spark.catalog.tableExists(table)) return
    val staging = table + "__compacting"
    val backup = table + "__old"
    val hconf = spark.sparkContext.hadoopConfiguration
    val stagingLoc =
      if (spark.catalog.tableExists(staging)) tableLoc(spark, staging)
      else warehousePath(spark, staging)
    val fs = stagingLoc.getFileSystem(hconf)
    val stagingThere = spark.catalog.tableExists(staging) ||
      fs.exists(stagingLoc)
    if (stagingThere) {
      val complete = spark.catalog.tableExists(staging) ||
        fs.exists(new org.apache.hadoop.fs.Path(stagingLoc, "_SUCCESS"))
      val hasPartDirs = fs.exists(stagingLoc) &&
        fs.listStatus(stagingLoc).exists(s => s.isDirectory &&
          s.getPath.getName.startsWith(PartCol + "="))
      val backupThere = !spark.catalog.tableExists(backup) &&
        fs.exists(warehousePath(spark, backup))
      if (complete && (hasPartDirs || backupThere)) {
        finishPartitionSwap(spark, table)
        spark.catalog.recoverPartitions(table)
        spark.catalog.refreshTable(table)
      } else {
        // incomplete staging write (or a complete one never swapped and
        // holding nothing) — roll back; live was never touched
        spark.sql(s"DROP TABLE IF EXISTS `$staging`")
        if (fs.exists(stagingLoc)) fs.delete(stagingLoc, true)
      }
    }
    // leftover backup dir from a crash after all renames: superseded
    // copies only — but never delete it out from under a catalog entry
    if (!spark.catalog.tableExists(backup)) {
      val b = warehousePath(spark, backup)
      if (fs.exists(b)) fs.delete(b, true)
    }
  }

  /** Heal ANN-index crash state across JVM restarts — re-register
    * stranded side tables, then recover a half-finished swap exactly like
    * the text index's heal (live absent + __compacting/__old dirs →
    * finish or roll back the rename). `__meta` anchors the bucket count;
    * without it nothing is recoverable (it is written once at build and
    * never swapped). Returns whether a live index exists after recovery.
    */
  def recoverIvfIndex(spark: SparkSession, table: String): Boolean = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    def loc(name: String) = new org.apache.hadoop.fs.Path(warehouse, name)
    def dirExists(name: String): Boolean =
      loc(name).getFileSystem(hconf).exists(loc(name))
    def isComplete(name: String): Boolean = {
      val s = new org.apache.hadoop.fs.Path(loc(name), "_SUCCESS")
      s.getFileSystem(hconf).exists(s)
    }
    // registerIvfIndex throws at the (absent) live-table read BEFORE
    // reaching the later side tables, so register each side table
    // independently — the heal below needs __centroids regardless of the
    // main table's state (a half-written dir has no footers, hence Try)
    def registerPlain(name: String): Unit =
      if (!spark.catalog.tableExists(name) && dirExists(name))
        scala.util.Try {
          val schema = spark.read.parquet(loc(name).toString).schema.toDDL
          spark.sql(s"CREATE TABLE `$name` ($schema) USING parquet " +
            s"LOCATION '${loc(name)}'")
        }
    registerPlain(s"${table}__meta")
    if (!spark.catalog.tableExists(s"${table}__meta")) return false
    registerPlain(s"${table}__centroids")
    registerPlain(s"${table}__codebook")
    val buckets = spark.table(s"${table}__meta").head().getAs[Int]("buckets")
    def registerBucketed(name: String): Unit =
      if (!spark.catalog.tableExists(name) && dirExists(name))
        scala.util.Try {
          val inferred = spark.read.parquet(loc(name).toString).schema
          if (inferred.fieldNames.contains(PartCol)) {
            // per-list layout: same pinned-BIGINT partition DDL as
            // [[registerIvfIndex]], partitions recovered from the tree
            val schema = org.apache.spark.sql.types.StructType(
              inferred.filterNot(_.name == PartCol) :+
                org.apache.spark.sql.types.StructField(PartCol,
                  org.apache.spark.sql.types.LongType)).toDDL
            spark.sql(s"CREATE TABLE `$name` ($schema) USING parquet " +
              s"PARTITIONED BY ($PartCol) " +
              s"CLUSTERED BY (bucket) SORTED BY (bucket) " +
              s"INTO $buckets BUCKETS LOCATION '${loc(name)}'")
            spark.catalog.recoverPartitions(name)
          } else {
            val schema = inferred.toDDL
            spark.sql(s"CREATE TABLE `$name` ($schema) USING parquet " +
              s"CLUSTERED BY (bucket) SORTED BY (bucket) " +
              s"INTO $buckets BUCKETS LOCATION '${loc(name)}'")
          }
        }
    registerBucketed(table)
    if (!spark.catalog.tableExists(table)) {
      registerBucketed(table + "__old")
      // _SUCCESS proves the staging CTAS completed — without it the dir
      // may be half-written and recovery must roll back to __old
      if (dirExists(table + "__compacting") &&
          isComplete(table + "__compacting"))
        registerBucketed(table + "__compacting")
      InvertedIndex.recoverCompaction(spark, table)
    }
    // a table healed from a debris-named dir must be moved home before
    // the next swap clears that name (see normalizeTableLocation)
    InvertedIndex.normalizeTableLocation(spark, table)
    // nothing healed but a live-named dir without _SUCCESS remains: a
    // half-written first-build CTAS that would block every replay with a
    // non-empty-location error (see the text-index heal)
    if (!spark.catalog.tableExists(table) && dirExists(table) &&
        !isComplete(table))
      loc(table).getFileSystem(hconf).delete(loc(table), true)
    // bucket-local fold debris (per-list layout): the live table exists
    // throughout that protocol, so its heal runs AFTER registration —
    // roll a complete staging forward, an incomplete one back
    if (spark.catalog.tableExists(table) &&
        spark.table(table).columns.contains(PartCol))
      recoverPartitionSwap(spark, table)
    spark.catalog.tableExists(table)
  }

  // ---- calibration ----

  /** Recall-targeted probe calibration off a saved plain-IVF table — the
    * measuring stick behind every nprobe choice, as an operator instead
    * of ops-note guidance: sweep the `nprobes` dial on `queries`, score
    * each setting's recall@k against the EXACT ranking over the index's
    * own stored unit vectors (one corpus scan, no external ground truth
    * needed), price each setting by its candidate-row read (probed
    * bucket sizes summed — the (nprobe/lists) read cost the dial
    * controls), and mark the cheapest setting meeting `targetRecall`.
    * One row per swept value: (nprobe, mean_recall, cand_rows, pick).
    * The sweep is a driver loop over a bounded dial list; each step is
    * one probed read (|queries| × k output) — the whole calibration
    * costs ~|nprobes| probed query batches plus the one exact scan,
    * which is why it runs on a SAMPLE of queries, not the workload.
    * Plain tier only (PQ recall folds quantization loss into the same
    * comparison — run [[Similarity.recallAtK]] against a PQ query path
    * directly for that regime).
    */
  def calibrateProbes(spark: SparkSession, table: String, queries: DataFrame,
                      idCol: String, vecCol: String, k: Int,
                      targetRecall: Double,
                      nprobes: Seq[Int] = Seq(1, 2, 4, 8)): DataFrame = {
    require(nprobes.nonEmpty && nprobes.forall(_ > 0),
      s"calibrateProbes: nprobes must be positive, got $nprobes")
    val idx = spark.table(table)
    require(idx.columns.contains("bv"),
      s"calibrateProbes: $table carries no unit vectors (a PQ codes " +
        "table?) — calibrate on the plain IVF tier")
    // exact ground truth off the STORED unit forms: queries broadcast
    // into one corpus scan (the same shape as widenStarved's exhaustive
    // arm), collected to a LocalRelation (|queries| × k) and reused by
    // every swept setting
    val q = Similarity.unitProject(queries, idCol, "query_id", vecCol, "qv")
      .where(col("qv").isNotNull)
    val exactDf = topK(
      excludeSelf(broadcast(q).join(idx.where(col("bv").isNotNull)), q, idx)
        .select(col("query_id"), col("id"),
          Similarity.dot(col("qv"), col("bv")).as("cos")), k)
    val exactRows = exactDf.collect()
    val exact = spark.createDataFrame(
      java.util.Arrays.asList(exactRows: _*), exactDf.schema)
    val sorted = nprobes.distinct.sorted
    val swept = Similarity.gatherCentroidFrameOpt(
        spark.table(s"${table}__centroids")) match {
      case Some(cents) =>
        // fast arm (r18): probe sets are nested prefixes of the centroid
        // ranking, so ONE ranked probe collect at max(nprobes) and ONE
        // candidate scan/checkpoint serve every swept setting — the
        // former loop re-ran the full probe+prune+score pipeline (and a
        // second probe pass for the cost sum) per setting. Per-setting
        // work is now one topK+recall job over the checkpointed
        // candidates; the cost sum is driver arithmetic over the probe
        // rows and a collected per-bucket size map (index-sized by the
        // gather-cap contract here). Results are identical: candidates
        // at prank < n ARE knnPass(n)'s candidates, scored by the same
        // kernel dot, ranked by the same topK.
        val nMax = sorted.last
        val metaDim = cents.headOption.map(_._2.length)
        val szCol = "__graft_qdim"
        val withSz = queries.withColumn(szCol,
          coalesce(size(col(vecCol)), lit(-1)))
        val qp = Similarity.unitProjectKeep(withSz, idCol, "query_id",
          vecCol, "qv", Seq(szCol))
        val ranked = Similarity.probeTopCentroidsRankedOuter(qp, cents,
          nMax, Seq(szCol))
        val raw = ranked.collect()
        metaDim.foreach { dim =>
          require(!raw.exists(_.getInt(4) != dim),
            s"query frame contains a null or non-$dim-dimensional " +
              s"embedding (table $table was built over $dim-dimensional " +
              "vectors)")
        }
        val probeRows = raw.filter(!_.isNullAt(3))
        val probesSchema = org.apache.spark.sql.types.StructType(
          ranked.schema.fields.take(4))
        val probesLocal = spark.createDataFrame(
          java.util.Arrays.asList(probeRows.map(r =>
            org.apache.spark.sql.Row(r.get(0), r.get(1), r.get(2),
              r.get(3))): _*), probesSchema)
        val idxp = prunedIndex(spark, table,
          probeRows.map(_.getLong(3)).distinct)
        val cand = excludeSelf(
            broadcast(probesLocal).join(idxp, Seq("bucket")),
            probesLocal, idxp)
          .select(col("query_id"), col("prank"), col("id"),
            Similarity.dot(col("qv"), col("bv")).as("cos"))
          .localCheckpoint(eager = true)
        // per-bucket row counts — the cost model's table, collected once
        // (bucket count ≤ the gathered centroid count by construction)
        val sizeMap = try {
          idx.where(col("bucket").isNotNull)
            .groupBy("bucket").agg(count(lit(1)).as("__bn"))
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        } catch { case e: Throwable =>
          org.apache.spark.sql.graft.Bridge.releaseLocalCheckpoint(cand)
          throw e
        }
        try sorted.map { n =>
          val rec = Similarity.recallAtK(
            topK(cand.where(col("prank") < n)
              .select(col("query_id"), col("id"), col("cos")), k), exact)
            .agg(round(avg("recall"), 4)).head()
          val meanRecall = if (rec.isNullAt(0)) 0.0 else rec.getDouble(0)
          val candRows = probeRows.iterator.filter(_.getInt(2) < n)
            .map(r => sizeMap.getOrElse(r.getLong(3), 0L)).sum
          (n.toLong, meanRecall, candRows)
        } finally org.apache.spark.sql.graft.Bridge.releaseLocalCheckpoint(cand)
      case None =>
        // over-gather-cap centroid table: the per-setting loop through
        // the public query path (join+window probe fallback inside)
        val sizes = idx.where(col("bucket").isNotNull)
          .groupBy("bucket").agg(count(lit(1)).as("__bn"))
          .localCheckpoint(true)
        try sorted.map { n =>
          val rec = Similarity.recallAtK(
            ivfKnnIndexed(spark, table, queries, idCol, vecCol, k, n), exact)
            .agg(round(avg("recall"), 4)).head()
          val meanRecall = if (rec.isNullAt(0)) 0.0 else rec.getDouble(0)
          val cand = probeBucketsOf(spark, table, queries, idCol, vecCol, n)
            .join(broadcast(sizes), "bucket").agg(sum("__bn")).head()
          (n.toLong, meanRecall,
            if (cand.isNullAt(0)) 0L else cand.getLong(0))
        } finally org.apache.spark.sql.graft.Bridge.releaseLocalCheckpoint(sizes)
    }
    val minMeeting = swept.collect {
      case (n, r, _) if r >= targetRecall => n
    }.minOption
    import spark.implicits._
    swept.map { case (n, r, c) => (n, r, c, minMeeting.contains(n)) }
      .toDF("nprobe", "mean_recall", "cand_rows", "pick")
  }

  /** The widenTo companion to [[calibrateProbes]] — the other dial the
    * r17 verdict asked to calibrate: for a FIXED `nprobe` under a
    * selective `filter`, sweep the widen dial and report, per setting,
    * the mean filtered recall@k against the exact filtered ranking over
    * the index's own stored vectors and the number of queries still
    * SHORT of k rows (the silent-starvation count the dial exists to
    * drive to zero). `widenTos` entries ≤ nprobe mean "widen off";
    * values ≥ the centroid count take the exhaustive arm (recall 1.0 by
    * construction — the exhaustive filtered pass IS the ground truth).
    * The cheapest (smallest) setting meeting `targetRecall` is marked.
    * Output: (widen, mean_recall, n_short, pick). Plain tier only, like
    * [[calibrateProbes]].
    */
  def calibrateWiden(spark: SparkSession, table: String, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     targetRecall: Double, nprobe: Int,
                     widenTos: Seq[Int], filter: Column): DataFrame = {
    require(widenTos.nonEmpty && widenTos.forall(_ >= 0),
      s"calibrateWiden: widenTos must be non-negative, got $widenTos")
    val idx = spark.table(table)
    require(idx.columns.contains("bv"),
      s"calibrateWiden: $table carries no unit vectors (a PQ codes " +
        "table?) — calibrate on the plain IVF tier")
    val q = Similarity.unitProject(queries, idCol, "query_id", vecCol, "qv")
      .where(col("qv").isNotNull)
    // exact FILTERED ground truth off the stored unit forms
    val eligible = idx.where(col("bv").isNotNull).where(filter)
    val exactDf = topK(
      excludeSelf(broadcast(q).join(eligible), q, idx)
        .select(col("query_id"), col("id"),
          Similarity.dot(col("qv"), col("bv")).as("cos")), k)
    val exactRows = exactDf.collect()
    val exact = spark.createDataFrame(
      java.util.Arrays.asList(exactRows: _*), exactDf.schema)
    val sortedW = widenTos.distinct.sorted
    val swept = Similarity.gatherCentroidFrameOpt(
        spark.table(s"${table}__centroids")) match {
      case Some(cents) =>
        // fast arm (r18): the base nprobe pass is IDENTICAL across every
        // swept widen value, and probed widen passes are prefix
        // extensions of the same centroid ranking — so one ranked probe
        // collect at the largest probed dial and one filtered candidate
        // scan serve the base AND every probed widen arm; only the
        // exhaustive arm (w ≥ centroid count) pays its own scan, exactly
        // as in the query path. The former loop re-ran the whole
        // ivfKnnIndexed pipeline (base pass included) per setting.
        // Result rows per setting are identical to the former
        // ivfKnnIndexed(…, widenTo = w).collect().
        // the gathered array IS the non-null centroid set (gather-cap
        // contract) — its length and dimensionality replace the former
        // __meta reads
        val nCents = cents.length.toLong
        val metaDim = cents.headOption.map(_._2.length)
        val probedWs = sortedW.filter(w => w > nprobe && w < nCents)
        val pMax = (nprobe +: probedWs).max
        val szCol = "__graft_qdim"
        val withSz = queries.withColumn(szCol,
          coalesce(size(col(vecCol)), lit(-1)))
        val qp = Similarity.unitProjectKeep(withSz, idCol, "query_id",
          vecCol, "qv", Seq(szCol))
        val ranked = Similarity.probeTopCentroidsRankedOuter(qp, cents,
          pMax, Seq(szCol))
        val raw = ranked.collect()
        metaDim.foreach { dim =>
          require(!raw.exists(_.getInt(4) != dim),
            s"query frame contains a null or non-$dim-dimensional " +
              s"embedding (table $table was built over $dim-dimensional " +
              "vectors)")
        }
        val probeRows = raw.filter(!_.isNullAt(3))
        val probesSchema = org.apache.spark.sql.types.StructType(
          ranked.schema.fields.take(4))
        val probesLocal = spark.createDataFrame(
          java.util.Arrays.asList(probeRows.map(r =>
            org.apache.spark.sql.Row(r.get(0), r.get(1), r.get(2),
              r.get(3))): _*), probesSchema)
        val idxp = prunedIndex(spark, table,
          probeRows.map(_.getLong(3)).distinct).where(filter)
        val cand = excludeSelf(
            broadcast(probesLocal).join(idxp, Seq("bucket")),
            probesLocal, idxp)
          .select(col("query_id"), col("prank"), col("id"),
            Similarity.dot(col("qv"), col("bv")).as("cos"))
          .localCheckpoint(eager = true)
        try {
          val baseDf = topK(cand.where(col("prank") < nprobe)
            .select(col("query_id"), col("id"), col("cos")), k)
          val baseRows = baseDf.collect()
          val outSchema = baseDf.schema
          val asked = raw.map(_.get(0)).distinct.toSet
          val nAsked = raw.filter(!_.isNullAt(1)).map(_.get(0))
            .distinct.length.toLong
          val satisfiedQ = baseRows.groupBy(_.get(0))
            .collect { case (qid, rs) if rs.length >= k => qid }.toSet
          val starved = asked.diff(satisfiedQ)
          val keptRows = baseRows.filterNot(r => starved(r.get(0)))
          // the same StarvedIsinCap switch as widenStarved and the
          // exhaustive arm below: past the cap a literal IN list bloats
          // the driver-side expression tree — broadcast-semi-join the
          // starved ids instead (result-identical)
          def starvedOnly(df: DataFrame): DataFrame = {
            val starvedSeq = starved.toSeq
            if (starvedSeq.size <= StarvedIsinCap)
              df.where(col("query_id").isInCollection(starvedSeq))
            else {
              val sf = org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("__starved_id",
                  df.schema("query_id").dataType)))
              val sdf = spark.createDataFrame(java.util.Arrays.asList(
                starvedSeq.map(org.apache.spark.sql.Row(_)): _*), sf)
              df.join(broadcast(sdf),
                col("query_id") === col("__starved_id"), "left_semi")
            }
          }
          def rowsFor(w: Int): Array[org.apache.spark.sql.Row] =
            if (w <= nprobe || starved.isEmpty) baseRows
            else if (w < nCents) {
              val widened = topK(starvedOnly(cand.where(col("prank") < w))
                .select(col("query_id"), col("id"), col("cos")), k)
                .collect()
              keptRows ++ widened
            } else {
              // exhaustive arm — its own filtered scan, as in the
              // query path's widenStarved
              val starvedSeq = starved.toSeq
              val starvedQ =
                if (starvedSeq.size <= StarvedIsinCap)
                  queries.where(col(idCol).isin(starvedSeq: _*))
                else {
                  val sf = org.apache.spark.sql.types.StructType(Seq(
                    org.apache.spark.sql.types.StructField("__starved_id",
                      queries.schema(idCol).dataType)))
                  val sdf = spark.createDataFrame(java.util.Arrays.asList(
                    starvedSeq.map(org.apache.spark.sql.Row(_)): _*), sf)
                  queries.join(broadcast(sdf),
                    col(idCol) === col("__starved_id"), "left_semi")
                }
              val q2 = Similarity.unitProject(starvedQ, idCol, "query_id",
                vecCol, "qv").where(col("qv").isNotNull)
              val idx1 = spark.table(table).where(col("bucket").isNotNull)
                .where(filter)
              val widened = topK(
                excludeSelf(broadcast(q2).join(idx1), q2, idx1)
                  .select(col("query_id"), col("id"),
                    Similarity.dot(col("qv"), col("bv")).as("cos")), k)
                .collect()
              keptRows ++ widened
            }
          sortedW.map { w =>
            val rows = rowsFor(w)
            val local = spark.createDataFrame(
              java.util.Arrays.asList(rows: _*), outSchema)
            val rec = Similarity.recallAtK(local, exact)
              .agg(round(avg("recall"), 4)).head()
            val meanRecall = if (rec.isNullAt(0)) 0.0 else rec.getDouble(0)
            val satisfied = rows.groupBy(_.get(0))
              .count { case (_, rs) => rs.length >= k }
            (w.toLong, meanRecall, nAsked - satisfied)
          }
        } finally
          org.apache.spark.sql.graft.Bridge.releaseLocalCheckpoint(cand)
      case None =>
        // over-gather-cap centroid table: the per-setting loop through
        // the public query path (join+window probe fallback inside)
        val nAsked = q.select("query_id").distinct().count()
        sortedW.map { w =>
          val res = ivfKnnIndexed(spark, table, queries, idCol, vecCol, k,
            nprobe, filter = Some(filter), widenTo = w)
          val rows = res.collect() // |queries| × k bounded by contract
          val local = spark.createDataFrame(
            java.util.Arrays.asList(rows: _*), res.schema)
          val rec = Similarity.recallAtK(local, exact)
            .agg(round(avg("recall"), 4)).head()
          val meanRecall = if (rec.isNullAt(0)) 0.0 else rec.getDouble(0)
          val satisfied = rows.groupBy(_.get(0))
            .count { case (_, rs) => rs.length >= k }
          (w.toLong, meanRecall, nAsked - satisfied)
        }
    }
    val minMeeting = swept.collect {
      case (w, r, _) if r >= targetRecall => w
    }.minOption
    import spark.implicits._
    swept.map { case (w, r, s) => (w, r, s, minMeeting.contains(w)) }
      .toDF("widen", "mean_recall", "n_short", "pick")
  }

  // ---- query ----

  /** kNN off the saved index: rank the query against the centroid side
    * table (broadcast — index-sized), take its `nprobe` best buckets, and
    * scan ONLY those buckets of the index table.
    * Output matches [[Similarity.ivfKnn]] row for row on the same
    * parameters (differential-tested): (query_id, neighbor_id, cos, rank).
    */
  /** Self-match exclusion ONLY when the id types agree — comparing a
    * string query id against a numeric index id coerces to null, and a
    * null predicate would silently drop EVERY candidate for every query.
    * Differently-typed ids cannot name the same row, so skipping the
    * filter is exact.
    */
  private def excludeSelf(joined: DataFrame, probes: DataFrame,
                          idx: DataFrame): DataFrame =
    if (probes.schema("query_id").dataType == idx.schema("id").dataType)
      joined.where(col("query_id") =!= col("id"))
    else joined

  /** One probe→prune→filter→score→top-k pass, shared by the plain and PQ
    * query tiers (they differ only in `scoreOf`: dot against the stored
    * unit vector vs against the codebook-decoded codes) and by the
    * starved-query widen re-pass below.
    */
  /** `withCv`: thread the probed bucket's centroid vector into the
    * candidate rows as `__cv` (one broadcast join of the index-sized
    * centroid table into the |queries|×nprobe probe frame) — the
    * residual-PQ score needs it to add the centroid back before the ADC
    * dot.
    */
  private def knnPass(spark: SparkSession, table: String, queries: DataFrame,
                      idCol: String, vecCol: String, k: Int, nprobe: Int,
                      filter: Option[Column],
                      score: Column, withCv: Boolean = false,
                      metaDim: Option[Int] = None): DataFrame =
    knnPassWithAsked(spark, table, queries, idCol, vecCol, k, nprobe,
      filter, score, withCv, metaDim)._1

  /** [[knnPass]] that also surfaces the asked-query-id set when the
    * kernel probe arm collected it for free — [[widenStarved]]'s
    * starved-set diff then skips its own distinct-collect job.
    */
  private def knnPassWithAsked(spark: SparkSession, table: String,
                      queries: DataFrame,
                      idCol: String, vecCol: String, k: Int, nprobe: Int,
                      filter: Option[Column],
                      score: Column, withCv: Boolean = false,
                      metaDim: Option[Int] = None)
      : (DataFrame, Option[Array[Any]], Option[Long]) = {
    val (probes, probeRows, asked, nCents) = probeRowsOf(spark, table,
      queries, idCol, vecCol, nprobe, metaDim)
    val probesCv =
      if (!withCv) probes else withCentroidCv(spark, table, probes)
    // the literal bucket-prune list comes from the already-collected
    // probe rows — the former distinct() job over the LocalRelation
    val probeBuckets = probeRows.map(_.getLong(2)).distinct
    val idx0 = prunedIndex(spark, table, probeBuckets)
    val idx = filter.map(idx0.where).getOrElse(idx0)
    (topK(excludeSelf(broadcast(probesCv).join(idx, Seq("bucket")),
        probes, idx)
      .select(col("query_id"), col("id"), score.as("cos")), k), asked,
      nCents)
  }

  /** The frozen-centroid `__cv` join shared by every residual-PQ
    * consumer: broadcast the index-sized centroid side table and attach
    * the bucket's centroid vector to each row. `joinType` "left" keeps
    * null-bucket rows (maintenance encode paths); "inner" drops them
    * (query paths, where the probe join excludes them anyway).
    */
  private def withCentroidCv(spark: SparkSession, table: String,
                             df: DataFrame,
                             joinType: String = "inner"): DataFrame =
    df.join(
      broadcast(spark.table(s"${table}__centroids")
        .where(col("cv").isNotNull)
        .select(col("centroid_id"), col("cv").as("__cv"))),
      df("bucket") === col("centroid_id"), joinType).drop("centroid_id")

  /** Starved-query recall widening for FILTERED kNN (`widenTo` dial): a
    * selective predicate can leave a query with fewer than `k` passing
    * candidates inside its `nprobe` probed buckets — a silent shortfall
    * the caller cannot distinguish from "the corpus holds fewer than k
    * matches". With `widenTo > nprobe`, exactly those starved queries are
    * re-probed ONCE at `widenTo` buckets and their rows replaced;
    * satisfied queries keep their first-pass results untouched. Probe
    * sets are nested prefixes of the centroid ranking, so widening only
    * ever ADDS candidates — the replacement is exact filtered top-k
    * within the widened probes.
    *
    * Cost and shape: the first pass's (|queries| × k)-sized result is
    * collected ONCE to a LocalRelation — detection and the returned rows
    * share it, so the base pruned scan never re-executes. When the
    * effective widenTo covers EVERY centroid ("pass a large value for
    * exhaustive over the filtered corpus"), the widened pass skips probe
    * selection entirely and scans the filtered index with the starved
    * queries broadcast — same candidate set as probing all buckets, but
    * no |starved| × centroids probe frame ever materializes on the
    * driver (probeBucketsOf's LocalRelation carries the full query
    * vector per probe row and is sized for nprobe, not for a 2^16-
    * centroid sweep). Intermediate widenTo values take the probed pass;
    * their driver probe frame is |starved| × widenTo by construction —
    * bounded by the caller's dial. Either way the extra read is one
    * scan of (widened buckets) × filter selectivity, batched.
    */
  private def widenStarved(spark: SparkSession, table: String,
                           queries: DataFrame, idCol: String, vecCol: String,
                           k: Int, nprobe: Int, widenTo: Int,
                           filter: Option[Column], base: DataFrame,
                           score: Column, withCv: Boolean = false,
                           askedIds: Option[Array[Any]] = None,
                           metaDim: Option[Int] = None,
                           nCentsHint: Option[Long] = None): DataFrame = {
    if (filter.isEmpty || widenTo <= nprobe) return base
    // queries frame is small by contract (it broadcasts into the probe
    // join), so the starved-set arithmetic is a driver-side set diff —
    // the id set rode along with the base pass's probe collect when the
    // kernel arm ran (askedIds), else one distinct-collect as before
    val asked = askedIds.map(_.toSet).getOrElse(
      queries.select(col(idCol)).distinct().collect()
        .map(_.get(0)).toSet)
    val baseRows = base.collect()
    val baseLocal = spark.createDataFrame(
      java.util.Arrays.asList(baseRows: _*), base.schema)
    val satisfied = baseRows.groupBy(_.get(0))
      .collect { case (q, rs) if rs.length >= k => q }.toSet
    val starved = asked.diff(satisfied)
    if (starved.isEmpty) return baseLocal
    // bounded-literal guard: the starved set is usually a handful of ids
    // (isin = the cheapest plan), but a large query batch under a
    // selective filter can starve thousands — an isin that size bloats
    // the driver-side expression tree, so past the cap the same
    // semantics run as semi/anti-joins against a LocalRelation of the
    // starved ids (mirroring the gather-cap pattern elsewhere)
    val starvedSeq = starved.toSeq
    val (starvedQ, keptBase) =
      if (starvedSeq.size <= StarvedIsinCap)
        (queries.where(col(idCol).isin(starvedSeq: _*)),
          baseLocal.where(!col("query_id").isin(starvedSeq: _*)))
      else {
        val sf = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("__starved_id",
            queries.schema(idCol).dataType)))
        val sdf = spark.createDataFrame(java.util.Arrays.asList(
          starvedSeq.map(org.apache.spark.sql.Row(_)): _*), sf)
        (queries.join(broadcast(sdf),
            col(idCol) === col("__starved_id"), "left_semi"),
          baseLocal.join(broadcast(sdf),
            col("query_id") === col("__starved_id"), "left_anti"))
      }
    // centroid count: rode along with the kernel probe gather when that
    // arm ran, else the __meta completion record (one one-row read)
    val nCents = nCentsHint.getOrElse(centroidCountOf(spark, table))
    val widened =
      if (widenTo < nCents)
        knnPass(spark, table, starvedQ, idCol, vecCol, k, widenTo, filter,
          score, withCv, metaDim)
      else {
        // exhaustive: every non-null-cv centroid's bucket would be
        // probed, which is the whole assigned table — scan it directly.
        // Null-bucket rows (zero/null vectors) are excluded exactly as
        // the probe join excludes them; null-unit QUERIES likewise
        // return nothing, as they would with zero probe rows.
        val q = Similarity.unitProject(starvedQ, idCol, "query_id",
          vecCol, "qv").where(col("qv").isNotNull)
        val idx0 = spark.table(table).where(col("bucket").isNotNull)
        val idx1 = filter.map(idx0.where).getOrElse(idx0)
        // residual score: here the centroid joins the CANDIDATE rows
        // (no probe frame exists on the exhaustive path)
        val idx =
          if (!withCv) idx1 else withCentroidCv(spark, table, idx1)
        topK(excludeSelf(broadcast(q).join(idx), q, idx)
          .select(col("query_id"), col("id"), score.as("cos")), k)
      }
    keptBase.unionByName(widened)
  }

  /** Starved-id count above which [[widenStarved]] switches from isin
    * literals to LocalRelation joins (see there).
    */
  private[graft] val StarvedIsinCap = 1000

  /** `filter`: metadata predicate over columns persisted via
    * [[writeIvfIndex]]'s `keep` (e.g. `col("label") < 5`) — top-k among
    * the index rows SATISFYING it (exact filtered-kNN semantics within
    * the probed buckets; queries with fewer passing candidates return
    * fewer rows, like any exhausted bucket). It applies at the pruned
    * scan, so parquet filter pushdown composes with bucket pruning —
    * no metadata join, the 100-TB read stays (nprobe/buckets) × the
    * filter's selectivity. Referencing a column the build didn't `keep`
    * fails loudly at analysis.
    *
    * `widenTo` (default 0 = off): recall dial for selective filters —
    * queries that return fewer than `k` rows at `nprobe` are re-probed
    * once at `widenTo` buckets (see [[widenStarved]]). Off by default so
    * the bare-filter read cost stays exactly (nprobe/buckets) ×
    * selectivity.
    */
  def ivfKnnIndexed(spark: SparkSession, table: String, queries: DataFrame,
                    idCol: String, vecCol: String, k: Int,
                    nprobe: Int = 3,
                    filter: Option[Column] = None,
                    widenTo: Int = 0): DataFrame = {
    val score = Similarity.dot(col("qv"), col("bv"))
    // no meta read here: the kernel probe arm derives the check dim from
    // the gathered centroids; the rare join+window fallback reads meta
    val (base, asked, nc) = knnPassWithAsked(spark, table, queries, idCol,
      vecCol, k, nprobe, filter, score)
    widenStarved(spark, table, queries, idCol, vecCol, k, nprobe, widenTo,
      filter, base, score, askedIds = asked, nCentsHint = nc)
  }

  /** kNN off the saved IVF-PQ index: probes exactly as [[ivfKnnIndexed]],
    * but candidates are m-byte codes DECODED against the (literal,
    * side-table-loaded) codebook before the asymmetric-distance dot — the
    * scan per query batch is (probed buckets) × m bytes, both dials
    * independent. Output matches [[Similarity.ivfPqKnn]] on the same
    * parameters.
    */
  /** `filter` / `widenTo` as in [[ivfKnnIndexed]]: a predicate over
    * `keep` columns persisted at build, applied at the pruned scan
    * (pushdown composes with bucket pruning) — exact filtered top-k among
    * the probed codes; starved queries optionally re-probed at `widenTo`.
    */
  def ivfPqKnnIndexed(spark: SparkSession, table: String, queries: DataFrame,
                      idCol: String, vecCol: String, k: Int,
                      nprobe: Int = 3,
                      filter: Option[Column] = None,
                      widenTo: Int = 0): DataFrame = {
    val cb = loadCodebook(spark, table)
    val mSub = cb.length
    val cbLit = typedLit(cb.map(_.map(_.toSeq).toSeq).toSeq)
    // decode = concat of each subspace's code centroid, in subspace order —
    // the same vector pqEncode's `decoded` column carries, so the dot
    // below is bit-identical to the per-call ADC arithmetic
    val decoded = flatten(zip_with(col("codes"),
      sequence(lit(0), lit(mSub - 1)),
      (c, j) => element_at(element_at(cbLit, j + 1), c + 1)))
    // residual tier: decoded is the reconstructed RESIDUAL — add the
    // probed bucket's centroid back (element-wise, BEFORE the dot, so
    // the arithmetic is Σ qᵢ·(cvᵢ + residᵢ) — one sequential fold, the
    // order the oracle replays) and score the query against the sum.
    // ONE meta read serves the residual flag AND the dim validation
    // (each previously its own one-row head() job per call).
    val meta = metaRowOf(spark, table)
    val resid = meta.exists(r =>
      r.schema.fieldNames.contains("resid") && r.getAs[Boolean]("resid"))
    val metaDim = meta.map(_.getAs[Int]("dim"))
    val score =
      if (!resid) Similarity.dot(col("qv"), decoded)
      else Similarity.dot(col("qv"),
        zip_with(col("__cv"), decoded, (a, b) => a + b))
    val (base, asked, nc) = knnPassWithAsked(spark, table, queries, idCol,
      vecCol, k, nprobe, filter, score, withCv = resid, metaDim = metaDim)
    widenStarved(spark, table, queries, idCol, vecCol, k, nprobe, widenTo,
      filter, base, score, withCv = resid, askedIds = asked,
      metaDim = metaDim, nCentsHint = nc)
  }
}
