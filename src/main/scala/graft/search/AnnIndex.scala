package graft.search

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** The embedding tier's "build once, query many" rung — a persisted IVF
  * index as Spark TABLES, mirroring [[InvertedIndex]]'s posture for text:
  * where [[Similarity.ivfKnn]] re-assigns the whole corpus on every call
  * (right for one-shot questions), this tier pays the assignment scan once
  * at build time and persists (id, bucket, unit vector) BUCKETED BY the
  * IVF bucket — so a kNN query reads ONLY its `nprobe` probed buckets'
  * files (bucket pruning, the SelectedBucketsCount discipline
  * spec-asserted like the text index's term lookups). At 100 TB of
  * vectors that is the difference between a corpus scan per query batch
  * and an (nprobe/buckets)-sized pruned read.
  *
  * Centroids (index-sized: n/step rows) live in a `<table>__centroids`
  * side table. Unit forms are stored, not raw vectors, so probing never
  * recomputes norms — the same denormalization [[InvertedIndex]] applies
  * to `dl`.
  */
object AnnIndex {

  /** Build the IVF index and persist it bucketed by the centroid bucket.
    * Deterministic sample centroids (id ≡ 0 mod `step` — swap in
    * [[Similarity.kmeansCentroids]] upstream by pre-assigning if needed);
    * `buckets` is the table's file-bucket count (≈ centroid count or a
    * divisor; pruning selects file buckets by hash(bucket id)).
    */
  def writeIvfIndex(base: DataFrame, idCol: String, vecCol: String,
                    step: Int, table: String, buckets: Int,
                    force: Boolean = false,
                    hashedIds: Boolean = false): Unit = {
    val b = Similarity.unitProject(base, idCol, "id", vecCol, "bv")
    val cents =
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
    val assigned = b.join(broadcast(cents))
      .select(col("id"), col("bv"), col("centroid_id"),
        Similarity.dot(col("bv"), col("cv")).as("csim"))
      .groupBy("id")
      .agg(max_by(col("centroid_id"), struct(col("csim"), -col("centroid_id"))).as("bucket"),
        first(col("bv")).as("bv"))
      .select(col("id"), col("bucket"), col("bv"))
    assigned.write.mode(if (force) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .format("parquet").bucketBy(buckets, "bucket").sortBy("bucket")
      .saveAsTable(table)
    cents.write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(s"${table}__centroids")
  }

  /** Re-register a saved ANN index whose catalog entries were lost (the
    * in-memory catalog forgets managed tables across JVM restarts while
    * the warehouse directories survive) — the [[InvertedIndex.registerIndex]]
    * recipe for this tier: recreate the index table over its surviving
    * directory with the SAME bucket spec, and the centroid side table
    * unbucketed. A metastore deployment never needs this.
    */
  def registerIvfIndex(spark: SparkSession, table: String,
                       buckets: Int): Unit = {
    def loc(name: String) = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), name).toString
    if (!spark.catalog.tableExists(table)) {
      val schema = spark.read.parquet(loc(table)).schema.toDDL
      spark.sql(s"CREATE TABLE `$table` ($schema) USING parquet " +
        s"CLUSTERED BY (bucket) SORTED BY (bucket) INTO $buckets BUCKETS " +
        s"LOCATION '${loc(table)}'")
    }
    val cents = s"${table}__centroids"
    if (!spark.catalog.tableExists(cents)) {
      val schema = spark.read.parquet(loc(cents)).schema.toDDL
      spark.sql(s"CREATE TABLE `$cents` ($schema) USING parquet " +
        s"LOCATION '${loc(cents)}'")
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
    * row (spec-asserted; the same oracle replay).
    */
  def writeIvfPqIndex(base: DataFrame, idCol: String, vecCol: String,
                      step: Int, m: Int, table: String, buckets: Int,
                      codeStep: Int = 50, force: Boolean = false): Unit = {
    val spark = base.sparkSession
    import spark.implicits._
    val assigned = Similarity.ivfAssign(base, idCol, vecCol, step).cache()
    try {
      val codebook = Similarity.codebookFromUnit(
        assigned.where(col(idCol) % codeStep === 0), idCol, m, codeStep, 8192)
      Similarity.pqEncodeOnUnit(graft.Par.fanOut(assigned), codebook)
        .select(col(idCol).as("id"), col("bucket"), col("codes"))
        .write.mode(if (force) SaveMode.Overwrite else SaveMode.ErrorIfExists)
        .format("parquet").bucketBy(buckets, "bucket").sortBy("bucket")
        .saveAsTable(table)
      assigned.where(col(idCol) % step === 0)
        .select(col(idCol).cast("long").as("centroid_id"), col("bv").as("cv"))
        .write.mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable(s"${table}__centroids")
      codebook.zipWithIndex.flatMap { case (ks, j) =>
        ks.zipWithIndex.map { case (c, k) => (j, k, c.toSeq) }
      }.toSeq.toDF("sub", "code", "centroid")
        .write.mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable(s"${table}__codebook")
    } finally assigned.unpersist(blocking = false)
  }

  /** kNN off the saved IVF-PQ index: probes exactly as [[ivfKnnIndexed]],
    * but candidates are m-byte codes DECODED against the (literal,
    * side-table-loaded) codebook before the asymmetric-distance dot — the
    * scan per query batch is (probed buckets) × m bytes, both dials
    * independent. Output matches [[Similarity.ivfPqKnn]] on the same
    * parameters.
    */
  def ivfPqKnnIndexed(spark: SparkSession, table: String, queries: DataFrame,
                      idCol: String, vecCol: String, k: Int,
                      nprobe: Int = 3): DataFrame = {
    val cbRows = spark.table(s"${table}__codebook").collect()
    val mSub = cbRows.map(_.getInt(0)).max + 1
    val kCodes = cbRows.map(_.getInt(1)).max + 1
    val cb = Array.ofDim[Seq[Double]](mSub, kCodes)
    cbRows.foreach(r => cb(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2))
    val cbLit = typedLit(cb.map(_.toSeq).toSeq)
    val centroids = broadcast(spark.table(s"${table}__centroids"))
    val q = Similarity.unitProject(queries, idCol, "query_id", vecCol, "qv")
    val wq = Window.partitionBy("query_id").orderBy(desc("csim"), asc("centroid_id"))
    val probes = q.join(centroids)
      .withColumn("csim", Similarity.dot(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(wq)).where(col("rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("centroid_id").as("bucket"))
      .localCheckpoint(true)
    val probeBuckets = probes.select("bucket").distinct()
      .collect().map(_.getLong(0))
    val idx = spark.table(table).where(col("bucket").isin(probeBuckets: _*))
    // decode = concat of each subspace's code centroid, in subspace order —
    // the same vector pqEncode's `decoded` column carries, so the dot
    // below is bit-identical to the per-call ADC arithmetic
    val decoded = flatten(zip_with(col("codes"),
      sequence(lit(0), lit(mSub - 1)),
      (c, j) => element_at(element_at(cbLit, j + 1), c + 1)))
    val scored = broadcast(probes).join(idx, Seq("bucket"))
      .where(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id"),
        Similarity.dot(col("qv"), decoded).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(col("cos"), 4).as("cos"), col("rank").cast("long").as("rank"))
  }

  /** Assign NEW vectors against the saved index's (frozen) centroids —
    * the append half of continuous maintenance: assignment given fixed
    * centroids depends only on the row itself, so arriving vectors only
    * ever APPEND (id, bucket, bv) rows. Run inside `foreachBatch` with a
    * parquet append (exactly the [[InvertedIndex.postingsStream]]
    * recipe), query the union `table ∪ appends`, and fold the appends
    * back into the bucketed layout with [[compactIvfIndex]] periodically.
    * Frozen centroids drift as the distribution moves — refit (rebuild
    * via [[writeIvfIndex]]) on the cadence you'd re-train any IVF index.
    */
  def assignNew(spark: SparkSession, table: String, vectors: DataFrame,
                idCol: String, vecCol: String): DataFrame = {
    val c = broadcast(spark.table(s"${table}__centroids"))
    val b = Similarity.unitProject(vectors, idCol, "id", vecCol, "bv")
    b.join(c)
      .select(col("id"), col("bv"), col("centroid_id"),
        Similarity.dot(col("bv"), col("cv")).as("csim"))
      .groupBy("id")
      .agg(max_by(col("centroid_id"), struct(col("csim"), -col("centroid_id"))).as("bucket"),
        first(col("bv")).as("bv"))
      .select(col("id"), col("bucket"), col("bv"))
  }

  /** Fold accumulated appends back into the bucketed layout through the
    * same crash-safe rename-aside swap the text index's compaction uses
    * ([[InvertedIndex.swapTable]]): live ∪ appends rewrites into a
    * staging table, two metadata-only renames swap it in, and a crash at
    * any point leaves a recoverable state. The centroid side table is
    * untouched (appends were assigned against it).
    */
  def compactIvfIndex(spark: SparkSession, table: String, appends: DataFrame,
                      buckets: Int): Unit =
    InvertedIndex.swapTable(spark, table)((live, staging) =>
      live.unionByName(appends)
        .write.mode(SaveMode.ErrorIfExists).format("parquet")
        .bucketBy(buckets, "bucket").sortBy("bucket").saveAsTable(staging))

  /** kNN off the saved index: rank the query against the centroid side
    * table (broadcast — index-sized), take its `nprobe` best buckets, and
    * scan ONLY those buckets of the index table. The probed-bucket id list
    * is collected to the driver so it reaches the scan as a LITERAL `IN`
    * — that is what makes file-bucket pruning fire (a join key can't
    * prune); it is bounded by |queries| × nprobe by construction.
    * Output matches [[Similarity.ivfKnn]] row for row on the same
    * parameters (differential-tested): (query_id, neighbor_id, cos, rank).
    */
  def ivfKnnIndexed(spark: SparkSession, table: String, queries: DataFrame,
                    idCol: String, vecCol: String, k: Int,
                    nprobe: Int = 3): DataFrame = {
    val centroids = broadcast(spark.table(s"${table}__centroids"))
    val q = Similarity.unitProject(queries, idCol, "query_id", vecCol, "qv")
    val wq = Window.partitionBy("query_id").orderBy(desc("csim"), asc("centroid_id"))
    val probes = q.join(centroids)
      .withColumn("csim", Similarity.dot(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(wq)).where(col("rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("centroid_id").as("bucket"))
      .localCheckpoint(true) // probes are |queries|×nprobe rows; computed once
    val probeBuckets = probes.select("bucket").distinct()
      .collect().map(_.getLong(0))
    val idx = spark.table(table).where(col("bucket").isin(probeBuckets: _*))
    val scored = broadcast(probes).join(idx, Seq("bucket"))
      .where(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id"),
        Similarity.dot(col("qv"), col("bv")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(col("cos"), 4).as("cos"), col("rank").cast("long").as("rank"))
  }
}
