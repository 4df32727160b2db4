package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over an `array<float>` column: brute-force
  * cosine top-k as the exact baseline, IVF (inverted-file) bucketing as the
  * scale path.
  *
  * Scale notes: queries are always the broadcast side; scoring is a narrow
  * projection (higher-order functions stay in codegen, no UDF); the only
  * shuffle is the per-query top-k window, keyed on the (small) query id. For
  * the IVF path the scored row count drops by ~|centroids|/nprobe.
  */
object Similarity {

  /** Sequential-order dot product of two double arrays (deterministic
    * summation order — reproducible across engines).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Unit-normalize once (norm computed per ROW, in its own projection, so
    * the per-pair work later is a single dot product — norms are O(rows)
    * instead of O(pairs)).
    */
  private def unitProject(df: DataFrame, idCol: String, idName: String,
                          vecCol: String, outName: String): DataFrame =
    df.select(col(idCol).as(idName), asDouble(col(vecCol)).as("__v"))
      .withColumn("__n", norm(col("__v")))
      .select(col(idName), transform(col("__v"), x => x / col("__n")).as(outName))

  /** Exact top-k cosine neighbors for every query row.
    * `queries` must be small enough to broadcast (it is hinted).
    */
  def bruteForceKnn(base: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, k: Int): DataFrame = {
    val q = broadcast(unitProject(queries, idCol, "query_id", vecCol, "qv"))
    val b = unitProject(graft.Par.fanOut(base), idCol, "neighbor_id", vecCol, "bv")
    val scored = q.join(b, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("bv")))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 4).as("cos"),
        col("rank").cast("long").as("rank"))
  }

  /** All pairs above a cosine threshold within a blocked subset — embedding
    * near-dup detection. Pairs are (id_a < id_b).
    */
  def cosineNearDuplicates(df: DataFrame, idCol: String, vecCol: String,
                           threshold: Double): DataFrame = {
    val a = unitProject(graft.Par.fanOut(df), idCol, "id_a", vecCol, "va")
    val b = unitProject(df, idCol, "id_b", vecCol, "vb")
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", dot(col("va"), col("vb")))
      .where(col("cos") > threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
  }

  /** Deterministic IVF index: centroids are the vectors whose id ≡ 0 mod
    * `step` (a deterministic sample — swap in k-means outputs when
    * available); every vector is assigned to its nearest centroid.
    */
  def ivfAssign(base: DataFrame, idCol: String, vecCol: String, step: Int): DataFrame = {
    val centroids = broadcast(base.where(col(idCol) % step === 0)
      .select(col(idCol).as("centroid_id"), asDouble(col(vecCol)).as("cv")))
    val b = base.select(col(idCol), col(vecCol), asDouble(col(vecCol)).as("bv"))
    val w = Window.partitionBy(idCol).orderBy(desc("csim"), asc("centroid_id"))
    b.join(centroids)
      .withColumn("csim", cosine(col("bv"), col("cv")))
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col(idCol), col(vecCol), col("centroid_id").as("bucket"))
  }

  /** ANN top-k via IVF: score only vectors in the query's `nprobe` nearest
    * buckets. Approximate — recall grows with nprobe.
    */
  def ivfKnn(base: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
             k: Int, step: Int = 100, nprobe: Int = 3): DataFrame = {
    val assigned = ivfAssign(base, idCol, vecCol, step).cache()
    val centroids = broadcast(base.where(col(idCol) % step === 0)
      .select(col(idCol).as("centroid_id"), asDouble(col(vecCol)).as("cv")))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val wq = Window.partitionBy("query_id").orderBy(desc("csim"), asc("centroid_id"))
    val probes = q.join(centroids)
      .withColumn("csim", cosine(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(wq)).where(col("rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("centroid_id").as("bucket"))
    val scored = broadcast(probes).join(assigned, "bucket")
      .where(col("query_id") =!= col(idCol))
      .withColumn("cos", cosine(col("qv"), transform(col(vecCol), _.cast("double"))))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc(idCol))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(col("cos"), 4).as("cos"), col("rank").cast("long").as("rank"))
  }
}
