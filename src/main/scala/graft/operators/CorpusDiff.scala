package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the dataset-versioning primitive between crawl
  * snapshots / dataset releases: which documents were added, removed,
  * changed, or left untouched, overall and per group (source, language,
  * shard). The reference answers "what is in my big data?" for ONE
  * snapshot; a pipeline retraining on monthly crawls also needs "what
  * CHANGED in my big data?" before deciding what to re-tokenize, re-score
  * and re-deduplicate — re-running the full ladder on the ~1% of a 100 TB
  * corpus that moved is the difference between an incremental refresh and
  * a full rebuild.
  *
  * Scale shape: content hashes are computed scan-fused BEFORE the join,
  * so the id-keyed shuffle carries (id, 16-byte hash, group columns)
  * instead of document bodies; the full-outer join is the one irreducible
  * shuffle (both sides corpus-sized — no broadcast), sort-merge on the id.
  * Snapshots stored bucketed by the id column make it exchange-free; the
  * summary is a partial-aggregated count over |groups|×4 cells.
  *
  * Contract: `idCol` is unique within each snapshot (it is the document
  * key). Content equality is decided on md5(contentCol) — equal texts
  * always compare equal; a false "unchanged" needs an md5 collision
  * between two versions of the SAME document id.
  */
object CorpusDiff {

  val Added = "added"
  val Removed = "removed"
  val Changed = "changed"
  val Unchanged = "unchanged"

  private def status(oldHash: Column, newHash: Column): Column =
    when(oldHash.isNull, Added)
      .when(newHash.isNull, Removed)
      .when(oldHash === newHash, Unchanged)
      .otherwise(Changed)

  /** One row per document id present in either snapshot: (id, status,
    * by-columns...) — the work list for incremental reprocessing (feed the
    * `added`/`changed` ids to the quality/dedup ladder, the `removed` ids
    * to index deletion). By-columns are taken from the NEW snapshot, the
    * old one for removed docs.
    */
  def diffDocs(oldDf: DataFrame, newDf: DataFrame, idCol: String,
               contentCol: String, by: Seq[String] = Nil): DataFrame = {
    val o = oldDf.select(col(idCol).as("id") +: md5(col(contentCol)).as("__oh") +:
      by.map(c => col(c).as(s"__o_$c")): _*)
    val n = newDf.select(col(idCol).as("id") +: md5(col(contentCol)).as("__nh") +:
      by.map(c => col(c).as(s"__n_$c")): _*)
    o.join(n, Seq("id"), "full_outer")
      .select(col("id") +: status(col("__oh"), col("__nh")).as("status") +:
        by.map(c => coalesce(col(s"__n_$c"), col(s"__o_$c")).as(c)): _*)
  }

  /** (by-columns..., status, n_docs) — the release-note card: how much of
    * the corpus moved, where. Statuses with zero documents emit no row
    * (count semantics).
    */
  def diffSummary(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                  contentCol: String, by: Seq[String] = Nil): DataFrame =
    diffDocs(oldDf, newDf, idCol, contentCol, by)
      .groupBy((by :+ "status").map(col): _*)
      .agg(count(lit(1)).as("n_docs"))
}
