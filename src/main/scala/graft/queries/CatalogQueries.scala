package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E5: `get_indices` — the catalog surface. ES index listings with doc
  * counts + mappings become table stats over the warehouse directory
  * (reference wimbd/es/__init__.py:55-86).
  */
object CatalogQueries extends QueryPack {

  private val tables = Seq("customer", "documents", "embeddings", "events",
    "lineitem", "nation", "orders", "part", "region", "supplier")

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e5_indices" -> ((s, dir) =>
      tables.map { t =>
        val df = Tables(s, dir, t)
        df.agg(lit(t).as("index"), count(lit(1)).as("n_docs"),
          lit(df.schema.fields.length.toLong).as("n_fields"))
      }.reduce(_ unionAll _).orderBy("index"))
  )

  override val oracles: Map[String, String] = Map(
    "e5_indices" -> tables.map { t =>
      s"SELECT '$t' AS index, count(*) AS n_docs, " +
        s"(SELECT CAST(count(*) AS BIGINT) FROM (DESCRIBE $t)) AS n_fields FROM $t"
    }.mkString("", " UNION ALL ", " ORDER BY index")
  )
}
