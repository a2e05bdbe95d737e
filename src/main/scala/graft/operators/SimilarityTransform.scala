package graft.operators

import graft.Pipeline.ModuleCfg
import graft.config.Json._
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `similarity` transform — approximate-nearest-neighbor search over
  * an embedding column (`Array[Float]`).
  *
  * Methods:
  *  - `bruteforce`: corpus × queries cosine top-k. Queries are the
  *    (small) second input, broadcast so the corpus never shuffles;
  *    the dot product is a codegen'd `zip_with`/`aggregate` chain.
  *    Exact baseline — O(|corpus|·|queries|).
  *  - `lsh`: random-hyperplane bucketing (multi-probe via several
  *    independent tables). Only same-bucket pairs are scored: the
  *    scale path — O(n/2^planes) candidates per query per table.
  *
  * Output: (query id, neighbor id, cosine score, rank ≤ k).
  */
object SimilarityTransform {

  def build(spark: SparkSession, cfg: ModuleCfg,
      inputs: Map[String, DataFrame]): Map[String, DataFrame] = {
    val p = cfg.params
    val corpus = inputs(cfg.inputs.head)
    val queries = if (cfg.inputs.size > 1) inputs(cfg.inputs(1))
      else corpus.limit(p.int("numQueries").getOrElse(10))
    val embField = p.str("field").getOrElse("embedding")
    val idField = p.str("idField").getOrElse("vec_id")
    val k = p.int("k").getOrElse(10)

    val q = queries.select(col(idField).as("query_id"),
      col(embField).as("__q_emb"))
    val c = corpus.select(col(idField).as("neighbor_id"),
      col(embField).as("__c_emb"))

    val scored = p.str("method").getOrElse("bruteforce") match {
      case "bruteforce" =>
        c.crossJoin(broadcast(q))
      case "lsh" =>
        val planes = p.int("planes").getOrElse(8)
        val tables = p.int("tables").getOrElse(4)
        val dim = p.int("dim").getOrElse(64)
        // several independent hash tables → explode over table index
        def buckets(emb: org.apache.spark.sql.Column) = array(
          (0 until tables).map(t =>
            concat_ws("_", lit(t),
              hyperplaneBucket(emb, dim, planes, seed = 1000L + t))): _*)
        val cB = c.withColumn("__bucket",
          explode(buckets(col("__c_emb"))))
        val qB = q.withColumn("__bucket",
          explode(buckets(col("__q_emb"))))
        cB.join(broadcast(qB), Seq("__bucket"))
          .dropDuplicates("query_id", "neighbor_id")
          .drop("__bucket")
      case other =>
        throw new IllegalArgumentException(s"similarity method: $other")
    }

    val withScore = scored
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score", cosine(col("__q_emb"), col("__c_emb")))
    val topk = withScore
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "score", "rank")
    Map(cfg.name -> TransformCommon.finish(topk, cfg))
  }
}
