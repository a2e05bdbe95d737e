package graft.operators

import graft.Pipeline.ModuleCfg
import graft.config.Json._
import graft.functions.TextFunctions._
import graft.functions.TopKFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
        // hashAlgo: md5 derives table t's planes from md5("t<t>:p:i")
        // — bucket assignments replayable by any SQL engine (same
        // audit mode as dedup; see hyperplaneBucketMd5)
        val md5Mode = p.str("hashAlgo").contains("md5")
        // several independent hash tables → explode over table index
        def buckets(emb: org.apache.spark.sql.Column) = array(
          (0 until tables).map(t =>
            concat_ws("_", lit(t),
              if (md5Mode) hyperplaneBucketMd5(emb, dim, planes, s"t$t")
              else hyperplaneBucket(emb, dim, planes, seed = 1000L + t))): _*)
        // null embeddings bucket to null; concat_ws would silently
        // collapse them into one "t" bucket — drop them instead
        val cB = c.filter(col("__c_emb").isNotNull)
          .withColumn("__bucket", explode(buckets(col("__c_emb"))))
        val qB = q.filter(col("__q_emb").isNotNull)
          .withColumn("__bucket", explode(buckets(col("__q_emb"))))
        cB.join(broadcast(qB), Seq("__bucket"))
          .dropDuplicates("query_id", "neighbor_id")
          .drop("__bucket")
      case "ivf" =>
        // IVF: corpus vectors assign to their nearest centroid once;
        // each query probes the nProbe nearest centroid cells. The
        // centroid table is tiny and broadcast with the probe join —
        // corpus never shuffles. Centroid fit = nIter Lloyd steps,
        // driver-side on a deterministic seed sample (the standard
        // train-then-index split; swappable for an external codebook).
        val nCells = p.int("centroids").getOrElse(16)
        val nProbe = p.int("nProbe").getOrElse(4)
        val centroids = fitCentroids(corpus, embField,
          nCells, p.int("fitIterations").getOrElse(2))
        val assignC = assignUdf(centroids, 1)
        val assignQ = assignUdf(centroids, nProbe)
        val cB = c.withColumn("__cell",
          assignC(col("__c_emb"))(0))
        val qB = q.withColumn("__cell",
          explode(assignQ(col("__q_emb"))))
        cB.join(broadcast(qB), Seq("__cell"))
          .dropDuplicates("query_id", "neighbor_id")
          .drop("__cell")
      case other =>
        throw new IllegalArgumentException(s"similarity method: $other")
    }

    val withScore = scored
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score", cosine(col("__q_emb"), col("__c_emb")))
    // Bounded top-k aggregate instead of a per-query Window rank: the
    // hash aggregate prunes to ≤k map-side, so the shuffle carries
    // O(partitions × queries × k) rows — never the scored corpus.
    val idType = corpus.schema(idField).dataType
    val integralId = idType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val topAgg =
      if (integralId) TopKFunctions.topKLong(k,
        col("score"), col("neighbor_id").cast(LongType))
      else TopKFunctions.topKString(k,
        col("score"), col("neighbor_id").cast(StringType))
    val topk = withScore
      .groupBy(col("query_id"))
      .agg(topAgg.as("__top"))
      .select(col("query_id"), posexplode(col("__top")))
      .select(col("query_id"),
        col("col._2").cast(idType).as("neighbor_id"),
        col("col._1").as("score"),
        (col("pos") + 1).cast(IntegerType).as("rank"))
    TransformCommon.finishRouted(topk, cfg)
  }

  /** Lloyd iterations over a deterministic pseudo-random sample:
    * rows ordered by content hash → TakeOrderedAndProject (per-
    * partition heap + bounded driver merge), so the sample is
    * uniform-ish over the whole corpus even when the data is sorted
    * or partitioned by some key — a head `limit()` would be biased.
    * Init = first nCells sampled vectors; assign → elementwise mean. */
  private def fitCentroids(corpus: DataFrame, embField: String,
      nCells: Int, iters: Int): Array[Array[Float]] = {
    val sample = corpus.select(col(embField).as("__e"))
      .orderBy(xxhash64(col("__e")))
      .limit(math.max(nCells * 50, 500))
      .collect().map(_.getSeq[Float](0).toArray)
    var cents = sample.take(nCells)
    var it = 0
    while (it < iters && sample.nonEmpty) {
      val sums = Array.fill(cents.length)(
        new Array[Double](sample.head.length))
      val counts = new Array[Int](cents.length)
      sample.foreach { v =>
        val cIdx = nearest(cents, v, 1)(0)
        counts(cIdx) += 1
        var i = 0
        while (i < v.length) { sums(cIdx)(i) += v(i); i += 1 }
      }
      cents = cents.indices.map { ci =>
        if (counts(ci) == 0) cents(ci)
        else sums(ci).map(s => (s / counts(ci)).toFloat)
      }.toArray
      it += 1
    }
    cents
  }

  private def nearest(cents: Array[Array[Float]], v: Array[Float],
      n: Int): Array[Int] = {
    val scored = cents.indices.map { ci =>
      val c = cents(ci)
      var dot = 0.0; var nc = 0.0; var nv = 0.0; var i = 0
      val len = math.min(c.length, v.length)
      while (i < len) {
        dot += c(i).toDouble * v(i); nc += c(i).toDouble * c(i)
        nv += v(i).toDouble * v(i); i += 1
      }
      ci -> dot / (math.sqrt(nc) * math.sqrt(nv) + 1e-12)
    }
    scored.sortBy(-_._2).take(n).map(_._1).toArray
  }

  private def assignUdf(centroids: Array[Array[Float]],
      nProbe: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (v: Seq[Float]) =>
      if (v == null) Array.empty[Int]
      else nearest(centroids, v.toArray, nProbe)
    }
}
