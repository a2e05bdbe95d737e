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

  /** Session-scoped memo of SUCCESSFUL prebuilt-index validations,
    * keyed by (analyzed-plan semantic hash, resolved input-file set,
    * codec shape) — the file-set component makes in-place appends
    * re-validate; see the validateIndex block below. */
  private val validatedIndexes: java.util.Set[String] =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[String,
        java.lang.Boolean]())

  def build(spark: SparkSession, cfg: ModuleCfg,
      inputs: Map[String, DataFrame]): Map[String, DataFrame] = {
    val p = cfg.params
    val corpus = inputs(cfg.inputs.head)
    // `action: index` — PERSISTABLE PQ index build: encode the
    // corpus ONCE (the expensive full-width pass at 100 TB) and emit
    // (id, m-byte codes) plus a `.codebook` side output; any number
    // of later query jobs read them back via indexInput/
    // codebookInput without ever touching the float corpus again —
    // the build-once / query-many shape of a production ANN serving
    // index. md5-seeded codebooks keep the whole stored index
    // SQL-replayable. With `codebookInput` the encode reuses a
    // PERSISTED codebook (no fit, no corpus scan) — the incremental
    // shape, and the one mode that also accepts a STREAMING corpus
    // (encode is a stateless projection): new arrivals append codes
    // to the stored index as they come. Its own batch/streaming
    // contract lives inside buildPqIndex, so dispatch FIRST.
    if (p.str("action").contains("index"))
      return buildPqIndex(spark, cfg, corpus, inputs)
    // `action: recall` — ANN quality evaluation: run the configured
    // approximate method AND the exact bruteforce top-k on the same
    // (corpus, queries), and emit one row per query with
    // recall@k = |approx ∩ exact| / |exact|. This is the knob-tuning
    // loop (planes/tables/nProbe/pqM vs recall) every ANN deployment
    // runs before serving; ground truth is O(|corpus|·|queries|) by
    // definition, so evaluate on a SAMPLED query set — the corpus
    // side still never shuffles (bruteforce scores map-side).
    if (p.str("action").contains("recall")) {
      require(p.str("method").exists(_ != "bruteforce"),
        s"similarity ${cfg.name}: action: recall compares an " +
          "APPROXIMATE method against the bruteforce ground truth — " +
          "set method: lsh or ivf (with the knobs to evaluate)")
      // recall over a PREBUILT index measures the exact artifact
      // being served (codes + codebook as stored) — but the ground
      // truth still needs float vectors, so `corpusInput` must name
      // the raw corpus alongside indexInput
      require(p.str("indexInput").isEmpty ||
          p.str("corpusInput").isDefined,
        s"similarity ${cfg.name}: action: recall needs the raw " +
          "corpus (the bruteforce ground truth scores float " +
          "vectors) — with indexInput, pass the raw corpus as an " +
          "extra input named by corpusInput; the approx side then " +
          "measures the STORED artifact while the ground truth " +
          "scores floats")
      require(!p.bool("selfJoin").getOrElse(false),
        s"similarity ${cfg.name}: action: recall with selfJoin " +
          "would need an O(n²) bruteforce ground truth — evaluate " +
          "on a SAMPLED query set (a second input) instead")
      // an explicit query input is mandatory: the single-input
      // default (corpus.limit(n)) would be sampled INDEPENDENTLY by
      // the approx and exact builds — an unordered limit can pick
      // different rows per evaluation, silently zeroing the recall
      require(cfg.inputs.size > 1,
        s"similarity ${cfg.name}: action: recall needs an explicit " +
          "query input (the sampled query set) as the second input")
      require(!inputs(cfg.inputs(1)).isStreaming,
        s"similarity ${cfg.name}: action: recall needs a bounded " +
          "query set — the bruteforce ground truth and the per-query " +
          "reduction cannot stream; stage the queries to storage " +
          "first")
      // inner builds get NO inline routing params — filter/select/
      // flattenField compile against the RECALL frame's schema at
      // the end, not against the inner top-k frames. flattenField is
      // stripped from the MODULE NODE too (finishRouted reads the
      // node-level placement first)
      val routing = Seq("filter", "filters", "select", "flattenField")
      def strip(drop: Seq[String], set: Map[String, String],
          newInputs: Seq[String] = cfg.inputs): ModuleCfg = {
        val o = p.deepCopy[
          com.fasterxml.jackson.databind.node.ObjectNode]
        drop.foreach(o.remove)
        set.foreach { case (k, v) => o.put(k, v) }
        val n = cfg.node.deepCopy[
          com.fasterxml.jackson.databind.JsonNode]
        n match {
          case obj: com.fasterxml.jackson.databind.node.ObjectNode =>
            routing.foreach(obj.remove)
          case _ => ()
        }
        cfg.copy(inputs = newInputs, params = o, node = n)
      }
      val approx = build(spark,
        strip("action" +: routing, Map.empty), inputs)(cfg.name)
        .select(col("query_id"), col("neighbor_id"))
      // ground truth: float bruteforce with the SAME k; bucket/codec
      // knobs dropped so nothing quantizes the exact side. With a
      // prebuilt approx side the exact build swaps the code frame
      // for the corpusInput raw-float corpus (and drops the stored
      // artifacts — the ground truth must not see them)
      val exactInputs = p.str("corpusInput") match {
        case Some(rawName) if p.str("indexInput").isDefined =>
          require(inputs.contains(rawName),
            s"similarity ${cfg.name}: unknown corpusInput " +
              s"'$rawName' (inputs: ${cfg.inputs.mkString(", ")})")
          require(!inputs(rawName).isStreaming,
            s"similarity ${cfg.name}: recall's corpusInput must be " +
              "bounded — the bruteforce ground truth scans it")
          // the QUERY input (position 1) is kept UNCONDITIONALLY —
          // when corpusInput names the same frame as the query set
          // (full-corpus recall eval), filtering it out would leave
          // a single-input build whose query side silently degrades
          // to corpus.limit(n), zeroing the recall
          rawName +: cfg.inputs(1) +: cfg.inputs.drop(2)
            .filter(n => !p.str("codebookInput").contains(n) &&
              !p.str("centroidsInput").contains(n) && n != rawName)
        case _ => cfg.inputs
      }
      val exact = build(spark,
        strip(Seq("action", "planes", "tables", "nProbe", "centroids",
            "codebookIds", "fitIterations", "pqM", "pqCodebookSize",
            "pqFitIterations", "quantized", "indexInput",
            "codebookInput", "centroidsInput", "corpusInput") ++
            routing,
          Map("method" -> "bruteforce"), exactInputs),
        inputs)(cfg.name)
        .select(col("query_id"), col("neighbor_id"))
      // ONE pass over the expensive ground-truth subtree: left-join
      // the approx hits onto it and count rows + hits in a single
      // aggregate (no exchange-reuse reliance, no stitch join)
      val out = exact
        .join(approx.withColumn("__hit", lit(1)),
          Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg(count(col("__hit")).as("hits"),
          count(lit(1)).as("exact_n"))
        .select(col("query_id"), col("hits"), col("exact_n"),
          (col("hits").cast(DoubleType) / col("exact_n"))
            .as("recall"))
      return TransformCommon.finishRouted(out, cfg)
    }
    TransformCommon.requireBatch(corpus, "similarity", cfg.name,
      "ANN index build and top-k search scan the whole corpus "
        + "(codebook fits, bucket windows, score re-attach joins)",
      "Build the index over the bounded corpus in a batch stage; "
        + "dedup method: embedding handles the STREAMING "
        + "flag-against-recent-arrivals case.")
    // `selfJoin: true` — EVERY corpus vector is a query (the
    // semdedup / neighbor-graph primitive: top-k neighbors for each
    // document). The broadcast-queries contract doesn't apply: the
    // candidate join shuffles both sides on the bucket/cell key and
    // the query re-attach joins the corpus index (int8 when
    // quantized) instead of broadcasting. Only the bucketed methods
    // scale — bruteforce self-join is the O(n²) cross product, and
    // its query side is driver-materialized, so it's rejected.
    val selfJoin = p.bool("selfJoin").getOrElse(false)
    require(!selfJoin || cfg.inputs.size == 1,
      s"similarity ${cfg.name}: selfJoin takes ONE input — the corpus " +
        "is its own query set")
    val queries =
      if (selfJoin) corpus
      else if (cfg.inputs.size > 1) inputs(cfg.inputs(1))
      else corpus.limit(p.int("numQueries").getOrElse(10))
    val embField = p.str("field").getOrElse("embedding")
    val idField = p.str("idField").getOrElse("vec_id")
    val k = p.int("k").getOrElse(10)

    // `quantized: true` — int8 index: the corpus side of the index is
    // stored/carried as (id, q: array<tinyint>, scale) — 4x smaller
    // than float32 — and vectors dequantize ON READ at scoring time.
    // The formula is SelectCompiler.quantizeCol/dequantizeCol (one
    // shared arithmetic, so the q105 oracle replays the whole chain).
    // For lsh/ivf the candidate re-attach join ships the int8 index
    // through its shuffle (the dequantize projection sits ABOVE the
    // join); bucketing/centroid assignment uses the reconstructed
    // vectors, exactly what a quantized index stores.
    val quantizedIdx = p.bool("quantized").getOrElse(false)
    // `pqM: m` — PRODUCT-QUANTIZED index: the corpus side is stored
    // as m uint8 codes per vector (one per d/m-dim subspace, each
    // the argmin-L2 centroid of a pqCodebookSize-entry per-subspace
    // codebook) — m bytes instead of 4·d, a 4·d/m× cut (d=64, m=8 →
    // 32×), the index shape that keeps a billion-vector ANN index
    // in memory. Vectors RECONSTRUCT on read (centroid concat), so
    // everything downstream — bucketing, candidate re-attach,
    // scoring — is the int8 path's plumbing with a different codec;
    // only the m-byte codes ever cross a shuffle. Codebooks are
    // md5-seeded under hashAlgo: md5 (the pqCodebookSize corpus
    // vectors with the smallest md5(id), sliced per subspace — the
    // same SQL-replayable audit mode as the IVF codebook), else
    // Lloyd-refined per subspace over the deterministic hash-ordered
    // sample (pqFitIterations, default 2).
    val pqM = p.int("pqM")
    require(pqM.isEmpty || !quantizedIdx,
      s"similarity ${cfg.name}: pqM and quantized: true are " +
        "exclusive — pick one index codec")
    // `indexInput` + `codebookInput` — query a PREBUILT PQ index
    // (the `action: index` output read back from storage): the
    // first input is the (id, __pq) code frame, the second the
    // queries, and codebookInput the persisted codebooks. The raw
    // float corpus is never read.
    val prebuilt = p.str("indexInput")
    prebuilt.foreach { n =>
      require(cfg.inputs.headOption.contains(n),
        s"similarity ${cfg.name}: indexInput '$n' must be the FIRST " +
          s"input (inputs: ${cfg.inputs.mkString(", ")}) — order " +
          "them [index, queries, codebook]")
      require(!quantizedIdx && pqM.isEmpty,
        s"similarity ${cfg.name}: indexInput IS the index — " +
          "quantized/pqM do not combine with it")
      require(p.str("method").getOrElse("bruteforce") != "ivf" ||
          p.str("centroidsInput").isDefined,
        s"similarity ${cfg.name}: ivf over a prebuilt index needs " +
          "centroidsInput (the action: index `.centroids` output — " +
          "build the index with `centroids: n` for the IVF-PQ " +
          "layout); without it use method: lsh or bruteforce, or " +
          "rebuild with the raw corpus input")
    }
    val pqCodec: Option[PqCodec] =
      if (prebuilt.isDefined) {
        val codec = codecFromCodebookRows(cfg, inputs, p)
        // codes/codebook pairing check over the WHOLE index, not a
        // one-row probe: an index dir mixing files from two builds
        // has per-file widths, so min≠max catches it at plan time
        // with a driver-side message instead of deep in an executor
        // task. One column-pruned aggregate (only length(__pq), and
        // null-__cell counts when the layout is IVF-PQ) — cheap next
        // to the query scan that follows. reconstruct() keeps its
        // per-row width throw as the executor-side backstop.
        // `validateIndex: false` skips the scan for hot serving
        // paths that trust their artifacts (the per-row width throw
        // in reconstruct() remains as the executor-side backstop);
        // default ON — a corrupted index fails the friendly way once
        // per job, and the validation scan reads ONE small column of
        // the table the query scans anyway
        val idx = inputs(prebuilt.get)
        // null __cell rows only matter to ivf probes (lsh/bruteforce
        // over an IVF-PQ index ignore the cell column entirely)
        val hasCell = idx.columns.contains("__cell") &&
          p.str("method").getOrElse("bruteforce") == "ivf"
        // successful validations memoize per (file set, codec shape)
        // within the session, so a serving loop that plans many
        // query jobs over the same stored artifact pays the scan
        // once instead of doubling every job's index read. The key
        // hashes the resolved INPUT FILES, not just the plan: a
        // plan-only key (path-based semanticHash) goes stale when
        // the dir is appended to in place — exactly the increment
        // workflow (`mode: append` sinks, streaming encode) whose
        // null-__cell/width corruption this validation exists to
        // catch. Every append/overwrite lands new UUID-named part
        // files, so the file-set hash changes and the index
        // re-validates; the semanticHash component separates
        // distinct non-file-backed frames (whose inputFiles are
        // both empty). (Failures throw and are never cached.) The
        // key — including the file enumeration — computes only when
        // validation is ON: `validateIndex: false` is the hot
        // serving opt-out and must not pay a per-job file-index
        // walk for a result it discards.
        lazy val vKey = {
          val idxFiles = idx.inputFiles
          idx.queryExecution.analyzed.semanticHash().toString +
            ":" + java.util.Arrays.hashCode(
              idxFiles.sorted.asInstanceOf[Array[AnyRef]]) +
            ":" + idxFiles.length +
            ":" + codec.codebooks.length + ":" + hasCell
        }
        if (p.bool("validateIndex").getOrElse(true) &&
            !validatedIndexes.contains(vKey)) {
        val stats = idx.filter(col("__pq").isNotNull)
          .agg(min(length(col("__pq"))).as("__w_min"),
            max(length(col("__pq"))).as("__w_max"),
            (if (hasCell)
               sum(when(col("__cell").isNull, 1L).otherwise(0L))
             else lit(0L)).as("__null_cells"))
          .collect()(0)
        if (!stats.isNullAt(0)) {
          require(stats.getInt(0) == stats.getInt(1),
            s"similarity ${cfg.name}: indexInput mixes code widths " +
              s"(${stats.getInt(0)}..${stats.getInt(1)} bytes) — the " +
              "index dir holds files from DIFFERENT builds; point " +
              "indexInput at one action: index run's output")
          require(stats.getInt(0) == codec.codebooks.length,
            s"similarity ${cfg.name}: indexInput codes are " +
              s"${stats.getInt(0)} bytes but codebookInput has " +
              s"${codec.codebooks.length} subspaces — these artifacts " +
              "come from different builds; pass the `.codebook` " +
              "output persisted by the SAME action: index run")
          // IVF-PQ layout integrity: an incremental encode run
          // WITHOUT centroidsInput emits code rows with no __cell —
          // appended into an IVF index they read back null and a
          // probe never matches them (silently unreachable vectors)
          if (hasCell) require(stats.getLong(2) == 0L,
            s"similarity ${cfg.name}: indexInput has " +
              s"${stats.getLong(2)} code rows with a null __cell — " +
              "an incremental action: index appended rows without " +
              "centroidsInput (the original build's `.centroids` " +
              "output), so ivf probes can never reach them; re-run " +
              "the increment with centroidsInput")
          // memoize only a VALIDATED (non-empty) index: an all-null
          // or empty code table proves nothing about rows that
          // appear later — bounded memo, a clear just re-validates
          if (validatedIndexes.size > 1024) validatedIndexes.clear()
          validatedIndexes.add(vKey)
        }
        }
        Some(codec)
      } else pqM.map(m =>
        fitPqCodecFromParams(cfg, corpus, embField, idField, m, p))
    val hasIdx = quantizedIdx || pqCodec.isDefined
    val idxCol = if (quantizedIdx) "__c_qv" else "__c_pq"
    def encodeCol(e: org.apache.spark.sql.Column) =
      pqCodec.map(_.encode(e))
        .getOrElse(graft.ops.SelectCompiler.quantizeCol(e))
    def decodeCol(e: org.apache.spark.sql.Column) =
      pqCodec.map(_.reconstruct(e))
        .getOrElse(graft.ops.SelectCompiler.dequantizeCol(e))
    // STREAMING queries re-plan the static side EVERY micro-batch:
    // without a persist the corpus index (and the per-table bucket
    // UDF pass over it, in route()) re-computes per batch. Pin the
    // static frames once — MEMORY_AND_DISK, recomputable on
    // eviction; CacheTracker leaves streaming-run frames alive for
    // the live micro-batch plans and the session cleans them up
    def pinStatic(df: DataFrame): DataFrame =
      if (cfg.inputs.size > 1 && inputs(cfg.inputs(1)).isStreaming)
        graft.ops.CacheTracker.trackPersist(df)
      else df
    val cIndex =
      if (prebuilt.isDefined)
        // codes were persisted by `action: index` — no encode pass
        pinStatic(inputs(prebuilt.get)
          .filter(col("__pq").isNotNull)
          .select(col(idField).as("neighbor_id"),
            col("__pq").as(idxCol)))
      else if (hasIdx)
        pinStatic(corpus.select(col(idField).as("neighbor_id"),
          encodeCol(col(embField)).as(idxCol)))
      else null
    val c =
      if (hasIdx) cIndex.withColumn("__c_emb", decodeCol(col(idxCol)))
        .select("neighbor_id", "__c_emb")
      else pinStatic(corpus.select(col(idField).as("neighbor_id"),
        col(embField).as("__c_emb")))
    // selfJoin + quantized: the query role of each vector uses the
    // SAME dequantized reconstruction as its corpus role — bucketing
    // the query side on raw floats would make candidate generation
    // asymmetric on lossy embeddings (the two roles of one vector
    // could land in different buckets/cells)
    val q =
      if (selfJoin && hasIdx)
        c.select(col("neighbor_id").as("query_id"),
          col("__c_emb").as("__q_emb"))
      else queries.select(col(idField).as("query_id"),
        col(embField).as("__q_emb"))
    /** Re-attach corpus vectors to an ids-only candidate set: in
      * quantized mode the join ships int8 + scale and reconstructs
      * above it, so the wide float arrays never cross the shuffle. */
    def attach(cand: DataFrame): DataFrame =
      if (hasIdx)
        cand.join(cIndex, Seq("neighbor_id"))
          .withColumn("__c_emb", decodeCol(col(idxCol)))
          .drop(idxCol)
      else cand.join(c, Seq("neighbor_id"))

    val idType = corpus.schema(idField).dataType
    val integralId = idType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val k0 = k

    /** Bucket/cell candidate join: queries broadcast under the
      * small-queries contract; in selfJoin mode both sides shuffle on
      * the key (hot buckets are AQE's skew-join case). Candidates
      * stay ids-only either way. */
    def candidates(cB: DataFrame, qB: DataFrame,
        key: String): DataFrame =
      (if (selfJoin) cB.join(qB, Seq(key))
       else cB.join(broadcast(qB), Seq(key)))
        .select("query_id", "neighbor_id")
        .dropDuplicates("query_id", "neighbor_id")
    /** Query-vector re-attach: broadcast of the contract-small query
      * frame, or (selfJoin) a second read of the corpus index — int8
      * through the shuffle when quantized, like [[attach]]. */
    def attachQ(cand: DataFrame): DataFrame =
      if (!selfJoin) cand.join(broadcast(q), Seq("query_id"))
      else if (hasIdx)
        cand.join(cIndex.select(col("neighbor_id").as("query_id"),
            col(idxCol).as("__q_qv")), Seq("query_id"))
          .withColumn("__q_emb", decodeCol(col("__q_qv")))
          .drop("__q_qv")
      else cand.join(c.select(col("neighbor_id").as("query_id"),
          col("__c_emb").as("__q_emb")), Seq("query_id"))

    /** Route a bucketed method's (keyed corpus index, query key
      * ARRAY expression) to scored candidates. Batch: the measured
      * ids-only shape — explode the query keys, broadcast-join,
      * dedup pairs, re-attach both embeddings. STREAMING queries
      * (static corpus, streaming query side — the real-time
      * retrieval shape): the query frame cannot broadcast and a
      * streaming dropDuplicates would be stateful, so the stream
      * carries its embedding through a stream-static equi-join on
      * the bucket key (per-batch volume is query-rate bounded, the
      * corpus index never moves) and multi-table duplicate pairs
      * dedup later inside streamTopK's per-batch map. */
    def route(cB: DataFrame, qKeyArr: org.apache.spark.sql.Column,
        key: String): DataFrame = {
      // explode_OUTER + post-filter in both legs: an inner explode's
      // inferred size() filter would inline the bucket/centroid UDF
      // and run it twice per query row (see DedupTransform notes)
      val qB = q.filter(col("__q_emb").isNotNull)
        .withColumn(key, explode_outer(qKeyArr))
        .filter(col(key).isNotNull)
      if (queries.isStreaming)
        // the keyed corpus frame carries the per-table bucket/cell
        // pass — pinned so micro-batches reuse it instead of
        // re-running the projection UDF over the corpus every batch
        attach(qB.join(graft.ops.CacheTracker.trackPersist(cB),
            Seq(key))
          .select("query_id", "neighbor_id", "__q_emb"))
      else
        attachQ(attach(candidates(cB,
          qB.select("query_id", key), key)))
    }

    val scored = p.str("method").getOrElse("bruteforce") match {
      case "bruteforce" =>
        require(!selfJoin,
          s"similarity ${cfg.name}: selfJoin needs a bucketed method " +
            "(lsh or ivf) — a brute-force self-join is the full " +
            "O(n²) cross product")
        require(!queries.isStreaming,
          s"similarity ${cfg.name}: bruteforce drives its scoring " +
            "from the corpus side (one pass per query batch over " +
            "every corpus vector), which a streaming query frame " +
            "cannot anchor — use method: lsh or ivf for streaming " +
            "queries against the static corpus index")
        // single-decode tight loop instead of crossJoin + per-pair
        // UDF: the pairwise form re-converted BOTH ArrayData sides
        // for every (corpus, query) pair — measured 18.4s for
        // 40k×1000 at local[32], ~all of it conversion, not FLOPs.
        // Queries were already the driver-materialized broadcast
        // side; corpus vectors now decode once per row, each
        // partition keeps per-query top-k heaps under TopKAgg's
        // exact ordering, and only partitions×queries×k candidate
        // rows reach the (unchanged) global top-k aggregate.
        return TransformCommon.finishRouted(
          globalTopK(
            bruteforceScores(c, q, k0, idType, integralId),
            k0, idType, integralId),
          cfg)
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
        // collapse them into one "t" bucket — drop them instead.
        // Candidates stay NARROW (two ids): carrying both embedding
        // arrays through the multi-table dedup shuffle measured 75s
        // for 40k×1000 — the ngramDedup candidate design applies
        // identically here (ids-only dedup, then re-attach payloads)
        // explode_OUTER + post-filter, not an inner explode: the
        // inner form's inferred size() filter inlines the bucket
        // expression and runs every hyperplane-projection UDF twice
        // per row (see DedupTransform.winnowDedup)
        val cB = c.filter(col("__c_emb").isNotNull)
          .withColumn("__bucket", explode_outer(buckets(col("__c_emb"))))
          .filter(col("__bucket").isNotNull)
          .select("neighbor_id", "__bucket")
        // corpus embeddings once per unique pair (AQE picks the
        // join); query embeddings re-attach broadcast (or via the
        // corpus index in selfJoin mode) — ids-only until then;
        // streaming queries take route()'s stream-static leg
        route(cB, buckets(col("__q_emb")), "__bucket")
      case "ivf" =>
        // IVF: corpus vectors assign to their nearest centroid once;
        // each query probes the nProbe nearest centroid cells. The
        // centroid table is tiny and broadcast with the probe join —
        // corpus never shuffles. Centroid fit = nIter Lloyd steps,
        // driver-side on a deterministic seed sample (the standard
        // train-then-index split; swappable for an external codebook).
        val nCells = p.int("centroids").getOrElse(16)
        val nProbe = p.int("nProbe").getOrElse(4)
        // external codebook (`codebookIds`: corpus ids whose vectors
        // become the centroid table, in the given order) makes the
        // whole index deterministic and SQL-replayable. `hashAlgo:
        // md5` derives the codebook FROM the corpus itself — the
        // nCells vectors with the smallest md5(id) (audit mode, like
        // the dedup md5 twins: any SQL engine replays the selection),
        // optionally refined by Lloyd steps (fitIterations, default 0
        // in md5 mode so the index stays SQL-replayable end-to-end).
        // Default remains the Lloyd auto-fit over a deterministic
        // hash-ordered sample.
        val codebookIds = p.arrOf("codebookIds").map(_.asLong)
        val md5Seeded = p.str("hashAlgo").contains("md5")
        val centroids =
          if (prebuilt.isDefined)
            // IVF-PQ prebuilt: the coarse centroid table persisted
            // by action: index, read back (bounded collect)
            centroidsFromRows(cfg, inputs, p)
          else if (codebookIds.nonEmpty)
            codebookFromIds(corpus, embField, idField, codebookIds)
          else if (md5Seeded)
            fitCentroids(corpus, embField, nCells,
              p.int("fitIterations").getOrElse(0),
              init = md5SeededInit(corpus, embField, idField, nCells))
          else fitCentroids(corpus, embField,
            nCells, p.int("fitIterations").getOrElse(2))
        val assignQ = assignUdf(centroids, nProbe)
        val cB =
          if (prebuilt.isDefined) {
            // cells were stored at build time (assigned over the
            // reconstruction, exactly what the live path computes)
            val idx = inputs(prebuilt.get)
            require(idx.columns.contains("__cell"),
              s"similarity ${cfg.name}: the prebuilt index has no " +
                "__cell column — build it with `centroids: n` for " +
                "the IVF-PQ layout, or query with method: lsh/" +
                "bruteforce")
            pinStatic(idx.filter(col("__pq").isNotNull)
              .select(col(idField).as("neighbor_id"), col("__cell")))
          } else c.withColumn("__cell",
            assignUdf(centroids, 1)(col("__c_emb"))(0))
            .select("neighbor_id", "__cell")
        // same narrow-candidate shape as lsh (streaming queries take
        // route()'s stream-static leg)
        route(cB, assignQ(col("__q_emb")), "__cell")
      case other =>
        throw new IllegalArgumentException(s"similarity method: $other")
    }

    val withScore = scored
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score", cosine(col("__q_emb"), col("__c_emb")))
      .select(col("query_id"), col("neighbor_id"), col("score"))
    TransformCommon.finishRouted(
      if (queries.isStreaming)
        streamTopK(withScore, k, idType, integralId)
      else globalTopK(withScore, k, idType, integralId), cfg)
  }

  /** Streaming-safe per-query top-k: `globalTopK`'s aggregate is a
    * streaming aggregation Spark rejects in append mode, so instead
    * repartition on the query id (a STATELESS exchange — every
    * candidate row of a query, including multi-table duplicate
    * pairs, lands in one partition of its micro-batch) and reduce
    * per partition: a per-query neighbor→score map dedups the
    * duplicate pairs (same pair ⇒ same score, so overwrite is
    * lossless), then sort (score desc, NaN largest, id asc — exactly
    * TopKAgg's order) and emit ranks 1..k. A query row is ranked
    * against the candidates its own arrival generated; if the same
    * query id arrives in two micro-batches, each arrival emits its
    * own (identical, corpus is static) top-k — document-at-the-sink
    * behavior, same as every stateless streaming transform.
    * Per-partition memory is (queries in batch) × (bucket hits),
    * bounded by arrival rate, never by corpus size. */
  private def streamTopK(withScore: DataFrame, k: Int,
      idType: DataType, integralId: Boolean): DataFrame = {
    import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
    import org.apache.spark.sql.Row
    val outSchema = StructType(Seq(
      StructField("query_id", idType),
      StructField("neighbor_id", idType),
      StructField("score", DoubleType),
      StructField("rank", IntegerType)))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val idOrd: Ordering[Any] =
      if (integralId) Ordering.by((a: Any) =>
        a.asInstanceOf[Number].longValue)
      else Ordering.by((a: Any) => String.valueOf(a))
    // rank order: score desc (java compare puts NaN above every
    // value — "NaN largest", TopKAgg's contract), ties on asc id
    def rankBefore(a: (Any, Double), b: (Any, Double)): Boolean = {
      val cmp = java.lang.Double.compare(a._2, b._2)
      if (cmp != 0) cmp > 0 else idOrd.lt(a._1, b._1)
    }
    // max-heap whose head is the WORST retained candidate
    val worstFirst = new Ordering[(Any, Double)] {
      def compare(a: (Any, Double), b: (Any, Double)): Int =
        if (rankBefore(a, b)) -1 else if (rankBefore(b, a)) 1 else 0
    }
    withScore.repartition(col("query_id")).mapPartitions { it =>
      // per-query BOUNDED k-heap + current-member set: memory is
      // queries × k, never the candidate count (a hot bucket must
      // not scale executor memory — the funnel TopKAgg's map-side
      // prune avoids on the batch path). Multi-table duplicate
      // pairs carry identical scores, so membership-skip of CURRENT
      // heap members is lossless, and a duplicate of an EVICTED
      // neighbor always loses again: evictions only ever replace
      // worse with better, so the heap's quality is monotone
      final case class Top(
        heap: scala.collection.mutable.PriorityQueue[(Any, Double)],
        in: scala.collection.mutable.HashSet[Any])
      val perQuery = scala.collection.mutable.LinkedHashMap
        .empty[Any, Top]
      it.foreach { r =>
        val t = perQuery.getOrElseUpdate(r.get(0), Top(
          scala.collection.mutable.PriorityQueue
            .empty[(Any, Double)](worstFirst),
          scala.collection.mutable.HashSet.empty[Any]))
        val cand = (r.get(1), r.getDouble(2))
        if (!t.in.contains(cand._1)) {
          if (t.heap.size < k) { t.heap += cand; t.in += cand._1 }
          else if (rankBefore(cand, t.heap.head)) {
            t.in -= t.heap.dequeue()._1
            t.heap += cand; t.in += cand._1
          }
        }
      }
      perQuery.iterator.flatMap { case (qid, t) =>
        // dequeueAll yields worst-first; reverse → ranks 1..k
        val best = t.heap.dequeueAll.reverse
        best.iterator.zipWithIndex.map { case ((nid, s), i) =>
          Row(qid, nid, s, i + 1)
        }
      }
    }(enc)
  }

  /** Bounded top-k aggregate instead of a per-query Window rank: the
    * hash aggregate prunes to ≤k map-side, so the shuffle carries
    * O(partitions × queries × k) rows — never the scored corpus.
    * Input: (query_id, neighbor_id, score). */
  private def globalTopK(withScore: DataFrame, k: Int,
      idType: DataType, integralId: Boolean): DataFrame = {
    val topAgg =
      if (integralId) TopKFunctions.topKLong(k,
        col("score"), col("neighbor_id").cast(LongType))
      else TopKFunctions.topKString(k,
        col("score"), col("neighbor_id").cast(StringType))
    withScore
      .groupBy(col("query_id"))
      .agg(topAgg.as("__top"))
      .select(col("query_id"), posexplode(col("__top")))
      .select(col("query_id"),
        col("col._2").cast(idType).as("neighbor_id"),
        col("col._1").as("score"),
        (col("pos") + 1).cast(IntegerType).as("rank"))
  }

  /** Per-partition scored top-k candidates for brute force:
    * (query_id, neighbor_id, score) rows, ≤ queries×k per partition.
    * Arithmetic is bit-identical to `TextFunctions.cosine` (index-
    * ordered double accumulation over min(len), final
    * dot/(sqrt·sqrt)) and the heap eviction order is exactly
    * TopKAgg's (score desc, NaN largest, id asc), so partition-local
    * pruning can never discard a row the global aggregate would have
    * kept. */
  private def bruteforceScores(c: DataFrame, q: DataFrame, k: Int,
      idType: DataType, integralId: Boolean): DataFrame = {
    import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
    import org.apache.spark.sql.Row
    val spark = c.sparkSession
    // queries are the contract-small side (they were broadcast
    // before); materialize once, ship via a broadcast variable
    val qRows = q.filter(col("__q_emb").isNotNull).collect()
    val qIds: Array[Any] = qRows.map(_.get(0))
    val qVecs: Array[Array[Float]] =
      qRows.map(_.getSeq[Float](1).toArray)
    val bc = spark.sparkContext.broadcast((qIds, qVecs))
    val idOrd: Ordering[Any] =
      if (integralId) Ordering.by((a: Any) =>
        a.asInstanceOf[Number].longValue)
      else Ordering.by((a: Any) => String.valueOf(a))
    val outSchema = StructType(Seq(
      StructField("query_id", idType), StructField("neighbor_id", idType),
      StructField("score", DoubleType)))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    c.filter(col("__c_emb").isNotNull).mapPartitions { it =>
      val (ids, vecs) = bc.value
      val nQ = ids.length
      // per-query norm sums, index-ordered like the cosine UDF; valid
      // for equal-length pairs (the overwhelming case) — mismatched
      // lengths recompute pairwise over min(len)
      val qNorm = vecs.map { v =>
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
        s
      }
      // worst-at-head eviction heap per query, TopKAgg's exact order
      val pairOrd = new Ordering[(Double, Any)] {
        def compare(a: (Double, Any), b: (Double, Any)): Int = {
          val cc = java.lang.Double.compare(b._1, a._1)
          if (cc != 0) cc else idOrd.compare(a._2, b._2)
        }
      }
      val heaps = Array.fill(nQ)(
        new scala.collection.mutable.PriorityQueue[(Double, Any)]()(pairOrd))
      it.foreach { row =>
        val nid = row.get(0)
        val seq = row.getSeq[Float](1)
        val arr = seq.toArray // decode ONCE per corpus row
        var cNorm = 0.0
        var i = 0
        while (i < arr.length) { cNorm += arr(i).toDouble * arr(i); i += 1 }
        var qi = 0
        while (qi < nQ) {
          if (ids(qi) != nid) {
            val qv = vecs(qi)
            val n = math.min(arr.length, qv.length)
            var dot = 0.0; i = 0
            while (i < n) { dot += arr(i).toDouble * qv(i); i += 1 }
            val (na, nb) =
              if (arr.length == qv.length) (cNorm, qNorm(qi))
              else { // rare mismatched-length fallback: UDF semantics
                var a2 = 0.0; var b2 = 0.0; i = 0
                while (i < n) {
                  a2 += arr(i).toDouble * arr(i)
                  b2 += qv(i).toDouble * qv(i); i += 1
                }
                (a2, b2)
              }
            // NOTE argument order: cosine(q, c) → dot/(sqrt(nq)*sqrt(nc))
            val score = dot / (math.sqrt(nb) * math.sqrt(na))
            val h = heaps(qi)
            val cand = (score, nid)
            if (h.size < k) h.enqueue(cand)
            else if (pairOrd.compare(cand, h.head) < 0) {
              h.dequeue(); h.enqueue(cand)
            }
          }
          qi += 1
        }
      }
      (0 until nQ).iterator.flatMap { qi =>
        heaps(qi).iterator.map { case (s, nid) => Row(ids(qi), nid, s) }
      }
    }(enc)
  }

  /** External IVF codebook: centroid p is the embedding of corpus id
    * `ids(p)` — driver-side collect bounded by the codebook size (a
    * codebook is centroids-count-sized by definition, never
    * corpus-sized). */
  /** `action: index` — encode the corpus once, emit the persistable
    * (id, m-byte codes) frame plus a `.codebook` side output
    * ((__j, __ci, __centroid) — m·ks rows, trivially storable).
    * Write both to storage; later query jobs feed them back via
    * indexInput/codebookInput and never read the float corpus
    * again. Null embeddings drop (they can never score). */
  private def buildPqIndex(spark: SparkSession, cfg: ModuleCfg,
      corpus: DataFrame, inputs: Map[String, DataFrame])
      : Map[String, DataFrame] = {
    import spark.implicits._
    val p = cfg.params
    val embField = p.str("field").getOrElse("embedding")
    val idField = p.str("idField").getOrElse("vec_id")
    val cbIn = p.str("codebookInput")
    require(!corpus.isStreaming || cbIn.isDefined,
      s"similarity ${cfg.name}: fitting codebooks needs a bounded " +
        "corpus — action: index on a STREAM requires codebookInput " +
        "(a codebook persisted by a batch build); the encode itself " +
        "is a stateless projection and streams fine")
    val codec = cbIn match {
      case Some(_) =>
        // incremental encode: the persisted codebook drives the
        // projection, the corpus (batch increment or stream) is
        // never scanned for a fit
        require(p.int("pqM").isEmpty &&
            p.int("pqCodebookSize").isEmpty,
          s"similarity ${cfg.name}: codebookInput fixes the codec — " +
            "pqM/pqCodebookSize come from the persisted codebook")
        // the coarse layer must come from the same original build
        // too: fitting fresh centroids over an INCREMENT would
        // assign cells inconsistent with the stored index's
        require(p.int("centroids").isEmpty &&
            p.arrOf("codebookIds").isEmpty,
          s"similarity ${cfg.name}: an incremental build reuses the " +
            "stored coarse table — pass centroidsInput (the " +
            "original build's `.centroids` output), not " +
            "centroids/codebookIds, or the increment's cells would " +
            "be inconsistent with the stored index")
        // layout-marker check (the reverse of the guard above): a
        // codebook persisted by an IVF-PQ build carries __ivf=true;
        // an increment against it WITHOUT centroidsInput would emit
        // code rows with no __cell — appended into the stored index
        // they read back null and ivf probes can never reach them.
        // The codebook is bounded (m·ks rows), so the probe is free;
        // pre-marker codebooks (no __ivf column) skip the check and
        // rely on the query-time null-__cell validation instead.
        // skip the probe on a streaming codebook — the collect would
        // throw Spark's opaque streaming-source AnalysisException;
        // codecFromCodebookRows raises the named "must be bounded"
        // error immediately after
        inputs.get(cbIn.get)
          .filter(d => !d.isStreaming && d.columns.contains("__ivf"))
          .foreach { cbDf =>
            val ivfBuilt = cbDf.filter(col("__ivf") === true)
              .limit(1).collect().nonEmpty
            require(!ivfBuilt || p.str("centroidsInput").isDefined,
              s"similarity ${cfg.name}: codebookInput came from an " +
                "IVF-PQ build (centroids: n) — an increment without " +
                "centroidsInput would append code rows with no " +
                "__cell, unreachable by ivf probes of the stored " +
                "index; pass the original build's `.centroids` " +
                "output as centroidsInput")
          }
        codecFromCodebookRows(cfg, inputs, p)
      case None =>
        val m = p.int("pqM").getOrElse(throw new IllegalArgumentException(
          s"similarity ${cfg.name}: action: index requires pqM (the " +
            "product-quantization width — the persistable index is the " +
            "PQ codec's (id, codes) frame) or codebookInput (encode " +
            "against a persisted codebook)"))
        fitPqCodecFromParams(cfg, corpus, embField, idField, m, p)
    }
    val base = corpus.filter(col(embField).isNotNull)
      .select(col(idField), codec.encode(col(embField)).as("__pq"))
      // a dim-mismatched vector encodes to null — drop rather than
      // store an unreadable code row (matters on streams, where the
      // head-probe dim check above cannot run)
      .filter(col("__pq").isNotNull)
    // IVF-PQ (the FAISS-standard billion-vector layout): with
    // `centroids`/`codebookIds` the index also stores each vector's
    // coarse CELL (assigned over the RECONSTRUCTION, matching the
    // live ivf+pqM path) and emits a `.centroids` side output —
    // query jobs then probe nProbe cells and score reconstructions,
    // never scanning the whole code table per query
    val ivfCents: Option[Array[Array[Float]]] = {
      val codebookIds = p.arrOf("codebookIds").map(_.asLong)
      val md5Seeded = p.str("hashAlgo").contains("md5")
      if (p.str("centroidsInput").isDefined)
        // incremental/streaming: reuse the persisted coarse table
        Some(centroidsFromRows(cfg, inputs, p))
      else if (codebookIds.nonEmpty || p.int("centroids").isDefined) {
        require(!corpus.isStreaming,
          s"similarity ${cfg.name}: fitting/collecting IVF " +
            "centroids needs a bounded corpus — pass centroidsInput " +
            "(a `.centroids` output persisted by a batch build) to " +
            "cell-assign a stream")
        if (codebookIds.nonEmpty)
          Some(codebookFromIds(corpus, embField, idField, codebookIds))
        else p.int("centroids").map { n =>
          if (md5Seeded)
            fitCentroids(corpus, embField, n,
              p.int("fitIterations").getOrElse(0),
              init = md5SeededInit(corpus, embField, idField, n))
          else fitCentroids(corpus, embField, n,
            p.int("fitIterations").getOrElse(2))
        }
      } else None
    }
    val codes = ivfCents match {
      case None => base
      case Some(ct) => base.withColumn("__cell",
        assignUdf(ct, 1)(codec.reconstruct(col("__pq")))(0))
    }
    val cbRows = for {
      j <- codec.codebooks.indices
      ci <- codec.codebooks(j).indices
    } yield (j, ci, codec.codebooks(j)(ci).toSeq)
    // __ivf layout marker: lets a later incremental encode detect
    // that the original build stored coarse cells, and fail fast
    // when centroidsInput is missing (see the codec check above)
    val cb = cbRows.toDF("__j", "__ci", "__centroid")
      .withColumn("__ivf", lit(ivfCents.isDefined))
    // finishRouted on the code frame: inline filter/select/failure
    // routing apply to the index output like on every other branch
    TransformCommon.finishRouted(codes, cfg) ++
      Map(s"${cfg.name}.codebook" -> cb) ++
      ivfCents.map(ct => s"${cfg.name}.centroids" ->
        ct.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
          .toDF("__ci", "__centroid"))
  }

  /** One fit contract for BOTH the index build and the live query
    * path — a single definition keeps the stored-index-equals-
    * direct-run invariant (q189) from silently diverging. */
  private def fitPqCodecFromParams(cfg: ModuleCfg, corpus: DataFrame,
      embField: String, idField: String, m: Int,
      p: com.fasterxml.jackson.databind.JsonNode): PqCodec = {
    require(m >= 1 && m <= 256,
      s"similarity ${cfg.name}: pqM must be in [1, 256]")
    val ks = p.int("pqCodebookSize").getOrElse(16)
    require(ks >= 2 && ks <= 256,
      s"similarity ${cfg.name}: pqCodebookSize must be in [2, 256]" +
        " (codes are uint8)")
    val dim = corpus.select(col(embField))
      .filter(col(embField).isNotNull).head.getSeq[Float](0).length
    require(dim % m == 0,
      s"similarity ${cfg.name}: pqM=$m must divide the embedding " +
        s"dim ($dim)")
    val md5Seeded = p.str("hashAlgo").contains("md5")
    val seed =
      if (md5Seeded) md5SeededInit(corpus, embField, idField, ks)
      else null
    PqCodec.fit(corpus, embField, m, ks, dim,
      if (md5Seeded) 0 else p.int("pqFitIterations").getOrElse(2),
      seed)
  }

  /** Rebuild the PqCodec from a persisted `.codebook` frame — the
    * collect is bounded by m·ks ≤ 65536 rows of d/m floats. */
  private def codecFromCodebookRows(cfg: ModuleCfg,
      inputs: Map[String, DataFrame],
      p: com.fasterxml.jackson.databind.JsonNode): PqCodec = {
    val cbName = p.str("codebookInput").getOrElse(
      throw new IllegalArgumentException(
        s"similarity ${cfg.name}: indexInput needs codebookInput — " +
          "the action: index run's `.codebook` output read back " +
          "from storage"))
    val cbDf = inputs.getOrElse(cbName,
      throw new IllegalArgumentException(
        s"similarity ${cfg.name}: unknown codebookInput '$cbName' " +
          s"(inputs: ${cfg.inputs.mkString(", ")})"))
    require(!cbDf.isStreaming,
      s"similarity ${cfg.name}: codebookInput must be bounded")
    val rows = cbDf.select(col("__j").cast("int"),
        col("__ci").cast("int"),
        col("__centroid").cast(ArrayType(FloatType)))
      .collect()
    require(rows.nonEmpty,
      s"similarity ${cfg.name}: codebookInput '$cbName' is empty")
    val byJ = rows.groupBy(_.getInt(0))
    val m = byJ.keys.max + 1
    val codebooks = (0 until m).map { j =>
      val entries = byJ.getOrElse(j,
        throw new IllegalArgumentException(
          s"similarity ${cfg.name}: codebook is missing subspace $j"))
        .sortBy(_.getInt(1))
      require(entries.map(_.getInt(1)).toSeq == entries.indices,
        s"similarity ${cfg.name}: codebook subspace $j has gaps in " +
          "its centroid indices")
      // a corrupt codebook must fail HERE with its name, not NPE in
      // getSeq or corrupt reconstruction offsets with ragged widths
      require(entries.forall(!_.isNullAt(2)),
        s"similarity ${cfg.name}: codebookInput '$cbName' subspace " +
          s"$j has null __centroid rows — the codebook is corrupt")
      val cents = entries.map(_.getSeq[Float](2).toArray)
      require(cents.map(_.length).distinct.length == 1,
        s"similarity ${cfg.name}: codebookInput '$cbName' subspace " +
          s"$j mixes centroid widths " +
          s"(${cents.map(_.length).distinct.sorted.mkString(", ")})" +
          " — the codebook is corrupt or mixes builds")
      cents.toArray
    }.toArray
    require(codebooks.map(_.head.length).distinct.length == 1,
      s"similarity ${cfg.name}: codebookInput '$cbName' subspaces " +
        "disagree on centroid width (" +
        codebooks.map(_.head.length).distinct.sorted.mkString(", ") +
        ") — the codebook is corrupt or mixes builds")
    PqCodec(codebooks)
  }

  /** Rebuild the IVF coarse-centroid table from a persisted
    * `.centroids` frame — bounded by the cell count. */
  private def centroidsFromRows(cfg: ModuleCfg,
      inputs: Map[String, DataFrame],
      p: com.fasterxml.jackson.databind.JsonNode)
      : Array[Array[Float]] = {
    val name = p.str("centroidsInput").get // presence checked upstream
    val df = inputs.getOrElse(name,
      throw new IllegalArgumentException(
        s"similarity ${cfg.name}: unknown centroidsInput '$name' " +
          s"(inputs: ${cfg.inputs.mkString(", ")})"))
    require(!df.isStreaming,
      s"similarity ${cfg.name}: centroidsInput must be bounded")
    val rows = df.select(col("__ci").cast("int"),
        col("__centroid").cast(ArrayType(FloatType)))
      .collect().sortBy(_.getInt(0))
    require(rows.nonEmpty,
      s"similarity ${cfg.name}: centroidsInput '$name' is empty")
    require(rows.map(_.getInt(0)).toSeq == rows.indices,
      s"similarity ${cfg.name}: centroidsInput '$name' has gaps in " +
        "its cell indices")
    require(rows.forall(!_.isNullAt(1)),
      s"similarity ${cfg.name}: centroidsInput '$name' has null " +
        "__centroid rows — the coarse table is corrupt")
    val cents = rows.map(_.getSeq[Float](1).toArray)
    require(cents.map(_.length).distinct.length == 1,
      s"similarity ${cfg.name}: centroidsInput '$name' mixes " +
        s"centroid widths " +
        s"(${cents.map(_.length).distinct.sorted.mkString(", ")}) — " +
        "the coarse table is corrupt or mixes builds")
    cents
  }

  private[operators] def codebookFromIds(corpus: DataFrame, embField: String,
      idField: String, ids: Seq[Long]): Array[Array[Float]] = {
    val byId = corpus
      .filter(col(idField).isin(ids: _*))
      .select(col(idField).cast("long"), col(embField))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    ids.map(id => byId.getOrElse(id, throw new IllegalArgumentException(
      s"similarity ivf codebookIds: id $id not in corpus"))).toArray
  }

  /** md5-audit codebook init: the nCells corpus vectors with the
    * smallest md5(id) (id-string tie-break), in that order. A SQL
    * engine replays the selection exactly (`ORDER BY md5(CAST(id AS
    * VARCHAR)) LIMIT n`), so an IVF index seeded this way — with
    * fitIterations 0 — is oracle-checkable value-for-value.
    * orderBy+limit compiles to TakeOrderedAndProject: per-partition
    * heaps, bounded driver merge, corpus never collected. */
  private[operators] def md5SeededInit(corpus: DataFrame,
      embField: String, idField: String, nCells: Int)
      : Array[Array[Float]] =
    corpus.filter(col(embField).isNotNull)
      .select(col(embField).as("__e"),
        col(idField).cast("string").as("__id_s"))
      .orderBy(md5(col("__id_s")), col("__id_s"))
      .limit(nCells)
      .collect().map(_.getSeq[Float](0).toArray)

  /** Lloyd iterations over a deterministic pseudo-random sample:
    * rows ordered by content hash → TakeOrderedAndProject (per-
    * partition heap + bounded driver merge), so the sample is
    * uniform-ish over the whole corpus even when the data is sorted
    * or partitioned by some key — a head `limit()` would be biased.
    * Init = `init` when given (md5-seeded mode), else the first
    * nCells sampled vectors; assign → elementwise mean. */
  private[operators] def fitCentroids(corpus: DataFrame, embField: String,
      nCells: Int, iters: Int,
      init: Array[Array[Float]] = null): Array[Array[Float]] = {
    if (iters == 0 && init != null) return init
    val sample = corpus.select(col(embField).as("__e"))
      .orderBy(xxhash64(col("__e")))
      .limit(math.max(nCells * 50, 500))
      .collect().map(_.getSeq[Float](0).toArray)
    var cents = if (init != null) init else sample.take(nCells)
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

  private[operators] def assignUdf(centroids: Array[Array[Float]],
      nProbe: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (v: Seq[Float]) =>
      if (v == null) Array.empty[Int]
      else nearest(centroids, v.toArray, nProbe)
    }
}

/** Product-quantization codec: `codebooks(j)` is subspace j's
  * centroid table ([ks][d/m] floats). `encode` maps a d-dim vector
  * to m uint8 codes (per-subspace argmin squared-L2, smallest index
  * on ties — deterministic, SQL-replayable); `reconstruct` concats
  * the coded centroids back into an approximate d-dim vector. The
  * codebooks are broadcast-small by construction (m·ks·(d/m) =
  * ks·d floats total). */
private[operators] final case class PqCodec(
    codebooks: Array[Array[Array[Float]]]) {
  private def sub: Int = codebooks(0)(0).length
  def encode(e: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val cbs = codebooks
    val s = sub
    udf { (v: Seq[Float]) =>
      if (v == null || v.length != cbs.length * s) null
      else {
        val out = new Array[Byte](cbs.length)
        var j = 0
        while (j < cbs.length) {
          val cb = cbs(j)
          var best = 0; var bestD = Double.MaxValue; var ci = 0
          while (ci < cb.length) {
            val cent = cb(ci)
            var d = 0.0; var t = 0
            while (t < s) {
              val df = v(j * s + t).toDouble - cent(t)
              d += df * df; t += 1
            }
            if (d < bestD) { bestD = d; best = ci }
            ci += 1
          }
          out(j) = best.toByte
          j += 1
        }
        out
      }
    }.apply(e)
  }
  def reconstruct(e: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val cbs = codebooks
    val s = sub
    udf { (codes: Array[Byte]) =>
      if (codes == null) null
      else {
        // strict width check: a code row from a DIFFERENT build
        // must fail loudly, not reconstruct from the wrong codec
        // (wider codes) or index out of bounds (narrower)
        if (codes.length != cbs.length)
          throw new IllegalArgumentException(
            s"PQ code is ${codes.length} bytes but the codebook " +
              s"has ${cbs.length} subspaces — the code frame and " +
              "codebook come from different index builds")
        val out = new Array[Float](cbs.length * s)
        var j = 0
        while (j < cbs.length) {
          System.arraycopy(cbs(j)(codes(j) & 0xff), 0, out, j * s, s)
          j += 1
        }
        out
      }
    }.apply(e)
  }
}

private[operators] object PqCodec {
  /** Fit per-subspace codebooks: from `seed` full vectors sliced per
    * subspace (md5-audit mode — iters 0 keeps the index
    * SQL-replayable end-to-end), else Lloyd (squared-L2 means) per
    * subspace over the deterministic hash-ordered sample, the same
    * sampling contract as the IVF fit. */
  def fit(corpus: DataFrame, embField: String, m: Int, ks: Int,
      dim: Int, iters: Int, seed: Array[Array[Float]]): PqCodec = {
    val sub = dim / m
    val seedSubs: Array[Array[Array[Float]]] =
      if (seed == null) null
      else Array.tabulate(m)(j =>
        seed.map(v => v.slice(j * sub, (j + 1) * sub)))
    if (iters == 0 && seedSubs != null) return PqCodec(seedSubs)
    val sample = corpus.filter(col(embField).isNotNull)
      .select(col(embField).as("__e"))
      .orderBy(xxhash64(col("__e")))
      .limit(math.max(ks * 50, 500))
      .collect().map(_.getSeq[Float](0).toArray)
      .filter(_.length == dim)
    val cbs = Array.tabulate(m) { j =>
      val pts = sample.map(_.slice(j * sub, (j + 1) * sub))
      var cents: Array[Array[Float]] =
        if (seedSubs != null) seedSubs(j) else pts.take(ks)
      var it = 0
      while (it < iters && pts.nonEmpty) {
        val sums = Array.fill(cents.length)(new Array[Double](sub))
        val counts = new Array[Int](cents.length)
        pts.foreach { v =>
          var best = 0; var bestD = Double.MaxValue; var ci = 0
          while (ci < cents.length) {
            var d = 0.0; var t = 0
            while (t < sub) {
              val df = v(t).toDouble - cents(ci)(t); d += df * df; t += 1
            }
            if (d < bestD) { bestD = d; best = ci }
            ci += 1
          }
          counts(best) += 1
          var t = 0
          while (t < sub) { sums(best)(t) += v(t); t += 1 }
        }
        cents = cents.indices.map(ci =>
          if (counts(ci) == 0) cents(ci)
          else sums(ci).map(x => (x / counts(ci)).toFloat)).toArray
        it += 1
      }
      cents
    }
    PqCodec(cbs)
  }
}
