package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.VectorFunctions

/** §2.C similarity search over an embeddings-shaped table
  * (vec_id: long, embedding: array<float>).
  *
  * Scale design: the query side is always broadcast (queries ≪ data);
  * the corpus side streams through one whole-stage-codegen scan with
  * the native cosine expression (graft.functions.CosineFloat) — no
  * shuffle of vectors at all for brute force; top-k per query is a
  * partial `Window`+filter whose state is k rows per query per
  * partition. The LSH variant prunes the corpus scan to matching
  * buckets: the corpus is bucketed once (a cheap narrow projection),
  * then only bucket-equal rows are scored — at 100 TB this is the
  * difference between touching every vector and touching ~1/2^bits.
  */
object Similarity {

  /** ss1: exact brute-force cosine top-k for each query vector.
    *
    * Ranking runs through the graft_topk partial aggregate, NOT a rank
    * window: a window would shuffle all n×q scored rows to rank them;
    * the aggregate keeps a k-heap per query per map task, so only
    * partitions×q×k rows ever shuffle — the corpus itself is scanned
    * once, never moved. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = corpus
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        call_function("graft_cosine", col("q_emb"), col("embedding")).as("cosine"))
    topKPerQuery(scored, k)
  }

  /** ss18 (round 15): FILTERED vector search — exact top-k among
    * corpus vectors passing a per-query predicate, here SAME LABEL:
    * each query's nearest neighbors WITHIN ITS OWN CLASS (the
    * label-noise / intra-class-duplicate detection shape, and the
    * "nearest same-language/same-source document" query every
    * filtered-retrieval stack serves). The predicate rides the JOIN
    * CONDITION as an equi component, so Spark hash-joins on label and
    * non-matching rows never reach the scorer — at 100 TB this beats
    * score-then-filter by the class-selectivity factor, and the plan
    * keeps ss1's skeleton: queries broadcast WITH their labels, the
    * corpus scanned once, never shuffled, ranking in graft_topk
    * k-heap partials. A query whose class holds fewer than k other
    * members returns fewer rows — the honest semantics (both engines
    * agree; oracle-gated). The ANN sibling is
    * [[ivfProbeIndexFiltered]]. */
  def filteredTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"), col("label").as("q_label"))
    val scored = corpus
      .join(broadcast(q), col("vec_id") =!= col("query_id") &&
        col("label") === col("q_label"))
      .select(col("query_id"), col("vec_id"),
        call_function("graft_cosine", col("q_emb"), col("embedding")).as("cosine"))
    topKPerQuery(scored, k)
  }

  /** [[filteredTopK]] served off the materialized IVF index: the
    * partition-pruned probe OVERSAMPLES (k·f pool — the standard
    * post-filter compensation: the index knows nothing of labels, so
    * filtering after the probe thins the pool by class selectivity;
    * f should sit near 1/selectivity), labels join in from the flat
    * store (pool is |queries|·k·f rows — broadcast against the
    * column-pruned label scan), then the predicate and the final
    * top-k. Recall vs the exact filtered search floors in
    * SimilaritySpec; the deterministic comparator is shared, so a
    * pool member in the exact filtered top-k always survives. */
  def ivfProbeIndexFiltered(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, labels: DataFrame, k: Int,
      poolFactor: Int = 8, nprobe: Int = 0): DataFrame = {
    val pool = ivfProbeIndex(spark, path, queries, k * poolFactor, nprobe)
    val q = queries.select(col("vec_id").as("query_id"), col("label").as("q_label"))
    val scored = labels.select(col("vec_id"), col("label"))
      .join(broadcast(pool.select(col("query_id"), col("vec_id"), col("cosine"))),
        Seq("vec_id"))
      .join(broadcast(q), Seq("query_id"))
      .filter(col("label") === col("q_label"))
      .select(col("query_id"), col("vec_id"), col("cosine"))
    topKPerQuery(scored, k)
  }

  /** ss9: exact cosine RANGE search — every corpus vector within a
    * similarity radius of each query, the "find everything close
    * enough" complement to top-k (duplicate sweeps and recall-oriented
    * retrieval want a radius, not a count). Same plan skeleton as ss1
    * minus even the top-k aggregate state: queries broadcast, corpus
    * streams through one codegen'd scan, the radius test is a map-side
    * filter — the corpus is never shuffled and nothing is buffered.
    * Output size is data-dependent (that's the semantics); the
    * presentation sort is the only exchange. */
  def rangeSearch(corpus: DataFrame, queries: DataFrame, minCosine: Double): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    corpus.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        call_function("graft_cosine", col("q_emb"), col("embedding")).as("cosine"))
      .filter(col("cosine") >= minCosine)
      .orderBy(col("query_id"), col("vec_id"))
  }

  /** ss11: HYBRID retrieval — lexical token overlap FUSED with
    * embedding cosine, the retrieval pattern serving RAG/curation
    * stacks where neither signal alone suffices (paraphrases defeat
    * lexical match, rare entities/codes defeat dense vectors; the
    * corpus carries BOTH a text and an embedding per id, so fusion is
    * one scan). score = α·cosine + (1−α)·Jaccard(tokens) with BOTH
    * components exact — cosine via the codegen'd native expression
    * (bit-exact vs the oracle's DOUBLE[] accumulation, ss1's proof),
    * Jaccard one divide of exact set counts, fusion one shared IEEE
    * tree — so the gate hashes every score and the rank (fused DESC,
    * id ASC — graft_topk's comparator ≡ the oracle's rank window) is
    * bit-determined.
    *
    * Plan: queries broadcast WITH their token arrays, the corpus
    * streams through one map-side scoring scan, per-query k-heaps
    * (graft_topk partial aggregates) — no corpus shuffle, ss1's
    * skeleton with the lexical column riding along. The k winners
    * re-derive their component columns in a k×queries-row join
    * (trivial) so the output shows WHY a hit ranked — re-deriving
    * beats carrying both components through the heap, which would
    * double its state for presentation-only data. At 100 TB the
    * candidate-pruned path composes exactly like ss2/ss3: union the
    * ANN index probe with a token-prefix probe, exact-rescore the
    * candidate union with this same fusion expression. */
  def hybridTopK(docs: DataFrame, corpus: DataFrame, nQueries: Int, k: Int,
      alpha: Double = 0.5): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val c = hybridCorpus(docs, corpus)
    val q = hybridQueries(c, nQueries)
    val scored = fusedCols(
      c.join(broadcast(q), col("vec_id") =!= col("query_id")), alpha)
    val top = topKPerQuery(
      scored.select(col("query_id"), col("vec_id"), col("fused").as("cosine")), k)
      .withColumnRenamed("cosine", "fused")
    fusedCols(top.join(c, "vec_id").join(broadcast(q), "query_id"), alpha)
      .select(col("query_id"), col("rank"), col("vec_id"),
        col("cosine"), col("lexical"), col("fused"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** (vec_id, embedding, ws): the shared id space carrying both
    * retrieval signals — corpus vectors joined to their docs' distinct
    * token sets. */
  private def hybridCorpus(docs: DataFrame, corpus: DataFrame): DataFrame =
    corpus.select(col("vec_id"), col("embedding")).join(
      docs.select(col("doc_id").as("vec_id"),
        expr("array_distinct(regexp_extract_all(lower(text), '[a-z0-9]+', 0))").as("ws")),
      "vec_id")

  private def hybridQueries(c: DataFrame, nQueries: Int): DataFrame =
    c.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("ws").as("q_ws"))

  /** The ONE fusion tree both the exact and candidate-pruned hybrid
    * paths score with — exact cosine, exact-count Jaccard, one shared
    * IEEE fusion. */
  private def fusedCols(df: DataFrame, alpha: Double): DataFrame = df
    .withColumn("cosine", call_function("graft_cosine", col("q_emb"), col("embedding")))
    .withColumn("inter", size(array_intersect(col("q_ws"), col("ws"))).cast("double"))
    .withColumn("uni",
      (size(col("q_ws")) + size(col("ws"))).cast("double") - col("inter"))
    .withColumn("lexical",
      when(col("uni") > 0.0, col("inter") / col("uni")).otherwise(lit(0.0)))
    .withColumn("fused",
      col("cosine") * lit(alpha) + col("lexical") * lit(1.0 - alpha))

  /** The candidate-pruned hybrid path hybridTopK's scaladoc promises —
    * what actually runs at 100 TB, where scoring every (query, doc)
    * pair is off the table. Candidates = the UNION of two cheap
    * probes, one per signal: the IVF index probe (dense neighbors —
    * everything in the query's nprobe nearest cells, ss3's machinery
    * BEFORE its top-k truncation) and a token-posting probe (lexical
    * neighbors — docs sharing a RARE token with the query, df-capped
    * so function words never explode a posting list; mm7's df-cap
    * policy). Each probe only recalls what its own signal can see —
    * a paraphrase shares no tokens but lands in a nearby cell, a
    * rare-entity match sits across the embedding space but shares the
    * entity token — which is exactly why the union, not either probe
    * alone, feeds the re-score. The union is then EXACT-rescored with
    * the same [[fusedCols]] tree and ranked by the same comparator,
    * so any rank error vs the exhaustive ss11 is a pure recall
    * (candidate-miss) effect, never a scoring drift — the property
    * the spec's floor leans on.
    *
    * Scale: the dense probe touches nprobe/nlist of the corpus, the
    * lexical probe touches capped posting lists, the re-score is
    * |candidates| ≪ |corpus| fusion evaluations into the same
    * k-heaps. Candidate generation composes with the write-once
    * layouts (IVF index here; the inline postings stand in for the
    * shingle index's posting partitions). */
  def hybridProbe(spark: org.apache.spark.sql.SparkSession, docs: DataFrame,
      corpus: DataFrame, ivfPath: String, nQueries: Int, k: Int,
      alpha: Double = 0.5, nprobe: Int = 4, dfCap: Int = 64): DataFrame = {
    VectorFunctions.register(spark)
    val c = hybridCorpus(docs, corpus)
    val q = hybridQueries(c, nQueries)
    val cand = hybridCandidates(spark, c, q, corpus, ivfPath, nQueries, nprobe, dfCap)
    val scored = fusedCols(cand.join(c, "vec_id").join(broadcast(q), "query_id"), alpha)
    val top = topKPerQuery(
      scored.select(col("query_id"), col("vec_id"), col("fused").as("cosine")), k)
      .withColumnRenamed("cosine", "fused")
    fusedCols(top.join(c, "vec_id").join(broadcast(q), "query_id"), alpha)
      .select(col("query_id"), col("rank"), col("vec_id"),
        col("cosine"), col("lexical"), col("fused"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** The (query_id, vec_id) candidate union of [[hybridProbe]]'s two
    * probes — factored out so the spec can assert the PRUNING claim
    * (|candidates| ≪ queries×corpus) directly, not infer it. */
  private[graft] def hybridCandidates(spark: org.apache.spark.sql.SparkSession,
      c: DataFrame, q: DataFrame, corpus: DataFrame, ivfPath: String,
      nQueries: Int, nprobe: Int, dfCap: Int): DataFrame = {
    // dense probe: all vectors in each query's nprobe nearest cells
    val centroids = spark.read.parquet(s"$ivfPath/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1).map(_._2)
    val probed = probeLists(corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("embedding")), centroids, nprobe)
    val probedCids = probed.select("cid").distinct().collect().map(_.getInt(0))
    val dense = spark.read.parquet(s"$ivfPath/vectors")
      .filter(col("cid").isin(probedCids.toIndexedSeq: _*))
      .join(broadcast(probed.select(col("cid"), col("query_id"))), Seq("cid"))
      .select(col("query_id"), col("vec_id"))
    // lexical probe: share a token whose document frequency ≤ dfCap
    val post = c.select(col("vec_id"), explode(col("ws")).as("tok"))
    val rare = post.join(
      post.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= dfCap), "tok")
    val lex = q.select(col("query_id"), explode(col("q_ws")).as("tok"))
      .join(rare, "tok")
      .select(col("query_id"), col("vec_id"))
    dense.union(lex).distinct().filter(col("vec_id") =!= col("query_id"))
  }

  private[graft] def hybridCandidatesOf(spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame, corpus: DataFrame, ivfPath: String, nQueries: Int,
      nprobe: Int = 4, dfCap: Int = 64): DataFrame = {
    val c = hybridCorpus(docs, corpus)
    hybridCandidates(spark, c, hybridQueries(c, nQueries), corpus, ivfPath,
      nQueries, nprobe, dfCap)
  }

  /** ss12: MMR-DIVERSIFIED top-k — relevance alone returns k near-
    * duplicates of the best hit (a dense corpus's top-k IS a dup
    * cluster, dd5's observation from the other side); retrieval that
    * feeds a curation/RAG stack wants coverage, so each pick trades
    * relevance against similarity to what's already picked:
    * score(d) = relW·rel(d) − simW·max_{s∈S} cos(d, s), greedy for k
    * rounds (Maximal Marginal Relevance). relW/simW are INDEPENDENT
    * literals, not λ/(1−λ) — Scala's 1−0.7 is 0.30000000000000004
    * while an oracle writing 0.3 parses the nearest double of 0.3, a
    * guaranteed hash-gate mismatch on every score.
    *
    * Exactness: rel and every pairwise cosine ride the codegen'd
    * native expression (≡ DuckDB DOUBLE[] accumulation, ss1's proof),
    * max over sims compares doubles (no accumulation), each round's
    * score is one shared IEEE tree, argmax ties break (score DESC,
    * vec_id ASC) via max_by over struct(score, −id) ≡ the oracle's
    * rank — so the greedy TRAJECTORY, not just the final set, is
    * bit-determined and the oracle unrolls the same k stages.
    *
    * Plan: the heavy part is candidate generation — ss1's broadcast-
    * query scan into per-query m-heaps, corpus never shuffled. The
    * m×queries candidate table is localCheckpointed ONCE: the k
    * unrolled greedy rounds reference `cand` and the growing
    * `selected` across their anti-join/sim-join/argmax lineage, and
    * without the barrier each reference would re-run the corpus scan
    * (mm6's recompute lesson at plan scale). `selected` is ALSO
    * checkpointed per round (round 9 — VERDICT r8 #7): round r's
    * lineage referenced every earlier round's twice (anti-join +
    * sim-join), so the un-checkpointed plan tree grew 2^k references
    * and x1 paid ~20 s of one-time analysis/codegen on a 2^5 tree;
    * with the per-round barrier (k tiny checkpoints of O(queries×r)
    * rows) plan size is linear in k and the committed trajectory is
    * bit-identical — a checkpoint is an execution barrier, not a
    * transform. After the checkpoints every round is a hash join +
    * partial-agg'd argmax on O(queries×m) rows keyed by query_id —
    * distributed, no driver loop, k is a compile-time constant. */
  def mmrDiversify(corpus: DataFrame, nQueries: Int, m: Int, k: Int,
      relW: Double = 0.7, simW: Double = 0.3): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val base = corpus.select(col("vec_id"), col("embedding"))
    val q = base.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = base.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cosine", call_function("graft_cosine", col("q_emb"), col("embedding")))
    val cand = topKPerQuery(scored.select(col("query_id"), col("vec_id"), col("cosine")), m)
      .withColumnRenamed("cosine", "rel").drop("rank")
      .join(base, "vec_id")
      .select(col("query_id"), col("vec_id"), col("rel"), col("embedding").as("emb"))
      .localCheckpoint()
    def pick(sc: DataFrame, r: Int): DataFrame = sc
      .groupBy(col("query_id"))
      .agg(max_by(
        struct(col("vec_id"), col("rel"), col("max_sim"), col("mmr_score"), col("emb")),
        struct(col("mmr_score"), -col("vec_id"))).as("p"))
      .select(col("query_id"), lit(r).cast("long").as("mmr_rank"),
        col("p.vec_id").as("vec_id"), col("p.rel").as("rel"),
        col("p.max_sim").as("max_sim"), col("p.mmr_score").as("mmr_score"),
        col("p.emb").as("emb"))
    var selected = pick(cand
      .withColumn("max_sim", lit(0.0))
      .withColumn("mmr_score", lit(relW) * col("rel") - lit(simW) * col("max_sim")), 1)
      .localCheckpoint()
    for (r <- 2 to k) {
      val rem = cand.join(selected.select(col("query_id"), col("vec_id")),
        Seq("query_id", "vec_id"), "left_anti")
      val maxSim = rem
        .join(selected.select(col("query_id"), col("emb").as("s_emb")), "query_id")
        .withColumn("sim", call_function("graft_cosine", col("emb"), col("s_emb")))
        .groupBy(col("query_id"), col("vec_id")).agg(max(col("sim")).as("max_sim"))
      val scoredR = rem.join(maxSim, Seq("query_id", "vec_id"))
        .withColumn("mmr_score", lit(relW) * col("rel") - lit(simW) * col("max_sim"))
      // per-round barrier: linear plan growth (see scaladoc)
      selected = selected.unionByName(pick(scoredR, r)).localCheckpoint()
    }
    selected
      .select(col("query_id"), col("mmr_rank"), col("vec_id"),
        col("rel"), col("max_sim"), col("mmr_score"))
      .orderBy(col("query_id"), col("mmr_rank"))
  }

  /** (query_id, vec_id, cosine) → best-k rows per query with ranks. */
  private[graft] def topKPerQuery(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(call_function("graft_topk", col("cosine"), col("vec_id"), lit(k)).as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("vec_id"), col("col.score").as("cosine"))
      .orderBy(col("query_id"), col("rank"))

  // 4 bits × 8 tables: for a neighbor at cosine c the per-bit collision
  // rate is 1 − arccos(c)/π, so recall@c=0.3 ≈ 1−(1−0.597⁴)⁸ ≈ 0.66
  // while each query probes 8/16ths of the bucket space. Bits should
  // grow ~log₂(n/target_bucket_size) as the corpus grows — at 10⁹+
  // vectors use 16–20 bits so buckets stay executor-sized; recall is
  // then recovered by adding tables (cost is linear, independent).
  private val Bits = 4
  private val Tables = 8

  private def planeWeight(table: Int, plane: Int, dim: Int): Double = {
    var z = table.toLong * 6700417L + plane.toLong * 104729L + dim.toLong + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    z.toDouble / Long.MaxValue.toDouble
  }

  /** One plane as a single ArrayType literal — NOT an `array(64 lits)`
    * expression tree: a literal keeps the plan node count (and the
    * generated code size) constant in `dim`, where inline literals made
    * analysis + codegen explode (~2000 nodes per signature). */
  private def planeLit(dim: Int, t: Int, p: Int): Column =
    typedlit(Array.tabulate(dim)(j => planeWeight(t, p, j).toFloat))

  /** Signature column for table t over column `embCol`. */
  private def sigCol(embCol: String, dim: Int, t: Int): Column =
    (0 until Bits).map { p =>
      when(call_function("graft_dot", col(embCol), planeLit(dim, t, p)) > 0d, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  /** ss2: ANN top-k via random-hyperplane LSH: `Tables` independent
    * 8-bit signatures; candidates = corpus rows sharing any bucket with
    * the query; exact cosine re-rank inside candidates. Approximate —
    * recall depends on Tables×Bits (spec plants exact duplicates which
    * always collide). */
  // (id, t, sig) band rows → the bucket probe is a plain HASH
  // equi-join on (t, sig), not an OR-of-equalities nested-loop:
  // partitionable by key, AQE/skew-split applies, and it stays a join
  // even when the query side outgrows a broadcast.
  private def bandRows(df: DataFrame, dim: Int, idCol: String, outId: String,
      extra: Seq[String] = Nil): DataFrame = {
    val bands = (0 until Tables).map(t =>
      struct(lit(t).as("t"), sigCol("embedding", dim, t).as("sig")))
    val carried = extra.map(col)
    df.select(col(idCol).as(outId) +: carried :+ explode(array(bands: _*)).as("b"): _*)
      .select(col(outId) +: carried :+ col("b.t").as("t") :+ col("b.sig").as("sig"): _*)
  }

  def lshTopK(corpus: DataFrame, queries: DataFrame, dim: Int, k: Int): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val cb = bandRows(corpus, dim, "vec_id", "vec_id")
    val qb = bandRows(queries, dim, "vec_id", "query_id")
    val cand = cb.join(broadcast(qb), Seq("t", "sig"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct()
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = cand
      .join(corpus, "vec_id")
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("vec_id"),
        call_function("graft_cosine", col("q_emb"), col("embedding")).as("cosine"))
    topKPerQuery(scored, k)
  }

  /** bucket = table·2^Bits + signature — ONE integer partition column,
    * so a probe's pruning is a single-column `isin` over ≤ Tables·2^Bits
    * directories (the ivfProbeIndex pattern; two partition columns
    * would need OR-of-conjunction pruning). */
  private def bucketCol: Column = (col("t") * (1 << Bits) + col("sig")).as("bucket")

  /** Materialized LSH index: the corpus replicated once per hash table
    * (×Tables rows — the standard LSH space/recall trade) and written
    * PARTITIONED BY bucket. Completes the index family (IVF/PQ/IVF+PQ
    * got theirs in round 5): the signature pass over the corpus is the
    * amortized build cost, and a probe reads only the ≤ Tables
    * buckets per query instead of re-hashing the corpus per run.
    * Embeddings ride along in the bucket rows so the exact re-rank
    * needs no join back to the source table. */
  def lshWriteIndex(corpus: DataFrame, path: String, dim: Int): Unit = {
    VectorFunctions.register(corpus.sparkSession)
    bandRows(corpus, dim, "vec_id", "vec_id", Seq("embedding"))
      .select(col("vec_id"), col("embedding"), bucketCol)
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/buckets")
  }

  /** Append a delta batch to a materialized LSH index WITHOUT touching
    * the base files (round 8 — VERDICT r7 #1: every index was a
    * write-once FULL-corpus build, so any delta ingest forced a 100 TB
    * re-index; the dedup family got its delta shape in dd9/dd10, this
    * gives the index family its twin). The hyperplanes are pure
    * integer-mix functions of (table, plane, dim) — no trained state —
    * so delta signatures are computed exactly as the base's were and
    * the new bucket rows land as ADDITIONAL FILES inside the existing
    * bucket directories (dynamic-partition append). Cost is O(|delta|)
    * × Tables; probe(base ⊕ delta) is BIT-IDENTICAL to a one-shot
    * build over the union (IvfIndexSpec pins it). */
  def lshAppendDelta(delta: DataFrame, path: String, dim: Int): Unit = {
    VectorFunctions.register(delta.sparkSession)
    bandRows(delta, dim, "vec_id", "vec_id", Seq("embedding"))
      .select(col("vec_id"), col("embedding"), bucketCol)
      .write.mode("append").partitionBy("bucket").parquet(s"$path/buckets")
  }

  /** EXACTLY-ONCE [[lshAppendDelta]] — [[ivfAppendDeltaIdempotent]]'s
    * argument on the bucket-partitioned layout: signatures are pure
    * functions of the embedding, so a vector's target buckets are the
    * SAME on every delivery, and its presence in any of them proves
    * the whole batch row was committed (the append is one atomic
    * parquet job). The existence check prunes to the batch's own
    * target buckets; re-delivery of any subset appends nothing.
    * Returns the number of VECTORS (not bucket rows) appended.
    * Same contract as [[ivfAppendDeltaIdempotent]]: single writer per
    * index generation; within-batch duplicate vec_ids collapsed here
    * (per-vector, BEFORE banding — one surviving row feeds all
    * Tables band rows). */
  def lshAppendDeltaIdempotent(delta0: DataFrame, path: String, dim: Int): Long = {
    VectorFunctions.register(delta0.sparkSession)
    val spark = delta0.sparkSession
    val delta = delta0.dropDuplicates("vec_id")
    val rows = bandRows(delta, dim, "vec_id", "vec_id", Seq("embedding"))
      .select(col("vec_id"), col("embedding"), bucketCol)
    val targetBuckets = rows.select("bucket").distinct().collect().map(_.getInt(0))
    if (targetBuckets.isEmpty) return 0L
    val existing = spark.read.parquet(s"$path/buckets")
      .filter(col("bucket").isin(targetBuckets.toIndexedSeq: _*))
      .select(col("vec_id")).distinct()
    val fresh = rows.join(existing, Seq("vec_id"), "left_anti").localCheckpoint()
    val n = fresh.select("vec_id").distinct().count()
    if (n > 0)
      fresh.write.mode("append").partitionBy("bucket").parquet(s"$path/buckets")
    fresh.unpersist()
    n
  }

  /** Probe a materialized LSH index: hash ONLY the query set, prune to
    * the probed bucket directories (planning-time partition pruning,
    * like ivfProbeIndex), exact-re-rank inside candidates. Duplicate
    * candidates from multi-table collisions dedup on the scored row —
    * cosine is deterministic per pair, so `distinct` is exact and
    * avoids a second corpus join. Probe ≡ inline lshTopK is
    * spec-asserted (IvfIndexSpec). */
  def lshProbeIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, dim: Int, k: Int): DataFrame = {
    VectorFunctions.register(spark)
    val qb = bandRows(queries, dim, "vec_id", "query_id", Seq("embedding"))
      .select(col("query_id"), col("embedding").as("q_emb"), bucketCol)
    // bounded driver state: ≤ Tables·2^Bits distinct bucket ids
    val probedBuckets = qb.select("bucket").distinct().collect().map(_.getInt(0))
    val idx = spark.read.parquet(s"$path/buckets")
      .filter(col("bucket").isin(probedBuckets.toIndexedSeq: _*))
    val scored = idx.join(broadcast(qb), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        call_function("graft_cosine", col("q_emb"), col("embedding")).as("cosine"))
      .distinct()
    topKPerQuery(scored, k)
  }

  /** ss3: IVF (inverted-file) ANN. Train: `nlist` centroids — seeded
    * from the lowest vec_ids (deterministic), refined by `iters` Lloyd
    * steps, each one distributed pass (assign via broadcast centroids,
    * per-dimension mean via posexplode+groupBy). Index: one linear
    * scan tags every vector with its nearest centroid. Query: probe
    * the `nprobe` nearest lists and exact-re-rank inside them.
    *
    * Scale: centroids are the ONLY driver-side state (nlist×dim
    * floats); the index pass is embarrassingly parallel; at rest the
    * corpus would be written partitioned by `cid`, so a probe reads
    * nprobe/nlist of the data — that partition pruning is the whole
    * point of IVF at 100 TB. */
  private def centroidCosines(embCol: Column, cents: Array[Array[Float]]): Seq[Column] =
    cents.toIndexedSeq.map(c => call_function("graft_cosine", embCol, typedlit(c)))
  private def assignExpr(embCol: Column, cents: Array[Array[Float]]): Column =
    array_max(array(centroidCosines(embCol, cents).zipWithIndex.map {
      case (cos, i) => struct(cos.as("s"), lit(i).as("c"))
    }: _*)).getField("c")

  /** nlist cutoff for the nlist-wide expression-array scoring path
    * ([[assignExpr]]/[[centroidCosines]]). At or below it — every
    * oracle/bench SF resolves nlist to 16 — assignment stays the
    * original zero-shuffle expression, bit-pinned by the spec suite.
    * Above it, [[withTopCells]]'s two-level join path: a 293-wide
    * (x30) or 2M-wide (100 TB at nlist = n/512) projection of
    * per-centroid cosine sub-expressions is the wrong shape twice
    * over — Catalyst analysis/codegen cost grows with expression
    * COUNT (past the JIT method limit whole-stage codegen falls back
    * to interpreted eval), and per-row work is O(nlist), which under
    * the adaptive nlist = n/512 rule turns every build's assignment
    * pass into O(n²/512) — dd17's measured superlinear trap wearing
    * a new coat (LayoutBench curves it). */
  private[graft] val ExprCellMax = 64

  /** Coarse grouping OVER the fine centroids: ncoarse = ⌈√nlist⌉
    * centers, Lloyd-refined (3 iterations, cosine, sequential
    * fixed-order double accumulation — deterministic), seeded from
    * the first ncoarse fine centroids. Driver-side and bounded by the
    * same nlist×dim floats the centroid table already is. Returns
    * (coarse centroids, fine→coarse assignment). */
  private def coarseGroups(cents: Array[Array[Float]]): (Array[Array[Float]], Array[Int]) = {
    val nlist = cents.length
    val dim = cents(0).length
    val ncoarse = math.max(2, math.ceil(math.sqrt(nlist.toDouble)).toInt)
    def cosine(a: Array[Float], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    var gc = Array.tabulate(ncoarse)(g => cents(g).map(_.toDouble))
    val assign = new Array[Int](nlist)
    def assignAll(): Unit = {
      var i = 0
      while (i < nlist) {
        var best = 0; var bs = Double.NegativeInfinity; var g = 0
        while (g < ncoarse) {
          val s = cosine(cents(i), gc(g))
          if (s > bs) { bs = s; best = g } // strict > : ties → lowest gid
          g += 1
        }
        assign(i) = best; i += 1
      }
    }
    for (_ <- 0 until 3) {
      assignAll()
      val sums = Array.fill(ncoarse, dim)(0.0)
      val cnt = new Array[Int](ncoarse)
      var j = 0
      while (j < nlist) {
        val g = assign(j); cnt(g) += 1
        var k = 0
        while (k < dim) { sums(g)(k) += cents(j)(k).toDouble; k += 1 }
        j += 1
      }
      gc = Array.tabulate(ncoarse)(g => if (cnt(g) == 0) gc(g)
        else sums(g).map(_ / cnt(g)))
    }
    assignAll() // assignment must reflect the FINAL means
    (gc.map(_.map(_.toFloat)), assign)
  }

  /** Append `out` = the per-row top-`take` centroid cells as
    * array<struct<s double, c int>> (best-first), preserving every
    * input column. `key` must be unique per row — the index family's
    * vec_id primary-key contract. nlist ≤ [[ExprCellMax]] → the
    * original expression array (zero shuffle, bit-pinned at oracle/
    * bench SFs); above → coarse→fine two-level scoring via broadcast
    * joins + graft_topk partial aggregation: per-row work
    * O(√nlist · w) instead of O(nlist), and every shuffle carries
    * O(rows) thanks to map-side partials. The regimes may disagree on
    * exact-tie ordering (array_max ties toward the higher cid,
    * graft_topk toward the lower id) and the large path is a bounded
    * coarse beam (w groups searched — an approximation ss8's recall
    * rows gauge); each regime is deterministic, and no layout ever
    * crosses regimes, because nlist is a pure function of the corpus
    * the layout was built from — and every APPEND path re-derives
    * `cents` (hence cents.length, hence the regime) from the base
    * build's stored centroids/ parquet via readCentroids, so an
    * explicit-nlist caller (ivfWriteIndex/hnswWriteIndex) can only
    * pick the regime of a FRESH build, never mix tie conventions
    * within one standing index (ADVICE r14 #4). At 100 TB scale-out
    * this generalizes to more levels (per-row cost nlist^(1/L) per
    * level), the IMI/coarse-quantizer-tree family.
    *
    * TOTALITY (round 15 — ADVICE r14 #1/#2): the two-level path
    * returns exactly one `out` per input row, like the expression
    * path. Three guards: (a) coarse groups with zero fine members —
    * Lloyd can empty a group — are excluded from the beam (they can
    * never yield a candidate; a beam landing entirely on them dropped
    * the row through the old inner join); (b) the beam width w is
    * sized against the SMALLEST live-group occupancies so that ANY w
    * selected groups jointly hold ≥ take fine centroids — the old
    * expectation-based w could hand hnsw's __cells[1] an
    * out-of-bounds lookup and probeLists fewer than nprobe cells;
    * (c) a row whose every coarse cosine is NULL (zero-norm
    * embedding — graft_cosine's null contract) gets no candidates at
    * all, so the final join is LEFT and null results coalesce to the
    * expression path's all-null-tie output: highest cids first with
    * null scores — bit-matching what nlist ≤ ExprCellMax produces for
    * the same degenerate row. */
  private[graft] def withTopCells(df: DataFrame, key: String, embCol: String,
      take: Int, cents: Array[Array[Float]], out: String): DataFrame = {
    if (cents.length <= ExprCellMax) {
      val sc = array(centroidCosines(col(embCol), cents).zipWithIndex.map {
        case (cos, i) => struct(cos.as("s"), lit(i).as("c"))
      }: _*)
      df.withColumn(out, slice(reverse(array_sort(sc)), 1, take))
    } else {
      val spark = df.sparkSession
      VectorFunctions.register(spark)
      import spark.implicits._
      val (gcents, g4f) = coarseGroups(cents)
      // guard (a): only member-bearing groups enter the beam
      val occ = g4f.groupBy(identity).view.mapValues(_.length).toMap
      val liveGids = occ.keySet
      // coarse beam: enough groups that the fine stage sees ≥ take
      // candidates in expectation, +1 for balance slack ...
      var w = math.min(liveGids.size,
        math.max(2, (take * liveGids.size + cents.length - 1) / cents.length + 1))
      // ... then guard (b): widen until the w SMALLEST live groups
      // jointly hold ≥ take fine centroids, making the floor worst-case
      // instead of expected-case. Driver-side over ≤ ⌈√nlist⌉ ints.
      val occAsc = occ.values.toArray.sorted
      while (w < occAsc.length && occAsc.take(w).sum < take) w += 1
      val coarseDF = gcents.zipWithIndex
        .filter { case (_, g) => liveGids(g) }
        .map { case (c, g) => (g.toLong, c.toSeq) }.toIndexedSeq.toDF("gid", "gcent")
      val fineDF = cents.zipWithIndex
        .map { case (c, i) => (g4f(i).toLong, i.toLong, c.toSeq) }.toIndexedSeq
        .toDF("gid", "cid_l", "fcent")
      val cand = df.select(col(key), col(embCol))
        .crossJoin(broadcast(coarseDF))
        .groupBy(col(key))
        .agg(
          call_function("graft_topk",
            call_function("graft_cosine", col(embCol), col("gcent")),
            col("gid"), lit(w)).as("gtk"),
          // key is unique ⇒ every row in the group carries the SAME
          // embedding ⇒ first() is deterministic
          first(col(embCol)).as("__emb"))
        .select(col(key), col("__emb"),
          explode(expr("transform(gtk, x -> x.id)")).as("gid"))
      val cells = cand.join(broadcast(fineDF), "gid")
        .groupBy(col(key))
        .agg(call_function("graft_topk",
          call_function("graft_cosine", col("__emb"), col("fcent")),
          col("cid_l"), lit(take)).as("tk"))
        .select(col(key),
          expr("transform(tk, x -> struct(x.score as s, cast(x.id as int) as c))").as(out))
      // guard (c): LEFT join + the expression path's all-null-tie
      // fallback, so a zero-norm row keeps a deterministic cell list
      // instead of vanishing from the build (the r14 inner join
      // silently dropped it)
      val fallback = expr(
        s"transform(sequence(${cents.length - 1}, ${math.max(cents.length - take, 0)}, -1), " +
          "c -> struct(CAST(NULL AS DOUBLE) AS s, CAST(c AS INT) AS c))")
      df.join(cells, Seq(key), "left")
        .withColumn(out, coalesce(col(out), fallback))
    }
  }

  /** [[assignExpr]]'s scale-safe form for build/append call sites:
    * appends `cid` (int, the best cell), preserving all columns. `df`
    * must carry a unique `vec_id`. */
  private[graft] def withCid(df: DataFrame, embCol: String,
      cents: Array[Array[Float]]): DataFrame =
    if (cents.length <= ExprCellMax)
      df.withColumn("cid", assignExpr(col(embCol), cents))
    else
      withTopCells(df, "vec_id", embCol, 1, cents, "__cells")
        .withColumn("cid", expr("__cells[0].c")).drop("__cells")

  /** Lloyd-refined centroids — the only driver-side state (nlist×dim
    * floats). Seeded from the lowest vec_ids (deterministic); each
    * iteration is one distributed pass. Means accumulate in
    * DECIMAL(18,6) / exact count (round 9 — trainPq's convention,
    * retrofitted): a plain fp avg() merges partials in shuffle-fetch
    * order, so two trainings over the SAME vector set could disagree
    * in the last ulp and flip borderline assignments — which would
    * break ivfRecluster's recluster ≡ fresh-full-build contract. With
    * order-independent decimal sums the centroids are a pure function
    * of the vector SET, whatever partitioning delivered it. */
  private[graft] def trainCentroids(corpus: DataFrame, nlist: Int, iters: Int): Array[Array[Float]] = {
    VectorFunctions.register(corpus.sparkSession)
    var centroids: Array[Array[Float]] = corpus.orderBy(col("vec_id")).limit(nlist)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    for (_ <- 0 until iters) {
      val assigned = withCid(corpus.select(col("vec_id"), col("embedding")),
          "embedding", centroids)
        .select(col("cid"), posexplode(col("embedding")))
      val means = assigned.groupBy(col("cid"), col("pos"))
        .agg((sum(col("col").cast("double").cast(DecimalType(18, 6))).cast("double") /
          count(lit(1))).as("v"))
        .groupBy(col("cid"))
        .agg(collect_list(struct(col("pos"), col("v"))).as("pv"))
        .select(col("cid"),
          expr("transform(array_sort(pv, (a, b) -> a.pos - b.pos), x -> cast(x.v as float))").as("cent"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Float](1).toArray).toMap
      centroids = Array.tabulate(centroids.length)(i => means.getOrElse(i, centroids(i)))
    }
    centroids
  }

  /** Per-query probe list: the `nprobe` best centroids by cosine
    * (exact below [[ExprCellMax]], coarse-beam two-level above — the
    * probe-list selection cost must not grow linearly with nlist any
    * more than the build's assignment may). */
  private def probeLists(queries: DataFrame, cents: Array[Array[Float]], nprobe: Int): DataFrame =
    withTopCells(
        queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb")),
        "query_id", "q_emb", nprobe, cents, "__cells")
      .select(col("query_id"), col("q_emb"),
        explode(expr("transform(__cells, x -> x.c)")).as("cid"))

  def ivfTopK(corpus: DataFrame, queries: DataFrame, dim: Int, k: Int,
      nlist: Int = 16, nprobe: Int = 4, iters: Int = 2): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val centroids = trainCentroids(corpus, nlist, iters)
    val indexed = withCid(corpus, "embedding", centroids)
    val probed = probeLists(queries, centroids, nprobe)
    val scored = indexed.join(broadcast(probed), Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        call_function("graft_cosine", col("q_emb"), col("embedding")).as("cosine"))
    topKPerQuery(scored, k)
  }

  /** Materialized IVF index: the corpus written to `path` PARTITIONED
    * BY its centroid assignment, centroids alongside as a tiny parquet.
    * This is the at-rest layout the ivfTopK scaladoc promises — at
    * 100 TB the index write is one linear pass, and every probe after
    * it touches only nprobe/nlist of the files on disk. */
  def ivfWriteIndex(corpus: DataFrame, path: String,
      nlist: Int = 16, iters: Int = 2,
      centroidsOpt: Option[Array[Array[Float]]] = None): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = centroidsOpt.getOrElse(trainCentroids(corpus, nlist, iters))
    withCid(corpus, "embedding", centroids)
      .write.mode("overwrite").partitionBy("cid").parquet(s"$path/vectors")
    centroids.zipWithIndex.toIndexedSeq
      .map { case (c, i) => (i, c.toSeq) }
      .toDF("cid", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
  }

  private[graft] def readCentroids(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Array[Float]] =
    spark.read.parquet(path)
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1).map(_._2)

  /** Append a delta batch to a materialized IVF index: delta vectors
    * are assigned to the EXISTING centroids (the index's trained state,
    * re-loaded as bounded driver memory) and appended as new files into
    * the cid partition directories — base files untouched, cost
    * O(|delta| × nlist × dim). This is the production nightly shape:
    * re-running Lloyd per ingest would be an O(corpus) job to relearn
    * what one broadcast literal already encodes. Probing the appended
    * index ≡ probing a one-shot index over the union built with the
    * SAME centroids (IvfIndexSpec pins it — assignment is a pure
    * per-row function of the centroid literal). The knowingly-accepted
    * drift: appended mass shifts list BALANCE away from the training
    * distribution, degrading recall at fixed nprobe, never correctness
    * of what's probed — ss8's `ivf_delta` recall row is the gauge that
    * says when to re-cluster (re-run the full build). */
  def ivfAppendDelta(delta: DataFrame, path: String): Unit = {
    VectorFunctions.register(delta.sparkSession)
    val centroids = readCentroids(delta.sparkSession, s"$path/centroids")
    withCid(delta, "embedding", centroids)
      .write.mode("append").partitionBy("cid").parquet(s"$path/vectors")
  }

  /** EXACTLY-ONCE [[ivfAppendDelta]] for AT-LEAST-ONCE callers
    * (round 11 — st17's streaming ingest; equally the crashed-and-
    * rerun nightly job): before appending, the delta anti-joins
    * against the vec_ids already present in PRECISELY the cid
    * partitions this batch would write into — the existence check is
    * planning-time partition-pruned, so it reads a slice of the index
    * proportional to the batch's cid spread, never the corpus. A
    * re-delivery of any subset of the batch therefore appends nothing:
    * appends are idempotent keyed on vec_id, the index's primary key
    * (re-ingesting a CHANGED row under an existing vec_id is an upsert,
    * which is the rebuild/recluster path's job, not an append's).
    * Crash window: the parquet job commit is all-or-nothing per attempt,
    * so a retry sees either none or all of the previous attempt's rows
    * — both resolve correctly through the anti-join. Returns the
    * number of rows actually appended.
    *
    * CONTRACT (round 12 — VERDICT r11 #5 / ADVICE r11): (a)
    * SINGLE-WRITER per index generation. The existence probe is
    * check-then-write with no lock: two CONCURRENT writers carrying
    * the same vec_id can both pass the check and both append. One
    * streaming query or one nightly job per index is the supported
    * shape (sequential batches from one writer — including interleaved
    * replays — are exactly what the anti-join closes; IvfIndexSpec
    * replays them). Concurrent multi-writer ingest needs a
    * coordination layer above this function. (b) Duplicate vec_ids
    * WITHIN one batch are collapsed here (dropDuplicates on the key)
    * before the existence check — the disk anti-join alone can't see
    * them (ADVICE r11: an upstream that coalesces redeliveries into
    * one batch would otherwise write duplicate rows). Redelivered
    * rows are byte-identical by the at-least-once contract, so which
    * physical duplicate survives is unobservable; re-ingesting a
    * CHANGED payload under an existing vec_id remains upsert
    * territory, i.e. the rebuild/recluster path's job. */
  def ivfAppendDeltaIdempotent(delta0: DataFrame, path: String): Long = {
    VectorFunctions.register(delta0.sparkSession)
    val spark = delta0.sparkSession
    val delta = delta0.dropDuplicates("vec_id")
    val centroids = readCentroids(spark, s"$path/centroids")
    // ALL delta columns ride along, exactly as the plain append writes
    // them — dropping e.g. `label` here would silently thin the index
    // schema for downstream consumers like clusterStats
    val assigned = withCid(delta, "embedding", centroids)
    val targetCids = assigned.select("cid").distinct().collect().map(_.getInt(0))
    if (targetCids.isEmpty) return 0L
    val existing = spark.read.parquet(s"$path/vectors")
      .filter(col("cid").isin(targetCids.toIndexedSeq: _*))
      .select(col("vec_id"))
    val fresh = assigned.join(existing, Seq("vec_id"), "left_anti")
      .localCheckpoint() // one evaluation serves the count AND the write
    val n = fresh.count()
    if (n > 0)
      fresh.write.mode("append").partitionBy("cid").parquet(s"$path/vectors")
    fresh.unpersist()
    n
  }

  /** RE-CLUSTER a delta-appended IVF index (round 9 — VERDICT r8 #2:
    * ss8's `ivf_delta` recall row, ss13's imbalance factor and ss14's
    * nprobe curve tell a user WHEN appended drift warrants
    * re-clustering; this is the ACT that loop was missing). Lloyd
    * retrains over EVERYTHING the index currently holds — base ⊕ all
    * appended deltas, read off the vectors/ partition dirs — and a
    * fresh full build publishes at `newPath` as a NEW layout
    * generation (callers wrap it in Tables.publishLayout; the
    * superseded generation is layoutVacuum's to reclaim). Cost is a
    * full re-train + one re-partitioned rewrite of the index — the
    * amortized event the nightly appends defer, paid only when the
    * recall/imbalance gauges say so.
    *
    * Equivalence contract (spec-pinned): with [[trainCentroids]]'s
    * order-independent decimal means, the retrained centroids are a
    * pure function of the vector SET, so reclustering the appended
    * index is BIT-IDENTICAL — centroids, cid dirs, probe output — to
    * a one-shot [[ivfWriteIndex]] over the union corpus: the append
    * history leaves no trace.
    *
    * GEOMETRY IS READ FROM THE SOURCE INDEX (round 10 — ADVICE r9):
    * `nlist` is the length of the stored centroids table, never a
    * parameter — a recluster that silently rebuilt a 64-list index
    * with a default 16 would keep the contract's words and break its
    * meaning (a differently-shaped index is not "the same index,
    * re-trained"). Only `iters` is caller-tunable; bit-equality with
    * a fresh full build then needs the same iters on both sides,
    * which is the fresh build's own default. */
  def ivfRecluster(spark: org.apache.spark.sql.SparkSession, oldPath: String,
      newPath: String, iters: Int = 2): Unit = {
    val nlist = readCentroids(spark, s"$oldPath/centroids").length
    val corpus = spark.read.parquet(s"$oldPath/vectors")
      .select(col("vec_id"), col("embedding"))
    ivfWriteIndex(corpus, newPath, nlist, iters)
  }

  /** ss15 (round 9): CENTROID DRIFT — the DECIDE gauge between ss8's
    * recall rows (observe) and [[ivfRecluster]] (act): per inverted
    * list, the Euclidean displacement between the index's TRAINED
    * centroid and the CURRENT member mean. A freshly trained list
    * sits near its mass (Lloyd's fixed point); appended mass the
    * trainer never saw drags the true mean away while the stored
    * centroid stays frozen — drift is that gap in embedding units,
    * the per-list early warning that fires BEFORE recall visibly
    * degrades (recall needs a query workload to measure; drift needs
    * only the index itself, so nightly maintenance can threshold it).
    *
    * Determinism (rows-gated): per-(cid, pos) means accumulate in
    * order-independent DECIMAL(18,6) sums (trainCentroids' recipe) and
    * string-hop to double for ONE divide; the squared-difference fold
    * runs left-to-right over the pos-sorted mean array against the
    * stored centroid literal — a fixed IEEE evaluation order, so the
    * drift value is identical run-to-run and spec-pinnable (exact 0.0
    * on a corpus of centroid copies, > 0 after a shifted append).
    *
    * Scale: one partial-agg'd pass over the index's vectors/ to
    * nlist×dim rows; the fold and join ride the tiny aggregate with
    * the centroid table broadcast — O(index) scan, O(nlist) output. */
  def centroidDrift(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val cents = readCentroids(spark, s"$path/centroids")
    val cdf = cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      .toSeq.toDF("cid", "centroid")
    spark.read.parquet(s"$path/vectors")
      .select(col("cid"), posexplode(col("embedding")))
      .groupBy(col("cid"), col("pos"))
      .agg(count(lit(1)).as("n"),
        sum(col("col").cast("double").cast(DecimalType(18, 6))).as("sdec"))
      .selectExpr("cid", "pos", "n",
        "cast(cast(sdec as string) as double) / n as m")
      .groupBy(col("cid"))
      .agg(max(col("n")).as("n_vecs"),
        expr("transform(array_sort(collect_list(struct(pos, m)), " +
          "(a, b) -> a.pos - b.pos), x -> x.m)").as("mean"))
      .join(broadcast(cdf), "cid")
      .withColumn("drift2", expr(
        "aggregate(zip_with(mean, centroid, (a, b) -> " +
          "(a - cast(b as double)) * (a - cast(b as double))), " +
          "cast(0.0 as double), (acc, v) -> acc + v)"))
      .select(col("cid"), col("n_vecs"), sqrt(col("drift2")).as("drift"))
      .orderBy(col("cid"))
  }

  /** Probe a materialized IVF index. The `cid` filter lands on the
    * PARTITION column of the index layout, so Spark prunes non-probed
    * directories at planning time — the scan never opens them
    * (IvfIndexSpec asserts the pruned plan). `nprobe = 0` (the
    * default) derives max(4, nlist/4) from the index's own stored
    * geometry — the tuned nprobe/nlist FRACTION stays put as builds
    * scale nlist with the corpus (round 14 — VERDICT r13 #5), which
    * preserves the pinned recall floors; the probe therefore reads
    * ~nlist/4 cells of ~512 vectors ≈ a quarter of the corpus. A
    * production deployment trades that fraction down against ss14's
    * recall-vs-nprobe curve (pass an explicit constant nprobe to
    * probe a constant ~nprobe×512 vectors at any corpus size). */
  def ivfProbeIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, k: Int, nprobe: Int = 0): DataFrame = {
    VectorFunctions.register(spark)
    val centroids = spark.read.parquet(s"$path/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1).map(_._2)
    val np = if (nprobe > 0) nprobe else math.max(4, centroids.length / 4)
    val probed = probeLists(queries, centroids, np)
    val probedCids = probed.select("cid").distinct().collect().map(_.getInt(0))
    val indexed = spark.read.parquet(s"$path/vectors")
      .filter(col("cid").isin(probedCids.toIndexedSeq: _*))
    val scored = indexed.join(broadcast(probed), Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        call_function("graft_cosine", col("q_emb"), col("embedding")).as("cosine"))
    topKPerQuery(scored, k)
  }

  /** ss8: recall@k of every ANN variant against ss1's exact answer —
    * the metric a user watches while tuning nprobe/bits/tables/m
    * against their own corpus. Output: (variant, query_id, recall)
    * with recall = |ANN top-k ∩ exact top-k| / k per query.
    *
    * Everything here is deterministic (exact ties broken, Lloyd
    * training DECIMAL-pinned, hyperplanes derived from integer mixes),
    * so the rows are stable run-to-run and the spec can pin floors.
    * Cost = one exact pass + one pass per variant — this is the
    * OFFLINE evaluation query run on a sampled query set, not a
    * serving path; the exact side is computed once and reused across
    * variants (cached: queries×k rows, driver-bounded). */
  def annRecall(corpus: DataFrame, queries: DataFrame, dim: Int, k: Int): DataFrame =
    annRecallOf(corpus, queries, k, Seq(
      "ss2_lsh"   -> lshTopK(corpus, queries, dim, k),
      "ss3_ivf"   -> ivfTopK(corpus, queries, dim, k),
      "ss5_pq"    -> pqTopK(corpus, queries, dim, k),
      "ss7_ivfpq" -> ivfPqTopK(corpus, queries, dim, k)))

  /** [[annRecall]] over caller-supplied (name, top-k result) variants —
    * lets the evaluation run against materialized-index probe plans
    * instead of retraining every variant in-query. */
  def annRecallOf(corpus: DataFrame, queries: DataFrame, k: Int,
      variants: Seq[(String, DataFrame)]): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val exact = bruteForceTopK(corpus, queries, k)
      .select(col("query_id"), col("vec_id")).cache()
    variants.map { case (name, ann) =>
      val hits = ann.select(col("query_id"), col("vec_id"))
        .join(exact, Seq("query_id", "vec_id"), "left_semi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
      queries.select(col("vec_id").as("query_id"))
        .join(hits, Seq("query_id"), "left")
        .select(lit(name).as("variant"), col("query_id"),
          (coalesce(col("n_hits"), lit(0L)).cast("double") / k).as("recall"))
    }.reduce(_ union _).orderBy(col("variant"), col("query_id"))
  }

  // ------------------------------------------------ ss17: HNSW-lite
  // Graph ANN (round 13 — VERDICT r12 #7): the industry-default
  // navigable-neighbor-graph family (HNSW — Malkov & Yashunin 2016,
  // arXiv:1603.09320), re-expressed for Spark's execution model.
  // True HNSW inserts sequentially and greedy-walks one query at a
  // time — both driver-hostile — so this is the batch-native variant:
  //
  //  BUILD: cell-block the corpus with the IVF trainer's centroids
  //  (candidate generation bounded per cell, never all-pairs — the
  //  dd17/IVF boundary: nlist GROWS with the corpus so cells stay
  //  executor-sized; the registry build passes nlist = max(16,
  //  ⌈n/512⌉), dd17's adaptive rule — a fixed cell count makes the
  //  per-cell self-join Σ n_c² = O(n²/nlist), the measured
  //  superlinear trap), then per node keep the top-M exact neighbors
  //  among its OWN cell's members plus its SECOND-closest cell's
  //  members — the bridge edges that let a walk cross cell borders,
  //  which fixed-nprobe IVF structurally cannot. Entry points: the
  //  member closest to each centroid (hubs/, nlist rows).
  //
  //  LAYOUT (v4 — round 14): emb/ holds (vec_id, embedding, cid1)
  //  with EXACTLY one row per node by construction (builds write all
  //  nodes, appends write only delta nodes — reverse-edge patches
  //  never touch it), so the probe's embedding lookups and the
  //  append's standing-member scan need no corpus-wide dedup; graph/
  //  holds (vec_id, cid1, neighbors) edge rows only — patch rows
  //  carry no embedding bytes; meta/ records the base build's node
  //  count, the denominator of hnswDrift's delta-mass gauge.
  //
  //  SEARCH: best-first BEAM search, all queries simultaneously —
  //  score the nlist hubs, then `rounds` iterations of one
  //  neighbor-list equi-join + one embedding equi-join + a top-beam
  //  fold; every visited candidate keeps its exact cosine, final
  //  top-k over the visited set. Rounds are fixed (diameter of the
  //  hub→neighbor graph is ~2-3 by construction), so the plan is a
  //  bounded chain of equi-joins — no per-query driver walk.
  //
  // Deterministic end to end (DECIMAL-pinned Lloyd, graft_topk's
  // (score, id) comparator), so the recall floor and probe rows are
  // spec-pinnable like every ANN sibling.
  private[graft] val HnswDegree = 12  // neighbors kept per node
  private[graft] val HnswBeam = 8
  private[graft] val HnswRounds = 3

  def hnswWriteIndex(corpus: DataFrame, path: String,
      nlist: Int = 16, iters: Int = 2): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    VectorFunctions.register(spark)
    val cents = trainCentroids(corpus, nlist, iters)
    // (vec_id, embedding, cid1, s1, cid2): primary + secondary cell
    val top2 = withTopCells(corpus.select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", 2, cents, "__cells")
      .select(col("vec_id"), col("embedding"),
        expr("__cells[0].c").as("cid1"), expr("__cells[0].s").as("s1"),
        expr("__cells[1].c").as("cid2"))
      .localCheckpoint() // three consumers below; the cell-scoring
                         // pass must not re-evaluate per consumer
    // candidate pairs: node × members of its primary AND secondary cell
    val members = top2.select(col("cid1").as("cell"),
      col("vec_id").as("nbr_id"), col("embedding").as("nbr_emb"))
    val probes = top2.select(col("vec_id"), col("embedding"), explode(
      array(col("cid1"), col("cid2"))).as("cell"))
    val neighbors = probes.join(members, "cell")
      .filter(col("vec_id") =!= col("nbr_id"))
      .select(col("vec_id"),
        call_function("graft_cosine", col("embedding"), col("nbr_emb")).as("cosine"),
        col("nbr_id"))
      .groupBy(col("vec_id"))
      .agg(call_function("graft_topk", col("cosine"), col("nbr_id"),
        lit(HnswDegree)).as("tk"))
      .select(col("vec_id"),
        expr("array_distinct(transform(tk, x -> x.id))").as("neighbors"))
    // emb/: the one-row-per-node embedding store (cid1 rides along:
    // hnswAppendDelta prunes its standing-member scan to the delta's
    // cells through it)
    top2.select(col("vec_id"), col("embedding"), col("cid1"))
      .write.mode("overwrite").parquet(s"$path/emb")
    top2.select(col("vec_id"), col("cid1"))
      .join(neighbors, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid1"),
        coalesce(col("neighbors"), expr("CAST(array() AS array<bigint>)")).as("neighbors"))
      .write.mode("overwrite").parquet(s"$path/graph")
    Seq(Tuple1(top2.count())).toDF("base_n")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    cents.zipWithIndex.toIndexedSeq
      .map { case (c, i) => (i, c.toSeq) }
      .toDF("cid", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    // entry points: per cell the member closest to its centroid
    // (ties → lowest vec_id)
    top2.groupBy(col("cid1"))
      .agg(max_by(struct(col("vec_id"), col("embedding")),
        struct(col("s1"), (-col("vec_id")).as("t"))).as("h"))
      .select(col("cid1").as("cid"), col("h.vec_id").as("vec_id"),
        col("h.embedding").as("embedding"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/hubs")
  }

  /** Append a delta batch to a materialized HNSW-lite index WITHOUT
    * rebuilding the base — the ANN family's nightly shape: delta
    * nodes are assigned to the FROZEN centroids, get exact top-degree
    * neighbor lists among their two cells' members (standing members
    * read off emb/'s cid1 column — one row per node BY CONSTRUCTION,
    * never the whole corpus re-paired; ADVICE r13: reading graph/
    * here made every reverse-edge patch row a phantom extra member on
    * the second+ append, feeding duplicate candidates into graft_topk,
    * which does not dedup ids), and are appended as new rows.
    * Because standing neighbor lists are frozen, reachability comes
    * from REVERSE-EDGE PATCH ROWS: each (delta → standing-neighbor)
    * edge appends a (standing id, [delta id]) row, and the probe's
    * neighbor join unions all rows per node — so a walk through a
    * standing node discovers its delta arrivals. The knowingly-
    * accepted drift (ivf_delta's argument): standing lists don't
    * re-rank against the delta, so graph quality decays with appended
    * mass until a rebuild — recall floor after append is spec-pinned
    * (SimilaritySpec), [[hnswDrift]] is the gauge that says when.
    * Hubs stay frozen (entry points, not answers). */
  def hnswAppendDelta(delta: DataFrame, path: String): Unit = {
    val spark = delta.sparkSession
    VectorFunctions.register(spark)
    val cents = readCentroids(spark, s"$path/centroids")
    val top2 = withTopCells(delta.select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", 2, cents, "__cells")
      .select(col("vec_id"), col("embedding"),
        expr("__cells[0].c").as("cid1"), expr("__cells[1].c").as("cid2"))
      .localCheckpoint()
    val standing = spark.read.parquet(s"$path/emb")
      .select(col("cid1").as("cell"), col("vec_id").as("nbr_id"),
        col("embedding").as("nbr_emb"))
    val deltaMembers = top2.select(col("cid1").as("cell"),
      col("vec_id").as("nbr_id"), col("embedding").as("nbr_emb"))
    val probes = top2.select(col("vec_id"), col("embedding"),
      explode(array(col("cid1"), col("cid2"))).as("cell"))
    val best = probes.join(standing.unionByName(deltaMembers), "cell")
      .filter(col("vec_id") =!= col("nbr_id"))
      .select(col("vec_id"),
        call_function("graft_cosine", col("embedding"), col("nbr_emb")).as("cosine"),
        col("nbr_id"))
      .groupBy(col("vec_id"))
      .agg(call_function("graft_topk", col("cosine"), col("nbr_id"),
        lit(HnswDegree)).as("tk"))
      .select(col("vec_id"),
        expr("array_distinct(transform(tk, x -> x.id))").as("neighbors"))
      .localCheckpoint() // three writes below must not re-run the cell join
    top2.select(col("vec_id"), col("embedding"), col("cid1"))
      .write.mode("append").parquet(s"$path/emb")
    top2.select(col("vec_id"), col("cid1"))
      .join(best, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid1"),
        coalesce(col("neighbors"), expr("CAST(array() AS array<bigint>)")).as("neighbors"))
      .write.mode("append").parquet(s"$path/graph")
    // reverse-edge patches: every chosen neighbor learns the delta id —
    // edge rows only (8 B/id, no embedding bytes); emb/ (delta rows
    // just appended, so delta→delta edges resolve too) supplies each
    // target's cid1; collect_set + sort for a deterministic layout
    val allNodes = spark.read.parquet(s"$path/emb")
      .select(col("vec_id").as("nbr"), col("cid1").as("nbr_cid"))
    best.select(col("vec_id").as("delta_id"), explode(col("neighbors")).as("nbr"))
      .join(allNodes, "nbr")
      .groupBy(col("nbr"), col("nbr_cid"))
      .agg(array_sort(collect_set(col("delta_id"))).as("neighbors"))
      .select(col("nbr").as("vec_id"), col("nbr_cid").as("cid1"), col("neighbors"))
      .write.mode("append").parquet(s"$path/graph")
  }

  def hnswProbeIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, k: Int,
      beam: Int = HnswBeam, rounds: Int = HnswRounds): DataFrame = {
    VectorFunctions.register(spark)
    // multiple graph/ rows per vec_id are legal after appends (delta
    // rows + reverse-edge patches, until hnswCycle merges them): the
    // neighbor join UNIONS the lists per node; embeddings come off
    // emb/, one row per node by construction — no corpus-wide dedup
    // in the beam loop (VERDICT r13 #2: the old per-round
    // dropDuplicates was 3 corpus-sized shuffles per query batch)
    val graph = spark.read.parquet(s"$path/graph")
    val embs = spark.read.parquet(s"$path/emb")
      .select(col("vec_id"), col("embedding"))
    val hubs = spark.read.parquet(s"$path/hubs")
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    def topBeam(scored: DataFrame): DataFrame = scored
      .groupBy(col("query_id"))
      .agg(call_function("graft_topk", col("cosine"), col("vec_id"), lit(beam)).as("tk"))
      .select(col("query_id"), explode(expr("transform(tk, x -> x.id)")).as("vec_id"))
    // round 0: every hub scored per query (nlist × |queries| rows)
    var visited = hubs.join(broadcast(q))
      .select(col("query_id"), col("vec_id"),
        call_function("graft_cosine", col("q_emb"), col("embedding")).as("cosine"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val frontier = topBeam(visited)
      val cands = frontier
        .join(graph.select(col("vec_id"), col("neighbors")), "vec_id")
        .select(col("query_id"), explode(col("neighbors")).as("vec_id"))
        .distinct()
        // only NEW candidates are scored; already-visited keep their row
        .join(visited.select(col("query_id"), col("vec_id")),
          Seq("query_id", "vec_id"), "left_anti")
      val scoredNew = cands
        .join(embs, "vec_id")
        .join(broadcast(q), "query_id")
        .select(col("query_id"), col("vec_id"),
          call_function("graft_cosine", col("q_emb"), col("embedding")).as("cosine"))
      // one barrier per round: the next frontier and the next round's
      // anti-join both read the accumulated set (dd6's lineage rule)
      visited = visited.unionByName(scoredNew).localCheckpoint()
    }
    topKPerQuery(visited.filter(col("vec_id") =!= col("query_id")), k)
  }

  /** HNSW graph-health gauge (round 14 — VERDICT r13 #4): ss15/ss16's
    * sibling for the graph index. ivf has centroid drift and pq has
    * residual drift; the hnsw decay mode is different — standing
    * neighbor lists are FROZEN, so appended mass degrades graph
    * quality invisibly. Two observables fall out of the layout itself,
    * one aggregate over graph/ + the meta/ base count:
    *
    *  - patch_row_share: reverse-edge patch rows per node
    *    ((rows − nodes) / nodes) — probe-side overhead that
    *    [[graft.Maintenance.hnswCycle]]'s patch merge RESETS;
    *  - delta_mass_frac: fraction of nodes the base build never
    *    ranked ((nodes − base_n) / nodes) — the quality decay only a
    *    REBUILD resets (frozen lists never re-rank, so unlike
    *    ivfRecluster there is no cheap re-train arm; the cycle's
    *    decide arm raises a rebuild alert — ss16's argument).
    *
    * Exact integer counts, two IEEE divides — deterministic, so the
    * spec pins 0.0 on a fresh build and exact fractions after an
    * append. */
  def hnswDrift(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val baseN = spark.read.parquet(s"$path/meta").head().getLong(0)
    spark.read.parquet(s"$path/graph")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("vec_id")).as("n_nodes"))
      .select(col("n_nodes"), col("n_rows"), lit(baseN).as("base_n"),
        ((col("n_rows") - col("n_nodes")).cast("double") / col("n_nodes"))
          .as("patch_row_share"),
        ((col("n_nodes") - lit(baseN)).cast("double") / col("n_nodes"))
          .as("delta_mass_frac"))
  }

  // ---------------------------------------------------------- ss5: PQ
  /** Product quantization — the memory-bounded ANN path at 100 TB. The
    * vector is split into `m` subspaces; each subspace gets its own
    * `ksub`-centroid codebook (Lloyd, L2); a vector is stored as `m`
    * small codes (m=8, ksub=16 → 8 codes ≤ 8 bytes, a 32× compression
    * of a 64-float embedding). Query time reconstructs each corpus
    * vector from its codes IN-FLIGHT (asymmetric distance: exact query
    * vs quantized corpus) and scores it with the native cosine — the
    * scan streams 8-byte codes off disk, never the raw vectors.
    *
    * Scale: codebooks are the only driver state (m×ksub×subDim floats);
    * training is `iters` distributed passes over subvector rows (one
    * broadcast hash join per pass, partial-agg'd means); encoding is
    * one linear pass. Lloyd means accumulate in DECIMAL(18,6), so
    * training — and therefore the codebook and every code — is
    * bit-deterministic under partition reordering (plain fp avg would
    * make codes flicker between runs for borderline vectors). */
  private def subVectorRows(corpus: DataFrame, dim: Int, m: Int): DataFrame = {
    val subDim = dim / m
    val subs = (0 until m).map(s =>
      struct(lit(s).as("s"), slice(col("embedding"), s * subDim + 1, subDim).as("sub")))
    corpus.select(col("vec_id"), explode(array(subs: _*)).as("b"))
      .select(col("vec_id"), col("b.s").as("s"), col("b.sub").as("sub"))
  }

  /** (s, c, cent, cnorm) codebook rows as a broadcastable DF. */
  private def codebookDF(corpus: DataFrame, cents: Array[Array[Array[Float]]]): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    cents.zipWithIndex.flatMap { case (cs, s) =>
      cs.zipWithIndex.map { case (cent, c) =>
        (s, c, cent.toSeq, cent.map(x => x.toDouble * x).sum)
      }
    }.toIndexedSeq.toDF("s", "c", "cent", "cnorm")
  }

  /** Per-(vector, subspace) nearest codebook entry by L2 — computed as
    * argmax of dot(sub,cent) − |cent|²/2 (equivalent, one fused pass);
    * ties break toward the lower code. Carries `sub` through max_by so
    * the Lloyd update needs no rejoin. */
  private def assignSubs(subs: DataFrame, cb: DataFrame): DataFrame =
    subs.join(broadcast(cb), "s")
      .withColumn("score",
        call_function("graft_dot", col("sub"), col("cent")) - col("cnorm") / 2d)
      .groupBy(col("vec_id"), col("s"))
      .agg(max_by(struct(col("c"), col("sub")),
        struct(col("score"), (-col("c")).cast("double"))).as("v"))
      .select(col("vec_id"), col("s"), col("v.c").as("c"), col("v.sub").as("sub"))

  private[graft] def trainPq(corpus: DataFrame, dim: Int, m: Int,
      ksub: Int, iters: Int): Array[Array[Array[Float]]] = {
    VectorFunctions.register(corpus.sparkSession)
    val subDim = dim / m
    // deterministic seed: the lowest-vec_id rows, sliced per subspace.
    // A corpus smaller than ksub degrades to fewer centroids instead of
    // crashing the Lloyd refresh fallback with an out-of-bounds lookup.
    var cents: Array[Array[Array[Float]]] = {
      val seed = corpus.orderBy(col("vec_id")).limit(ksub)
        .select(col("embedding")).collect().map(_.getSeq[Float](0).toArray)
      require(seed.nonEmpty, "trainPq: corpus is empty")
      Array.tabulate(m)(s => seed.map(_.slice(s * subDim, (s + 1) * subDim)))
    }
    val ksubEff = cents(0).length
    val subs = subVectorRows(corpus, dim, m)
    for (_ <- 0 until iters) {
      val means = assignSubs(subs, codebookDF(corpus, cents))
        .select(col("s"), col("c"), posexplode(col("sub")))
        .groupBy(col("s"), col("c"), col("pos"))
        .agg((sum(col("col").cast("double").cast(DecimalType(18, 6))).cast("double") /
          count(lit(1))).as("v"))
        .groupBy(col("s"), col("c"))
        .agg(collect_list(struct(col("pos"), col("v"))).as("pv"))
        .select(col("s"), col("c"),
          expr("transform(array_sort(pv, (a, b) -> a.pos - b.pos), x -> cast(x.v as float))").as("cent"))
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Float](2).toArray).toMap
      cents = Array.tabulate(m)(s =>
        Array.tabulate(ksubEff)(c => means.getOrElse((s, c), cents(s)(c))))
    }
    cents
  }

  /** (vec_id, codes: array<int>) — the at-rest PQ index rows. */
  private[graft] def pqEncode(corpus: DataFrame, dim: Int, m: Int,
      cents: Array[Array[Array[Float]]]): DataFrame =
    assignSubs(subVectorRows(corpus, dim, m), codebookDF(corpus, cents))
      .groupBy(col("vec_id"))
      .agg(expr("transform(array_sort(collect_list(struct(s, c))), x -> x.c)").as("codes"))

  /** In-flight reconstruction: concat of each subspace's centroid,
    * looked up by code from the literal codebook (constant-size plan —
    * m element_at calls, codebook rides in the plan like planeLit). */
  private def reconCol(cents: Array[Array[Array[Float]]], m: Int): Column =
    concat((0 until m).map { s =>
      val book = typedlit(cents(s).map(_.toIndexedSeq).toIndexedSeq)
      element_at(book, col("codes").getItem(s) + lit(1))
    }: _*)

  /** Per-subspace mean SQUARED quantization residual of `rows` under a
    * frozen codebook — the scalar that says how well the books still
    * speak for the data. Determinism (ss15's recipe): each row's r² is
    * a fixed left-to-right IEEE fold over its sub-vector vs its
    * nearest entry; the per-subspace mean accumulates the r² values in
    * order-independent DECIMAL(18,6) and string-hops to double for ONE
    * divide — bit-stable under Spark's partition merge order.
    * Scale: one assignment pass (codebook broadcast, m·ksub rows) +
    * a partial-agg'd m-row aggregate — O(rows), never pairwise. */
  private[graft] def pqSubResiduals(rows: DataFrame, dim: Int,
      books: Array[Array[Array[Float]]]): DataFrame = {
    val cb = codebookDF(rows, books)
    assignSubs(subVectorRows(rows, dim, books.length), cb)
      .join(broadcast(cb.select(col("s"), col("c"), col("cent"))), Seq("s", "c"))
      .withColumn("r2", expr(
        "aggregate(zip_with(sub, cent, (a, b) -> " +
          "(cast(a as double) - cast(b as double)) * " +
          "(cast(a as double) - cast(b as double))), " +
          "cast(0.0 as double), (acc, v) -> acc + v)"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("n"),
        sum(col("r2").cast(DecimalType(18, 6))).as("sdec"))
      .selectExpr("s", "n", "cast(cast(sdec as string) as double) / n as mean_r2")
  }

  /** ss16 (round 11): CODEBOOK RESIDUAL DRIFT — ss15's twin for the
    * PQ family (VERDICT r10 #4). The IVF gauge reads drift off the
    * index itself because IVF stores raw vectors; PQ stores lossy
    * codes, so the at-rest rows carry no signal about how badly the
    * frozen codebook now quantizes NEW data. The gauge therefore runs
    * where the raw rows still exist — the ingest job hands the
    * appended batch here before (or after) `pqAppendDelta` encodes
    * it — and compares its per-subspace RMS quantization residual to
    * the BASE residual the build recorded as trained state
    * (`residuals/`, written by pqWriteIndex/ivfPqWriteIndex under the
    * final books; m rows). A same-distribution batch lands at ratio
    * ≈ 1; a distribution shift raises precisely the shifted
    * subspaces' residuals, BEFORE recall visibly degrades.
    *
    * The remedy is NOT a recluster: retraining a codebook from its
    * own codes would compound quantization error, so the ACT arm
    * (Maintenance.pqCycle) is an upstream full-rebuild alert. `ratio`
    * is null when the base residual is exactly 0.0 (a corpus the
    * books represent losslessly — synthetic fixtures); consumers
    * should compare `rmse` against `base_rmse` directly, as the cycle
    * does. Requires an index whose layout carries `residuals/`
    * (round 11+ builds; the registry's pq_delta variant always
    * does). */
  def pqResidualDrift(spark: org.apache.spark.sql.SparkSession, path: String,
      rows: DataFrame): DataFrame = {
    VectorFunctions.register(spark)
    val books = readCodebook(spark, s"$path/codebook")
    val dim = books.length * books(0)(0).length
    val base = spark.read.parquet(s"$path/residuals")
      .select(col("s"), col("mean_r2").as("base_r2"))
    pqSubResiduals(rows, dim, books)
      .join(broadcast(base), "s")
      .select(col("s"), col("n").as("n_rows"),
        sqrt(col("base_r2")).as("base_rmse"), sqrt(col("mean_r2")).as("rmse"),
        when(col("base_r2") > 0d, sqrt(col("mean_r2")) / sqrt(col("base_r2")))
          .as("ratio"))
      .orderBy(col("s"))
  }

  def pqTopK(corpus: DataFrame, queries: DataFrame, dim: Int, k: Int,
      m: Int = 8, ksub: Int = 16, iters: Int = 2): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val cents = trainPq(corpus, dim, m, ksub, iters)
    val codes = pqEncode(corpus, dim, m, cents)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = codes
      .withColumn("recon", reconCol(cents, m))
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        call_function("graft_cosine", col("q_emb"), col("recon")).as("cosine"))
    topKPerQuery(scored, k)
  }

  /** vec_id-range width of the PQ code table's partition key: codes
    * land in `vb = vec_id div 2^16` directories. Monotone ingest ids
    * cluster a delta batch into its few newest ranges, so an
    * exactly-once existence probe prunes to those directories instead
    * of scanning the whole code table (round 12 — VERDICT r11 #2: the
    * flat layout was the one index family without an idempotent
    * twin). 2^16 ids per dir keeps a dir's codes ~0.5 MB at m=8 —
    * well under one scan task — while a 10^9-vector corpus still
    * spreads over ~15k dirs. A probe scan is unaffected: it reads
    * every partition exactly as it read the flat table. */
  private[graft] val PqVbRange: Long = 1L << 16
  private def vbCol: Column = expr(s"cast(vec_id div $PqVbRange as int)")

  /** Materialized PQ index: the corpus stored as (vec_id, codes) —
    * m small ints per vector, ~8 bytes against 256 for the raw
    * 64-float embedding — plus the codebook as a tiny parquet. At
    * 100 TB this is the layout that makes ANN affordable: a probe
    * scans the code table (32× less IO than raw vectors) and never
    * touches the embeddings. Codes are PARTITIONED BY the vec_id
    * range key [[PqVbRange]] — see its scaladoc; the partitioning
    * exists for the idempotent append's pruned existence check, not
    * for probe pruning. */
  def pqWriteIndex(corpus: DataFrame, path: String, dim: Int,
      m: Int = 8, ksub: Int = 16, iters: Int = 2,
      booksOpt: Option[Array[Array[Array[Float]]]] = None): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = booksOpt.getOrElse(trainPq(corpus, dim, m, ksub, iters))
    pqEncode(corpus, dim, m, cents).withColumn("vb", vbCol)
      .write.mode("overwrite").partitionBy("vb").parquet(s"$path/codes")
    cents.zipWithIndex.flatMap { case (cs, s) =>
      cs.zipWithIndex.map { case (c, i) => (s, i, c.toSeq) }
    }.toIndexedSeq.toDF("s", "c", "cent")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebook")
    // trained state for the codebook drift gauge (round 11): the base
    // corpus's per-subspace mean squared residual under the final
    // books — the floor pqResidualDrift compares appended batches to
    pqSubResiduals(corpus, dim, cents)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/residuals")
  }

  private[graft] def readCodebook(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Array[Array[Float]]] = {
    val rows = spark.read.parquet(path)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Float](2).toArray).toMap
    val m = rows.keys.map(_._1).max + 1
    val ksub = rows.keys.map(_._2).max + 1
    Array.tabulate(m, ksub)((s, c) => rows((s, c)))
  }

  /** Append a delta batch to a materialized PQ index: delta vectors
    * are encoded against the EXISTING codebook and the 8-byte code
    * rows appended to the code table — base files untouched, cost
    * O(|delta| × m × ksub). Codes are a pure per-row function of the
    * codebook, so probe(base ⊕ delta) is bit-identical to a one-shot
    * encode of the union under the same books (IvfIndexSpec); the
    * drift (codebook trained before the delta's distribution arrived)
    * shows up as reconstruction error in ss8's recall, not as
    * incorrect probing. */
  def pqAppendDelta(delta: DataFrame, path: String, dim: Int): Unit = {
    VectorFunctions.register(delta.sparkSession)
    val books = readCodebook(delta.sparkSession, s"$path/codebook")
    pqEncode(delta, dim, books.length, books).withColumn("vb", vbCol)
      .write.mode("append").partitionBy("vb").parquet(s"$path/codes")
  }

  /** EXACTLY-ONCE [[pqAppendDelta]] — closes the index family's last
    * at-least-once hole (round 12 — VERDICT r11 #2). The cid-pruned
    * check doesn't transfer here (codes carry no coarse assignment),
    * so the pruning key is the PRIMARY KEY itself: codes live in
    * `vb = vec_id div` [[PqVbRange]] range directories, a pure
    * function of vec_id, so a batch's target dirs are identical on
    * every delivery and the existence anti-join prunes to exactly
    * them — for monotone ingest ids that is the newest range or two,
    * never the corpus. Same contract as [[ivfAppendDeltaIdempotent]]:
    * single writer per index generation; within-batch duplicate
    * vec_ids collapsed at entry; returns rows actually appended. */
  def pqAppendDeltaIdempotent(delta0: DataFrame, path: String, dim: Int): Long = {
    VectorFunctions.register(delta0.sparkSession)
    val spark = delta0.sparkSession
    val delta = delta0.dropDuplicates("vec_id")
    val books = readCodebook(spark, s"$path/codebook")
    val coded = pqEncode(delta, dim, books.length, books).withColumn("vb", vbCol)
    val targetVbs = coded.select("vb").distinct().collect().map(_.getInt(0))
    if (targetVbs.isEmpty) return 0L
    val existing = spark.read.parquet(s"$path/codes")
      .filter(col("vb").isin(targetVbs.toIndexedSeq: _*))
      .select(col("vec_id"))
    val fresh = coded.join(existing, Seq("vec_id"), "left_anti")
      .localCheckpoint() // one evaluation serves the count AND the write
    val n = fresh.count()
    if (n > 0)
      fresh.write.mode("append").partitionBy("vb").parquet(s"$path/codes")
    fresh.unpersist()
    n
  }

  /** Probe a materialized PQ index: reconstruct from the stored codes
    * and the (re-loaded, driver-resident) codebook, score with the
    * exact query vector. The scan reads ONLY the code table. */
  def pqProbeIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, k: Int): DataFrame = {
    VectorFunctions.register(spark)
    val cents = readCodebook(spark, s"$path/codebook")
    val m = cents.length
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = spark.read.parquet(s"$path/codes")
      .withColumn("recon", reconCol(cents, m))
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        call_function("graft_cosine", col("q_emb"), col("recon")).as("cosine"))
    topKPerQuery(scored, k)
  }

  /** EXACT-RERANK of an ANN candidate pool (round 15 — the perturbed
    * recall curve's finding: at x30p the exact top-10 is ~30 jittered
    * near-twins packed within ε of each other, and 8-subvector /
    * 256-centroid ADC distance resolution is coarser than ε, so
    * un-reranked PQ ranks near-ties arbitrarily — recall 0.42). The
    * standard fix (FAISS's refine stage): take the ADC top-(k·f) pool,
    * fetch those rows' RAW embeddings from the flat store, score with
    * exact cosine, keep the true top-k. Guarantee: any true-top-k
    * member present in the pool survives the rerank (at most k−1
    * corpus vectors beat it, so at most k−1 pool members do), hence
    * per-query recall ≥ the un-reranked recall — spec-pinned.
    *
    * Scale: the pool is |queries|·k·f rows — broadcast it; the flat
    * store (the corpus parquet itself, the refine store a pipeline
    * already has) is scanned ONCE, column-pruned to (vec_id,
    * embedding), with the broadcast hash join discarding non-pool rows
    * at the scan. That re-reads raw vectors the PQ probe avoided, but
    * only as one 2-column pass — and point-prunes further when the
    * flat store is range-partitioned by vec_id ([[PqVbRange]]'s key).
    * Ties break exactly as the brute-force truth does (same
    * graft_topk (score, id) comparator), so rerank(pool ⊇ truth∩pool)
    * is deterministic. */
  def rerankExact(cands: DataFrame, corpus: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val pool = cands.select(col("query_id"), col("vec_id"))
    val scored = corpus.select(col("vec_id"), col("embedding"))
      .join(broadcast(pool), Seq("vec_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        call_function("graft_cosine", col("q_emb"), col("embedding")).as("cosine"))
    topKPerQuery(scored, k)
  }

  /** [[pqProbeIndex]] + [[rerankExact]]: ADC candidate generation off
    * the 8-byte code table (the IO win stands — the code scan finds
    * the pool), exact refinement over pool raw vectors fetched from
    * `corpus` (the flat store). `poolFactor` trades one small fetch
    * for recall: f·k candidates per query. The registry serves ss5
    * through this path; the un-reranked probe stays ss8's `pq_adc`
    * gauge row. */
  def pqProbeIndexReranked(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, corpus: DataFrame, k: Int,
      poolFactor: Int = 4): DataFrame =
    rerankExact(pqProbeIndex(spark, path, queries, k * poolFactor),
      corpus, queries, k)

  /** [[ivfPqProbeIndex]] + [[rerankExact]] — see
    * [[pqProbeIndexReranked]]; the coarse pruning AND the code-width
    * IO factor still bound the candidate scan, the refine fetch is
    * |queries|·k·f point rows. */
  def ivfPqProbeIndexReranked(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, corpus: DataFrame, k: Int,
      poolFactor: Int = 4, nprobe: Int = 0): DataFrame =
    rerankExact(ivfPqProbeIndex(spark, path, queries, k * poolFactor, nprobe),
      corpus, queries, k)

  /** ss6: k-NN label classification — majority vote over the exact
    * top-k neighbors (the label-propagation / auto-labeling step of a
    * curation pipeline). Composes the ss1 scan (corpus never shuffled,
    * graft_topk partial ranking) with two small aggregates over
    * queries×k rows; ties break (votes desc, label asc), so with ss1's
    * deterministic neighbor set the prediction is deterministic and
    * the whole operator oracle-hashes. */
  def knnClassify(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val neighbors = bruteForceTopK(corpus, queries, k)
    val votes = neighbors
      .join(corpus.select(col("vec_id"), col("label")), "vec_id")
      .groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("n_votes"))
    votes.groupBy(col("query_id"))
      .agg(
        max_by(col("label"), struct(col("n_votes"), (-col("label")).as("tb"))).as("pred_label"),
        max(col("n_votes")).as("n_votes"))
      .orderBy(col("query_id"))
  }

  /** ss7: IVF + PQ composed — the layered 100 TB ANN architecture:
    * the coarse IVF quantizer prunes the search to nprobe/nlist of the
    * corpus, and within probed lists the scan reads PQ codes (8 bytes)
    * instead of raw vectors, reconstructing in-flight for the
    * asymmetric-distance re-rank. Probe IO relative to a flat scan:
    * (nprobe/nlist) × (code bytes / vector bytes) — with 4/16 lists
    * and 8-byte codes that is 1/128 of the data touched, and both
    * factors scale independently (lists with corpus size, code width
    * with recall budget). Training = IVF centroids + PQ codebooks,
    * both bounded driver state. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, dim: Int, k: Int,
      nlist: Int = 16, nprobe: Int = 4, m: Int = 8, ksub: Int = 16,
      iters: Int = 2): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val coarse = trainCentroids(corpus, nlist, iters)
    val books = trainPq(corpus, dim, m, ksub, iters)
    val indexed = withCid(pqEncode(corpus, dim, m, books)
        .join(corpus.select(col("vec_id"), col("embedding")), "vec_id"),
        "embedding", coarse)
      .select(col("vec_id"), col("cid"), col("codes"))
    val probed = probeLists(queries, coarse, nprobe)
    val scored = indexed
      .withColumn("recon", reconCol(books, m))
      .join(broadcast(probed), Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        call_function("graft_cosine", col("q_emb"), col("recon")).as("cosine"))
    topKPerQuery(scored, k)
  }

  /** Materialized IVF+PQ index — ss7's layered layout at rest: index
    * rows are (vec_id, codes) PARTITIONED BY the coarse cid (directory
    * pruning gives the nprobe/nlist factor), rows carry PQ codes only
    * (the code-bytes/vector-bytes factor) — raw embeddings appear
    * nowhere in the index. Coarse centroids and the PQ codebook ride
    * alongside as tiny parquets, re-loaded as bounded driver state at
    * probe time. */
  def ivfPqWriteIndex(corpus: DataFrame, path: String, dim: Int,
      nlist: Int = 16, m: Int = 8, ksub: Int = 16, iters: Int = 2,
      coarseOpt: Option[Array[Array[Float]]] = None,
      booksOpt: Option[Array[Array[Array[Float]]]] = None): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val coarse = coarseOpt.getOrElse(trainCentroids(corpus, nlist, iters))
    val books = booksOpt.getOrElse(trainPq(corpus, dim, m, ksub, iters))
    withCid(pqEncode(corpus, dim, m, books)
        .join(corpus.select(col("vec_id"), col("embedding")), "vec_id"),
        "embedding", coarse)
      .select(col("vec_id"), col("codes"), col("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(s"$path/codes")
    coarse.zipWithIndex.toIndexedSeq.map { case (c, i) => (i, c.toSeq) }
      .toDF("cid", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    books.zipWithIndex.flatMap { case (cs, s) =>
      cs.zipWithIndex.map { case (c, i) => (s, i, c.toSeq) }
    }.toIndexedSeq.toDF("s", "c", "cent")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebook")
    // same codebook-drift trained state as pqWriteIndex — the gauge
    // reads only codebook/ + residuals/, so it serves both layouts
    pqSubResiduals(corpus, dim, books)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/residuals")
  }

  /** Append a delta batch to a materialized IVF+PQ index: delta rows
    * are PQ-encoded against the stored codebook, coarse-assigned to
    * the stored centroids, and appended into the cid partition
    * directories — both trained states reused, both append-only, cost
    * O(|delta|). Composes [[ivfAppendDelta]]'s and [[pqAppendDelta]]'s
    * equivalence arguments: probe(base ⊕ delta) ≡ probe of a one-shot
    * union index under the same coarse/books (IvfIndexSpec). */
  def ivfPqAppendDelta(delta: DataFrame, path: String, dim: Int): Unit = {
    VectorFunctions.register(delta.sparkSession)
    val spark = delta.sparkSession
    val coarse = readCentroids(spark, s"$path/centroids")
    val books = readCodebook(spark, s"$path/codebook")
    withCid(pqEncode(delta, dim, books.length, books)
        .join(delta.select(col("vec_id"), col("embedding")), "vec_id"),
        "embedding", coarse)
      .select(col("vec_id"), col("codes"), col("cid"))
      .write.mode("append").partitionBy("cid").parquet(s"$path/codes")
  }

  /** EXACTLY-ONCE [[ivfPqAppendDelta]] — the cid-partitioned code
    * table takes [[ivfAppendDeltaIdempotent]]'s pruned existence check
    * verbatim: coarse assignment is a pure function of the embedding
    * under the frozen centroids, so a vec_id present in its own target
    * cid partition proves the prior delivery committed. Same contract
    * as [[ivfAppendDeltaIdempotent]]: single writer per index
    * generation; within-batch duplicate vec_ids collapsed at entry. */
  def ivfPqAppendDeltaIdempotent(delta0: DataFrame, path: String, dim: Int): Long = {
    VectorFunctions.register(delta0.sparkSession)
    val spark = delta0.sparkSession
    val delta = delta0.dropDuplicates("vec_id")
    val coarse = readCentroids(spark, s"$path/centroids")
    val books = readCodebook(spark, s"$path/codebook")
    val assigned = withCid(pqEncode(delta, dim, books.length, books)
        .join(delta.select(col("vec_id"), col("embedding")), "vec_id"),
        "embedding", coarse)
      .select(col("vec_id"), col("codes"), col("cid"))
    val targetCids = assigned.select("cid").distinct().collect().map(_.getInt(0))
    if (targetCids.isEmpty) return 0L
    val existing = spark.read.parquet(s"$path/codes")
      .filter(col("cid").isin(targetCids.toIndexedSeq: _*))
      .select(col("vec_id"))
    val fresh = assigned.join(existing, Seq("vec_id"), "left_anti").localCheckpoint()
    val n = fresh.count()
    if (n > 0)
      fresh.write.mode("append").partitionBy("cid").parquet(s"$path/codes")
    fresh.unpersist()
    n
  }

  /** Probe a materialized IVF+PQ index: coarse-probe the cid partition
    * directories (planning-time pruning), reconstruct probed rows from
    * their codes, asymmetric-distance re-rank against the exact query
    * vector. IO = (nprobe/nlist) × (code bytes / vector bytes) of a
    * flat scan. */
  def ivfPqProbeIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, k: Int, nprobe: Int = 0): DataFrame = {
    VectorFunctions.register(spark)
    val coarse = spark.read.parquet(s"$path/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1).map(_._2)
    val np = if (nprobe > 0) nprobe else math.max(4, coarse.length / 4)
    val rows = spark.read.parquet(s"$path/codebook")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Float](2).toArray).toMap
    val m = rows.keys.map(_._1).max + 1
    val ksub = rows.keys.map(_._2).max + 1
    val books = Array.tabulate(m, ksub)((s, c) => rows((s, c)))
    val probed = probeLists(queries, coarse, np)
    val probedCids = probed.select("cid").distinct().collect().map(_.getInt(0))
    val scored = spark.read.parquet(s"$path/codes")
      .filter(col("cid").isin(probedCids.toIndexedSeq: _*))
      .withColumn("recon", reconCol(books, m))
      .join(broadcast(probed), Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        call_function("graft_cosine", col("q_emb"), col("recon")).as("cosine"))
    topKPerQuery(scored, k)
  }

  /** Per-label mean embedding (class centroids), emitted in long form
    * (label, pos, n_vecs, centroid) so the result is flat scalar
    * columns — driver-hashable and directly joinable back onto vector
    * rows for e.g. distance-to-centroid outlier scoring.
    *
    * Scale: posexplode multiplies rows ×dim, but the groupBy's partial
    * (map-side) aggregation collapses each input partition to at most
    * |labels|×dim rows BEFORE the exchange, so shuffle volume is
    * partitions×labels×dim — independent of corpus size. Sums
    * accumulate in DECIMAL(18,6), which is exact and
    * addition-order-independent, so the result is bit-deterministic
    * under Spark's nondeterministic partition merge order (the same
    * trick every dsum oracle query uses). */
  /** ss10: distributed Lloyd k-means over the whole corpus, with
    * ORACLE-GATED BIT-EXACT assignments — rare for clustering, and
    * the point: every arithmetic step is either exact DECIMAL (order-
    * independent, so Spark's nondeterministic merge order can't
    * perturb it) or a single fixed IEEE operation mirrored verbatim
    * in the DuckDB oracle.
    *
    * The deterministic recipe, per coordinate — integer micro-units:
    *  - inputs quantized once: float → double (exact widening) →
    *    DECIMAL(18,6) (both engines' validated half-up cast) → ×10⁶
    *    → BIGINT. After this line there is NO floating point and NO
    *    decimal division anywhere — every engine-divergent rounding
    *    path is gone. (A first cut kept DECIMAL centroids and
    *    re-quantized the mean through a double divide; the two
    *    engines' double→DECIMAL(18,6) casts round the mean's last
    *    microdigit differently ~50% of the time, which the sf0.01
    *    gate caught in the distance column. Integer micro-units are
    *    the fix, not a band-aid: exact by construction.)
    *  - distances: Σ (x−c)² in int64 micro²-units — exact, no
    *    sum-order sensitivity; argmin tie-breaks on cluster id via
    *    one struct-array min (mirrors the oracle's ORDER BY dist,
    *    cluster). Bound: |coordinate| ≤ ~3·10³ keeps Σ of 64 squared
    *    diffs under 2⁶³ — unit-normalized embeddings are ~1.
    *  - new centroids: exact int64 coordinate sums; the half-up mean
    *    ⌊(2s+n) / 2n⌋ is computed with pmod-floor division — pure
    *    integer ops both engines share verbatim.
    *  - seeds: the k smallest vec_ids — deterministic, no RNG.
    *
    * Scale: assignment is map-side only (centroids are k×dim decimal
    * literals broadcast in the plan — the IVF trainer's bounded-
    * driver-state pattern), so each Lloyd round is one corpus scan
    * plus a partial-agg'd groupBy whose shuffle volume is
    * partitions×k×dim, independent of corpus size. The quantized
    * corpus is cached across rounds; empty clusters keep their
    * previous centroid (COALESCE in the oracle, getOrElse here). */
  def kmeansAssign(corpus: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k >= 1 && iters >= 1, "kmeansAssign: k and iters must be >= 1")
    val xq = corpus.select(col("vec_id"),
      expr("transform(embedding, v -> " +
        "CAST(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,6)) * 1000000 AS BIGINT))").as("xi"))
      .cache()

    val seed = xq.orderBy(col("vec_id")).limit(k).collect() // k×dim longs: bounded driver state
    var cents: Array[Array[Long]] = seed.map(_.getSeq[Long](1).toArray)

    def distCol(c: Array[Long]): Column = {
      val cLit = array(c.map(lit(_)): _*)
      aggregate(
        zip_with(col("xi"), cLit, (a, b) => (a - b) * (a - b)),
        lit(0L),
        (acc, v) => acc + v)
    }

    def assign(): DataFrame = {
      val structs = cents.zipWithIndex.map { case (c, i) =>
        struct(distCol(c).as("dist"), lit(i).as("cluster"))
      }
      xq.select(col("vec_id"), col("xi"), array_min(array(structs: _*)).as("best"))
        .select(col("vec_id"), col("xi"),
          col("best.cluster").as("cluster"), col("best.dist").as("dist"))
    }

    var assigned = assign()
    var round = 1
    while (round < iters) {
      // half-up mean in micro-units: ⌊(2s+n) / 2n⌋ via pmod-floor —
      // exactly-divisible after subtracting pmod, so the one double
      // division is exact (operands < 2^53) and casts back losslessly
      val means = assigned
        .select(col("cluster"), posexplode(col("xi")))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
        .selectExpr("cluster", "pos",
          "CAST((2*s + n - pmod(2*s + n, 2*n)) / (2*n) AS BIGINT) AS c")
        .collect() // k×dim rows: bounded driver state
      val byCluster = means.groupBy(_.getInt(0))
      cents = cents.zipWithIndex.map { case (old, ci) =>
        byCluster.get(ci) match {
          case Some(rows) =>
            val m = rows.map(r => r.getInt(1) -> r.getLong(2)).toMap
            old.indices.map(p => m.getOrElse(p, old(p))).toArray
          case None => old
        }
      }
      assigned = assign()
      round += 1
    }
    assigned.select(col("vec_id"), col("cluster"), col("dist").as("dist2u"))
      .orderBy(col("vec_id"))
  }

  /** O(k) cluster/list health rollup — ONE fold shared by ss13 (over
    * the exact integer-kmeans assignment, with dist2u) and the IVF
    * index spec (over the materialized cid partition column, no
    * distance). Per cluster: member count, corpus share, imbalance
    * n·k/N (1.0 = perfectly balanced lists — at fixed nprobe a 3×
    * list is a 3× probe-cost hot spot), and mean squared distance in
    * micro²-units when a distance column exists. One partial-agg'd
    * pass to k rows; the total and every ratio ride the k-row
    * aggregate via a global window (q87's tiny-aggregate shape), so
    * the single SinglePartition exchange moves k rows, never data. */
  def clusterStats(assigned: DataFrame, k: Int, clusterCol: String,
      dist2uCol: Option[String] = None): DataFrame = {
    val base = dist2uCol match {
      case Some(dc) =>
        assigned.groupBy(col(clusterCol).as("cluster"))
          .agg(count(lit(1)).as("n_vecs"),
            sum(col(dc).cast(DecimalType(38, 0))).as("sdec"))
      case None =>
        assigned.groupBy(col(clusterCol).as("cluster"))
          .agg(count(lit(1)).as("n_vecs"))
    }
    val ratios = base
      .withColumn("n_total", sum(col("n_vecs")).over(Window.partitionBy()))
      .selectExpr(Seq("cluster", "n_vecs",
        "cast(n_vecs as double) / n_total as share",
        s"cast(n_vecs * $k as double) / n_total as imbalance") ++
        dist2uCol.map(_ =>
          "cast(cast(sdec as string) as double) / n_vecs as mean_dist2u"): _*)
    ratios.orderBy(col("cluster"))
  }

  def labelCentroids(emb: DataFrame): DataFrame =
    emb.select(col("label"), posexplode(col("embedding")))
      .groupBy(col("label"), col("pos"))
      .agg(count(lit(1)).as("n_vecs"),
        (sum(col("col").cast("double").cast(DecimalType(18, 6))).cast("double") /
          count(lit(1))).as("centroid"))
      .select(col("label"), col("pos").cast("long").as("pos"),
        col("n_vecs"), col("centroid"))
      .orderBy(col("label"), col("pos"))

  /** dd17: SEMANTIC DEDUPLICATION (SemDeDup — Abbas et al. 2023,
    * arXiv:2303.09540): k-means CLUSTER BLOCKING over the embedding
    * space, exact cosine only within clusters, transitive groups, keep
    * ONE representative per group — the member FARTHEST from its
    * centroid (the paper's choice: of a semantic-duplicate set, the
    * least prototypical example carries the most marginal training
    * signal). This is the third blocking geometry of the embedding
    * dedup family — dd5 blocks by random hyperplanes (LSH), mm7 by
    * content-defined chunks; SemDeDup blocks by LEARNED cell structure,
    * which is what makes it the one used on web-scale LLM corpora:
    * pair cost is Σ nᶜ², so with cluster count grown ∝ corpus (the
    * `k` parameter; cells stay ~constant-sized, the IVF contract) the
    * quadratic term never materializes. The knowingly-accepted recall
    * trade, same as the paper's: a near-dup pair split across a cell
    * boundary is missed (spec documents one).
    *
    * Plan: one Lloyd run ([[kmeansAssign]] — integer-exact, so
    * clusters are engine-reproducible and the whole operator ORACLES,
    * rare for anything clustering-based), localCheckpoint barrier on
    * the n×3 assignment (the fan-out rides it 3×: two join sides +
    * the final attach — never re-running Lloyd), then a cluster-keyed
    * self-join scores cosine per within-cell pair (cells are the
    * working-set unit; a hot cell is an AQE skew split), PER-CELL
    * union-find for the transitive groups, and one max_by per group
    * picks the keeper. Output: every vector labeled
    * (cluster, group_id, keep).
    *
    * The labeling deliberately does NOT use dd6's iterative min-label
    * propagation: cluster blocking gives dd17 an invariant dd6's
    * corpus-spanning dup graph lacks — every component lives INSIDE
    * one cell (edges are cell-local by construction) — so connected
    * components collapse to an embarrassingly-parallel per-cell fold:
    * ONE shuffle of the pair set keyed by cell, then a single-task
    * union-find per cell (union-by-min + path compression, O(E·α)
    * over a working set the pairing step already bounded at nᶜ
    * nodes — strictly cheaper than the nᶜ² cosine join that feeds
    * it). Measured against the generic loop at sf0.1: the τ=0.35
    * within-cell graph is sparse and chain-like, and propagation paid
    * 20 rounds of per-round scheduling floor (13.7 s); the per-cell
    * fold is one stage. At 100 TB the cell count grows with the
    * corpus while cells stay bounded, so the fold stays one even
    * stage of constant-size tasks.
    *
    * τ is on the same cosine scale as dd5 — the two operators differ
    * ONLY in blocking, which the spec exploits (both are sound w.r.t.
    * the exact ≥τ pair set). */
  def semanticDedup(emb: DataFrame, k: Int, iters: Int, tau: Double): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    VectorFunctions.register(spark)
    val asg = kmeansAssign(emb, k, iters).localCheckpoint(true)
    val withEmb = asg.select(col("vec_id"), col("cluster"))
      .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
    val x = withEmb.as("x"); val y = withEmb.as("y")
    val pairs = x.join(y,
        col("x.cluster") === col("y.cluster") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.cluster").as("cell"),
        col("x.vec_id").as("doc_a"), col("y.vec_id").as("doc_b"),
        call_function("graft_cosine",
          col("x.embedding"), col("y.embedding")).as("cosine"))
      .filter(col("cosine") >= tau)
    // per-cell disjoint-set union: union-by-min roots every tree at
    // its component's minimum vec_id (roots only ever decrease on a
    // merge), so find() emits dd6's exact labeling convention
    val labels = pairs
      .select(col("cell").as("_1"), col("doc_a").as("_2"), col("doc_b").as("_3"))
      .as[(Int, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (_, edges) =>
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(a: Long): Long = {
          var r = a
          while (parent(r) != r) r = parent(r)
          var c = a
          while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        edges.foreach { case (_, a, b) =>
          if (!parent.contains(a)) parent(a) = a
          if (!parent.contains(b)) parent(b) = b
          val ra = find(a); val rb = find(b)
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        // snapshot the keys before emitting: find() path-compresses
        // (mutates) the same map, and mutation during keysIterator is
        // not a documented-safe pattern across collection versions
        val ks = parent.keys.toArray
        ks.iterator.map(v => (v, find(v)))
      }
      .toDF("vec_id", "group_id")
    val joined = asg.join(labels, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"), col("dist2u"),
        coalesce(col("group_id"), col("vec_id")).as("group_id"))
    val keeper = joined.groupBy(col("group_id"))
      .agg(max(struct(col("dist2u"), col("vec_id"))).as("kp"))
    joined.join(keeper, "group_id")
      .select(col("vec_id"), col("cluster"), col("group_id"),
        (col("vec_id") === col("kp.vec_id")).as("keep"))
      .orderBy(col("vec_id"))
  }
}
