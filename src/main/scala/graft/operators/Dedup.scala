package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** §2.B deduplication operators over a documents-shaped table
  * (doc_id: long, text: string).
  *
  * Scale design: nothing here is O(n²) over the corpus. Exact dedup is
  * one hash-partitioned groupBy; near-dup candidate generation is
  * always inverted-index / LSH-bucketed (shuffle keyed on
  * shingle/band/signature), so the pairwise work is per-bucket. Hot
  * buckets (stop-shingles) are the skew risk at 100 TB — cap them with
  * `maxDocFreq` (drops only candidates whose *every* shared shingle is
  * ubiquitous; verification jaccard is unaffected) or salt the band
  * join; AQE skew-join handles moderate cases.
  */
object Dedup {

  private def withShingles(docs: DataFrame, n: Int): DataFrame = {
    val toks = expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    val sh =
      if (n <= 1) array_distinct(toks)
      else array_distinct(expr(
        s"transform(sequence(1, greatest(size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) - ${n - 1}, 0)), " +
        s"i -> concat_ws(' ', slice(regexp_extract_all(lower(text), '[a-z0-9]+', 0), i, $n)))"))
    docs.select(col("doc_id"), sh.as("shingles"))
      .filter(size(col("shingles")) > 0)
  }

  /** dd1: exact duplicate groups — one shuffle keyed on the text. At
    * scale, key on xxhash64(text) first and verify inside groups to
    * cut shuffle width. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id"))

  /** dd2: all-pairs n-gram Jaccard ≥ threshold via an inverted index on
    * shingles (candidates = pairs sharing ≥1 shingle). Jaccard is
    * computed from integer set sizes + one IEEE division → oracle-exact. */
  def ngramJaccard(docs: DataFrame, n: Int, threshold: Double, maxDocFreq: Long = 0L): DataFrame = {
    val sh = withShingles(docs, n).cache()
    val sizes = sh.select(col("doc_id"), size(col("shingles")).cast("long").as("n_sh"))
    var inv = sh.select(col("doc_id"), explode(col("shingles")).as("sh"))
    if (maxDocFreq > 0) {
      val hot = inv.groupBy("sh").count().filter(col("count") > maxDocFreq).select("sh")
      inv = inv.join(broadcast(hot), Seq("sh"), "left_anti")
    }
    val a = inv.as("a"); val b = inv.as("b")
    val shared = a.join(b, col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("n_shared").cast("double") / (col("n_a") + col("n_b") - col("n_shared"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val MinhashK = 64
  private val Bands = 16 // x 4 rows: P(candidate | s=0.9) ≈ 1 - 3.6e-8

  /** dd3: MinHash + LSH banding, then exact-Jaccard verification of the
    * candidates. With b=16, r=4 a true pair at s ≥ 0.9 is missed with
    * probability < 4e-8, so verified output equals the exact answer
    * while candidate generation stays sub-quadratic (the scale path). */
  def minhashLsh(docs: DataFrame, threshold: Double): DataFrame = {
    val sh = withShingles(docs, 1).cache()
    val inv = sh.select(col("doc_id"), explode(col("shingles")).as("sh"))
    // 64 permutations: h_i(s) = xxhash64(s, i). Partial-agg min per doc.
    val sigCols = (0 until MinhashK).map(i => min(xxhash64(col("sh"), lit(i))).as(s"h$i"))
    val sigs = inv.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
    // band j = hash of rows 4j..4j+3; explode to (doc, band, bandhash)
    val bandCols = (0 until Bands).map { j =>
      struct(lit(j).as("band"),
        xxhash64((0 until 4).map(r => col(s"h${4 * j + r}")): _*).as("bh"))
    }
    val bands = sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
    val x = bands.as("x"); val y = bands.as("y")
    val cand = x.join(y,
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    // verify candidates with exact jaccard from the shingle sets
    val sa = sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val sb = sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** dd4: 64-bit SimHash over token counts; near-dup pairs = Hamming
    * distance ≤ maxHamming, candidates via 4×16-bit band buckets
    * (catches every pair with ≤3 differing bits exactly, and most up
    * to the requested distance when errors cluster). */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("tok"))
    val contrib = toks.withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { j =>
      sum(when(expr(s"(h >> $j) & 1") === 1, 1).otherwise(-1)).as(s"b$j")
    }
    val sums = contrib.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val simhashExpr = (0 until 64)
      .map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    sums.select(col("doc_id"), simhashExpr.as("simhash"))
  }

  def simhashPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    val sig = simhash(docs).cache()
    val bandCols = (0 until 4).map(k =>
      struct(lit(k).as("band"), expr(s"(simhash >> ${16 * k}) & 65535").as("bv")))
    val bands = sig.select(col("doc_id"), col("simhash"), explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.band").as("band"), col("b.bv").as("bv"))
    val x = bands.as("x"); val y = bands.as("y")
    x.join(y, col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val HyperplaneBits = 16
  private val HyperplaneTables = 2

  /** Deterministic pseudo-random unit-free hyperplane weights — a
    * splitmix64-style integer mix (public-domain algorithm), no RNG
    * state, so every run/executor derives identical planes. */
  private def planeWeight(table: Int, plane: Int, dim: Int): Float = {
    var z = table.toLong * 1000003L + plane.toLong * 7919L + dim.toLong + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    ((z.toDouble / Long.MaxValue.toDouble)).toFloat // in [-1, 1]
  }

  /** dd5: embedding near-duplicates. Candidates from `HyperplaneTables`
    * independent 16-bit random-hyperplane signatures (equality-joined
    * buckets), verified with the exact codegen cosine. */
  def embeddingDup(emb: DataFrame, dim: Int, threshold: Double): DataFrame = {
    val spark = emb.sparkSession
    VectorFunctions.register(spark)
    def planeSql(t: Int, p: Int): String =
      s"cast(array(${(0 until dim).map(j => planeWeight(t, p, j).toString).mkString(",")}) as array<float>)"
    def sigCol(t: Int): Column = (0 until HyperplaneBits).map { p =>
      when(expr(s"graft_dot(embedding, ${planeSql(t, p)})") > 0d, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)
    val sigs = emb.select(Seq(col("vec_id"), col("embedding")) ++
      (0 until HyperplaneTables).map(t => sigCol(t).as(s"sig$t")): _*)
    val tables = (0 until HyperplaneTables).map { t =>
      val x = sigs.as("x"); val y = sigs.as("y")
      x.join(y, col(s"x.sig$t") === col(s"y.sig$t") && col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
          expr("graft_cosine(x.embedding, y.embedding)").as("cosine"))
    }
    tables.reduce(_ union _)
      .distinct()
      .filter(col("cosine") >= threshold)
      .orderBy(col("vec_a"), col("vec_b"))
  }
}
