package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Dedup, Multimodal}

/** Randomized invariants with a FIXED seed: each test builds one
  * generated corpus (one Spark job per assertion, not one per case —
  * scalacheck-style per-case evaluation would pay Spark's job overhead
  * hundreds of times). Deterministic by construction, so failures
  * reproduce exactly. */
class RandomizedSpec extends SparkTestBase {

  private def rng = new Random(0xC0FFEE)

  /** Printable-ish strings with spaces, punctuation, digits, unicode
    * letters and control chars — the shapes that break tokenizers. */
  private def randText(r: Random, maxLen: Int): String = {
    val alphabet = "abc XYZ09 .,;:!?\t\näöéﬁ 中"
    val n = r.nextInt(maxLen)
    Seq.fill(n)(alphabet(r.nextInt(alphabet.length))).mkString
  }

  test("tx7 normalization is idempotent on generated unicode text") {
    import spark.implicits._
    val r = rng
    val docs = (1L to 200L).map(i => (i, randText(r, 120))).toDF("doc_id", "text")
    val once = TextFunctions.normalizeText(docs)
      .select(col("doc_id"), col("norm_text").as("text"))
    val twice = TextFunctions.normalizeText(once)
    val joined = once.select(col("doc_id"), col("text").as("a"))
      .join(twice.select(col("doc_id"), col("norm_text").as("b")), "doc_id")
    assert(joined.filter(col("a") =!= col("b")).count() === 0L)
  }

  test("dd1 exact dedup partitions any generated corpus") {
    import spark.implicits._
    val r = rng
    // ~40 distinct texts duplicated with random multiplicity
    val base = (0 until 40).map(_ => randText(r, 60))
    val rows = (1L to 300L).map(i => (i, base(r.nextInt(base.size))))
    val docs = rows.toDF("doc_id", "text")
    val out = Dedup.exact(docs).collect()
    // copies sum to the corpus size; keep_id is the min id of its text
    assert(out.map(_.getLong(1)).sum === 300L)
    val byText = rows.groupBy(_._2)
    val minIds = byText.values.map(_.map(_._1).min).toSet
    assert(out.map(_.getLong(0)).toSet === minIds)
  }

  test("tx4 WinnowMinima equals the HOF reference on generated text") {
    val spark2 = spark
    import spark2.implicits._
    val r = rng
    val docs = (1L to 100L).map(i => (i, randText(r, 200))).toDF("doc_id", "text")
    for ((k, w) <- Seq((4, 3), (8, 4))) {
      val fast = TextFunctions.fingerprints(docs, k, w).collect()
        .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
      val ref = TextFunctions.fingerprintsHofReference(docs, k, w)
        .select(col("doc_id"), size(col("fps")).cast("long"),
          array_min(col("fps")), array_max(col("fps")))
        .collect()
        .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
      assert(fast === ref, s"(k=$k, w=$w)")
    }
  }

  test("tx12 pack ids recompute from the prefix sums on a generated corpus") {
    import spark.implicits._
    val r = rng
    val docs = (1L to 250L)
      .map(i => (i, Seq.fill(r.nextInt(30))("tok").mkString(" "), s"src${r.nextInt(4)}"))
      .toDF("doc_id", "text", "source")
    val budget = 50
    val out = TextFunctions.packDocs(docs, budget).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(3)))
    out.groupBy(_._2).values.foreach { rows =>
      val sorted = rows.sortBy(_._1)
      var cum = 0L
      sorted.foreach { case (_, _, nTok, packId) =>
        assert(packId === cum / budget)
        cum += nTok
      }
      // pack ids never decrease in doc order
      assert(sorted.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    }
  }

  test("mm4 resize matches the JVM reference on generated text") {
    import spark.implicits._
    val r = rng
    val target = 16
    val rows = (1L to 150L).map(i => (i, randText(r, 80)))
    val out = Multimodal.resizeStub(rows.toDF("doc_id", "text"), target)
      .collect().map(x => x.getLong(0) -> x.getString(3)).toMap
    def md5(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    rows.foreach { case (id, t) =>
      val ref =
        if (t.length <= target) t
        else (0 until target).map(i => t.charAt((i.toLong * t.length / target).toInt)).mkString
      assert(out(id) === md5(ref), s"doc $id text=${t.take(40)}…")
    }
  }
}
