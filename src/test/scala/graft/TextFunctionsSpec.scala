package graft

import graft.functions.TextFunctions

/** §2.D specs (SURVEY.md §6): hand-computed fixtures + determinism. */
class TextFunctionsSpec extends SparkTestBase {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "The cat sat. The mat!", "en"),
      (2L, "", "en"),
      (3L, "der die und das ist nicht ein zu", "de"),
      (4L, "le la et les des un une est", "fr"),
    ).toDF("doc_id", "text", "lang")
  }

  test("tx1 token stats on a hand-computed fixture") {
    val out = TextFunctions.tokenStats(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // "The cat sat. The mat!": tokens [the,cat,sat,the,mat]=5, alnum=15, chars=21
    assert(out(1L) === ((5L, 15L, 21L)))
    assert(out(2L) === ((0L, 0L, 0L)))
  }

  test("tx2 quality: stopword/punct ratios on fixture") {
    val r = TextFunctions.qualityScore(docs).collect().find(_.getLong(0) == 1L).get
    // n_tokens=5, n_stop=2 ("the" twice), n_punct=2 (. !), n_chars=21
    assert(r.getLong(1) === 5L && r.getLong(2) === 2L && r.getLong(3) === 2L)
    assert(math.abs(r.getDouble(5) - 0.4) < 1e-12) // stop_ratio
    assert(r.getString(7) === "short")
  }

  test("tx3 langid: function-word fixtures classified; deterministic") {
    val out = TextFunctions.languageId(docs).collect()
      .map(r => r.getLong(0) -> r.getString(7)).toMap
    assert(out(3L) === "de")
    assert(out(4L) === "fr")
    val again = TextFunctions.languageId(docs).collect()
      .map(r => r.getLong(0) -> r.getString(7)).toMap
    assert(out === again)
  }

  test("tx5 BPE-ish counting on a hand-computed fixture") {
    import spark.implicits._
    val d = Seq((1L, "It's 42 degrees, really!")).toDF("doc_id", "text")
    val r = TextFunctions.bpeTokenStats(d).collect().head
    // ws tokens: [It's, 42, degrees,, really!] = 4
    // bpe on "it's 42 degrees, really!":
    //   "it" "'s" " 42" " degrees" "," " really" "!" = 7
    assert(r.getLong(1) === 4L)
    assert(r.getLong(2) === 7L)
    assert(r.getLong(3) === 7L) // all distinct here
  }

  test("tx6 vocab top-k: hand-counted frequencies, deterministic tie-break") {
    import spark.implicits._
    val d = Seq(
      (1L, "b b b a a c"),
      (2L, "a c d"),
    ).toDF("doc_id", "text")
    // freqs: b=3, a=3, c=2, d=1 → order: (a,3),(b,3),(c,2) at k=3
    val out = TextFunctions.vocabTopK(d, 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out === Seq(("a", 3L), ("b", 3L), ("c", 2L)))
  }

  test("tx4 WinnowMinima is bit-identical to the nested-HOF reference") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{call_function, col, lit, lower}
    graft.functions.VectorFunctions.register(spark)
    // edge shapes: empty, shorter than k, between k and k+w, long, repeats
    val fixture = Seq(
      (1L, ""), (2L, "abc"), (3L, "abcdefgh"), (4L, "abcdefghij"),
      (5L, "aaaaaaaaaaaaaaaaaaaaaaaa"), (6L, "The quick brown fox JUMPS over 42 lazy dogs, twice."),
    ).toDF("doc_id", "text")
    val corpus = Tables.documents(spark, Sf0001).select(col("doc_id"), col("text"))
      .union(fixture)
    for ((k, w) <- Seq((8, 4), (3, 2), (5, 7))) {
      val fast = corpus.select(col("doc_id"),
          call_function("graft_winnow", lower(col("text")), lit(k), lit(w)).as("fps"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val ref = TextFunctions.fingerprintsHofReference(corpus, k, w)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(fast === ref, s"(k=$k, w=$w)")
    }
  }

  test("tx4 fingerprints: identical texts → identical fingerprint sets") {
    import spark.implicits._
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "a totally different sentence with other words here"),
    ).toDF("doc_id", "text")
    val out = TextFunctions.fingerprints(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === out(2L))
    assert(out(1L) !== out(3L))
    assert(out(1L)._1 > 0)
  }
}
