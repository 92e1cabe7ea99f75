package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.DedupOps

/** d48 exact duplicate-span removal (sliding 8-word shingles,
  * keep-first, overlapping windows merge): the substring-level dedup
  * d43's disjoint stride-10 passages cannot express. The decisive case
  * is a duplicated run at a DIFFERENT word offset in the second doc —
  * it straddles d43's passage boundaries but every 8-word window
  * inside it still collides. */
class SpanDedupSpec extends AnyFunSuite {
  lazy val spark = Spec.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]): Map[Long, (Long, Long, String)] =
    DedupOps.spanDedup(spark, rows.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  private def words(prefix: String, n: Int): Seq[String] =
    (1 to n).map(i => s"$prefix$i")

  test("duplicated 8-word run at a different alignment is removed from the later doc") {
    // doc 1: a1..a20. doc 2: ten unique words, then a7..a14 (8 shared
    // words starting mid-doc at offset 11), then more unique words.
    val shared = words("a", 20).slice(6, 14) // a7..a14
    val doc2 = (words("b", 10) ++ shared ++ words("c", 5)).mkString(" ")
    val out = run(Seq(1L -> words("a", 20).mkString(" "), 2L -> doc2))
    // doc 1 is first occurrence everywhere: untouched
    assert(out(1L) == ((20L, 0L, words("a", 20).mkString(" "))))
    // doc 2 loses exactly the shared window [11, 18]
    assert(out(2L)._1 == 23L)
    assert(out(2L)._2 == 8L)
    assert(out(2L)._3 == (words("b", 10) ++ words("c", 5)).mkString(" "))
  }

  test("overlapping duplicate windows merge into one removed region") {
    // doc 2 repeats a 12-word run of doc 1: five overlapping 8-word
    // windows flag, their union is the whole 12-word region (not 5x8)
    val run12 = words("a", 30).slice(4, 16) // a5..a16
    val doc2 = (words("x", 3) ++ run12 ++ words("y", 3)).mkString(" ")
    val out = run(Seq(1L -> words("a", 30).mkString(" "), 2L -> doc2))
    assert(out(2L)._2 == 12L)
    assert(out(2L)._3 == (words("x", 3) ++ words("y", 3)).mkString(" "))
  }

  test("keep-first is deterministic by (doc_id, pos): exact copies keep only the earliest") {
    val t = words("z", 9).mkString(" ")
    val out = run(Seq(3L -> t, 1L -> t, 2L -> t))
    assert(out(1L)._3 == t) // lowest doc_id survives intact
    // 9 words contain two overlapping 8-windows; later copies lose all 9
    assert(out(2L) == ((9L, 9L, "")))
    assert(out(3L) == ((9L, 9L, "")))
  }

  test("intra-document repetition dedups against the doc's own earlier span") {
    val run8 = words("r", 8)
    val doc = (run8 ++ words("m", 4) ++ run8).mkString(" ")
    val out = run(Seq(1L -> doc))
    assert(out(1L)._1 == 20L)
    assert(out(1L)._2 == 8L)
    assert(out(1L)._3 == (run8 ++ words("m", 4)).mkString(" "))
  }

  test("mass duplication: one boilerplate run shared by many docs, all but the first cleaned") {
    // the shape the no-window respell exists for: one hot shingle set
    // shared corpus-wide must still resolve keep-first exactly
    val boiler = words("bp", 10)
    val docs = (1L to 40L).map(i =>
      i -> (Seq(s"u${i}a", s"u${i}b") ++ boiler ++ Seq(s"u${i}c")).mkString(" "))
    val out = run(docs)
    assert(out(1L)._2 == 0L) // first occurrence intact
    (2L to 40L).foreach { i =>
      assert(out(i)._2 == 10L, s"doc $i must lose the boilerplate run")
      assert(out(i)._3 == Seq(s"u${i}a", s"u${i}b", s"u${i}c").mkString(" "))
    }
  }

  /** Brute-force reference of the d48 rule: global keep-first over
    * sliding k-grams by (doc_id, pos), covered = union of dup windows. */
  private def reference(docs: Seq[(Long, String)], k: Int)
      : Map[Long, (Long, Long, String)] = {
    val first = scala.collection.mutable.Map.empty[String, (Long, Int)]
    for {
      (id, text) <- docs.sortBy(_._1)
      w = text.split(" ", -1)
      i <- 0 to w.length - k
    } {
      val g = w.slice(i, i + k).mkString(" ")
      if (!first.contains(g)) first(g) = (id, i)
    }
    docs.map { case (id, text) =>
      val w = text.split(" ", -1)
      val covered = scala.collection.mutable.Set.empty[Int]
      for (i <- 0 to w.length - k) {
        val g = w.slice(i, i + k).mkString(" ")
        if (first(g) != ((id, i))) covered ++= i until i + k
      }
      val cleaned = w.zipWithIndex.collect {
        case (word, i) if !covered(i) => word }.mkString(" ")
      id -> ((w.length.toLong, covered.size.toLong, cleaned))
    }.toMap
  }

  test("property: matches the brute-force rule on random collision-heavy corpora") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d") // tiny vocab forces collisions
    (1 to 20).foreach { trial =>
      val docs = (1L to (1 + rnd.nextInt(6)).toLong).map(i =>
        i -> Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      assert(run(docs) == reference(docs, 8), s"trial $trial: $docs")
    }
  }

  test("docs shorter than the window and empty docs pass through untouched") {
    val short = words("s", 7).mkString(" ")
    val out = run(Seq(1L -> short, 2L -> short, 3L -> ""))
    assert(out(1L) == ((7L, 0L, short)))
    assert(out(2L) == ((7L, 0L, short))) // too short to shingle: kept even as a copy
    assert(out(3L) == ((1L, 0L, ""))) // split("") = [""]: one empty word
  }
}
