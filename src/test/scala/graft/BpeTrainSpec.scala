package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** t54 BPE trainer correctness. The registered query is ALSO oracled
  * in DuckDB by unrolling the fixed-count loop (Text2Ops.bpeOracleCtes);
  * this spec carries the arbitrary-merge-count case via the d48
  * pattern: an in-JVM REFERENCE implementation of the exact rule — vocabulary from `[a-z]+` over lowercased text,
  * per-round adjacent-pair counts weighted by word frequency (every
  * position, overlaps included), argmax by (count DESC, left ASC,
  * right ASC), left-to-right non-overlapping re-pair — property-checked
  * against the distributed trainer on random collision-heavy corpora
  * over a 3-letter alphabet, plus a hand-computed case and determinism. */
class BpeTrainSpec extends AnyFunSuite {
  private lazy val spark = Spec.spark
  import spark.implicits._

  // ------------------------------------------------ reference trainer
  private def refMergeWord(syms: Vector[String], l: String, r: String,
                           m: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var carry: String = null
    syms.foreach { c =>
      if (carry == l && c == r) { out += m; carry = null }
      else if (carry == null) carry = c
      else { out += carry; carry = c }
    }
    if (carry != null) out += carry
    out.result()
  }

  private def refBpe(corpus: Seq[String], merges: Int)
      : Seq[(Int, String, String, String, Long)] = {
    var words: Map[Vector[String], Long] = corpus
      .flatMap(t => "[a-z]+".r.findAllIn(t.toLowerCase))
      .groupBy(identity).view
      .mapValues(_.size.toLong).toSeq
      .map { case (w, c) => w.split("").toVector -> c }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    var r = 0
    var done = false
    while (r < merges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, cnt) =>
        syms.sliding(2).foreach {
          case Seq(a, b) =>
            counts((a, b)) = counts.getOrElse((a, b), 0L) + cnt
          case _ => ()
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, rr), c) = counts.toSeq
          .sortBy { case ((a, b), n) => (-n, a, b) }.head
        val m = l + rr
        out += ((r + 1, l, rr, m, c))
        words = words.toSeq
          .map { case (syms, cnt) => refMergeWord(syms, l, rr, m) -> cnt }
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        r += 1
      }
    }
    out.result()
  }

  private def distributed(corpus: Seq[String], merges: Int) =
    graft.text.Text2Ops.bpeTrain(
      corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), merges)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq

  test("hand case: classic low/lower/newest corpus") {
    // Sennrich's running example, adapted: frequencies force the order
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val got = distributed(Seq(corpus.mkString(" ")), 4)
    assert(got == refBpe(Seq(corpus.mkString(" ")), 4), got)
    // first merge must be the most frequent pair: (e,s) 9 or (s,t) 9 or
    // (w,e) 2+6=8... (e,s) and (s,t) tie at 9 → lexicographic: (e,s)
    assert(got.head._2 == "e" && got.head._3 == "s" && got.head._5 == 9L,
      got.head)
  }

  test("property: matches the reference on random collision-heavy corpora") {
    val rnd = new scala.util.Random(1234)
    (1 to 12).foreach { trial =>
      // 3-letter alphabet, short words → heavy pair collisions and ties
      val words = Seq.fill(30 + rnd.nextInt(40))(
        (0 to rnd.nextInt(5)).map(_ => "abc" (rnd.nextInt(3))).mkString)
      val docs = Seq.fill(8)(
        Seq.fill(1 + rnd.nextInt(12))(words(rnd.nextInt(words.size)))
          .mkString(" "))
      val n = 1 + rnd.nextInt(8)
      val got = distributed(docs, n)
      val want = refBpe(docs, n)
      assert(got == want,
        s"trial $trial (merges=$n):\n got=$got\nwant=$want\ndocs=$docs")
    }
  }

  test("deterministic and exhaustion-safe") {
    val docs = Seq("aa ab aa ba", "ab aa")
    val a = distributed(docs, 50) // more merges than the corpus supports
    val b = distributed(docs, 50)
    assert(a == b)
    assert(a == refBpe(docs, 50))
    assert(a.size < 50, "must stop when no pair remains")
  }

  test("bpeApply: trained merges re-tokenize like the reference (t54b)") {
    val rnd = new scala.util.Random(77)
    (1 to 6).foreach { trial =>
      val words = Seq.fill(20 + rnd.nextInt(30))(
        (0 to rnd.nextInt(5)).map(_ => "abc" (rnd.nextInt(3))).mkString)
      val docs = (1L to 6L).map(i => (i,
        Seq.fill(1 + rnd.nextInt(10))(words(rnd.nextInt(words.size)))
          .mkString(" ")))
      val n = 1 + rnd.nextInt(6)
      val merges = refBpe(docs.map(_._2), n)
        .map { case (_, l, r, m, _) => (l, r, m) }
      // reference application: fold each word through the merge list
      val want = docs.flatMap { case (id, t) =>
        val ws = "[a-z]+".r.findAllIn(t.toLowerCase).toSeq
        if (ws.isEmpty) None
        else Some((id, ws.size.toLong,
          ws.map(w => merges.foldLeft(w.split("").toVector) {
            case (syms, (l, r, m)) => refMergeWord(syms, l, r, m)
          }.size.toLong).sum))
      }.sortBy(_._1)
      val got = graft.text.Text2Ops.bpeApply(
        docs.toDF("doc_id", "text"), merges).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == want,
        s"trial $trial (merges=$n):\n got=$got\nwant=$want\ndocs=$docs")
    }
  }
}
