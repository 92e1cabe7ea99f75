package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.GraftExtensions
import graft.text.TextFunctions

/** Cross-validation of the text/dedup building blocks, including the
  * native expressions against their SQL spellings. */
class TextFunctionsSpec extends AnyFunSuite {

  lazy val spark = Spec.spark
  import spark.implicits._

  test("native minhash_sig equals the higher-order-function spelling") {
    GraftExtensions.install(spark)
    val rnd = new scala.util.Random(3)
    val docs = (1 to 30).map(_ =>
      Seq.fill(1 + rnd.nextInt(40))(rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString))
    val df = docs.toDF("sh")
    val both = df.select(
      expr("minhash_sig(sh, 8)").as("native"),
      expr("""transform(sequence(1, 8),
             | i -> array_min(transform(sh, s -> md5(concat(cast(i AS string), ':', s)))))"""
        .stripMargin).as("hof"))
      .collect()
    both.foreach { r => assert(r.getSeq[String](0) == r.getSeq[String](1)) }
  }

  test("simhash16 column equals the top 16 bits of native simhash64") {
    GraftExtensions.install(spark)
    val docs = Seq("spark engine dedup pipeline", "a b c", "x").toDF("text")
    val rows = docs
      .withColumn("toks", TextFunctions.tokens($"text"))
      .withColumn("hs", expr("transform(toks, t -> md5(t))"))
      .select(
        TextFunctions.simhashBits("hs", 16).as("bits16"),
        expr("simhash64(toks)").as("h64"))
      .collect()
    rows.foreach { r =>
      val fromNative = (48 to 63).reverse
        .map(b => if (((r.getLong(1) >> b) & 1L) == 1L) '1' else '0').mkString
      assert(r.getString(0) == fromNative)
    }
  }

  test("tokenNgrams guards short inputs (Spark sequence(1,0) is descending!)") {
    val df = Seq("", "one", "one two", "one two three").toDF("text")
      .withColumn("toks", TextFunctions.tokens($"text"))
      .select(size(TextFunctions.tokenNgrams("toks", 3)).as("n3"),
        size(TextFunctions.tokenNgrams("toks", 2)).as("n2"))
      .collect()
    assert(df.map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Seq((0, 0), (0, 0), (0, 1), (1, 2)))
  }

  test("nfc: composes decomposed sequences, ASCII passes through, SQL-callable, codegen") {
    GraftExtensions.install(spark)
    val decomposed = "a\u0301" // a + combining acute
    val composed = "\u00e1"    // precomposed LATIN SMALL LETTER A WITH ACUTE
    val r = spark.sql(
      s"SELECT nfc('$decomposed') AS c, nfc('plain ascii') AS a, " +
        "nfc(CAST(NULL AS STRING)) AS n").head()
    assert(r.getString(0) == composed && r.getString(0).length == 1)
    assert(r.getString(1) == "plain ascii")
    assert(r.isNullAt(2))
    // already-NFC non-ASCII is returned unchanged
    assert(spark.sql("SELECT nfc('caf\u00e9')").head().getString(0) == "caf\u00e9")
    // stays inside whole-stage codegen over a real source
    val plan = graft.io.Tables.documents(spark, Spec.sf0001)
      .selectExpr("nfc(text) AS t")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [nfc"), plan)
  }

  test("jaccard: identity 1.0, disjoint 0.0, both-empty null") {
    val df = Seq(
      (Seq("a", "b"), Seq("a", "b")),
      (Seq("a"), Seq("b")),
      (Seq.empty[String], Seq.empty[String]))
      .toDF("x", "y")
      .select(TextFunctions.jaccard($"x", $"y").as("j"))
      .collect()
    assert(df(0).getDouble(0) == 1.0)
    assert(df(1).getDouble(0) == 0.0)
    assert(df(2).isNullAt(0))
  }
}
