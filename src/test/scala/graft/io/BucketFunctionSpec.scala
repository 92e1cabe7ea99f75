package graft.io

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The three definitions of "which bucket" — the write path's
  * pmod(hash(col), n) column expression, the plan-time
  * TxnTable.bucketOf (bucket pruning), and the catalog-served V2
  * GraftBucketFunction (SPJ clustering) — MUST agree on every value:
  * a one-value disagreement silently prunes the wrong files. */
class BucketFunctionSpec extends AnyFunSuite {
  lazy val spark = graft.Spec.spark
  import spark.implicits._

  private def writePathBuckets[T](vals: Seq[T], dt: DataType, n: Int)
      (implicit enc: org.apache.spark.sql.Encoder[T]): Seq[Int] = {
    val df = vals.toDF("c")
    df.select(pmod(hash($"c"), lit(n)).as("b"))
      .collect().map(_.getInt(0)).toSeq
  }

  private def v2FunctionBuckets(vals: Seq[Any], dt: DataType, n: Int): Seq[Int] = {
    val bound = GraftBucketFunction.bind(StructType(Seq(
      StructField("n", IntegerType), StructField("c", dt))))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Int]]
    vals.map { v =>
      val cat = org.apache.spark.sql.catalyst.CatalystTypeConverters
        .convertToCatalyst(v)
      bound.produceResult(
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](n, cat)))
    }
  }

  test("long keys: write expr == bucketOf == V2 function, n = 8 and 16") {
    val vals = Seq(0L, 1L, 7L, -7L, 42L, Long.MaxValue, Long.MinValue + 1,
      123456789L) ++ (0 until 50).map(i => i * 7919L - 1000L)
    for (n <- Seq(8, 16)) {
      val write = writePathBuckets(vals, LongType, n)
      val plan = vals.map(v => TxnTable.bucketOf(v, LongType, n).get)
      val fn = v2FunctionBuckets(vals, LongType, n)
      assert(write == plan, s"write vs bucketOf disagree at n=$n")
      assert(write == fn, s"write vs V2 function disagree at n=$n")
      assert(write.forall(b => b >= 0 && b < n))
    }
  }

  test("string keys agree too, including unicode") {
    val vals = Seq("", "a", "user-7", "ação", "東京", "x" * 1000) ++
      (0 until 50).map(i => s"key_$i")
    val n = 8
    val write = writePathBuckets(vals, StringType, n)
    val plan = vals.map(v => TxnTable.bucketOf(v, StringType, n).get)
    val fn = v2FunctionBuckets(vals, StringType, n)
    assert(write == plan && write == fn)
  }

  test("int keys: type-sensitive hashing stays consistent per declared type") {
    val vals = Seq(0, 1, 7, -7, 42, Int.MaxValue)
    val n = 8
    val write = writePathBuckets(vals, IntegerType, n)
    val plan = vals.map(v => TxnTable.bucketOf(v, IntegerType, n).get)
    val fn = v2FunctionBuckets(vals.map(v => v: Any), IntegerType, n)
    assert(write == plan && write == fn)
    // an Int and a Long of the same value hash DIFFERENTLY — the
    // declared column type decides, never the runtime box (some values
    // may collide mod 64; at least one of 21 must differ)
    assert((0 to 20).exists(i => TxnTable.bucketOf(i, IntegerType, 64) !=
      TxnTable.bucketOf(i.toLong, LongType, 64)))
  }
}
