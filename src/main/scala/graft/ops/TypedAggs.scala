package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** Typed `Aggregator` surface (SURVEY.md §2.10): user-defined aggregation
  * over `Dataset[T]` with a mergeable buffer — the Spark-native UDAF.
  *
  * WeightedMean keeps BOTH running sums in BigDecimal at scale 6, so the
  * merge is associative/commutative and the result is independent of
  * partition merge order — the same bit-stability contract as Num.dsum.
  * `BigDecimal.valueOf(double)` is deliberately the same double→decimal
  * path Spark's `cast(DECIMAL)` uses (shortest-repr string, HALF_UP), so
  * the DuckDB oracle `dsum(x*w)/dsum(w)` matches exactly. */
object TypedAggs {

  type Buf = (JBigDecimal, JBigDecimal) // (Σ value*weight, Σ weight)

  private def dec(d: Double): JBigDecimal =
    JBigDecimal.valueOf(d).setScale(6, RoundingMode.HALF_UP)

  /** Weighted mean of `value` with weight `weight` over (value, weight)
    * pairs. Returns Double (exact decimal sums, one final double divide). */
  val weightedMean: Aggregator[(Double, Double), Buf, Double] =
    new Aggregator[(Double, Double), Buf, Double] {
      override def zero: Buf = (JBigDecimal.ZERO, JBigDecimal.ZERO)
      override def reduce(b: Buf, a: (Double, Double)): Buf =
        (b._1.add(dec(a._1 * a._2)), b._2.add(dec(a._2)))
      override def merge(x: Buf, y: Buf): Buf =
        (x._1.add(y._1), x._2.add(y._2))
      override def finish(b: Buf): Double =
        if (b._2.signum() == 0) Double.NaN
        else b._1.doubleValue() / b._2.doubleValue()
      override def bufferEncoder: Encoder[Buf] =
        Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
}
