package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** User-defined function surface (SURVEY.md §2 "UDF/UDAF" — the
  * reference lists 自定义函数 only as roadmap, /root/reference/
  * README.md:112). Demonstrates the two Spark-native extension tiers
  * below a custom Catalyst expression:
  *
  *  - scalar `udf()` — here a text-quality scorer (black-box Scala; the
  *    codegen'd column-expression version in TextOps is preferred in the
  *    hot path, this is the escape hatch for logic SQL can't express);
  *  - typed `Aggregator` → `udaf()` — a geometric mean, whose SQL twin
  *    exp(avg(ln(x))) makes it oracle-checkable.
  */
object Udfs {

  /** Geometric mean over positive doubles: exp(mean(ln x)). */
  object GeoMean extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), x: Double): (Double, Long) =
      if (x > 0) (b._1 + math.log(x), b._2 + 1) else b
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (Double, Long)): Double =
      if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
    def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Scalar UDF example: crude vowel-density score of a string. */
  val vowelDensity: String => Double = s =>
    if (s == null || s.isEmpty) 0.0
    else s.count("aeiouAEIOU".contains(_)).toDouble / s.length

  /** Register both on a session for SQL use (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("geo_mean", udaf(GeoMean))
    spark.udf.register("vowel_density", vowelDensity)
  }
}
