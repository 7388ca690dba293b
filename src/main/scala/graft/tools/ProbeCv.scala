package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Tables, VectorOps}

/** Round-21 micro-probe: q_sim_ivf centroid-chain variants, interleaved.
  * Usage: runMain graft.tools.ProbeCv [sfDir] [reps]
  */
object ProbeCv {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val spark = { graft.engine.Session.pinLocale(); SparkSession.builder() }
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e0 = Tables.embeddings(spark, sfDir)
    val dn = e0.agg(max(size(col("embedding"))), count(lit(1))).head()
    val dim = dn.getInt(0)
    val bits = {
      val n = dn.getLong(1); val cells = math.max(1L, (n - 1) / 256)
      math.min(12, math.max(4, 64 - java.lang.Long.numberOfLeadingZeros(cells))).toInt
    }
    val e = e0.select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("cell", VectorOps.lshSignature(col("v"), dim, bits))
      .cache()
    e.count()

    def oldCv(): DataFrame = {
      val cent = e
        .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cell", "dim")
        .agg((sum(col("x").cast("decimal(20,8)")).cast("double") / count(lit(1))).as("c"))
      cent.groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("c")))),
          sc => sc.getField("c")).as("cv"))
    }
    def newCv(): DataFrame =
      e.groupBy("cell")
        .agg(array((1 to dim).map { i =>
          val x = element_at(col("v"), i)
          sum(x.cast("decimal(20,8)")).cast("double") / count(x)
        }: _*).as("cv"))
    // variant: double sums (NOT oracle-exact; reference only)
    def dblCv(): DataFrame =
      e.groupBy("cell")
        .agg(array((1 to dim).map { i =>
          val x = element_at(col("v"), i)
          sum(x).cast("double") / count(x)
        }: _*).as("cv"))

    def time(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val variants = Seq("old2step" -> (() => oldCv()), "wideDec" -> (() => newCv()),
      "wideDbl" -> (() => dblCv()))
    variants.foreach { case (_, f) => time(f()) } // warm
    val acc = variants.map { case (n, _) => n -> scala.collection.mutable.ArrayBuffer.empty[Double] }.toMap
    (1 to reps).foreach { _ =>
      variants.foreach { case (n, f) => acc(n) += time(f()) }
    }
    variants.foreach { case (n, _) =>
      val xs = acc(n)
      println(f"$n%-10s min=${xs.min}%.3f med=${xs.sorted.apply(xs.size / 2)}%.3f " +
        xs.map(x => f"$x%.2f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
}
