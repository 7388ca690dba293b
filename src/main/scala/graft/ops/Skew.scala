package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §4: "skewed keys → salting or
  * AQE skew-join"). AQE handles skew adaptively at runtime; explicit
  * salting is the static alternative when a hot key is known up front —
  * e.g. a power-law user_id in an events⋈profile join at 100 TB.
  */
object Skew {

  /** Equi-join with the left side's hot keys spread over `salts`
    * sub-partitions. The left row's salt is derived deterministically
    * from a discriminator column; the right side is replicated `salts`
    * times so every (key, salt) pair finds its match. Result is
    * row-identical to the plain equi-join.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, discriminator: String, salts: Int): DataFrame = {
    val salted = left.withColumn("_salt",
      pmod(xxhash64(col(leftKey), col(discriminator)), lit(salts.toLong)))
    val replicated = right
      .withColumn("_salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted.join(replicated,
        salted("_salt") === replicated("_salt") &&
          salted(leftKey) === replicated(rightKey))
      .drop("_salt")
  }
}
