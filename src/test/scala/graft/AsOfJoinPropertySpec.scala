package graft

import java.sql.Timestamp

import graft.plans.AsOfJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized differential test for the hand-written AsOfJoinExec merge:
  * the custom per-partition algorithm must agree with the relational
  * argmax formulation (theta-join + rank-1 window) on arbitrary keyed
  * time-series — including the adversarial shapes a fixed fixture can
  * miss: duplicate left timestamps, duplicate right timestamps needing
  * the tiebreak, keys appearing on only one side, dense time collisions
  * across keys, and key groups split across many input partitions
  * before the exchange.
  */
class AsOfJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Long) = new Timestamp(m * 60000L)

  private def relationalOracle(l: DataFrame, r: DataFrame): DataFrame = {
    val w = Window.partitionBy($"lid")
      .orderBy($"rts".desc_nulls_last, $"rid".desc_nulls_last)
    l.join(r, $"rk" === $"lk" && $"rts" <= $"lts", "left")
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"lid", $"rid", $"rv")
  }

  test("native merge == relational argmax on randomized inputs (3 seeds)") {
    for (seed <- Seq(7, 42, 1234)) {
      val rnd = new Random(seed)
      // few keys + small time domain => plenty of collisions and ties
      val left = (1 to 300).map { i =>
        (i.toLong, rnd.nextInt(6).toLong, ts(rnd.nextInt(50).toLong))
      }.toDF("lid", "lk", "lts").repartition(7) // scatter pre-exchange
      val right = (1 to 300).map { i =>
        (i.toLong, rnd.nextInt(8).toLong, ts(rnd.nextInt(50).toLong),
          rnd.nextInt(1000) / 100.0)
      }.toDF("rid", "rk", "rts", "rv").repartition(5)
      val native = AsOfJoin
        .leftJoin(left, right, Seq("lk"), Seq("rk"), "lts", "rts", Seq("rid"))
        .select($"lid", $"rid", $"rv")
      val oracle = relationalOracle(left, right)
      assert(native.exceptAll(oracle).isEmpty &&
        oracle.exceptAll(native).isEmpty,
        s"seed $seed: native as-of join diverged from relational argmax")
      assert(native.count() === 300L) // left-outer: every left row once
    }
  }
}
