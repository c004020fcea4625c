package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage attribution for the embedding near-dup family's sf1→sf10 probe
  * steps (round-15 verdict task 3): separates CANDIDATE GENERATION +
  * in-bucket scoring (the [[Extended.embScoredPairs]] subtree both
  * queries share) from each query's verify/output tail, and prints the
  * ladder state + candidate volume so the step ratio can be attributed
  * to band activation vs corpus growth vs a residual quadratic.
  *
  * Usage: runMain graft.ops.EmbStageProbe <sfDir>
  */
object EmbStageProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "24")}]")
      .appName("graft-emb-stage-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[emb-stage] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val vs = Extended.vecs(spark, d)
    val nv = vs.count()
    val nb = spark.sql(s"SELECT ${Extended.nbLadder(nv.toString)} AS nb, " +
      s"${Extended.nBandsLadder(nv.toString)} AS nbands").head()
    println(s"[emb-stage] dir=$d vectors=$nv nb=${nb.getInt(0)} nbands=${nb.getInt(1)}")

    val cand = time("candidates+score (shared embScoredPairs subtree)") {
      Extended.embScoredPairs(vs).count()
    }
    println(s"[emb-stage] scored candidate pairs = $cand")
    val nd = time("embed_near_dup full") {
      Extended.embedNearDup.fn(spark, d).count()
    }
    println(s"[emb-stage] embed_near_dup rows = $nd")
    val pp = time("paraphrase_pairs full") {
      Extended.paraphrasePairs.fn(spark, d).count()
    }
    println(s"[emb-stage] paraphrase_pairs rows = $pp")
    spark.stop()
  }
}
