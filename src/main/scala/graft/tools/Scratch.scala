package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling experiments (dev only). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    import graft.core.{Tables, Text}
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), Text.words(col("text")).as("w"))
      .filter(size(col("w")) >= 3)

    val hs = docs
      .select(col("doc_id"), Text.shingles("w").as("sh"))
      .select(col("doc_id"),
        expr("transform(sh, x -> CAST(conv(substr(md5(x), 1, 8), 16, 10) AS BIGINT))").as("hs"))

    time("hs only")(hs.count())
    time("hs materialize cost")(
      hs.select(col("doc_id"), expr("array_min(hs)").as("m")).count())
    val P = Text.P
    val one = hs.select(col("doc_id"),
      expr(s"CAST(array_min(transform(hs, x -> (3 * x + 1) % $P)) AS BIGINT)").as("m0"))
    time("1 minhash")(one.count())
    val twelve = hs.select(col("doc_id") +: (0 until 12).map(j =>
      expr(s"CAST(array_min(transform(hs, x -> (${Text.MinhashA(j)} * x + ${Text.minhashB(j)}) % $P)) AS BIGINT)").as(s"m$j")): _*)
    time("12 minhash")(twelve.count())
    val sets = hs.select(col("doc_id"), expr("array_sort(array_distinct(hs))").as("s"))
    time("distinct sets")(sets.count())

    val bandStructs = (0 until 4).map { b =>
      val ks = (0 until 3).map(r => s"m${b * 3 + r}")
      s"struct($b AS band, concat(${ks.mkString(", '|', ")}) AS bkey)"
    }.mkString(", ")
    val bands = twelve.select(col("doc_id"),
        explode(expr(s"array($bandStructs)")).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.bkey").as("bkey"))
    time("bands")(bands.count())
    val pairs = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    time("pairs")(pairs.count())
    time("pairs again")(pairs.count())
    val joined = pairs
      .join(twelve.as("s1"), col("d1") === col("s1.doc_id"))
      .join(twelve.as("s2"), col("d2") === col("s2.doc_id"))
    time("pairs+sig join")(joined.count())
    val withSets = pairs
      .join(sets.select(col("doc_id").as("d1"), col("s").as("sh1")), Seq("d1"))
      .join(sets.select(col("doc_id").as("d2"), col("s").as("sh2")), Seq("d2"))
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
    time("pairs+sets+intersect")(withSets.count())
    time("registered ngram")(
      graft.SparkEntry.queries("ngram_jaccard_pairs")(spark, sfDir).count())
    time("registered ngram again")(
      graft.SparkEntry.queries("ngram_jaccard_pairs")(spark, sfDir).count())
    time("registered minhash")(
      graft.SparkEntry.queries("minhash_lsh_pairs")(spark, sfDir).count())
    spark.stop()
  }
}
