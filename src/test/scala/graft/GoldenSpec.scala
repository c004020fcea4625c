package graft

import java.security.MessageDigest

/** Golden-output pin for the flagship query at sf0.001: the value was
  * recorded from a run whose output was bit-exact against the DuckDB
  * oracle (CORRECTNESS gate), so any drift here is a real semantic
  * regression, catchable by `sbt test` alone (no DuckDB needed).
  */
class GoldenSpec extends SparkSpec {

  private def canonical(df: org.apache.spark.sql.DataFrame): (Long, String) = {
    val cols = df.columns.sorted
    val rows = df.collect()
    val md = MessageDigest.getInstance("MD5")
    rows.foreach { r =>
      val line = cols.map { c =>
        val v = r.get(r.fieldIndex(c))
        if (v == null) "NULL" else v.toString
      }.mkString("|") + "\n"
      md.update(line.getBytes("UTF-8"))
    }
    (rows.length.toLong, md.digest().map("%02x".format(_)).mkString)
  }

  test("flagship climate_monthly output is pinned at sf0.001") {
    val (n, h) = canonical(pipeline.Climate.monthly.fn(spark, sfDir))
    assert(n === 719L)
    info(s"canonical hash: $h")
    assert(h === GoldenSpec.FlagshipHash)
  }
}

object GoldenSpec {
  /** Recorded 2026-08-12 from an oracle-verified run (see scaladoc). */
  val FlagshipHash = "d6c2f0540a69a828c653402aca18d6e5"
}
