package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // default 100-entry codegen cache evicts constantly across 70
      // queries x 2 passes -> Janino recompiles every stage every pass
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Two passes; report per-query MIN. Pass 1 doubles as JIT warmup
    // (codegen/HOF paths JIT per query: 2-5x on first execution — e.g.
    // embed_near_dup 7.6 s cold vs 1.9 s steady-state at sf0.1); the min
    // also shields a single run from sporadic environment pauses.
    def pass(): Map[String, Double] =
      SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }
    val p1 = pass()
    val p2 = pass()
    val results = p1.map { case (name, t1) =>
      val t2 = p2.getOrElse(name, -1.0)
      // -1 marks failure; only take min over successful runs
      val best = Seq(t1, t2).filter(_ >= 0) match {
        case Nil => -1.0
        case ts  => ts.min
      }
      name -> best
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // Regression guard: compare per-query vs the committed round baseline
    // (bench_baseline.json, refreshed each round). Queries above the 0.5 s
    // noise floor that run >2x slower are flagged — on stderr AND as an
    // extra JSON field — so a round never ships a silent perf regression.
    val regressions = baseline() match {
      case b if b.nonEmpty =>
        results.collect {
          case (name, t)
              if t > 0 && b.get(name).exists(o => o > 0.5 && t > 2 * o) =>
            name -> BigDecimal(t / b(name)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        }
      case _ => Map.empty[String, BigDecimal]
    }
    if (regressions.nonEmpty)
      System.err.println("BENCH REGRESSIONS >2x vs bench_baseline.json: " +
        regressions.map { case (k, r) => s"$k (${r}x)" }.mkString(", "))
    val regJson = regressions.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"regressions":$regJson,"sf":"$sfDir"}""")
    spark.stop()
  }

  /** Per-query seconds from bench_baseline.json (empty if absent). The
    * driver's BENCH_r{N}.json wraps the metric line escaped inside a
    * "tail" field — unescape before searching so both the raw line and
    * the wrapped form parse.
    */
  private def baseline(): Map[String, Double] =
    try {
      val txt = scala.io.Source.fromFile("bench_baseline.json").mkString
        .replace("\\\"", "\"")
      val qstart = txt.indexOf("\"queries\":{")
      if (qstart < 0) Map.empty
      else {
        val body = txt.substring(qstart + 11, txt.indexOf("}", qstart))
        body.split(",").toSeq.flatMap { kv =>
          kv.split(":") match {
            case Array(k, v) =>
              try Some(k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toDouble)
              catch { case _: NumberFormatException => None }
            case _ => None
          }
        }.toMap
      }
    } catch { case _: Throwable => Map.empty }
}
