package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Local-iteration filter; the driver sets no env so it always runs all.
    val only = sys.env.get("GRAFT_VERIFY_ONLY").map(_.split(",").toSet)
    val failed = scala.collection.mutable.ListBuffer.empty[(String, String)]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        graft.core.PrepClock.drainSeconds() // clear residue from a failed prior gate
        val t0 = System.nanoTime()
        // repartition(1), NOT coalesce(1): coalesce propagates up to the
        // previous shuffle boundary, collapsing the gate's final stage
        // (sort/agg included) into ONE task — a 116M-row per-doc sort
        // measured 218 s single-task vs ~10 s parallel at the 1000x
        // replica. repartition adds one Exchange of the OUTPUT rows only
        // (k-bounded for most gates) and still writes a single file.
        fn(spark, sfDir).repartition(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // stderr timing per gate: scale sweeps read these for the
        // per-decade scaling evidence (coalesce(1) write included — at
        // big outputs that single task is harness cost, not operator
        // cost; see the memory-file note)
        // prep segment (fixture/ingest cost flagged via PrepClock, e.g.
        // stream slice-file writes) reported separately so scale sweeps
        // can attribute ingest-inclusive gates
        val prep = graft.core.PrepClock.drainSeconds()
        val prepNote = if (prep > 0.005) f" (prep $prep%.2f s)" else ""
        System.err.println(
          f"[verify] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s" + prepNote)
        // release completed-gate blocks (same in-suite degradation guard
        // as Bench.sweepBlocks — gates rebuild every frame per invocation,
        // so everything still registered is garbage). IndexCatalog.clear
        // makes the registry invariant explicit (r14 advice #1).
        graft.plans.IndexCatalog.clear()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
      catch { case e: Throwable =>
        // A thrown query must FAIL the round, not vanish from it: write a
        // one-row poison result whose schema can never match any oracle,
        // so the driver's compare records an explicit mismatch instead of
        // silently omitting the query (r7: q_sessionize disappeared from
        // CORRECTNESS with no err record).
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failed += name -> String.valueOf(e.getMessage).take(500)
        try {
          import spark.implicits._
          Seq(("VERIFY_QUERY_THREW", String.valueOf(e.getMessage).take(500)))
            .toDF("__verify_error", "__verify_message")
            .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case _: Throwable => }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // machine-readable failure manifest next to the results (driver may or
    // may not read it; the poison parquet above is the hard gate)
    val errJson = failed
      .map { case (k, m) => s"${q(k)}: ${q(m)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_errors.json"), errJson)
    if (failed.nonEmpty)
      System.err.println(s"[verify] ${failed.size} queries FAILED: " +
        failed.map(_._1).mkString(", "))
    spark.stop()
  }
}
