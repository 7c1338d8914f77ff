package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for declared queries to text files — the
  * optimization-round evidence trail (`plans/r<n>/<query>_<tag>.txt`).
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <tag> [q1,q2,...]
  *   (no list = every query in SparkEntry.queries)
  *
  * The plan is captured from the UNEXECUTED DataFrame (initial plan,
  * `AdaptiveSparkPlan isFinalPlan=false` where AQE applies): that is where
  * scan pushdown (PushedFilters/ReadSchema), join strategy and Exchange
  * placement are decided and reviewable without timing noise.
  *
  * `SPARK_GRAFT_PLAN_EXEC=1` (r19): additionally EXECUTE each query before
  * dumping, so the file carries the FINAL adaptive plan
  * (`isFinalPlan=true`) — the only place AQE-time decisions (ReusedExchange
  * stage reuse, AQEShuffleRead coalescing, runtime join demotions) are
  * visible. Battery queries all have small outputs, so the collect that
  * finalizes the plan in place is bounded.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val execMode = sys.env.get("SPARK_GRAFT_PLAN_EXEC").exists(_.nonEmpty)
    val only = args.lift(2).map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          if (execMode) df.collect() // finalize the adaptive plan in place
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), plan)
          System.err.println(s"[plandump] wrote $name")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
        }
      }
    graft.queries.CacheSlot.releaseAll()
    spark.stop()
  }
}
