package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for catalog queries to plans/<dir>/ files
  * (the optimization rounds' plan-evidence artifacts; guide §7.2).
  *
  *  - SPARK_GRAFT_ONLY=q_a,q_b: restrict to the named queries.
  *  - SPARK_GRAFT_PLAN_DIR (default plans/r06): output directory.
  *  - SPARK_GRAFT_PLAN_TAG (default "before"): file suffix. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.sources.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val dir = new java.io.File(sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r06"))
    dir.mkdirs()
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "before")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val f = new java.io.File(dir, s"${name}_$tag.txt")
          val w = new java.io.PrintWriter(f, "UTF-8")
          try w.write(plan) finally w.close()
          System.err.println(s"[plandump] wrote $f")
        } catch { case t: Throwable =>
          System.err.println(s"[plandump] $name FAILED: ${t.getMessage}")
        }
      }
    spark.stop()
  }
}
