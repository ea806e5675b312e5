package graft

import org.apache.spark.sql.SparkSession

/** Extra measurement harness for the optimization rounds (guide §1.4/§1.5):
  * per-query min-of-N timing with a selectable sink, separate from the
  * FROZEN driver-contract [[Bench]] main.
  *
  *  - SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS: same contract as Bench.
  *  - SPARK_GRAFT_ONLY=q_a,q_b: restrict to the named catalog queries.
  *  - SPARK_GRAFT_ROUNDS=N (default 3): timed rounds per query (min kept);
  *    one untimed warmup round always runs first (JIT/codegen).
  *  - SPARK_GRAFT_SINK=count|noop (default count, matching Bench's action;
  *    noop computes EVERY column of every row — including the catalog
  *    wrapper's oracle-protocol sort — and discards it).
  *
  * Each measurement is labelled via setJobDescription so the SQL/stage view
  * attributes time to the right query. Prints one JSON line. */
object BenchExtra {

  def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def loadavg(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage

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
    spark.sparkContext.setLogLevel("WARN")

    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val rounds = sys.env.getOrElse("SPARK_GRAFT_ROUNDS", "3").toInt
    val sink = sys.env.getOrElse("SPARK_GRAFT_SINK", "count")
    val qlist = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit = {
      spark.sparkContext.setJobDescription(name)
      sink match {
        case "noop" => fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        case _ => fn(spark, sfDir).count(): Unit
      }
      spark.sparkContext.setJobDescription(null)
    }

    // warmup pass (untimed), then interleaved timed rounds so a host-load
    // burst hits all queries equally (same protocol as Bench)
    qlist.foreach { case (n, fn) => runOnce(n, fn) }
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    (1 to rounds).foreach { r =>
      val la = loadavg()
      System.err.println(f"[benchx] round $r/$rounds loadavg=$la%.1f")
      qlist.foreach { case (name, fn) =>
        val (_, sec) = time { runOnce(name, fn) }
        samples(name) = sec :: samples(name)
        System.err.println(f"[benchx] $name: $sec%.2f s (round $r, loadavg=$la%.1f)")
      }
    }
    val qs = qlist.map { case (k, _) => "\"" + k + f"\":${samples(k).min}%.3f" }
      .mkString("{", ",", "}")
    val total = qlist.map { case (k, _) => samples(k).min }.sum
    println(f"""{"metric":"extra","value":$total%.2f,"unit":"sec","sink":"$sink","queries":$qs,"sf":"$sfDir","loadavg_end":${loadavg()}%.1f}""")
    spark.stop()
  }
}
