package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Measurement-only main (optimization rounds, guide §1): runs the named
  * catalog queries once (after one untimed warmup) and prints, per query,
  * the DETERMINISTIC execution-shape counters — Spark jobs launched, stages
  * completed, tasks run, summed task time — plus wall seconds. Job/stage
  * counts are immune to the shared host's load swings, so they are the
  * attribution evidence for changes whose point is "one fewer driver job
  * per round" / "the final action no longer re-executes the loop's joins".
  * Same env contract as [[BenchExtra]] (SPARK_GRAFT_SF_DIR / _CPUS /
  * _ONLY / _SINK). Not part of the frozen driver surface. */
object JobStats {

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

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        taskMs += (for { a <- s.stageInfo.completionTime; b <- s.stageInfo.submissionTime }
          yield a - b).getOrElse(0L)
      }
    })

    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val sink = sys.env.getOrElse("SPARK_GRAFT_SINK", "count")
    val qlist = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    def runOnce(name: String,
                fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit = {
      spark.sparkContext.setJobDescription(name)
      sink match {
        case "noop" => fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        case _ => fn(spark, sfDir).count(): Unit
      }
      spark.sparkContext.setJobDescription(null)
    }

    qlist.foreach { case (n, fn) => runOnce(n, fn) } // warmup (uncounted below)
    val out = qlist.map { case (name, fn) =>
      // settle listener events from the warmup before zeroing
      Thread.sleep(500) // listener bus settle (listenerBus is private[spark])
      jobs = 0; stages = 0; tasks = 0; taskMs = 0L
      val t0 = System.nanoTime()
      runOnce(name, fn)
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener bus settle (listenerBus is private[spark])
      f""""$name":{"jobs":$jobs,"stages":$stages,"tasks":$tasks,"stage_ms":$taskMs,"sec":$sec%.3f}"""
    }
    println(s"""{"metric":"jobstats","queries":{${out.mkString(",")}},"sf":"$sfDir"}""")
    spark.stop()
  }
}
