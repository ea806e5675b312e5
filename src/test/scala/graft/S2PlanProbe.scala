package graft

import graft.core.Synth
import graft.docs.DocOps
import graft.runtime.DocPipeline
import org.apache.spark.sql.SparkSession

/** Round-4 diagnosis: decompose the S2 flagship leg stage by stage.
  * Run: Test/runMain graft.S2PlanProbe */
object S2PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = 2000000L
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val grid = Synth.modisGrid
    def spans = DocOps.interleave(DocPipeline.syntheticDocs(spark, n, 128))
    // warmups
    DocPipeline.run(spark, n / 100, 12, 32)
    DocPipeline.runS2(spark, n / 100, parallelism = 32)

    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        println(f"  [stage ${si.stageId}] tasks=${si.numTasks} " +
          f"runTime=${m.executorRunTime / 1000.0}%.1fs cpuTime=${m.executorCpuTime / 1e9}%.1fs " +
          f"gc=${m.jvmGCTime / 1000.0}%.1fs spillMem=${m.memoryBytesSpilled} " +
          f"in=${m.inputMetrics.recordsRead} shufR=${m.shuffleReadMetrics.recordsRead} " +
          f"shufW=${m.shuffleWriteMetrics.recordsWritten}")
      }
      private val taskMax = new java.util.concurrent.atomic.AtomicLong(0)
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val d = te.taskInfo.duration
        val prev = taskMax.getAndUpdate(x => math.max(x, d))
        if (d > 3000) println(f"    [slow task] stage=${te.stageId} dur=${d / 1000.0}%.1fs " +
          f"cpu=${te.taskMetrics.executorCpuTime / 1e9}%.1fs gc=${te.taskMetrics.jvmGCTime / 1000.0}%.1fs")
      }
    })
    time("s2 full runS2 #1") { println(DocPipeline.runS2(spark, n, parallelism = 128)) }
    spark.stop()
  }
}
