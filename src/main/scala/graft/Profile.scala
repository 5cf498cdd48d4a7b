package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev utility (guide §1: measure first): run ONE declared key and print a
  * per-job / per-stage breakdown — job wall-clock, stage task totals, task
  * counts, shuffle bytes — so optimization targets the measured cost, not a
  * guess. A SparkListener collects the events; the key runs once untimed
  * (JIT/codegen warm-up, same discipline as Bench's isolated measure) and
  * once instrumented.
  *
  * Usage: scripts/run.sh graft.Profile <key> [sfDir]
  */
object Profile {
  private case class StageRec(name: String, tasks: Int, wallMs: Long,
                              taskMs: Long, shufRead: Long, shufWrite: Long)

  def main(args: Array[String]): Unit = {
    val key = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val fn = SparkEntry.queries(key)

    // warm pass (untimed)
    val tw0 = System.nanoTime()
    fn(spark, dir).count()
    val warmSec = (System.nanoTime() - tw0) / 1e9

    val jobs = mutable.Map.empty[Int, (Long, String)] // id -> (start, desc)
    val jobDur = mutable.ArrayBuffer.empty[(Int, Long, String)]
    val stages = mutable.ArrayBuffer.empty[StageRec]
    val taskAgg = mutable.Map.empty[Int, (Long, Long, Long)] // stageId -> (taskMs, sr, sw)
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs(e.jobId) = (e.time, Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse(""))
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach { case (t0, d) =>
          jobDur += ((e.jobId, e.time - t0, d)) }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          val (a, b, c) = taskAgg.getOrElse(e.stageId, (0L, 0L, 0L))
          taskAgg(e.stageId) = (a + m.executorRunTime,
            b + m.shuffleReadMetrics.totalBytesRead,
            c + m.shuffleWriteMetrics.bytesWritten)
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = (for (a <- si.completionTime; b <- si.submissionTime)
          yield a - b).getOrElse(0L)
        val (tms, sr, sw) = taskAgg.getOrElse(si.stageId, (0L, 0L, 0L))
        stages += StageRec(si.name.takeWhile(_ != '\n').take(90),
          si.numTasks, wall, tms, sr, sw)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val n = fn(spark, dir).count()
    val sec = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    // listener bus is async; drain before reading
    Thread.sleep(500)

    println(f"[profile] $key rows=$n warm=$warmSec%.2f s timed=$sec%.2f s  jobs=${jobDur.size}  stages=${stages.size}")
    val totJob = jobDur.map(_._2).sum
    println(f"[profile] sum(job wall)=${totJob / 1000.0}%.2f s (gaps to timed = driver/plan time)")
    println("-- jobs by duration --")
    jobDur.sortBy(-_._2).take(25).foreach { case (id, ms, d) =>
      println(f"  job $id%4d ${ms / 1000.0}%7.3f s  ${d.take(80)}")
    }
    println("-- stages by wall --")
    stages.sortBy(-_.wallMs).take(30).foreach { s =>
      println(f"  ${s.wallMs / 1000.0}%7.3f s wall ${s.taskMs / 1000.0}%8.3f s tasks n=${s.tasks}%3d sr=${s.shufRead}%9d sw=${s.shufWrite}%9d  ${s.name}")
    }
    val nTasks = stages.map(_.tasks).sum
    println(f"[profile] total tasks=$nTasks  total task-ms=${stages.map(_.taskMs).sum}")
    spark.stop()
  }
}
