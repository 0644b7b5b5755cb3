package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: run selected SparkEntry queries with a stage listener and
  * print per-stage wall-clock, task counts and shuffle bytes — the
  * guide-§7 "which stage is slow" readout without the UI. Not part of the
  * measurement harness (Bench is the frozen surface).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    case class St(name: String, ms: Long, tasks: Int, shufR: Long,
        shufW: Long, input: Long)
    val stages = mutable.ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val dur = for {
          a <- si.completionTime; b <- si.submissionTime
        } yield a - b
        stages += St(si.name.takeWhile(_ != '\n'), dur.getOrElse(-1L),
          si.numTasks, si.taskMetrics.shuffleReadMetrics.totalBytesRead,
          si.taskMetrics.shuffleWriteMetrics.bytesWritten,
          si.taskMetrics.inputMetrics.bytesRead)
      }
    })
    graft.SparkEntry.all
      .filter(q => names.isEmpty || names.contains(q.name))
      .foreach { q =>
        // warm pass then profiled pass, so JIT/IO cache noise drops out
        (1 to 2).foreach { pass =>
          stages.clear()
          val t0 = System.nanoTime()
          q.fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          val total = (System.nanoTime() - t0) / 1e9
          if (pass == 2) {
            println(f"\n===== ${q.name} pass $pass total $total%.2f s " +
              f"(${stages.size} stages) =====")
            stages.sortBy(-_.ms).take(20).foreach { s =>
              println(f"  ${s.ms}%6d ms ${s.tasks}%4d tasks " +
                f"in=${s.input / 1024}%8d KB sr=${s.shufR / 1024}%8d KB " +
                f"sw=${s.shufW / 1024}%8d KB  ${s.name}%s")
            }
          }
        }
      }
    spark.stop()
  }
}
