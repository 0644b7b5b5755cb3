package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for selected SparkEntry queries
  * (pushdown / broadcast / WholeStageCodegen audit). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val exec = sys.env.get("SPARK_GRAFT_EXPLAIN_EXEC").contains("1")
    graft.SparkEntry.all
      .filter(q => names.isEmpty || names.contains(q.name))
      .foreach { q =>
        println(s"\n===================== ${q.name} =====================")
        try {
          val df = q.fn(spark, sfDir)
          df.explain("formatted")
          if (exec) {
            val t0 = System.nanoTime()
            df.write.mode("overwrite").format("noop").save()
            println(f"[exec] ${q.name} ${(System.nanoTime() - t0) / 1e9}%.2f s")
          }
        } catch { case e: Throwable => println(s"explain failed: $e") }
      }
    spark.stop()
  }
}
