package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Dev tool: stage-by-stage timing of the minhash dedup pipeline at a given
  * parallelism (diagnosing local[32] slowness). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val docs = docs0.unionByName(
      docs0.select((col("doc_id") + 100000).as("doc_id"), col("text")))
    time("count docs")(docs.count())
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 5, 64)
      .localCheckpoint(true)
    time("signatures")(sigs.count())
    val cands = Dedup.lshCandidates(sigs, 64, 16).localCheckpoint(true)
    time("lsh candidates")(cands.count())
    val verified = Dedup.jaccardOnPairs(docs, cands, "doc_id", "text", 5)
      .where(col("jaccard") >= 0.8).localCheckpoint(true)
    time("verify jaccard")(verified.count())
    val comps = time("connected components")(
      graft.canon.ConnectedComponents.run(
        verified.select(col("id_a").as("src"), col("id_b").as("dst"))))
    time("comps materialize")(comps.count())
    spark.stop()
  }
}
