package graft.jobs

import org.apache.spark.sql.SparkSession

/** spark-submit-able entry for the corpus-curation pipeline — the
  * extension-side counterpart of [[RunPipeline]] (which runs the
  * reference's ETL): curate an incoming batch against an existing corpus
  * and persist the decision frame + per-source report as parquet.
  *
  * Usage: RunCurate <batchDir> <corpusDir> <outDir>
  *
  * <batchDir>/<corpusDir> are parquet datasets with at least
  * (doc_id, source, text); <outDir> receives `decisions/` (one row per
  * batch doc — action, dup_of, jaccard, n_tokens, bucket, seq_id) and
  * `report/` (per-source drop/keep/token-mass counts). Decisions are pure
  * functions of (content, params) — re-running on the same inputs
  * reproduces byte-identical frames, which is what makes the output safe
  * to version with [[graft.io.Versioning]].
  */
object RunCurate {

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: RunCurate <batchDir> <corpusDir> <outDir>")
    val Array(batchDir, corpusDir, outDir) = args

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // reuse a live session when embedded (tests); only stop what we created
    val preExisting = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-curate")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val batch = spark.read.parquet(batchDir)
    val corpus = spark.read.parquet(corpusDir)
    val decisions = CurateJob.curate(batch, corpus).localCheckpoint(true)
    decisions.write.mode("overwrite").parquet(s"$outDir/decisions")
    CurateJob.report(decisions).write.mode("overwrite").parquet(s"$outDir/report")
    val kept = decisions.where(org.apache.spark.sql.functions.col("action") === "keep").count()
    println(s"[curate] ${decisions.count()} decisions, $kept kept -> $outDir")
    if (preExisting.isEmpty) spark.stop()
  }
}
