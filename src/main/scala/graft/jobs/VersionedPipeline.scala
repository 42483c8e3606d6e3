package graft.jobs

import java.time.LocalDate

import org.apache.spark.sql.SparkSession

import graft.io.{Store, Versioning}
import graft.sources.ApiClient

/** The reference's two-workflow orchestration chain, executable in-repo —
  * the one reference behavior that previously had no in-engine equivalent
  * (SURVEY §3 EP3; `.github/workflows/raw_data_collection.yml:4-6`,
  * `data_engineering.yml:4-8`, `.dvc/config:1-6`):
  *
  *   1. "Daily Data Collection": pull the raw dataset from the raw remote,
  *      run EP1 (fetch + merge + upsert), `add` + `push` the updated raw
  *      artifact back.
  *   2. "Feature Engineering", `workflow_run`-triggered on *completion* —
  *      NOT success — of (1): pull raw from the raw remote and previous
  *      engineered output from the engineered remote (each step tolerating
  *      absence: `dvc pull … || echo`), run EP2's incremental derivation,
  *      `add` + `push` the engineered artifact to the engineered remote.
  *
  * `runChain` reproduces the trigger semantics exactly: a collection
  * failure is recorded, not propagated — engineering still runs against
  * whatever the remotes hold (the same tolerate-upstream-failure property
  * PipelineSpec pins for RunPipeline, now with the versioning layer in the
  * loop). Every step emits a StepResult, the in-repo analogue of the
  * workflow run log.
  *
  * Two remotes are plain directories here; at deployment they are object
  * stores — Versioning's content-addressed layout is what makes the daily
  * push O(delta objects), never O(history).
  */
object VersionedPipeline {

  final case class StepResult(workflow: String, step: String, ok: Boolean, detail: String)

  /** Workflow 1 — `raw_data_collection.yml`. */
  def collectWorkflow(spark: SparkSession, client: ApiClient, runDate: LocalDate,
                      workspaceDir: String, rawRemote: String): Seq[StepResult] = {
    val v = new Versioning(workspaceDir)
    val store = new Store(spark, workspaceDir)
    val pulled = v.pull(CollectJob.rawFile, rawRemote)
    val pullStep = StepResult("collection", "pull_raw", ok = true,
      if (pulled) "restored raw_data.csv" else "no raw data found") // `|| echo` semantics
    val runStep =
      try {
        val raw = CollectJob.run(spark, client, runDate, store)
        StepResult("collection", "collect", ok = true, s"rows=${raw.count()}")
      } catch {
        case e: Exception => StepResult("collection", "collect", ok = false, e.getMessage)
      }
    val pushSteps =
      if (!runStep.ok) Seq.empty // nothing new to track; workflow reports failure
      else {
        val ptr = v.add(CollectJob.rawFile)
        v.push(CollectJob.rawFile, rawRemote)
        Seq(StepResult("collection", "add_push_raw", ok = true, s"md5=${ptr.md5}"))
      }
    pullStep +: runStep +: pushSteps
  }

  /** Workflow 2 — `data_engineering.yml` (steps 5-9). */
  def engineeringWorkflow(spark: SparkSession, workspaceDir: String,
                          rawRemote: String, engRemote: String): Seq[StepResult] = {
    val v = new Versioning(workspaceDir)
    val store = new Store(spark, workspaceDir)
    val pullRaw = StepResult("engineering", "pull_raw", ok = true,
      if (v.pull(CollectJob.rawFile, rawRemote)) "restored raw_data.csv"
      else "no raw data found")
    val pullPrev = StepResult("engineering", "pull_engineered", ok = true,
      if (v.pull(FeatureEngineeringJob.engineeredFile, engRemote)) "restored engineered_data.csv"
      else "no previous engineered file found")
    val runStep =
      try {
        val fe = FeatureEngineeringJob.run(spark, store)
        StepResult("engineering", "engineer", ok = true, s"rows=${fe.count()}")
      } catch {
        case e: Exception => StepResult("engineering", "engineer", ok = false, e.getMessage)
      }
    val pushSteps =
      if (!runStep.ok) Seq.empty
      else if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(workspaceDir, FeatureEngineeringJob.engineeredFile)))
        // FE's P8 short-circuit off an empty store never writes the artifact
        Seq(StepResult("engineering", "add_push_engineered", ok = true, "nothing to track"))
      else {
        val ptr = v.add(FeatureEngineeringJob.engineeredFile)
        v.push(FeatureEngineeringJob.engineeredFile, engRemote)
        Seq(StepResult("engineering", "add_push_engineered", ok = true, s"md5=${ptr.md5}"))
      }
    Seq(pullRaw, pullPrev, runStep) ++ pushSteps
  }

  /** The full chain with `workflow_run(types: [completed])` semantics:
    * engineering fires whether or not collection succeeded.
    */
  def runChain(spark: SparkSession, client: ApiClient, runDate: LocalDate,
               workspaceDir: String, rawRemote: String, engRemote: String): Seq[StepResult] =
    collectWorkflow(spark, client, runDate, workspaceDir, rawRemote) ++
      engineeringWorkflow(spark, workspaceDir, rawRemote, engRemote)
}
