package graft

import org.apache.spark.sql.DataFrame

/** Lineage truncation for ITERATIVE operators (connected components, BPE
  * training, pagerank, staged pipelines): each round must cut the
  * otherwise round-over-round growing plan, eagerly.
  *
  * Default is `localCheckpoint()` — eager, no configuration, and the
  * context cleaner reclaims previous rounds with no unpersist
  * bookkeeping. Its known limit is reliability: blocks live on executors
  * and the lineage backing them is DROPPED, so on a real cluster an
  * executor loss mid-iteration fails the job (or, worse for a
  * nondeterministic lineage, could silently recompute differently).
  * Setting `spark.graft.checkpointDir` (or the `GRAFT_CHECKPOINT_DIR`
  * environment variable) switches every iterative round to a RELIABLE
  * `checkpoint()` into that directory — HDFS/S3-backed, survives executor
  * loss, the production configuration for 100 TB runs. Labels are
  * identical either way (asserted in Round9OpsSpec); only the
  * fault-tolerance story changes.
  */
object Checkpoints {
  def truncate(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    s.conf.getOption("spark.graft.checkpointDir")
      .orElse(sys.env.get("GRAFT_CHECKPOINT_DIR")) match {
      case Some(dir) =>
        // setCheckpointDir is idempotent per context; respect one already
        // configured by the application
        if (s.sparkContext.getCheckpointDir.isEmpty)
          s.sparkContext.setCheckpointDir(dir)
        df.checkpoint() // eager + reliable
      case None => df.localCheckpoint()
    }
  }
}
