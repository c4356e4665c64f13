package graft

/** Table-maintenance CLI — the operational companion to the pipeline
  * runner (compaction windows, deletion-request sweeps):
  *
  * {{{
  * graft.Maintenance compact --dir <parquet-dir>
  *   [--target-bytes N] [--sort-col c]
  * graft.Maintenance delete-keys --dir <parquet-dir> --key <col>
  *   --keys-parquet <dir-of-key-rows>
  * }}}
  *
  * Both verbs print ONE JSON report line. `delete-keys` reads the
  * deletion-request table (first column = the keys) and rewrites only
  * the files containing hits ([[graft.ops.Compact.deleteKeys]]);
  * `compact` is [[graft.ops.Compact.compactDir]]. Crash-interrupted
  * runs of either verb are repaired on the next invocation. */
object Maintenance {

  private def opt(args: Array[String], name: String): Option[String] =
    args.sliding(2).collectFirst { case Array(`name`, v) => v }

  def main(args: Array[String]): Unit = {
    val verb = args.headOption.getOrElse(
      sys.error("usage: Maintenance <compact|delete-keys> --dir <path> ..."))
    val dir = opt(args, "--dir").getOrElse(sys.error("--dir required"))
    val spark = EtlSession.create(
      master = sys.env.getOrElse("SPARK_MASTER", "local[*]"),
      appName = s"graft-maintenance-$verb")
    try {
      verb match {
        case "compact" =>
          val r = graft.ops.Compact.compactDir(spark, dir,
            targetBytes = opt(args, "--target-bytes")
              .map(_.toLong).getOrElse(128L << 20),
            sortCol = opt(args, "--sort-col"))
          println(s"""{"verb":"compact","dir":"$dir","filesBefore":${r.filesBefore}""" +
            s""","bytesBefore":${r.bytesBefore},"filesAfter":${r.filesAfter}""" +
            s""","bytesAfter":${r.bytesAfter},"rows":${r.rows}}""")
        case "delete-keys" =>
          val key = opt(args, "--key").getOrElse(sys.error("--key required"))
          val keysPath = opt(args, "--keys-parquet").getOrElse(
            sys.error("--keys-parquet required"))
          val r = graft.ops.Compact.deleteKeys(spark, dir, key,
            spark.read.parquet(keysPath))
          println(s"""{"verb":"delete-keys","dir":"$dir","filesTotal":${r.filesTotal}""" +
            s""","filesRewritten":${r.filesRewritten},"rowsDeleted":${r.rowsDeleted}""" +
            s""","rowsRemaining":${r.rowsRemaining}}""")
        case "retrain-ivf" =>
          // versioned quantizer re-train (ops.IndexLifecycle): --dir is
          // the lifecycle base; trains v+1 on the supplied corpus,
          // lands centroids_v+1/assign_v+1 alongside v, commits via
          // the atomic marker — the operational entry point for the
          // drifted-corpus re-index without breaking replay idempotence
          val embPath = opt(args, "--emb-parquet").getOrElse(
            sys.error("--emb-parquet required"))
          val idCol = opt(args, "--id").getOrElse(sys.error("--id required"))
          val vecCol = opt(args, "--vec").getOrElse(sys.error("--vec required"))
          val r = graft.ops.IndexLifecycle.retrain(spark, dir,
            spark.read.parquet(embPath), idCol, vecCol,
            nlist = opt(args, "--nlist").map(_.toInt).getOrElse(16),
            trainSample = opt(args, "--train-sample").map(_.toInt)
              .getOrElse(4096))
          println(s"""{"verb":"retrain-ivf","dir":"$dir"""" +
            s""","fromVersion":${r.fromVersion.map(_.toString).getOrElse("null")}""" +
            s""","toVersion":${r.toVersion},"nlist":${r.nlist},"rows":${r.rows}}""")
        case "rekey-ivf" =>
          // streaming-feed version bump (Streams.rekeyIvfAssign): --dir
          // is the feed's batch_* parent; folds every batch dir into one
          // batch_compacted RE-KEYED under the live committed version of
          // --index-base — the maintenance step ST29's versioned runner
          // demands after a retrain (idempotent swap; re-run repairs a
          // crash between the swap and the stale-dir deletes)
          val idxBase = opt(args, "--index-base").getOrElse(
            sys.error("--index-base required"))
          val v = graft.streaming.Streams.rekeyIvfAssign(spark, dir, idxBase)
          println(s"""{"verb":"rekey-ivf","dir":"$dir"""" +
            s""","indexBase":"$idxBase","version":$v}""")
        case other => sys.error(s"unknown maintenance verb '$other'")
      }
    } finally spark.stop()
  }
}
