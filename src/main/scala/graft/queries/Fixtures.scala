package graft.queries

/** Per-process temp fixture paths.
  *
  * Query fixtures (at-rest table copies, signature/blob tables,
  * chunked-HDF5 snapshots) are memoized per JVM but were written to
  * SHARED /tmp paths keyed only by dataset dir — two concurrent graft
  * JVMs (a Verify beside a Bench, or parallel Verify passes) could
  * overwrite a fixture another process was mid-reading (observed:
  * UNABLE_TO_INFER_SCHEMA when a second Verify's overwrite emptied
  * the sorted-lineitem copy under a concurrent scan). Pid isolation
  * makes every fixture single-writer by construction; the oracle
  * handshake paths stay correct because each process interpolates its
  * OWN recorded path into its oracle SQL, and the files outlive the
  * process for the baseline replay.
  */
object Fixtures {
  private val pid = ProcessHandle.current().pid()

  /** `/tmp/<prefix>_<pid>_<datasetHash>` — stable within a process,
    * disjoint across processes. */
  def tmpPath(prefix: String, datasetDir: String): String =
    sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/" + prefix +
      "_" + pid + "_" + Integer.toHexString(datasetDir.hashCode)
}
