package graft.analytics

/** Deterministic per-SF-dir scratch paths under the JVM temp dir for
  * queries that must write through a real sink before reading back
  * (round-trip contracts, materialized-aggregate maintenance). The hex
  * tag of the full dir path is collision-free across SFs; overwrite-mode
  * writers make re-runs replace rather than accumulate. Single-writer:
  * two concurrent runs against the SAME sfDir would race the overwrite —
  * fine for the sequential Verify/Bench harness, a per-run suffix for
  * anything concurrent. */
private[analytics] object Scratch {
  def dir(prefix: String, sfDir: String): String = {
    val tag = sfDir.getBytes("UTF-8").map(b => f"$b%02x").mkString
    new java.io.File(System.getProperty("java.io.tmpdir"), s"graft_${prefix}_$tag")
      .getAbsolutePath
  }
}
