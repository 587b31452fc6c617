package graft

/** Checkout-relative scratch locations. Everything the engine writes
  * outside an explicit user path (KV tables, stream staging, snapshots,
  * the warehouse) resolves against the JVM's working directory — the
  * sbt project root — so the repo works from any checkout location
  * instead of assuming one absolute path.
  */
object RepoPaths {
  def target(rel: String): String =
    new java.io.File("target", rel).getAbsolutePath
}
