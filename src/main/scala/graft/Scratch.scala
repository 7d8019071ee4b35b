package graft

/** Process-scoped scratch-dir factory.
  *
  * `java.nio.file.Files.createTempDirectory(prefix)` resolves the parent
  * through the JDK's TempFileHelper, which caches `java.io.tmpdir` in a
  * static initializer — so Bench/Verify pointing the property at their own
  * swept scratch root has no effect on it (measured: the redirect probe
  * landed in the original /tmp). This helper re-reads the property at CALL
  * time and uses the explicit-parent `createTempDirectory(dir, prefix)`
  * overload, so every graft scratch dir (q191 landed partials, stream
  * replay dirs, IVF/LSH index caches, clustered-layout demos) lands under
  * whatever tmpdir the hosting process owns and deletes. Under plain `sbt
  * test` nothing redirects and this degrades to the stock behavior.
  */
object Scratch {
  def dir(prefix: String): java.nio.file.Path = {
    val root = java.nio.file.Paths.get(sys.props("java.io.tmpdir"))
    java.nio.file.Files.createDirectories(root)
    java.nio.file.Files.createTempDirectory(root, prefix)
  }
}
