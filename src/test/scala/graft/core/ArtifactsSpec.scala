package graft.core

import graft.SparkSpec

class ArtifactsSpec extends SparkSpec {

  private def mkSource(name: String): java.io.File = {
    val f = new java.io.File(tmpDir("artifacts_src"), name)
    java.nio.file.Files.write(f.toPath, "v1".getBytes)
    f
  }

  test("regenerated source re-keys the path — a stale artifact is never " +
      "servable — and sweep reclaims the dead directory") {
    val src = mkSource("corpus.parquet")
    val p1 = Artifacts.path(spark, src.getPath, "spec_gc")
    new java.io.File(p1).mkdirs()
    java.nio.file.Files.write(
      new java.io.File(p1, "artifact.bin").toPath, "old".getBytes)
    assert(new java.io.File(p1 + ".src").exists(), "provenance sidecar written")
    // regenerate the source: different length AND mtime → different tag
    java.nio.file.Files.write(src.toPath, "v2-regenerated".getBytes)
    assert(src.setLastModified(src.lastModified() + 60000))
    val p2 = Artifacts.path(spark, src.getPath, "spec_gc")
    assert(p2 != p1, "a regenerated source must key a different path")
    // the old dir is now dead: no future path() call can compute its key
    val deleted = Artifacts.sweep(spark)
    assert(deleted.contains(p1), s"sweep must reclaim $p1, got $deleted")
    assert(!new java.io.File(p1).exists(), "dead dir deleted")
    assert(!new java.io.File(p1 + ".src").exists(), "dead sidecar deleted")
    // the live key survives the sweep
    new java.io.File(p2).mkdirs()
    val deleted2 = Artifacts.sweep(spark)
    assert(!deleted2.contains(p2) && new java.io.File(p2).exists(),
      "live artifact must survive")
  }

  test("sweep reclaims artifacts of a DELETED source, leaves unknown " +
      "dirs alone unless asked") {
    val src = mkSource("gone.parquet")
    val p = Artifacts.path(spark, src.getPath, "spec_gone")
    new java.io.File(p).mkdirs()
    assert(src.delete())
    assert(Artifacts.sweep(spark).contains(p),
      "artifacts of a deleted source are dead")
    // a sidecar-less tenant of the artifact root is not ours to delete
    val unknown = new java.io.File(
      s"${sys.props("java.io.tmpdir")}/graft_artifacts/spec_unknown_feed")
    unknown.mkdirs()
    try {
      assert(!Artifacts.sweep(spark).contains(unknown.getPath))
      assert(unknown.exists(), "unknown dirs survive a default sweep")
      assert(Artifacts.sweep(spark, deleteUnknown = true)
        .contains(unknown.getPath), "opt-in flag reclaims unknowns")
      assert(!unknown.exists())
    } finally if (unknown.exists()) unknown.delete(): Unit
  }
}
