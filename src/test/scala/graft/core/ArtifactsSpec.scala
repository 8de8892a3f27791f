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

  test("two sources sharing one fingerprint key keep the dir live while " +
      "EITHER lives (sidecar accumulates sources)") {
    // identical content + identical mtime → identical (length, mtime)
    // fingerprint → same keyed dir for the same prefix
    val dir = tmpDir("artifacts_twin_src")
    val a = new java.io.File(dir, "a.parquet")
    val b = new java.io.File(dir, "b.parquet")
    java.nio.file.Files.write(a.toPath, "same-bytes".getBytes)
    java.nio.file.Files.write(b.toPath, "same-bytes".getBytes)
    assert(a.setLastModified(1700000000000L) && b.setLastModified(1700000000000L))
    val pa = Artifacts.path(spark, a.getPath, "spec_twin")
    val pb = Artifacts.path(spark, b.getPath, "spec_twin")
    assert(pa === pb, "identical fingerprints must share one keyed dir")
    new java.io.File(pa).mkdirs()
    val sidecar = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(pa + ".src")))
    assert(sidecar.contains(a.getPath) && sidecar.contains(b.getPath),
      s"sidecar must record BOTH sources: $sidecar")
    // delete the FIRST-recorded source: the dir must stay live — b still
    // fingerprints to this key (the r18 write-once sidecar named only a,
    // and sweep would have reclaimed a dir b was still serving)
    assert(a.delete())
    val deleted = Artifacts.sweep(spark)
    assert(!deleted.contains(pa) && new java.io.File(pa).exists(),
      s"dir still live for $b must survive the sweep")
    // delete b too: now every recorded source is gone — dead
    assert(b.delete())
    assert(Artifacts.sweep(spark).contains(pa))
    assert(!new java.io.File(pa).exists())
  }

  test("sweep survives an unreadable sidecar mid-walk: the entry is " +
      "skipped as unknown, the rest of the sweep completes") {
    val src = mkSource("readable.parquet")
    val pLive = Artifacts.path(spark, src.getPath, "spec_robust")
    new java.io.File(pLive).mkdirs()
    // a dir whose sidecar is a DIRECTORY (readAllBytes throws IOException)
    // stands in for any unreadable sidecar
    val root = s"${sys.props("java.io.tmpdir")}/graft_artifacts"
    val broken = new java.io.File(s"$root/spec_robust_broken_feed")
    broken.mkdirs()
    val brokenSidecar = new java.io.File(broken.getPath + ".src")
    brokenSidecar.mkdirs()
    // plus a genuinely dead dir the sweep must STILL reclaim after
    // hitting the broken one
    val dead = mkSource("dead.parquet")
    val pDead = Artifacts.path(spark, dead.getPath, "spec_robust_dead")
    new java.io.File(pDead).mkdirs()
    assert(dead.delete())
    try {
      val deleted = Artifacts.sweep(spark)
      assert(deleted.contains(pDead),
        "an unreadable sidecar must not abort the sweep of other entries")
      assert(!deleted.contains(broken.getPath) && broken.exists(),
        "the unreadable entry is treated as unknown, not deleted")
      assert(new java.io.File(pLive).exists(), "live entry untouched")
    } finally {
      if (brokenSidecar.exists()) brokenSidecar.delete(): Unit
      if (broken.exists()) broken.delete(): Unit
    }
  }
}
