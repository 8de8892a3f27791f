package graft.tools

/** Artifact-cache garbage collection (dev/maintenance tool): reclaims
  * keyed artifact dirs whose source was regenerated or deleted — see
  * [[graft.core.Artifacts.sweep]] for the liveness rule. Prints one line
  * per reclaimed dir.
  *
  * Run: `sbt "runMain graft.tools.ArtifactGc [--delete-unknown]"`.
  */
object ArtifactGc {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("graft-artifact-gc", 2)
    val deleted = graft.core.Artifacts.sweep(spark,
      deleteUnknown = args.contains("--delete-unknown"))
    deleted.foreach(d => println(s"GC reclaimed $d"))
    println(s"GC done: ${deleted.size} dir(s) reclaimed")
    spark.stop()
  }
}
