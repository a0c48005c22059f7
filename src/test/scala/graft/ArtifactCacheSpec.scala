package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The content-address contract of the build-once/probe-many artifact
  * store ([[graft.operators.ArtifactCache]]): same source file → the
  * build runs once and re-attaches; a CHANGED source file (the r8
  * silent-fixture-regeneration incident) → a different path, so the
  * stale artifact can never be served for the new corpus.
  */
class ArtifactCacheSpec extends AnyFunSuite {
  import TestSpark._
  import graft.operators.ArtifactCache

  private def stageSource(): java.io.File = {
    val dir = Files.createTempDirectory("graft_artifact_src").toFile
    dir.deleteOnExit()
    Files.copy(Paths.get(s"$sf/documents.parquet"),
      Paths.get(s"$dir/documents.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    dir
  }

  test("readOrBuild builds once, re-attaches after, and a source " +
      "fingerprint change forces a rebuild at a fresh path") {
    val src = stageSource()
    val root = Files.createTempDirectory("graft_artifact_store").toFile
    root.deleteOnExit()
    var builds = 0
    def attach(): Long = {
      val p = ArtifactCache.dir(src.toString, "documents",
        root.toString, "probe")
      ArtifactCache.readOrBuild(spark, p) {
        builds += 1
        spark.range(5).select(col("id"))
      }.count()
    }
    assert(attach() === 5L)
    assert(attach() === 5L)
    assert(builds === 1, "second attach must reuse the artifact")
    // regenerate the source file: content-equal but new mtime → new
    // fingerprint → the old artifact is unreachable and a rebuild runs
    val f = new java.io.File(s"$src/documents.parquet")
    assert(f.setLastModified(f.lastModified() + 60000))
    assert(attach() === 5L)
    assert(builds === 2,
      "a changed source fingerprint must force a rebuild")
  }
}
