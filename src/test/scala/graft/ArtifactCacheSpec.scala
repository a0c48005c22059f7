package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The content-address contract of the build-once/probe-many artifact
  * store ([[graft.operators.ArtifactCache]]): same source file → the
  * build runs once and re-attaches; a CHANGED source file (the r8
  * silent-fixture-regeneration incident) → a different path, so the
  * stale artifact can never be served for the new corpus. Fingerprints
  * go through Hadoop's FileSystem API, so the same addressing works on
  * a shared-storage scheme — covered below via an explicit `file:` URI.
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
    var builds = 0
    def attach(): Long = {
      val p = ArtifactCache.dir(spark, src.toString, "documents",
        s"graft_spec_${src.getName}", "probe@r1")
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

  test("a file:-scheme source URI fingerprints through Hadoop " +
      "FileSystem and re-attaches against the plain-path build state") {
    val src = stageSource()
    val store = s"graft_spec_uri_${src.getName}"
    var builds = 0
    def attach(srcDir: String): Long = {
      val p = ArtifactCache.dir(spark, srcDir, "documents", store, "k@r1")
      ArtifactCache.readOrBuild(spark, p) {
        builds += 1
        spark.range(7).select(col("id"))
      }.count()
    }
    assert(attach(s"file:$src") === 7L)
    assert(attach(s"file:$src") === 7L)
    assert(builds === 1, "scheme-qualified source must cache like a local one")
    // the length+mtime fingerprint must agree between the two spellings
    // of the same file (only the sanitized dir prefix differs)
    def fingerprint(d: String): String = ArtifactCache
      .dir(spark, d, "documents", store, "k@r1")
      .split("/").init.last.split("_").takeRight(2).mkString("_")
    assert(fingerprint(src.toString) === fingerprint(s"file:$src"))
  }

  test("readOrBuildAll: a missing sub-table forces ONE joint rebuild " +
      "(the pieces of an index must come from the same build)") {
    val src = stageSource()
    val store = s"graft_spec_multi_${src.getName}"
    var builds = 0
    def attach(): Map[String, Long] = {
      val p = ArtifactCache.dir(spark, src.toString, "documents", store,
        "idx@r1")
      ArtifactCache.readOrBuildAll(spark, p, Seq("left", "right")) {
        builds += 1
        Seq("left" -> spark.range(4).select(col("id")),
          "right" -> spark.range(6).select(col("id")))
      }.map { case (n, df) => n -> df.count() }
    }
    assert(attach() === Map("left" -> 4L, "right" -> 6L))
    assert(builds === 1)
    // delete ONE sub-table's commit marker: the next attach must re-run
    // the whole build (a half-cached index is not servable)
    val p = ArtifactCache.dir(spark, src.toString, "documents", store,
      "idx@r1")
    assert(new java.io.File(s"$p/right/_SUCCESS").delete())
    assert(attach() === Map("left" -> 4L, "right" -> 6L))
    assert(builds === 2,
      "a partially-present artifact must trigger a full joint rebuild")
  }

  test("hit/build counters move so Bench can report cache transparency") {
    val src = stageSource()
    val store = s"graft_spec_ctr_${src.getName}"
    val (h0, b0) = (ArtifactCache.hits.get(), ArtifactCache.builds.get())
    val p = ArtifactCache.dir(spark, src.toString, "documents", store,
      "c@r1")
    ArtifactCache.readOrBuild(spark, p)(
      spark.range(3).select(col("id"))).count()
    assert(ArtifactCache.builds.get() === b0 + 1)
    assert(ArtifactCache.hits.get() === h0)
    ArtifactCache.readOrBuild(spark, p)(
      spark.range(3).select(col("id"))).count()
    assert(ArtifactCache.builds.get() === b0 + 1)
    assert(ArtifactCache.hits.get() === h0 + 1)
  }
}
