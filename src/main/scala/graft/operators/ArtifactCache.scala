package graft.operators

import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Content-addressed on-disk artifact store backing the engine's
  * build-once/probe-many indexes (IVF centroids+cells, the near-dup
  * pair table, the incremental-dedup index tables, the spectral
  * component). An artifact is a pure function of (source parquet file,
  * recipe tag), so its path embeds the source file's
  * (length, modificationTime) fingerprint: repeated invocations
  * re-attach the parquet instead of re-running the build, and a
  * regenerated fixture (the r8 silent-regeneration incident)
  * invalidates the cache instead of serving stale results. Parquet
  * round-trips doubles bit-exactly, so cached and freshly-built
  * consumers hash identically.
  *
  * Addressing rules:
  *   - The fingerprint comes from Hadoop's [[FileSystem.getFileStatus]]
  *     (not `java.io.File`), so the same content-address works when
  *     source and store live on shared storage (HDFS/S3A/...), which is
  *     the whole premise of build-once/probe-many at 100 TB. Local
  *     paths route through RawLocalFileSystem and fingerprint
  *     identically to the old File-based key.
  *   - The store root is configurable via `SPARK_GRAFT_CACHE_ROOT`
  *     (default `/tmp`); each index family gets its own subdirectory
  *     (`graft_ivf`, `graft_pairs`, ...), created `rwx------` so a
  *     predictable path on a shared machine cannot be pre-seeded or
  *     read by another user.
  *   - Every key embeds [[FormatVersion]] AND the caller's `tag`; a tag
  *     names the recipe INCLUDING ITS REVISION (e.g. `nlist_10@r1`).
  *     A semantic change to a build MUST bump the tag's `@rN` suffix —
  *     that invalidates exactly that artifact family — while a change
  *     to the addressing scheme itself bumps [[FormatVersion]] and
  *     invalidates everything at once (the IoOps layout-version
  *     discipline). This is what keeps a code fix from silently
  *     serving the previous revision's output (r10 advice).
  *
  * Bench transparency: [[hits]]/[[builds]] count re-attaches vs builds
  * process-wide, and Bench emits them in its JSON line so a "cold" run
  * that actually re-attached warm artifacts is visible as such.
  *
  * Concurrency: two writers racing the same missing artifact both run
  * the build and the LAST overwrite wins — benign because builds are
  * pure functions of the fingerprinted source (identical bytes), and
  * readers only attach after a committed _SUCCESS marker. A deployment
  * wanting single-build semantics puts a coordination layer (e.g. a
  * scheduler-level build job) in front — the store itself stays
  * lock-free.
  */
private[graft] object ArtifactCache {

  /** Bump when the addressing scheme changes (invalidates every store). */
  private val FormatVersion = "v2"

  /** Store root: `SPARK_GRAFT_CACHE_ROOT` env, default `/tmp`. */
  def root: String = sys.env.getOrElse("SPARK_GRAFT_CACHE_ROOT", "/tmp")

  /** Process-wide re-attach / build counters (read by Bench). */
  val hits = new AtomicLong(0)
  val builds = new AtomicLong(0)

  /** Artifact directory for (sfDir, source table, store family, recipe
    * tag). `store` is a family subdirectory under [[root]] (e.g.
    * `graft_ivf`); `tag` must carry its recipe revision (`...@rN`).
    */
  def dir(s: SparkSession, d: String, sourceTable: String, store: String,
      tag: String): String =
    dirMulti(s, d, Seq(sourceTable), store, tag)

  /** Multi-source variant for artifacts that are pure functions of MORE
    * than one fixture table (the hyperANF report derives its edge frame
    * from orders⋈lineitem): every source's (length, modificationTime)
    * lands in the address, so regenerating ANY input invalidates.
    */
  def dirMulti(s: SparkSession, d: String, sourceTables: Seq[String],
      store: String, tag: String): String = {
    val fp = sourceTables.map { t =>
      val src = new Path(s"$d/$t.parquet")
      val st = fs(s, src).getFileStatus(src)
      s"${st.getLen}_${st.getModificationTime}"
    }.mkString("_")
    val key = d.replaceAll("[^A-Za-z0-9.]", "_")
    s"$root/$store/${FormatVersion}_${key}_$fp/$tag"
  }

  /** Re-attach the artifact at `path`, running `build` first only if no
    * committed `_SUCCESS` marker exists yet.
    */
  def readOrBuild(s: SparkSession, path: String)(
      build: => DataFrame): DataFrame =
    readOrBuildAll(s, path, Seq(""))(Seq("" -> build))("")

  /** Multi-table artifact: `names` are sub-tables under `path` (empty
    * string = `path` itself), built TOGETHER by one `build` pass if any
    * is missing — the shape of an index whose pieces must come from the
    * same build (IVF cells+centroids; the dedup index's shingle/freq/
    * prefix tables). `build` is by-name: a fully-cached attach never
    * constructs the build plans at all.
    */
  /** [[readOrBuildAll]]'s existence half only: guarantee every named
    * sub-table is committed, building once if any is missing, WITHOUT
    * constructing per-part readers. For a many-part artifact the caller
    * can then attach all same-schema parts in ONE multi-path
    * `read.parquet` — per-part reads each cost a small schema/listing
    * job, and at 17 parts (the PQ16 index) those jobs were the probe's
    * dominant fixed cost (25 jobs/probe profiled, ~15 of them reads).
    */
  def ensureAll(s: SparkSession, path: String, names: Seq[String])(
      build: => Seq[(String, DataFrame)]): Unit = {
    readOrBuildAllInner(s, path, names, attach = false)(build)
    ()
  }

  def readOrBuildAll(s: SparkSession, path: String, names: Seq[String])(
      build: => Seq[(String, DataFrame)]): Map[String, DataFrame] =
    readOrBuildAllInner(s, path, names, attach = true)(build)

  private def readOrBuildAllInner(s: SparkSession, path: String,
      names: Seq[String], attach: Boolean)(
      build: => Seq[(String, DataFrame)]): Map[String, DataFrame] = {
    def sub(n: String) = if (n.isEmpty) path else s"$path/$n"
    val p = new Path(path)
    val filesystem = fs(s, p)
    val cached = names.forall(n =>
      filesystem.exists(new Path(sub(n), "_SUCCESS")))
    if (!cached) {
      builds.incrementAndGet()
      restrictStoreDir(filesystem, p)
      val built = build
      require(built.map(_._1).sorted == names.sorted,
        s"artifact build produced ${built.map(_._1)}, expected $names")
      built.foreach { case (n, df) =>
        df.write.mode("overwrite").parquet(sub(n))
      }
    } else hits.incrementAndGet()
    if (attach) names.map(n => n -> s.read.parquet(sub(n))).toMap
    else Map.empty
  }

  private def fs(s: SparkSession, p: Path): FileSystem =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Create the store-family directory (e.g. `$root/graft_ivf`) owner-only
    * before anything is written beneath it. Best-effort on filesystems
    * without POSIX permissions (the call still creates the directory).
    */
  private def restrictStoreDir(filesystem: FileSystem, artifact: Path): Unit = {
    // artifact = $root/$store/<fingerprint>/<tag>; the store dir is the
    // fingerprint dir's parent
    val store = artifact.getParent.getParent
    if (store != null && !filesystem.exists(store)) {
      filesystem.mkdirs(store)
      try filesystem.setPermission(store, new FsPermission("700"))
      catch { case _: UnsupportedOperationException => () }
    }
  }
}
