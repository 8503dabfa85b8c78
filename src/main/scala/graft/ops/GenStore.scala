package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The shared generation-pointer protocol behind the maintained index
  * stores (IVF `_ivfgen-`, band index `_bandgen-`): generations live in
  * `gen=<seq>/` dirs and the highest `<prefix><seq>` pointer file names
  * the live one; a store with no pointer is its own generation 0 at the
  * root. Promotion is ONE atomic pointer rename; readers resolve the
  * pointer first, so staging, crashes mid-publish, and the promote
  * itself are invisible to them.
  *
  * Writer contract: maintenance (retrain/compaction) and appends are
  * SINGLE-WRITER — the daily loop runs them in sequence (q99/q234's
  * foreachBatch does exactly that). The contract is ENFORCED by the
  * [[withLease]] writer lease (create-fail-if-exists `_maintenance
  * .lease` with epoch-TTL takeover of crashed holders): a second
  * maintenance run fails loudly at acquire, before preClean can touch
  * shared state; the promote-time `require` remains as a backstop. An
  * append racing a maintenance run is still the caller's bug, not a
  * protocol state this store can repair.
  *
  * Crash windows, all reclaimed by [[preClean]] on the NEXT maintenance
  * run: a death before the pointer rename leaves a `.{tmp}` pointer file
  * and an unreferenced `gen=<seq>` dir; a death between the rename and
  * the superseded-generation delete leaves the replaced generation's
  * data (root artifacts or the prior gen dir) behind. */
private[graft] object GenStore {

  def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Highest committed pointer seq, 0 when the root layout is live. */
  def currentSeq(fs: FileSystem, base: Path, prefix: String): Long = {
    if (!fs.exists(base)) return 0L
    fs.listStatus(base).map(_.getPath.getName)
      .filter(_.startsWith(prefix))
      .map(_.stripPrefix(prefix).toLong)
      .maxOption.getOrElse(0L)
  }

  /** The live generation's root dir (the index root for generation 0). */
  def currentRoot(spark: SparkSession, indexDir: String, prefix: String): String = {
    val base = new Path(indexDir)
    val seq = currentSeq(fsOf(spark, indexDir), base, prefix)
    if (seq == 0L) indexDir else s"$indexDir/gen=$seq"
  }

  /** Reclaim everything a crashed maintenance run can leave: stale
    * dot-tmp pointer files, `gen=` dirs the committed pointer doesn't
    * reference, and — once a pointer exists — the superseded root-layout
    * artifacts. Run at the START of every maintenance pass. */
  def preClean(fs: FileSystem, base: Path, prefix: String, curSeq: Long,
      rootArtifacts: Seq[String]): Unit = {
    if (!fs.exists(base)) return
    val tmpPrefix = "." + prefix.stripPrefix("_").stripSuffix("-") + "-tmp-"
    fs.listStatus(base).map(_.getPath).foreach { p =>
      val n = p.getName
      if (n.startsWith(tmpPrefix) || n.startsWith(".lease-takeover-"))
        fs.delete(p, false)
      else if (n.startsWith("gen=") &&
        n.stripPrefix("gen=").toLongOption.exists(_ != curSeq))
        fs.delete(p, true)
    }
    if (curSeq > 0L)
      rootArtifacts.foreach(a => fs.delete(new Path(base, a), true))
  }

  /** Maintenance writer-lease file, living next to the pointer files. */
  val LeaseName = "_maintenance.lease"

  private def readLease(fs: FileSystem, lease: Path): (String, Long) =
    try {
      val in = fs.open(lease)
      val txt = try {
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](4096)
        var n = in.read(tmp)
        while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
        buf.toString("UTF-8")
      } finally in.close()
      val lines = txt.split("\n", 2)
      (lines(0), lines(1).trim.toLong)
    } catch {
      // Unreadable/partial lease (holder died mid-write, or it vanished
      // between the failed create and this read): treat as abandoned.
      case _: Throwable => ("<unreadable>", 0L)
    }

  /** Acquire the maintenance writer lease, making the single-writer
    * contract ENFORCED rather than documented: the realistic day-2
    * failure is two cron maintenance runs overlapping, which without a
    * lease can interleave preClean/stage/promote and delete each other's
    * staged generation before the promote-time `require` ever fires.
    *
    * Acquisition is `create(overwrite = false)` — atomic
    * create-fail-if-exists on HDFS (and object stores with conditional
    * create; on RawLocalFileSystem it is check-then-create, which still
    * catches every non-pathological overlap). A lease whose recorded
    * epoch is older than `ttlMs` belongs to a CRASHED holder (a clean
    * failure releases in its finally) and is taken over; a live lease
    * held by someone else fails loudly at acquire — before any state is
    * touched. */
  def acquireLease(fs: FileSystem, base: Path, owner: String,
      ttlMs: Long = 30L * 60 * 1000): Unit = {
    val lease = new Path(base, LeaseName)
    def tryCreate(): Boolean =
      try {
        val out = fs.create(lease, false)
        try out.write(s"$owner\n${System.currentTimeMillis()}".getBytes("UTF-8"))
        finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    if (tryCreate()) return
    val (heldBy, epoch) = readLease(fs, lease)
    if (System.currentTimeMillis() - epoch <= ttlMs)
      throw new IllegalStateException(
        s"maintenance lease at $lease is held by '$heldBy' — a concurrent " +
          "maintenance run is active; this run refuses to start (single-" +
          "writer contract). Stale leases are taken over after the TTL.")
    // Takeover must be single-winner even when two runs observe the SAME
    // stale lease: claim it by RENAME (atomic on HDFS) to a unique name —
    // the loser's rename fails because the source is gone. A plain
    // delete-then-create would let the second runner delete the first
    // runner's FRESH lease and both would proceed.
    val claimed = new Path(base,
      s".lease-takeover-${java.util.UUID.randomUUID()}")
    val won =
      try fs.rename(lease, claimed)
      catch { case _: java.io.IOException => false }
    if (!won) {
      // Not necessarily a lost takeover: the holder may have simply
      // RELEASED between our failed create and the read (readLease maps
      // absence to epoch 0, which reads as "stale"). One clean create
      // retry settles it — a free lease is acquired, a recreated one
      // reports its live holder.
      if (tryCreate()) return
      val (h2, _) = readLease(fs, lease)
      throw new IllegalStateException(
        s"maintenance lease at $lease: lost the stale-takeover race to " +
          s"'$h2'; this run refuses to start.")
    }
    fs.delete(claimed, false)
    if (!tryCreate())
      throw new IllegalStateException(
        s"maintenance lease at $lease: lost the stale-takeover race to " +
          "another writer; this run refuses to start.")
  }

  /** Release the lease; requires this owner still holds it. An owner
    * mismatch OR a vanished lease both mean the run was taken over
    * mid-run (it exceeded the TTL and another writer claimed — and in
    * the vanished case also finished and released) — surfaced loudly,
    * because this run's promote may then have raced the takeover's
    * preClean and the operator must reconcile, not trust both runs'
    * "success". */
  def releaseLease(fs: FileSystem, base: Path, owner: String): Unit = {
    val lease = new Path(base, LeaseName)
    if (!fs.exists(lease))
      throw new IllegalStateException(
        s"maintenance lease at $lease vanished — this run exceeded the " +
          "TTL and was taken over (the takeover already completed); its " +
          "own writes may have interleaved with the takeover's")
    val (heldBy, _) = readLease(fs, lease)
    require(heldBy == owner,
      s"maintenance lease at $lease now held by '$heldBy', not '$owner' — " +
        "lease was taken over mid-run (run exceeded the TTL?)")
    fs.delete(lease, false)
  }

  /** Run `body` under the writer lease (acquire → body → release in
    * finally — a thrown body still frees the lease; only a killed JVM
    * leaves it for TTL takeover). A release failure (lease taken over
    * mid-run) propagates when the body succeeded, but must not MASK the
    * body's own exception when it didn't. */
  def withLease[T](fs: FileSystem, base: Path, ttlMs: Long = 30L * 60 * 1000)(
      body: => T): T = {
    val owner = java.util.UUID.randomUUID().toString
    acquireLease(fs, base, owner, ttlMs)
    var failed: Throwable = null
    try body
    catch { case t: Throwable => failed = t; throw t }
    finally {
      try releaseLease(fs, base, owner)
      catch {
        case t: Throwable =>
          if (failed == null) throw t
          else failed.addSuppressed(t)
      }
    }
  }

  /** Commit `gen=<genSeq>` as the live generation: stage the pointer
    * under a dot-tmp name, promote with one atomic rename (single-writer
    * checked), then GC superseded pointers and the replaced generation's
    * data. The caller has fully written `gen=<genSeq>/` beforehand. */
  def promote(fs: FileSystem, base: Path, prefix: String, genSeq: Long,
      curSeq: Long, rootArtifacts: Seq[String]): Unit = {
    val tmpPrefix = "." + prefix.stripPrefix("_").stripSuffix("-") + "-tmp-"
    val tmp = new Path(base, s"$tmpPrefix${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(s"gen=$genSeq".getBytes("UTF-8"))
    finally out.close()
    val dest = new Path(base, s"$prefix$genSeq")
    require(!fs.exists(dest), s"concurrent generation publish detected: $dest exists")
    require(fs.rename(tmp, dest), s"generation pointer commit failed at $dest")
    fs.listStatus(base).map(_.getPath)
      .filter(p => p.getName.startsWith(prefix) &&
        p.getName.stripPrefix(prefix).toLong < genSeq)
      .foreach(fs.delete(_, false))
    if (curSeq == 0L) rootArtifacts.foreach(a => fs.delete(new Path(base, a), true))
    else fs.delete(new Path(base, s"gen=$curSeq"), true)
  }
}
