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
  * foreachBatch does exactly that). The single-writer `require` on the
  * pointer rename catches a violated contract between two maintenance
  * runs; an append racing a maintenance run is the caller's bug, not a
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
      if (n.startsWith(tmpPrefix)) fs.delete(p, false)
      else if (n.startsWith("gen=") &&
        n.stripPrefix("gen=").toLongOption.exists(_ != curSeq))
        fs.delete(p, true)
    }
    if (curSeq > 0L)
      rootArtifacts.foreach(a => fs.delete(new Path(base, a), true))
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
