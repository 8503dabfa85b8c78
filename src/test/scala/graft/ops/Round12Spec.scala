package graft.ops

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-12 kernels vs independent Scala references — the per-round
  * discipline (Round9KernelsSpec/Round10Spec/Round11Spec). The centerpiece
  * is [[Graph.ccFold]] (q383's kernel): incremental CC-label maintenance
  * must equal from-scratch CC — checked against a plain Scala union-find —
  * on planted merge topologies, on random graphs, and CHAINED day over day
  * through an actual parquet-persisted label table (the "persisted index"
  * discipline of the band/IVF maintenance tiers).
  */
class Round12Spec extends SparkSpec {
  import spark.implicits._

  private val root = Paths.get("target", "tmp",
    s"r12fix-${java.util.UUID.randomUUID().toString.take(8)}").toAbsolutePath

  /** Independent reference: union-find with min-id labels. */
  private def refLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val lo = math.min(ra, rb); parent(math.max(ra, rb)) = lo }
    }
    parent.keys.map(n => n -> find(n)).toMap
  }

  private def toMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def labelsOf(edges: Seq[(Long, Long)]): DataFrame =
    Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
      .select(col("doc_id").as("n"), col("cluster_id").as("lab"))

  test("ccFold: planted merge topologies equal from-scratch union-find") {
    // Archive: components {1,2,3} (label 1), {10,11} (10), {20,21} (20),
    // {30,31} (30), {40,41} (40) — five islands.
    val day1 = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (30L, 31L),
      (40L, 41L))
    val day1Lbl = labelsOf(day1)
    // Delta plants every fold shape at once:
    //  - simple two-component merge:         (3, 10)
    //  - TRANSITIVE chain through the delta: (11, 20), (21, 30)
    //    (components 1,10,20,30 all collapse — the meta-CC must close
    //    the chain, a single mapping join could not)
    //  - intra-component no-op edge:         (40, 41)
    //  - brand-new node attaching:           (41, 100)
    //  - brand-new island (both ends new):   (200, 201)
    val delta = Seq((3L, 10L), (11L, 20L), (21L, 30L), (40L, 41L),
      (41L, 100L), (200L, 201L))
    val got = toMap(Graph.ccFold(day1Lbl, delta.toDF("u", "v")))
    val want = refLabels(day1 ++ delta)
    assert(got == want)
    // The chain actually merged down to min id 1, and the new island is
    // its own component — the topologies were exercised, not vacuous.
    assert(got(30L) == 1L && got(100L) == 40L && got(201L) == 200L)
  }

  test("ccFold: random graphs, random deltas — fold == from-scratch") {
    val rnd = new scala.util.Random(12)
    for (trial <- 1 to 5) {
      val nodes = 60 + rnd.nextInt(40)
      val all = Seq.fill(120)(
        (rnd.nextInt(nodes).toLong, rnd.nextInt(nodes).toLong))
        .filter(e => e._1 != e._2)
      val (day1, delta) = all.splitAt(all.length * 2 / 3)
      val got = toMap(Graph.ccFold(labelsOf(day1), delta.toDF("u", "v")))
      assert(got == refLabels(day1 ++ delta), s"trial $trial")
    }
  }

  test("ccFold chains day over day through a PARQUET-persisted label table") {
    Files.createDirectories(root)
    val store = root.resolve("cc_labels").toString
    val rnd = new scala.util.Random(123)
    val days = (1 to 4).map(_ => Seq.fill(40)(
      (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(e => e._1 != e._2))
    // Day 1 bootstraps the index; each later day folds its delta into the
    // PERSISTED table (read back from disk — nothing carried in memory),
    // exactly the maintenance loop a daily pipeline runs.
    labelsOf(days.head).write.mode("overwrite").parquet(store)
    days.tail.foreach { delta =>
      val updated = Graph.ccFold(spark.read.parquet(store),
        delta.toDF("u", "v"))
      // Labels are re-derived, so the overwrite of the small label table
      // is safe to stage through a temp dir (a real deployment would
      // publish via the manifest store).
      val tmp = s"$store.next"
      updated.write.mode("overwrite").parquet(tmp)
      spark.read.parquet(tmp).write.mode("overwrite").parquet(store)
    }
    val got = toMap(spark.read.parquet(store))
    assert(got == refLabels(days.flatten))
    // The invariant that makes folds chain: every label is the component's
    // min node id (so day-k labels are valid contraction targets for
    // day k+1).
    got.groupBy(_._2).foreach { case (lab, members) =>
      assert(members.keys.min == lab)
    }
  }
}
