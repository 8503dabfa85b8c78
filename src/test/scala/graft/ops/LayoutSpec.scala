package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout: correctness of the interleave and the actual
  * file-skipping benefit (fewer range-partitions intersect a 2-D box
  * predicate under z-clustering than under a single-column sort). */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def zRef(p: Long, s: Long): Long = {
    var z = 0L
    for (i <- 0 until 8) {
      z |= ((p >> i) & 1L) << (2 * i)
      z |= ((s >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zval matches the bit-interleave reference on all 16-bit inputs (sampled)") {
    val pts = for (p <- 0L until 256L by 17; s <- 0L until 256L by 13) yield (p, s)
    val got = pts.toDF("p", "s")
      .select(col("p"), col("s"), Layout.zval(col("p"), col("s")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (p, s, z) => assert(z === zRef(p, s), s"p=$p s=$s") }
  }

  test("z-order clustering prunes more partitions than single-column sort on a 2-D box") {
    // Uniform grid: every (p, s) cell once — the layout, not the data,
    // decides how many partitions a box predicate touches.
    val grid = spark.range(256 * 256).select(
      (col("id") % 256).as("p"), (col("id") / 256).cast("long").as("s"))
    val nPart = 16

    def touchedPartitions(df: org.apache.spark.sql.DataFrame): Long = {
      // Per-partition bounding boxes, exactly what parquet row-group
      // min/max stats record per file.
      val boxes = df
        .select(col("p"), col("s"), spark_partition_id().as("pid"))
        .groupBy("pid")
        .agg(min("p").as("pmin"), max("p").as("pmax"),
          min("s").as("smin"), max("s").as("smax"))
      // Box predicate: p in [0, 31] and s in [0, 31].
      boxes.filter(col("pmin") <= 31 && col("pmax") >= 0 &&
        col("smin") <= 31 && col("smax") >= 0).count()
    }

    val zClustered = grid
      .withColumn("z", Layout.zval(col("p"), col("s")))
      .repartitionByRange(nPart, col("z"))
    val singleSorted = grid.repartitionByRange(nPart, col("p"))

    val zTouched = touchedPartitions(zClustered)
    val pTouched = touchedPartitions(singleSorted)
    // Single-column sort on p: the box spans 1/8 of p-space → 2 of 16
    // partitions. Z-order: the box is 1/64 of the area → 1-2 partitions,
    // but the real test is the OTHER dimension: a box on s alone.
    val boxesOnS = { // s in [0, 31], p unconstrained
      def touchedS(df: org.apache.spark.sql.DataFrame): Long = df
        .select(col("s"), spark_partition_id().as("pid"))
        .groupBy("pid").agg(min("s").as("smin"), max("s").as("smax"))
        .filter(col("smin") <= 31 && col("smax") >= 0).count()
      (touchedS(zClustered), touchedS(singleSorted))
    }
    // p-sorted layout cannot prune on s at all: every partition spans all
    // of s-space. Z-order keeps s-spans tight, so most partitions skip.
    assert(boxesOnS._2 === nPart.toLong, "single-column sort prunes nothing on s")
    // Ideal z-layout touches exactly 4 of 16 (the s<32 region projects onto
    // partition-index bits (s7,p7,s6,p6) with s7=s6=0); range boundaries are
    // SAMPLED, so allow ±2 partitions of boundary spill.
    assert(boxesOnS._1 <= nPart / 4 + 2, s"z-order should prune most partitions on s, touched ${boxesOnS._1}")
    assert(zTouched <= pTouched, s"z=$zTouched p=$pTouched")
  }

  test("q124 zone-map audit: singleton buckets make pruning exact") {
    // Four rows, each its own z-bucket (min = max, so zone-pruning cannot
    // over-approximate): (17,7) hits p_point+s_point, (17,100) p_point,
    // (40,100) the box, (200,50) nothing.
    val dir = java.nio.file.Files.createTempDirectory("zonemap").toString
    Seq((17L, 7L), (17L, 100L), (40L, 100L), (200L, 50L))
      .toDF("l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Layout.q124ZoneMapAudit.fn(spark, dir).collect()
      .map(r => r.getAs[String]("probe") ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(got == Map(
      "p_point" -> ((4L, 2L, 4L, 2L, 2L)),
      "s_point" -> ((4L, 1L, 4L, 1L, 1L)),
      "box" -> ((4L, 1L, 4L, 1L, 1L))))
    spark.catalog.clearCache()
  }

  test("q78 two-phase domain cap equals the single-window reference") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    val docs = (1 to 400).map(i => (i.toLong, s"src${rnd.nextInt(5)}"))
      .toDF("doc_id", "source")
    // Reference: plain global window.
    val ref = docs
      .withColumn("pri", md5(col("doc_id").cast("string")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy("pri", "doc_id")))
      .filter(col("rn") <= 15)
      .select(col("source"), col("rn").cast("long"), col("doc_id"))
    // Two-phase: run the registered query over a scratch copy of the table.
    val dir = java.nio.file.Files.createTempDirectory("domaincap").toString
    docs.withColumn("text", lit("t")).withColumn("lang", lit("en"))
      .withColumn("n_chars", lit(1L))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Curation.q78DomainCap.fn(spark, dir)
    assert(rowStrings(got) === rowStrings(ref))
  }

  test("partitionBy write gives directory-level pruning on the partition column") {
    // Hive-style layout: one directory per lang value. A filter on the
    // partition column must resolve at PLANNING time (file listing), so the
    // filtered read touches only that directory's files — zero I/O on the
    // other partitions, the coarse sibling of q81's file-level min/max
    // skipping.
    val dir = java.nio.file.Files.createTempDirectory("partby").toString
    val docs = (1 to 300).map(i => (i.toLong, s"text $i", s"l${i % 3}"))
      .toDF("doc_id", "text", "lang")
    docs.write.partitionBy("lang").mode("overwrite").parquet(dir)

    val filtered = spark.read.parquet(dir).where(col("lang") === "l1")
    assert(filtered.count() === 100)
    val files = filtered.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("lang=l1")),
      s"scan must touch only the lang=l1 directory, got ${files.toSeq}")
  }

  test("q83 manifest assigns each doc the FIRST dropping stage") {
    // src0: doc 1 fails quality (too short), docs 8/11 are exact duplicates
    // (keeper = 8), doc 9 is repetitive. With cap=10 nothing is capped, so
    // expected statuses: 1→fail_quality, 9→fail_quality, 11→dup, 8→kept.
    val passText = (1 to 25).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, "too short", "src0"),
      (8L, passText, "src0"),
      (9L, Seq.fill(10)("p q r").mkString(" "), "src0"),
      (11L, passText.toUpperCase, "src0"), // case-insensitive exact dup of 8
      (20L, (1 to 30).map(i => s"v$i").mkString(" "), "src1"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en")).withColumn("n_chars", lit(1L))
    val dir = java.nio.file.Files.createTempDirectory("manifest").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Curation.q83TrainingManifest.fn(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got("src0") === ((4L, 2L, 1L, 0L, 1L)),
      "(n_docs, n_fail_quality, n_dup, n_capped, n_kept) for src0")
    assert(got("src1") === ((1L, 0L, 0L, 0L, 1L)))
  }

  test("q80 binned overlap join equals the brute-force theta join") {
    val a = Seq((1L, 0L, 100L), (2L, 50L, 60L), (3L, 300L, 400L))
      .toDF("cust", "lo_d", "hi_d")
      .select(col("cust"),
        timestamp_seconds(col("lo_d") * 86400).as("lo"),
        timestamp_seconds(col("hi_d") * 86400).as("hi"))
    val b = Seq((10L, 55L, 70L), (11L, 99L, 120L), (12L, 100L, 130L), (13L, 500L, 510L))
      .toDF("o_orderkey", "lo_d", "hi_d")
      .select(col("o_orderkey"),
        timestamp_seconds(col("lo_d") * 86400).as("lo"),
        timestamp_seconds(col("hi_d") * 86400).as("hi"))
    val brute = b.as("b").join(a.as("a"),
        col("a.lo") < col("b.hi") && col("b.lo") < col("a.hi"))
      .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n_custs"))
    def monthBins(df: org.apache.spark.sql.DataFrame) = df.withColumn(
      "mon", explode(expr(
        "sequence(date_trunc('month', lo), date_trunc('month', hi - INTERVAL 1 DAY), interval 1 month)")))
    val binned = monthBins(a).withColumnsRenamed(Map("lo" -> "a_lo", "hi" -> "a_hi"))
      .join(monthBins(b).withColumnsRenamed(Map("lo" -> "b_lo", "hi" -> "b_hi")), Seq("mon"))
      .filter(col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi"))
      .select(col("o_orderkey"), col("cust")).distinct()
      .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n_custs"))
    assert(rowStrings(binned) === rowStrings(brute))
    // Half-open boundary: a=1 is [0,100) and b=12 starts exactly at day 100
    // → touching endpoints must NOT match; b=13 is fully disjoint.
    val m = binned.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m.get(12L).isEmpty, "touching-endpoint promo must not match")
    assert(m.get(13L).isEmpty, "disjoint promo must not appear")
  }
}
