package graft.table

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal Iceberg-style table layer: atomic snapshot commits over Parquet
  * with a JSON commit manifest carrying per-partition lineage + metrics
  * (SURVEY.md §2.9, §7.0 — no Iceberg runtime jar ships in the sandbox, so
  * this reproduces the semantics the engine needs behind a small surface:
  * append snapshot, read latest snapshot, list lineage). An Iceberg-backed
  * implementation drops in behind the same methods when the jar exists.
  *
  * Layout under `root/`:
  *   data/snap-<id>/...parquet      snapshot data files
  *   manifest-<id>.json             per-snapshot manifest (committed last)
  *   LATEST                         atomically-replaced pointer file
  */
object TableIO {

  final case class PartitionStat(partition: Int, rows: Long, checksum: Long)
  final case class Manifest(
      snapshotId: Long,
      iteration: Int,
      rows: Long,
      metrics: Map[String, Double],
      partitions: Seq[PartitionStat])

  /** Per-partition row counts + order-independent checksum of the row hashes
    * (bit_xor: commutative AND overflow-free under ANSI mode):
    * the "per-partition lineage + metrics" record the north rule requires. */
  def partitionStats(df: DataFrame): Seq[PartitionStat] = {
    df.withColumn("_pid", spark_partition_id())
      .withColumn("_h", xxhash64(df.columns.map(col): _*))
      .groupBy("_pid")
      .agg(count(lit(1)).as("rows"), bit_xor(col("_h")).as("checksum"))
      .collect()
      .map(r => PartitionStat(r.getInt(0), r.getLong(1), r.getLong(2)))
      .toSeq
      .sortBy(_.partition)
  }

  /** Write `df` as a new snapshot; the manifest is written after the data and
    * the LATEST pointer is swapped atomically, so readers never observe a
    * half-written snapshot (the Iceberg commit protocol in miniature). */
  def commit(df: DataFrame, root: String, iteration: Int, metrics: Map[String, Double] = Map.empty): Manifest = {
    val dir = Paths.get(root)
    Files.createDirectories(dir.resolve("data"))
    val snapId = latestSnapshotId(root).getOrElse(0L) + 1L
    val dataPath = dir.resolve("data").resolve(s"snap-$snapId")
    df.write.mode("overwrite").parquet(dataPath.toString)
    val stats = partitionStats(df.sparkSession.read.parquet(dataPath.toString))
    val m = Manifest(snapId, iteration, stats.map(_.rows).sum, metrics, stats)
    Files.write(dir.resolve(s"manifest-$snapId.json"), renderManifest(m).getBytes(StandardCharsets.UTF_8))
    val tmp = dir.resolve("LATEST.tmp")
    Files.write(tmp, snapId.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve("LATEST"), StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    m
  }

  /** Write `df` as a BUCKETED catalog table (hash-bucketed by `bucketCols`
    * into `nBuckets` files per partition, sorted within buckets): the
    * co-located-join primitive of the 100-TB design. Two tables bucketed the
    * same way join WITHOUT a shuffle on either side — the scan's bucket
    * layout satisfies the join's required distribution, so iterative
    * workloads (rank vector vs static adjacency, dedup signatures vs corpus)
    * pay the partitioning once at write time instead of every join
    * (`BucketedJoinSpec` asserts the Exchange-free plan). Plain parquet
    * snapshots (`commit`) lose their partitioning on read-back — that is
    * why this goes through the catalog, which records bucket metadata. */
  def commitBucketed(df: DataFrame, tableName: String, bucketCols: Seq[String], nBuckets: Int): Unit = {
    require(bucketCols.nonEmpty && nBuckets > 0)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(tableName)
  }

  def latestSnapshotId(root: String): Option[Long] = {
    val p = Paths.get(root, "LATEST")
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong) else None
  }

  def readLatest(spark: SparkSession, root: String): Option[(Manifest, DataFrame)] =
    latestSnapshotId(root).map { id =>
      val m = readManifest(Paths.get(root, s"manifest-$id.json").toString)
      (m, spark.read.parquet(Paths.get(root, "data", s"snap-$id").toString))
    }

  /** All committed manifests, oldest first — the lineage listing. */
  def lineage(root: String): Seq[Manifest] = {
    val dir = Paths.get(root)
    if (!Files.exists(dir)) return Seq.empty
    Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.startsWith("manifest-"))
      .map(p => readManifest(p.toString))
      .toSeq
      .sortBy(_.snapshotId)
  }

  // --- tiny hand-rolled JSON (no extra deps; schema is fixed and flat) ---

  private def renderManifest(m: Manifest): String = {
    val metrics = m.metrics.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val parts = m.partitions
      .map(p => s"""{"partition":${p.partition},"rows":${p.rows},"checksum":${p.checksum}}""")
      .mkString("[", ",", "]")
    s"""{"snapshotId":${m.snapshotId},"iteration":${m.iteration},"rows":${m.rows},"metrics":$metrics,"partitions":$parts}"""
  }

  private[table] def readManifest(path: String): Manifest = {
    val s = new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)
    def longField(name: String): Long =
      s"""\"$name\":(-?\\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong).getOrElse(0L)
    val metrics = """"metrics":\{([^}]*)\}""".r.findFirstMatchIn(s).map(_.group(1)).getOrElse("")
    val metricMap = metrics.split(",").filter(_.contains(":")).map { kv =>
      val Array(k, v) = kv.split(":", 2)
      k.replaceAll("\"", "") -> v.toDouble
    }.toMap
    val partRe = """\{"partition":(-?\d+),"rows":(-?\d+),"checksum":(-?\d+)\}""".r
    val parts = partRe.findAllMatchIn(s)
      .map(m0 => PartitionStat(m0.group(1).toInt, m0.group(2).toLong, m0.group(3).toLong)).toSeq
    Manifest(longField("snapshotId"), longField("iteration").toInt, longField("rows"), metricMap, parts)
  }
}
