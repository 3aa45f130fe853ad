package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic fixture / benchmark graph generators (FIXTURES.md §2).
  * Shapes mirror the reference's generators (reference
  * `randomGraphGenerators.c`, `executables/generatorHelp.txt`,
  * `executables/chainGeneratorHelp.txt`); all are seeded and reproducible —
  * the `-r`/`-s` seed semantics of the reference (`filter.c:292-297`). */
object Generators {

  // ---- small exact fixtures as local edge lists (undirected, one per pair) ----

  def path(n: Int): Seq[(Long, Long)] =
    (0 until n - 1).map(i => (i.toLong, (i + 1).toLong))

  def cycle(n: Int): Seq[(Long, Long)] =
    (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))

  def clique(n: Int): Seq[(Long, Long)] =
    for { i <- 0 until n; j <- i + 1 until n } yield (i.toLong, j.toLong)

  /** Star S_n: hub 0 plus n leaves. */
  def star(n: Int): Seq[(Long, Long)] =
    (1 to n).map(i => (0L, i.toLong))

  /** P_3 (0-1-2) ⊎ C_4 (3-4-5-6-3); vertex 7 is isolated and only exists in
    * the vertex table (FIXTURES.md `two_comp`; isolated-vertex semantics of
    * reference `connectedComponents.c:41-64`). */
  def twoComp: Seq[(Long, Long)] =
    Seq((0L, 1L), (1L, 2L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 3L))

  /** Chain of k cycles of length c joined at articulation vertices
    * (reference `executables/chainGeneratorHelp.txt`, cgen). */
  def chainBlocks(k: Int, c: Int): Seq[(Long, Long)] = {
    (0 until k).flatMap { b =>
      val base = b.toLong * (c - 1)
      (0 until c).map(i => (base + i, base + ((i + 1) % c)))
    }
  }

  /** Local deterministic BA-style power-law graph (preferential attachment,
    * mirrors reference `randomGraphGenerators.c:262-330` `barabasiAlbert`):
    * node i attaches m edges to earlier nodes, targets weighted by degree.
    * Sequential by nature — test-scale only; use [[powerLawEdges]] for bench. */
  def barabasiAlbert(n: Int, m: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    val targets = scala.collection.mutable.ArrayBuffer[Long]() // degree-weighted pool
    val edges = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    for (i <- 0 until m) { targets += i.toLong } // seed core
    for (i <- m until n) {
      val chosen = scala.collection.mutable.Set[Long]()
      while (chosen.size < m) {
        val t = targets(rnd.nextInt(targets.length))
        if (t != i) chosen += t
      }
      chosen.foreach { t =>
        edges += ((i.toLong, t))
        targets += t
        targets += i.toLong
      }
    }
    edges.toSeq
  }

  def edgesDF(spark: SparkSession, edges: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    edges.toDF("src", "dst")
  }

  /** Box–Muller transform: two independent N(mu, sigma²) draws (reference
    * `randomGraphGenerators.c:27` generateGaussianNoise). */
  def gaussianPair(rnd: scala.util.Random, mu: Double, sigma: Double): (Double, Double) = {
    var u1 = 0.0
    var u2 = 0.0
    do { u1 = rnd.nextDouble(); u2 = rnd.nextDouble() } while (u1 <= Double.MinPositiveValue)
    val r = math.sqrt(-2.0 * math.log(u1))
    (r * math.cos(2 * math.Pi * u2) * sigma + mu, r * math.sin(2 * math.Pi * u2) * sigma + mu)
  }

  /** Geometric (overlap) threshold graph: n seeded-uniform points in the
    * unit square, edge iff Euclidean distance < d (reference
    * `randomGraphGenerators.c:353` randomOverlapGraph). */
  def overlapGraph(n: Int, d: Double, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    val pts = Array.fill(n)((rnd.nextDouble(), rnd.nextDouble()))
    for {
      i <- 0 until n
      j <- i + 1 until n
      if math.hypot(pts(i)._1 - pts(j)._1, pts(i)._2 - pts(j)._2) < d
    } yield (i.toLong, j.toLong)
  }

  /** Clustered overlap graph (reference `randomGraphGenerators.c:412`
    * randomClusteredOverlapGraphWithLabels): nClusters seed points, each
    * cluster's members Gaussian-perturbed (sigma = mu) copies of its seed
    * and labeled with the cluster id; edge iff distance < d. Returns
    * (vertex labels, edges); n is truncated to a multiple of nClusters like
    * the reference. */
  def clusteredOverlapGraph(n: Int, d: Double, nClusters: Int, mu: Double,
      seed: Long): (Seq[(Long, String)], Seq[(Long, Long)]) = {
    require(nClusters <= n, "more clusters than vertices")
    val rnd = new scala.util.Random(seed)
    val perCluster = n / nClusters
    val m = perCluster * nClusters
    val pts = new Array[(Double, Double)](m)
    val labels = new Array[(Long, String)](m)
    var i = 0
    for (c <- 0 until nClusters) {
      val cx = rnd.nextDouble(); val cy = rnd.nextDouble()
      pts(i) = (cx, cy); labels(i) = (i.toLong, c.toString)
      for (w <- 1 until perCluster) {
        val (dx, dy) = gaussianPair(rnd, 0.0, mu)
        // mirror into the unit interval like the reference's abs() fold
        pts(i + w) = (math.abs(cx + dx) % 1.0, math.abs(cy + dy) % 1.0)
        labels(i + w) = ((i + w).toLong, c.toString)
      }
      i += perCluster
    }
    val edges = for {
      a <- 0 until m
      b <- a + 1 until m
      if math.hypot(pts(a)._1 - pts(b)._1, pts(a)._2 - pts(b)._2) < d
    } yield (a.toLong, b.toLong)
    (labels.toSeq, edges)
  }

  /** Chain of biconnected blocks (reference `randomGraphGenerators.c:160`
    * blockChainGenerator): nBlocks blocks of blockSize vertices, consecutive
    * blocks sharing one vertex; each block is its Hamiltonian cycle plus
    * seeded random diagonals with probability `diagonalProbability`. */
  def blockChain(nBlocks: Int, blockSize: Int, diagonalProbability: Double,
      seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    val edges = scala.collection.mutable.LinkedHashSet[(Long, Long)]()
    var blockStart = 0L
    for (_ <- 0 until nBlocks) {
      for (v <- blockStart until blockStart + blockSize; w <- v + 1 until blockStart + blockSize) {
        if (w - v == 1 || rnd.nextDouble() <= diagonalProbability) edges += ((v, w))
      }
      edges += ((blockStart, blockStart + blockSize - 1)) // close the cycle
      blockStart += blockSize - 1
    }
    edges.toSeq
  }

  // ---- distributed deterministic power-law generator (bench scale) ----

  /** Deterministic Erdős–Rényi G(n, p) (reference `randomGraphGenerators.c:106`
    * `erdosRenyi`, `executables/generatorHelp.txt`): unordered pair {i,j}
    * present iff a pair hash clears p. Like the reference, enumerates all
    * pairs (the reference's loop is O(n^2) too) — embarrassingly parallel,
    * no shuffle, reproducible under any partitioning; fixture scale. */
  def erdosRenyiEdges(spark: SparkSession, n: Long, p: Double, seed: Long): DataFrame = {
    val scale = 1L << 30
    val thresh = (p * scale).toLong
    spark.range(0L, n).select(col("id").as("src"))
      .crossJoin(spark.range(0L, n).select(col("id").as("dst")))
      .where(col("src") < col("dst"))
      .where(pmod(xxhash64(col("src"), col("dst"), lit(seed)), lit(scale)) < lit(thresh))
  }

  /** Web-like power-law edge table, fully parallel and deterministic: node i
    * (i in [1, n)) emits `m` directed edges; target = floor(i * u^2) with u a
    * hash-derived uniform in (0,1). u^2 weighting reproduces the BA in-degree
    * law (in-degree of node t after n steps ~ sqrt(n/t), the standard
    * continuous-time approximation of preferential attachment, mirroring
    * reference `randomGraphGenerators.c:262-330` without its sequential
    * degree pool). xxhash64(src, j, seed) makes the table reproducible across
    * runs/partitionings — no RNG state, no shuffle in generation. */
  def powerLawEdges(spark: SparkSession, n: Long, m: Int, seed: Long): DataFrame = {
    val scale = 1L << 30
    spark.range(1L, n)
      .select(col("id").as("src"), explode(sequence(lit(0), lit(m - 1))).as("j"))
      .withColumn("h", pmod(xxhash64(col("src"), col("j"), lit(seed)), lit(scale)))
      .withColumn("u", (col("h") + lit(0.5)) / lit(scale.toDouble))
      .select(col("src"), floor(col("src") * col("u") * col("u")).cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
  }
}
