package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorOps
import graft.sources.Tables

/** Similarity search over the `embeddings` table (vec_id,
  * embedding: array<float>, label) — the approximate-nearest-neighbor
  * operators a training-data pipeline needs (BASELINE.json north star;
  * no analog in the reference, which has no vector data model).
  *
  * Two paths, same contract:
  *  - [[annTopK]]: brute-force cosine top-k — the exactness baseline.
  *    Query set is broadcast; candidates stream; per-query top-k is a
  *    window over a key-partitioned shuffle. O(Q·N) — correct at any N
  *    when Q is small, and the oracle for the approximate path.
  *  - [[annLshTopK]]: random-hyperplane LSH (SimHash for vectors) —
  *    the 100 TB path. Each vector gets B bucket ids (one per table);
  *    join on bucket id prunes the candidate set from N to the
  *    colliding few, then exact cosine re-ranks. No N² anywhere:
  *    cost is Σ bucket² per table, and planes are a tiny broadcast
  *    literal. Deterministic: planes come from a fixed-seed RNG.
  */
object SimilarityOps {

  /** Number of query vectors for the benchmark queries (vec_id < Q). */
  val QueryCount = 8
  val K = 3

  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")

  /** Brute-force deterministic cosine top-k: for each query vector,
    * the K nearest other vectors. */
  def annTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    // quantize + norm once per side; the pair loop only pays one dot
    val cand = e.select(col("vec_id").as("c_vec_id"),
        VectorOps.quantize(col("embedding")).as("cv"))
      .withColumn("cn", VectorOps.norm2Q(col("cv")))
    val queries = e.filter(col("vec_id") < QueryCount)
      .select(col("vec_id").as("q_vec_id"),
        VectorOps.quantize(col("embedding")).as("qv"))
      .withColumn("qn", VectorOps.norm2Q(col("qv")))
    val w = Window.partitionBy(col("q_vec_id"))
      .orderBy(col("cos").desc, col("c_vec_id").asc)
    broadcast(queries)
      .join(cand, col("q_vec_id") =!= col("c_vec_id"))
      .select(col("q_vec_id"), col("c_vec_id"),
        VectorOps.cosineFrom(VectorOps.dotQ(col("qv"), col("cv")),
          col("qn"), col("cn")).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select(col("q_vec_id"), col("c_vec_id"), col("rank"), col("cos"))
      .orderBy(col("q_vec_id"), col("rank"))
  }

  val annTopKSql: String =
    s"""WITH q AS (
       |  SELECT vec_id AS q_vec_id, ${VectorOps.QuantizeSql} AS qv
       |  FROM embeddings WHERE vec_id < $QueryCount),
       |c AS (
       |  SELECT vec_id AS c_vec_id, ${VectorOps.QuantizeSql} AS cv
       |  FROM embeddings),
       |p AS (
       |  SELECT q_vec_id, c_vec_id,
       |    CAST(list_sum(list_transform(list_zip(qv, cv), z -> z[1] * z[2])) AS DOUBLE) /
       |    (sqrt(CAST(list_sum(list_transform(qv, x -> x * x)) AS DOUBLE)) *
       |     sqrt(CAST(list_sum(list_transform(cv, x -> x * x)) AS DOUBLE))) AS cos
       |  FROM q, c WHERE q_vec_id <> c_vec_id),
       |r AS (
       |  SELECT q_vec_id, c_vec_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY q_vec_id ORDER BY cos DESC, c_vec_id ASC) AS rank
       |  FROM p)
       |SELECT q_vec_id, c_vec_id, rank, cos FROM r
       |WHERE rank <= $K
       |ORDER BY q_vec_id, rank""".stripMargin

  /** Embedding near-duplicate pairs: all (i < j) with cosine above
    * `threshold`. Brute force for oracle parity at test scale; the LSH
    * path below is the production shape. */
  def dedupEmbedding(spark: SparkSession, dir: String,
      threshold: Double = 0.4): DataFrame = {
    val e = emb(spark, dir)
    val a = e.select(col("vec_id").as("i"),
        VectorOps.quantize(col("embedding")).as("iv"))
      .withColumn("ina", VectorOps.norm2Q(col("iv")))
    val b = e.select(col("vec_id").as("j"),
        VectorOps.quantize(col("embedding")).as("jv"))
      .withColumn("jnb", VectorOps.norm2Q(col("jv")))
    broadcast(a).join(b, col("i") < col("j"))
      .select(col("i"), col("j"),
        VectorOps.cosineFrom(VectorOps.dotQ(col("iv"), col("jv")),
          col("ina"), col("jnb")).as("cos"))
      .filter(col("cos") >= threshold)
      .orderBy(col("i"), col("j"))
  }

  val dedupEmbeddingSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, ${VectorOps.QuantizeSql} AS v FROM embeddings),
       |p AS (
       |  SELECT a.vec_id AS i, b.vec_id AS j,
       |    CAST(list_sum(list_transform(list_zip(a.v, b.v), z -> z[1] * z[2])) AS DOUBLE) /
       |    (sqrt(CAST(list_sum(list_transform(a.v, x -> x * x)) AS DOUBLE)) *
       |     sqrt(CAST(list_sum(list_transform(b.v, x -> x * x)) AS DOUBLE))) AS cos
       |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
       |SELECT i, j, cos FROM p WHERE cos >= 0.4
       |ORDER BY i, j""".stripMargin

  // ---------------- LSH path (the scale design) ----------------

  /** Deterministic random hyperplanes: `tables` tables × `bits` planes
    * × dim weights, from a fixed-seed Gaussian — a tiny literal the
    * plan broadcasts to every task. */
  def hyperplanes(tables: Int, bits: Int, dim: Int,
      seed: Long = 42L): Array[Array[Array[Double]]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(tables, bits, dim)(rng.nextGaussian())
  }

  /** Bucket ids per vector: for each table, an int whose bits are
    * sign(plane · v). Adds `bucket_<t>` columns. Planes are literal
    * array<double> columns dotted via the codegen'd [[graft.functions
    * .ArrayDotProduct]] — a few KB of plan literals, not an unrolled
    * element_at chain (which bloated the task binary to 6 MB). */
  def withLshBuckets(df: DataFrame, vec: Column, tables: Int = 4,
      bits: Int = 8, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(tables, bits, dim)
    val v = vec.cast("array<double>")
    (0 until tables).foldLeft(df) { (d, t) =>
      val bitCols: Seq[Column] = (0 until bits).map { b =>
        val plane = typedLit(planes(t)(b).toSeq)
        when(graft.functions.ArrayDotProduct.dot(v, plane) > 0d,
          lit(1 << b)).otherwise(lit(0))
      }
      d.withColumn(s"bucket_$t", bitCols.reduce(_ + _))
    }
  }

  /** LSH-bucketed ANN: collide on any table's bucket, exact-rerank the
    * candidates. Approximate (recall < 1) — the shape that survives
    * 100 TB: shuffle is per-bucket, never N². Not oracle-checked
    * (approximation is seed-defined); validated in ScalaTest against
    * [[annTopK]] mechanics. */
  def annLshTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = withLshBuckets(emb(spark, dir), col("embedding"))
      .withColumn("v", VectorOps.quantize(col("embedding")))
      .withColumn("n2", VectorOps.norm2Q(col("v")))
    val tables = 4
    // candidate pairs: same bucket in any table, deduped
    val pairs = (0 until tables).map { t =>
      val a = e.select(col("vec_id").as("q_vec_id"), col("v").as("qv"),
        col("n2").as("qn"), col(s"bucket_$t").as("bk"))
        .filter(col("q_vec_id") < QueryCount)
      val b = e.select(col("vec_id").as("c_vec_id"), col("v").as("cv"),
        col("n2").as("cn"), col(s"bucket_$t").as("bk"))
      a.join(b, Seq("bk")).filter(col("q_vec_id") =!= col("c_vec_id"))
        .select(col("q_vec_id"), col("c_vec_id"), col("qv"), col("cv"),
          col("qn"), col("cn"))
    }.reduce(_ union _).dropDuplicates("q_vec_id", "c_vec_id")
    val w = Window.partitionBy(col("q_vec_id"))
      .orderBy(col("cos").desc, col("c_vec_id").asc)
    pairs
      .select(col("q_vec_id"), col("c_vec_id"),
        VectorOps.cosineFrom(VectorOps.dotQ(col("qv"), col("cv")),
          col("qn"), col("cn")).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select(col("q_vec_id"), col("c_vec_id"), col("rank"), col("cos"))
      .orderBy(col("q_vec_id"), col("rank"))
  }
}
