package graft.api

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.col
import scala.reflect.ClassTag

/** Typed multi-step MapReduce pipeline on Datasets — the execution
  * engine for [[MrStep]].
  *
  * Spark-first re-expression of the reference's dataflow (SURVEY §3.3,
  * mrjob/spark/harness.py:142-303), NOT a translation of it:
  *
  *  - mapper + init/final brackets → one `mapPartitions` whose iterator
  *    is `init ++ flatMap(mapper) ++ final` (lazy, so `final` runs
  *    after the partition drains — same contract as
  *    harness.py:396-436);
  *  - combiner → a typed [[Aggregator]] with a bounded buffer: Spark
  *    runs Aggregators map-side before the shuffle (partial agg), which
  *    is precisely the combiner contract "runs 0..n times over partial
  *    groups" (mrjob/job.py:295-309) — and unlike the reference's
  *    `combineByKey` list-merging (harness.py:439-509) it stays inside
  *    Tungsten's hash-agg operator;
  *  - reducer → `repartition(key) + sortWithinPartitions(key[, value])
  *    + mapPartitions(adjacent-group iterator)`: the classic scalable
  *    secondary sort. Values reach the reducer as a lazy Iterator —
  *    constant memory per group, like the reference's
  *    `itertools.groupby` over sorted lines (mrjob/job.py:869-894) —
  *    and `sortValues = true` (SORT_VALUES, mrjob/job.py:1569-1593)
  *    just adds the value column to the in-partition Tungsten sort
  *    instead of needing a KeyFieldBasedPartitioner.
  *
  * At 100 TB: no stage materializes a group in memory unless a
  * combiner already collapsed it; shuffles are one-per-step on the
  * step key (Spark cannot elide a shuffle whose key is produced by an
  * opaque lambda); partition counts follow
  * `spark.sql.shuffle.partitions` / AQE unless `numReducers` pins the
  * output-file contract (harness.py:266-268).
  */
final class MrPipeline[K, V](val ds: Dataset[(K, V)]) extends Serializable {

  /** Run one typed step; chain calls for multi-step jobs
    * (mrjob steps(), mrjob/job.py:497-545 — a linear DAG, which in
    * Spark is simply function composition inside one job).
    *
    * `ordV2` is only consulted when `sortValues` is set on the
    * combiner path (the plain reducer path sorts values inside
    * Tungsten via the `_2` column); it defaults to null otherwise.
    */
  def step[K2, V2, K3, V3](s: MrStep[K, V, K2, V2, K3, V3])(
      implicit e2: Encoder[(K2, V2)],
      ek2: Encoder[K2],
      e3: Encoder[(K3, V3)],
      ordV2: Ordering[V2] = null): MrPipeline[K3, V3] = {

    // ---- map phase: init ++ mapper ++ final, one pass, lazy ----
    val mapper = s.mapper
    val mInit = s.mapperInit
    val mFinal = s.mapperFinal
    val mapped: Dataset[(K2, V2)] = ds.mapPartitions { it =>
      mInit().iterator ++
        it.flatMap { case (k, v) => mapper(k, v) } ++
        mFinal()
    }

    val r = s.reducer
    val rInit = s.reducerInit
    val rFinal = s.reducerFinal

    // ---- shuffle + reduce phase ----
    val reduced: Dataset[(K3, V3)] = s.combiner match {
      case Some(c) =>
        // Partial agg via Aggregator: map-side combine inside Tungsten.
        if (s.sortValues) require(ordV2 != null,
          "sortValues with a combiner needs an Ordering[V2]")
        val agg = new CombinerAggregator[K2, V2](c)
        val combined: Dataset[(K2, List[V2])] =
          mapped.groupByKey(_._1).agg(agg.toColumn.name("vs"))
        val sortVals = s.sortValues
        val ord = ordV2
        combined.mapPartitions { it =>
          rInit().iterator ++
            it.flatMap { case (k, vs) =>
              val ordered = if (sortVals) vs.sorted(ord) else vs
              r(k, ordered.iterator)
            } ++
            rFinal()
        }
      case None =>
        // Secondary sort: hash-partition by key, Tungsten in-partition
        // sort on (key[, value]), lazily group adjacent equal keys.
        val n = s.numReducers.getOrElse(
          ds.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt)
        val sortCols = if (s.sortValues) Seq(col("_1"), col("_2"))
                       else Seq(col("_1"))
        val arranged = mapped
          .repartition(n, col("_1"))
          .sortWithinPartitions(sortCols: _*)
        arranged.mapPartitions { it =>
          rInit().iterator ++
            AdjacentGroups(it).flatMap { case (k, vs) => r(k, vs) } ++
            rFinal()
        }
    }
    new MrPipeline(reduced)
  }

  /** Map-only step (no shuffle — mrjob's no-reducer step,
    * mrjob/step.py:79-86). */
  def mapStep[K2, V2](f: (K, V) => IterableOnce[(K2, V2)])(
      implicit e2: Encoder[(K2, V2)]): MrPipeline[K2, V2] =
    new MrPipeline(ds.mapPartitions(_.flatMap { case (k, v) => f(k, v) }))

  /** Custom partitioner parity (mrjob PARTITIONER / Hadoop partitioner
    * class, mrjob/job.py:1390-1408, e.g. tests/mr_partitioner.py): route
    * each key to an explicit partition. RDD hop (Datasets only expose
    * hash/range partitioning); the narrow map back re-enters the
    * Dataset world. */
  def partitionByKey(n: Int)(fn: K => Int)(
      implicit e: Encoder[(K, V)]): MrPipeline[K, V] = {
    val p = new org.apache.spark.Partitioner {
      def numPartitions: Int = n
      def getPartition(key: Any): Int = {
        val h = fn(key.asInstanceOf[K]) % n
        if (h < 0) h + n else h
      }
    }
    val spark = ds.sparkSession
    val pairs = new org.apache.spark.rdd.PairRDDFunctions(ds.rdd)(
      ClassTag.Any.asInstanceOf[ClassTag[K]],
      ClassTag.Any.asInstanceOf[ClassTag[V]])
    new MrPipeline(spark.createDataset(pairs.partitionBy(p)))
  }

  /** `*_cmd` / `*_pre_filter` parity: pipe records through a shell
    * command (mrjob/job.py:340-363). The reference's own Spark harness
    * REFUSES cmd substeps (harness.py:634-637); `RDD.pipe` lets this
    * engine exceed it. */
  def pipeCmd(cmd: String, encode: ((K, V)) => String,
      decode: String => (K, V))(
      implicit e: Encoder[(K, V)]): MrPipeline[K, V] = {
    val spark = ds.sparkSession
    val piped = ds.rdd.map(encode).pipe(cmd).map(decode)
    new MrPipeline(spark.createDataset(piped))
  }

  def toDF = ds.toDF("key", "value")
}

object MrPipeline {
  /** Line-oriented entry — RawValueProtocol: key = null, value = line
    * (mrjob/job.py:1270). */
  def fromText(spark: SparkSession, path: String): MrPipeline[String, String] = {
    import spark.implicits._
    new MrPipeline(spark.read.textFile(path).map(l => (null: String, l)))
  }

  def fromDataset[K, V](ds: Dataset[(K, V)]): MrPipeline[K, V] =
    new MrPipeline(ds)
}

/** Combiner buffer: the group key (once seen) + pending values.
  * Flushed through the user combiner whenever it exceeds
  * [[CombinerAggregator.FlushAt]] — bounds memory exactly like the
  * reference's periodic combiner runs over accumulated lists
  * (mrjob/spark/harness.py:466-495). */
final case class CombineBuf[K, V](key: Option[K], values: List[V])

final class CombinerAggregator[K, V](c: (K, Iterator[V]) => IterableOnce[V])
  extends Aggregator[(K, V), CombineBuf[K, V], List[V]] {
  import CombinerAggregator.FlushAt

  private def flush(b: CombineBuf[K, V]): CombineBuf[K, V] =
    if (b.values.lengthCompare(FlushAt) < 0 || b.key.isEmpty) b
    else CombineBuf(b.key, c(b.key.get, b.values.iterator).iterator.toList)

  def zero: CombineBuf[K, V] = CombineBuf(None, Nil)
  def reduce(b: CombineBuf[K, V], in: (K, V)): CombineBuf[K, V] =
    flush(CombineBuf(Some(in._1), in._2 :: b.values))
  def merge(a: CombineBuf[K, V], b: CombineBuf[K, V]): CombineBuf[K, V] =
    flush(CombineBuf(a.key.orElse(b.key), a.values ::: b.values))
  def finish(b: CombineBuf[K, V]): List[V] = b.key match {
    case Some(k) => c(k, b.values.iterator).iterator.toList
    case None => Nil
  }
  def bufferEncoder: Encoder[CombineBuf[K, V]] =
    Encoders.kryo(ClassTag(classOf[CombineBuf[_, _]])
      .asInstanceOf[ClassTag[CombineBuf[K, V]]])
  def outputEncoder: Encoder[List[V]] =
    Encoders.kryo(ClassTag(classOf[List[_]])
      .asInstanceOf[ClassTag[List[V]]])
}

object CombinerAggregator {
  /** Values buffered per key before the combiner is forced. */
  val FlushAt = 1000
}

/** Lazily group a key-sorted iterator into (key, value-iterator) runs.
  * Contract (same as itertools.groupby, which the reference relies on —
  * mrjob/job.py:869-894): each inner iterator MUST be consumed before
  * advancing to the next group; unconsumed values are drained
  * automatically on advance. Constant memory per group. */
object AdjacentGroups {
  def apply[K, V](it: Iterator[(K, V)]): Iterator[(K, Iterator[V])] =
    new Iterator[(K, Iterator[V])] {
      private val buf = it.buffered
      private var current: Iterator[V] = Iterator.empty
      def hasNext: Boolean = {
        while (current.hasNext) current.next() // drain previous group
        buf.hasNext
      }
      def next(): (K, Iterator[V]) = {
        if (!hasNext) throw new NoSuchElementException
        val k = buf.head._1
        val inner = new Iterator[V] {
          def hasNext: Boolean = buf.hasNext && buf.head._1 == k
          def next(): V =
            if (hasNext) buf.next()._2 else throw new NoSuchElementException
        }
        current = inner
        (k, inner)
      }
    }
}
