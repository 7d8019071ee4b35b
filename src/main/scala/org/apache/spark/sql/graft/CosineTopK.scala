package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Whole-operator form of "top-k nearest corpus vectors per query vector".
  *
  * The declarative composition (score all pairs → window row_number →
  * filter) shuffles and sorts |corpus|×|queries| scored rows. This operator
  * keeps a bounded k-heap per query inside each corpus partition (one pass,
  * no shuffle of scored rows) and merges |partitions|×|queries|×k candidates
  * on a single reducer — the classic distributed-top-k shape that survives a
  * 1000-executor corpus. Queries are task-broadcast (always the small side).
  *
  * The full custom-operator path: LogicalPlan node → SparkStrategy →
  * UnaryExecNode, registered per-session via experimental.extraStrategies
  * (or GraftExtensions).
  */
case class CosineTopKPlan(
    queries: Array[(Long, Array[Float])],
    k: Int,
    idCol: String,
    vecCol: String,
    child: LogicalPlan,
    // output attrs are constructor state: a copy() during analysis/
    // optimization must NOT mint fresh exprIds or downstream references break
    override val output: Seq[Attribute] = CosineTopKPlan.freshOutput())
    extends UnaryNode {

  // this node *produces* its output attrs (they don't come from the child)
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)
  // ...and *consumes* the id/vec columns by name — without declaring this,
  // ColumnPruning decides the child's columns are unused and prunes them away
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      child.output.filter(a => a.name == idCol || a.name == vecCol))
  override def maxRows: Option[Long] = Some(queries.length.toLong * k)
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object CosineTopKPlan {
  def freshOutput(): Seq[Attribute] = Seq(
    AttributeReference("q_id", LongType, nullable = false)(),
    AttributeReference("rk", IntegerType, nullable = false)(),
    AttributeReference("n_id", LongType, nullable = false)(),
    AttributeReference("cos", DoubleType, nullable = false)())
}

object CosineTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: CosineTopKPlan =>
      CosineTopKExec(p.queries, p.k, p.idCol, p.vecCol, p.output, planLater(p.child)) :: Nil
    case _ => Nil
  }
}

case class CosineTopKExec(
    queries: Array[(Long, Array[Float])],
    k: Int,
    idCol: String,
    vecCol: String,
    output: Seq[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  override protected def doExecute(): RDD[InternalRow] = {
    val idOrd = child.output.indexWhere(_.name == idCol)
    val vecOrd = child.output.indexWhere(_.name == vecCol)
    require(idOrd >= 0 && vecOrd >= 0,
      s"columns $idCol/$vecCol not found in ${child.output.map(_.name)}")
    val kk = k
    val qb = sparkContext.broadcast(queries.map { case (qid, v) =>
      var n = 0.0; var i = 0
      while (i < v.length) { n += v(i).toDouble * v(i).toDouble; i += 1 }
      (qid, v.map(_.toDouble), math.sqrt(n))
    })

    // stage 1: one pass per corpus partition, bounded (cos, id) heap per query
    val partials: RDD[Array[Array[(Double, Long)]]] = child.execute().mapPartitions { iter =>
      val qs = qb.value
      val heaps = Array.fill(qs.length)(new TopKHeap(kk))
      iter.foreach { row =>
        val id = row.getLong(idOrd)
        val arr = row.getArray(vecOrd)
        val n = arr.numElements()
        val vals = new Array[Double](n)
        var nn = 0.0
        var i = 0
        while (i < n) { vals(i) = arr.getFloat(i).toDouble; nn += vals(i) * vals(i); i += 1 }
        nn = math.sqrt(nn)
        var qi = 0
        while (qi < qs.length) {
          val (qid, qv, qn) = qs(qi)
          if (qid != id) {
            var d = 0.0
            var j = 0
            val m = math.min(n, qv.length)
            while (j < m) { d += vals(j) * qv(j); j += 1 }
            heaps(qi).add(d / qn / nn, id)
          }
          qi += 1
        }
      }
      Iterator.single(heaps.map(_.toArray))
    }

    // stage 2: merge |partitions| × |queries| × k candidates on one reducer.
    // shuffle = true is load-bearing: a narrow coalesce(1) would pull every
    // corpus partition into the single merge task and run stage 1 serially —
    // the shuffle ships only the bounded candidate arrays, stage 1 stays
    // parallel across the corpus.
    partials.coalesce(1, shuffle = true).mapPartitions { it =>
      val qs = qb.value
      val merged = Array.fill(qs.length)(scala.collection.mutable.ArrayBuffer.empty[(Double, Long)])
      it.foreach(arrs => arrs.zipWithIndex.foreach { case (a, i) => merged(i) ++= a })
      val proj = UnsafeProjection.create(output.map(_.dataType).toArray)
      merged.iterator.zipWithIndex.flatMap { case (buf, qi) =>
        buf.sortBy { case (c, id) => (-c, id) }.take(kk)
          .iterator.zipWithIndex.map { case ((c, id), r) =>
            proj(InternalRow(qs(qi)._1, r + 1, id, c)).copy(): InternalRow
          }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Bounded max-k heap over (cos, id): keeps the k highest-cosine entries,
  * ties prefer the smaller id (matches the declarative tie-break).
  *
  * Distinct-by-id: re-adding a resident id keeps its best score instead of
  * occupying two slots. This is what lets LSH/IVF reranks feed candidates
  * straight into the heap without a dropDuplicates shuffle first — a pair
  * colliding in m bands (or split across map partitions and merged) scores
  * m times but ranks once. */
final class TopKHeap(k: Int) {
  private val ord = new Ordering[(Double, Long)] {
    // min-heap eviction order: the WORST element is the smallest cos,
    // ties broken so the larger id is considered worse
    def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }
  private val pq = new scala.collection.mutable.PriorityQueue[(Double, Long)]()(ord)
  private val resident = new java.util.HashMap[java.lang.Long, java.lang.Double]()

  def add(cos: Double, id: Long): Unit = {
    val existing = resident.get(id)
    if (existing == null) addNew(cos, id)
    else if (cos > existing.doubleValue()) {
      // same id with a better score: replace (O(k) rebuild — k is small
      // and same-id rescoring only happens on band-duplicate candidates)
      val kept = pq.toArray.filter(_._2 != id)
      pq.clear()
      kept.foreach(pq.enqueue(_))
      resident.remove(id)
      addNew(cos, id)
    }
  }

  private def addNew(cos: Double, id: Long): Unit = {
    if (pq.size < k) { pq.enqueue((cos, id)); resident.put(id, cos) }
    else {
      val worst = pq.head
      if (cos > worst._1 || (cos == worst._1 && id < worst._2)) {
        val ev = pq.dequeue()
        resident.remove(ev._2)
        pq.enqueue((cos, id))
        resident.put(id, cos)
      }
    }
  }

  def toArray: Array[(Double, Long)] = pq.toArray
}
