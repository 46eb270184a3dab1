package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}

import scala.collection.mutable

/** Map-side bounded-heap partial top-k per key.
  *
  * `row_number().over(partitionBy(key).orderBy(...)) <= k` shuffles EVERY
  * input row to the key's reducer before any can be discarded — for a
  * scoring relation of Q queries × N corpus rows that is a corpus-sized
  * exchange. Rows outside a partition's own per-key top-k can never be in
  * the global top-k, so this operator truncates map-side: one pass per
  * partition keeping at most k rows per key in a bounded heap
  * (k × |keys| rows of state), emitting ≤ k × |keys| rows per partition.
  * The caller finishes with the normal window over the reduced relation —
  * shuffle volume drops from N×Q rows to k × |keys| × partitions.
  *
  * This is genuine per-partition imperative logic (a bounded heap has no
  * Column-algebra equivalent with partial truncation — `collect_list`
  * partials carry the whole group), the documented last-resort case for
  * `mapPartitions`. Output schema == input schema; row order within a
  * partition is heap order (callers re-sort in the finish window).
  *
  * Ranking is (sortCol DESC, tieCol ASC) — the "best score first, stable
  * id tie-break" shape every top-k query here uses. Both columns must be
  * numeric (double/long); the key may be any type with sane equals.
  */
object TopKPerKey {
  def partial(df: DataFrame, key: String, sortDescCol: String,
      tieAscCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val schema = df.schema
    val ki = schema.fieldIndex(key)
    val si = schema.fieldIndex(sortDescCol)
    val ti = schema.fieldIndex(tieAscCol)
    def num(r: Row, i: Int): Double = r.get(i) match {
      case d: java.lang.Double => d
      case f: java.lang.Float => f.toDouble
      case l: java.lang.Long => l.toDouble
      case n: java.lang.Integer => n.toDouble
      case x => sys.error(s"non-numeric rank column value: $x")
    }
    // "worst-first" ordering: the heap's max is the row to evict —
    // lowest sort value; among equals, the highest tie value.
    val worstFirst: Ordering[Row] = (a: Row, b: Row) => {
      val c = java.lang.Double.compare(num(b, si), num(a, si))
      if (c != 0) c else java.lang.Double.compare(num(a, ti), num(b, ti))
    }
    df.mapPartitions { it =>
      val heaps = mutable.HashMap.empty[Any, mutable.PriorityQueue[Row]]
      it.foreach { r =>
        val h = heaps.getOrElseUpdate(r.get(ki),
          mutable.PriorityQueue.empty[Row](worstFirst))
        if (h.size < k) h.enqueue(r)
        else if (worstFirst.compare(r, h.head) < 0) { h.dequeue(); h.enqueue(r) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }(Encoders.row(schema))
  }
}
