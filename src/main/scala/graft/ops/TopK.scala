package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded-state per-group top-k — the primitive Spark itself lacks:
  * the idiomatic `row_number().over(partitionBy(g).orderBy(v))` sorts
  * EVERY row of a group in one task (a giant group funnels the whole
  * corpus tail through one sort), and `collect_list` holds the whole
  * group in aggregation state. This Aggregator keeps at most k
  * (value, id) pairs per partial — the state is a sorted array, inserts
  * reject anything past the current k-th entry once full, and the merge
  * of two partials is a sorted-merge truncation — exactly the algebra
  * the KMV sketch distributes (Sketches.KmvAggregator), applied to
  * ranking. Partials combine map-side, so a group's top-3 costs each
  * executor at most 3 rows of shuffle regardless of group size.
  *
  * Ordering contract: value DESC, then id ASC (ties keep the smaller
  * id) — deterministic, so a registered query over it is
  * hash-oracle-checkable against a plain ROW_NUMBER mirror.
  */
object TopK {

  /** State/result: pairs as (negValue, id), kept ascending — natural
    * tuple order on the negated value IS (value DESC, id ASC). */
  class TopKAggregator(k: Int)
      extends Aggregator[(Long, Long), Array[(Long, Long)], Array[(Long, Long)]] {
    require(k >= 1, s"top-k needs k >= 1, got $k")

    override def zero: Array[(Long, Long)] = Array.empty

    override def reduce(buf: Array[(Long, Long)],
        in: (Long, Long)): Array[(Long, Long)] = {
      val key = (-in._1, in._2)
      val ord = implicitly[Ordering[(Long, Long)]]
      if (buf.length >= k && ord.gteq(key, buf.last)) buf
      else {
        var ins = buf.indexWhere(e => ord.lt(key, e))
        if (ins < 0) ins = buf.length
        val out = new Array[(Long, Long)](math.min(buf.length + 1, k))
        System.arraycopy(buf, 0, out, 0, math.min(ins, out.length))
        if (ins < out.length) {
          out(ins) = key
          System.arraycopy(buf, ins, out, ins + 1, out.length - ins - 1)
        }
        out
      }
    }

    override def merge(a: Array[(Long, Long)],
        b: Array[(Long, Long)]): Array[(Long, Long)] = {
      val ord = implicitly[Ordering[(Long, Long)]]
      val out = new Array[(Long, Long)](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var n = 0
      while (n < out.length && (i < a.length || j < b.length)) {
        out(n) =
          if (j >= b.length || (i < a.length && ord.lteq(a(i), b(j)))) {
            val x = a(i); i += 1; x
          } else { val x = b(j); j += 1; x }
        n += 1
      }
      if (n == out.length) out else out.take(n)
    }

    override def finish(r: Array[(Long, Long)]): Array[(Long, Long)] = r
    override def bufferEncoder: Encoder[Array[(Long, Long)]] =
      ExpressionEncoder[Array[(Long, Long)]]()
    override def outputEncoder: Encoder[Array[(Long, Long)]] =
      ExpressionEncoder[Array[(Long, Long)]]()
  }

  /** Top-k rows per group by (valueCol DESC, idCol ASC): one row per
    * kept entry as (groupCol, rk, idCol, valueCol). One aggregation
    * (partial-combined, ≤ k pairs of state per group per partial) plus
    * a bounded explode — no window, no per-group sort of the full
    * group. */
  def perGroup(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, k: Int): DataFrame = {
    // the bounded state keys on the NEGATED value, so (a) a fractional
    // score must not be silently truncated into a different ranking —
    // callers cast/scale explicitly — and (b) Long.MinValue is rejected
    // up front: -Long.MinValue == Long.MinValue would sort the smallest
    // value as the largest key
    import org.apache.spark.sql.types._
    val vt = df.schema(valueCol).dataType
    require(Seq[DataType](ByteType, ShortType, IntegerType, LongType)
      .contains(vt),
      s"TopK.perGroup ranks integral values only (got $vt for " +
        s"'$valueCol'); scale fractional scores to an integer grid first")
    val agg = udaf(new TopKAggregator(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    val guarded = col(valueCol).cast("long")
    df.select(col(groupCol).as("__g"),
        struct(when(guarded === lit(Long.MinValue),
            raise_error(lit("TopK.perGroup: Long.MinValue value cannot " +
              "be ranked (negation overflow)")).cast("long"))
          .otherwise(guarded).as("_1"),
          col(idCol).cast("long").as("_2")).as("__in"))
      .groupBy(col("__g"))
      .agg(agg(col("__in._1"), col("__in._2")).as("__top"))
      .select(col("__g"), posexplode(col("__top")).as(Seq("__pos", "__e")))
      .select(col("__g").as(groupCol),
        (col("__pos") + 1).cast("int").as("rk"),
        col("__e._2").as(idCol),
        (-col("__e._1")).as(valueCol))
  }
}
