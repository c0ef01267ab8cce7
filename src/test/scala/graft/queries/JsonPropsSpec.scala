package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Schema-on-read over the untyped props column: malformed payloads
  * degrade to NULL and are COUNTED (never thrown), schema-missing
  * fields are NULL, and the registered report's laws hold on the
  * fixture (parse coverage, bound counts, explicit-division average).
  */
class JsonPropsSpec extends SparkSpecBase {

  private val schema = StructType(Seq(StructField("k", LongType)))

  test("malformed and schema-mismatched payloads null out, row count holds") {
    import spark.implicits._
    val raw = Seq(
      (1L, """{"k": 42}"""),          // clean
      (2L, """{"k": "notanint"}"""),  // type mismatch -> null field
      (3L, """not json at all"""),    // malformed -> null struct
      (4L, """{"other": 7}"""),       // field absent -> null field
      (5L, null.asInstanceOf[String]), // null payload -> null struct
      // the branches the mirror's json_type guard replays (r11 ADVICE:
      // a bare CAST mirror THREW on 6; TRY_CAST alone would coerce it
      // to 12 where from_json degrades non-numeric JSON types to NULL)
      (6L, """{"k": "12"}"""),        // string-quoted number -> null
      (7L, """{"k": 1.5}"""),         // non-integer number -> null
      (8L, """{"k": null}""")         // explicit JSON null -> null
    ).toDF("id", "props")
    val parsed = raw.select(col("id"),
      from_json(col("props"), schema).getField("k").as("k"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(parsed === Map(1L -> Some(42L), 2L -> None, 3L -> None,
      4L -> None, 5L -> None, 6L -> None, 7L -> None, 8L -> None))
  }

  test("fixture report: full parse coverage and internally consistent stats") {
    val rows = EventsQueries.jsonProps(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, parsed) = (r.getAs[Long]("n_events"), r.getAs[Long]("n_parsed"))
      assert(n === parsed, s"fixture is all well-formed: $r")
      assert(r.getAs[Long]("min_k") <= r.getAs[Long]("max_k"))
      assert(r.getAs[Long]("n_k_high") <= n)
      val avg = BigDecimal(r.getAs[Long]("sum_k").toDouble / parsed)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("avg_k") === avg)
      assert(avg >= r.getAs[Long]("min_k") && avg <= r.getAs[Long]("max_k"))
    }
  }
}
