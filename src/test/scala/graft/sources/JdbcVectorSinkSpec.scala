package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** SQL-generation contract for the staged pgvector upload (no live DB in
  * this environment; the statements are the testable surface). */
class JdbcVectorSinkSpec extends AnyFunSuite {

  private val t = JdbcVectorSink.Target(
    url = "jdbc:postgresql://host/db", table = "iris_semantic_search",
    stagingTable = "iris_semantic_search_staging",
    vectorCols = Map("embedding" -> 2000), user = "u", password = "p")

  test("cast-insert casts only vector columns, nullifies empty literals") {
    val sql = JdbcVectorSink.castInsertSql(t,
      Seq("document_id", "chunk_content", "embedding"))
    assert(sql.contains("INSERT INTO iris_semantic_search (document_id, chunk_content, embedding)"))
    assert(sql.contains("NULLIF(embedding, '')::vector(2000) AS embedding"))
    assert(sql.contains("FROM iris_semantic_search_staging"))
    assert(!sql.contains("document_id::"))
  }

  test("clear and verify statements target the right table") {
    assert(JdbcVectorSink.clearSql(t) == "TRUNCATE TABLE iris_semantic_search")
    assert(JdbcVectorSink.verifySql(t).contains("FROM iris_semantic_search"))
  }

  test("unsafe identifiers are rejected, schema-qualified allowed") {
    assert(JdbcVectorSink.clearSql(t.copy(table = "public.t_1")) ==
      "TRUNCATE TABLE public.t_1")
    intercept[IllegalArgumentException] {
      JdbcVectorSink.clearSql(t.copy(table = "x; DROP TABLE y"))
    }
    intercept[IllegalArgumentException] {
      JdbcVectorSink.castInsertSql(t, Seq("good_col", "bad col"))
    }
    intercept[IllegalArgumentException] {
      JdbcVectorSink.clearSql(t.copy(table = "public."))
    }
    intercept[IllegalArgumentException] {
      JdbcVectorSink.clearSql(t.copy(table = ""))
    }
  }
}
