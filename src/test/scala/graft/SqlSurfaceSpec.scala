package graft

import graft.operators.Relational

class SqlSurfaceSpec extends SparkSpec {

  test("SQL over registered views matches the DataFrame plan (q01)") {
    GraftSql.register(spark, sf)
    val viaSql = spark.sql(
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
      .collect().map(_.toString).toSeq
    val viaDf = Relational.q01PricingSummary(spark, sf)
      .selectExpr("l_returnflag", "l_linestatus", "sum_qty")
      .collect().map(_.toString).toSeq
    assert(viaSql == viaDf)
  }

  test("native vector_dot callable from SQL, agrees with DataFrame API") {
    GraftSql.register(spark, sf)
    val sql = spark.sql(
      "SELECT vec_id, vector_dot(embedding, embedding) AS d FROM embeddings ORDER BY vec_id LIMIT 5")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    import org.apache.spark.sql.functions.col
    val df = Tables.embeddings(spark, sf)
      .select(col("vec_id"), graft.functions.VectorFunctions.dot(col("embedding"), col("embedding")).as("d"))
      .orderBy("vec_id").limit(5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(sql.sameElements(df))
    assert(sql.forall(_._2 > 0.0))
  }

  test("native minhash_signature callable from SQL") {
    GraftSql.register(spark, sf)
    val rows = spark.sql(
      """SELECT doc_id, minhash_signature(
        |  array_distinct(transform(split(text, '\\s+'), t -> xxhash64(t))), 16) AS sig
        |FROM documents ORDER BY doc_id LIMIT 3""".stripMargin).collect()
    assert(rows.length == 3)
    rows.foreach(r => assert(r.getSeq[Long](1).length == 16))
  }

  test("native simhash64 and srp_signature callable from SQL, agree with DataFrame API") {
    GraftSql.register(spark, sf)
    val sim = spark.sql(
      """SELECT simhash64(transform(split(text, '\\s+'), t -> xxhash64(t))) AS sh
        |FROM documents ORDER BY doc_id LIMIT 3""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(sim.distinct.length == 3)
    val viaSql = spark.sql(
      """SELECT vec_id, srp_signature(embedding, 128, 42) AS sig
        |FROM embeddings ORDER BY vec_id LIMIT 5""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toSeq
    val viaDf = Tables.embeddings(spark, sf)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        graft.functions.VectorFunctions.srpSig(
          org.apache.spark.sql.functions.col("embedding")).as("sig"))
      .orderBy("vec_id").limit(5)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toSeq
    assert(viaSql == viaDf)
  }

  test("recursive CTE: q83 ancestor walk matches a closed-form driver oracle") {
    import org.apache.spark.sql.functions.col
    val prices = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_retailprice"))
      .collect()
      .map(r => r.getLong(0) -> math.floor(r.getDouble(1) * 100.0 + 0.5).toLong)
      .toMap
    // closed-form oracle: walk pk, pk/2, ... down to <= 1 driver-side
    def chain(pk: Long): (Long, Long) = {
      var cur = pk; var depth = 0L; var cents = prices(pk)
      while (cur > 1) { cur /= 2; depth += 1; cents += prices(cur) }
      (depth, cents)
    }
    val got = Relational.q83RecursiveCte(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == prices.keySet, "one output row per part")
    got.foreach { case (pk, res) =>
      assert(res == chain(pk), s"pk=$pk got=$res want=${chain(pk)}")
    }
    // depth is structurally log2(pk) for pk >= 1 on the dense keyspace
    got.foreach { case (pk, (d, _)) =>
      if (pk >= 1) assert(d == (63 - java.lang.Long.numberOfLeadingZeros(pk)).toLong)
      else assert(d == 0L)
    }
  }

  test("SQL join + window over views") {
    GraftSql.register(spark, sf)
    val n = spark.sql(
      """SELECT * FROM (
        |  SELECT c_name, o_orderkey,
        |    row_number() OVER (PARTITION BY c_custkey ORDER BY o_totalprice DESC) AS rn
        |  FROM customer JOIN orders ON c_custkey = o_custkey) t
        |WHERE rn <= 2""".stripMargin).count()
    assert(n > 0)
  }
}
