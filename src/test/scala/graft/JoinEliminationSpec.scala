package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.Constraints

/** Constraint-based redundant-join elimination: a declared-PK dimension
  * join whose columns the query never uses must vanish from the plan —
  * and must NOT vanish whenever a soundness precondition fails. */
class JoinEliminationSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def fixtures(): (String, String) = {
    import spark.implicits._
    val dim = TestSpark.tempDir("graft-je-dim")
    val fact = TestSpark.tempDir("graft-je-fact")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("pk", "label")
      .write.mode("overwrite").parquet(dim)
    Seq((10L, 1L, 5.0), (11L, 1L, 7.0), (12L, 3L, 9.0))
      .toDF("id", "fk", "v").write.mode("overwrite").parquet(fact)
    (fact, dim)
  }

  private def scanCount(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
    }.size

  test("unused left-outer dim join is eliminated under a declared PK") {
    val (fact, dim) = fixtures()
    def q() = spark.read.parquet(fact)
      .join(spark.read.parquet(dim), col("fk") === col("pk"), "left_outer")
      .groupBy(col("fk")).agg(sum(col("v")).as("s"))
    val want = q().collect().toSet
    try {
      Constraints.declareKey(dim, "pk")
      val served = q()
      assert(scanCount(served) === 1, "dimension scan must be eliminated")
      assert(served.collect().toSet === want)
      // projection form too
      val p = spark.read.parquet(fact)
        .join(spark.read.parquet(dim), col("fk") === col("pk"), "left_outer")
        .select(col("id"), col("v"))
      assert(scanCount(p) === 1)
      assert(p.collect().length === 3)
    } finally Constraints.clear()
  }

  test("inner join needs the FK declaration; PK alone keeps the join") {
    val (fact, dim) = fixtures()
    def q() = spark.read.parquet(fact)
      .join(spark.read.parquet(dim), col("fk") === col("pk"))
      .select(col("id"), col("v"))
    val want = q().collect().map(_.toSeq).toSet
    try {
      Constraints.declareKey(dim, "pk")
      assert(scanCount(q()) === 2,
        "inner elimination without referential integrity is unsound")
      Constraints.declareForeignKey(fact, "fk", dim)
      val served = q()
      assert(scanCount(served) === 1)
      assert(served.collect().map(_.toSeq).toSet === want)
      // a filter on the LEFT side is fine — it doesn't touch soundness
      val f = spark.read.parquet(fact).filter(col("v") > 6.0)
        .join(spark.read.parquet(dim), col("fk") === col("pk"))
        .select(col("id"))
      assert(scanCount(f) === 1 && f.collect().length === 2)
    } finally Constraints.clear()
  }

  test("DISTINCT over a declared unique key collapses to a projection") {
    val (_, dim) = fixtures()
    def q() = spark.read.parquet(dim).select("pk", "label").distinct()
    def hasAggregate(df: DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }.nonEmpty
    val want = q().collect().map(_.toSeq).toSet
    assert(hasAggregate(q()), "without a declared key the de-dup must stay")
    try {
      Constraints.declareKey(dim, "pk")
      val served = q()
      assert(!hasAggregate(served), "unique-key DISTINCT must fold away")
      assert(served.collect().map(_.toSeq).toSet === want)
      // filtered scans are still unique
      val f = spark.read.parquet(dim).filter(col("pk") > 1L)
        .select("pk", "label").distinct()
      assert(!hasAggregate(f) && f.collect().length === 2)
      // distinct WITHOUT the key column keeps its aggregate
      val noKey = spark.read.parquet(dim).select("label").distinct()
      assert(hasAggregate(noKey) && noKey.collect().length === 3)
    } finally Constraints.clear()
  }

  test("verifyAndDeclareKey audits before declaring; duplicates refuse") {
    val s2 = spark
    import s2.implicits._
    val good = TestSpark.tempDir("graft-vk-good")
    val dup = TestSpark.tempDir("graft-vk-dup")
    Seq((1L, "a"), (2L, "b")).toDF("pk", "v").write.mode("overwrite").parquet(good)
    Seq((1L, "a"), (1L, "b")).toDF("pk", "v").write.mode("overwrite").parquet(dup)
    try {
      Constraints.verifyAndDeclareKey(spark, good, "pk")
      val q = spark.read.parquet(good).select("pk", "v").distinct()
      assert(q.queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }.isEmpty, "audited key must enable the distinct fold")
      val e = intercept[IllegalArgumentException](
        Constraints.verifyAndDeclareKey(spark, dup, "pk"))
      assert(e.getMessage.contains("not a unique non-null key"))
      // the failed audit declared NOTHING
      val qd = spark.read.parquet(dup).select("pk").distinct()
      assert(qd.collect().length === 1)
    } finally Constraints.clear()
  }

  test("soundness guards: dim filter, used dim column, undeclared key") {
    val (fact, dim) = fixtures()
    try {
      Constraints.declareKey(dim, "pk")
      Constraints.declareForeignKey(fact, "fk", dim)
      // a FILTERED dimension can drop rows — keep the join
      val filtered = spark.read.parquet(fact)
        .join(spark.read.parquet(dim).filter(col("label") =!= "a"),
          col("fk") === col("pk"))
        .select(col("id"))
      assert(scanCount(filtered) === 2)
      assert(filtered.collect().length === 1)
      // a used dimension column obviously keeps the join
      val used = spark.read.parquet(fact)
        .join(spark.read.parquet(dim), col("fk") === col("pk"), "left_outer")
        .select(col("id"), col("label"))
      assert(scanCount(used) === 2)
      // join on a NON-key dim column: no elimination
      val nonKey = spark.read.parquet(fact)
        .join(spark.read.parquet(dim),
          col("fk") === col("pk"), "left_outer")
      Constraints.clear()
      assert(scanCount(nonKey.select(col("id"))) === 2,
        "cleared constraints must stop the rewrite")
    } finally Constraints.clear()
  }

  test("gravityModel: positive mass elasticities, r2 in [0,1]") {
    val r = graft.operators.Joins.gravityModel(TestSpark.spark, TestSpark.sfDir)
      .collect().head
    assert(r.getAs[Long]("n_pairs") > 0L)
    assert(r.getAs[Double]("b_customer_mass") > 0.0)
    assert(r.getAs[Double]("b_supplier_mass") > 0.0)
    val r2 = r.getAs[Double]("r2")
    assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9)
  }
}
