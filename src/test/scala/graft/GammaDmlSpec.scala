package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.table.{GammaTable, VectorFieldDef}

/** SQL UPDATE / MERGE INTO / subquery-DELETE over gamma relations (the
  * GammaDmlRewrite analyzer rule installed via spark.sql.extensions).
  */
class GammaDmlSpec extends GraftSuite {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_dml").toString

  private var viewN = 0
  /** Fresh table + temp view per test; returns the view name. */
  private def mkView(rows: Seq[(String, Int, String, Seq[Float])]): (String, String) = {
    val root = tmp()
    GammaTable.create(spark, root, "dml", "_id",
      rows.toDF("_id", "v", "tag", "vec"),
      Seq(VectorFieldDef("vec", 2)), nBuckets = 4)
    viewN += 1
    val view = s"dml_v$viewN"
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW $view USING gamma OPTIONS (path '$root')")
    (view, root)
  }

  private val base = Seq(
    ("a", 1, "ta", Seq(1f, 2f)),
    ("b", 2, "tb", Seq(3f, 4f)),
    ("c", 3, "tc", Seq(5f, 6f)))

  test("UPDATE SET patches only the assigned columns; vectors survive") {
    val (v, _) = mkView(base)
    spark.sql(s"UPDATE $v SET v = v + 10 WHERE v >= 2")
    val got = spark.table(v).select("_id", "v", "tag", "vec").collect()
      .map(r => r.getString(0) ->
        ((r.getInt(1), r.getString(2), r.getSeq[Float](3).toSeq))).toMap
    assert(got === Map(
      "a" -> ((1, "ta", Seq(1f, 2f))),
      "b" -> ((12, "tb", Seq(3f, 4f))),
      "c" -> ((13, "tc", Seq(5f, 6f)))))
  }

  test("UPDATE assignments are simultaneous: every RHS sees original values") {
    val root = tmp()
    GammaTable.create(spark, root, "swap", "_id",
      Seq(("a", 1, 100), ("b", 2, 200)).toDF("_id", "x", "y"), nBuckets = 2)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW dml_swap USING gamma OPTIONS (path '$root')")
    spark.sql("UPDATE dml_swap SET x = y, y = x")
    val got = spark.table("dml_swap").select("_id", "x", "y").collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(got === Map("a" -> ((100, 1)), "b" -> ((200, 2))))
  }

  test("UPDATE refuses a key reassignment") {
    val (v, _) = mkView(base)
    val e = intercept[Exception](
      spark.sql(s"UPDATE $v SET _id = concat(_id, 'x')"))
    assert(e.getMessage.contains("cannot reassign the table key"))
  }

  test("MERGE INTO: conditional matched update/delete + not-matched insert") {
    val (v, _) = mkView(base)
    Seq(("a", 10), ("b", -1), ("d", 40))
      .toDF("sid", "sv").createOrReplaceTempView("dml_src")
    spark.sql(
      s"""MERGE INTO $v t USING dml_src s ON t._id = s.sid
         |WHEN MATCHED AND s.sv < 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.sv
         |WHEN NOT MATCHED THEN INSERT (_id, v) VALUES (s.sid, s.sv)
         |""".stripMargin)
    val got = spark.table(v)
      .select(col("_id"), col("v"), col("tag"),
        when(col("vec").isNull, -1).otherwise(size(col("vec"))).as("dim"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getInt(1), Option(r.getString(2)), r.getInt(3)))).toMap
    assert(got === Map(
      "a" -> ((10, Some("ta"), 2)), // matched update keeps tag AND vec
      "c" -> ((3, Some("tc"), 2)),  // untouched
      "d" -> ((40, None, -1))))     // inserted: unassigned columns null
  }

  test("MERGE NOT MATCHED BY SOURCE update and delete") {
    val (v, _) = mkView(base)
    Seq("a").toDF("sid").createOrReplaceTempView("dml_src2")
    spark.sql(
      s"""MERGE INTO $v t USING dml_src2 s ON t._id = s.sid
         |WHEN MATCHED THEN UPDATE SET v = 0
         |WHEN NOT MATCHED BY SOURCE AND t.v >= 3 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET tag = 'orphan'
         |""".stripMargin)
    val got = spark.table(v).select("_id", "v", "tag").collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getString(2)))).toMap
    assert(got === Map(
      "a" -> ((0, "ta")),      // matched
      "b" -> ((2, "orphan")))) // c deleted by the first NMBS action
  }

  test("MERGE NOT MATCHED BY SOURCE binds to the pre-merge snapshot (non-key ON)") {
    // ON t.v = s.sv (non-key): the matched UPDATE changes v, which makes
    // the updated row 'not matched by source' in the POST-commit state —
    // the NMBS DELETE must still bind to the pre-merge snapshot and leave
    // the freshly-updated row alone
    val root = tmp()
    GammaTable.create(spark, root, "nmbs", "_id",
      Seq(("a", 1, "ta"), ("b", 2, "tb"), ("c", 3, "tc")).toDF("_id", "v", "tag"),
      nBuckets = 4)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW dml_nmbs USING gamma OPTIONS (path '$root')")
    Seq(1).toDF("sv").createOrReplaceTempView("dml_nmbs_src")
    spark.sql(
      s"""MERGE INTO dml_nmbs t USING dml_nmbs_src s ON t.v = s.sv
         |WHEN MATCHED THEN UPDATE SET v = 99
         |WHEN NOT MATCHED BY SOURCE AND t.tag = 'tb' THEN DELETE
         |""".stripMargin)
    val got = spark.table("dml_nmbs").select("_id", "v").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    // a: matched (v=1), updated to 99 — NOT deleted despite now being
    // unmatched; b: pre-merge unmatched with tag tb — deleted; c: kept
    assert(got === Map("a" -> 99, "c" -> 3))
  }

  test("MERGE star actions: UPDATE SET * / INSERT * map source columns by name") {
    val root = tmp()
    GammaTable.create(spark, root, "star", "_id",
      Seq(("a", 1, "ta"), ("b", 2, "tb")).toDF("_id", "v", "tag"), nBuckets = 2)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW dml_star USING gamma OPTIONS (path '$root')")
    // star expansion covers every exposed target column including _docid,
    // so the source carries a null one (the table assigns docids; the
    // assignment is storage-ignored)
    Seq(("a", 100, "sa"), ("c", 300, "sc")).toDF("_id", "v", "tag")
      .withColumn("_docid", lit(null).cast("long"))
      .createOrReplaceTempView("dml_star_src")
    spark.sql(
      """MERGE INTO dml_star t USING dml_star_src s ON t._id = s._id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = spark.table("dml_star").select("_id", "v", "tag").collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getString(2)))).toMap
    assert(got === Map(
      "a" -> ((100, "sa")), "b" -> ((2, "tb")), "c" -> ((300, "sc"))))
  }

  test("MERGE rejects a target row matched by two source rows") {
    val (v, _) = mkView(base)
    Seq(("a", 1), ("a", 2)).toDF("sid", "sv").createOrReplaceTempView("dml_dup")
    val e = intercept[Exception](spark.sql(
      s"""MERGE INTO $v t USING dml_dup s ON t._id = s.sid
         |WHEN MATCHED THEN UPDATE SET v = s.sv""".stripMargin))
    assert(e.getMessage.contains("cardinality"))
  }

  test("UPDATE by key rewrites exactly the key's bucket (manifest-diff bound)") {
    val root = tmp()
    GammaTable.create(spark, root, "wamp", "_id",
      (0 until 64).map(i => (s"k$i", i)).toDF("_id", "v"), nBuckets = 8)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW dml_wamp USING gamma OPTIONS (path '$root')")
    val before = GammaTable.load(spark, root).meta.bucketVersions
    spark.sql("UPDATE dml_wamp SET v = -1 WHERE _id = 'k7'")
    val after = GammaTable.load(spark, root).meta.bucketVersions
    val moved = after.keySet.filter(b => before.get(b) != after.get(b))
    // write amplification is ONE bucket of 8: the narrow delta hashes to
    // the key's bucket and the merge rewrites only that
    assert(moved.size === 1, s"expected 1 rewritten bucket, got $moved")
    assert(spark.table("dml_wamp").filter($"_id" === "k7")
      .select("v").as[Int].head() === -1)
  }

  test("DELETE FROM with a subquery predicate routes through deleteByQuery") {
    val (v, _) = mkView(base)
    Seq("a", "c").toDF("did").createOrReplaceTempView("dml_del")
    spark.sql(s"DELETE FROM $v WHERE _id IN (SELECT did FROM dml_del)")
    assert(spark.table(v).select("_id").as[String].collect().toSet === Set("b"))
  }

  test("UPDATE against a snapshot read is refused") {
    val (_, root) = mkView(base)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW dml_snap USING gamma " +
      s"OPTIONS (path '$root', versionAsOf '1')")
    val e = intercept[Exception](spark.sql("UPDATE dml_snap SET v = 0"))
    assert(e.getMessage.contains("snapshot"))
  }
}
