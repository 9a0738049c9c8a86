package graft

import graft.core.GraftConfig

/** The SetConfig/GetConfig analog (reference c_api/gamma_api.h:181-189):
  * the knob registry is complete, validated, and its documented defaults
  * match what the reading call sites actually use when unset.
  */
class GraftConfigSpec extends GraftSuite {

  test("registry lists every spark.graft.* knob exactly once") {
    val keys = GraftConfig.knobs.map(_.key)
    assert(keys.distinct === keys)
    assert(keys.forall(_.startsWith("spark.graft.")))
    // the registry IS the inventory: every knob read anywhere in the
    // engine must appear here (grep-pinned set, updated with new knobs)
    assert(keys.toSet === Set(
      "spark.graft.ann.rewrite",
      "spark.graft.filter.exactFallbackRows",
      "spark.graft.filter.broadcastMaxKeys",
      "spark.graft.hnsw.adaptiveEf",
      "spark.graft.hnsw.maxExcludedRows",
      "spark.graft.ivf.adaptiveProbe",
      "spark.graft.table.lease",
      "spark.graft.topk.sortedMinGroups",
      "spark.graft.topk.sortedMaxInflation"))
  }

  test("documented defaults match the reading call sites") {
    def default(key: String): String =
      GraftConfig.knobs.find(_.key == key).get.default
    // each pin mirrors the unset-fallback at the call site it documents
    assert(default("spark.graft.ann.rewrite") === "false") // AnnRewrite.enabled
    assert(default("spark.graft.filter.broadcastMaxKeys") === "1000000")
    assert(default("spark.graft.filter.exactFallbackRows") === "auto") // cost model when unset
    assert(default("spark.graft.hnsw.adaptiveEf") === "true") // forall(_.toBoolean)
    assert(default("spark.graft.hnsw.maxExcludedRows") === "2000000")
    assert(default("spark.graft.ivf.adaptiveProbe") === "true")
    assert(default("spark.graft.topk.sortedMinGroups") === "1000000")
    assert(default("spark.graft.topk.sortedMaxInflation") === "8")
  }

  test("set/get round-trip; unknown keys rejected; all() reflects the session") {
    intercept[IllegalArgumentException](
      GraftConfig.set(spark, "spark.graft.ann.rewrte", "true")) // typo fails loudly
    intercept[IllegalArgumentException](
      GraftConfig.get(spark, "spark.graft.nope"))
    GraftConfig.set(spark, "spark.graft.topk.sortedMaxInflation", "4")
    try {
      assert(GraftConfig.get(spark, "spark.graft.topk.sortedMaxInflation") === "4")
      val row = GraftConfig.all(spark)
        .filter(org.apache.spark.sql.functions.col("key") ===
          "spark.graft.topk.sortedMaxInflation")
        .select("value", "default").head()
      assert(row.getString(0) === "4" && row.getString(1) === "8")
    } finally GraftConfig.unset(spark, "spark.graft.topk.sortedMaxInflation")
    assert(GraftConfig.get(spark, "spark.graft.topk.sortedMaxInflation") === "8")
  }

  test("SQL SET is the transport: a knob set in SQL is visible to the registry") {
    spark.sql("SET spark.graft.ivf.adaptiveProbe=false")
    try assert(GraftConfig.get(spark, "spark.graft.ivf.adaptiveProbe") === "false")
    finally GraftConfig.unset(spark, "spark.graft.ivf.adaptiveProbe")
  }
}
