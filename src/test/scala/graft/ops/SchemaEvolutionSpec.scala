package graft.ops

import graft.SparkSpec

/** Schema drift across parquet files — the reality of any long-lived
  * table: files written before a column existed must still read alongside
  * files written after. `mergeSchema` unifies the footer schemas; rows
  * from old files surface the new column as NULL.
  */
class SchemaEvolutionSpec extends SparkSpec {

  import spark.implicits._

  test("mergeSchema reads old and new parquet files as one evolved table") {
    val dir = tmpDir("schema_evo")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 30L), (4L, "d", 40L)).toDF("id", "v", "score")
      .write.mode("append").parquet(dir)

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("id", "score", "v"))
    val rows = merged.select($"id", $"v", $"score")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(rows === Set((1L, "a", -1L), (2L, "b", -1L),
                        (3L, "c", 30L), (4L, "d", 40L)))

    // explicit-schema read (the engine's static-schema discipline) also
    // spans both file generations — pre-drift rows NULL out the new column
    val explicit = spark.read.schema(merged.schema).parquet(dir)
    assert(explicit.count() === 4)
    assert(explicit.where($"score".isNull).count() === 2)
  }
}
