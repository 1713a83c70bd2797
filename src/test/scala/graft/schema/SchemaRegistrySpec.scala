package graft.schema

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Registry round-trip, duplicate rejection, and overwrite — the scenarios
  * asserted at …/models/schema_manager.py:93-159.
  */
class SchemaRegistrySpec extends AnyFunSuite {

  private val custom = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("data", StringType, nullable = true)))

  test("built-ins are registered (schema_manager.py:87-90)") {
    assert(SchemaRegistry.get("SIMPLE_MESSAGE_SCHEMA").contains(SchemaRegistry.SimpleMessage))
    assert(SchemaRegistry.get("USER_EVENT_SCHEMA").contains(SchemaRegistry.UserEvent))
    assert(SchemaRegistry.get("DETAILED_PRODUCT_SCHEMA").contains(SchemaRegistry.DetailedProduct))
  }

  test("round-trip, duplicate rejection, overwrite (schema_manager.py:136-157)") {
    SchemaRegistry.reset()
    SchemaRegistry.register("CUSTOM_SCHEMA", custom)
    assert(SchemaRegistry.get("CUSTOM_SCHEMA").contains(custom))

    val e = intercept[IllegalArgumentException] {
      SchemaRegistry.register("CUSTOM_SCHEMA", custom)
    }
    assert(e.getMessage.contains("already registered"))

    val v2 = custom.add(StructField("version", IntegerType, nullable = true))
    SchemaRegistry.register("CUSTOM_SCHEMA", v2, overwrite = true)
    assert(SchemaRegistry.get("CUSTOM_SCHEMA").get.fields.length === 3)
    SchemaRegistry.reset()
  }

  test("absent schema is None, not an error (schema_manager.py:71-84)") {
    assert(SchemaRegistry.get("NON_EXISTENT_SCHEMA").isEmpty)
    val e = intercept[IllegalArgumentException] {
      SchemaRegistry.getOrThrow("NON_EXISTENT_SCHEMA")
    }
    assert(e.getMessage.contains("not found"))
  }
}
