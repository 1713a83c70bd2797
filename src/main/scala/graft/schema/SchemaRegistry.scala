package graft.schema

import org.apache.spark.sql.types._

/** Named-StructType registry (SURVEY.md §2 A14): register/get/overwrite
  * with duplicate rejection, mirroring the reference's module-level
  * registry (…/models/schema_manager.py:10, 44-90 — duplicate ⇒ error
  * unless overwrite at :62-65) with the same three built-ins
  * auto-registered (:87-90), plus the test-fixture schemas our offline
  * file-stream sources need (streaming reads require an explicit schema).
  *
  * Thread-safe: the underlying map is only mutated under the registry's
  * monitor — executors never touch this (schemas are resolved on the
  * driver at plan time), so there is no distributed-state concern.
  */
object SchemaRegistry {

  private val registry = scala.collection.mutable.Map[String, StructType]()

  /** Register a schema by name; a duplicate name is rejected unless
    * `overwrite` (schema_manager.py:62-65).
    */
  def register(name: String, schema: StructType, overwrite: Boolean = false): Unit =
    synchronized {
      if (registry.contains(name) && !overwrite)
        throw new IllegalArgumentException(
          s"Schema '$name' already registered. Use overwrite=true to replace it.")
      registry(name) = schema
    }

  /** Retrieve a registered schema (schema_manager.py:71-84: absent ⇒ None,
    * not an error).
    */
  def get(name: String): Option[StructType] = synchronized(registry.get(name))

  def getOrThrow(name: String): StructType =
    get(name).getOrElse(throw new IllegalArgumentException(
      s"Schema '$name' not found in registry."))

  def names: Seq[String] = synchronized(registry.keys.toSeq.sorted)

  /** Reset to the built-ins (test isolation helper). */
  def reset(): Unit = synchronized {
    registry.clear()
    builtins.foreach { case (n, s) => registry(n) = s }
  }

  // --- Built-ins: the reference's three (schema_manager.py:14-41) ---

  val SimpleMessage: StructType = StructType(Seq(
    StructField("key", StringType, nullable = true),
    StructField("value", StringType, nullable = true)))

  val UserEvent: StructType = StructType(Seq(
    StructField("user_id", IntegerType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("timestamp", LongType, nullable = false),
    StructField("payload", StringType, nullable = true)))

  val DetailedProduct: StructType = StructType(Seq(
    StructField("product_id", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("description", StringType, nullable = true),
    StructField("price", DoubleType, nullable = false),
    StructField("stock_quantity", IntegerType, nullable = false),
    StructField("is_active", BooleanType, nullable = false),
    StructField("tags", ArrayType(StringType, containsNull = true), nullable = true),
    StructField("supplier_info", StructType(Seq(
      StructField("supplier_id", StringType, nullable = true),
      StructField("supplier_name", StringType, nullable = true))), nullable = true),
    StructField("last_updated", TimestampType, nullable = true),
    StructField("metadata", MapType(StringType, StringType), nullable = true)))

  // --- Fixture schemas (FIXTURES.md §2) for schema-explicit scans ---

  val Events: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = true),
    // Normalized `Tables.events` contract: epoch-ns long. Physical fixture
    // encodings vary by generation — parquet timestamp[ns] (read as ns long
    // under spark.sql.legacy.parquet.nanosAsLong) or timestamp[us] (read as
    // TIMESTAMP/TIMESTAMP_NTZ); Tables.events re-derives this long either way.
    StructField("ts", LongType, nullable = true),
    StructField("user_id", LongType, nullable = true),
    StructField("event_type", StringType, nullable = true),
    StructField("value", DoubleType, nullable = true),
    StructField("props", StringType, nullable = true)))

  val Documents: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("n_chars", LongType, nullable = true)))

  private val builtins: Seq[(String, StructType)] = Seq(
    "SIMPLE_MESSAGE_SCHEMA"   -> SimpleMessage,
    "USER_EVENT_SCHEMA"       -> UserEvent,
    "DETAILED_PRODUCT_SCHEMA" -> DetailedProduct,
    "EVENTS_SCHEMA"           -> Events,
    "DOCUMENTS_SCHEMA"        -> Documents)

  reset()
}
