package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar function families (SURVEY.md §2 C-scalar): string, math,
  * date/time, JSON, array/map/struct incl. generators (explode).
  *
  * All expressions are built-in `org.apache.spark.sql.functions` — fully
  * codegen'd, no UDFs in any hot path. Outputs avoid raw timestamp / array
  * columns (engine-precision traps): timestamps are formatted to strings,
  * arrays joined or reduced to scalars, so the DuckDB compare is exact.
  */
object Scalars extends QueryPack {

  /** String family: case, substring, trim, concat, regexp, length,
    * levenshtein, split+size (A8 upper included).
    */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir)
      .select($"p_partkey",
        upper($"p_name").as("name_upper"),
        lower($"p_brand").as("brand_lower"),
        substring($"p_name", 1, 8).as("name_prefix"),
        length($"p_name").as("name_len"),
        trim(concat(lit("  "), $"p_type", lit("  "))).as("type_trimmed"),
        concat_ws("-", $"p_brand", $"p_type").as("brand_type"),
        regexp_extract($"p_brand", "#(\\d+)", 1).as("brand_num"),
        regexp_replace($"p_name", " ", "_").as("name_snake"),
        size(split($"p_name", " ")).as("n_words"),
        levenshtein($"p_brand", lit("Brand#00")).as("lev_dist"))
      .orderBy($"p_partkey")
  }

  /** Math family. `ceil`/`floor` return long in Spark (oracle casts to
    * match); transcendentals rounded to 6 dp — libm last-ulp drift sits far
    * below that.
    */
  def mathFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .select($"c_custkey",
        round($"c_acctbal", 1).as("bal_round"),
        abs($"c_acctbal").as("bal_abs"),
        ceil($"c_acctbal").as("bal_ceil"),
        floor($"c_acctbal").as("bal_floor"),
        round(sqrt(abs($"c_acctbal")), 6).as("bal_sqrt"),
        ($"c_acctbal" * $"c_acctbal").as("bal_sq"),
        round(log(abs($"c_acctbal") + 1.0), 6).as("bal_ln"),
        round(exp($"c_acctbal" / lit(10000.0)), 6).as("bal_exp"),
        pmod($"c_custkey", lit(7L)).as("key_mod"))
      .orderBy($"c_custkey")
  }

  /** Date/time family over orders (ms-precision timestamps — safe in both
    * engines; formatted outputs dodge physical-type drift).
    */
  def dateFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select($"o_orderkey",
        year($"o_orderdate").as("y"),
        month($"o_orderdate").as("m"),
        dayofmonth($"o_orderdate").as("d"),
        quarter($"o_orderdate").as("q"),
        dayofweek($"o_orderdate").as("dow"),
        date_format($"o_orderdate", "yyyy-MM-dd").as("date_str"),
        date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM-dd").as("month_start"),
        date_format(date_add($"o_orderdate", 30), "yyyy-MM-dd").as("plus30"),
        datediff(lit("2002-01-01").cast("date"), $"o_orderdate").as("days_to_2002"),
        unix_timestamp($"o_orderdate").as("epoch_s"))
      .orderBy($"o_orderkey")
  }

  /** JSON family over events.props (the schema registry's designed use:
    * payload JSON parsed later — reference schema_manager.py:23).
    */
  def jsonFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_id",
        get_json_object($"props", "$.k").as("k_str"),
        from_json($"props", org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k_int"),
        to_json(struct($"event_id", $"event_type")).as("as_json"),
        // dev-time schema inference (SURVEY C-scalar: schema_of_json);
        // foldable input ⇒ constant-folded, zero per-row cost
        schema_of_json(lit("""{"k": 1}""")).as("inferred_schema"))
      .orderBy($"event_id")
  }

  /** Map family (SURVEY C-scalar map: map_keys / map_values / explode on
    * a map): a map built per row, its key/value views reduced to scalars,
    * and the map exploded to (k, v) rows alongside them — the generator
    * form for MapType. Spark's `map()` preserves argument order, so the
    * joined views and the explode order are deterministic.
    */
  def mapFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir)
      .withColumn("m", map(lit("brand"), $"p_brand", lit("type"), $"p_type"))
      .select($"p_partkey",
        array_join(map_keys($"m"), ",").as("mkeys"),
        array_join(map_values($"m"), ",").as("mvals"),
        size(map_keys($"m")).cast("long").as("n_entries"),
        explode($"m").as(Seq("k", "v")))
      .select($"p_partkey", $"mkeys", $"mvals", $"n_entries", $"k", $"v")
      .orderBy($"p_partkey", $"k")
  }

  /** Array family + generator: explode part-name tokens into a word count
    * (C35's generator surface), plus array transforms reduced to scalars.
    */
  def arrayFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir)
      .select(explode(split($"p_name", " ")).as("word"))
      .groupBy($"word")
      .agg(count(lit(1)).as("n"))
      .orderBy($"word")
  }

  /** Array higher-order + map/struct scalars reduced to scalar outputs:
    * transform/filter/aggregate (fold), sort_array, array_distinct,
    * array_contains, element_at on map, struct field access.
    */
  def collectionFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir)
      .select($"p_partkey", split($"p_name", " ").as("words"), $"p_brand", $"p_size")
      .select($"p_partkey",
        array_join(sort_array(array_distinct($"words")), ",").as("uniq_sorted"),
        size(filter($"words", w => length(w) > 4)).as("n_long_words"),
        aggregate($"words", lit(0), (acc, w) => acc + length(w)).as("total_chars"),
        array_contains($"words", "green").as("has_green"),
        array_join(transform($"words", w => upper(w)), " ").as("words_upper"),
        element_at(map(lit("size"), $"p_size"), "size").as("size_via_map"),
        struct($"p_brand".as("b"), $"p_size".as("s")).getField("b").as("brand_via_struct"))
      .orderBy($"p_partkey")
  }

  /** URL parsing — the web-curation scalar family. Spark's `parse_url`
    * (HOST / PATH / QUERY / per-key QUERY) over URLs synthesized
    * deterministically from fixture columns; DuckDB has no parse_url, so
    * the oracle replays the extraction with anchored regexes — agreement
    * proves the component semantics, not just the happy path (the
    * fragment case exercises QUERY stopping at `#`).
    */
  def urlFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("url",
        concat(lit("https://"), $"source", lit(".example.com/docs/"),
               $"doc_id", lit("?lang="), $"lang", lit("&ref="), $"source",
               lit("#sec"), $"doc_id" % 10))
      .select($"doc_id",
        parse_url($"url", lit("HOST")).as("host"),
        parse_url($"url", lit("PATH")).as("path"),
        parse_url($"url", lit("QUERY")).as("query"),
        parse_url($"url", lit("QUERY"), lit("lang")).as("q_lang"),
        parse_url($"url", lit("REF")).as("fragment"))
      .orderBy($"doc_id")
  }

  /** Error-safe scalar family — Spark 4 runs ANSI mode by default, where
    * a single malformed cell or division by zero fails the whole 100 TB
    * job; the `try_*` forms return NULL instead. The gate plants both
    * failure kinds (un-castable strings, zero denominators) and pins the
    * NULL contract against DuckDB's TRY_CAST / NULLIF twins.
    */
  def tryFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir)
      .select($"p_partkey",
        expr("try_cast(regexp_extract(p_brand, '#([0-9]+)', 1) AS INT)")
          .as("brand_num"),                       // always castable
        // castable only above size 25 → mixed NULLs (both engines surface
        // a nullable int column identically; an ALL-null column's pandas
        // dtype would depend on the engine)
        expr("try_cast(CASE WHEN p_size > 25 THEN CAST(p_size AS STRING) " +
             "ELSE p_type END AS INT)").as("maybe_num"),
        expr("try_divide(p_retailprice, p_size - 25)").as("per_size"),
        coalesce(expr("try_divide(p_retailprice, p_size - 25)"), lit(0.0))
          .as("per_size_safe"),
        expr("try_cast(p_size AS STRING)").as("size_str"))
      .orderBy($"p_partkey")
  }

  /** Regex scalar family — the pattern toolkit every curation rule is
    * built from: occurrence counting, group extraction (first and all,
    * the all-matches list serialized to a scalar for the gate), and
    * pattern predicates. Patterns stay inside the RE2 ∩ java.util.regex
    * common subset (literals, classes, alternation, `\b`) — the portable
    * dialect a cross-engine pipeline must standardize on anyway.
    */
  def regexFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        regexp_count($"text", lit("""\b(fast|slow)\b""")).cast("long").as("n_speed"),
        regexp_extract($"text", """\b(fast|slow)\b""", 1).as("first_speed"),
        array_join(
          regexp_extract_all($"text", lit("""\b(fast|slow)\b"""), lit(1)), "|")
          .as("all_speed"),
        $"text".rlike("(fast|slow) table").as("has_speed_table"))
      .orderBy($"doc_id")
  }

  /** Bitwise scalar family — the bit-level toolkit behind bitmap indexes,
    * bloom probes, and the Z-order interleave: and/or/xor, shifts, and
    * popcount, everything cast to INT so both engines surface int32.
    */
  def bitwiseFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir)
      .select($"p_partkey",
        expr("p_size & 15").cast("int").as("b_and"),
        expr("p_size | 16").cast("int").as("b_or"),
        expr("p_size ^ cast(p_partkey % 256 as int)").cast("int").as("b_xor"),
        shiftleft($"p_size", 2).cast("int").as("b_shl"),
        shiftright($"p_size", 1).cast("int").as("b_shr"),
        bit_count($"p_size").cast("int").as("b_pop"))
      .orderBy($"p_partkey")
  }

  /** Conditional scalar family — greatest/least, NULLIF/COALESCE, IF and
    * multi-branch CASE: the null-routing and clamping toolkit every
    * cleaning pipeline leans on. All pure row-local expressions (one
    * codegen'd projection, no shuffle) with integer/string outputs that
    * cannot diverge cross-engine.
    */
  def conditionalFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir)
      .select($"p_partkey",
        greatest($"p_size", lit(10)).as("size_floor10"),
        least($"p_size", lit(25)).as("size_cap25"),
        expr("nullif(p_type, 'PROMO')").as("type_nullifed"),
        coalesce(expr("nullif(p_type, 'PROMO')"), lit("OTHER")).as("type_or_other"),
        expr("if(p_size > 25, 'big', 'small')").as("size_class"),
        when($"p_retailprice" > 1500.0, "premium")
          .when($"p_retailprice" > 800.0, "mid")
          .otherwise("budget").as("price_tier"))
      .orderBy($"p_partkey")
  }

  /** Struct construction + JSON serialization — nested values cross the
    * gate as canonical JSON text (the driver's comparator cannot sort
    * struct cells, same rule as arrays), proving named_struct/to_json on
    * one side and struct_pack/to_json on the other produce byte-identical
    * canonical form.
    */
  def structJson(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir)
      .select($"p_partkey",
        to_json(struct($"p_brand".as("brand"), $"p_size".as("size")))
          .as("part_info"),
        get_json_object(
          to_json(struct($"p_type".as("t"), $"p_retailprice".as("price"))),
          "$.t").as("type_roundtrip"))
      .orderBy($"p_partkey")
  }

  /** Native XML parsing (Spark 4 `from_xml` — the semi-structured
    * ingestion path for feed/scrape corpora). DuckDB has no XML reader,
    * so the gate is a ROUND-TRIP oracle: the XML is constructed in-plan
    * from table fields (integer/char-only — no float or escaping
    * hazards), Spark parses it back with `from_xml` and emits the parsed
    * fields; the oracle computes the same construction (string concat is
    * engine-portable) and passes the source fields through directly. A
    * parser divergence breaks the hash on `parsed_k`/`parsed_s`.
    * Scalar-only → codegen'd, embarrassingly parallel.
    */
  def xmlFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .withColumn("xml", concat(
        lit("<o><k>"), $"o_orderkey", lit("</k><s>"), $"o_orderstatus",
        lit("</s><p>"), $"o_orderpriority", lit("</p></o>")))
      .withColumn("px", from_xml($"xml",
        org.apache.spark.sql.types.StructType.fromDDL(
          "k BIGINT, s STRING, p STRING")))
      .select($"o_orderkey", $"xml",
        $"px.k".as("parsed_k"), $"px.s".as("parsed_s"),
        $"px.p".as("parsed_p"))
      .orderBy($"o_orderkey")
  }

  /** VARIANT — Spark 4's open semi-structured type (the
    * schema-on-read path for heterogeneous JSON event props at ingest
    * scale: parse once into a binary-encoded variant, extract typed
    * fields lazily). `parse_json` → `variant_get` with typed paths;
    * DuckDB's twin is its JSON type with `json_extract`. Untyped
    * `variant_get(…)::string` of a JSON object is engine-specific
    * formatting, so the gate extracts TYPED leaves only.
    */
  def variantFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_id",
        expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k_big"),
        expr("variant_get(parse_json(props), '$.k', 'string')").as("k_str"),
        coalesce(
          expr("variant_get(parse_json(props), '$.missing', 'bigint')"),
          lit(-1L)).as("k_missing"),
        expr("try_parse_json('not json') is null").as("bad_parses_null"))
      .orderBy($"event_id")
  }

  /** explode_outer — the generator's null-preserving form: a row whose
    * array is EMPTY survives with a NULL element instead of vanishing
    * (plain explode silently drops it — the classic row-loss bug when
    * flattening optional lists). DuckDB's lateral unnest has the
    * drop-the-row behavior, so the oracle spells the preservation
    * explicitly: unnest a [NULL] substitute for empty arrays.
    */
  def explodeOuterFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir)
      .withColumn("long_words",
        expr("filter(split(p_type, ' '), w -> length(w) >= 8)"))
      .select($"p_partkey", size($"long_words").as("n_long"),
              explode_outer($"long_words").as("word"))
      .orderBy($"p_partkey", $"word")
  }

  /** String collations (Spark 4) — case-insensitive semantics pushed
    * INTO the type instead of wrapping every expression in lower():
    * grouping and equality on a `COLLATE UTF8_LCASE` column merge case
    * variants engine-side. The fixture plants deterministic case
    * variants (partkey mod 3 picks upper/lower/original), so collation
    * visibly changes the group count. DuckDB's twin spells the same
    * semantics with lower(); outputs are the lowercase canonical key +
    * counts, never a raw collated representative (which group member
    * "represents" a collated group is not deterministic).
    */
  def collationFuncs(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql(
      """WITH v AS (
        |  SELECT CAST(CASE WHEN p_partkey % 3 = 0 THEN upper(p_type)
        |              WHEN p_partkey % 3 = 1 THEN lower(p_type)
        |              ELSE p_type END AS STRING COLLATE UTF8_LCASE) AS t
        |  FROM part)
        |SELECT min(lower(t)) AS type_key, COUNT(*) AS n,
        |  COUNT_IF(t = 'standard anodized brass') AS n_eq_ci,
        |  COUNT_IF(startswith(t, 'PROMO')) AS n_promo_ci
        |FROM v GROUP BY t ORDER BY type_key""".stripMargin)
  }

  /** Binary/encoding scalar family — content addressing and transport
    * encodings (the hash-a-blob / base64-a-payload surface ingest jobs
    * lean on): md5 / sha2-256 digests, hex and base64 encodings, the
    * base64 round-trip, and octet length on the raw bytes. All
    * byte-deterministic; DuckDB twins are md5/sha256/hex/to_base64.
    */
  def binaryEncFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir)
      .select($"p_partkey",
        md5($"p_name".cast("binary")).as("name_md5"),
        sha2($"p_name".cast("binary"), 256).as("name_sha256"),
        hex($"p_name").as("name_hex"),
        base64($"p_name".cast("binary")).as("name_b64"),
        ($"p_name" === decode(unbase64(base64($"p_name".cast("binary"))),
                              "UTF-8")).as("b64_roundtrip"),
        octet_length($"p_name").cast("long").as("name_octets"))
      .orderBy($"p_partkey")
  }

  /** Pad / trim-chars / translate family — fixed-width rendering and
    * character-level cleanup (report keys, code normalization). DuckDB
    * shares lpad/rpad/trim-chars/translate/repeat/reverse; initcap has
    * no DuckDB builtin, so the oracle spells it as a split→capitalize→
    * rejoin over single-space-tokenized input (the fixture's shape).
    */
  def padTrimFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir)
      .select($"p_partkey",
        lpad($"p_partkey".cast("string"), 10, "0").as("key_padded"),
        rpad($"p_brand", 12, ".").as("brand_padded"),
        ltrim(concat(lit("###"), $"p_brand"), lit("#")).as("brand_ltrim"),
        rtrim(concat($"p_type", lit("___")), lit("_")).as("type_rtrim"),
        translate($"p_brand", "#123456789", "-ABCDEFGHI").as("brand_coded"),
        repeat(lit("ab"), ($"p_partkey" % 4).cast("int")).as("rep"),
        reverse($"p_name").as("name_rev"),
        initcap($"p_type").as("type_title"))
      .orderBy($"p_partkey")
  }

  /** Timezone-offset conversions (from_utc_timestamp / to_utc_timestamp)
    * — pinned with FIXED offsets only: region zones would couple the
    * gate to the JVM-vs-ICU tzdata versions (a DST rule change breaks
    * bit-equality for reasons that are nobody's bug), while fixed
    * offsets reduce to exact epoch arithmetic, which is precisely what
    * the oracle computes — so the gate checks Spark's offset parsing
    * and shifting against plain integer math.
    */
  def timezoneFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_id",
        unix_micros(from_utc_timestamp($"ts_utc", "+05:30")).as("ist_us"),
        unix_micros(to_utc_timestamp($"ts_utc", "-08:00")).as("from_pst_us"),
        hour(from_utc_timestamp($"ts_utc", "+05:30")).as("ist_hour"),
        date_format(from_utc_timestamp($"ts_utc", "+05:30"), "yyyy-MM-dd")
          .as("ist_date"))
      .orderBy($"event_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scalar_timezone"    -> (timezoneFuncs _),
    "scalar_pad_trim"    -> (padTrimFuncs _),
    "scalar_binary_enc"  -> (binaryEncFuncs _),
    "scalar_collation"   -> (collationFuncs _),
    "scalar_explode_outer" -> (explodeOuterFuncs _),
    "scalar_xml"         -> (xmlFuncs _),
    "scalar_variant"     -> (variantFuncs _),
    "scalar_struct_json" -> (structJson _),
    "scalar_conditional" -> (conditionalFuncs _),
    "scalar_bitwise"     -> (bitwiseFuncs _),
    "scalar_regex"       -> (regexFuncs _),
    "scalar_try"         -> (tryFuncs _),
    "scalar_url"         -> (urlFuncs _),
    "scalar_string"      -> (stringFuncs _),
    "scalar_math"        -> (mathFuncs _),
    "scalar_date"        -> (dateFuncs _),
    "scalar_json"        -> (jsonFuncs _),
    "scalar_map"         -> (mapFuncs _),
    "scalar_array_explode" -> (arrayFuncs _),
    "scalar_collections" -> (collectionFuncs _)
  )

  def oracle: Map[String, String] = Map(
    // fixed offsets are exact epoch arithmetic: +05:30 = 19_800s,
    // to_utc from -08:00 adds 28_800s; hour/date derive by floor math
    "scalar_timezone" ->
      """WITH e AS (
        |  SELECT event_id, (epoch_ns(ts) // 1000)::BIGINT AS tus FROM events)
        |SELECT event_id,
        |  tus + 19800000000 AS ist_us,
        |  tus + 28800000000 AS from_pst_us,
        |  (((tus + 19800000000) // 3600000000) % 24)::INT AS ist_hour,
        |  strftime(make_timestamp(tus + 19800000000), '%Y-%m-%d') AS ist_date
        |FROM e ORDER BY event_id""".stripMargin,
    "scalar_pad_trim" ->
      """SELECT p_partkey,
        |  lpad(p_partkey::VARCHAR, 10, '0') AS key_padded,
        |  rpad(p_brand, 12, '.') AS brand_padded,
        |  ltrim('###' || p_brand, '#') AS brand_ltrim,
        |  rtrim(p_type || '___', '_') AS type_rtrim,
        |  translate(p_brand, '#123456789', '-ABCDEFGHI') AS brand_coded,
        |  repeat('ab', (p_partkey % 4)::INT) AS rep,
        |  reverse(p_name) AS name_rev,
        |  array_to_string(list_transform(string_split(lower(p_type), ' '),
        |    w -> upper(w[1]) || w[2:]), ' ') AS type_title
        |FROM part ORDER BY p_partkey""".stripMargin,
    "scalar_binary_enc" ->
      """SELECT p_partkey,
        |  md5(p_name) AS name_md5,
        |  sha256(p_name) AS name_sha256,
        |  hex(p_name) AS name_hex,
        |  to_base64(encode(p_name)) AS name_b64,
        |  TRUE AS b64_roundtrip,
        |  octet_length(encode(p_name))::BIGINT AS name_octets
        |FROM part ORDER BY p_partkey""".stripMargin,
    // the lower()-spelled twin of the collated semantics
    "scalar_collation" ->
      """WITH v AS (
        |  SELECT CASE WHEN p_partkey % 3 = 0 THEN upper(p_type)
        |         WHEN p_partkey % 3 = 1 THEN lower(p_type)
        |         ELSE p_type END AS t
        |  FROM part)
        |SELECT lower(t) AS type_key, COUNT(*) AS n,
        |  (COUNT(*) FILTER (WHERE lower(t) = 'standard anodized brass'))::BIGINT
        |    AS n_eq_ci,
        |  (COUNT(*) FILTER (WHERE lower(t) LIKE 'promo%'))::BIGINT
        |    AS n_promo_ci
        |FROM v GROUP BY lower(t) ORDER BY type_key""".stripMargin,
    "scalar_explode_outer" ->
      """WITH a AS (
        |  SELECT p_partkey,
        |    list_filter(string_split(p_type, ' '), w -> len(w) >= 8)
        |      AS long_words
        |  FROM part)
        |SELECT p_partkey, len(long_words)::INT AS n_long,
        |  unnest(CASE WHEN len(long_words) = 0
        |              THEN [NULL]::VARCHAR[] ELSE long_words END) AS word
        |FROM a ORDER BY p_partkey, word""".stripMargin,
    // round-trip: the oracle rebuilds the identical XML string and passes
    // the source fields straight through — Spark's from_xml must invert
    // the construction exactly or parsed_* breaks the hash
    "scalar_xml" ->
      """SELECT o_orderkey,
        |  '<o><k>' || o_orderkey || '</k><s>' || o_orderstatus ||
        |    '</s><p>' || o_orderpriority || '</p></o>' AS xml,
        |  o_orderkey AS parsed_k,
        |  o_orderstatus AS parsed_s,
        |  o_orderpriority AS parsed_p
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "scalar_variant" ->
      """SELECT event_id,
        |  json_extract(props, '$.k')::BIGINT AS k_big,
        |  json_extract_string(props, '$.k') AS k_str,
        |  COALESCE(json_extract(props, '$.missing')::BIGINT, -1) AS k_missing,
        |  TRUE AS bad_parses_null
        |FROM events ORDER BY event_id""".stripMargin,
    "scalar_struct_json" ->
      """SELECT p_partkey,
        |  to_json(struct_pack(brand := p_brand, size := p_size))::VARCHAR
        |    AS part_info,
        |  json_extract_string(
        |    to_json(struct_pack(t := p_type, price := p_retailprice)), '$.t')
        |    AS type_roundtrip
        |FROM part ORDER BY p_partkey""".stripMargin,
    "scalar_conditional" ->
      """SELECT p_partkey,
        |  greatest(p_size, 10)::INTEGER AS size_floor10,
        |  least(p_size, 25)::INTEGER AS size_cap25,
        |  nullif(p_type, 'PROMO') AS type_nullifed,
        |  COALESCE(nullif(p_type, 'PROMO'), 'OTHER') AS type_or_other,
        |  IF(p_size > 25, 'big', 'small') AS size_class,
        |  CASE WHEN p_retailprice > 1500.0 THEN 'premium'
        |       WHEN p_retailprice > 800.0 THEN 'mid'
        |       ELSE 'budget' END AS price_tier
        |FROM part ORDER BY p_partkey""".stripMargin,
    "scalar_bitwise" ->
      """SELECT p_partkey,
        |  CAST(p_size & 15 AS INTEGER) AS b_and,
        |  CAST(p_size | 16 AS INTEGER) AS b_or,
        |  CAST(xor(p_size, CAST(p_partkey % 256 AS INTEGER)) AS INTEGER) AS b_xor,
        |  CAST(p_size << 2 AS INTEGER) AS b_shl,
        |  CAST(p_size >> 1 AS INTEGER) AS b_shr,
        |  CAST(bit_count(p_size) AS INTEGER) AS b_pop
        |FROM part ORDER BY p_partkey""".stripMargin,
    "scalar_regex" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '\b(fast|slow)\b', 1))::BIGINT AS n_speed,
        |  regexp_extract(text, '\b(fast|slow)\b', 1) AS first_speed,
        |  COALESCE(array_to_string(regexp_extract_all(text, '\b(fast|slow)\b', 1),
        |                           '|'), '') AS all_speed,
        |  regexp_matches(text, '(fast|slow) table') AS has_speed_table
        |FROM documents ORDER BY doc_id""".stripMargin,
    "scalar_try" ->
      """SELECT p_partkey,
        |  TRY_CAST(regexp_extract(p_brand, '#([0-9]+)', 1) AS INTEGER)
        |    AS brand_num,
        |  TRY_CAST(CASE WHEN p_size > 25 THEN CAST(p_size AS VARCHAR)
        |           ELSE p_type END AS INTEGER) AS maybe_num,
        |  p_retailprice / NULLIF(p_size - 25, 0) AS per_size,
        |  COALESCE(p_retailprice / NULLIF(p_size - 25, 0), 0.0)
        |    AS per_size_safe,
        |  CAST(p_size AS VARCHAR) AS size_str
        |FROM part ORDER BY p_partkey""".stripMargin,
    "scalar_url" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://' || source || '.example.com/docs/' || doc_id ||
        |    '?lang=' || lang || '&ref=' || source || '#sec' || (doc_id % 10)
        |      AS url
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
        |  regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
        |  regexp_extract(url, '\?([^#]*)', 1) AS query,
        |  regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS q_lang,
        |  regexp_extract(url, '#(.*)$', 1) AS fragment
        |FROM u ORDER BY doc_id""".stripMargin,
    "scalar_string" ->
      """SELECT p_partkey,
        |  UPPER(p_name) AS name_upper,
        |  LOWER(p_brand) AS brand_lower,
        |  SUBSTRING(p_name, 1, 8) AS name_prefix,
        |  CAST(LENGTH(p_name) AS INTEGER) AS name_len,
        |  TRIM('  ' || p_type || '  ') AS type_trimmed,
        |  p_brand || '-' || p_type AS brand_type,
        |  regexp_extract(p_brand, '#(\d+)', 1) AS brand_num,
        |  REPLACE(p_name, ' ', '_') AS name_snake,
        |  CAST(LEN(string_split(p_name, ' ')) AS INTEGER) AS n_words,
        |  CAST(levenshtein(p_brand, 'Brand#00') AS INTEGER) AS lev_dist
        |FROM part ORDER BY p_partkey""".stripMargin,
    "scalar_math" ->
      """SELECT c_custkey,
        |  ROUND(c_acctbal, 1) AS bal_round,
        |  ABS(c_acctbal) AS bal_abs,
        |  CAST(CEIL(c_acctbal) AS BIGINT) AS bal_ceil,
        |  CAST(FLOOR(c_acctbal) AS BIGINT) AS bal_floor,
        |  ROUND(SQRT(ABS(c_acctbal)), 6) AS bal_sqrt,
        |  c_acctbal * c_acctbal AS bal_sq,
        |  ROUND(LN(ABS(c_acctbal) + 1.0), 6) AS bal_ln,
        |  ROUND(EXP(c_acctbal / 10000.0), 6) AS bal_exp,
        |  ((c_custkey % 7) + 7) % 7 AS key_mod
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "scalar_date" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  CAST(day(o_orderdate) AS INTEGER) AS d,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS q,
        |  CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
        |  strftime(o_orderdate, '%Y-%m-%d') AS date_str,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_to_2002,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "scalar_json" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
        |  '{"event_id":' || event_id || ',"event_type":"' || event_type || '"}' AS as_json,
        |  'STRUCT<k: BIGINT>' AS inferred_schema
        |FROM events ORDER BY event_id""".stripMargin,
    // the map is replayed as its UNION ALL expansion (same rows Spark's
    // explode(map) generates, in the same key order)
    "scalar_map" ->
      """SELECT p_partkey,
        |  'brand,type' AS mkeys,
        |  p_brand || ',' || p_type AS mvals,
        |  CAST(2 AS BIGINT) AS n_entries, k, v
        |FROM (
        |  SELECT p_partkey, p_brand, p_type, 'brand' AS k, p_brand AS v FROM part
        |  UNION ALL
        |  SELECT p_partkey, p_brand, p_type, 'type', p_type FROM part
        |)
        |ORDER BY p_partkey, k""".stripMargin,
    "scalar_array_explode" ->
      """SELECT word, COUNT(*) AS n FROM (
        |  SELECT UNNEST(string_split(p_name, ' ')) AS word FROM part
        |) GROUP BY word ORDER BY word""".stripMargin,
    "scalar_collections" ->
      """SELECT p_partkey,
        |  array_to_string(list_sort(list_distinct(string_split(p_name, ' '))), ',') AS uniq_sorted,
        |  CAST(LEN(list_filter(string_split(p_name, ' '), w -> LENGTH(w) > 4)) AS INTEGER) AS n_long_words,
        |  CAST(list_sum(list_transform(string_split(p_name, ' '), w -> LENGTH(w))) AS INTEGER) AS total_chars,
        |  list_contains(string_split(p_name, ' '), 'green') AS has_green,
        |  array_to_string(list_transform(string_split(p_name, ' '), w -> UPPER(w)), ' ') AS words_upper,
        |  p_size AS size_via_map,
        |  p_brand AS brand_via_struct
        |FROM part ORDER BY p_partkey""".stripMargin
  )
}
