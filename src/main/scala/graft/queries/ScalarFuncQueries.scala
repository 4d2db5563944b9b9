package graft.queries

import graft.Q
import graft.ops.Tables
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY.md §2.8 F1-F16), grouped into three
  * queries: strings, dates, math. All pure `functions._` — fully inside
  * whole-stage codegen, no UDFs.
  */
object ScalarFuncQueries {

  /** F1 trim, F2 rstrip('*'), F3 literal replace, F4 regex strip
    * non-alpha, F5 substring, F6 concat_ws, F7 empty→UNK, F8 CASE WHEN
    * bucketing.
    * Ref: covid_data_transform.py:107,123-124,131,155,163,187-188;
    * covid_simulator.py:363-370,551-552.
    */
  private val strings = Q(
    "f_string_funcs",
    (s, dir) => {
      Tables.load(s, dir, "part")
        .withColumn("name_trim", trim(col("p_name")))
        .withColumn("name_rstrip", regexp_replace(col("p_name"), "\\*+$", ""))
        .withColumn("type_nospace", regexp_replace(col("p_type"), " ", "_"))
        .withColumn("brand_alpha", regexp_replace(col("p_brand"), "[^a-zA-Z]", ""))
        .withColumn("type_prefix", substring(col("p_type"), 1, 2))
        .withColumn("loc_key", concat_ws(" : ", col("p_brand"), col("p_type")))
        .withColumn("brand_unk",
          when(col("p_brand") === "", "UNK").otherwise(col("p_brand")))
        .withColumn("size_band",
          when(col("p_size") < 10, "small")
            .when(col("p_size") < 30, "medium")
            .otherwise("large"))
        .select("p_partkey", "name_trim", "name_rstrip", "type_nospace",
          "brand_alpha", "type_prefix", "loc_key", "brand_unk", "size_band")
        .orderBy("p_partkey")
    },
    Some("""SELECT p_partkey,
                   trim(p_name) AS name_trim,
                   regexp_replace(p_name, '\*+$', '') AS name_rstrip,
                   replace(p_type, ' ', '_') AS type_nospace,
                   regexp_replace(p_brand, '[^a-zA-Z]', '', 'g') AS brand_alpha,
                   substring(p_type, 1, 2) AS type_prefix,
                   concat_ws(' : ', p_brand, p_type) AS loc_key,
                   CASE WHEN p_brand = '' THEN 'UNK' ELSE p_brand END AS brand_unk,
                   CASE WHEN p_size < 10 THEN 'small'
                        WHEN p_size < 30 THEN 'medium'
                        ELSE 'large' END AS size_band
            FROM part ORDER BY p_partkey"""))

  /** F12 date parse/reformat (the dual yyyyMMdd-int / 'yyyy-MM-dd'-string
    * encodings), F13 date comparison, F14 date arithmetic, F15 casts.
    * Ref: covid_data_transform.py:120 (int date), covid_simulator.py:343
    * (dateval string), :369 (julianday compare), :345 (timedelta).
    */
  private val dates = Q(
    "f_date_funcs",
    (s, dir) => {
      Tables.load(s, dir, "orders")
        .withColumn("d", to_date(col("o_orderdate")))
        .withColumn("date_int", date_format(col("d"), "yyyyMMdd").cast("int"))
        .withColumn("dateval", date_format(col("d"), "yyyy-MM-dd"))
        .withColumn("is_late", (col("d") > lit("1997-06-30").cast("date")).cast("int"))
        .withColumn("d_plus_30", date_add(col("d"), 30))
        .withColumn("days_since_epoch", datediff(col("d"), lit("1990-01-01").cast("date")))
        .select("o_orderkey", "date_int", "dateval", "is_late", "d_plus_30",
          "days_since_epoch")
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey,
                   CAST(strftime(CAST(o_orderdate AS DATE), '%Y%m%d') AS INT)
                     AS date_int,
                   strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS dateval,
                   CAST(CAST(o_orderdate AS DATE) > DATE '1997-06-30' AS INT)
                     AS is_late,
                   CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS d_plus_30,
                   datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
                     AS days_since_epoch
            FROM orders ORDER BY o_orderkey"""))

  /** F9 arithmetic, F10 coalesce/fillna, F11 null predicates, F16
    * abs/sqrt/pow/clamp-at-zero.
    * Ref: covid_simulator.py:361 (TAVG/10), :151 (np.where(y<0,0,y));
    * weather_pred.py:84 (sqrt), covid_data_transform.py:73 (fillna).
    */
  private val math = Q(
    "f_math_funcs",
    (s, dir) => {
      Tables.load(s, dir, "lineitem")
        .withColumn("price_scaled", round(col("l_extendedprice") / 10.0, 4))
        .withColumn("disc_price",
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4))
        .withColumn("qty_sqrt", round(sqrt(col("l_quantity")), 6))
        .withColumn("tax_sq", round(pow(col("l_tax"), 2), 6))
        .withColumn("margin_clamped",
          round(greatest(lit(0.0), col("l_extendedprice") * col("l_discount")
            - lit(2000.0)), 4))
        .withColumn("qty_filled", coalesce(col("l_quantity"), lit(0.0)))
        .withColumn("is_null_qty", col("l_quantity").isNull.cast("int"))
        .select("l_orderkey", "l_linenumber", "price_scaled", "disc_price",
          "qty_sqrt", "tax_sq", "margin_clamped", "qty_filled", "is_null_qty")
        // (l_orderkey, l_linenumber) is not unique — emitted measures
        // added as tiebreakers for a total order.
        .orderBy("l_orderkey", "l_linenumber", "price_scaled", "disc_price",
          "qty_sqrt", "tax_sq")
    },
    Some("""SELECT l_orderkey, l_linenumber,
                   round(l_extendedprice / 10.0, 4) AS price_scaled,
                   round(l_extendedprice * (1.0 - l_discount), 4) AS disc_price,
                   round(sqrt(l_quantity), 6) AS qty_sqrt,
                   round(pow(l_tax, 2), 6) AS tax_sq,
                   round(greatest(0.0, l_extendedprice * l_discount - 2000.0), 4)
                     AS margin_clamped,
                   coalesce(l_quantity, 0.0) AS qty_filled,
                   CAST(l_quantity IS NULL AS INT) AS is_null_qty
            FROM lineitem ORDER BY l_orderkey, l_linenumber, price_scaled,
                                   disc_price, qty_sqrt, tax_sq"""))

  /** Array-function surface (beyond the reference): collect → sort →
    * slice/element_at/contains over per-order quantity lists. Array
    * values never leave the plan — the emitted columns are scalars and
    * a joined string, so the oracle hash compare stays dtype-exact.
    */
  private val arrays = Q(
    "f_array_funcs",
    (s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(col("l_quantity"))).as("qs"),
          round(sum("l_quantity"), 4).as("sum_qty"))
        .withColumn("n_items", size(col("qs")))
        .withColumn("q_min", element_at(col("qs"), 1))
        .withColumn("q_max", element_at(col("qs"), -1))
        .withColumn("has_half",
          array_contains(col("qs"), 25.0).cast("int"))
        .withColumn("low3",
          concat_ws(",",
            transform(slice(col("qs"), 1, 3), x => x.cast("int").cast("string"))))
        .select("l_orderkey", "n_items", "q_min", "q_max", "has_half",
          "low3", "sum_qty")
        .orderBy("l_orderkey")
    },
    Some("""SELECT l_orderkey,
                   len(list_sort(list(l_quantity))) AS n_items,
                   list_sort(list(l_quantity))[1] AS q_min,
                   list_sort(list(l_quantity))[-1] AS q_max,
                   CAST(list_contains(list(l_quantity), 25.0) AS INT)
                     AS has_half,
                   array_to_string(list_transform(
                     list_slice(list_sort(list(l_quantity)), 1, 3),
                     x -> CAST(CAST(x AS INTEGER) AS VARCHAR)), ',') AS low3,
                   round(sum(l_quantity), 4) AS sum_qty
            FROM lineitem GROUP BY 1 ORDER BY 1"""))

  /** Map/struct surface: literal-keyed maps (map, map_concat,
    * element_at, map_keys), nested structs (named_struct, field
    * access), flattened back to scalar columns so the oracle can derive
    * every output directly from the base columns — the check is that
    * Spark's map/struct evaluation round-trips values exactly.
    */
  private val maps = Q(
    "f_map_struct_funcs",
    (s, dir) => {
      Tables.load(s, dir, "orders")
        .filter(col("o_custkey") <= 100)
        .withColumn("m",
          map(lit("pri"), col("o_orderpriority"),
            lit("stat"), col("o_orderstatus")))
        .withColumn("m2",
          map_concat(col("m"),
            map(lit("yr"), year(col("o_orderdate")).cast("string"))))
        .withColumn("st",
          named_struct(lit("key"), col("o_orderkey"),
            lit("inner"), named_struct(lit("price"), col("o_totalprice"))))
        .select(col("o_orderkey"),
          element_at(col("m2"), "pri").as("pri"),
          element_at(col("m2"), "yr").as("yr"),
          size(col("m2")).as("m_size"),
          concat_ws(",", array_sort(map_keys(col("m2")))).as("keys_csv"),
          col("st.inner.price").as("price2"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_orderpriority AS pri,
                   CAST(year(CAST(o_orderdate AS DATE)) AS VARCHAR) AS yr,
                   3 AS m_size,
                   'pri,stat,yr' AS keys_csv,
                   o_totalprice AS price2
            FROM orders WHERE o_custkey <= 100
            ORDER BY o_orderkey"""))

  /** Bitwise surface: AND/OR/XOR, shifts, bit_count — the operations
    * flag-packed columns and hash-partitioned ids need (the LSH bucket
    * math in SimilarityQueries is built on exactly these).
    */
  private val bitwise = Q(
    "f_bitwise_funcs",
    (s, dir) => {
      Tables.load(s, dir, "orders")
        .filter(col("o_custkey") <= 100)
        .select(col("o_orderkey"),
          (col("o_orderkey").bitwiseAND(lit(255L))).as("low_byte"),
          (col("o_orderkey").bitwiseOR(lit(4096L))).as("with_flag"),
          (col("o_orderkey").bitwiseXOR(col("o_custkey"))).as("mixed"),
          expr("shiftleft(o_orderkey, 2)").as("shl2"),
          expr("shiftright(o_orderkey, 3)").as("shr3"),
          bit_count(col("o_orderkey")).as("n_bits"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey,
                   o_orderkey & 255 AS low_byte,
                   o_orderkey | 4096 AS with_flag,
                   xor(o_orderkey, o_custkey) AS mixed,
                   o_orderkey << 2 AS shl2,
                   o_orderkey >> 3 AS shr3,
                   CAST(bit_count(o_orderkey) AS INT) AS n_bits
            FROM orders WHERE o_custkey <= 100
            ORDER BY o_orderkey"""))

  /** X267: HIGHER-ORDER FUNCTION surface (lambda forms: filter /
    * aggregate-fold / exists / forall / zip_with) over per-order cents
    * lists — completing the function matrix beyond f_array's
    * transform/slice. All lambda bodies are integer arithmetic so
    * every result is exact (the fold is a BIGINT sum; zip_with(qs,
    * reverse(qs), +)[1] = min+max). PERF CONTRACT, documented and
    * deliberate: HOF lambdas evaluate INTERPRETED, outside codegen
    * (the measured d6 lesson — ~40× vs a JVM loop), so this row is
    * the SURFACE proof; hot kernels in this repo use typed
    * mapPartitions instead (DedupQueries.shingled, the g3 wedge
    * kernel). A row proving the API exists AND a codebase that avoids
    * it on hot paths is the honest pairing.
    */
  private val hofs = Q(
    "f_hof_funcs",
    (s, dir) => {
      Tables.load(s, dir, "lineitem")
        .withColumn("cents",
          floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(col("cents"))).as("qs"))
        .select(col("l_orderkey"),
          size(col("qs")).as("n_items"),
          size(filter(col("qs"), x => x > lit(2500000L))).as("n_big"),
          aggregate(col("qs"), lit(0L), (acc, x) => acc + x)
            .as("fold_sum"),
          exists(col("qs"), x => x % lit(100L) === lit(0L))
            .cast("int").as("has_round_price"),
          forall(col("qs"), x => x > lit(90000L)).cast("int")
            .as("all_over_900"),
          element_at(zip_with(col("qs"), reverse(col("qs")),
            (a, b) => a + b), 1).as("min_plus_max"))
        .orderBy("l_orderkey")
    },
    Some("""WITH base AS (
              SELECT l_orderkey,
                     list_sort(list(CAST(floor(l_extendedprice * 100
                       + 0.5) AS BIGINT))) AS qs
              FROM lineitem GROUP BY 1)
            SELECT l_orderkey,
                   len(qs) AS n_items,
                   len(list_filter(qs, x -> x > 2500000)) AS n_big,
                   CAST(list_sum(qs) AS BIGINT) AS fold_sum,
                   CAST(len(list_filter(qs, x -> x % 100 = 0)) > 0
                     AS INT) AS has_round_price,
                   CAST(len(list_filter(qs, x -> x <= 90000)) = 0
                     AS INT) AS all_over_900,
                   qs[1] + qs[-1] AS min_plus_max
            FROM base ORDER BY l_orderkey"""))

  /** X293: Spark 4 VARIANT surface — the engine's binary
    * semi-structured type (`parse_json` → VARIANT, typed `variant_get`
    * path extraction, `try_variant_get` miss→NULL, `is_variant_null`
    * for JSON null vs SQL NULL) over the events props JSON. Distinct
    * from e3's string-JSON functions: VARIANT parses ONCE into a
    * binary-encoded value and every extraction is a typed path read —
    * the Spark-4 answer to shredding semi-structured columns at scale
    * (one parse per row, no re-tokenization per field; at 100 TB the
    * parse cost dominates and VARIANT pays it once). DuckDB has no
    * VARIANT; the oracle computes the identical VALUES via its JSON
    * path functions — what is proven is the extraction semantics
    * (typed get, missing-path NULL, JSON-null detection), not a shared
    * encoding. All-integer outputs.
    */
  private val variants = Q(
    "f_variant_funcs",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
      // try_variant_get (not variant_get) for the real field too: a
      // testdata regeneration that changes $.k's type must degrade to
      // NULLs on BOTH engines (oracle uses TRY_CAST), not crash here
      ev.select(col("event_type"),
          expr("try_variant_get(parse_json(props), '$.k', 'int')").as("k"),
          expr("try_variant_get(parse_json(props), '$.missing', 'int')")
            .as("miss"),
          expr("is_variant_null(parse_json('null'))").as("vnull"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("k")).cast("long").as("sum_k"),
          min(col("k")).cast("long").as("min_k"),
          max(col("k")).cast("long").as("max_k"),
          count(col("miss")).as("n_miss"),
          max(col("vnull").cast("int")).as("saw_json_null"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, count(*) AS n,
                   CAST(sum(TRY_CAST(json_extract_string(props, '$.k')
                     AS INT)) AS BIGINT) AS sum_k,
                   CAST(min(TRY_CAST(json_extract_string(props, '$.k')
                     AS INT)) AS BIGINT) AS min_k,
                   CAST(max(TRY_CAST(json_extract_string(props, '$.k')
                     AS INT)) AS BIGINT) AS max_k,
                   CAST(count(CASE WHEN json_extract(props, '$.missing')
                       IS NOT NULL THEN 1 END) AS BIGINT) AS n_miss,
                   CAST(1 AS INT) AS saw_json_null
            FROM events GROUP BY 1 ORDER BY 1"""))

  def all: Seq[Q] =
    Seq(strings, dates, math, arrays, maps, bitwise, hofs, variants)
}
