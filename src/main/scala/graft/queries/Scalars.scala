package graft.queries

import Support._

/** Scalar-function contract queries (SURVEY.md §2.7): string / regex / date /
  * math / conditional / cast / JSON / array / generator families. These are
  * the SQL surface itself, so both sides are SQL; the DuckDB text applies the
  * mechanical dialect translations of SURVEY.md §5.4 (string_split, len,
  * UNNEST, json_extract_string, VARCHAR, regexp_replace 'g' flag, date
  * arithmetic) plus BIGINT casts where DuckDB widens.
  */
object Scalars {

  val defs: Seq[Q] = Seq(

    sqlQ("q44_string_funcs",
      """SELECT p_partkey, UPPER(p_brand) u, LOWER(p_type) lo, CAST(LENGTH(p_name) AS BIGINT) len,
        |       SUBSTRING(p_name, 1, 8) sub, TRIM(CONCAT('  ', p_brand, '  ')) tr,
        |       REPLACE(p_type, 'a', '_') rep, LPAD(CAST(p_size AS STRING), 4, '0') pad,
        |       CAST(SIZE(SPLIT(p_name, ' ')) AS BIGINT) words
        |FROM part ORDER BY p_partkey LIMIT 60""".stripMargin,
      """SELECT p_partkey, UPPER(p_brand) u, LOWER(p_type) lo, CAST(LENGTH(p_name) AS BIGINT) len,
        |       SUBSTRING(p_name, 1, 8) sub, TRIM(CONCAT('  ', p_brand, '  ')) tr,
        |       REPLACE(p_type, 'a', '_') rep, LPAD(CAST(p_size AS VARCHAR), 4, '0') pad,
        |       CAST(LEN(STRING_SPLIT(p_name, ' ')) AS BIGINT) words
        |FROM part ORDER BY p_partkey LIMIT 60""".stripMargin),

    sqlQ("q45_regex",
      """SELECT p_partkey, REGEXP_EXTRACT(p_name, '([a-z]+)', 1) first_word,
        |       REGEXP_REPLACE(p_brand, '[0-9]+', '#') b
        |FROM part ORDER BY p_partkey LIMIT 60""".stripMargin,
      """SELECT p_partkey, REGEXP_EXTRACT(p_name, '([a-z]+)', 1) first_word,
        |       REGEXP_REPLACE(p_brand, '[0-9]+', '#', 'g') b
        |FROM part ORDER BY p_partkey LIMIT 60""".stripMargin),

    sqlQ("q46_date_funcs",
      """SELECT o_orderkey, CAST(YEAR(CAST(o_orderdate AS DATE)) AS BIGINT) y,
        |       CAST(MONTH(CAST(o_orderdate AS DATE)) AS BIGINT) m,
        |       CAST(QUARTER(CAST(o_orderdate AS DATE)) AS BIGINT) q,
        |       CAST(DATE_TRUNC('month', CAST(o_orderdate AS DATE)) AS DATE) mstart,
        |       DATE_ADD(CAST(o_orderdate AS DATE), 30) plus30,
        |       CAST(DATEDIFF(DATE '2000-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) dd
        |FROM orders ORDER BY o_orderkey LIMIT 100""".stripMargin,
      """SELECT o_orderkey, CAST(YEAR(CAST(o_orderdate AS DATE)) AS BIGINT) y,
        |       CAST(MONTH(CAST(o_orderdate AS DATE)) AS BIGINT) m,
        |       CAST(QUARTER(CAST(o_orderdate AS DATE)) AS BIGINT) q,
        |       CAST(DATE_TRUNC('month', CAST(o_orderdate AS DATE)) AS DATE) mstart,
        |       CAST(o_orderdate AS DATE) + 30 plus30,
        |       CAST(DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS BIGINT) dd
        |FROM orders ORDER BY o_orderkey LIMIT 100""".stripMargin),

    sqlQ("q47_math_funcs",
      """SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 1) r,
        |       ABS(l_discount - 0.05) a, CAST(CEIL(l_quantity/7.0) AS BIGINT) c,
        |       CAST(FLOOR(l_quantity/7.0) AS BIGINT) f,
        |       CAST(MOD(CAST(l_quantity AS INT), 5) AS BIGINT) m, ROUND(POWER(l_tax+1, 2),6) pw,
        |       ROUND(SQRT(l_extendedprice),4) sq, ROUND(LN(l_extendedprice),6) lg
        |FROM lineitem WHERE l_orderkey < 50 ORDER BY l_orderkey, l_linenumber, r, a, c, f, m, pw, sq, lg""".stripMargin,
      """SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 1) r,
        |       ABS(l_discount - 0.05) a, CAST(CEIL(l_quantity/7.0) AS BIGINT) c,
        |       CAST(FLOOR(l_quantity/7.0) AS BIGINT) f,
        |       CAST(MOD(CAST(l_quantity AS INT), 5) AS BIGINT) m, ROUND(POWER(l_tax+1, 2),6) pw,
        |       ROUND(SQRT(l_extendedprice),4) sq, ROUND(LN(l_extendedprice),6) lg
        |FROM lineitem WHERE l_orderkey < 50 ORDER BY l_orderkey, l_linenumber, r, a, c, f, m, pw, sq, lg""".stripMargin),

    sameQ("q48_conditional",
      """SELECT o_orderkey,
        |       CASE WHEN o_totalprice > 200000 THEN 'big' WHEN o_totalprice > 50000 THEN 'mid' ELSE 'small' END sz,
        |       COALESCE(NULLIF(o_orderstatus,'O'), 'open') st,
        |       GREATEST(o_custkey, o_orderkey % 1000) g, LEAST(o_custkey, o_orderkey % 1000) l
        |FROM orders ORDER BY o_orderkey LIMIT 200""".stripMargin),

    // DECIMAL(12,2) stays under test, but is emitted as its canonical string
    // form on both engines: the driver's byte-level hash diverged on the raw
    // DECIMAL parquet/JDBC encodings in round 1 even though values matched
    // (VERDICT r1 §wrong-2).
    sqlQ("q49_casts",
      """SELECT l_orderkey, l_linenumber,
        |       CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS STRING) dec2,
        |       CAST(CAST(l_shipdate AS DATE) AS STRING) ds,
        |       CAST(l_quantity AS INT) qi, CAST(CAST(l_orderkey AS STRING) AS BIGINT) rt
        |FROM lineitem WHERE l_orderkey < 40 ORDER BY l_orderkey, l_linenumber, dec2, ds, qi, rt""".stripMargin,
      """SELECT l_orderkey, l_linenumber,
        |       CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR) dec2,
        |       CAST(CAST(l_shipdate AS DATE) AS VARCHAR) ds,
        |       CAST(l_quantity AS INTEGER) qi, CAST(CAST(l_orderkey AS VARCHAR) AS BIGINT) rt
        |FROM lineitem WHERE l_orderkey < 40 ORDER BY l_orderkey, l_linenumber, dec2, ds, qi, rt""".stripMargin),

    sqlQ("q50_json",
      """SELECT event_id, CAST(GET_JSON_OBJECT(props, '$.k') AS INT) k
        |FROM events WHERE user_id < 25 ORDER BY event_id""".stripMargin,
      """SELECT event_id, CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER) k
        |FROM events WHERE user_id < 25 ORDER BY event_id""".stripMargin),

    sqlQ("q51_array_basics",
      """SELECT vec_id, CAST(SIZE(embedding) AS BIGINT) dim,
        |       ROUND(CAST(ELEMENT_AT(embedding, 1) AS DOUBLE),6) e1,
        |       ROUND(CAST(ELEMENT_AT(embedding, 64) AS DOUBLE),6) e64
        |FROM embeddings ORDER BY vec_id LIMIT 100""".stripMargin,
      """SELECT vec_id, CAST(LEN(embedding) AS BIGINT) dim,
        |       ROUND(CAST(embedding[1] AS DOUBLE),6) e1,
        |       ROUND(CAST(embedding[64] AS DOUBLE),6) e64
        |FROM embeddings ORDER BY vec_id LIMIT 100""".stripMargin),

    sqlQ("q52_explode",
      """SELECT vec_id, COUNT(*) n, ROUND(SUM(CAST(e AS DOUBLE)),4) s
        |FROM (SELECT vec_id, EXPLODE(embedding) AS e FROM embeddings WHERE vec_id < 10) t
        |GROUP BY vec_id ORDER BY vec_id""".stripMargin,
      """SELECT vec_id, COUNT(*) n, ROUND(SUM(CAST(e AS DOUBLE)),4) s
        |FROM (SELECT vec_id, UNNEST(embedding) AS e FROM embeddings WHERE vec_id < 10) t
        |GROUP BY vec_id ORDER BY vec_id""".stripMargin),

    // The sorted list is serialized to CSV in-query: the driver's pandas
    // harness cannot hash an array-typed column (round-1 q53 row errored with
    // `unhashable numpy.ndarray`). The typed ARRAY form stays under test in
    // OracleSuite ("q53 typed array equivalence").
    sqlQ("q53_collect_list",
      """SELECT l_orderkey, ARRAY_JOIN(ARRAY_SORT(COLLECT_LIST(l_linenumber)), ',') lines
        |FROM lineitem WHERE l_orderkey < 30 GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
      """SELECT l_orderkey, ARRAY_TO_STRING(LIST_SORT(LIST(l_linenumber)), ',') lines
        |FROM lineitem WHERE l_orderkey < 30 GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin),

    // F8+: the Spark 4 VARIANT type — parse_json → typed path
    // extraction (variant_get), nested navigation, and
    // try_variant_get's null-on-missing. The oracle replays the same
    // paths over the raw JSON text with DuckDB's JSON extractors —
    // VARIANT is an encoding, the CONTRACT is path semantics.
    sqlQ("q186_variant",
      """WITH j AS (
        |  SELECT event_id,
        |    CONCAT('{"a": ', CAST(user_id AS STRING),
        |           ', "b": {"c": "', event_type, '"}}') js
        |  FROM events WHERE user_id < 25)
        |SELECT event_id,
        |  CAST(variant_get(parse_json(js), '$.a', 'long') AS BIGINT) a,
        |  variant_get(parse_json(js), '$.b.c', 'string') c,
        |  CAST(try_variant_get(parse_json(js), '$.missing', 'long')
        |    AS BIGINT) m
        |FROM j ORDER BY event_id""".stripMargin,
      """WITH j AS (
        |  SELECT event_id,
        |    CONCAT('{"a": ', CAST(user_id AS STRING),
        |           ', "b": {"c": "', event_type, '"}}') js
        |  FROM events WHERE user_id < 25)
        |SELECT event_id,
        |  CAST(JSON_EXTRACT(js, '$.a') AS BIGINT) a,
        |  JSON_EXTRACT_STRING(js, '$.b.c') c,
        |  CAST(JSON_EXTRACT(js, '$.missing') AS BIGINT) m
        |FROM j ORDER BY event_id""".stripMargin),

    // F1 completion: the split_part / translate / left / right /
    // repeat / reverse string family plus count_if and
    // percentile_disc(0.5) — identical semantics both engines
    // (DuckDB's discrete quantile is the same smallest-value-with-
    // cum_dist ≥ p rule as SQL:2008 PERCENTILE_DISC).
    sqlQ("q188_string_breadth2",
      """SELECT p_size,
        |  CAST(COUNT_IF(p_retailprice > 900.0) AS BIGINT) rich,
        |  PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY p_retailprice) med,
        |  MIN(CONCAT(SPLIT_PART(p_name, ' ', 2), '|',
        |    TRANSLATE(p_brand, '#', '-'), '|', LEFT(p_name, 5), '|',
        |    RIGHT(p_name, 4), '|', REPEAT(SUBSTRING(p_brand, 7, 1), 3), '|',
        |    REVERSE(p_type))) probe
        |FROM part GROUP BY p_size ORDER BY p_size""".stripMargin,
      """SELECT p_size,
        |  CAST(COUNT_IF(p_retailprice > 900.0) AS BIGINT) rich,
        |  QUANTILE_DISC(p_retailprice, 0.5) med,
        |  MIN(CONCAT(SPLIT_PART(p_name, ' ', 2), '|',
        |    TRANSLATE(p_brand, '#', '-'), '|', LEFT(p_name, 5), '|',
        |    RIGHT(p_name, 4), '|', REPEAT(SUBSTRING(p_brand, 7, 1), 3), '|',
        |    REVERSE(p_type))) probe
        |FROM part GROUP BY p_size ORDER BY p_size""".stripMargin)
  )
}
