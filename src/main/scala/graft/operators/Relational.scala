package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.Exprs
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Core relational operator suite — every scan/filter/join/aggregate/window
  * capability from SURVEY §2 (§2.1-§2.6), expressed on the driver's TPC-H-ish
  * tables so the DuckDB oracle can check it.
  *
  * Scale notes baked in: dimension joins are `broadcast()` (nation/region/
  * customer are tiny vs lineitem); aggregates are built-ins (partial agg
  * before shuffle); filters/projections are declarative so Catalyst pushes
  * them into the parquet scan; no collect-to-driver anywhere.
  */
object Relational {

  val defs: Seq[QueryDef] = Seq(

    // A3-style grouped multi-agg (reference updateToGold.py:39-40); TPC-H Q1 shape.
    QueryDef.sql("q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |       sum(l_quantity) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |       round(avg(l_quantity), 2) AS avg_qty,
        |       round(avg(l_extendedprice), 2) AS avg_price,
        |       count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin) {
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum("l_quantity").as("sum_qty"),
            round(sum("l_extendedprice"), 2).as("sum_base"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
            round(avg("l_quantity"), 2).as("avg_qty"),
            round(avg("l_extendedprice"), 2).as("avg_price"),
            count(lit(1)).as("n"))
    },

    // A4-style single-agg group (reference updateToGold.py:52).
    QueryDef.sql("q02_avg_by_status",
      """SELECT l_linestatus, round(avg(l_quantity), 2) AS avg_qty, count(*) AS n
        |FROM lineitem GROUP BY l_linestatus""".stripMargin) {
      (s, dir) =>
        Tables.lineitem(s, dir).groupBy("l_linestatus")
          .agg(round(avg("l_quantity"), 2).as("avg_qty"), count(lit(1)).as("n"))
    },

    // A1/A2 scalar watermark aggregates (reference ingestToBronze.py:61,
    // transformToSilver.py:102) — the only collect-to-driver the engine allows.
    QueryDef.sql("q03_minmax_watermark",
      "SELECT max(l_orderkey) AS max_key, min(l_orderkey) AS min_key, count(*) AS n FROM lineitem") {
      (s, dir) =>
        Tables.lineitem(s, dir)
          .agg(max("l_orderkey").as("max_key"), min("l_orderkey").as("min_key"),
            count(lit(1)).as("n"))
    },

    // A5 distinct (reference loadToWarehouse.py:27,53,66).
    QueryDef.sql("q04_distinct_flags",
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem") {
      (s, dir) => Tables.lineitem(s, dir).select("l_returnflag", "l_linestatus").distinct()
    },

    // P6 column-to-column conjunctive quality filter (transformToSilver.py:53).
    QueryDef.sql("q05_quality_filter",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
        |FROM lineitem WHERE l_discount <= l_tax AND l_quantity >= 30""".stripMargin) {
      (s, dir) =>
        Tables.lineitem(s, dir)
          .filter(col("l_discount") <= col("l_tax") && col("l_quantity") >= 30)
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax")
    },

    // P9 range predicate, pushed to the parquet scan (ingestToBronze.py:63-71).
    QueryDef.sql("q06_range_scan",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_orderkey BETWEEN 1000 AND 2000""".stripMargin) {
      (s, dir) =>
        Tables.lineitem(s, dir)
          .filter(col("l_orderkey").between(1000, 2000))
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    },

    // P1/F2 derived date-part columns (ingestToBronze.py:79-81).
    QueryDef.sql("q07_date_parts",
      """SELECT o_orderkey,
        |       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
        |       CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS m,
        |       CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS d,
        |       CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS qtr
        |FROM orders""".stripMargin) {
      (s, dir) =>
        Tables.orders(s, dir).select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          dayofmonth(col("o_orderdate")).cast("long").as("d"),
          quarter(col("o_orderdate")).cast("long").as("qtr"))
    },

    // F5 when/otherwise conditional bucketing.
    QueryDef.sql("q08_case_bucket",
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
        |            WHEN o_totalprice < 150000 THEN 'mid'
        |            ELSE 'big' END AS bucket,
        |       count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1""".stripMargin) {
      (s, dir) =>
        Tables.orders(s, dir)
          .withColumn("bucket",
            when(col("o_totalprice") < 50000, "small")
              .when(col("o_totalprice") < 150000, "mid")
              .otherwise("big"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
    },

    // J1 anti-join — the reference's right-outer-join-as-anti-join
    // (loadToWarehouse.py:31-32) done right: explicit left_anti, no
    // null-filter on an outer join, broadcastable by AQE.
    QueryDef.sql("q09_anti_join",
      """SELECT c_custkey FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin) {
      (s, dir) =>
        Tables.customer(s, dir)
          .join(Tables.orders(s, dir).select(col("o_custkey").as("c_custkey")),
            Seq("c_custkey"), "left_anti")
          .select("c_custkey")
    },

    // Semi-join (EXISTS) — companion to J1.
    QueryDef.sql("q10_semi_join",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin) {
      (s, dir) =>
        Tables.customer(s, dir)
          .join(Tables.orders(s, dir).select(col("o_custkey").as("c_custkey")),
            Seq("c_custkey"), "left_semi")
          .select("c_custkey", "c_name")
    },

    // Star-schema join (SURVEY §2.3: implied by the reference's dimensional
    // model, shipped first-class here). Dims broadcast; fact never shuffles
    // for the joins — only the final agg shuffles on the (small) group keys.
    QueryDef.sql("q11_star_revenue",
      """SELECT r_name, n_name,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin) {
      (s, dir) =>
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          // customer scales with sf (~15M rows at sf100) — no broadcast hint;
          // AQE picks broadcast at small sf and SMJ at scale. Only the
          // fixed-cardinality dims (nation=25, region=5) are hinted.
          .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
            count(lit(1)).as("n_items"))
    },

    // §2.5 gap-filler: window ranking (top-3 spenders per nation).
    // Rank on the ROUNDED measure + key tiebreak so ordering is engine-stable.
    QueryDef.sql("q12_window_rank",
      """WITH spend AS (
        |  SELECT c_nationkey, c_custkey, round(sum(o_totalprice), 2) AS spent
        |  FROM customer JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_nationkey, c_custkey)
        |SELECT CAST(c_nationkey AS BIGINT) AS nationkey, c_custkey, spent,
        |       CAST(rk AS BIGINT) AS rk
        |FROM (SELECT *, row_number() OVER (PARTITION BY c_nationkey
        |                 ORDER BY spent DESC, c_custkey) AS rk FROM spend)
        |WHERE rk <= 3""".stripMargin) {
      (s, dir) =>
        val spend = Tables.customer(s, dir)
          .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
          .groupBy("c_nationkey", "c_custkey")
          .agg(round(sum("o_totalprice"), 2).as("spent"))
        // Low-cardinality window keys (25 nations) → the salted two-phase
        // top-k operator (see TopK for the scale rationale + equivalence).
        TopK.topKPerKey(spend, Seq("c_nationkey"),
          Seq(col("spent").desc, col("c_custkey")), k = 3,
          saltExpr = col("c_custkey"))
          .select(col("c_nationkey").cast("long").as("nationkey"), col("c_custkey"),
            col("spent"), col("rk").cast("long").as("rk"))
    },

    // §2.5 gap-filler: global top-k with deterministic tiebreak.
    QueryDef.sql("q13_topk_orders",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) {
      (s, dir) =>
        Tables.orders(s, dir)
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10)
          .select("o_orderkey", "o_totalprice")
    },

    // §2.5 gap-filler: set operations (EXCEPT / INTERSECT).
    QueryDef.sql("q14_set_ops",
      """SELECT 'except' AS op, c_custkey AS key FROM
        |  (SELECT c_custkey FROM customer WHERE c_acctbal > 8000
        |   EXCEPT SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT 'intersect' AS op, c_custkey AS key FROM
        |  (SELECT c_custkey FROM customer WHERE c_acctbal > 8000
        |   INTERSECT SELECT o_custkey FROM orders)""".stripMargin) {
      (s, dir) =>
        val rich = Tables.customer(s, dir)
          .filter(col("c_acctbal") > 8000).select(col("c_custkey"))
        val buyers = Tables.orders(s, dir).select(col("o_custkey").as("c_custkey"))
        rich.except(buyers).withColumn("op", lit("except"))
          .unionByName(rich.intersect(buyers).withColumn("op", lit("intersect")))
          .select(col("op"), col("c_custkey").as("key"))
    },

    // F3 trim + string function battery (transformToSilver.py:44-46).
    QueryDef.sql("q15_string_funcs",
      """SELECT p_partkey,
        |       upper(substr(p_name, 1, 5)) AS name5,
        |       CAST(length(p_name) AS BIGINT) AS name_len,
        |       trim(concat('  ', p_brand, '  ')) AS brand_trim,
        |       replace(p_type, ' ', '_') AS type_us
        |FROM part""".stripMargin) {
      (s, dir) =>
        Tables.part(s, dir).select(
          col("p_partkey"),
          upper(substring(col("p_name"), 1, 5)).as("name5"),
          length(col("p_name")).cast("long").as("name_len"),
          trim(concat(lit("  "), col("p_brand"), lit("  "))).as("brand_trim"),
          regexp_replace(col("p_type"), " ", "_").as("type_us"))
    },

    // F4/F9/F10/F11 split/size/array_distinct/element_at
    // (transformToSilver.py:59, updateToGold.py:31,38).
    QueryDef.sql("q16_split_arrays",
      """SELECT p_partkey,
        |       CAST(len(string_split(p_type, ' ')) AS BIGINT) AS n_words,
        |       string_split(p_type, ' ')[1] AS first_word,
        |       string_split(p_type, ' ')[-1] AS last_word,
        |       CAST(len(list_distinct(string_split(p_name, ' '))) AS BIGINT) AS n_uniq_name_words
        |FROM part""".stripMargin) {
      (s, dir) =>
        val words = split(col("p_type"), " ")
        Tables.part(s, dir).select(
          col("p_partkey"),
          size(words).cast("long").as("n_words"),
          element_at(words, 1).as("first_word"),
          element_at(words, -1).as("last_word"),
          size(array_distinct(split(col("p_name"), " "))).cast("long").as("n_uniq_name_words"))
    },

    // F12 explode (loadToWarehouse.py:27,49,62).
    QueryDef.sql("q17_explode_tokens",
      """SELECT p_partkey, unnest(string_split(p_type, ' ')) AS word
        |FROM part WHERE p_partkey <= 200""".stripMargin) {
      (s, dir) =>
        Tables.part(s, dir).filter(col("p_partkey") <= 200)
          .select(col("p_partkey"), explode(split(col("p_type"), " ")).as("word"))
    },

    // Exact-money aggregation via decimal (SURVEY §7.4 risk 3).
    QueryDef.sql("q18_agg_decimal",
      """SELECT o_orderpriority,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |       count(*) AS n
        |FROM orders GROUP BY o_orderpriority""".stripMargin) {
      (s, dir) =>
        Tables.orders(s, dir).groupBy("o_orderpriority")
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"),
            count(lit(1)).as("n"))
    },

    // F17/F18 dim-date enrichment semantics, Spark-4-correct (SURVEY F17:
    // the reference's 2.4-era 'DD'/'u' patterns are replaced by native fns).
    QueryDef.sql("q19_date_dim",
      """SELECT DISTINCT CAST(o_orderdate AS DATE) AS d,
        |       monthname(o_orderdate) AS month_name,
        |       dayname(o_orderdate) AS day_name,
        |       CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS qtr,
        |       CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow
        |FROM orders""".stripMargin) {
      (s, dir) =>
        Tables.orders(s, dir).select(
          col("o_orderdate").cast("date").as("d"),
          date_format(col("o_orderdate"), "MMMM").as("month_name"),
          date_format(col("o_orderdate"), "EEEE").as("day_name"),
          quarter(col("o_orderdate")).cast("long").as("qtr"),
          (weekday(col("o_orderdate")) + 1).cast("long").as("iso_dow"))
          .distinct()
    },

    // U1 ISO-8601 duration parse — the reference's one real UDF, as a pure
    // codegen expression. Durations synthesized from lineitem columns so the
    // oracle can compute expected minutes arithmetically.
    QueryDef.sql("q20_duration_parse",
      """SELECT l_orderkey, l_linenumber,
        |       CASE WHEN l_linenumber % 3 = 0
        |              THEN CAST(CAST(floor(l_quantity) AS INT) * 60 + (l_linenumber * 7) AS INT)
        |            WHEN l_linenumber % 3 = 1
        |              THEN CAST(l_linenumber * 9 AS INT)
        |            ELSE NULL END AS minutes
        |FROM lineitem WHERE l_orderkey <= 5000""".stripMargin) {
      (s, dir) =>
        // floor() on both sides pins the double→int cast: DuckDB rounds
        // half-away-from-zero on numeric→int, Spark (ANSI off) truncates.
        val dur = when(col("l_linenumber") % 3 === 0,
          concat(lit("PT"), floor(col("l_quantity")).cast("int"), lit("H"),
            col("l_linenumber") * 7, lit("M")))
          .when(col("l_linenumber") % 3 === 1,
            concat(lit("PT"), col("l_linenumber") * 9, lit("M")))
          .otherwise(lit("not-a-duration"))
        Tables.lineitem(s, dir).filter(col("l_orderkey") <= 5000)
          .withColumn("dur", dur)
          .select(col("l_orderkey"), col("l_linenumber"),
            Exprs.durationToMinutes(col("dur")).as("minutes"))
    },

    // Exact distinct-count aggregation (beyond the reference's surface;
    // approx_count_distinct is the 100 TB path, exercised in tests).
    QueryDef.sql("q21_count_distinct",
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust, count(*) AS n
        |FROM orders GROUP BY o_orderpriority""".stripMargin) {
      (s, dir) =>
        Tables.orders(s, dir).groupBy("o_orderpriority")
          .agg(countDistinct("o_custkey").as("n_cust"), count(lit(1)).as("n"))
    },

    // Event-time tumbling-window aggregate (batch form of the streaming
    // façade in graft.streaming; grouped as strings for oracle parity).
    QueryDef.sql("q22_events_hourly",
      """SELECT strftime(ts, '%Y-%m-%d %H:00') AS hr, event_type,
        |       count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin) {
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(date_format(col("ts"), "yyyy-MM-dd HH:00").as("hr"), col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
    },

    // Window lag: inter-event gap per user, in exact integer microseconds.
    QueryDef.sql("q23_events_gaps",
      """WITH g AS (
        |  SELECT event_type,
        |         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |             ORDER BY ts, event_id) AS gap_us
        |  FROM events)
        |SELECT event_type, count(gap_us) AS n_gaps,
        |       CAST(sum(gap_us) AS BIGINT) AS total_gap_us
        |FROM g GROUP BY event_type""".stripMargin) {
      (s, dir) =>
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir)
          .withColumn("gap_us", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
          .groupBy("event_type")
          .agg(count("gap_us").as("n_gaps"), sum("gap_us").cast("long").as("total_gap_us"))
    },

    // Sessionization: 30-minute-gap rule via cumulative window sum — the
    // scalable (single shuffle on user_id) batch sessionizer.
    QueryDef.sql("q24_sessionize",
      """WITH marked AS (
        |  SELECT user_id,
        |         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |              ORDER BY ts, event_id) > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM events)
        |SELECT user_id, CAST(1 + sum(new_sess) AS BIGINT) AS n_sessions,
        |       count(*) AS n_events
        |FROM marked GROUP BY user_id""".stripMargin) {
      (s, dir) =>
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir)
          .withColumn("gap_us", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
          .withColumn("new_sess", when(col("gap_us") > 1800000000L, 1).otherwise(0))
          .groupBy("user_id")
          .agg((lit(1) + sum("new_sess")).cast("long").as("n_sessions"),
            count(lit(1)).as("n_events"))
    },

    // As-of join (point-in-time): each purchase matched to the same user's
    // most recent prior 'view'. Composed scalably as union + running
    // last_value over one user_id shuffle — no cross/range join blowup.
    QueryDef.sql("q25_asof_join",
      """WITH tagged AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN event_type = 'view' THEN event_id END AS view_id,
        |         event_type
        |  FROM events WHERE event_type IN ('view', 'purchase')),
        |filled AS (
        |  SELECT *, last_value(view_id IGNORE NULLS) OVER (
        |           PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_id
        |  FROM tagged)
        |SELECT event_id AS purchase_id, last_view_id
        |FROM filled WHERE event_type = 'purchase'""".stripMargin) {
      (s, dir) =>
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.events(s, dir)
          .filter(col("event_type").isin("view", "purchase"))
          .withColumn("view_id", when(col("event_type") === "view", col("event_id")))
          .withColumn("last_view_id", last(col("view_id"), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("last_view_id"))
    },

    // The general two-table as-of join (operators.TemporalJoins.asofJoin):
    // purchases matched to the same user's latest view at-or-before the
    // purchase time. Right side pre-deduped per (user, ts) so tie order
    // is total; single shuffle on user_id, never pairs-then-filter.
    QueryDef.sql("q36_asof_general",
      """WITH v AS (
        |  SELECT user_id, ts, max(event_id) AS vid
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |u AS (
        |  SELECT user_id, ts, CAST(NULL AS BIGINT) AS vid, event_id, 1 AS src
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, ts, vid, CAST(NULL AS BIGINT) AS event_id, 0 AS src FROM v),
        |f AS (
        |  SELECT *, last_value(vid IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY ts, src
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_id
        |  FROM u)
        |SELECT event_id AS purchase_id, last_view_id FROM f WHERE src = 1""".stripMargin) {
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val views = ev.filter(col("event_type") === "view")
          .groupBy("user_id", "ts").agg(max("event_id").as("vid"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("user_id", "ts", "event_id")
        TemporalJoins.asofJoin(purchases, views, "user_id", "ts", "ts")
          .select(col("event_id").as("purchase_id"), col("asof.vid").as("last_view_id"))
      }
    },

    // TPC-H Q5 shape: local-supplier revenue — the join graph touches two
    // fact FKs (custkey via orders, suppkey direct) plus an equality
    // BETWEEN dimensions (customer and supplier share a nation). Only
    // nation is broadcast-hinted; customer/supplier scale with sf.
    QueryDef.sql("q37_local_supplier",
      """SELECT n_name,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       count(*) AS n
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin) {
      (s, dir) =>
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
          .join(Tables.supplier(s, dir),
            col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
            count(lit(1)).as("n"))
    },

    // HAVING-clause aggregation (TPC-H Q4 flavor): only groups above a
    // volume threshold survive — the filter runs post-aggregation.
    QueryDef.sql("q38_having",
      """SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 25""".stripMargin) {
      (s, dir) =>
        Tables.orders(s, dir).groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("total"))
          .filter(col("n_orders") >= 25)
    },

    // Semi-structured extraction: JSON props column → typed value, then agg
    // (the `events.props` column is a JSON object per row).
    QueryDef.sql("q26_json_extract",
      """SELECT event_type,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin) {
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy("event_type")
          .agg(sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"),
            count(lit(1)).as("n"))
    },

    // F13/F14 arrays_zip + struct field access (reference dim_airline
    // construction, loadToWarehouse.py:48-53): zip parallel arrays into
    // array<struct>, explode, read struct fields.
    QueryDef.sql("q27_zip_struct",
      """SELECT p_partkey, word, CAST(length(word) AS BIGINT) AS wlen
        |FROM (SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word
        |      FROM part WHERE p_partkey <= 100)""".stripMargin) {
      (s, dir) =>
        val words = split(col("p_name"), " ")
        val lens = transform(words, w => length(w).cast("long"))
        Tables.part(s, dir).filter(col("p_partkey") <= 100)
          .select(col("p_partkey"),
            explode(arrays_zip(words.as("w"), lens.as("wlen"))).as("z"))
          .select(col("p_partkey"), col("z.w").as("word"), col("z.wlen").as("wlen"))
    },

    // P3/P4/P5 schema-reflective projection (reference transformToSilver
    // .py:93-94 prefix drop; loadToWarehouse.py:72-74 non-array fact
    // projection): add temp/array columns, then drop by prefix, drop
    // arrays by schema type, drop one explicitly.
    QueryDef.sql("q28_schema_projection",
      """SELECT p_partkey, p_name, p_brand, p_type, p_size FROM part""".stripMargin) {
      (s, dir) =>
        val widened = Tables.part(s, dir)
          .withColumn("tmp_words", split(col("p_name"), " "))
          .withColumn("tmp_flag", lit(1))
          .withColumn("extra_arr", array(col("p_partkey")))
        val noPrefix = widened.drop(widened.columns.filter(_.startsWith("tmp_")): _*)
        val nonArray = noPrefix.select(noPrefix.schema.fields
          .filterNot(_.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
          .map(f => col(f.name)): _*)
        nonArray.drop("p_retailprice")
    },

    // U1 again through the NATIVE Catalyst expression (graft.plans.
    // DurationToMinutes, doGenCode) instead of the composed regexp form —
    // both stay under the correctness gate.
    QueryDef.sql("q30_duration_native",
      """SELECT l_orderkey, l_linenumber,
        |       CASE WHEN l_linenumber % 3 = 0
        |              THEN CAST(CAST(floor(l_quantity) AS INT) * 60 + (l_linenumber * 7) AS INT)
        |            WHEN l_linenumber % 3 = 1
        |              THEN CAST(l_linenumber * 9 AS INT)
        |            ELSE NULL END AS minutes
        |FROM lineitem WHERE l_orderkey <= 5000""".stripMargin) {
      (s, dir) =>
        val dur = when(col("l_linenumber") % 3 === 0,
          concat(lit("PT"), floor(col("l_quantity")).cast("int"), lit("H"),
            col("l_linenumber") * 7, lit("M")))
          .when(col("l_linenumber") % 3 === 1,
            concat(lit("PT"), col("l_linenumber") * 9, lit("M")))
          .otherwise(lit("not-a-duration"))
        Tables.lineitem(s, dir).filter(col("l_orderkey") <= 5000)
          .withColumn("dur", dur)
          .select(col("l_orderkey"), col("l_linenumber"),
            graft.plans.DurationToMinutes(col("dur")).as("minutes"))
    },

    // P7 array-expression FILTER (reference updateToGold.py:31's
    // size(array_distinct(...)) predicate shape): keep only documents with
    // heavy token repetition, then aggregate per language.
    QueryDef.sql("q31_array_filter",
      """WITH toks AS (
        |  SELECT lang, list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS t
        |  FROM documents)
        |SELECT lang, count(*) AS n
        |FROM toks WHERE len(list_distinct(t)) * 2 < len(t)
        |GROUP BY lang""".stripMargin) {
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("lang"), graft.functions.Exprs.tokens(col("text")).as("t"))
          // null guard mirrors SQL three-valued logic: size(null) is -1 in
          // Spark (legacy), which would otherwise pass the < comparison
          // that a SQL NULL fails
          .filter(col("t").isNotNull &&
            size(array_distinct(col("t"))) * 2 < size(col("t")))
          .groupBy("lang").agg(count(lit(1)).as("n"))
    },

    // Approximate distinct-count (HyperLogLog++): the 100 TB form of q21 —
    // fixed-size sketches, partial-merge before the shuffle, ~2% error.
    // No SQL oracle (DuckDB's sketch differs); the driver records rows,
    // and the ScalaTest suite asserts <5% error vs the exact count.
    // HASH-GATED TWIN: q21 runs the identical scan + grouping with the
    // exact countDistinct, so the pipeline feeding this sketch is
    // oracle-checked even though the estimate itself cannot be.
    QueryDef.noOracle("q32_approx_distinct") {
      (s, dir) =>
        Tables.orders(s, dir).groupBy("o_orderpriority")
          .agg(approx_count_distinct("o_custkey", 0.02).as("approx_cust"),
            count(lit(1)).as("n"))
    },

    // Correlated scalar subquery (TPC-H Q17 shape), through the engine's
    // SQL path over temp views (S7): small-quantity outliers per part.
    // Catalyst decorrelates this into an aggregate + join automatically.
    QueryDef.sql("q35_corr_subquery",
      """SELECT l.l_partkey, count(*) AS n_small,
        |       round(sum(l.l_extendedprice), 2) AS small_revenue
        |FROM lineitem l
        |WHERE l.l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
        |                      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
        |GROUP BY l.l_partkey""".stripMargin) {
      (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
        s.sql(
          """SELECT l.l_partkey, count(*) AS n_small,
            |       round(sum(l.l_extendedprice), 2) AS small_revenue
            |FROM lineitem_v l
            |WHERE l.l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
            |                      FROM lineitem_v l2 WHERE l2.l_partkey = l.l_partkey)
            |GROUP BY l.l_partkey""".stripMargin)
      }
    },

    // Exact interpolated percentiles per group (both engines use the
    // same linear-interpolation definition; approx sketches are q32's job).
    QueryDef.sql("q33_percentiles",
      """SELECT event_type,
        |       round(quantile_cont(value, 0.5), 6) AS p50,
        |       round(quantile_cont(value, 0.95), 6) AS p95,
        |       count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin) {
      (s, dir) =>
        // rounded at the edge: the two engines interpolate with
        // differently-ordered arithmetic (1-ulp drift)
        Tables.events(s, dir).groupBy("event_type")
          .agg(round(percentile(col("value"), lit(0.5)), 6).as("p50"),
            round(percentile(col("value"), lit(0.95)), 6).as("p95"),
            count(lit(1)).as("n"))
    },

    // Grouping sets: ROLLUP subtotals + grand total (absent from the
    // reference; the natural "trend report" shape its gold tables feed).
    QueryDef.sql("q34_rollup",
      """SELECT o_orderstatus, o_orderpriority,
        |       count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin) {
      (s, dir) =>
        Tables.orders(s, dir)
          .rollup("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
    },

    // CUBE — the full grouping-set lattice (rollup's sibling): every
    // combination of the two keys including both partials. Same expanded
    // partial-agg execution as rollup; one shuffle.
    QueryDef.sql("q39_cube",
      """SELECT o_orderstatus, o_orderpriority,
        |       count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin) {
      (s, dir) =>
        Tables.orders(s, dir)
          .cube("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
    },

    // PIVOT — long→wide reshaping with an EXPLICIT value list: Spark's
    // pivot without declared values runs a driver-side distinct scan to
    // discover columns (two jobs, nondeterministic column order at scale);
    // pinning the list keeps it one hash-agg pass. The oracle is the
    // equivalent conditional aggregation.
    QueryDef.sql("q40_pivot",
      """SELECT l_returnflag,
        |       round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F,
        |       round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) {
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag")
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(round(sum("l_quantity"), 2))
    },

    // Schema-typed JSON extraction: ONE `from_json(schema)` parse per row
    // yields a struct feeding every downstream use (here a derived group
    // key AND an aggregate) — the scalable form for multi-key payloads.
    // q26's `get_json_object` re-parses the document once PER KEY, so a
    // 10-field extraction pays 10 parses; this pays one. The declared
    // schema is the contract (no inference scan), same posture as the
    // CSV/JSON loaders.
    QueryDef.sql("q41_json_struct",
      """SELECT event_type,
        |       CAST(floor(CAST(json_extract_string(props, '$.k') AS BIGINT) / 10) AS BIGINT) AS k_decile,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       count(*) AS n
        |FROM events GROUP BY event_type, k_decile""".stripMargin) {
      (s, dir) => {
        val propsSchema = StructType(Seq(StructField("k", LongType)))
        Tables.events(s, dir)
          .withColumn("p", from_json(col("props"), propsSchema))
          .groupBy(col("event_type"),
            floor(col("p.k") / 10).cast("long").as("k_decile"))
          .agg(sum(col("p.k")).as("sum_k"), count(lit(1)).as("n"))
      }
    },

    // Approximate percentiles — the 100 TB quantile path: a fixed-size
    // mergeable sketch (partial-agg + merge, no per-group value
    // buffering), the quantile sibling of q32's HLL. q33 (exact
    // `percentile`) buffers every group value on one reducer; this never
    // does. Rows-only: sketch outputs are engine-specific, so there is no
    // cross-engine oracle — `ApproxPercentileSpec` asserts the rank-error
    // bound against the exact values instead.
    // HASH-GATED TWIN: q33 runs the identical scan + grouping with exact
    // interpolated percentiles, oracle-checking the pipeline feeding
    // this sketch.
    QueryDef.noOracle("q42_approx_percentiles") { (s, dir) =>
      Tables.events(s, dir).groupBy("event_type")
        .agg(
          percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50"),
          percentile_approx(col("value"), lit(0.95), lit(10000)).as("p95"),
          count(lit(1)).as("n"))
    },

    // P8 as-of date-literal filter (reference updateToGold.py:35 freezes
    // "today" driver-side; ours pins it as a parameter for determinism).
    QueryDef.sql("q29_asof_filter",
      """SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_orderdate <= DATE '1995-06-17'
        |GROUP BY o_orderpriority""".stripMargin) {
      (s, dir) =>
        Tables.orders(s, dir)
          .filter(col("o_orderdate") <= to_date(lit("1995-06-17")))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
    },

    // q36's purchase-attribution semantics through the NATIVE as-of join
    // (graft.plans.AsOfJoinExec — custom logical node + Strategy +
    // sorted-merge physical operator): each side shuffles once on its own
    // key, no union materialization, no window state. The oracle is
    // DuckDB's own ASOF LEFT JOIN — an independent native implementation
    // of the same operator. Right side pre-aggregated to one row per
    // (user_id, ts) so tie order can't make the result run-dependent.
    // hint("merge") pins the sorted-merge form: this query encodes the
    // big-right case (at 100 TB the views side is NOT broadcastable, even
    // though its small-SF size estimate is) — the tiny-right case is q44.
    QueryDef.sql("q43_asof_native",
      """WITH v AS (
        |  SELECT user_id, ts, max(event_id) AS vid
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |p AS (
        |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id AS purchase_id, v.vid AS last_view_id
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts""".stripMargin) {
      (s, dir) => {
        val ev = Tables.events(s, dir)
        // repartition by user_id BEFORE the (user_id, ts) dedup agg:
        // HashPartitioning(user_id) satisfies the agg's clustering on
        // {user_id, ts} (subset rule) AND the as-of join's distribution
        // on user_id — the right side pays ONE exchange, not two.
        val views = ev.filter(col("event_type") === "view")
          .repartition(col("user_id"))
          .groupBy("user_id", "ts").agg(max("event_id").as("vid"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("user_id", "ts", "event_id")
        graft.plans.AsOf.join(purchases, views.hint("merge"), Seq("user_id"), "ts", "ts")
          .select(col("event_id").as("purchase_id"), col("vid").as("last_view_id"))
      }
    },

    // BROADCAST as-of join (graft.plans.BroadcastAsOfJoinExec): every
    // event calibrated against a TINY per-type monthly reference that only
    // becomes available at month end (cal ts = next month start, so
    // month-1 events have no match — real as-of semantics, not a
    // same-bucket lookup). The 100 TB plan: the event side is never
    // shuffled or sorted — the calibration table broadcasts and each
    // partition binary-searches it; the only exchange in the whole query
    // is the final small groupBy. Oracle: DuckDB's own ASOF LEFT JOIN,
    // which picks the same small-build shape.
    QueryDef.sql("q44_asof_broadcast",
      """WITH c AS (
        |  SELECT event_type, date_trunc('month', ts) + INTERVAL 1 MONTH AS ts,
        |         round(avg(value), 6) AS cal
        |  FROM events GROUP BY 1, 2)
        |SELECT e.event_type, count(*) AS n, count(c.cal) AS n_matched,
        |       round(sum(c.cal), 4) AS cal_sum
        |FROM events e ASOF LEFT JOIN c
        |  ON e.event_type = c.event_type AND e.ts >= c.ts
        |GROUP BY e.event_type""".stripMargin) {
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val cal = ev
          .groupBy(col("event_type"),
            expr("date_trunc('month', ts) + INTERVAL '1' MONTH").as("ts"))
          .agg(round(avg("value"), 6).as("cal"))
        graft.plans.AsOf.join(
            ev.select("event_type", "ts", "event_id", "value"), broadcast(cal),
            Seq("event_type"), "ts", "ts")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), count(col("cal")).as("n_matched"),
            round(sum("cal"), 4).as("cal_sum"))
      }
    },

    // Banded range join (operators.TemporalJoins.rangeJoin): events
    // attributed to per-type observation windows (1-day windows every 2
    // days from each type's first event). The banding join buckets
    // intervals instead of cross-joining — work scales with overlaps,
    // never |points|×|intervals| — and the round-6 guard drops degenerate
    // whole-timeline intervals with the drop observable. Oracle: DuckDB's
    // native inequality join, the semantic ground truth.
    QueryDef.sql("q45_range_join",
      """WITH b AS (SELECT event_type AS key, epoch_us(min(ts)) AS t0
        |           FROM events GROUP BY 1),
        |iv AS (SELECT key, CAST(i AS BIGINT) AS i,
        |              t0 + CAST(i AS BIGINT)*172800000000 AS s,
        |              t0 + CAST(i AS BIGINT)*172800000000 + 86400000000 AS e
        |       FROM b, range(0, 5) t(i)),
        |p AS (SELECT event_type AS key, epoch_us(ts) AS t FROM events)
        |SELECT p.key, iv.i, count(*) AS n
        |FROM p JOIN iv ON p.key = iv.key AND p.t >= iv.s AND p.t < iv.e
        |GROUP BY p.key, iv.i""".stripMargin) {
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val day = 86400000000L // 1 day in microseconds
        val b = ev.groupBy(col("event_type").as("key"))
          .agg(unix_micros(min("ts")).as("t0"))
        val iv = b
          .select(col("key"), explode(sequence(lit(0L), lit(4L))).as("i"), col("t0"))
          .select(col("key"), col("i"),
            (col("t0") + col("i") * lit(2 * day)).as("s"),
            (col("t0") + col("i") * lit(2 * day) + lit(day)).as("e"))
        val p = ev.select(col("event_type").as("key"),
          unix_micros(col("ts")).as("t"))
        TemporalJoins.rangeJoin(p, iv, "key", "t", "s", "e", bucketWidth = day)
          .groupBy("key", "i").agg(count(lit(1)).as("n"))
      }
    },

    // As-of join with TOLERANCE (pandas merge_asof semantics): a
    // purchase is attributed to the latest prior view only if that view
    // is at most 1 hour old — an older view yields NULL, never a
    // fallback. The oracle post-filters DuckDB's ASOF match by the same
    // staleness bound, which is semantically identical because as-of
    // already picks the LATEST qualifying row.
    QueryDef.sql("q46_asof_tolerance",
      """WITH v AS (
        |  SELECT user_id, ts, max(event_id) AS vid
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id AS purchase_id,
        |       CASE WHEN epoch_us(p.ts) - epoch_us(v.ts) <= 3600000000
        |            THEN v.vid END AS last_view_id
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts""".stripMargin) {
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val views = ev.filter(col("event_type") === "view")
          .groupBy("user_id", "ts").agg(max("event_id").as("vid"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("user_id", "ts", "event_id")
        graft.plans.AsOf.join(purchases, views, Seq("user_id"), "ts", "ts",
            tolerance = Some(3600000000L)) // 1 hour in micros
          .select(col("event_id").as("purchase_id"), col("vid").as("last_view_id"))
      }
    },

    // Salted skew join (operators.Skew.saltedJoin): the big side gets a
    // uniform salt, the small side replicates once per salt value, and a
    // single hot key fans out over `salt` reducers instead of pinning one
    // — the mitigation when AQE's skew splitting can't apply. Salting
    // must never change results: the oracle is the PLAIN join.
    QueryDef.sql("q47_skew_salted",
      """SELECT s_nationkey, count(*) AS n,
        |       CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey""".stripMargin) {
      (s, dir) => {
        val small = Tables.supplier(s, dir)
          .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
        // floor() pins the numeric→int conversion on both engines
        // (DuckDB rounds casts, Spark truncates — q20's lesson)
        Skew.saltedJoin(Tables.lineitem(s, dir), small, "l_suppkey", salt = 8)
          .groupBy("s_nationkey")
          .agg(count(lit(1)).as("n"),
            sum(floor(col("l_quantity"))).as("sum_qty"))
      }
    },

    // Changelog compaction (CDC apply): collapse an upsert/delete stream
    // into the latest snapshot per key — latest-wins by (ts, event_id),
    // with `error` rows as tombstones that delete the key. The events
    // table stands in for the changelog (user_id = primary key). Shape:
    // one shuffle on the key, then a codegen'd row_number + filter — the
    // same two-phase pattern a MERGE INTO compaction job runs at 100 TB,
    // where the key shuffle is the whole cost and nothing is collected.
    QueryDef.sql("q48_cdc_apply",
      """WITH ranked AS (
        |  SELECT user_id, event_type, value,
        |         epoch_us(ts) AS last_ts_us,
        |         row_number() OVER (PARTITION BY user_id
        |             ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_type AS last_op,
        |       round(value, 3) AS last_value, last_ts_us
        |FROM ranked WHERE rn = 1 AND event_type <> 'error'""".stripMargin) {
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)
        Tables.events(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1 && col("event_type") =!= "error")
          .select(col("user_id"), col("event_type").as("last_op"),
            round(col("value"), 3).as("last_value"),
            unix_micros(col("ts")).as("last_ts_us"))
      }
    },

    // Arbitrary GROUPING SETS through the SQL path (rollup/cube are the
    // fixed special cases, q34/q39): four explicit sets in one pass, with
    // grouping() flags disambiguating set-null from data-null. Physical
    // shape is a single Expand + one hash aggregate — rows duplicate
    // 4× into the shuffle, but grouped output stays small; at 100 TB
    // prefer this over four separate scans of the fact table.
    QueryDef.sql("q49_grouping_sets",
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
        |       CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
        |       count(*) AS n, round(sum(o_totalprice), 2) AS rev
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |         (o_orderstatus), (o_orderpriority), ())""".stripMargin) {
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("orders_gs_v")
        s.sql(
          """SELECT o_orderstatus, o_orderpriority,
            |       CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
            |       CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
            |       count(*) AS n, round(sum(o_totalprice), 2) AS rev
            |FROM orders_gs_v
            |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
            |         (o_orderstatus), (o_orderpriority), ())""".stripMargin)
      }
    },

    // UNPIVOT (q40's inverse): wide per-status quantity/price columns
    // back to long (measure, value) rows via the native unpivot operator
    // (an Expand node — one pass, rows×measures, no join/union of N
    // scans). Semantics note: SQL UNPIVOT (incl. the DuckDB oracle)
    // drops NULL values; Dataset.unpivot (melt) KEEPS them — the
    // explicit isNotNull filter pins the SQL semantics so the parity
    // doesn't silently rest on these measures never being null.
    QueryDef.sql("q53_unpivot",
      """WITH wide AS (
        |  SELECT l_returnflag,
        |         round(sum(l_quantity), 2) AS qty,
        |         round(sum(l_extendedprice), 2) AS price,
        |         round(sum(l_discount), 2) AS disc
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, measure, value
        |FROM wide UNPIVOT (value FOR measure IN (qty, price, disc))""".stripMargin) {
      (s, dir) => {
        val wide = Tables.lineitem(s, dir)
          .groupBy("l_returnflag")
          .agg(round(sum("l_quantity"), 2).as("qty"),
            round(sum("l_extendedprice"), 2).as("price"),
            round(sum("l_discount"), 2).as("disc"))
        wide.unpivot(Array(col("l_returnflag")),
          Array(col("qty"), col("price"), col("disc")), "measure", "value")
          .filter(col("value").isNotNull)
      }
    },

    // Ordered funnel: view → click-after-view → purchase-after-click per
    // user, counted per stage. Running conditional mins over ONE (user_id)
    // window — never a per-stage self-join (three same-key joins of the
    // full event log at 100 TB) — so the whole funnel costs exactly one
    // shuffle; the chained Window operators share the partitioning. ROWS
    // frames in both engines (RANGE would include ts-tie peers and
    // diverge). Strictly-after semantics at equal timestamps.
    QueryDef.sql("q51_funnel_stages",
      """WITH e1 AS (
        |  SELECT user_id, event_type, event_id, ts, epoch_us(ts) AS tus,
        |         min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS UNBOUNDED PRECEDING) AS first_view
        |  FROM events),
        |e2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND tus > first_view
        |                THEN tus END)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS UNBOUNDED PRECEDING) AS first_click
        |  FROM e1),
        |per_user AS (
        |  SELECT user_id,
        |         min(CASE WHEN event_type = 'view' THEN tus END) AS tv,
        |         min(CASE WHEN event_type = 'click' AND tus > first_view
        |               THEN tus END) AS tc,
        |         min(CASE WHEN event_type = 'purchase' AND tus > first_click
        |               THEN tus END) AS tp
        |  FROM e2 GROUP BY user_id)
        |SELECT count(tv) AS n_view, count(tc) AS n_click_after_view,
        |       count(tp) AS n_purchase_after_click,
        |       count(*) AS n_users
        |FROM per_user""".stripMargin) {
      (s, dir) => {
        val tus = unix_micros(col("ts"))
        val w1 = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val e1 = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"), col("event_id"), col("ts"), tus.as("tus"))
          .withColumn("first_view",
            min(when(col("event_type") === "view", col("tus"))).over(w1))
        val w2 = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val e2 = e1.withColumn("first_click",
          min(when(col("event_type") === "click" && col("tus") > col("first_view"),
            col("tus"))).over(w2))
        e2.groupBy("user_id")
          .agg(
            min(when(col("event_type") === "view", col("tus"))).as("tv"),
            min(when(col("event_type") === "click" && col("tus") > col("first_view"),
              col("tus"))).as("tc"),
            min(when(col("event_type") === "purchase" && col("tus") > col("first_click"),
              col("tus"))).as("tp"))
          .agg(count("tv").as("n_view"), count("tc").as("n_click_after_view"),
            count("tp").as("n_purchase_after_click"), count(lit(1)).as("n_users"))
      }
    },

    // Retention cohorts: users grouped by first-seen week, counted per
    // week offset they came back in. t0 via a whole-partition window min
    // (not an agg + self-join — the join would re-shuffle the full log a
    // second time at 100 TB); the (user, cohort, offset) distinct then
    // rides the same user_id clustering. The week bucket divides a
    // non-negative micros diff (< 2^53, exact in an IEEE double) by the
    // same double literal in both engines, so bucketing is identical.
    QueryDef.sql("q52_retention_cohorts",
      """WITH t AS (
        |  SELECT user_id, epoch_us(ts) AS tus,
        |         min(epoch_us(ts)) OVER (PARTITION BY user_id) AS t0us
        |  FROM events),
        |act AS (
        |  SELECT DISTINCT user_id,
        |         strftime(date_trunc('week', make_timestamp(t0us)), '%Y-%m-%d')
        |           AS cohort_week,
        |         CAST(floor((tus - t0us) / 604800000000.0) AS BIGINT) AS week_offset
        |  FROM t)
        |SELECT cohort_week, week_offset, count(*) AS n_users
        |FROM act GROUP BY 1, 2""".stripMargin) {
      (s, dir) => {
        val w = Window.partitionBy("user_id")
        Tables.events(s, dir)
          .select(col("user_id"), unix_micros(col("ts")).as("tus"))
          .withColumn("t0us", min("tus").over(w))
          .select(col("user_id"),
            date_format(date_trunc("week", timestamp_micros(col("t0us"))), "yyyy-MM-dd")
              .as("cohort_week"),
            floor((col("tus") - col("t0us")) / lit(604800000000.0)).cast("long")
              .as("week_offset"))
          .distinct()
          .groupBy("cohort_week", "week_offset")
          .agg(count(lit(1)).as("n_users"))
      }
    },

    // Event-time rolling aggregate: 7-day trailing sum/count per user via
    // a RANGE frame over the timestamp — the moving-metric shape (trailing
    // spend, rolling error rate). RANGE, not ROWS: the frame is defined by
    // TIME distance, so ts ties share identical frames in both engines
    // (no tie-break needed) and sparse users aren't over-weighted. One
    // user_id shuffle; Spark evaluates the frame incrementally per
    // partition, never re-summing from scratch.
    QueryDef.sql("q54_rolling_window",
      """SELECT user_id, event_id, epoch_us(ts) AS tus,
        |       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts
        |             RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW), 3)
        |         AS roll_sum,
        |       count(*) OVER (PARTITION BY user_id ORDER BY ts
        |             RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
        |         AS roll_n
        |FROM events""".stripMargin) {
      (s, dir) => {
        Tables.events(s, dir).createOrReplaceTempView("events_roll_v")
        s.sql(
          """SELECT user_id, event_id, unix_micros(ts) AS tus,
            |       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts
            |             RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW), 3)
            |         AS roll_sum,
            |       count(*) OVER (PARTITION BY user_id ORDER BY ts
            |             RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
            |         AS roll_n
            |FROM events_roll_v""".stripMargin)
      }
    },

    // Calendar gap-fill via a RECURSIVE CTE (Spark 4 UnionLoop): generate
    // every day between the corpus bounds and left-join per-day counts so
    // silent days appear as ZERO rows (a plain GROUP BY can't show what
    // didn't happen). Scale shape: events aggregate to ~days rows FIRST
    // (one partial-agg shuffle), then the tiny recursion joins that —
    // never a calendar × raw-events join. The recursion advances one day
    // per level, so the level budget is set explicitly below (the default
    // 100 fails past a 100-day span); a production calendar that doesn't
    // need the recursive OPERATOR uses sequence(min_d, max_d) + explode,
    // which has no level limit at all.
    QueryDef.sql("q55_calendar_fill",
      """WITH RECURSIVE days AS (
        |  SELECT CAST(min(ts) AS DATE) AS d, CAST(max(ts) AS DATE) AS hi FROM events
        |  UNION ALL
        |  SELECT d + 1, hi FROM days WHERE d < hi),
        |per AS (SELECT CAST(ts AS DATE) AS d, count(*) AS n FROM events GROUP BY 1)
        |SELECT strftime(days.d, '%Y-%m-%d') AS day,
        |       CAST(coalesce(per.n, 0) AS BIGINT) AS n
        |FROM days LEFT JOIN per ON per.d = days.d""".stripMargin) {
      (s, dir) => {
        s.conf.set("spark.sql.cteRecursionLevelLimit", "100000")
        Tables.events(s, dir).createOrReplaceTempView("events_cal_v")
        s.sql(
          """WITH RECURSIVE days AS (
            |  SELECT CAST(min(ts) AS DATE) AS d, CAST(max(ts) AS DATE) AS hi
            |  FROM events_cal_v
            |  UNION ALL
            |  SELECT date_add(d, 1), hi FROM days WHERE d < hi),
            |per AS (SELECT CAST(ts AS DATE) AS d, count(*) AS n
            |        FROM events_cal_v GROUP BY 1)
            |SELECT date_format(days.d, 'yyyy-MM-dd') AS day,
            |       coalesce(per.n, 0L) AS n
            |FROM days LEFT JOIN per ON per.d = days.d""".stripMargin)
      }
    },

    // Multiset set ops — the ALL variants q14's distinct forms don't
    // cover: duplicates carry MULTIPLICITY (a row appearing 3 times on
    // the left and once on the right survives EXCEPT ALL twice). Spark
    // plans these as count-windows + generate, not distinct-hashing.
    QueryDef.sql("q57_set_ops_all",
      """SELECT 'except_all' AS op, key, count(*) AS n FROM (
        |  SELECT l_suppkey AS key FROM lineitem WHERE l_quantity < 10
        |  EXCEPT ALL SELECT l_suppkey FROM lineitem WHERE l_discount > 0.08) GROUP BY 2
        |UNION ALL
        |SELECT 'intersect_all' AS op, key, count(*) AS n FROM (
        |  SELECT l_suppkey AS key FROM lineitem WHERE l_quantity < 10
        |  INTERSECT ALL SELECT l_suppkey FROM lineitem WHERE l_discount > 0.08) GROUP BY 2""".stripMargin) {
      (s, dir) => {
        val a = Tables.lineitem(s, dir).filter(col("l_quantity") < 10)
          .select(col("l_suppkey").as("key"))
        val b = Tables.lineitem(s, dir).filter(col("l_discount") > 0.08)
          .select(col("l_suppkey").as("key"))
        a.exceptAll(b).withColumn("op", lit("except_all"))
          .unionByName(a.intersectAll(b).withColumn("op", lit("intersect_all")))
          .groupBy("op", "key").agg(count(lit(1)).as("n"))
      }
    },

    // Correlated LATERAL subquery: top-2 orders per customer written the
    // way an analyst writes it — a per-row dependent subquery — and
    // decorrelated by Catalyst into a set-based plan (no per-customer
    // re-execution; compare q12/q13, the explicit window/top-k forms of
    // the same question). Customers with no orders drop (CROSS LATERAL).
    QueryDef.sql("q56_lateral_topn",
      """SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS price
        |FROM customer, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t""".stripMargin) {
      (s, dir) => {
        Tables.customer(s, dir).createOrReplaceTempView("customer_lat_v")
        Tables.orders(s, dir).createOrReplaceTempView("orders_lat_v")
        s.sql(
          """SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS price
            |FROM customer_lat_v, LATERAL (
            |  SELECT o_orderkey, o_totalprice FROM orders_lat_v
            |  WHERE o_custkey = c_custkey
            |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t""".stripMargin)
      }
    },

    // Incremental distinct-count maintenance via MERGEABLE sketches: build
    // one Datasketches HLL sketch per (day, event_type) partition, then
    // roll partitions up with hll_union_agg — the pattern that maintains
    // "distinct users this month" at 100 TB by merging yesterday's stored
    // byte-array sketches with today's delta instead of rescanning the
    // month. q32's approx_count_distinct answers one query; a sketch
    // TABLE answers every future rollup over its partitions. Estimates
    // are Datasketches-internal → no DuckDB oracle (rows-only here);
    // SketchRollupSpec asserts merged == direct-sketch exactly and <2%
    // vs exact distinct.
    QueryDef.noOracle("q50_sketch_rollup") {
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("day"), col("event_type"))
          .agg(hll_sketch_agg(col("user_id")).as("sketch"))
        daily.groupBy("event_type")
          .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("approx_users"),
            count(lit(1)).as("n_days"))
      }
    },

    // q50's EXACT twin over the identical two-level chain — the
    // hash-gate for the pipeline feeding the sketch rollup (the sketch
    // estimate itself stays engine-specific and rows-only, its error
    // bound pinned by SketchRollupSpec): per (day, event_type) exact
    // distinct users, rolled up per event_type alongside the exact
    // period-wide distinct. The gap between `sum_daily_users` (what a
    // naive additive rollup of per-day distincts would claim) and
    // `exact_users` (the true union) is exactly the double-count a
    // mergeable sketch TABLE exists to avoid re-scanning for. The
    // period-wide distinct cannot derive from the daily counts, so the
    // second scan is intrinsic to the exact form — at 100 TB that
    // rescan is the cost q50 eliminates.
    QueryDef.sql("q75_distinct_rollup_exact",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, event_type,
        |         CAST(count(DISTINCT user_id) AS BIGINT) AS du
        |  FROM events GROUP BY 1, 2),
        |roll AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |         CAST(sum(du) AS BIGINT) AS sum_daily_users
        |  FROM daily GROUP BY 1),
        |tot AS (
        |  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
        |  FROM events GROUP BY 1)
        |SELECT r.event_type, r.n_days, r.sum_daily_users, t.exact_users
        |FROM roll r JOIN tot t USING (event_type)""".stripMargin) {
      (s, dir) => {
        val events = Tables.events(s, dir)
        val daily = events
          .groupBy(to_date(col("ts")).as("day"), col("event_type"))
          .agg(countDistinct("user_id").as("du"))
        val roll = daily.groupBy("event_type")
          .agg(count(lit(1)).as("n_days"), sum("du").as("sum_daily_users"))
        val tot = events.groupBy("event_type")
          .agg(countDistinct("user_id").as("exact_users"))
        roll.join(tot, Seq("event_type"))
          .select(col("event_type"), col("n_days"),
            col("sum_daily_users"), col("exact_users"))
      }
    },

    // Forward-fill (LOCF — last observation carried forward): only
    // purchase events carry a price; every event sees the user's most
    // recent purchase value. `last(_, ignoreNulls)` over a running ROWS
    // frame — the sensor/sparse-metric gap-fill shape. Deterministic
    // under ts ties via the event_id tie-break (a ROWS frame is
    // order-sensitive, unlike q54's RANGE). Scale: one user_id shuffle;
    // the frame evaluates incrementally (O(1) carried state per row,
    // never a rescan of the partition prefix). Events before a user's
    // first purchase stay NULL — part of the contract, both engines.
    QueryDef.sql("q58_locf_fill",
      """SELECT event_id, user_id, epoch_us(ts) AS tus,
        |       round(last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |         OVER (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 3) AS last_price
        |FROM events""".stripMargin) {
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, dir).select(
          col("event_id"), col("user_id"), expr("unix_micros(ts)").as("tus"),
          round(last(when(col("event_type") === "purchase", col("value")),
            ignoreNulls = true).over(w), 3).as("last_price"))
      }
    },

    // Column profiling — the ANALYZE/data-quality sweep every warehouse
    // runs on ingest: per-column row count, null count, exact distinct
    // count, min and max (stringified so one result schema fits every
    // column type). ONE corpus pass: all per-column aggregates run in a
    // single multi-distinct aggregation (Catalyst plans the distincts
    // through one Expand — scan once, expand 4×, never 4 scans), then
    // the wide row unpivots to per-column rows driver-free via a
    // 4-element inline array. The oracle's UNION-ALL-per-column form is
    // the semantic spec; the one-pass Expand is the 100 TB encoding.
    QueryDef.sql("q59_profile", {
      val cols = Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")
      cols.map(c =>
        s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
           |       CAST(count(*) - count($c) AS BIGINT) AS n_null,
           |       CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |       CAST(min($c) AS VARCHAR) AS min_s, CAST(max($c) AS VARCHAR) AS max_s
           |FROM lineitem""".stripMargin).mkString("\nUNION ALL\n")
    }) {
      (s, dir) => {
        val cols = Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")
        val aggs = cols.flatMap(c => Seq(
          count(col(c)).as(s"${c}__nn"),
          countDistinct(col(c)).as(s"${c}__nd"),
          min(col(c)).cast("string").as(s"${c}__mn"),
          max(col(c)).cast("string").as(s"${c}__mx"))) :+ count(lit(1)).as("__n")
        // fanOut: the 4 exact count(DISTINCT)s expand every row 5x and
        // partial-aggregate BEFORE any exchange — over a single-row-
        // group fixture file that whole stage runs on one core (4.6 s
        // of the query's 5.1 s measured); fanned out it parallelizes
        val wide = Tables.fanOut(Tables.lineitem(s, dir))
          .agg(aggs.head, aggs.tail: _*)
        wide.select(explode(array(cols.map(c => struct(
            lit(c).as("col_name"),
            col("__n").as("n_rows"),
            (col("__n") - col(s"${c}__nn")).as("n_null"),
            col(s"${c}__nd").as("n_distinct"),
            col(s"${c}__mn").as("min_s"),
            col(s"${c}__mx").as("max_s"))): _*)).as("p"))
          .select("p.*")
      }
    },

    // Distribution window functions — the rank-to-share family q12's
    // rank/dense_rank doesn't cover: ntile(4) (quartile assignment),
    // percent_rank ((rank-1)/(n-1) — relative standing), cume_dist
    // (fraction of peers at-or-below). The ORDER BY carries an
    // o_orderkey tie-break: all three are ORDER-sensitive (ntile splits
    // ties across tiles by position), so an under-specified sort would
    // be nondeterministic across engines AND across Spark's own task
    // retries. One o_orderpriority shuffle serves all three frames.
    QueryDef.sql("q60_dist_window",
      """SELECT o_orderkey, o_orderpriority,
        |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |       round(percent_rank() OVER w, 6) AS pr,
        |       round(cume_dist() OVER w, 6) AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice, o_orderkey)""".stripMargin) {
      (s, dir) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        Tables.orders(s, dir).select(
          col("o_orderkey"), col("o_orderpriority"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
      }
    },

    // Ordered string aggregation (Spark 4 listagg / SQL:2016 LISTAGG):
    // collapse a group to one delimited string with an explicit WITHIN
    // GROUP order — the denormalized-label shape (tag lists, member
    // rosters) that collect_list can't pin deterministically. Grouped
    // on the 25-row nation table after a broadcast region join; at
    // scale the hazard is a mega-group materializing one giant string
    // per key — bound the group (top-N first) before listagg, exactly
    // as a 100 TB roster query must.
    QueryDef.sql("q61_listagg",
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS members,
        |       count(*) AS n
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin) {
      (s, dir) => {
        Tables.nation(s, dir).createOrReplaceTempView("nation_la_v")
        Tables.region(s, dir).createOrReplaceTempView("region_la_v")
        s.sql(
          """SELECT r_name,
            |       listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS members,
            |       count(*) AS n
            |FROM nation_la_v JOIN region_la_v ON n_regionkey = r_regionkey
            |GROUP BY r_name""".stripMargin)
      }
    },

    // Error-safe arithmetic (ANSI-mode survival kit): under Spark 4's
    // default ANSI semantics, 1/0 and a failed string→int cast THROW —
    // one poisoned row kills a 100 TB job hours in. try_divide /
    // try_cast degrade those rows to NULL instead, keeping failures
    // data (countable, attributable) rather than exceptions. The oracle
    // spells the same semantics with engine-agnostic CASE/TRY_CAST.
    //
    // Cost contract (measured): try_* is free on the success path, but
    // each FAILING row pays a caught JVM exception (~0.7 µs — a 100%-
    // failure string column cost 1.0 s/1.5M rows where the 10%-failure
    // mix below costs ~0.1 s). try_cast is for poisoned MINORITIES; if
    // most rows fail, that isn't dirty data, it's the wrong parser —
    // prefilter (rlike) or fix the schema instead.
    QueryDef.sql("q62_try_safe",
      """SELECT o_orderstatus,
        |       count(*) AS n,
        |       CAST(sum(CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_div_null,
        |       round(sum(CASE WHEN o_orderkey % 3 = 0 THEN NULL
        |                      ELSE o_totalprice / (o_orderkey % 3) END), 2) AS safe_div_sum,
        |       CAST(sum(CASE WHEN TRY_CAST(CASE WHEN o_orderkey % 10 = 0
        |                          THEN o_orderpriority
        |                          ELSE substring(o_orderpriority, 1, 1) END AS INTEGER)
        |                     IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_cast_fail
        |FROM orders GROUP BY o_orderstatus""".stripMargin) {
      (s, dir) =>
        Tables.orders(s, dir).groupBy("o_orderstatus").agg(
          count(lit(1)).as("n"),
          sum(when(col("o_orderkey") % 3 === 0, 1L).otherwise(0L)).as("n_div_null"),
          round(sum(try_divide(col("o_totalprice"),
            when(col("o_orderkey") % 3 === 0, lit(0.0))
              .otherwise((col("o_orderkey") % 3).cast("double")))), 2)
            .as("safe_div_sum"),
          // 10% poisoned rows ('1-URGENT' fails the INT parse), 90% clean
          // ('1'): the realistic dirty-column mix the cost contract assumes
          sum(when(expr(
            """try_cast(CASE WHEN o_orderkey % 10 = 0
              |  THEN o_orderpriority
              |  ELSE substring(o_orderpriority, 1, 1) END AS INT)""".stripMargin)
            .isNull, 1L).otherwise(0L)).as("n_cast_fail"))
    },

    // VARIANT typed JSON (Spark 4): parse the JSON string ONCE into the
    // binary VARIANT encoding, then read fields with typed variant_get —
    // vs q26's get_json_object, which re-tokenizes the string per
    // access. With several extractions per row over 100 TB of raw JSON,
    // parse-once-access-many is the difference between one parse and N;
    // VARIANT's shredded binary layout also keeps field access cheap
    // after the column is stored. Output is plain BIGINTs (the variant
    // never leaves the plan), so the DuckDB oracle is its string-path
    // equivalent.
    QueryDef.sql("q63_variant_json",
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
        |       count(*) AS n,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
        |         AS sum_k,
        |       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
        |         AS max_k
        |FROM events GROUP BY 1""".stripMargin) {
      (s, dir) =>
        Tables.events(s, dir)
          .select(parse_json(col("props")).as("v"))
          .select(variant_get(col("v"), "$.k", "bigint").as("k"))
          .groupBy((col("k") % 10).as("k_bucket"))
          .agg(count(lit(1)).as("n"), sum("k").as("sum_k"), max("k").as("max_k"))
    },

    // Native session-window aggregate — the OPERATOR form of q24's
    // lag-island composition: `session_window(ts, gap)` merges each
    // user's events into [first, last+gap) windows inside one
    // aggregation. One user_id shuffle, no window-function sort-and-scan
    // pass, and the same operator runs incrementally under Structured
    // Streaming (EventStreams.sessionize is its stateful twin) — batch
    // and stream share ONE session definition. The oracle spells the
    // merge as lag-gap islands; window end is last event + gap by
    // definition in both.
    QueryDef.sql("q64_session_window",
      """WITH marked AS (
        |  SELECT user_id, epoch_us(ts) AS tus,
        |         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |              ORDER BY ts, event_id) > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM events),
        |islands AS (
        |  SELECT user_id, tus,
        |         sum(new_sess) OVER (PARTITION BY user_id ORDER BY tus
        |                             ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM marked)
        |SELECT user_id, min(tus) AS start_us, max(tus) + 1800000000 AS end_us,
        |       count(*) AS n_events
        |FROM islands GROUP BY user_id, sess_id""".stripMargin) {
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"),
            unix_micros(col("w.start")).as("start_us"),
            unix_micros(col("w.end")).as("end_us"),
            col("n_events"))
    },

    // Sketch-based heavy hitters (Spark 4.1 approx_top_k — an Apache
    // DataSketches frequent-items sketch): THE "top pages/tokens/UAs"
    // primitive at 100 TB, where exact GROUP BY + ORDER BY must shuffle
    // every distinct key and a sketch ships O(maxItemsTracked) bytes per
    // partition. Estimates are exact whenever distinct keys fit inside
    // maxItemsTracked (sketch never evicts) — pinned here (4 event
    // types ≪ 100 tracked) so the DuckDB oracle can demand the exact
    // counts; production picks maxItemsTracked ≥ expected heavy-hitter
    // count and accepts ±error on the tail. The LIMIT 3 cut happens
    // OUTSIDE the sketch on a deterministic (est DESC, item) order: the
    // sketch is asked for all 100 tracked items, because its internal
    // top-k selection makes no tie-break promise and two types tied at
    // the cutoff could otherwise diverge from the oracle's ordering.
    QueryDef.sql("q65_approx_topk",
      """SELECT event_type AS item, count(*) AS est
        |FROM events GROUP BY event_type
        |ORDER BY est DESC, item LIMIT 3""".stripMargin) {
      (s, dir) => {
        Tables.events(s, dir).createOrReplaceTempView("events_atk_v")
        s.sql(
          """SELECT t.elem.item AS item, t.elem.count AS est
            |FROM (SELECT explode(approx_top_k(event_type, 100, 100)) AS elem
            |      FROM events_atk_v) t
            |ORDER BY est DESC, item LIMIT 3""".stripMargin)
      }
    },

    // Incremental heavy-hitter maintenance via PHASED top-k sketches
    // (Spark 4.1 approx_top_k_accumulate / _combine / _estimate) — the
    // frequent-items twin of q50's HLL rollup: build one sketch per day
    // partition, store it, then answer any later rollup by MERGING the
    // stored sketches instead of rescanning the raw events (yesterday's
    // sketch + today's delta at 100 TB). Unlike q50, this one IS
    // oracle-checkable: with 5 event types ≪ 100 tracked items the
    // sketch never evicts, so the merged estimates are exactly the
    // per-type counts the oracle computes. As in q65, estimate ALL
    // tracked items and take the top 3 with an explicit
    // (est DESC, item) sort — never the sketch's own tie-break.
    QueryDef.sql("q66_topk_rollup",
      """SELECT event_type AS item, count(*) AS est
        |FROM events GROUP BY event_type
        |ORDER BY est DESC, item LIMIT 3""".stripMargin) {
      (s, dir) => {
        Tables.events(s, dir).createOrReplaceTempView("events_tkr_v")
        s.sql(
          """WITH daily AS (
            |  SELECT CAST(ts AS DATE) AS day,
            |         approx_top_k_accumulate(event_type, 100) AS sk
            |  FROM events_tkr_v GROUP BY 1),
            |merged AS (
            |  SELECT approx_top_k_combine(sk, 100) AS sk FROM daily)
            |SELECT t.elem.item AS item, t.elem.count AS est
            |FROM (SELECT explode(approx_top_k_estimate(sk, 100)) AS elem
            |      FROM merged) t
            |ORDER BY est DESC, item LIMIT 3""".stripMargin)
      }
    },

    // Sliding (hopping) windows — q22's tumbling window generalized to
    // overlap: 1-hour windows every 15 minutes, so each event lands in
    // exactly 4 (win/slide) of them. Spark's window() plans this as one
    // Expand (each row replicated per window) + a standard two-phase
    // agg — rows duplicate 4× INTO the shuffle but arrive pre-combined,
    // the same trade q49's grouping sets make; the oracle spells the
    // same 4-way assignment arithmetically with a range(4) cross join.
    // Epoch-aligned origins in both engines.
    QueryDef.sql("q67_sliding_window",
      """SELECT (tus // 900000000 - k) * 900000000 AS win_start_us,
        |       event_type, count(*) AS n, round(sum(value), 3) AS sum_value
        |FROM (SELECT epoch_us(ts) AS tus, event_type, value FROM events),
        |     range(4) t(k)
        |GROUP BY 1, 2""".stripMargin) {
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum("value"), 3).as("sum_value"))
          .select(unix_micros(col("w.start")).as("win_start_us"),
            col("event_type"), col("n"), col("sum_value"))
    },

    // Count-min-sketch frequency table + the [[graft.plans.CmsEstimate]]
    // probe: the sketch aggregates once over the corpus (mergeable
    // binary, like q50's HLL and q66's top-k images), then a SCALAR
    // SUBQUERY feeds it to cms_estimate over the probe rows — one
    // deserialization per task, codegen'd probe per row. With 5 event
    // types and ε=1e-4 the 5-row×~27k-counter sketch has no full-depth
    // collisions, so estimates equal the exact counts the oracle
    // computes (the general contract is exact ≤ est ≤ exact + ε·N,
    // asserted as a property in CmsEstimateSpec).
    QueryDef.sql("q68_cms_freq",
      """SELECT event_type AS item, count(*) AS est
        |FROM events GROUP BY event_type""".stripMargin) {
      (s, dir) => {
        val events = Tables.events(s, dir)
        val sketch = events.agg(
          expr("count_min_sketch(event_type, 0.0001d, 0.999d, 42)")).scalar()
        events.select(col("event_type")).distinct()
          .select(col("event_type").as("item"),
            graft.plans.CmsEstimate(sketch, col("event_type")).as("est"))
      }
    },

    // Calendar interval arithmetic (F17-19's date-dim functions
    // generalized): month-clamped shifts (add_months pins Jan-31 + 3mo
    // to Apr-30 — both engines), period truncation, month-boundary
    // lookup, day/whole-month distances to a fixed as-of date. All
    // codegen'd date math on the scan — zero shuffles; the projection
    // prunes to one column + pushes the orderkey range into the scan.
    QueryDef.sql("q69_interval_math",
      """SELECT o_orderkey,
        |       strftime(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE), '%Y-%m-%d') AS plus3m,
        |       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
        |       strftime(CAST(date_trunc('quarter', o_orderdate) AS DATE), '%Y-%m-%d') AS qtr,
        |       date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to,
        |       CAST((2002 - year(o_orderdate)) * 12 - month(o_orderdate) + 1 AS BIGINT)
        |         AS whole_months_to
        |FROM orders WHERE o_orderkey < 1000""".stripMargin) {
      (s, dir) =>
        Tables.orders(s, dir).filter(col("o_orderkey") < 1000)
          .select(col("o_orderkey"),
            date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus3m"),
            date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
            date_format(date_trunc("quarter", col("o_orderdate")), "yyyy-MM-dd").as("qtr"),
            datediff(lit("2002-01-01").cast("date"), col("o_orderdate")).cast("long")
              .as("days_to"),
            ((lit(2002) - year(col("o_orderdate"))) * 12 - month(col("o_orderdate")) + 1)
              .cast("long").as("whole_months_to"))
    },

    // Correlated EXISTS / NOT EXISTS — the SUBQUERY spelling of q09/q10's
    // explicit anti/semi joins: Catalyst decorrelates both predicates
    // into one semi and one anti join against pre-aggregated/filtered
    // order sets (never a per-customer re-execution). The analyst form
    // and the q09/q10 operator form compile to the same physical shape —
    // asserted by the shared oracle technique rather than plan text here.
    QueryDef.sql("q70_exists",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT')""".stripMargin) {
      (s, dir) => {
        Tables.customer(s, dir).createOrReplaceTempView("customer_ex_v")
        Tables.orders(s, dir).createOrReplaceTempView("orders_ex_v")
        s.sql(
          """SELECT c_custkey, c_name FROM customer_ex_v c
            |WHERE EXISTS (SELECT 1 FROM orders_ex_v o
            |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
            |  AND NOT EXISTS (SELECT 1 FROM orders_ex_v o
            |                  WHERE o.o_custkey = c.c_custkey
            |                    AND o.o_orderpriority = '1-URGENT')""".stripMargin)
      }
    },

    // SQL pipe syntax (Spark 4) — q01's pricing summary restated as a
    // linear FROM |> WHERE |> AGGREGATE flow. Same logical plan as the
    // nested form after parsing (pipe stages are syntax, not execution),
    // so this pins that the NEW SQL surface compiles to the audited q01
    // physical shape; the oracle is plain ANSI.
    QueryDef.sql("q71_pipe_syntax",
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem WHERE l_quantity < 40
        |GROUP BY l_returnflag, l_linestatus""".stripMargin) {
      (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_pipe_v")
        s.sql(
          """FROM lineitem_pipe_v
            ||> WHERE l_quantity < 40
            ||> AGGREGATE sum(l_quantity) AS sum_qty, count(*) AS n
            |   GROUP BY l_returnflag, l_linestatus""".stripMargin)
          .select("l_returnflag", "l_linestatus", "sum_qty", "n")
      }
    },

    // Null-safe join (<=> / IS NOT DISTINCT FROM): NULL keys MATCH EACH
    // OTHER instead of silently dropping — the semantics dimension-key
    // joins need when "unknown" is itself a valid dimension member.
    // Null-safe equality stays a HASH join key (nulls hash like any
    // value) — no fallback to nested-loop, same one-shuffle plan as q09.
    QueryDef.sql("q72_nullsafe_join",
      """WITH l AS (SELECT CASE WHEN l_orderkey % 7 = 0 THEN NULL
        |                       ELSE l_orderkey % 5 END AS k, l_quantity
        |           FROM lineitem),
        |r AS (SELECT CASE WHEN v = 99 THEN NULL ELSE v END AS k, v AS grp
        |      FROM (SELECT unnest([0, 1, 2, 99]) AS v))
        |SELECT r.grp AS grp, count(*) AS n, round(sum(l.l_quantity), 2) AS qty
        |FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
        |GROUP BY r.grp""".stripMargin) {
      (s, dir) => {
        val l = Tables.lineitem(s, dir).select(
          when(col("l_orderkey") % 7 === 0, lit(null).cast("long"))
            .otherwise(col("l_orderkey") % 5).as("k"),
          col("l_quantity"))
        import s.implicits._
        val r = Seq[(Option[Long], Long)]((Some(0L), 0L), (Some(1L), 1L),
          (Some(2L), 2L), (None, 99L)).toDF("k", "grp")
        l.join(r, l("k") <=> r("k"))
          .groupBy(r("grp"))
          .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
      }
    },

    // Declarative range join, auto-banded: the analyst writes the plain
    // keyless BETWEEN join (which Spark alone can only plan as a
    // |points|×|windows| nested loop) and the injected
    // [[graft.plans.BandedRangeJoin]] optimizer rule rewrites it into
    // the banded equi-join q45 spells by hand — Generate over interval
    // buckets + hash join on the bucket + the original predicate as
    // residual. spark.graft.rangeJoin.binSize is this query's explicit
    // width choice (1 day, the window length); Sessions.tune resets it
    // so the opt-in can't leak into other queries' plans. Row-for-row
    // equal to the nested loop by construction (spec-asserted both ways).
    QueryDef.sql("q73_range_join_auto",
      """WITH b AS (SELECT epoch_us(min(ts)) AS t0 FROM events),
        |iv AS (SELECT CAST(i AS BIGINT) AS i,
        |              t0 + CAST(i AS BIGINT)*172800000000 AS s,
        |              t0 + CAST(i AS BIGINT)*172800000000 + 86400000000 AS e
        |       FROM b, range(0, 5) t(i)),
        |p AS (SELECT event_type, epoch_us(ts) AS t FROM events)
        |SELECT p.event_type, iv.i, count(*) AS n
        |FROM p JOIN iv ON p.t >= iv.s AND p.t < iv.e
        |GROUP BY p.event_type, iv.i""".stripMargin) {
      (s, dir) => {
        s.conf.set("spark.graft.rangeJoin.binSize", "86400000000")
        val ev = Tables.events(s, dir)
        val day = 86400000000L
        val iv = ev.agg(unix_micros(min("ts")).as("t0"))
          .select(explode(sequence(lit(0L), lit(4L))).as("i"), col("t0"))
          .select(col("i"),
            (col("t0") + col("i") * lit(2 * day)).as("s"),
            (col("t0") + col("i") * lit(2 * day) + lit(day)).as("e"))
        val p = ev.select(col("event_type"), unix_micros(col("ts")).as("t"))
        p.join(iv, col("t") >= col("s") && col("t") < col("e"))
          .groupBy("event_type", "i").agg(count(lit(1)).as("n"))
      }
    },

    // SQL UDF (Spark 4 CREATE FUNCTION ... RETURN <expr>): named,
    // catalog-managed business logic that stays a PURE EXPRESSION — the
    // analyzer inlines the body into the plan, so unlike a Scala/Python
    // UDF it keeps codegen, predicate pushdown, and the oracle's exact
    // arithmetic (the oracle is the same expression written inline).
    // This is the engine's sanctioned answer to "share a formula across
    // queries" — never an opaque closure.
    QueryDef.sql("q74_sql_udf",
      """SELECT l_returnflag,
        |       round(sum(l_extendedprice * (1 - l_discount) *
        |                 (1 + CASE WHEN l_quantity >= 30 THEN 0.0 ELSE 0.05 END)), 2)
        |         AS adj_revenue,
        |       count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) {
      (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_udf_v")
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_adj_price(
                |    price DOUBLE, disc DOUBLE, qty DOUBLE)
                |RETURNS DOUBLE
                |RETURN price * (1 - disc) *
                |       (1 + CASE WHEN qty >= 30 THEN 0.0 ELSE 0.05 END)""".stripMargin)
        s.sql(
          """SELECT l_returnflag,
            |       round(sum(graft_adj_price(l_extendedprice, l_discount, l_quantity)), 2)
            |         AS adj_revenue,
            |       count(*) AS n
            |FROM lineitem_udf_v GROUP BY l_returnflag""".stripMargin)
      }
    }
  )
}
