package graft.queries

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Det._

/** Second wave of operator coverage: semi-structured JSON, as-of joins,
  * cube/grouping sets, pivot, the spark.sql surface (correlated
  * subqueries), date/string function batteries, sketches, and a typed
  * Aggregator UDAF — each oracle-checked where the semantics are
  * engine-identical.
  */
object MoreQueries {

  /** Typed UDAF: order-independent XOR checksum of a mixed key — the
    * Aggregator API surface (SURVEY §2.2 "UDF/UDAF"). Exact integer math
    * → DuckDB BIT_XOR oracle.
    */
  object XorChecksum extends Aggregator[Long, Long, Long] {
    override def zero: Long = 0L
    override def reduce(acc: Long, x: Long): Long = acc ^ (x * 2654435761L)
    override def merge(a: Long, b: Long): Long = a ^ b
    override def finish(acc: Long): Long = acc
    override def bufferEncoder: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- JSON extraction from the events props column ----
    QueryDef(
      "q33_events_json",
      (s, dir) => {
        val e = Tables.events(s, dir)
        e.select(col("event_type"),
            get_json_object(col("props"), "$.k").cast(LongType).as("k"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("k")).as("sum_k"),
            min(col("k")).as("min_k"),
            max(col("k")).as("max_k"))
      },
      Some("""SELECT event_type, COUNT(*) AS n,
          CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
          MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
          MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        FROM events GROUP BY event_type""")),

    // ---- as-of join: most recent prior click for each purchase ----
    QueryDef(
      "q34_asof_join",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            expr("ts div 1000").as("ts_us"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        e.withColumn("click_marker", when(col("event_type") === "click", col("event_id")))
          .withColumn("click_ts_marker", when(col("event_type") === "click", col("ts_us")))
          .withColumn("prev_click_id", last(col("click_marker"), ignoreNulls = true).over(w))
          .withColumn("prev_click_ts", last(col("click_ts_marker"), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts_us"),
            col("prev_click_id"), (col("ts_us") - col("prev_click_ts")).as("us_since_click"))
      },
      Some("""SELECT event_id, user_id, ts_us, prev_click_id, ts_us - prev_click_ts AS us_since_click
        FROM (
          SELECT event_id, user_id, event_type, ts_us,
            LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS) OVER w AS prev_click_id,
            LAST_VALUE(CASE WHEN event_type = 'click' THEN ts_us END IGNORE NULLS) OVER w AS prev_click_ts
          FROM (SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000 AS ts_us FROM events)
          WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        WHERE event_type = 'purchase'""")),

    // ---- cube with grouping id ----
    QueryDef(
      "q35_cube",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        li.cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"),
            grouping_id().cast(LongType).as("gid"))
          .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
            col("gid"), col("n_rows"), col("sum_qty"))
      },
      Some(s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
          COALESCE(l_linestatus, 'ALL') AS linestatus,
          CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
          COUNT(*) AS n_rows, ${sqlSum("l_quantity")} AS sum_qty
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""")),

    // ---- pivot (fixed value list, CASE-exact oracle) ----
    QueryDef(
      "q36_pivot",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.groupBy(col("o_orderstatus"))
          .pivot("o_orderpriority", Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
          .agg(count(lit(1)))
          .select(col("o_orderstatus"),
            coalesce(col("1-URGENT"), lit(0L)).as("p_urgent"),
            coalesce(col("2-HIGH"), lit(0L)).as("p_high"),
            coalesce(col("3-MEDIUM"), lit(0L)).as("p_medium"),
            coalesce(col("4-NOT SPECIFIED"), lit(0L)).as("p_notspec"),
            coalesce(col("5-LOW"), lit(0L)).as("p_low"))
      },
      Some("""SELECT o_orderstatus,
          COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS p_urgent,
          COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS p_high,
          COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS p_medium,
          COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS p_notspec,
          COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS p_low
        FROM orders GROUP BY o_orderstatus""")),

    // ---- the spark.sql surface: correlated EXISTS + scalar subquery ----
    QueryDef(
      "q37_sql_subqueries",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("v_orders")
        Tables.lineitem(s, dir).createOrReplaceTempView("v_lineitem")
        s.sql("""SELECT o_orderstatus, COUNT(*) AS n_big_orders
          FROM v_orders
          WHERE EXISTS (SELECT 1 FROM v_lineitem
                        WHERE l_orderkey = o_orderkey AND l_quantity > 49)
            AND o_totalprice > (SELECT AVG(o_totalprice) FROM v_orders)
          GROUP BY o_orderstatus""")
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n_big_orders
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity > 49)
          AND o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
        GROUP BY o_orderstatus""")),

    // ---- date function battery ----
    QueryDef(
      "q28_date_functions",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.groupBy(
            year(col("o_orderdate")).cast(LongType).as("o_year"),
            quarter(col("o_orderdate")).cast(LongType).as("o_quarter"))
          .agg(count(lit(1)).as("n_orders"),
            min(to_date(col("o_orderdate"))).as("first_day"),
            max(to_date(col("o_orderdate"))).as("last_day"),
            count(when(dayofweek(col("o_orderdate")) === 1, lit(1))).as("n_sunday"))
      },
      Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
          CAST(quarter(o_orderdate) AS BIGINT) AS o_quarter,
          COUNT(*) AS n_orders,
          MIN(CAST(o_orderdate AS DATE)) AS first_day,
          MAX(CAST(o_orderdate AS DATE)) AS last_day,
          COUNT(CASE WHEN dayofweek(o_orderdate) = 0 THEN 1 END) AS n_sunday
        FROM orders GROUP BY 1, 2""")),

    // ---- string function battery ----
    QueryDef(
      "q29_string_functions",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        c.select(col("c_custkey"),
          upper(col("c_name")).as("upper_name"),
          substring(col("c_name"), 1, 8).as("prefix8"),
          length(col("c_name")).cast(LongType).as("name_len"),
          instr(col("c_name"), "1").cast(LongType).as("pos_of_1"),
          concat_ws("|", col("c_mktsegment"), reverse(col("c_name"))).as("seg_rev"),
          lpad(col("c_custkey").cast(StringType), 8, "0").as("padded_key"))
      },
      Some("""SELECT c_custkey,
          UPPER(c_name) AS upper_name,
          SUBSTRING(c_name, 1, 8) AS prefix8,
          CAST(LENGTH(c_name) AS BIGINT) AS name_len,
          CAST(INSTR(c_name, '1') AS BIGINT) AS pos_of_1,
          CONCAT_WS('|', c_mktsegment, REVERSE(c_name)) AS seg_rev,
          LPAD(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key
        FROM customer""")),

    // ---- sketches: exact distinct (oracle) + HLL approx (engine-specific) ----
    QueryDef(
      "q38_distinct_exact",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        l.groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_partkey")).as("exact_parts"),
            countDistinct(col("l_suppkey")).as("exact_supps"),
            count(lit(1)).as("n_rows"))
      },
      Some("""SELECT l_returnflag,
          COUNT(DISTINCT l_partkey) AS exact_parts,
          COUNT(DISTINCT l_suppkey) AS exact_supps,
          COUNT(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag""")),
    // HLL++ sketch VALUES are engine-specific, but the accuracy CONTRACT
    // is oracle-able: per group, |approx-exact|/exact must sit inside the
    // sketch's error envelope (rsd 0.05 → observed ~2.7% for partkey,
    // rsd 0.01 → <0.9% for orderkey, stable across sf0.001..sf0.1), so
    // DuckDB's exact COUNT(DISTINCT) pins TRUE booleans per group — a
    // broken sketch, merge, or grouping fails the hash
    QueryDef(
      "q39_hll_approx",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        l.groupBy(col("l_returnflag"))
          .agg(approx_count_distinct(col("l_partkey")).as("ap"),
            countDistinct(col("l_partkey")).as("ep"),
            approx_count_distinct(col("l_orderkey"), 0.01).as("ao"),
            countDistinct(col("l_orderkey")).as("eo"))
          .select(col("l_returnflag"),
            (abs(col("ap") - col("ep")).cast(DoubleType) / col("ep") < 0.05).as("parts_ok"),
            (abs(col("ao") - col("eo")).cast(DoubleType) / col("eo") < 0.02).as("orders_ok"),
            col("ep").as("exact_parts"), col("eo").as("exact_orders"))
      },
      Some("""SELECT l_returnflag, TRUE AS parts_ok, TRUE AS orders_ok,
          COUNT(DISTINCT l_partkey) AS exact_parts,
          COUNT(DISTINCT l_orderkey) AS exact_orders
        FROM lineitem GROUP BY l_returnflag""")),

    // ---- frequent-items sketch (SpaceSaving), k counters, mergeable ----
    // "Top domains / top tokens" at 100 TB without shuffling every
    // distinct item: k counters per partial, merged with error
    // accumulation. Like q39, the sketch VALUES are engine-specific but
    // the CONTRACT is oracle-able: the fixture plants 3 hot items at
    // ~N/6 each over a long uniform cold tail (every cold item unique),
    // so with k=64 the floor (≤ N/64 summed across merges) sits far
    // below the hot counts — each hot item MUST be present (found) and
    // its estimate must bracket the exact count (est - err <= n <= est).
    // A broken eviction, floor, or merge flips a boolean and the hash.
    QueryDef(
      "q149_frequent_items_sketch",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val items = d.select(
          when(pmod(col("doc_id"), lit(2)) === 0,
            concat(lit("hot"), pmod(col("doc_id"), lit(3)).cast("string")))
            .otherwise(concat(lit("cold"), col("doc_id").cast("string"))).as("item"))
        val sketch = items.agg(
          graft.functions.FrequentItemsFunctions.spaceSavingTopK(col("item"), 64).as("sk"))
          .select(explode(col("sk")).as("e"))
          .select(col("e.item").as("item"), col("e.est").as("est"), col("e.err").as("err"))
        val exact = items.filter(col("item").startsWith("hot"))
          .groupBy(col("item")).agg(count(lit(1)).as("n_exact"))
        exact.join(sketch, Seq("item"), "left")
          .select(col("item"), col("n_exact"),
            col("est").isNotNull.as("found"),
            coalesce(col("est") >= col("n_exact") &&
              col("est") - col("err") <= col("n_exact"), lit(false)).as("bounds_ok"))
          .orderBy(col("item"))
      },
      Some("""SELECT 'hot' || CAST(CAST(doc_id % 3 AS BIGINT) AS VARCHAR) AS item,
          COUNT(*) AS n_exact, TRUE AS found, TRUE AS bounds_ok
        FROM documents WHERE doc_id % 2 = 0
        GROUP BY 1 ORDER BY 1""")),

    // ---- KMV / theta sketch: cross-corpus distinct set algebra ----
    // "How much does corpus B overlap corpus A?" at 100 TB: HLL only
    // merges to a union; the KMV sketch retains the k smallest hashes —
    // a uniform sample of the distinct set — so intersection / union /
    // Jaccard estimates come from ONE scan + k longs per group, no join
    // and no shuffle of distinct keys. Fixture: order keys of
    // low-quantity vs high-quantity lineitems (heavily overlapping,
    // ~13.6k distinct each, well past k=1024 -> genuine estimate
    // regime). The sketch VALUES are engine-specific but the accuracy
    // CONTRACT is oracle-able like q39/q149: exact DuckDB set ops pin
    // TRUE booleans at ~3x the 1/sqrt(k) envelope; a broken hash,
    // eviction, merge, or θ cut flips a boolean and the hash.
    QueryDef(
      "q155_kmv_corpus_overlap",
      (s, dir) => {
        val k = 1024
        val li = Tables.lineitem(s, dir)
          .select(col("l_orderkey").cast(StringType).as("key"), col("l_quantity"))
        val sk = li.agg(
          graft.functions.KmvFunctions.kmvSketch(
            when(col("l_quantity") <= 30, col("key")), k).as("ska"),
          graft.functions.KmvFunctions.kmvSketch(
            when(col("l_quantity") >= 20, col("key")), k).as("skb"))
        val est = sk.select(
          graft.functions.KmvFunctions.kmvCardinality(col("ska"), k).as("ca"),
          graft.functions.KmvFunctions.kmvCardinality(col("skb"), k).as("cb"),
          graft.functions.KmvFunctions.kmvSetOps(col("ska"), col("skb"), k).as("ops"))
          .select(col("ca"), col("cb"),
            col("ops.intersection").as("inter"),
            col("ops.union").as("uni"), col("ops.jaccard").as("jac"))
        val ex = li.agg(
          countDistinct(when(col("l_quantity") <= 30, col("key"))).as("ea"),
          countDistinct(when(col("l_quantity") >= 20, col("key"))).as("eb"),
          countDistinct(when(col("l_quantity") >= 20 && col("l_quantity") <= 30,
            col("key"))).as("naive_both"))
        // exact intersection needs per-key set membership, not a row
        // filter (a key can reach quantity 20..30 via DIFFERENT rows)
        val exactSets = li.groupBy(col("key")).agg(
          max(col("l_quantity") <= 30).as("in_a"),
          max(col("l_quantity") >= 20).as("in_b"))
          .agg(count(when(col("in_a") && col("in_b"), 1)).as("e_inter"),
            count(when(col("in_a") || col("in_b"), 1)).as("e_union"))
        est.crossJoin(ex).crossJoin(exactSets)
          .select(col("ea").as("exact_a"), col("eb").as("exact_b"),
            col("e_inter").as("exact_inter"), col("e_union").as("exact_union"),
            (abs(col("ca") - col("ea")) / col("ea") < 0.10).as("card_a_ok"),
            (abs(col("cb") - col("eb")) / col("eb") < 0.10).as("card_b_ok"),
            (abs(col("inter") - col("e_inter")) / col("e_inter") < 0.12).as("inter_ok"),
            (abs(col("uni") - col("e_union")) / col("e_union") < 0.10).as("union_ok"),
            (abs(col("jac") - col("e_inter") / col("e_union")) < 0.08).as("jaccard_ok"))
      },
      Some("""WITH sets AS (
          SELECT CAST(l_orderkey AS VARCHAR) AS key,
            MAX(l_quantity <= 30) AS in_a, MAX(l_quantity >= 20) AS in_b
          FROM lineitem GROUP BY 1
        )
        SELECT COUNT(*) FILTER (in_a) AS exact_a,
          COUNT(*) FILTER (in_b) AS exact_b,
          COUNT(*) FILTER (in_a AND in_b) AS exact_inter,
          COUNT(*) FILTER (in_a OR in_b) AS exact_union,
          TRUE AS card_a_ok, TRUE AS card_b_ok, TRUE AS inter_ok,
          TRUE AS union_ok, TRUE AS jaccard_ok
        FROM sets""")),

    // ---- explode + array ops: corpus word count, top-50 ----
    QueryDef(
      "q64_word_count",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        d.select(explode(split(col("text"), " ", -1)).as("word"))
          .filter(length(col("word")) > 0)
          .groupBy(col("word"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("word"))
          .limit(50)
      },
      Some("""SELECT word, COUNT(*) AS n
        FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
        WHERE LENGTH(word) > 0
        GROUP BY word ORDER BY n DESC, word LIMIT 50""")),

    // ---- grouping sets (beyond rollup/cube: explicit set list) ----
    QueryDef(
      "q65_grouping_sets",
      (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("v_li_gs")
        s.sql(s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
            COALESCE(l_linestatus, 'ALL') AS linestatus,
            COUNT(*) AS n_rows,
            CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE) AS sum_qty
          FROM v_li_gs
          GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""")
      },
      Some(s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
          COALESCE(l_linestatus, 'ALL') AS linestatus,
          COUNT(*) AS n_rows, ${sqlSum("l_quantity")} AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""")),

    // ---- range join: bucket facts into value intervals ----
    QueryDef(
      "q63_range_join",
      (s, dir) => {
        import s.implicits._
        val buckets = Seq(
          ("tiny", 0.0, 10000.0), ("small", 10000.0, 30000.0),
          ("mid", 30000.0, 60000.0), ("large", 60000.0, 1e9))
          .toDF("bucket", "lo", "hi")
        val l = Tables.lineitem(s, dir)
        // non-equi join -> Spark broadcasts the tiny interval table
        l.join(broadcast(buckets),
            col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("total_price"))
      },
      Some(s"""SELECT bucket, COUNT(*) AS n_items, ${sqlSum("l_extendedprice")} AS total_price
        FROM lineitem JOIN (
          SELECT 'tiny' AS bucket, 0.0 AS lo, 10000.0 AS hi UNION ALL
          SELECT 'small', 10000.0, 30000.0 UNION ALL
          SELECT 'mid', 30000.0, 60000.0 UNION ALL
          SELECT 'large', 60000.0, 1e9)
          ON l_extendedprice >= lo AND l_extendedprice < hi
        GROUP BY bucket""")),

    // ---- rename / cast / diagonal union (reference tests/test_dataframes
    // .py:603-605, 642: rename, cast, pl.concat(how="diagonal")) ----
    QueryDef(
      "q62_rename_cast_union",
      (s, dir) => {
        val c = Tables.customer(s, dir)
          .select(col("c_custkey").as("entity_id"), col("c_name"), col("c_acctbal"))
          .withColumnRenamed("c_name", "entity_name")
          .withColumn("acctbal_cents", floor(col("c_acctbal") * lit(100)).cast(LongType))
          .drop("c_acctbal")
          .withColumn("kind", lit("customer"))
        val su = Tables.supplier(s, dir)
          .select((col("s_suppkey") + lit(1000000L)).as("entity_id"),
            col("s_name").as("entity_name"), lit("supplier").as("kind"))
        // diagonal concat: supplier side lacks acctbal_cents -> nulls
        c.unionByName(su, allowMissingColumns = true)
      },
      Some("""SELECT entity_id, entity_name, acctbal_cents, kind FROM (
          SELECT c_custkey AS entity_id, c_name AS entity_name,
            CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS acctbal_cents, 'customer' AS kind
          FROM customer
          UNION ALL BY NAME
          SELECT s_suppkey + 1000000 AS entity_id, s_name AS entity_name, 'supplier' AS kind
          FROM supplier)""")),

    // ---- custom physical operator: bounded-heap top-k per key ----
    // (same semantics and ORACLE as q20's window formulation, executed by
    // graft.plans.{PartialTopKExec,FinalTopKExec} — map-side top-k before
    // the shuffle, no per-partition full sort; rank added by a cheap
    // window over the k x keys-row result)
    QueryDef(
      "q59_topk_custom_operator",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val top = graft.plans.TopK.topKPerKey(li, Seq("l_suppkey"),
          Seq(("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true)), 3)
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        top.withColumn("rn", row_number().over(w).cast(LongType))
          .select(col("l_suppkey"), col("l_orderkey"),
            col("l_linenumber").cast(LongType).as("l_linenumber"),
            col("l_extendedprice"), col("rn"))
      },
      Some("""SELECT l_suppkey, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
          l_extendedprice, rn
        FROM (SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
                CAST(ROW_NUMBER() OVER (PARTITION BY l_suppkey
                  ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS BIGINT) AS rn
              FROM lineitem)
        WHERE rn <= 3"""),
      headline = true),

    // ---- exact percentiles (interpolated; engines share the formula) ----
    QueryDef(
      "q66_percentiles",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.groupBy(col("o_orderstatus"))
          .agg(
            expr("percentile(o_totalprice, 0.5)").as("median_price"),
            expr("percentile(o_totalprice, 0.9)").as("p90_price"),
            count(lit(1)).as("n"))
      },
      Some("""SELECT o_orderstatus,
          quantile_cont(o_totalprice, 0.5) AS median_price,
          quantile_cont(o_totalprice, 0.9) AS p90_price,
          COUNT(*) AS n
        FROM orders GROUP BY o_orderstatus""")),

    // ---- typed Aggregator UDAF (XOR checksum; DuckDB BIT_XOR oracle) ----
    QueryDef(
      "q61_custom_udaf",
      (s, dir) => {
        val xor = udaf(XorChecksum)
        val o = Tables.orders(s, dir)
        o.groupBy(col("o_orderstatus"))
          .agg(xor(col("o_orderkey")).as("key_checksum"), count(lit(1)).as("n"))
      },
      Some("""SELECT o_orderstatus,
          BIT_XOR(o_orderkey * 2654435761) AS key_checksum, COUNT(*) AS n
        FROM orders GROUP BY o_orderstatus""")),

    // ---- salted skew join + two-phase skew-safe aggregation ----
    // 80% of events collapse onto ONE join key (a synthetic hot key — the
    // classic power-law user), then join a per-key dim and aggregate.
    // Salting is result-transparent, so a plain SQL oracle hash-checks it:
    // the salted plan must produce EXACTLY the unsalted answer. Double sums
    // ride the decimal(38,10) determinism route through the two-phase
    // partial/merge (decimal addition is associative, so salted partials
    // reassemble exactly).
    QueryDef(
      "q77_salted_skew_join",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .withColumn("hot_key",
            when(pmod(col("user_id"), lit(10)) < 8, lit(1L)).otherwise(col("user_id")))
        val c = Tables.customer(s, dir)
          .select(col("c_custkey").as("hot_key"), col("c_mktsegment"))
        val joined = graft.ext.Skew.saltedJoin(e, c, Seq("hot_key"), salts = 8)
          .withColumn("value_dec", col("value").cast(DecimalType(38, 10)))
        graft.ext.Skew.saltedAggregate(joined, Seq("c_mktsegment"), salts = 8,
            aggs = Seq(("value_dec", "sum", "sum_dec"), ("event_id", "count", "n")))
          .select(col("c_mktsegment"), col("n"),
            col("sum_dec").cast(DoubleType).as("sum_value"))
          .orderBy(col("c_mktsegment"))
      },
      Some(s"""SELECT c_mktsegment, COUNT(event_id) AS n,
          ${sqlSum("value")} AS sum_value
        FROM (SELECT event_id, value,
                CASE WHEN user_id % 10 < 8 THEN 1 ELSE user_id END AS hot_key
              FROM events) e
          JOIN customer ON hot_key = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
      headline = true),

    // ---- binned range join: point-in-interval ----
    // Attribution windows: every purchase joined to each click of the
    // same user whose 24-hour attribution window contains it. With no
    // equi key, the naive predicate (`p.ts >= c.ts AND p.ts < c.ts +
    // 24h`) plans as a BroadcastNestedLoopJoin — O(clicks × purchases)
    // and unrunnable at 100 TB; RangeJoin.pointInInterval turns it
    // into an EQUI-join on (user, day-bin) + the exact residual, an
    // ordinary shuffled join that AQE can split. (With the user_id key
    // present, as here, a plain hash join also works — the bin key's
    // value is bounding the per-user candidate set; the no-equi-key
    // regime is the bench's nested-loop demo.) The oracle runs the
    // naive predicate in DuckDB — binning must be result-transparent.
    QueryDef(
      "q185_range_join_binned",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            expr("ts div 1000").as("ts_us"), col("value"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id"),
            col("ts_us").as("p_ts"), col("value"))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
            col("ts_us").as("w_start"), (col("ts_us") + 86400000000L).as("w_end"))
        graft.ext.RangeJoin.pointInInterval(purchases, clicks,
            pointCol = "p_ts", startCol = "w_start", endCol = "w_end",
            binWidth = 86400000000L, equiKeys = Seq(("user_id", "c_user")))
          .groupBy(col("click_id"))
          .agg(count(lit(1)).as("n_purch"), min(col("p_ts")).as("first_purchase_us"),
            dsum(col("value")).as("sum_value"))
          .orderBy(col("click_id"))
      },
      Some(s"""WITH ev AS (
          SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000 AS ts_us, value
          FROM events
        )
        SELECT c.event_id AS click_id, COUNT(*) AS n_purch,
          MIN(p.ts_us) AS first_purchase_us, ${sqlSum("p.value")} AS sum_value
        FROM (SELECT * FROM ev WHERE event_type = 'click') c
          JOIN (SELECT * FROM ev WHERE event_type = 'purchase') p
            ON p.user_id = c.user_id
               AND p.ts_us >= c.ts_us AND p.ts_us < c.ts_us + 86400000000
        GROUP BY c.event_id ORDER BY click_id""")),

    // ---- binned range join: interval overlap, deduped by bin ownership ----
    // Concurrent-session detection: pairs of same-user 24-hour click windows that
    // overlap in time. Both sides replicate across bins, so a pair can
    // meet in many bins; the operator emits it only in the bin owning
    // max(start_a, start_b) — dedup by arithmetic, no distinct shuffle.
    // The oracle is the naive overlap self-join: every pair exactly once.
    QueryDef(
      "q186_interval_overlap_join",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"),
            expr("ts div 1000").as("s_us"),
            (expr("ts div 1000") + 86400000000L).as("e_us"))
        val right = e.select(col("event_id").as("b_id"), col("user_id").as("b_user"),
          col("s_us").as("b_s"), col("e_us").as("b_e"))
        graft.ext.RangeJoin.intervalOverlap(e, right,
            leftStart = "s_us", leftEnd = "e_us",
            rightStart = "b_s", rightEnd = "b_e",
            binWidth = 86400000000L, equiKeys = Seq(("user_id", "b_user")))
          .filter(col("event_id") < col("b_id")) // one direction, no self-pairs
          .select(col("user_id"), col("event_id").as("a_id"), col("b_id"),
            (least(col("e_us"), col("b_e"))
              - greatest(col("s_us"), col("b_s"))).as("overlap_us"))
          .orderBy(col("user_id"), col("a_id"), col("b_id"))
      },
      Some("""WITH c AS (
          SELECT event_id, user_id, epoch_ns(ts) // 1000 AS s_us,
            epoch_ns(ts) // 1000 + 86400000000 AS e_us
          FROM events WHERE event_type = 'click'
        )
        SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
          LEAST(a.e_us, b.e_us) - GREATEST(a.s_us, b.s_us) AS overlap_us
        FROM c a JOIN c b
          ON a.user_id = b.user_id AND a.event_id < b.event_id
             AND a.s_us < b.e_us AND b.s_us < a.e_us
        ORDER BY a.user_id, a_id, b_id"""))
  )
}
