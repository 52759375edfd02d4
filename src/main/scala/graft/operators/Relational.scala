package graft.operators

import graft.{Q, Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational operator pack — one query per operator family of SURVEY.md §2
  * (filters P1-P9, joins J1-J11, aggregations A1-A9, windows W1-W2, sorts
  * O1-O7, set-ops U1), instantiated over the driver's synthetic tables.
  *
  * Scale notes (100 TB design intent, verified via .explain on local runs):
  *  - dimension tables (region/nation/customer/supplier/part) are broadcast;
  *    fact-fact joins shuffle on their equi-keys and rely on AQE.
  *  - every filter is expressed on base columns so Catalyst pushes it into
  *    the parquet scan (PushedFilters), and projections are explicit so
  *    column pruning reaches ReadSchema.
  *  - every query ends in a deterministic ORDER BY with unique tie-breakers:
  *    the oracle compare is order-sensitive, and at scale a Top-K sort
  *    becomes TakeOrderedAndProject (no global sort materialization).
  *  - money sums are cast to Decimal BEFORE aggregation: exact,
  *    order-independent arithmetic — a parallel double sum is neither.
  */
object Relational {

  private val dec = DecimalType(18, 2)
  private def d(c: Column): Column = c.cast(dec)
  /** Final-output form of an exact decimal aggregate: the sum itself is
    * computed in Decimal (order-independent, exact), then cast to double
    * ONCE for the output column. Rationale: Spark's sum(decimal(18,2))
    * yields decimal(28,2) while DuckDB's yields decimal(38,2) — same
    * values, different arrow dtypes, which a type-sensitive hash compare
    * flags. A double has one canonical representation in every toolchain,
    * and decimal→double is correctly rounded on both engines. */
  private def dsum(c: Column): Column = sum(d(c)).cast("double")

  // ---------------------------------------------------------------- P-family

  /** P1/A4-A7: wide aggregate over the biggest fact table (TPC-H Q1 shape).
    * Ref: ton-index-go/index/crud/crud_transactions.go:25-36 (projection) +
    * balances.go:62-135 (sum aggregation). */
  val q01 = Q("q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty,
      |  cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS sum_base_price,
      |  min(l_quantity) AS min_qty, max(l_extendedprice) AS max_price,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    T.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01 00:00:00").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        min("l_quantity").as("min_qty"),
        max("l_extendedprice").as("max_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** P2: equality filters + explicit projection (crud_transactions.go:76-114). */
  val q02 = Q("q02_filter_eq",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem WHERE l_returnflag = 'R' AND l_linestatus = 'F'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    T.lineitem(s, dir)
      .filter(col("l_returnflag") === "R" && col("l_linestatus") === "F")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** P3: IN-list filter (crud.go:52-73 filterByArray). */
  val q03 = Q("q03_filter_in",
    """SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
      |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    T.orders(s, dir)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select("o_orderkey", "o_custkey", "o_orderpriority")
      .orderBy("o_orderkey")
  }

  /** P4: half-open range windows on time + quantity
    * (crud_transactions.go:56-69 start_lt/end_utime). */
  val q04 = Q("q04_filter_range",
    """SELECT l_orderkey, l_linenumber, cast(l_shipdate as date) AS ship_date,
      |  l_quantity
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_quantity BETWEEN 10 AND 20
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    T.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp")
        && col("l_quantity").between(10, 20))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate").cast("date").as("ship_date"), col("l_quantity"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** P5/F8: null handling + coalesce arithmetic over a left join
    * (crud_jettons.go:102 `balance + coalesce(mintless_amount,0) > 0`). */
  val q05 = Q("q05_null_coalesce",
    """SELECT c_custkey, c_name,
      |  cast(cast(c_acctbal as decimal(18,2)) + coalesce(t.total, 0) as double)
      |    AS combined
      |FROM customer
      |LEFT JOIN (SELECT o_custkey, sum(cast(o_totalprice as decimal(18,2))) AS total
      |           FROM orders GROUP BY o_custkey) t
      |  ON c_custkey = t.o_custkey
      |WHERE cast(c_acctbal as decimal(18,2)) + coalesce(t.total, 0) > 1000
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val totals = T.orders(s, dir).groupBy("o_custkey")
      .agg(sum(d(col("o_totalprice"))).as("total"))
    T.customer(s, dir)
      .join(totals, col("c_custkey") === col("o_custkey"), "left")
      .withColumn("combined_dec", d(col("c_acctbal")) + coalesce(col("total"), lit(0)))
      .filter(col("combined_dec") > 1000)
      .withColumn("combined", col("combined_dec").cast("double"))
      .select("c_custkey", "c_name", "combined")
      .orderBy("c_custkey")
  }

  /** P6: compound OR predicate (crud_transactions.go:125 hash-or-norm). */
  val q06 = Q("q06_compound_or",
    """SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
      |WHERE (o_orderpriority IN ('1-URGENT') OR o_orderstatus = 'P')
      |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    T.orders(s, dir)
      .filter((col("o_orderpriority").isin("1-URGENT") || col("o_orderstatus") === "P")
        && col("o_orderdate") >= lit("1997-01-01 00:00:00").cast("timestamp"))
      .select("o_orderkey", "o_orderstatus", "o_orderpriority")
      .orderBy("o_orderkey")
  }

  /** P7: conjunctive opcode+direction-style filter (crud_transactions.go:140). */
  val q07 = Q("q07_filter_conj",
    """SELECT event_id, user_id, value FROM events
      |WHERE event_type = 'purchase' AND value >= 100
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    T.events(s, dir)
      .filter(col("event_type") === "purchase" && col("value") >= 100)
      .select("event_id", "user_id", "value")
      .orderBy("event_id")
  }

  /** P8: hierarchical action-type filter with ancestor suppression
    * (crud_actions_v2.go:435-437: `type = ANY(types) AND NOT
    * (ancestor_type && types)`). Hierarchy modeled on event_type:
    * view -> click -> purchase and signup -> error; client understands
    * {click,view,error,signup} so click/error are suppressed (an
    * understood ancestor exists) and view/signup survive. Spark side uses
    * the real array machinery (ancestor_type array + arrays_overlap). */
  val q08 = Q("q08_hier_type_filter",
    """SELECT event_id, event_type FROM events
      |WHERE event_type IN ('view', 'signup')
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val understood = Seq("click", "view", "error", "signup")
    val withAnc = T.events(s, dir).withColumn("ancestor_type",
      when(col("event_type") === "click", array(lit("view")))
        .when(col("event_type") === "purchase", array(lit("click"), lit("view")))
        .when(col("event_type") === "error", array(lit("signup")))
        .otherwise(array().cast(ArrayType(StringType))))
    val types = array(understood.map(lit): _*)
    withAnc
      .filter(col("event_type").isin(understood: _*)
        && !arrays_overlap(col("ancestor_type"), types))
      .select("event_id", "event_type")
      .orderBy("event_id")
  }

  // ---------------------------------------------------------------- J-family

  /** J1: composite-key equi-join (messages⋈transactions on (tx_hash,tx_lt)):
    * rows matching their group maximum via a two-column join. */
  val q10 = Q("q10_join_two_key",
    """SELECT e.user_id, e.event_type, e.event_id, e.value
      |FROM events e
      |JOIN (SELECT user_id, event_type, max(value) AS mv
      |      FROM events GROUP BY user_id, event_type) m
      |  ON e.user_id = m.user_id AND e.event_type = m.event_type
      |WHERE e.value = m.mv
      |ORDER BY e.user_id, e.event_type, e.event_id""".stripMargin) { (s, dir) =>
    val ev = T.events(s, dir)
    val m = ev.groupBy("user_id", "event_type").agg(max("value").as("mv"))
    ev.join(m, Seq("user_id", "event_type"))
      .filter(col("value") === col("mv"))
      .select("user_id", "event_type", "event_id", "value")
      .orderBy("user_id", "event_type", "event_id")
  }

  /** J2: self-join adjacency (crud_transactions.go:270-273: M1⋈M2 on
    * msg_hash with direction mismatch). */
  val q11 = Q("q11_self_join_adjacent",
    """SELECT a.l_orderkey, a.l_linenumber AS ln_a, b.l_linenumber AS ln_b,
      |  b.l_partkey AS partner_part
      |FROM lineitem a JOIN lineitem b
      |  ON a.l_orderkey = b.l_orderkey AND a.l_linenumber <> b.l_linenumber
      |WHERE a.l_quantity >= 45
      |ORDER BY a.l_orderkey, ln_a, ln_b, partner_part""".stripMargin) { (s, dir) =>
    val li = T.lineitem(s, dir)
    val a = li.filter(col("l_quantity") >= 45)
      .select(col("l_orderkey"), col("l_linenumber").as("ln_a"))
    val b = li.select(col("l_orderkey"), col("l_linenumber").as("ln_b"),
      col("l_partkey").as("partner_part"))
    a.join(b, Seq("l_orderkey"))
      .filter(col("ln_a") =!= col("ln_b"))
      .select("l_orderkey", "ln_a", "ln_b", "partner_part")
      .orderBy("l_orderkey", "ln_a", "ln_b", "partner_part")
  }

  /** J3+J8+J7: multiway star join with the same dimension joined twice on
    * different keys (nation via customer AND via supplier — the
    * message_contents-double-join shape, crud_transactions.go:229-234). All
    * dimensions broadcast; only lineitem⋈orders shuffles. */
  val q12 = Q("q12_multiway_star",
    """SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
      |  count(*) AS n_lines,
      |  cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS revenue
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |GROUP BY n1.n_name, n2.n_name
      |ORDER BY cust_nation, supp_nation""".stripMargin) { (s, dir) =>
    val n1 = T.nation(s, dir).select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val n2 = T.nation(s, dir).select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    T.lineitem(s, dir)
      .join(T.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(T.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(T.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("c_nationkey") === col("c_nk"))
      .join(broadcast(n2), col("s_nationkey") === col("s_nk"))
      .groupBy("cust_nation", "supp_nation")
      .agg(count(lit(1)).as("n_lines"), dsum(col("l_extendedprice")).as("revenue"))
      .orderBy("cust_nation", "supp_nation")
  }

  /** J4: semi-join / EXISTS (crud_traces.go:59-98 — deliberately a
    * left_semi so the probe side never duplicates rows). */
  val q13 = Q("q13_semi_join",
    """SELECT o_orderkey, o_totalprice FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val hits = T.lineitem(s, dir).filter(col("l_quantity") >= 49)
      .select(col("l_orderkey").as("o_orderkey"))
    T.orders(s, dir)
      .join(hits, Seq("o_orderkey"), "left_semi")
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** J4-complement: anti-join / NOT EXISTS. */
  val q14 = Q("q14_anti_join",
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val p = T.orders(s, dir).filter(col("o_orderstatus") === "P")
      .select(col("o_custkey").as("c_custkey"))
    T.customer(s, dir)
      .join(p, Seq("c_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** J5: fact⋈bridge⋈fact (action_accounts shape, crud_actions.go:123-125). */
  val q15 = Q("q15_bridge_join",
    """SELECT s_suppkey, s_name, count(*) AS n_lines,
      |  count(DISTINCT l_orderkey) AS n_orders,
      |  cast(sum(cast(l_quantity as decimal(18,2))) as double) AS total_qty
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderstatus = 'F'
      |GROUP BY s_suppkey, s_name
      |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
    T.lineitem(s, dir)
      .join(broadcast(T.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(T.orders(s, dir).filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("s_suppkey", "s_name")
      .agg(count(lit(1)).as("n_lines"),
        countDistinct("l_orderkey").as("n_orders"),
        dsum(col("l_quantity")).as("total_qty"))
      .orderBy("s_suppkey")
  }

  /** J6: array-membership join (`A.tx_hashes @> array[T.hash]`,
    * crud_actions.go:137): build the array column, explode, equi-join —
    * the scalable rewrite of a BNLJ array_contains join. */
  val q16 = Q("q16_array_membership_join",
    """SELECT DISTINCT l_orderkey AS o_orderkey, p_partkey
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_size = 50
      |ORDER BY o_orderkey, p_partkey""".stripMargin) { (s, dir) =>
    val arrays = T.lineitem(s, dir).groupBy("l_orderkey")
      .agg(collect_set(col("l_partkey")).as("part_keys"))
    val exploded = arrays
      .select(col("l_orderkey").as("o_orderkey"),
        explode(col("part_keys")).as("p_partkey"))
    exploded
      .join(broadcast(T.part(s, dir).filter(col("p_size") === 50)
        .select("p_partkey")), Seq("p_partkey"))
      .select("o_orderkey", "p_partkey").distinct()
      .orderBy("o_orderkey", "p_partkey")
  }

  /** J8: dimension left-joins, broadcast (crud_nft.go:62-64). */
  val q18 = Q("q18_dim_left_join",
    """SELECT l_orderkey, l_linenumber, p_brand, s_name
      |FROM lineitem
      |LEFT JOIN part ON l_partkey = p_partkey
      |LEFT JOIN supplier ON l_suppkey = s_suppkey
      |WHERE p_brand = 'Brand#1'
      |ORDER BY l_orderkey, l_linenumber, s_name""".stripMargin) { (s, dir) =>
    T.lineitem(s, dir)
      .join(broadcast(T.part(s, dir)), col("l_partkey") === col("p_partkey"), "left")
      .join(broadcast(T.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"), "left")
      .filter(col("p_brand") === "Brand#1")
      .select("l_orderkey", "l_linenumber", "p_brand", "s_name")
      .orderBy("l_orderkey", "l_linenumber", "s_name")
  }

  // ---------------------------------------------------------------- A-family

  /** A1/A2: projection-dedup (messages dedup across in/out copies,
    * crud_messages.go:29). */
  val q20 = Q("q20_dedup_distinct",
    """SELECT DISTINCT user_id, event_type FROM events
      |ORDER BY user_id, event_type""".stripMargin) { (s, dir) =>
    T.events(s, dir).select("user_id", "event_type").distinct()
      .orderBy("user_id", "event_type")
  }

  /** A3: top-K (top accounts by balance, crud_accounts.go:223) —
    * TakeOrderedAndProject, no global sort. */
  val q21 = Q("q21_topk",
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |ORDER BY c_acctbal DESC, c_custkey LIMIT 10""".stripMargin) { (s, dir) =>
    T.customer(s, dir).select("c_custkey", "c_name", "c_acctbal")
      .orderBy(col("c_acctbal").desc, col("c_custkey")).limit(10)
  }

  /** A4/A5/A6: per-group count + min/max fold (trace meta nodes/edges/
    * start_lt/end_lt, TraceAssembler.cpp:329-391). */
  val q22 = Q("q22_group_minmax",
    """SELECT user_id, count(*) AS n_events, min(event_id) AS first_id,
      |  max(event_id) AS last_id, cast(min(ts) as date) AS first_day,
      |  cast(max(ts) as date) AS last_day
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
    // ts is long nanos (nanosAsLong); `div` keeps integer precision —
    // a double division would corrupt epoch-nano magnitudes (> 2^53).
    T.events(s, dir).groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), min("event_id").as("first_id"),
        max("event_id").as("last_id"),
        to_date(timestamp_micros(expr("min(ts) div 1000"))).as("first_day"),
        to_date(timestamp_micros(expr("max(ts) div 1000"))).as("last_day"))
      .orderBy("user_id")
  }

  /** A7/A8: map-merge aggregation (BalanceChanges, balances.go:62-135):
    * per-(account,asset) exact sums — exploded deltas + groupBy, the
    * scalable rewrite of the reference's in-memory map merge. */
  val q23 = Q("q23_map_merge_agg",
    """SELECT user_id, event_type,
      |  cast(sum(cast(value as decimal(18,2))) as double) AS total,
      |  count(*) AS n
      |FROM events GROUP BY user_id, event_type
      |ORDER BY user_id, event_type""".stripMargin) { (s, dir) =>
    T.events(s, dir).groupBy("user_id", "event_type")
      .agg(dsum(col("value")).as("total"), count(lit(1)).as("n"))
      .orderBy("user_id", "event_type")
  }

  /** A9/W2/S4: latest-row-per-key upsert semantics
    * (InsertManagerPostgres.cpp:2423-2431 ON CONFLICT keep-max-lt):
    * max_by over a deterministic (ts,event_id) rank. */
  val q24 = Q("q24_latest_per_key",
    """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
      |FROM (SELECT user_id, event_id, event_type,
      |        row_number() OVER (PARTITION BY user_id
      |          ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events) t
      |WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id")
      .orderBy(expr("ts div 1000").desc, col("event_id").desc)
    T.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"))
      .orderBy("user_id")
  }

  /** W1: DISTINCT ON first-per-group by rank (shortest DNS domain per
    * wallet, crud.go:297-300). */
  val q25 = Q("q25_distinct_on_shortest",
    """SELECT c_mktsegment, c_custkey, c_name
      |FROM (SELECT c_mktsegment, c_custkey, c_name,
      |        row_number() OVER (PARTITION BY c_mktsegment
      |          ORDER BY length(c_name), c_name, c_custkey) AS rn
      |      FROM customer) t
      |WHERE rn = 1 ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(length(col("c_name")), col("c_name"), col("c_custkey"))
    T.customer(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("c_mktsegment", "c_custkey", "c_name")
      .orderBy("c_mktsegment")
  }

  /** W2 two-key variant: latest state per (account, token) pair
    * (jetton_wallets upsert shape). */
  val q26 = Q("q26_latest_two_key",
    """SELECT user_id, event_type, event_id, value
      |FROM (SELECT user_id, event_type, event_id, value,
      |        row_number() OVER (PARTITION BY user_id, event_type
      |          ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events) t
      |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(expr("ts div 1000").desc, col("event_id").desc)
    T.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id", "value")
      .orderBy("user_id", "event_type")
  }

  // ---------------------------------------------------------------- O-family

  /** O1/O3: parametric sort + limit/offset pagination (crud.go:20-50). */
  val q27 = Q("q27_sort_limit_offset",
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 50 OFFSET 20""".stripMargin) { (s, dir) =>
    T.orders(s, dir).select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .offset(20).limit(50)
  }

  /** O2/O4: deterministic multi-key sort contract
    * (crud_actions.go:184-198 4-key tie-breaking). */
  val q28 = Q("q28_four_key_sort",
    """SELECT cast(l_shipdate as date) AS ship_date, l_orderkey, l_linenumber,
      |  l_partkey
      |FROM lineitem WHERE l_returnflag = 'A'
      |ORDER BY ship_date, l_orderkey, l_linenumber, l_partkey
      |LIMIT 500""".stripMargin) { (s, dir) =>
    T.lineitem(s, dir).filter(col("l_returnflag") === "A")
      .select(col("l_shipdate").cast("date").as("ship_date"),
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
      .orderBy("ship_date", "l_orderkey", "l_linenumber", "l_partkey")
      .limit(500)
  }

  // ---------------------------------------------------------------- U-family

  /** U1: tagged UNION ALL (metadata 3-way union, crud.go:101-105). */
  val q29 = Q("q29_union_tagged",
    """SELECT 'customer' AS kind, c_custkey AS id, c_name AS name FROM customer
      |UNION ALL
      |SELECT 'supplier' AS kind, s_suppkey AS id, s_name AS name FROM supplier
      |ORDER BY kind, id""".stripMargin) { (s, dir) =>
    val c = T.customer(s, dir).select(lit("customer").as("kind"),
      col("c_custkey").as("id"), col("c_name").as("name"))
    val su = T.supplier(s, dir).select(lit("supplier").as("kind"),
      col("s_suppkey").as("id"), col("s_name").as("name"))
    c.unionByName(su).orderBy("kind", "id")
  }

  /** J11/O5: nested hydration — parent rows with deterministically ordered
    * child aggregates (txs-with-sorted-out-msgs, crud_transactions.go:191-261),
    * flattened to an order-stable string for the oracle compare. */
  val q30 = Q("q30_nested_hydrate",
    """SELECT o_orderkey, count(*) AS n_lines,
      |  string_agg(cast(l_linenumber as varchar), ',' ORDER BY l_linenumber) AS line_numbers,
      |  cast(sum(cast(l_quantity as decimal(18,2))) as double) AS total_qty
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    T.orders(s, dir)
      .join(T.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n_lines"),
        array_join(transform(sort_array(collect_list(col("l_linenumber"))),
          x => x.cast("string")), ",").as("line_numbers"),
        dsum(col("l_quantity")).as("total_qty"))
      .orderBy("o_orderkey")
  }

  val all: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q10, q11,
    q12, q13, q14, q15, q16, q18, q20, q21, q22, q23, q24, q25, q26, q27,
    q28, q29, q30)
}
