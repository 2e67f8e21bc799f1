package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

/** §2.L (round 3) — the typed `Dataset[T]` surface: case-class rows,
  * lambda filters, `groupByKey` + `mapGroups`.
  *
  * Scale notes, stated honestly: typed lambdas are OPAQUE to Catalyst —
  * the filter below does not push down, and `mapGroups` has no partial
  * aggregation (all rows of a group shuffle to one task). That is the
  * inherent cost of the typed API and exactly why the other 100+
  * queries use columns. Where typed aggregation must scale, use an
  * `Aggregator[IN, BUF, OUT]` (see [[graft.functions.GeoMean]]) which
  * DOES map-side combine. This query exists to cover the surface with
  * an oracle, with the group state bounded to O(1) per group
  * (count + decimal sum accumulated exactly, matching the engines'
  * double→DECIMAL(18,2) cast semantics).
  */
object TypedOps {

  case class OrderRow(o_orderkey: Long, o_custkey: Long,
      o_orderstatus: String, o_totalprice: Double)

  val queries: Seq[Q] = Seq(
    Q("ds_typed_agg",
      (s, d) => {
        implicit val rowEnc = Encoders.product[OrderRow]
        implicit val keyEnc = Encoders.STRING
        implicit val outEnc =
          Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.scalaDouble)
        Tables.orders(s, d)
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
          .as[OrderRow]
          .filter(r => r.o_totalprice > 150000.0)
          .groupByKey(_.o_orderstatus)
          .mapGroups { (status, rows) =>
            var n = 0L
            var sum = BigDecimal(0)
            rows.foreach { r =>
              n += 1
              // BigDecimal.decimal == shortest decimal repr of the
              // double — the same value Spark's and DuckDB's
              // double→decimal casts produce for these 2-dp inputs
              sum += BigDecimal.decimal(r.o_totalprice)
                .setScale(2, BigDecimal.RoundingMode.HALF_UP)
            }
            (status, n, sum.toDouble)
          }
          .toDF("o_orderstatus", "n_orders", "sum_price")
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n_orders,
             |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             |FROM orders WHERE o_totalprice > 150000.0
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // joinWith keeps BOTH sides as typed objects (a Dataset of pairs —
    // no column flattening), then one mapGroups computes count + argmax
    // in O(1) state per group under an exact total order (price DESC,
    // orderkey ASC — double compares and long compares, no float
    // accumulation). Same honesty note as ds_typed_agg: the typed
    // lambdas are opaque to Catalyst; the columnar twin of this query
    // is max_by + count with map-side combine.
    Q("ds_typed_joinwith",
      (s, d) => {
        implicit val ordEnc = Encoders.product[OrderRow]
        implicit val custEnc = Encoders.product[CustRow]
        implicit val keyEnc = Encoders.STRING
        implicit val outEnc = Encoders.tuple(Encoders.STRING,
          Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaDouble)
        val orders = Tables.orders(s, d)
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
          .as[OrderRow]
        val custs = Tables.customer(s, d)
          .select("c_custkey", "c_name", "c_mktsegment")
          .as[CustRow]
        orders.joinWith(custs, orders("o_custkey") === custs("c_custkey"))
          .groupByKey(_._2.c_mktsegment)
          .mapGroups { (seg, rows) =>
            var n = 0L
            var bestKey = Long.MaxValue
            var bestPrice = Double.NegativeInfinity
            rows.foreach { case (o, _) =>
              n += 1
              if (o.o_totalprice > bestPrice ||
                (o.o_totalprice == bestPrice && o.o_orderkey < bestKey)) {
                bestPrice = o.o_totalprice; bestKey = o.o_orderkey
              }
            }
            (seg, n, bestKey, bestPrice)
          }
          .toDF("c_mktsegment", "n_orders", "top_orderkey", "top_price")
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, n_orders, top_orderkey, top_price FROM (
             |  SELECT c.c_mktsegment,
             |    COUNT(*) OVER (PARTITION BY c.c_mktsegment) AS n_orders,
             |    o.o_orderkey AS top_orderkey, o.o_totalprice AS top_price,
             |    ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
             |      ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
             |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey) t
             |WHERE rn = 1 ORDER BY c_mktsegment""".stripMargin)),

    // reduceGroups — the third typed-aggregation entry point (after
    // mapGroups and Aggregator): a commutative+associative object
    // merge, which Spark DOES partially aggregate on the map side
    // (ReduceAggregator under the hood), unlike mapGroups. The reduce
    // keeps the priciest order per priority with the orderkey as the
    // deterministic tie-break; comparisons only, no float accumulation,
    // so the lambda is exactly the SQL argmax twin.
    Q("ds_typed_reduce",
      (s, d) => {
        implicit val rowEnc = Encoders.product[OrderRow]
        implicit val keyEnc = Encoders.STRING
        implicit val tupEnc = Encoders.tuple(Encoders.STRING,
          Encoders.product[OrderRow])
        implicit val outEnc = Encoders.tuple(Encoders.STRING,
          Encoders.scalaLong, Encoders.scalaDouble)
        Tables.orders(s, d)
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
          .as[OrderRow]
          .groupByKey(_.o_orderstatus)
          .reduceGroups { (a: OrderRow, b: OrderRow) =>
            if (a.o_totalprice > b.o_totalprice ||
              (a.o_totalprice == b.o_totalprice &&
                a.o_orderkey < b.o_orderkey)) a else b
          }
          .map { case (status, top) =>
            (status, top.o_orderkey, top.o_totalprice)
          }
          .toDF("o_orderstatus", "top_orderkey", "top_price")
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, top_orderkey, top_price FROM (
             |  SELECT o_orderstatus, o_orderkey AS top_orderkey,
             |    o_totalprice AS top_price,
             |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
             |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders) t
             |WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin)),

    // cogroup — the fourth typed entry point: both Datasets grouped on
    // the SAME key, one lambda sees the two iterators side by side (the
    // typed twin of a full-outer join + per-key merge, and the shape
    // that expresses per-key reconciliation logic joins can't — here a
    // customer with zero orders still emits a row, and the order stream
    // is folded in O(1) state without materializing the pair fan-out).
    // Same honesty note as the rest of §2.L: cogroup shuffles both
    // sides whole (no partial agg, opaque to Catalyst); the columnar
    // twin is the left join + groupBy the oracle uses. Output bounded
    // to customers with ≥0 orders in BUILDING segment, exact decimal
    // cents folding (the ds_typed_agg precedent).
    Q("ds_typed_cogroup",
      (s, d) => {
        implicit val ordEnc = Encoders.product[OrderRow]
        implicit val custEnc = Encoders.product[CustRow]
        implicit val keyEnc = Encoders.scalaLong
        implicit val outEnc = Encoders.tuple(Encoders.scalaLong,
          Encoders.STRING, Encoders.scalaLong, Encoders.scalaDouble)
        val orders = Tables.orders(s, d)
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
          .as[OrderRow]
          .groupByKey(_.o_custkey)
        val custs = Tables.customer(s, d)
          .select("c_custkey", "c_name", "c_mktsegment")
          .as[CustRow]
          .filter(c => c.c_mktsegment == "BUILDING")
          .groupByKey(_.c_custkey)
        custs.cogroup(orders) { (key, cs, os) =>
          cs.toSeq.headOption.toSeq.map { c =>
            var n = 0L
            var sum = BigDecimal(0)
            os.foreach { o =>
              n += 1
              sum += BigDecimal.decimal(o.o_totalprice)
                .setScale(2, BigDecimal.RoundingMode.HALF_UP)
            }
            (key, c.c_name, n, sum.toDouble)
          }.iterator
        }
          .toDF("c_custkey", "c_name", "n_orders", "total_spend")
          .orderBy("c_custkey")
      },
      Some("""SELECT c.c_custkey, c.c_name,
             |  CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
             |  CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0)
             |    AS DOUBLE) AS total_spend
             |FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
             |WHERE c.c_mktsegment = 'BUILDING'
             |GROUP BY c.c_custkey, c.c_name
             |ORDER BY c.c_custkey""".stripMargin)),

    // flatMapGroups — the variable-arity typed entry point (mapGroups
    // emits exactly one row per key; flatMapGroups emits any number):
    // top-2 orders per status via a bounded 2-slot insertion pass, so
    // group state stays O(1) however large the group — the pattern for
    // typed per-key top-k emission. Exact total order (price DESC,
    // orderkey ASC), comparisons only.
    Q("ds_typed_flatmap",
      (s, d) => {
        implicit val rowEnc = Encoders.product[OrderRow]
        implicit val keyEnc = Encoders.STRING
        implicit val outEnc = Encoders.tuple(Encoders.STRING,
          Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaDouble)
        Tables.orders(s, d)
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
          .as[OrderRow]
          .groupByKey(_.o_orderstatus)
          .flatMapGroups { (status, rows) =>
            var b1: OrderRow = null; var b2: OrderRow = null
            def better(a: OrderRow, b: OrderRow): Boolean =
              b == null || a.o_totalprice > b.o_totalprice ||
                (a.o_totalprice == b.o_totalprice &&
                  a.o_orderkey < b.o_orderkey)
            rows.foreach { r =>
              if (better(r, b1)) { b2 = b1; b1 = r }
              else if (better(r, b2)) b2 = r
            }
            Seq(b1, b2).filter(_ != null).zipWithIndex.map {
              case (r, i) => (status, (i + 1).toLong, r.o_orderkey,
                r.o_totalprice)
            }.iterator
          }
          .toDF("o_orderstatus", "rank", "o_orderkey", "o_totalprice")
          .orderBy("o_orderstatus", "rank")
      },
      Some("""SELECT o_orderstatus, CAST(rn AS BIGINT) AS rank,
             |  o_orderkey, o_totalprice
             |FROM (
             |  SELECT o_orderstatus, o_orderkey, o_totalprice,
             |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
             |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders) t
             |WHERE rn <= 2 ORDER BY o_orderstatus, rank""".stripMargin)),

    // KeyValueGroupedDataset.mapGroups — the imperative per-group
    // escape hatch: one function sees the WHOLE group as an iterator.
    // Teaching entry for its scale contract: mapGroups gets NO partial
    // aggregation (every row shuffles to its group's task), so it is
    // only safe when per-group state is O(1) and group count is the
    // output size — exactly this shape (running count + argmax over a
    // single pass, |segments| output rows). Anything decomposable
    // belongs in a typed Aggregator (ds_typed_agg) or DataFrame agg
    // instead; ties break on the smaller custkey so the imperative
    // fold is order-insensitive (the iterator order is NOT
    // deterministic across runs — an operator relying on it would be
    // nondeterministic, the classic mapGroups bug).
    Q("ds_typed_mapgroups",
      (s, d) => {
        implicit val rowEnc = Encoders.product[CustBal]
        implicit val keyEnc = Encoders.STRING
        implicit val outEnc = Encoders.tuple(Encoders.STRING,
          Encoders.scalaLong, Encoders.scalaDouble, Encoders.STRING)
        Tables.customer(s, d)
          .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
          .as[CustBal]
          .groupByKey(_.c_mktsegment)
          .mapGroups { (seg, it) =>
            var n = 0L
            var best: CustBal = null
            it.foreach { c =>
              n += 1
              if (best == null || c.c_acctbal > best.c_acctbal ||
                (c.c_acctbal == best.c_acctbal &&
                  c.c_custkey < best.c_custkey)) best = c
            }
            (seg, n, best.c_acctbal, best.c_name)
          }
          .toDF("c_mktsegment", "n_customers", "top_acctbal", "top_name")
          .orderBy("c_mktsegment")
      },
      Some("""SELECT t.c_mktsegment, n.n_customers, t.c_acctbal
             |    AS top_acctbal,
             |  t.c_name AS top_name
             |FROM (
             |  SELECT c_mktsegment, c_acctbal, c_name,
             |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
             |      ORDER BY c_acctbal DESC, c_custkey) AS rn
             |  FROM customer) t
             |JOIN (
             |  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT)
             |      AS n_customers
             |  FROM customer GROUP BY 1) n USING (c_mktsegment)
             |WHERE t.rn = 1 ORDER BY t.c_mktsegment""".stripMargin))
  )

  case class CustRow(c_custkey: Long, c_name: String, c_mktsegment: String)

  case class CustBal(c_custkey: Long, c_name: String,
      c_mktsegment: String, c_acctbal: Double)
}
