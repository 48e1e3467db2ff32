"""Four classic decision-support plan shapes the registry did not yet
cover, each as a streaming Ray Data pipeline with exact integer
arithmetic (cents / integral quantities) so the DuckDB twin is
bit-equal:

- small_qty_revenue (TPC-H Q17 shape): correlated per-group average
  join-back — per-part avg quantity computed once, joined back to the
  fact table, rows below 0.2x the part average summed globally.
- big_orders (TPC-H Q18 shape): groupby-HAVING winners enriched by a
  two-hop dimension join-back (orders, then customer).
- part_share (TPC-H Q11 shape): global-scalar-dependent HAVING — keep
  groups whose revenue share exceeds 1.5x the mean share; the global
  total is ONE driver scalar, never a shuffle.
- late_suppliers (TPC-H Q21 shape): multi-level EXISTS / NOT-EXISTS
  self-semantics on the fact table — per (order, supplier) lateness,
  per-order distinct/late supplier counts, suppliers who were the
  SOLE late supplier on a multi-supplier order.

Scale shape: per-batch np.add.at partials ahead of every groupby (the
shuffle carries group-bounded rows, never facts); join-backs go
through stages/join.auto_join, which broadcasts only under the 2M-row
cap and otherwise hash-bucket co-partitions; late_suppliers' per-order
logic runs inside ONE orderkey hash-bucket shuffle with segmented
numpy (no per-order Python). Reference parity: the reference has no
SQL engine — these pin the join/aggregate vocabulary of
/root/reference/robosat/tools/{cover,dedupe}.py (groupby, semi/anti
join, join-back enrich) on the TPC-H tables.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from robosat_ray.stages.join import auto_join

N_TPCH_BUCKETS = 64
LATE_DAYS = 80  # shipdate > orderdate + LATE_DAYS days counts as late
US_PER_DAY = 86_400 * 1_000_000
BIG_ORDER_QTY = 250  # Q18 HAVING threshold (sum of integral quantities)


def _cents(x: np.ndarray) -> np.ndarray:
    """floor(x*100+0.5): DuckDB-identical cent quantization."""
    return np.floor(x * 100.0 + 0.5).astype(np.int64)


def _qty_i64(col) -> np.ndarray:
    # quantities are integral doubles; rint matches CAST(... AS BIGINT)
    return np.rint(col.to_numpy()).astype(np.int64)


def _per_part_qty(li_ds):
    """part -> (sum_qty, cnt) via per-batch partials + one groupby."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        pk = b.column("l_partkey").to_numpy()
        q = _qty_i64(b.column("l_quantity"))
        uk, inv = np.unique(pk, return_inverse=True)
        sq = np.zeros(len(uk), dtype=np.int64)
        np.add.at(sq, inv, q)
        cn = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        return pa.table(
            {"l_partkey": pa.array(uk), "sq": pa.array(sq), "cn": pa.array(cn)}
        )

    return (
        li_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("sq", alias_name="sum_qty"), Sum("cn", alias_name="cnt"))
    )


def small_qty_revenue(li_ds) -> pd.DataFrame:
    """Q17 shape: revenue cents of lineitems with quantity below 0.2x
    their part's average quantity (5*q*cnt < sum_qty, exact integers).
    Returns one row {total_rev_cents, n_items}."""
    per_part = _per_part_qty(li_ds)
    joined = auto_join(li_ds, per_part, on="l_partkey")

    def keep(b: pa.Table) -> pa.Table:
        q = _qty_i64(b.column("l_quantity"))
        m = 5 * q * b.column("cnt").to_numpy() < b.column("sum_qty").to_numpy()
        cents = _cents(b.column("l_extendedprice").to_numpy()[m])
        return pa.table(
            {
                "cents": pa.array([int(cents.sum())], type=pa.int64()),
                "kept": pa.array([int(m.sum())], type=pa.int64()),
            }
        )

    agg = joined.map_batches(keep, batch_format="pyarrow").sum(["cents", "kept"])
    return pd.DataFrame(
        {
            "total_rev_cents": np.array([agg["sum(cents)"]], dtype=np.int64),
            "n_items": np.array([agg["sum(kept)"]], dtype=np.int64),
        }
    )


def big_orders(li_ds, orders_ds, cust_ds, threshold: int = BIG_ORDER_QTY):
    """Q18 shape: orders whose total quantity exceeds `threshold`,
    enriched with order date/price and customer name."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        ok = b.column("l_orderkey").to_numpy()
        q = _qty_i64(b.column("l_quantity"))
        uk, inv = np.unique(ok, return_inverse=True)
        sq = np.zeros(len(uk), dtype=np.int64)
        np.add.at(sq, inv, q)
        return pa.table({"o_orderkey": pa.array(uk), "sq": pa.array(sq)})

    winners = (
        li_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderkey")
        .aggregate(Sum("sq", alias_name="sum_qty"))
        .filter(expr=f"sum_qty > {int(threshold)}")
    )

    def order_cols(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "o_custkey": b.column("o_custkey"),
                "o_orderdate_us": b.column("o_orderdate").cast(pa.int64()),
                "o_totalprice_cents": pa.array(
                    _cents(b.column("o_totalprice").to_numpy())
                ),
            }
        )

    enriched = auto_join(
        orders_ds.map_batches(order_cols, batch_format="pyarrow"),
        winners,
        on="o_orderkey",
    )

    def cust_cols(b: pa.Table) -> pa.Table:
        return pa.table(
            {"o_custkey": b.column("c_custkey"), "c_name": b.column("c_name")}
        )

    out = auto_join(
        enriched,
        cust_ds.map_batches(cust_cols, batch_format="pyarrow"),
        on="o_custkey",
    )
    return out.select_columns(
        [
            "o_orderkey",
            "o_custkey",
            "c_name",
            "o_orderdate_us",
            "o_totalprice_cents",
            "sum_qty",
        ]
    )


def part_share(li_ds):
    """Q11 shape: parts whose discounted-revenue share exceeds 1.5x the
    mean share (2*rev*n_parts > 3*total, exact integers). Emits
    (l_partkey, rev_cents, share_bp) with share_bp = rev*10000//total."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        pk = b.column("l_partkey").to_numpy()
        rev = b.column("l_extendedprice").to_numpy() * (
            1.0 - b.column("l_discount").to_numpy()
        )
        cents = _cents(rev)
        uk, inv = np.unique(pk, return_inverse=True)
        rc = np.zeros(len(uk), dtype=np.int64)
        np.add.at(rc, inv, cents)
        return pa.table({"l_partkey": pa.array(uk), "rc": pa.array(rc)})

    per_part = (
        li_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("rc", alias_name="rev_cents"))
        .materialize()  # group-bounded; reused for total + count + filter
    )
    total = int(per_part.sum("rev_cents"))
    n_parts = int(per_part.count())

    def finish(b: pa.Table) -> pa.Table:
        rc = b.column("rev_cents").to_numpy()
        m = 2 * rc * n_parts > 3 * total
        return pa.table(
            {
                "l_partkey": b.column("l_partkey").filter(pa.array(m)),
                "rev_cents": pa.array(rc[m]),
                "share_bp": pa.array(rc[m] * 10_000 // total),
            }
        )

    return per_part.map_batches(finish, batch_format="pyarrow")


def late_suppliers(li_ds, orders_ds, supp_ds):
    """Q21 shape: per supplier, the number of multi-supplier orders on
    which that supplier was the ONLY one to ship late (shipdate >
    orderdate + LATE_DAYS). Emits (s_suppkey, s_name, numwait)."""
    from ray.data.aggregate import Sum

    from robosat_ray.functions.hashing import hash_bucket

    def li_cols(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "l_suppkey": b.column("l_suppkey"),
                "ship_us": b.column("l_shipdate").cast(pa.int64()),
            }
        )

    def ord_cols(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": b.column("o_orderkey"),
                "odate_us": b.column("o_orderdate").cast(pa.int64()),
            }
        )

    joined = auto_join(
        li_ds.map_batches(li_cols, batch_format="pyarrow"),
        orders_ds.map_batches(ord_cols, batch_format="pyarrow"),
        on="l_orderkey",
    )

    def tag(b: pa.Table) -> pa.Table:
        ok = b.column("l_orderkey").to_numpy()
        late = (
            b.column("ship_us").to_numpy()
            > b.column("odate_us").to_numpy() + LATE_DAYS * US_PER_DAY
        ).astype(np.int64)
        return pa.table(
            {
                "tbucket": pa.array(hash_bucket(ok, N_TPCH_BUCKETS)),
                "ok": pa.array(ok),
                "sk": b.column("l_suppkey"),
                "late": pa.array(late),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ok = g["ok"].to_numpy(np.int64)
        sk = g["sk"].to_numpy(np.int64)
        late = g["late"].to_numpy(np.int64)
        order = np.lexsort((sk, ok))
        ok, sk, late = ok[order], sk[order], late[order]
        # run starts of distinct (ok, sk) pairs
        new_pair = np.ones(len(ok), dtype=bool)
        new_pair[1:] = (ok[1:] != ok[:-1]) | (sk[1:] != sk[:-1])
        pstart = np.flatnonzero(new_pair)
        p_ok = ok[pstart]
        p_sk = sk[pstart]
        p_late = np.maximum.reduceat(late, pstart) if len(pstart) else late[:0]
        # per-order distinct-supplier and late-supplier counts
        new_ord = np.ones(len(p_ok), dtype=bool)
        new_ord[1:] = p_ok[1:] != p_ok[:-1]
        oid = np.cumsum(new_ord) - 1
        n_ord = int(oid[-1]) + 1 if len(oid) else 0
        n_supp = np.bincount(oid, minlength=n_ord)
        n_late = np.zeros(n_ord, dtype=np.int64)
        np.add.at(n_late, oid, p_late)
        qual = (p_late == 1) & (n_supp[oid] >= 2) & (n_late[oid] == 1)
        qsk = p_sk[qual]
        uk, inv = np.unique(qsk, return_inverse=True)
        cnt = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        return pd.DataFrame({"s_suppkey": uk, "nw": cnt})

    waits = (
        joined.map_batches(tag, batch_format="pyarrow")
        .groupby("tbucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("s_suppkey")
        .aggregate(Sum("nw", alias_name="numwait"))
    )
    out = auto_join(
        waits,
        supp_ds.select_columns(["s_suppkey", "s_name"]),
        on="s_suppkey",
    )
    return out.select_columns(["s_suppkey", "s_name", "numwait"])


Q4_LATE_DAYS = 60


def priority_counts(li_ds, orders_ds):
    """TPC-H Q4 shape: per order priority, the number of orders with
    at least one lineitem shipped more than Q4_LATE_DAYS after the
    order date — the EXISTS semi-join aggregate.

    Scale shape: per-batch (orderkey -> max shipdate) combiners, ONE
    orderkey co-partition join against orders, then ONE orderkey
    hash-bucket shuffle whose per-bucket finish dedupes orders
    (any-late across partial rows) and emits priority-bounded counts.
    No multi-million-group Ray aggregate anywhere (a 3M-group
    groupby.aggregate measured ~10x slower than this plan)."""
    from ray.data.aggregate import Sum

    from robosat_ray.functions.hashing import hash_bucket

    def li_partial(b: pa.Table) -> pa.Table:
        ok = b.column("l_orderkey").to_numpy()
        ts = b.column("l_shipdate").cast(pa.int64()).to_numpy()
        uk, inv = np.unique(ok, return_inverse=True)
        mx = np.full(len(uk), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(mx, inv, ts)
        return pa.table({"o_orderkey": pa.array(uk), "mx": pa.array(mx)})

    def ord_cols(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "o_orderpriority": b.column("o_orderpriority"),
                "odate_us": b.column("o_orderdate").cast(pa.int64()),
            }
        )

    j = auto_join(
        li_ds.map_batches(li_partial, batch_format="pyarrow"),
        orders_ds.map_batches(ord_cols, batch_format="pyarrow"),
        on="o_orderkey",
    )

    def tag(b: pa.Table) -> pa.Table:
        ok = b.column("o_orderkey").to_numpy()
        late = (
            b.column("mx").to_numpy()
            > b.column("odate_us").to_numpy() + Q4_LATE_DAYS * US_PER_DAY
        ).astype(np.int64)
        return pa.table(
            {
                "qbucket": pa.array(hash_bucket(ok, N_TPCH_BUCKETS)),
                "ok": pa.array(ok),
                "pr": b.column("o_orderpriority"),
                "late": pa.array(late),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ok = g["ok"].to_numpy(np.int64)
        late = g["late"].to_numpy(np.int64)
        pr = g["pr"].to_numpy(object)
        order = np.argsort(ok, kind="stable")
        ok, late, pr = ok[order], late[order], pr[order]
        new = np.ones(len(ok), dtype=bool)
        new[1:] = ok[1:] != ok[:-1]
        oid = np.cumsum(new) - 1
        n_ord = int(oid[-1]) + 1 if len(oid) else 0
        any_late = np.zeros(n_ord, dtype=np.int64)
        np.maximum.at(any_late, oid, late)
        opr = pr[new]
        m = any_late == 1
        import pandas as _pd

        vc = _pd.Series(opr[m]).value_counts()
        return pd.DataFrame(
            {"o_orderpriority": vc.index.to_numpy(object),
             "c": vc.to_numpy(np.int64)}
        )

    return (
        j.map_batches(tag, batch_format="pyarrow")
        .groupby("qbucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("o_orderpriority")
        .aggregate(Sum("c", alias_name="n_orders"))
    )
