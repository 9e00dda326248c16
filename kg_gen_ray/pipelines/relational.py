"""Relational pipelines over the TPC-H-style tables — the generic
query-engine operator set (filter pushdown, partial aggregation, hash join,
broadcast dimension join, top-k enrich) exercised at the largest testdata
row counts (lineitem).

These are not kg-gen operators; they demonstrate that the engine's building
blocks (column-pruned reads, per-batch combiners ahead of groupby shuffles,
broadcast small sides, sort+limit top-k) compose into classic analytics
shapes. Sums are emitted as integer cents so DuckDB oracles hash-match
despite float summation order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum

# module-level (pickle-by-value compatibility): worker-side UDF bodies
# must not lazily import kg_gen_ray
from kg_gen_ray.functions.sessions import _arrow_group_key
from kg_gen_ray.stages.common import dict_lookup, dual_limit, in_set_mask


def _read(sf_dir: str, table: str, columns: list) -> "ray.data.Dataset":
    from kg_gen_ray.stages.common import size_aware_read_blocks
    path = f"{sf_dir}/{table}.parquet"
    return ray.data.read_parquet(
        path, columns=columns,
        override_num_blocks=size_aware_read_blocks(path))


def _half_away(v):
    """Round half AWAY from zero (DuckDB round() semantics). np.rint /
    pc.round default to half-to-even, which diverges from the oracle on
    exact .5 values (12.5 cents -> 12 vs DuckDB's 13)."""
    import numpy as np
    return np.trunc(v + np.copysign(0.5, v))


def pricing_summary(sf_dir: str, cutoff: str = "1998-09-02"
                    ) -> "ray.data.Dataset":
    """TPC-H Q1 shape: shipdate filter -> per-batch partial sums ->
    one small groupby. Output sums in integer cents."""
    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_shipdate"])
    cutoff_us = int(np.datetime64(cutoff, "us").astype(np.int64))

    def partial(t: pa.Table) -> pa.Table:
        ship = pc.cast(t["l_shipdate"].combine_chunks(), pa.timestamp("us"))
        mask = pc.less_equal(ship, pa.scalar(cutoff_us,
                                             pa.timestamp("us")))
        t = t.filter(mask)
        # null measures contribute 0 to their sum (SQL SUM skips NULL)
        # while the row still counts toward count_order (COUNT(*)); a
        # NaN would otherwise astype to INT64_MIN garbage
        price = np.nan_to_num(
            t["l_extendedprice"].to_numpy(zero_copy_only=False), nan=0.0)
        disc = np.nan_to_num(
            t["l_discount"].to_numpy(zero_copy_only=False), nan=0.0)
        qty = np.nan_to_num(
            t["l_quantity"].to_numpy(zero_copy_only=False), nan=0.0)
        # the PRODUCT term is NULL (and skipped by SQL SUM) when EITHER
        # factor is NULL — zeroing each factor alone would add the full
        # undiscounted price when only l_discount is missing
        disc_valid = pc.and_(
            pc.is_valid(t["l_extendedprice"].combine_chunks()),
            pc.is_valid(t["l_discount"].combine_chunks()),
        ).to_numpy(zero_copy_only=False)
        # convert to integer units PER ROW (2-decimal money -> cents is
        # exact; disc product -> 1e-4 units), then integer sums: a
        # round-at-the-end float sum diverges from the oracle once the
        # totals outgrow float64's 1e-16 relative precision
        tmp = pa.table({
            # null group keys exchange on the null-free surrogate (Ray's
            # sort shuffle cannot order None) — SQL GROUP BY keeps them
            "__g1": _arrow_group_key(t["l_returnflag"]),
            "__g2": _arrow_group_key(t["l_linestatus"]),
            "qty": pa.array(_half_away(qty * 100.0).astype(np.int64)),
            "base": pa.array(_half_away(price * 100.0).astype(np.int64)),
            "disc_price": pa.array(
                (_half_away(price * (1.0 - disc) * 10000.0)
                 * disc_valid).astype(np.int64)),
        })
        agg = tmp.group_by(["__g1", "__g2"]).aggregate(
            [("qty", "sum"), ("base", "sum"), ("disc_price", "sum"),
             ([], "count_all")])
        return agg.rename_columns(["__g1", "__g2",
                                   "qty", "base", "disc_price", "n"])

    agg = (li.map_batches(partial, batch_format="pyarrow")
           .groupby(["__g1", "__g2"])
           .aggregate(Sum("qty", alias_name="sum_qty_cents"),
                      Sum("base", alias_name="sum_base_cents"),
                      Sum("disc_price", alias_name="sum_disc_e4"),
                      Sum("n", alias_name="count_order")))

    def _ungk(col) -> pa.Array:
        s = pc.cast(col, pa.string())
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        return pc.if_else(pc.equal(s, pa.scalar("n")),
                          pa.scalar(None, pa.string()),
                          pc.utf8_slice_codeunits(s, 2, 1 << 30))

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": _ungk(t["__g1"]),
            "l_linestatus": _ungk(t["__g2"]),
            "sum_qty_cents": pc.cast(t["sum_qty_cents"], pa.int64()),
            "sum_base_cents": pc.cast(t["sum_base_cents"], pa.int64()),
            "sum_disc_e4": pc.cast(t["sum_disc_e4"], pa.int64()),
            "count_order": pc.cast(t["count_order"], pa.int64()),
        })

    return agg.map_batches(project, batch_format="pyarrow")


def revenue_by_region(sf_dir: str,
                      broadcast_limit: int = 128 * 1024 * 1024
                      ) -> "ray.data.Dataset":
    """orders ⋈ customer ⋈ nation ⋈ region -> revenue per region in cents.

    Adaptive join strategy (the same size-dual as the alias rewrite): the
    customer side is broadcast as a dict when it fits, hash-joined when it
    doesn't; nation/region are always broadcast (constant-size dims)."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey"]).materialize()

    # tiny dims: nation/region fit on the driver, broadcast once
    nation = {r["n_nationkey"]: r["n_regionkey"]
              for r in _read(sf_dir, "nation",
                             ["n_nationkey", "n_regionkey"]).take_all()}
    region = {r["r_regionkey"]: r["r_name"]
              for r in _read(sf_dir, "region",
                             ["r_regionkey", "r_name"]).take_all()}
    dim = ray.put((nation, region))

    if (cust.size_bytes() or 0) <= dual_limit(broadcast_limit):
        cmap = {}
        for b in cust.iter_batches(batch_format="pyarrow", batch_size=None):
            cmap.update(zip(b["c_custkey"].to_pylist(),
                            b["c_nationkey"].to_pylist()))
        cref = ray.put(cmap)

        def attach_nation(t: pa.Table, cref=cref) -> pa.Table:
            m = ray.get(cref)
            nk = dict_lookup(t["o_custkey"], m, out_type=pa.int64())
            return pa.table({
                "c_nationkey": nk,
                "o_totalprice": t["o_totalprice"],
            }).filter(pc.is_valid(nk))

        joined = orders.map_batches(attach_nation, batch_format="pyarrow")
    else:
        n_parts = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
        joined = orders.join(
            cust.map_batches(lambda t: t.rename_columns(
                ["o_custkey", "c_nationkey"]), batch_format="pyarrow"),
            join_type="inner", on=("o_custkey",), num_partitions=n_parts)

    def attach_region(t: pa.Table, dim=dim) -> pa.Table:
        nat, reg = ray.get(dim)
        nk_to_name = {nk: reg[rk] for nk, rk in nat.items()}
        names = dict_lookup(t["c_nationkey"], nk_to_name,
                            out_type=pa.string())
        # per-row cents (exact for 2-decimal money), integer sums
        rev = _half_away(t["o_totalprice"].to_numpy(zero_copy_only=False)
                       * 100.0).astype(np.int64)
        tmp = pa.table({
            "r_name": names,
            "rev": pa.array(rev),
        })
        agg = tmp.group_by(["r_name"]).aggregate([("rev", "sum")])
        return agg.rename_columns(["r_name", "rev"])

    agg = (joined.map_batches(attach_region, batch_format="pyarrow")
           .groupby("r_name").aggregate(Sum("rev", alias_name="rev")))

    return agg.map_batches(
        lambda t: pa.table({
            "r_name": t["r_name"],
            "revenue_cents": pc.cast(t["rev"], pa.int64()),
        }), batch_format="pyarrow")


def top_parts_by_quantity(sf_dir: str, k: int = 10) -> "ray.data.Dataset":
    """lineitem partial-sum per partkey -> groupby -> top-k -> broadcast
    enrich with part names."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        agg = t.group_by(["l_partkey"]).aggregate([("l_quantity", "sum")])
        return agg.rename_columns(["l_partkey", "qty"])

    agg = (li.map_batches(partial, batch_format="pyarrow")
           .groupby("l_partkey").aggregate(Sum("qty", alias_name="qty")))

    def neg(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(
            pc.multiply(t["qty"], pa.scalar(100.0)),
            round_mode="half_towards_infinity"), pa.int64())
        return pa.table({
            "l_partkey": pc.cast(t["l_partkey"], pa.int64()),
            "qty_cents": cents,
            "_neg": pc.negate(cents),
        })

    # top-k is tiny by construction: collect it, then prune the part scan
    # to just those keys (never collect the full dimension table)
    top_rows = (agg.map_batches(neg, batch_format="pyarrow")
                .sort(["_neg", "l_partkey"]).limit(k)
                .select_columns(["l_partkey", "qty_cents"]).take_all())
    keys = {r["l_partkey"] for r in top_rows}

    def only_top(t: pa.Table) -> pa.Table:
        return t.filter(in_set_mask(t["p_partkey"], keys))

    names = {r["p_partkey"]: r["p_name"]
             for r in _read(sf_dir, "part", ["p_partkey", "p_name"])
             .map_batches(only_top, batch_format="pyarrow").take_all()}

    out = pa.table({
        "l_partkey": pa.array([r["l_partkey"] for r in top_rows], pa.int64()),
        "qty_cents": pa.array([r["qty_cents"] for r in top_rows], pa.int64()),
        "p_name": pa.array([names.get(r["l_partkey"]) for r in top_rows],
                           pa.string()),
    })
    return ray.data.from_arrow(out)
