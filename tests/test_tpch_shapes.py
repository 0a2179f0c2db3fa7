"""Hand-built edge-case fixtures for the round-3 TPC-H-shape additions
(Q10 returned-item report, Q14 promo share, Q16 supplier counts, Q19
OR-of-ANDs band revenue) — tie discipline, window cuts, exclusion sets
and band boundaries that the synthetic-corpus oracles exercise only in
aggregate."""

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq

from __ray_entry__ import (
    _Q19_BANDS,
    _q_promo_revenue_share,
    _q_quantity_band_revenue,
    _q_returned_top_customers,
    _q_supplier_part_counts,
)


def _ts(y, m, d_):
    return dt.datetime(y, m, d_)


def test_returned_top_customers_window_flag_and_ties(tmp_path):
    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3], pa.int64()),
                "c_name": pa.array(["cust_a", "cust_b", "cust_c"], pa.string()),
                "c_nationkey": pa.array([7, 8, 7], pa.int32()),
            }
        ),
        f"{d}/customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([7, 8], pa.int32()),
                "n_name": pa.array(["NAT_X", "NAT_Y"], pa.string()),
            }
        ),
        f"{d}/nation.parquet",
    )
    # order 100 (cust1, in-window), 101 (cust2, in-window),
    # 102 (cust3, BEFORE window), 103 (cust1, AT end — excluded)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([100, 101, 102, 103], pa.int64()),
                "o_custkey": pa.array([1, 2, 3, 1], pa.int64()),
                "o_orderdate": pa.array(
                    [
                        _ts(1996, 2, 1),
                        _ts(1996, 6, 30),
                        _ts(1995, 12, 31),
                        _ts(1996, 7, 1),
                    ],
                    pa.timestamp("us"),
                ),
            }
        ),
        f"{d}/orders.parquet",
    )
    # R-flag rows: cust1 gets 100.00 (125*0.8); cust2 gets 100.00 flat
    # (tie → custkey asc); the N-flag row and the out-of-window rows drop
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([100, 101, 101, 102, 103], pa.int64()),
                "l_returnflag": pa.array(["R", "R", "N", "R", "R"], pa.string()),
                "l_extendedprice": pa.array(
                    [125.0, 100.0, 999.0, 999.0, 999.0], pa.float64()
                ),
                "l_discount": pa.array([0.20, 0.0, 0.0, 0.0, 0.0], pa.float64()),
            }
        ),
        f"{d}/lineitem.parquet",
    )
    out = _q_returned_top_customers(d).to_pylist()
    assert out == [
        {"custkey": 1, "c_name": "cust_a", "n_name": "NAT_X", "revenue": 100.0},
        {"custkey": 2, "c_name": "cust_b", "n_name": "NAT_Y", "revenue": 100.0},
    ]


def test_promo_revenue_share_months_and_zero_promo_month(tmp_path):
    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1, 2], pa.int64()),
                "p_type": pa.array(["PROMO", "STANDARD"], pa.string()),
            }
        ),
        f"{d}/part.parquet",
    )
    # Jan: promo 30 + std 70 -> 30%; Mar: std only -> 0%;
    # out-of-year row ignored
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array([1, 2, 2, 1], pa.int64()),
                "l_shipdate": pa.array(
                    [
                        _ts(1996, 1, 5),
                        _ts(1996, 1, 20),
                        _ts(1996, 3, 1),
                        _ts(1997, 1, 1),
                    ],
                    pa.timestamp("us"),
                ),
                "l_extendedprice": pa.array(
                    [30.0, 70.0, 50.0, 999.0], pa.float64()
                ),
                "l_discount": pa.array([0.0, 0.0, 0.0, 0.0], pa.float64()),
            }
        ),
        f"{d}/lineitem.parquet",
    )
    out = _q_promo_revenue_share(d).to_pylist()
    assert out == [
        {"month": 1, "promo_share": 30.0},
        {"month": 3, "promo_share": 0.0},
    ]


def test_supplier_part_counts_exclusions_and_distinct(tmp_path):
    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([10, 11, 12], pa.int64()),
                "s_acctbal": pa.array([5.0, -1.0, 7.0], pa.float64()),
            }
        ),
        f"{d}/supplier.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1, 2], pa.int64()),
                "p_brand": pa.array(["Brand#2", "Brand#1"], pa.string()),
                "p_type": pa.array(["SMALL", "LARGE"], pa.string()),
                "p_size": pa.array([3, 9], pa.int32()),
            }
        ),
        f"{d}/part.parquet",
    )
    # part1: supp10 twice (distinct → 1), bad supp11 (excluded), supp12
    # → 2 distinct suppliers; part2 is Brand#1 → excluded entirely
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array([1, 1, 1, 1, 2], pa.int64()),
                "l_suppkey": pa.array([10, 10, 11, 12, 10], pa.int64()),
            }
        ),
        f"{d}/lineitem.parquet",
    )
    out = _q_supplier_part_counts(d).take_all()
    assert out == [
        {"p_brand": "Brand#2", "p_type": "SMALL", "p_size": 3, "supplier_cnt": 2}
    ]


def test_quantity_band_revenue_boundaries_and_empty(tmp_path):
    d = str(tmp_path)
    b0_brand, b0_size, b0_qlo, b0_qhi = _Q19_BANDS[0]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1, 2, 3], pa.int64()),
                "p_brand": pa.array(
                    [b0_brand, b0_brand, "Brand#99"], pa.string()
                ),
                "p_size": pa.array([b0_size, b0_size + 1, 1], pa.int32()),
            }
        ),
        f"{d}/part.parquet",
    )
    # part1 at qty band edges (kept twice: qlo and qhi), qty above band
    # (dropped); part2 size over the band max (dropped); part3 wrong
    # brand (dropped)
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array([1, 1, 1, 2, 3], pa.int64()),
                "l_quantity": pa.array(
                    [
                        float(b0_qlo),
                        float(b0_qhi),
                        float(b0_qhi + 1),
                        float(b0_qlo),
                        float(b0_qlo),
                    ],
                    pa.float64(),
                ),
                "l_extendedprice": pa.array(
                    [10.0, 20.0, 999.0, 999.0, 999.0], pa.float64()
                ),
                "l_discount": pa.array(
                    [0.0, 0.5, 0.0, 0.0, 0.0], pa.float64()
                ),
            }
        ),
        f"{d}/lineitem.parquet",
    )
    out = _q_quantity_band_revenue(d).to_pylist()
    assert out == [{"revenue": 20.0, "n_items": 2}]

    # all-filtered corpus still yields the single typed zero row
    empty = str(tmp_path / "empty")
    import os

    os.makedirs(empty)
    pq.write_table(
        pq.read_table(f"{d}/part.parquet"), f"{empty}/part.parquet"
    )
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array([3], pa.int64()),
                "l_quantity": pa.array([1.0], pa.float64()),
                "l_extendedprice": pa.array([5.0], pa.float64()),
                "l_discount": pa.array([0.0], pa.float64()),
            }
        ),
        f"{empty}/lineitem.parquet",
    )
    assert _q_quantity_band_revenue(empty).to_pylist() == [
        {"revenue": 0.0, "n_items": 0}
    ]


def _write_li(d, rows):
    cols = {
        "l_orderkey": pa.int64(), "l_partkey": pa.int64(),
        "l_suppkey": pa.int64(), "l_quantity": pa.float64(),
        "l_extendedprice": pa.float64(), "l_discount": pa.float64(),
        "l_returnflag": pa.string(), "l_shipdate": pa.timestamp("us"),
    }
    tbl = pa.table(
        {
            name: pa.array([r.get(name, _LI_DEFAULTS[name]) for r in rows], t)
            for name, t in cols.items()
        }
    )
    pq.write_table(tbl, f"{d}/lineitem.parquet")


_LI_DEFAULTS = {
    "l_orderkey": 1, "l_partkey": 1, "l_suppkey": 1, "l_quantity": 1.0,
    "l_extendedprice": 100.0, "l_discount": 0.0, "l_returnflag": "N",
    "l_shipdate": dt.datetime(1996, 6, 1),
}


def test_revenue_forecast_band_and_window_edges(tmp_path):
    from __ray_entry__ import _q_revenue_forecast

    d = str(tmp_path)
    _write_li(d, [
        # in: year 1996, discount 5-7%, qty < 24
        {"l_discount": 0.05, "l_quantity": 23.0, "l_extendedprice": 1000.0},
        {"l_discount": 0.07, "l_quantity": 1.0, "l_extendedprice": 2000.0},
        # out: discount below band / above band / qty at cap / wrong year
        {"l_discount": 0.04, "l_quantity": 1.0},
        {"l_discount": 0.08, "l_quantity": 1.0},
        {"l_discount": 0.06, "l_quantity": 24.0},
        {"l_discount": 0.06, "l_shipdate": dt.datetime(1995, 12, 31)},
        {"l_discount": 0.06, "l_shipdate": dt.datetime(1997, 1, 1)},
    ])
    out = _q_revenue_forecast(d)
    # 1000*0.05 + 2000*0.07 = 50 + 140
    assert out["revenue"].to_pylist() == [190.0]
    assert out["n_items"].to_pylist() == [2]


def test_sole_return_suppliers_exists_not_exists(tmp_path):
    from __ray_entry__ import _q_sole_return_suppliers

    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([1, 2, 3], pa.int64()),
                "s_name": pa.array(["s1", "s2", "s3"], pa.string()),
            }
        ),
        f"{d}/supplier.parquet",
    )
    _write_li(d, [
        # order 10: two suppliers, only supp 1 returned → blame 1
        {"l_orderkey": 10, "l_suppkey": 1, "l_returnflag": "R"},
        {"l_orderkey": 10, "l_suppkey": 1, "l_returnflag": "N"},  # same supp
        {"l_orderkey": 10, "l_suppkey": 2, "l_returnflag": "N"},
        # order 11: two suppliers BOTH returned → excluded (nr=2)
        {"l_orderkey": 11, "l_suppkey": 1, "l_returnflag": "R"},
        {"l_orderkey": 11, "l_suppkey": 2, "l_returnflag": "R"},
        # order 12: single-supplier order with a return → excluded (ns=1)
        {"l_orderkey": 12, "l_suppkey": 3, "l_returnflag": "R"},
        # order 13: multi-supplier, no returns → excluded (nr=0)
        {"l_orderkey": 13, "l_suppkey": 2, "l_returnflag": "N"},
        {"l_orderkey": 13, "l_suppkey": 3, "l_returnflag": "N"},
        # order 14: blame supp 2 (tie-break check: same count as supp 1)
        {"l_orderkey": 14, "l_suppkey": 2, "l_returnflag": "R"},
        {"l_orderkey": 14, "l_suppkey": 3, "l_returnflag": "N"},
    ])
    out = _q_sole_return_suppliers(d)
    # supp1 and supp2 each blamed once; tie broken by suppkey asc
    assert out["suppkey"].to_pylist() == [1, 2]
    assert out["n_orders"].to_pylist() == [1, 1]
    assert out["s_name"].to_pylist() == ["s1", "s2"]


def test_custdist_includes_zero_bucket(tmp_path):
    from __ray_entry__ import _q_custdist

    d = str(tmp_path)
    pq.write_table(
        pa.table({"c_custkey": pa.array([1, 2, 3, 4], pa.int64())}),
        f"{d}/customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                "o_custkey": pa.array([1, 1, 2], pa.int64()),
            }
        ),
        f"{d}/orders.parquet",
    )
    out = _q_custdist(d)
    assert out["c_count"].to_pylist() == [0, 1, 2]
    # custs 3,4 have zero orders; cust 2 has one; cust 1 has two
    assert out["custdist"].to_pylist() == [2, 1, 1]


def test_part_value_share_threshold_is_exact(tmp_path):
    from __ray_entry__ import _q_part_value_share

    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([1, 2], pa.int64()),
                # nationkey 3 → in (3%3==0); 4 → out
                "s_nationkey": pa.array([3, 4], pa.int64()),
            }
        ),
        f"{d}/supplier.parquet",
    )
    _write_li(d, [
        # part 1 value 10000c*100, part 2 value 100c*100 via supp 1;
        # part 3 only via excluded supp 2
        {"l_partkey": 1, "l_suppkey": 1, "l_extendedprice": 100.0},
        {"l_partkey": 2, "l_suppkey": 1, "l_extendedprice": 1.0},
        {"l_partkey": 3, "l_suppkey": 2, "l_extendedprice": 999.0},
    ])
    out = _q_part_value_share(d).to_pandas()
    # mean value = 5050*100c; only part 1 exceeds 1.6x the mean
    assert out["partkey"].tolist() == [1]
    assert out["value"].tolist() == [100.0]


def test_promo_part_suppliers_semi_join_pair_lane(tmp_path):
    from __ray_entry__ import _Q20_QTY, _q_promo_part_suppliers

    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1, 2], pa.int64()),
                "p_name": pa.array(["big red thing", "plain blue"], pa.string()),
            }
        ),
        f"{d}/part.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([1, 2, 3], pa.int64()),
                "s_name": pa.array(["s1", "s2", "s3"], pa.string()),
            }
        ),
        f"{d}/supplier.parquet",
    )
    q = float(_Q20_QTY)
    _write_li(d, [
        # supp 1: one red lane over threshold (split across rows)
        {"l_partkey": 1, "l_suppkey": 1, "l_quantity": q},
        {"l_partkey": 1, "l_suppkey": 1, "l_quantity": 1.0},
        # supp 2: exactly AT threshold → excluded (strict >)
        {"l_partkey": 1, "l_suppkey": 2, "l_quantity": q},
        # supp 3: over threshold but on a NON-red part → excluded
        {"l_partkey": 2, "l_suppkey": 3, "l_quantity": q + 1},
    ])
    out = _q_promo_part_suppliers(d).to_pandas().sort_values("suppkey")
    assert out["suppkey"].tolist() == [1]
    assert out["s_name"].tolist() == ["s1"]


def test_generator_referential_integrity_orders_customers():
    """_q_custdist derives the zero-order bucket from customer-table
    minus with-orders counts, which is exact only under the generator
    invariant o_custkey ⊆ customer.c_custkey — assert it holds."""
    import numpy as np

    o = pq.read_table(
        "/root/testdata/sf0.001/orders.parquet", columns=["o_custkey"]
    )
    c = pq.read_table(
        "/root/testdata/sf0.001/customer.parquet", columns=["c_custkey"]
    )
    ok = np.unique(np.asarray(o["o_custkey"], dtype=np.int64))
    ck = np.asarray(c["c_custkey"], dtype=np.int64)
    assert np.isin(ok, ck).all()


def test_min_cost_supplier_argmin_ties_and_filters(tmp_path):
    """Q2 shape: per-part argmin WITH TIES over the EU supplier universe;
    cheaper non-EU offers and filtered-out parts must not leak in, and
    the head orders by acctbal cents DESC."""
    from __ray_entry__ import _q_min_cost_supplier

    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array([0, 1], pa.int32()),
                "r_name": pa.array(["EUROPE", "ASIA"], pa.string()),
            }
        ),
        f"{d}/region.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([10, 11], pa.int32()),
                "n_name": pa.array(["GERMANY", "CHINA"], pa.string()),
                "n_regionkey": pa.array([0, 1], pa.int32()),
            }
        ),
        f"{d}/nation.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([1, 2, 3], pa.int64()),
                "s_name": pa.array(["s1", "s2", "s3"], pa.string()),
                "s_nationkey": pa.array([10, 10, 11], pa.int32()),
                "s_acctbal": pa.array([100.0, 50.0, 999.0], pa.float64()),
            }
        ),
        f"{d}/supplier.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1, 2, 3], pa.int64()),
                "p_type": pa.array(
                    ["STANDARD", "STANDARD", "PROMO"], pa.string()
                ),
                "p_size": pa.array([5, 7, 10], pa.int32()),
            }
        ),
        f"{d}/part.parquet",
    )
    rows = [
        # part 1: s1 min 8.00 (across two rows), s2 ties at 8.00,
        # s3 cheaper but non-EU → excluded
        {"l_partkey": 1, "l_suppkey": 1, "l_extendedprice": 10.0},
        {"l_partkey": 1, "l_suppkey": 1, "l_extendedprice": 8.0},
        {"l_partkey": 1, "l_suppkey": 2, "l_extendedprice": 8.0},
        {"l_partkey": 1, "l_suppkey": 3, "l_extendedprice": 1.0},
        # part 2: wrong size (7 % 5 != 0); part 3: wrong type
        {"l_partkey": 2, "l_suppkey": 1, "l_extendedprice": 5.0},
        {"l_partkey": 3, "l_suppkey": 1, "l_extendedprice": 5.0},
    ]
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array(
                    [r["l_partkey"] for r in rows], pa.int64()
                ),
                "l_suppkey": pa.array(
                    [r["l_suppkey"] for r in rows], pa.int64()
                ),
                "l_extendedprice": pa.array(
                    [r["l_extendedprice"] for r in rows], pa.float64()
                ),
            }
        ),
        f"{d}/lineitem.parquet",
    )
    out = _q_min_cost_supplier(d)
    assert out["s_name"].to_pylist() == ["s1", "s2"]  # acctbal desc
    assert out["p_partkey"].to_pylist() == [1, 1]
    assert out["supplycost"].to_pylist() == [8.0, 8.0]
    assert out["s_acctbal"].to_pylist() == [100.0, 50.0]
    assert out["n_name"].to_pylist() == ["GERMANY", "GERMANY"]


def test_shipmode_priority_window_and_split(tmp_path):
    """Q12 shape: [1997-01-01, 1998-01-01) boundary discipline, the
    linenumber % 3 mode projection, and the high/low priority split."""
    from __ray_entry__ import _q_shipmode_priority

    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                "o_orderpriority": pa.array(
                    ["1-URGENT", "5-LOW", "2-HIGH"], pa.string()
                ),
            }
        ),
        f"{d}/orders.parquet",
    )
    li = [
        # (orderkey, linenumber, shipdate, expected lane)
        (1, 3, _ts(1997, 1, 1)),    # MAIL, high — AT window start
        (1, 1, _ts(1996, 12, 31)),  # excluded: before window
        (2, 2, _ts(1997, 6, 1)),    # TRUCK, low
        (3, 6, _ts(1997, 12, 31)),  # MAIL, high — last in-window day
        (2, 3, _ts(1998, 1, 1)),    # excluded: AT window end
    ]
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in li], pa.int64()),
                "l_linenumber": pa.array([r[1] for r in li], pa.int32()),
                "l_shipdate": pa.array(
                    [r[2] for r in li], pa.timestamp("us")
                ),
            }
        ),
        f"{d}/lineitem.parquet",
    )
    out = {
        r["shipmode"]: (r["high_line_count"], r["low_line_count"])
        for r in _q_shipmode_priority(d).take_all()
    }
    assert out == {"MAIL": (2, 0), "TRUCK": (0, 1)}


def test_sales_opportunity_threshold_and_recent_order(tmp_path):
    """Q22 shape: strict > avg (a balance exactly AT the positive-balance
    average is excluded), negative balances excluded from the average,
    out-of-set country codes ignored, and an order AT the cutoff counts
    as recent (anti-joins the customer away)."""
    from __ray_entry__ import _q_sales_opportunity

    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
                # codes: nk % 7 → 0,0,2,1(out),0,2
                "c_nationkey": pa.array([0, 7, 2, 1, 14, 9], pa.int32()),
                # positive-balance avg over in-set = (100+200+300)/3 = 200
                "c_acctbal": pa.array(
                    [100.0, 200.0, 300.0, 1000.0, -50.0, 400.0],
                    pa.float64(),
                ),
            }
        ),
        f"{d}/customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_custkey": pa.array([3, 6, 1], pa.int64()),
                "o_orderdate": pa.array(
                    [
                        _ts(1998, 5, 1),   # old order: c3 still qualifies
                        _ts(2000, 1, 1),   # recent: c6 excluded
                        _ts(1999, 1, 1),   # AT cutoff = recent (c1 moot)
                    ],
                    pa.timestamp("us"),
                ),
            }
        ),
        f"{d}/orders.parquet",
    )
    out = _q_sales_opportunity(d).to_pandas()
    # only c3: bal 300 > 200 (c2 AT avg → excluded; c6 recent order;
    # c4 out-of-set code; c5 negative)
    assert out["cntrycode"].tolist() == [2]
    assert out["numcust"].tolist() == [1]
    assert out["totacctbal"].tolist() == [300.0]
