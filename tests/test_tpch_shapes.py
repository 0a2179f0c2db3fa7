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
