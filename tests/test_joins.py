"""Join operators: partitioned hash join + as-of join on hand-built data."""

import datetime as dt

import pyarrow as pa
import ray.data

from docling_api_ray.stages.joins import asof_join_events, hash_join


def test_hash_join_inner_and_left():
    left = ray.data.from_arrow(
        pa.table({"k": [1, 2, 3, 4], "lv": ["a", "b", "c", "d"]})
    )
    right = ray.data.from_arrow(pa.table({"k": [2, 3, 3, 9], "rv": [20, 30, 31, 90]}))
    inner = hash_join(left, right, on="k", how="inner").take_all()
    assert sorted((r["k"], r["lv"], r["rv"]) for r in inner) == [
        (2, "b", 20),
        (3, "c", 30),
        (3, "c", 31),
    ]
    lj = hash_join(left, right, on="k", how="left").take_all()
    assert len(lj) == 5  # 1,4 unmatched + 2 + two 3s
    # unmatched right values arrive as null/NaN (pandas merge semantics)
    unmatched = [r for r in lj if r["rv"] is None or r["rv"] != r["rv"]]
    assert sorted(r["k"] for r in unmatched) == [1, 4]


def test_hash_join_semi_anti():
    left = ray.data.from_arrow(
        pa.table({"k": [1, 2, 3, 4, 33], "lv": ["a", "b", "c", "d", "e"]})
    )
    # right carries only its key column (the documented calling shape);
    # duplicate keys must not multiply left rows
    right = ray.data.from_arrow(pa.table({"k": [2, 3, 3, 9]}))
    semi = hash_join(left, right, on="k", how="semi").take_all()
    assert sorted((r["k"], r["lv"]) for r in semi) == [(2, "b"), (3, "c")]
    anti = hash_join(left, right, on="k", how="anti").take_all()
    assert sorted((r["k"], r["lv"]) for r in anti) == [
        (1, "a"),
        (4, "d"),
        (33, "e"),
    ]
    # semi ∪ anti partitions the left exactly
    assert len(semi) + len(anti) == 5


def test_hash_join_bucket_correctness():
    # keys colliding in the same bucket (k % 32) must still join by key
    left = ray.data.from_arrow(pa.table({"k": [1, 33, 65], "lv": [1, 2, 3]}))
    right = ray.data.from_arrow(pa.table({"k": [33], "rv": [99]}))
    out = hash_join(left, right, on="k", how="inner").take_all()
    assert out == [{"k": 33, "lv": 2, "rv": 99}]


def _events(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "event_id": [r[0] for r in rows],
                "user_id": [r[1] for r in rows],
                "event_type": [r[2] for r in rows],
                "ts": pa.array(
                    [dt.datetime(2024, 1, 1) + dt.timedelta(seconds=r[3]) for r in rows],
                    type=pa.timestamp("us"),
                ),
            }
        )
    )


def test_asof_backward_match_and_unmatched():
    ds = _events(
        [
            (1, 7, "click", 10),
            (2, 7, "purchase", 15),   # → click 1
            (3, 7, "click", 20),
            (4, 7, "purchase", 20),   # ts equal → click 3 (<=)
            (5, 8, "purchase", 5),    # no click for user 8 → -1
            (6, 9, "click", 100),     # click after any purchase, no output row
        ]
    )
    out = asof_join_events(ds, left_type="purchase", right_type="click")
    rows = {r["event_id"]: r for r in out.take_all()}
    assert set(rows) == {2, 4, 5}
    assert rows[2]["matched_event_id"] == 1
    assert rows[4]["matched_event_id"] == 3
    assert rows[5]["matched_event_id"] == -1 and rows[5]["matched_ts_us"] == -1


def test_asof_picks_latest_prior():
    ds = _events(
        [
            (1, 1, "click", 1),
            (2, 1, "click", 5),
            (3, 1, "click", 9),
            (4, 1, "purchase", 7),  # → click 2 (latest <= 7)
        ]
    )
    out = asof_join_events(ds, left_type="purchase", right_type="click").take_all()
    assert out[0]["matched_event_id"] == 2


def _sf(tmp_path, orders_rows, lineitem_rows, customer_rows):
    import pyarrow.parquet as pq

    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in orders_rows], pa.int64()),
                "o_custkey": pa.array([r[1] for r in orders_rows], pa.int64()),
                "o_totalprice": pa.array(
                    [r[2] for r in orders_rows], pa.float64()
                ),
                "o_orderdate": pa.array(
                    [r[3] for r in orders_rows], pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(
                    [r[4] for r in orders_rows], pa.string()
                ),
            }
        ),
        f"{d}/orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in lineitem_rows], pa.int64()),
                "l_quantity": pa.array(
                    [r[1] for r in lineitem_rows], pa.float64()
                ),
                "l_shipdate": pa.array(
                    [r[2] for r in lineitem_rows], pa.timestamp("us")
                ),
            }
        ),
        f"{d}/lineitem.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([r[0] for r in customer_rows], pa.int64()),
                "c_name": pa.array([r[1] for r in customer_rows], pa.string()),
            }
        ),
        f"{d}/customer.parquet",
    )
    return d


def test_large_volume_orders_threshold_join_and_topk(tmp_path):
    from __ray_entry__ import _q_large_volume_orders

    day = dt.datetime(1995, 2, 1)
    # order 1: qty 300 (qualifies), order 2: qty 100 (no), order 3: 260 (yes)
    orders = [(1, 10, 111.0, day, "1-URGENT"), (2, 11, 222.0, day, "2-HIGH"),
              (3, 10, 333.0, day, "5-LOW")]
    li = [(1, 150.0, day), (1, 150.0, day), (2, 100.0, day),
          (3, 200.0, day), (3, 60.0, day)]
    cust = [(10, "cust-ten"), (11, "cust-eleven")]
    out = _q_large_volume_orders(_sf(tmp_path, orders, li, cust))
    rows = sorted(out.to_pylist(), key=lambda r: r["orderkey"])
    assert [(r["orderkey"], r["c_name"], r["total_qty"]) for r in rows] == [
        (1, "cust-ten", 300.0),
        (3, "cust-ten", 260.0),
    ]


def test_order_priority_counts_exists_semantics(tmp_path):
    from __ray_entry__ import _q_order_priority_counts

    q1 = dt.datetime(1995, 2, 1)
    late = dt.datetime(1995, 7, 1)
    early = dt.datetime(1995, 5, 1)
    # order 1: in window, has a late lineitem -> counted
    # order 2: in window, only early lineitems -> not counted
    # order 3: outside window, late lineitem -> not counted
    # order 4: in window, two late lineitems -> counted ONCE (exists)
    orders = [
        (1, 10, 1.0, q1, "1-URGENT"),
        (2, 10, 1.0, q1, "1-URGENT"),
        (3, 10, 1.0, dt.datetime(1996, 1, 1), "2-HIGH"),
        (4, 10, 1.0, q1, "3-MEDIUM"),
    ]
    li = [(1, 1.0, late), (2, 1.0, early), (3, 1.0, late),
          (4, 1.0, late), (4, 2.0, late)]
    out = _q_order_priority_counts(_sf(tmp_path, orders, li, [(10, "c")]))
    got = {r["o_orderpriority"]: r["n"] for r in out.take_all()}
    assert got == {"1-URGENT": 1, "3-MEDIUM": 1}


def _sf_q17_q15(tmp_path, parts, lineitems, suppliers):
    """part/lineitem/supplier fixture for the Q17/Q15 shapes.

    parts: (partkey, brand); lineitems: (partkey, suppkey, qty, price,
    discount, shipdate); suppliers: (suppkey, name)."""
    import pyarrow.parquet as pq

    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([r[0] for r in parts], pa.int64()),
                "p_brand": pa.array([r[1] for r in parts], pa.string()),
            }
        ),
        f"{d}/part.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array([r[0] for r in lineitems], pa.int64()),
                "l_suppkey": pa.array([r[1] for r in lineitems], pa.int64()),
                "l_quantity": pa.array([r[2] for r in lineitems], pa.float64()),
                "l_extendedprice": pa.array(
                    [r[3] for r in lineitems], pa.float64()
                ),
                "l_discount": pa.array([r[4] for r in lineitems], pa.float64()),
                "l_shipdate": pa.array(
                    [r[5] for r in lineitems], pa.timestamp("us")
                ),
            }
        ),
        f"{d}/lineitem.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([r[0] for r in suppliers], pa.int64()),
                "s_name": pa.array([r[1] for r in suppliers], pa.string()),
            }
        ),
        f"{d}/supplier.parquet",
    )
    return d


def test_small_qty_revenue_q17_integer_mean_predicate(tmp_path):
    from __ray_entry__ import _Q17_BRAND, _q_small_qty_revenue

    day = dt.datetime(1996, 2, 1)
    parts = [(1, _Q17_BRAND), (2, _Q17_BRAND), (3, "Brand#99")]
    # part 1: qtys 10,10,10,1 -> avg 7.75, 0.2*avg = 1.55 -> only the
    # qty-1 row (price 70.00) qualifies; part 2: qtys 5,5 -> 0.2*avg = 1,
    # nothing strictly below; part 3: wrong brand, must be pruned.
    li = [
        (1, 1, 10.0, 500.0, 0.0, day),
        (1, 1, 10.0, 500.0, 0.0, day),
        (1, 1, 10.0, 500.0, 0.0, day),
        (1, 1, 1.0, 70.0, 0.0, day),
        (2, 1, 5.0, 200.0, 0.0, day),
        (2, 1, 5.0, 200.0, 0.0, day),
        (3, 1, 1.0, 999.0, 0.0, day),
    ]
    out = _q_small_qty_revenue(
        _sf_q17_q15(tmp_path, parts, li, [(1, "s")])
    ).take_all()
    assert out == [{"brand": _Q17_BRAND, "avg_yearly": 70.0 / 7.0}]


def test_top_supplier_q15_window_discount_and_ties(tmp_path):
    from __ray_entry__ import _q_top_supplier

    inside = dt.datetime(1996, 2, 15)
    outside = dt.datetime(1996, 6, 1)
    parts = [(1, "Brand#1")]
    # supp 1: 125.00 at 20% discount -> 100.0; supp 2: 100.00 flat ->
    # 100.0 (exact integer tie); supp 3: 99.99 in-window plus a huge
    # out-of-window row that must NOT count.
    li = [
        (1, 1, 1.0, 125.0, 0.20, inside),
        (1, 2, 1.0, 100.0, 0.0, inside),
        (1, 3, 1.0, 99.99, 0.0, inside),
        (1, 3, 1.0, 100000.0, 0.0, outside),
    ]
    sup = [(1, "supp-A"), (2, "supp-B"), (3, "supp-C")]
    out = _q_top_supplier(_sf_q17_q15(tmp_path, parts, li, sup))
    rows = sorted(out.to_pylist(), key=lambda r: r["suppkey"])
    assert rows == [
        {"suppkey": 1, "s_name": "supp-A", "total_revenue": 100.0},
        {"suppkey": 2, "s_name": "supp-B", "total_revenue": 100.0},
    ]


def test_nation_trade_volume_q7_pair_filter(tmp_path):
    import pyarrow.parquet as pq

    from __ray_entry__ import _Q7_NATIONS, _q_nation_trade_volume

    d = str(tmp_path)
    na, nb = _Q7_NATIONS
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([1, 2, 3], pa.int32()),
                "n_name": pa.array([na, nb, "NATION_OTHER"], pa.string()),
            }
        ),
        f"{d}/nation.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([10, 11, 12], pa.int64()),
                "s_nationkey": pa.array([1, 2, 3], pa.int32()),
            }
        ),
        f"{d}/supplier.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([20, 21, 22], pa.int64()),
                "c_nationkey": pa.array([2, 1, 3], pa.int32()),
            }
        ),
        f"{d}/customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([100, 101, 102], pa.int64()),
                "o_custkey": pa.array([20, 21, 22], pa.int64()),
            }
        ),
        f"{d}/orders.parquet",
    )
    day95 = dt.datetime(1995, 6, 1)
    day96 = dt.datetime(1996, 6, 1)
    # rows: (orderkey, suppkey, price, disc, date)
    # 100/supp10: nation A -> cust nation B (keep, 1995): 125*0.8 = 100
    # 100/supp11: nation B -> cust nation B (same nation, drop)
    # 101/supp11: nation B -> cust nation A (keep, 1996): 50 flat
    # 102/supp10: nation A -> cust OTHER (drop: cust filtered out)
    # 101/supp12: OTHER -> A (drop: supp filtered out)
    li = pa.table(
        {
            "l_orderkey": pa.array([100, 100, 101, 102, 101], pa.int64()),
            "l_suppkey": pa.array([10, 11, 11, 10, 12], pa.int64()),
            "l_extendedprice": pa.array(
                [125.0, 10.0, 50.0, 999.0, 999.0], pa.float64()
            ),
            "l_discount": pa.array([0.20, 0.0, 0.0, 0.0, 0.0], pa.float64()),
            "l_shipdate": pa.array(
                [day95, day95, day96, day95, day96], pa.timestamp("us")
            ),
        }
    )
    pq.write_table(li, f"{d}/lineitem.parquet")
    out = sorted(
        _q_nation_trade_volume(d).to_pylist(),
        key=lambda r: (r["supp_nation"], r["l_year"]),
    )
    assert out == [
        {"supp_nation": na, "cust_nation": nb, "l_year": 1995, "revenue": 100.0},
        {"supp_nation": nb, "cust_nation": na, "l_year": 1996, "revenue": 50.0},
    ]


def test_broadcast_join_matches_hash_join_all_modes():
    """broadcast_join is a drop-in for hash_join when the right side is
    small: identical rows and column order for inner/left/semi/anti over
    unique-key, duplicate-key and empty right sides."""
    import numpy as np
    import pandas as pd

    from docling_api_ray.stages.joins import broadcast_join

    rng = np.random.default_rng(0)
    L = pd.DataFrame(
        {
            "k": rng.integers(0, 50, 500).astype(np.int64),
            "lv": rng.integers(0, 1000, 500).astype(np.int64),
        }
    )
    Ru = pd.DataFrame(
        {
            "k": np.arange(0, 40, dtype=np.int64),
            "rv": np.arange(100, 140, dtype=np.int64),
        }
    )
    Rd = pd.concat([Ru, Ru.assign(rv=Ru.rv + 1000)]).reset_index(drop=True)
    ls = pa.schema([("k", pa.int64()), ("lv", pa.int64())])
    rs = pa.schema([("k", pa.int64()), ("rv", pa.int64())])

    def run(join_fn, R, how):
        left = ray.data.from_pandas(L).repartition(4)
        right = (
            ray.data.from_pandas(R).repartition(2)
            if len(R)
            else ray.data.from_arrow(rs.empty_table())
        )
        out = join_fn(
            left, right, on="k", how=how, schemas=(ls, rs)
        ).to_pandas()
        cols = sorted(out.columns)
        return (
            out[cols]
            .astype({c: "float64" for c in cols})
            .sort_values(cols)
            .reset_index(drop=True)
        )

    for R in (Ru, Rd, Ru.iloc[:0]):
        for how in ("inner", "left", "semi", "anti"):
            a = run(hash_join, R, how)
            b = run(broadcast_join, R, how)
            assert a.equals(b), (how, len(R))


def test_broadcast_join_guard_falls_back_to_hash_join():
    """Above broadcast_max the right side must NOT be collected — the
    call degrades to the bucketed hash_join and stays correct."""
    import numpy as np
    import pandas as pd

    from docling_api_ray.stages.joins import broadcast_join

    L = pd.DataFrame({"k": np.arange(100, dtype=np.int64)})
    R = pd.DataFrame(
        {
            "k": np.arange(50, dtype=np.int64),
            "rv": np.arange(50, dtype=np.int64) * 2,
        }
    )
    ls = pa.schema([("k", pa.int64())])
    rs = pa.schema([("k", pa.int64()), ("rv", pa.int64())])
    out = broadcast_join(
        ray.data.from_pandas(L).repartition(3),
        ray.data.from_pandas(R).repartition(2),
        on="k",
        schemas=(ls, rs),
        broadcast_max=10,  # force the fallback
    ).to_pandas()
    assert len(out) == 50
    assert sorted(out["k"]) == list(range(50))
    assert dict(zip(out["k"], out["rv"]))[7] == 14
