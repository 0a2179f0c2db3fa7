"""Bench harness — headline pipelines over $GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "flagship_conversion_sec", "value": <sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "docs": n, "docs_per_sec": rate}

``--scaling`` runs the headline job in fresh subprocesses at N and 4N
CPUs (default 2 and 8 — see BENCH/BASELINE.md for the hardware rationale)
on the same input, median of GRAFT_SCALING_REPS repetitions per level,
and reports throughput at both plus the scaling efficiency (the sandbox
proxy for the N vs 4N node cluster criterion); results are appended to
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.abspath(__file__))


def _bench_once() -> dict:
    sys.path.insert(0, REPO)
    os.chdir(REPO)
    os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    amplify = int(os.environ.get("GRAFT_AMPLIFY", "8"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    import ray

    ray.init(
        address="local",
        num_cpus=ncpu,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import pyarrow.parquet as pq

    import __ray_entry__ as em
    from docling_api_ray.config import PipelineConfig
    from docling_api_ray.pipelines.convert import flagship

    # warm the OS page cache so we measure compute+shuffle, not cold reads
    n_base = pq.read_table(os.path.join(sf_dir, "documents.parquet")).num_rows
    pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    pq.read_table(os.path.join(sf_dir, "events.parquet"))

    cfg = PipelineConfig(
        extract_tables_as_images=True,
        convert_concurrency=ncpu,
        convert_batch_size=512,
    )

    # untimed warm-up: spawns the worker pool + convert actors so the timed
    # section measures steady-state throughput, not process cold-start
    flagship(sf_dir, cfg, amplify=1).count()

    # ---- headline: flagship conversion, end-to-end incl. parquet sink ----
    # median of 5: this container's run-to-run jitter is ±30-50% with
    # multi-second co-tenant plateaus, far above real effect sizes — 3
    # reps can land 2-in-3 inside one bad window (BENCH_r02 raw
    # 4.09/3.99/6.05 vs a clean 3.35/2.31/3.42); raw reps go in the JSON
    headline_reps = int(os.environ.get("GRAFT_HEADLINE_REPS", "5"))

    def _headline_rep() -> float:
        out_dir = "/tmp/bench_out"
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.time()
        flagship(sf_dir, cfg, amplify=amplify).write_parquet(out_dir)
        return round(time.time() - t0, 3)

    raw_headline: list[float] = []
    ndocs = n_base * amplify

    # ---- query battery (each timed separately, consumed via count) ------
    qs = em.queries()
    bench_queries = [] if os.environ.get("GRAFT_HEADLINE_ONLY") else [
        "token_count",
        "quality_score",
        "lang_id",
        "html_extract",
        "dedup_exact",
        "dedup_minhash",
        "dedup_minhash_keep",
        "dedup_simhash",
        "paragraph_dedup",
        "pack_chunks",
        "gopher_quality",
        "pii_redact",
        "bm25_scores",
        "tfidf_topterms",
        "charlm_scores",
        "global_rank",
        "dup_ngrams",
        "kmeans_clusters",
        "semdedup_keep",
        "embedding_gram",
        "cluster_outliers",
        "curate_pack",
        "knn_bruteforce",
        "knn_ivf",
        "knn_lsh",
        "knn_pq",
        "events_hourly",
        "events_gaps",
        "bloom_decontaminate",
        "countmin_words",
        "rollup_counts",
        "pivot_lang_format",
        "shipping_priority",
        "local_supplier_volume",
        "customers_no_orders",
        "events_moving_avg",
        "dsir_weights",
        "weighted_sample",
        "curriculum_bins",
        "vocab_shared_all",
        "inverted_postings",
        "mixture_weights",
        "repetition_stats",
        "hll_by_source",
        "bpe_token_counts",
        "knn_filtered",
        "zscore_by_source",
        "kl_by_source",
        "value_quantiles_by_type",
        "pmi_collocations",
        "corpus_diff",
        "events_rolling_z",
        "ngram_backoff",
        "mixture_select",
        "large_volume_orders",
        "order_priority_counts",
        "token_entropy",
        "source_similarity",
        "length_token_corr",
        "interleave_order",
        "small_qty_revenue",
        "top_supplier",
        "knn_recall",
        "chunk_overlap",
        "nation_trade_volume",
        "events_new_users",
        "session_type_pairs",
        "events_retention",
        "returned_top_customers",
        "promo_revenue_share",
        "supplier_part_counts",
        "quantity_band_revenue",
        "session_transitions",
        "user_top_event",
        "events_wau",
        "ngram_containment",
        "knn_label_vote",
        "readability",
        "robust_stats_by_source",
        "revenue_forecast",
        "nation_profit_by_year",
        "part_value_share",
        "custdist",
        "promo_part_suppliers",
        "sole_return_suppliers",
        "append_dedup_exact",
        "append_dedup_minhash",
        "knn_append",
        "knn_ivf_partitioned",
        "append_dedup_indexed",
        "conversion_metrics",
        # round-4 additions
        "score_quantiles",
        "mkt_share_by_year",
        "min_cost_supplier",
        "shipmode_priority",
        "sales_opportunity",
        "append_commit",
        "dup_span_strip",
        "dup_span_keep_first",
        "source_score_quantiles",
        "quality_gate_by_source",
        "user_value_quantiles",
        "source_percent_rank",
        "dedup_cluster_sizes",
        "random_projection",
        "pca_project",
        "interval_join",
        "edit_distance_pairs",
        "customer_running_total",
        "pagerank_neardup",
        "ridge_predict",
        "prefix_filter_pairs",
        "triangle_neardup",
        "cube_counts",
        "source_ntile",
        "pareto_frontier",
        "user_event_sequence",
        "embedding_quantize",
        "feature_corr",
        "hybrid_rrf",
        "rank_rbo",
        "quality_auc_by_source",
        "quality_calibration",
        "ks_drift_by_source",
        "budget_select",
        "source_ols",
        "nbayes_confusion",
        "source_overlap",
        "events_decay_score",
        "event_path_topk",
        "source_unique_share",
        "cluster_profile",
        "leakage_safe_split",
        "rfm_segments",
        "events_bursts",
        "anova_eta2",
        "length_quality_grid",
        "user_event_diversity",
        "corpus_card",
        "cluster_topterms",
        "knn_mrr",
        "lang_agreement",
        "vocab_growth",
        "ccnet_buckets",
        # round-5 additions
        "approx_score_quantiles",
        "approx_source_quantiles",
        "winsorize_logit",
        "source_heavy_hitters",
        "weighted_length_quantiles",
        "spearman_length_tokens",
        "lang_source_mi",
        "stratified_kfold",
        "source_gini",
        "event_debounce",
        "lsh_eval",
        "psi_by_source",
        "distinct_ngrams",
        "zipf_fit",
        "winnow_fingerprints",
        "winnow_pairs",
        "cdc_dedup",
        "events_ewma",
        "neyman_allocation",
        "vocab_coverage",
        "neyman_sample",
        "kendall_length_tokens",
        "benford_audit",
        "blocklist_rate",
        "mmr_select",
        "winnow_dedup_keep",
        "mann_kendall",
        "quantile_normalize",
        "hill_tail_index",
        "table_profile",
        "selfjoin_blowup",
        "dedup_normalized",
        "quality_ensemble",
        "funnel_latency",
        "hll_eval",
        "cms_eval",
        "bloom_fpr",
        "welch_ttest",
        "poisson_bootstrap",
        "kneser_ney",
        "rouge_pairs",
        "isotonic_calibration",
        "boilerplate_strip",
        "conformal_gate",
        "lang_kappa",
        "k_anonymity",
        "l_diversity",
        "trimmed_mean",
        "markov_eval",
        "label_centroid_dist",
        "shard_assign",
        "compression_ratio",
        "ht_estimate",
    ]
    # INTERLEAVED repetitions + medians (VERDICT r2 #1): this container's
    # co-tenant jitter is ±30-50% and can hold a multi-second plateau —
    # back-to-back reps of one query all land inside the same bad window
    # and make a 4x phantom regression unfalsifiable (BENCH_r02's
    # dedup_simhash 7.6 s vs 1.8 s reproduced-clean).  Round-robin over
    # the whole battery spreads each query's reps across the run so a
    # load window inflates one rep of many queries, which the median
    # discards; raw per-rep times ship in the JSON for auditability.
    q_reps = int(os.environ.get("GRAFT_QUERY_REPS", "3"))
    # the HEADLINE reps interleave with the battery rounds for the same
    # reason the battery interleaves with itself: 5 back-to-back reps at
    # bench start all land inside one co-tenant window (measured 03:13
    # run: first-rep column 2-5x the medians) — spreading them across the
    # multi-minute battery lets the median discard a single bad window
    up_front = (
        headline_reps
        if not bench_queries
        else max(1, headline_reps - q_reps)
    )
    # FAULT ISOLATION: one crashing rep (a transient Ray error, a noisy
    # OOM) must cost ONE data point, never the whole battery — without
    # it a single failure late in a 30-minute run leaves the driver
    # with rc!=0 and NO JSON line at all.  Failed reps record as the
    # string "err:<Type>" in the raw arrays (auditable) and the median
    # is taken over the successful reps only.
    errors: dict[str, int] = {}
    # watchdog: a pathological executor stall (cf. the union-stall
    # forensic, BENCH/BASELINE.md) must cost one rep, not the driver's
    # whole bench window.  SIGALRM fires in the main thread and lands in
    # the blocking count()/write; the streaming executor tears down on
    # the exception path.  0 disables.
    rep_timeout = int(os.environ.get("GRAFT_REP_TIMEOUT", "600"))

    class _RepTimeout(Exception):
        pass

    def _guarded(fn, key: str):
        import signal

        use_alarm = (
            rep_timeout > 0
            and threading.current_thread() is threading.main_thread()
        )
        # LATE-ALARM RACE (ADVICE r3): the alarm can fire AFTER fn()
        # returns but BEFORE alarm(0) runs — an armed handler raising
        # there would escape the inner try and kill the battery, the
        # exact failure the watchdog exists to contain.  Two layers:
        # the handler only raises while ``armed`` (disarmed first thing
        # after fn() returns), and the whole body — including the
        # finally cleanup — sits inside an outer _RepTimeout catch so
        # even the one-bytecode disarm window cannot propagate.
        armed = [False]

        def _run():
            if use_alarm:
                def _on_alarm(signum, frame):
                    if armed[0]:
                        raise _RepTimeout(f"{key} exceeded {rep_timeout}s")

                prev = signal.signal(signal.SIGALRM, _on_alarm)
                armed[0] = True
                signal.alarm(rep_timeout)
            try:
                result = fn()
                armed[0] = False
                return result
            except Exception as e:  # noqa: BLE001 — harness boundary
                errors[key] = errors.get(key, 0) + 1
                return f"err:{type(e).__name__}"
            finally:
                if use_alarm:
                    armed[0] = False
                    signal.alarm(0)
                    signal.signal(signal.SIGALRM, prev)

        try:
            return _run()
        except _RepTimeout:
            errors[key] = errors.get(key, 0) + 1
            return "err:_RepTimeout"

    # WALL-CLOCK BUDGET: the battery is ~90 queries × 3 reps — fine in a
    # quiet window (~8 min), but a co-tenant plateau can stretch it past
    # whatever patience the caller has, and a killed process prints NO
    # JSON.  When the budget trips, remaining battery rounds are skipped
    # (medians fall back to the reps already taken; zero-rep queries
    # report null) and the HEADLINE reps — the north metric — always run
    # to completion.
    bench_budget = int(os.environ.get("GRAFT_BENCH_BUDGET", "1200"))
    t_start = time.time()
    budget_exceeded = False

    for _ in range(up_front):
        raw_headline.append(_guarded(_headline_rep, "headline"))
    q_raw: dict[str, list] = {name: [] for name in bench_queries}

    def _query_rep(name: str) -> float:
        t0 = time.time()
        r = qs[name](sf_dir)
        # driver-side-final queries return a pyarrow Table, not a Dataset
        r.count() if isinstance(r, ray.data.Dataset) else len(r)
        return round(time.time() - t0, 3)

    for _ in range(q_reps):
        for name in bench_queries:
            if time.time() - t_start > bench_budget:
                budget_exceeded = True
                break
            q_raw[name].append(
                _guarded(lambda n=name: _query_rep(n), name)
            )
        if budget_exceeded:
            break
        if bench_queries and len(raw_headline) < headline_reps:
            raw_headline.append(_guarded(_headline_rep, "headline"))
    # the headline is the contract metric — finish its reps regardless
    while len(raw_headline) < headline_reps:
        raw_headline.append(_guarded(_headline_rep, "headline"))

    def _median(ts: list) -> float | None:
        ok = sorted(t for t in ts if isinstance(t, (int, float)))
        return ok[len(ok) // 2] if ok else None

    headline = _median(raw_headline)
    qt = {name: _median(ts) for name, ts in q_raw.items()}

    result = {
        "metric": "flagship_conversion_sec",
        "value": round(headline, 3) if headline is not None else None,
        "unit": "sec",
        "raw_headline_secs": raw_headline,
        "queries": qt,
        "raw_query_secs": q_raw,
        "errors": errors,
        "budget_exceeded": budget_exceeded,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "num_cpus": ncpu,
        "docs": ndocs,
        "docs_per_sec": (
            round(ndocs / headline, 1) if headline else None
        ),
    }
    ray.shutdown()
    return result


def _run_subprocess(ncpu: int) -> dict:
    # scaling runs need compute >> fixed overhead (~3-5 s of plan/actor-ramp
    # per pipeline) for the efficiency ratio to measure the engine rather
    # than the constant; 96×5000 docs ≈ 8-10 min of single-CPU work
    env = dict(
        os.environ,
        RAY_GRAFT_CPUS=str(ncpu),
        # 192×5000 docs: at amplify=96 the 8-CPU run finishes in ~30 s of
        # which ~5-6 s is fixed plan/pool overhead, diluting measured
        # efficiency to 0.75; at 192 the overhead share halves and the
        # same engine measures 0.87 (both runs recorded in BENCH/BASELINE.md)
        GRAFT_AMPLIFY=os.environ.get("GRAFT_SCALING_AMPLIFY", "192"),
        GRAFT_HEADLINE_ONLY="1",
        GRAFT_HEADLINE_REPS="1",  # _scaling medians across its own reps
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def _scaling() -> None:
    # N vs 4N CPUs in fresh processes — the sandbox proxy for the N vs 4N
    # node criterion.  Default pair is (2, 8): measured on this container,
    # allocation-heavy python workloads scale near-linearly only up to
    # ~8-12 concurrent workers (pure busy loops reach 26×, but this
    # workload saturates memory bandwidth: task throughput peaks at 16
    # workers and REGRESSES at 32 — see BENCH/BASELINE.md).  Overridable:
    # GRAFT_SCALING_LO/HI=8/32 reproduces the saturated pair.
    lo = int(os.environ.get("GRAFT_SCALING_LO", "2"))
    hi = int(os.environ.get("GRAFT_SCALING_HI", "8"))
    reps = int(os.environ.get("GRAFT_SCALING_REPS", "3"))
    # median over repetitions per level: this container shares hardware
    # with other tenants and single runs jitter ±30%.  Median (not min)
    # avoids pairing a lucky run at one level with an unlucky one at the
    # other; every raw measurement is reported alongside.
    def med(ncpu: int) -> tuple[dict, list[float]]:
        runs = sorted(
            (_run_subprocess(ncpu) for _ in range(reps)),
            key=lambda r: r["value"],
        )
        return runs[len(runs) // 2], [r["value"] for r in runs]

    r_lo, raw_lo = med(lo)
    r_hi, raw_hi = med(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    report = {
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": r_lo["value"],
        "sec_hi": r_hi["value"],
        "raw_secs_lo": raw_lo,
        "raw_secs_hi": raw_hi,
        "docs_per_sec_lo": r_lo["docs_per_sec"],
        "docs_per_sec_hi": r_hi["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "docs": r_hi["docs"],
        "sf": r_hi["sf"],
    }
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(md), exist_ok=True)
    with open(md, "a") as f:
        f.write(
            f"\n| {time.strftime('%Y-%m-%d %H:%M')} | {report['docs']} docs "
            f"(sf{report['sf']}) | {report['sec_lo']}s @{lo}cpu "
            f"({report['docs_per_sec_lo']}/s) | {report['sec_hi']}s @{hi}cpu "
            f"({report['docs_per_sec_hi']}/s) | "
            f"{report['scaling_efficiency']} |"
        )
    print(json.dumps(report))


SKEW_MEGA_MOD = 1000  # every SKEW_MEGA_MOD-th doc becomes a mega doc
SKEW_MEGA_REPEAT = 1000  # its text repeated this many times (~2 MB)


def _skew_bench() -> None:
    """Measure convert_pipeline vs convert_pipeline_heavy_split on a
    mega-document-heavy corpus (VERDICT r1 next-step #7: the
    head-of-line-blocking fix was asserted, not measured).  Corpus: sf0.1
    documents where every SKEW_MEGA_MOD-th doc's text is repeated
    SKEW_MEGA_REPEAT times (~2 MB payloads, ~0.1% of rows) — the
    500-page-PDF shape.  Appends a row to BENCH/BASELINE.md and prints
    ONE JSON line."""
    sys.path.insert(0, REPO)
    os.chdir(REPO)
    os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data
    from docling_api_ray.config import PipelineConfig
    from docling_api_ray.pipelines.convert import (
        convert_pipeline,
        convert_pipeline_heavy_split,
    )
    from docling_api_ray.sources.testdata import synthesize_raw_batch

    def amplify_heavy(b: pa.Table) -> pa.Table:
        # mega documents at ids ≡ 1 (mod SKEW_MEGA_MOD) so megas are
        # never media docs (id % 3 != 0 mostly) — media count scales
        # with text and would otherwise turn the skew bench into a
        # PNG-encode bench
        ids = b["doc_id"]
        mega = pc.equal(
            pc.subtract(
                ids, pc.multiply(pc.divide(ids, SKEW_MEGA_MOD), SKEW_MEGA_MOD)
            ),
            1,
        )
        texts = b["text"].to_pylist()
        flags = mega.to_pylist()
        out = [
            (" ".join([t] * SKEW_MEGA_REPEAT)) if f else t
            for t, f in zip(texts, flags)
        ]
        return pa.table({"doc_id": b["doc_id"],
                         "text": pa.array(out, type=pa.string())})

    def skewed_raw():
        # amplified source (range-based, parallel) → mega inflation →
        # raw payload synthesis
        base = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        amp = int(os.environ.get("GRAFT_SKEW_AMPLIFY", "4"))
        if amp > 1:
            import pyarrow.parquet as pq

            tbl = pq.read_table(
                os.path.join(sf_dir, "documents.parquet"),
                columns=["doc_id", "text"],
            ).sort_by("doc_id")
            nb = tbl.num_rows
            ref = ray.put(tbl)

            def expand(batch: pa.Table) -> pa.Table:
                import numpy as np

                t = ray.get(ref)
                ids = np.asarray(batch["id"], dtype=np.int64)
                copy, pos = np.divmod(ids, nb)
                return pa.table(
                    {
                        "doc_id": pa.array(
                            np.asarray(t["doc_id"], dtype=np.int64)[pos]
                            + copy * 11_640_000
                        ),
                        "text": t["text"].take(pa.array(pos)),
                    }
                )

            base = ray.data.range(nb * amp).map_batches(
                expand, batch_format="pyarrow"
            )
        return base.map_batches(
            amplify_heavy, batch_format="pyarrow"
        ).map_batches(synthesize_raw_batch, batch_format="pyarrow")

    import dataclasses

    cfg = PipelineConfig(extract_tables_as_images=True,
                         convert_concurrency=ncpu, convert_batch_size=512)
    cfg_norebal = dataclasses.replace(cfg, rebalance_target_cost=None)
    convert_pipeline(skewed_raw(), cfg).count()  # warm-up

    # interleaved reps + medians: this container's run-to-run jitter is
    # ±30% (see _scaling notes), far above the effect size of a single run
    reps = int(os.environ.get("GRAFT_SKEW_REPS", "3"))
    variants = {
        "no_rebalance": lambda: convert_pipeline(skewed_raw(), cfg_norebal),
        "rebalance": lambda: convert_pipeline(
            skewed_raw(),
            dataclasses.replace(cfg, rebalance_target_cost=1 << 20),
        ),
        "heavy_split": lambda: convert_pipeline_heavy_split(skewed_raw(), cfg),
    }
    times: dict[str, list[float]] = {k: [] for k in variants}
    counts = set()
    for _ in range(reps):
        for name, build in variants.items():
            t0 = time.time()
            counts.add(build().count())
            times[name].append(round(time.time() - t0, 2))
    assert len(counts) == 1
    n = counts.pop()

    def med(xs: list[float]) -> float:
        return sorted(xs)[len(xs) // 2]

    naive, plain, split = (
        med(times["no_rebalance"]), med(times["rebalance"]),
        med(times["heavy_split"]),
    )
    report = {
        "metric": "skew_corpus_sec",
        "docs": n,
        "no_rebalance_sec": naive,
        "rebalance_sec": plain,
        "heavy_split_sec": split,
        "raw": times,
        "best_speedup_vs_naive": round(naive / min(plain, split), 2),
        "num_cpus": ncpu,
    }
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(md), exist_ok=True)
    with open(md, "a") as f:
        f.write(
            f"\n| skew {time.strftime('%Y-%m-%d %H:%M')} | {n} docs, "
            f"1/{SKEW_MEGA_MOD} mega ({SKEW_MEGA_REPEAT}x) | "
            f"no-rebalance {report['no_rebalance_sec']}s | "
            f"cost-rebalance {report['rebalance_sec']}s | heavy-split "
            f"{report['heavy_split_sec']}s | best speedup "
            f"{report['best_speedup_vs_naive']}x |"
        )
    ray.shutdown()
    print(json.dumps(report))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        _scaling()
    elif "--skew" in sys.argv:
        _skew_bench()
    else:
        result = _bench_once()
        # full record first (raw rep arrays + all per-query medians —
        # auditable), then a BOUNDED contract line LAST: the driver parses
        # the final stdout line and its tail capture is ~2 KB.  r3's fix
        # still embedded the full 181-entry `queries` medians dict (~4-5 KB)
        # in the "compact" line, so the capture started mid-JSON and two
        # rounds recorded `parsed: null` (VERDICT r4 #1).  The final line
        # therefore carries headline fields + COUNTS only, at a size
        # independent of battery growth; the per-query medians live on the
        # preceding full-record line.
        print(json.dumps(result))
        compact = {
            k: result[k]
            for k in (
                "metric", "value", "unit", "budget_exceeded", "sf",
                "num_cpus", "docs", "docs_per_sec",
            )
        }
        compact["n_queries"] = len(result.get("queries", {}))
        compact["n_errors"] = len(result.get("errors", {}))
        line = json.dumps(compact)
        # hard bound: the contract line must always fit the tail capture
        assert len(line) < 1500, f"final bench line {len(line)}B > 1500B"
        print(line)
