"""Hand-built fixtures for append-mode dedup (stages/incremental.py):
history-wins precedence (even when the committed doc has the LARGER
id), within-batch min-id-first, and the no-collision passthrough."""

import numpy as np
import pyarrow as pa
import ray.data

from docling_api_ray.stages.incremental import (
    incremental_exact_keep,
    incremental_minhash_keep,
)


def _ds(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def _kept(ds):
    return sorted(r["doc_id"] for r in ds.take_all())


def test_exact_history_wins_even_with_larger_id():
    old = _ds([(9, "alpha beta"), (20, "gamma")])
    # doc 8 < 9 but history wins; doc 30 collides within-batch with 31
    new = _ds([(8, "alpha beta"), (30, "delta"), (31, "delta"), (40, "unique")])
    out = incremental_exact_keep(
        old.map_batches(lambda b: b.rename_columns(["doc_id", "fp"]), batch_format="pyarrow"),
        new.map_batches(lambda b: b.rename_columns(["doc_id", "fp"]), batch_format="pyarrow"),
        key_col="fp",
    )
    assert _kept(out) == [30, 40]


def test_exact_empty_history_keeps_batch_minids():
    old = _ds([])
    new = _ds([(1, "x"), (2, "x"), (3, "y")])
    out = incremental_exact_keep(
        old.map_batches(lambda b: b.rename_columns(["doc_id", "fp"]), batch_format="pyarrow"),
        new.map_batches(lambda b: b.rename_columns(["doc_id", "fp"]), batch_format="pyarrow"),
        key_col="fp",
    )
    assert _kept(out) == [1, 3]


_BASE = "the quick brown fox jumps over the lazy dog again and again " * 4


def test_minhash_history_wins_and_batch_order():
    # identical text → signature est 1.0 ≥ any threshold
    old = _ds([(100, _BASE)])
    new = _ds([
        (8, _BASE),            # near-dup of history (larger id) → dropped
        (50, _BASE + "tail"),  # near-dup of history → dropped
        (60, "completely different words entirely " * 10),  # kept
        (70, "completely different words entirely " * 10),  # dup of 60 → dropped
    ])
    out = incremental_minhash_keep(old, new, threshold=0.7)
    assert _kept(out) == [60]


def test_minhash_no_collisions_keeps_all():
    old = _ds([(1, "one two three " * 10)])
    new = _ds([(8, "totally unrelated content here " * 10)])
    out = incremental_minhash_keep(old, new, threshold=0.7)
    assert _kept(out) == [8]


def test_minhash_skips_old_only_buckets():
    """A bucket containing ONLY committed docs must produce no work and
    no drops — the incoming doc shares nothing with history."""
    old = _ds([(1, _BASE), (2, _BASE)])  # old near-dup pair (pre-committed)
    new = _ds([(8, "fresh novel text with new words " * 8)])
    out = incremental_minhash_keep(old, new, threshold=0.7)
    assert _kept(out) == [8]


def test_minhash_adversarial_all_dup_batch():
    """Worst-case append: EVERY incoming doc near-dups history — the
    drop set reaches its bound (the whole batch) and the keep result
    is empty, with no mega-block or driver blowup."""
    base = "every incoming document duplicates this exact history text " * 6
    old = _ds([(i, base) for i in range(10)])
    new = _ds([(1000 + i, base + f" v{i % 2}") for i in range(40)])
    out = incremental_minhash_keep(old, new, threshold=0.7)
    assert _kept(out) == []


def test_exact_adversarial_all_dup_batch():
    old = _ds([(i, f"h{i % 5}") for i in range(10)])
    new = _ds([(1000 + i, f"h{i % 5}") for i in range(50)])
    out = incremental_exact_keep(
        old.map_batches(
            lambda b: b.rename_columns(["doc_id", "fp"]),
            batch_format="pyarrow",
        ),
        new.map_batches(
            lambda b: b.rename_columns(["doc_id", "fp"]),
            batch_format="pyarrow",
        ),
        key_col="fp",
    )
    assert _kept(out) == []


def test_indexed_paths_match_recompute(tmp_path):
    """write_dedup_index + the *_indexed readers must reproduce the
    recompute paths exactly — committed text is never re-read."""
    from docling_api_ray.stages.incremental import (
        incremental_exact_keep_indexed,
        incremental_minhash_keep_indexed,
        write_dedup_index,
    )

    old = _ds([(100, _BASE), (2, "gamma delta " * 8)])
    new = _ds([
        (8, _BASE),                                   # dup of history
        (60, "completely different words here " * 10),
        (70, "completely different words here " * 10),  # dup of 60
    ])
    idx = str(tmp_path / "dedup_index")
    write_dedup_index(old, idx)

    got_mh = _kept(incremental_minhash_keep_indexed(idx, new, threshold=0.7))
    exp_mh = _kept(incremental_minhash_keep(old, new, threshold=0.7))
    assert got_mh == exp_mh == [60]

    got_ex = _kept(incremental_exact_keep_indexed(idx, new))
    assert got_ex == [60]  # 8 exact-dups history, 70 loses to 60


def test_append_dedup_exact_logs_no_schema_warnings():
    """VERDICT r3 #5: the append-dedup co-group path must emit ZERO
    'different schema' executor warnings in a fresh run at sf0.001 —
    the narrow digest exchange bundle-coalesces before the sort, so no
    empty schema-less ranges exist to warn about."""
    import logging

    import __ray_entry__ as e

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
        out = e.queries()["append_dedup_exact"]("/root/testdata/sf0.001")
        assert out.count() > 0
    finally:
        logger.removeHandler(h)
    assert records == []
