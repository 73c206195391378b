"""Incremental corpus-release composition, end-to-end (VERDICT r4 #3).

Each piece is unit-tested alone; this drives the actual 100-TB
operating story as ONE flow over a single corpus release:

    snapshot_diff(old, new)
      -> retire_ids(changed ∪ removed)          # store maintenance
      -> process_batch(added ∪ changed)         # incremental dedup
      -> DriftMonitor(batch)                    # distribution gate
      -> write_jsonl(shuffle_seed=...) + verify_manifest  # export

Only DELTA documents flow past the diff — the test pins that no stage
rescans the unchanged corpus (row counts are delta-sized throughout)
and that the export manifest verifies clean.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from acled_spark.dedup_store import init_store, process_batch, retire_ids
from acled_spark.drift import DriftMonitor, init_reference
from acled_spark.export import read_jsonl, verify_manifest, write_jsonl, write_manifest
from acled_spark.queries.cdc import snapshot_diff
from acled_spark.tables import load

SF_DIR = "/root/testdata/sf0.001"
DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]
DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_incremental_release_end_to_end(spark, tmp_path):
    docs = load(spark, SF_DIR, "documents").select(*DOC_COLS)

    # --- the release: modulus-derived old/new snapshots + one planted
    # added doc whose text exactly duplicates a surviving old doc
    old = docs.filter(F.col("doc_id") % 11 != 3)
    dup_src = docs.filter(F.col("doc_id") == 1).limit(1)
    planted_dup = dup_src.withColumn("doc_id", F.lit(900001).cast("long"))
    new = (
        docs.filter(F.col("doc_id") % 13 != 5)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.col("text"), F.lit(" rev2")),
            ).otherwise(F.col("text")),
        )
        .unionByName(planted_dup)
    )

    # --- stage 1: diff (digest-only; text never shuffles)
    diff = snapshot_diff(old, new).localCheckpoint()
    by_status = {
        r["status"]: r["n"]
        for r in diff.groupBy("status").agg(F.count("*").alias("n")).collect()
    }
    assert by_status.get("added", 0) >= 2  # %11 adds + planted dup
    assert by_status.get("changed", 0) >= 1
    assert by_status.get("removed", 0) >= 1

    delta_ids = diff.filter(F.col("status").isin("added", "changed"))
    delta = new.join(delta_ids.select("doc_id"), "doc_id", "left_semi")
    n_delta = delta.count()
    assert n_delta == by_status["added"] + by_status["changed"]
    assert n_delta < docs.count() / 3  # delta-sized, not corpus-sized

    # --- stage 2: store maintenance + incremental dedup on the delta
    store = str(tmp_path / "sigstore")
    init_store(old, store)
    retired = retire_ids(
        spark,
        diff.filter(F.col("status").isin("changed", "removed")),
        store,
    )
    assert retired == by_status["changed"] + by_status["removed"]

    # changed docs re-key under their existing ids without tripping the
    # id-reuse guard (the seam this composition exposed)
    verdicts, n_appended = process_batch(spark, delta, store)
    v = {r["doc_id"]: r for r in verdicts.collect()}
    assert len(v) == n_delta
    assert v[900001]["is_exact_dup"]
    assert v[900001]["dup_of"] == 1
    n_dups = sum(
        1 for r in v.values() if r["is_exact_dup"] or r["is_batch_dup"]
    )
    assert n_appended == n_delta - n_dups

    # --- stage 3: drift gate on the delta batch vs the old-corpus
    # reference (n_chars distribution per source)
    ref = str(tmp_path / "drift_ref")
    init_reference(old, ref, value_col="n_chars", group_col="source", width=200.0)
    captured = []
    mon = DriftMonitor(
        ref,
        value_col="n_chars",
        group_col="source",
        width=200.0,
        on_scores=lambda s: captured.append(s.collect()),
    )
    mon(delta, epoch_id=0)
    assert mon.batches_scored == 1
    scores = {r["group"]: r for r in captured[0]}
    assert scores  # every source that appears in either side is scored
    for r in scores.values():
        assert r["psi"] >= 0.0  # finite, smoothed — never NaN/inf

    # --- stage 4: shuffled export of the surviving delta + manifest
    survivors = delta.join(
        verdicts.filter(
            ~F.col("is_exact_dup") & ~F.col("is_batch_dup")
        ).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    out = str(tmp_path / "release_export")
    write_jsonl(
        survivors, out, shards=4, sort_col="doc_id",
        shuffle_seed="release-r5", compression="none",
    )
    back = read_jsonl(spark, out, DOC_SCHEMA)
    # an empty shuffle bucket writes no part file, so the shard count
    # is bounded by — not pinned to — the requested bucket count
    assert 1 <= write_manifest(back, out) <= 4
    assert verify_manifest(spark, out, DOC_SCHEMA) == []

    # the export is exactly the deduped delta — no unchanged doc leaked
    exported_ids = {r["doc_id"] for r in back.select("doc_id").collect()}
    assert exported_ids == {
        i for i, r in v.items() if not (r["is_exact_dup"] or r["is_batch_dup"])
    }
    assert len(exported_ids) == n_appended


def test_retire_ids_store_roundtrip(spark, tmp_path):
    """retire_ids drops exactly the named ids from BOTH tables and the
    staged swap leaves a readable store (no leftover staging dir)."""
    from acled_spark.dedup_store import _read_bands, _read_exact

    docs = load(spark, SF_DIR, "documents").select(*DOC_COLS).limit(50)
    store = str(tmp_path / "s")
    init_store(docs, store)
    n0 = _read_exact(spark, store).count()

    ids = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id")
    n_retired = retire_ids(spark, ids, store)
    assert n_retired == ids.count()
    assert _read_exact(spark, store).count() == n0 - n_retired
    left = _read_bands(spark, store).join(ids, "doc_id", "left_semi")
    assert left.count() == 0
    assert not os.path.exists(store + "._retire_staging")

    # retiring already-absent ids is a no-op (idempotent release replay)
    assert retire_ids(spark, ids, store) == 0


def test_retire_ids_table_backend(spark):
    """Same retirement contract on the bucketed table: backend — the
    overwrite restates the bucket spec, and a changed doc re-keys under
    its id after retirement."""
    from acled_spark.dedup_store import _read_exact, check_batch

    troot = "table:retire_t"
    for t in ("retire_t_exact", "retire_t_bands"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        docs = load(spark, SF_DIR, "documents").select(*DOC_COLS).limit(40)
        init_store(docs, troot)
        n0 = _read_exact(spark, troot).count()

        ids = docs.filter(F.col("doc_id") % 4 == 0).select("doc_id")
        n_retired = retire_ids(spark, ids, troot)
        assert n_retired == ids.count()
        assert _read_exact(spark, troot).count() == n0 - n_retired

        # bucket spec survives the rewrite
        desc = {
            r["col_name"]: r["data_type"]
            for r in spark.sql("DESCRIBE TABLE EXTENDED retire_t_exact").collect()
        }
        assert "fingerprint" in desc.get("Bucket Columns", "")

        # a retired id re-keys with new text, no id-reuse conflict
        some_id = ids.limit(1).collect()[0]["doc_id"]
        changed = spark.createDataFrame(
            [(some_id, "entirely new text after retirement", "en", "s", 33)],
            DOC_SCHEMA,
        )
        verdicts, n = process_batch(spark, changed, troot)
        assert n == 1
        v = check_batch(spark, changed, troot).collect()[0]
        assert v["is_exact_dup"] and v["dup_of"] == some_id
    finally:
        for t in ("retire_t_exact", "retire_t_bands"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
