"""Streaming near-dup index (actor-sharded band index): agreement with
the batch LSH path, cross-batch mutation, and Parquet checkpointing."""

import pyarrow as pa
import ray.data as rd

from kg_gen_ray.state.dedup_index import StreamingDedupIndex


def corpus():
    base = " ".join(f"w{i}" for i in range(40))
    texts = {
        0: base,                                  # cluster {0,1,2}
        1: base + " tail",
        2: base.replace("w39", "w999"),
        3: " ".join(f"x{i}" for i in range(40)),  # singleton
        4: " ".join(f"y{i}" for i in range(40)),  # singleton
    }
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": pa.array(list(texts.values()), pa.string())}))


def test_streaming_matches_batch_first_seen(ray_session):
    """Single ordered batch: the streamed filter must keep exactly the
    batch path's survivors (first-seen == lowest id here)."""
    from kg_gen_ray.functions.dedup import near_dup_canonical

    docs = corpus()
    batch_keep = sorted(r["doc_id"] for r in
                        near_dup_canonical(docs, method="fast").take_all())
    idx = StreamingDedupIndex(n_shards=3)
    stream_keep = sorted(r["doc_id"] for r in
                         idx.filter_new(docs.repartition(1)).take_all())
    assert stream_keep == batch_keep == [0, 3, 4]


def test_cross_batch_mutation_and_checkpoint(ray_session, tmp_path):
    """A doc admitted in increment 1 must knock out its near-dup in
    increment 2 — including after a save/load round-trip (the persisted
    corpus-index contract)."""
    base = " ".join(f"w{i}" for i in range(40))
    inc1 = rd.from_arrow(pa.table({
        "doc_id": pa.array([10], pa.int64()),
        "text": pa.array([base], pa.string())}))
    inc2 = rd.from_arrow(pa.table({
        "doc_id": pa.array([20, 21], pa.int64()),
        "text": pa.array([base + " tail",                 # near-dup of 10
                          " ".join(f"z{i}" for i in range(40))],
                         pa.string())}))

    idx = StreamingDedupIndex(n_shards=2)
    assert [r["doc_id"] for r in idx.filter_new(inc1).take_all()] == [10]
    n_before = idx.n_keys()
    assert n_before > 0

    ckpt = str(tmp_path / "band_index")
    idx.save(ckpt)
    idx2 = StreamingDedupIndex.load(ckpt)
    assert idx2.n_keys() == n_before

    kept = sorted(r["doc_id"] for r in idx2.filter_new(inc2).take_all())
    assert kept == [21]
    # the admitted doc registered its bands in the restored index
    assert idx2.n_keys() > n_before


def test_same_batch_first_wins(ray_session):
    """Two exact dups inside ONE call: the earlier row owns the band,
    the later is flagged — per-shard atomicity."""
    base = " ".join(f"q{i}" for i in range(40))
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([7, 8], pa.int64()),
        "text": pa.array([base, base], pa.string())}))
    idx = StreamingDedupIndex(n_shards=1)
    kept = [r["doc_id"] for r in idx.filter_new(docs).take_all()]
    assert kept == [7]


def test_ahash_family_same_survivors(ray_session):
    """The max-throughput ahash signature family plugs into the index and
    finds the same planted structure (families are internally consistent;
    they just don't collide with each other)."""
    from kg_gen_ray.functions.fast_text import minhash_signatures_ahash

    idx = StreamingDedupIndex(n_shards=2,
                              signatures=minhash_signatures_ahash)
    kept = sorted(r["doc_id"] for r in
                  idx.filter_new(corpus().repartition(1)).take_all())
    assert kept == [0, 3, 4]


def test_race_cannot_drop_both_copies(ray_session):
    """Adversarial owner pattern: doc 30 owns one shared band, doc 31
    owns the other (the worst-case interleaving of two concurrent
    tasks). The owner<doc rule must keep the LOWER id; an any-hit rule
    would drop both. Simulated by pre-seeding the shards exactly as the
    race would leave them."""
    import ray as _ray
    import numpy as np

    from kg_gen_ray.functions.fast_text import (
        band_keys_from_sig, minhash_signatures_fast)

    base = " ".join(f"r{i}" for i in range(40))
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([30, 31], pa.int64()),
        "text": pa.array([base, base + " tail"], pa.string())}))

    idx = StreamingDedupIndex(n_shards=1)
    # seed: every band of doc 30 owned by 31 and vice versa — the state
    # after each task won the other's race
    t = pa.table({"doc_id": pa.array([30, 31], pa.int64()),
                  "text": pa.array([base, base + " tail"], pa.string())})
    rows = band_keys_from_sig(minhash_signatures_fast(t))
    keys = rows["band_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    owners = rows["doc_id"].to_numpy(zero_copy_only=False)
    flipped = np.where(owners == 30, 31, 30).astype(np.int64)
    _ray.get(idx.shards[0].check_add.remote(keys, flipped))

    kept = sorted(r["doc_id"] for r in idx.filter_new(docs).take_all())
    # lower id never flagged by the higher owner; the HIGHER id IS
    # flagged by 30's band ownership — the full post-race contract
    assert kept == [30]


def test_load_refuses_missing_or_torn_checkpoint(ray_session, tmp_path):
    import os

    import pytest

    with pytest.raises(FileNotFoundError):
        StreamingDedupIndex.load(str(tmp_path / "nope"))

    base = " ".join(f"s{i}" for i in range(40))
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array([base], pa.string())}))
    idx = StreamingDedupIndex(n_shards=3)
    idx.filter_new(docs).count()
    ckpt = str(tmp_path / "ck")
    idx.save(ckpt)
    os.remove(os.path.join(ckpt, "shard-00001.parquet"))
    with pytest.raises(ValueError):
        StreamingDedupIndex.load(ckpt)


def test_out_of_order_ids_still_dedup(ray_session):
    """Hash-derived ids arrive in arbitrary order. Min-id ownership
    migration must keep the index effective: a high-id doc indexed first
    must still knock out later near-dups, AND an admitted lower-id doc
    takes over the band so later mid-ids are caught too (the 'shield'
    regression)."""
    base = " ".join(f"o{i}" for i in range(40))
    inc1 = rd.from_arrow(pa.table({
        "doc_id": pa.array([900], pa.int64()),
        "text": pa.array([base], pa.string())}))
    inc2 = rd.from_arrow(pa.table({
        "doc_id": pa.array([5], pa.int64()),
        "text": pa.array([base + " tail"], pa.string())}))
    inc3 = rd.from_arrow(pa.table({
        "doc_id": pa.array([50], pa.int64()),
        "text": pa.array([base + " other"], pa.string())}))

    idx = StreamingDedupIndex(n_shards=2)
    assert [r["doc_id"] for r in idx.filter_new(inc1).take_all()] == [900]
    # 5 < 900: admitted (keep-lowest can't be flagged by a higher owner),
    # and ownership migrates to 5
    assert [r["doc_id"] for r in idx.filter_new(inc2).take_all()] == [5]
    # 50 > 5: caught by the migrated owner — without migration the band
    # would still say 900 and 50 would leak through
    assert idx.filter_new(inc3).count() == 0


def test_load_refuses_signature_family_mismatch(ray_session, tmp_path):
    import pytest

    from kg_gen_ray.functions.fast_text import minhash_signatures_ahash

    base = " ".join(f"f{i}" for i in range(40))
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array([base], pa.string())}))
    idx = StreamingDedupIndex(n_shards=2,
                              signatures=minhash_signatures_ahash)
    idx.filter_new(docs).count()
    ckpt = str(tmp_path / "fam")
    idx.save(ckpt)
    with pytest.raises(ValueError):
        StreamingDedupIndex.load(ckpt)        # default family != ahash
    ok = StreamingDedupIndex.load(ckpt, signatures=minhash_signatures_ahash)
    assert ok.n_keys() > 0


def test_load_refuses_manifestless_checkpoint(ray_session, tmp_path):
    """Shard files without manifest.json cannot be validated (shard
    count, signature family) — load must refuse, not silently restore."""
    import os

    import pytest

    base = " ".join(f"s{i}" for i in range(40))
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array([base], pa.string())}))
    idx = StreamingDedupIndex(n_shards=2)
    idx.filter_new(docs).count()
    ckpt = str(tmp_path / "ck2")
    idx.save(ckpt)
    os.remove(os.path.join(ckpt, "manifest.json"))
    with pytest.raises(FileNotFoundError, match="manifest"):
        StreamingDedupIndex.load(ckpt)


def test_resave_replaces_checkpoint_atomically(ray_session, tmp_path):
    """Re-saving with a DIFFERENT shard count must replace the whole
    directory: a plain overwrite would leave the wider generation's
    stale shard files behind, making load() refuse a valid checkpoint
    (or, torn the other way, silently restore a mixed-generation
    index)."""
    import os
    base = " ".join(f"s{i}" for i in range(40))
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array([base], pa.string())}))
    ckpt = str(tmp_path / "ck")
    wide = StreamingDedupIndex(n_shards=8)
    wide.filter_new(docs).count()
    wide.save(ckpt)
    narrow = StreamingDedupIndex(n_shards=2)
    narrow.filter_new(docs).count()
    narrow.save(ckpt)
    assert sorted(f for f in os.listdir(ckpt)
                  if f.startswith("shard-")) == \
        ["shard-00000.parquet", "shard-00001.parquet"]
    restored = StreamingDedupIndex.load(ckpt)
    assert restored.n_shards == 2
    # the restored index still knows the doc: a re-filter admits nothing new
    dup = rd.from_arrow(pa.table({
        "doc_id": pa.array([9], pa.int64()),
        "text": pa.array([base], pa.string())}))
    assert restored.filter_new(dup).count() == 0
