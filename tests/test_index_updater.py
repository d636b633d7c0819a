"""IndexUpdater semantics (mirror of colbert/tests/index_updater_test.py:
50-208): remove pids → gone from results; re-add → results restored;
coalesce → identical rankings with fewer blocks."""

from __future__ import annotations

import numpy as np
import pytest
import pyspark.sql.functions as F

from colbert_spark.operators import builder
from colbert_spark.plans.config import ColBERTConfig
from colbert_spark.plans.index_updater import IndexUpdater
from colbert_spark.plans.indexer import Indexer
from colbert_spark.plans.searcher import Searcher
from colbert_spark.sources.catalog import IndexCatalog
from colbert_spark.sources.datagen import gen_docs_pdf, gen_queries_pdf


@pytest.fixture()
def env(spark, tmp_path):
    cfg = ColBERTConfig(
        index_root=str(tmp_path), block_size=32, index_partitions=8,
        max_group_postings=50, shuffle_partitions=8,
    )
    docs_pdf = gen_docs_pdf(np.arange(200))
    docs_pdf["pid"] = np.arange(200)
    docs = spark.createDataFrame(docs_pdf[["pid", "text"]])
    queries = spark.createDataFrame(gen_queries_pdf(np.arange(12)))
    Indexer(cfg).index("u1", docs, overwrite=True)
    return cfg, docs, queries


def _rank(spark, cfg, queries):
    return sorted(map(tuple,
                      Searcher("u1", spark, cfg).search_all(queries, k=10).df.collect()))


def test_remove_then_readd_restores(spark, env):
    cfg, docs, queries = env
    before = _rank(spark, cfg, queries)
    victims = sorted({r[1] for r in before})[:3]  # pids appearing in results

    up = IndexUpdater("u1", spark, cfg)
    up.remove(victims)
    after_remove = _rank(spark, cfg, queries)
    assert all(pid not in victims for (_, pid, _, _) in after_remove)
    assert after_remove != before

    up2 = IndexUpdater("u1", spark, cfg)
    up2.add(docs.filter(F.col("pid").isin(victims)))
    after_readd = _rank(spark, cfg, queries)
    assert after_readd == before  # frozen stats ⇒ exact restoration


def test_add_duplicate_pid_rejected(spark, env):
    cfg, docs, _ = env
    with pytest.raises(ValueError, match="already live"):
        IndexUpdater("u1", spark, cfg).add(docs.filter(F.col("pid") == 5))


def test_add_new_docs_and_terms_searchable(spark, env):
    cfg, docs, queries = env
    new = spark.createDataFrame(
        [(1000, "zzbrandnew zzbrandnew t00000 t00004"),
         (1001, "zzbrandnew other words here")],
        "pid long, text string",
    )
    IndexUpdater("u1", spark, cfg).add(new)
    s = Searcher("u1", spark, cfg)
    pids, ranks, scores = s.search("zzbrandnew", k=5)
    assert set(pids) == {1000, 1001}
    assert pids[0] == 1000  # tf=2 beats tf=1


def test_coalesce_preserves_rankings_and_compacts(spark, env):
    cfg, docs, queries = env
    import pathlib as _pl
    cat = IndexCatalog(str(_pl.Path(cfg.index_root) / "u1"))
    before = _rank(spark, cfg, queries)
    n_blocks_before = cat.read(spark, "postings").count()

    up = IndexUpdater("u1", spark, cfg)
    up.remove([0, 1, 2])
    builder.coalesce_index(cat, cfg, up.avgdl)
    after = _rank(spark, cfg, queries)
    # tombstones physically gone; results identical to tombstone-filtered
    removed_live = {r[1] for r in after} & {0, 1, 2}
    assert not removed_live
    n_blocks_after = cat.read(spark, "postings").count()
    # salted head term (4 salt runs) merges into fewer, fuller blocks
    assert n_blocks_after <= n_blocks_before
    # no tombstones left on disk
    import pathlib
    assert not pathlib.Path(cat.path("tombstones")).exists()
    # rankings equal a fresh searcher's view before compaction
    up_check = _rank(spark, cfg, queries)
    assert up_check == after


def test_readd_after_direct_coalesce(spark, env):
    """remove → coalesce_index directly → re-add one of the removed pids.
    Compaction must prune doc_stats along with the postings: before the
    fix a removed pid still sat in doc_stats after a direct compaction,
    and add()'s clash check raised a false "already live" ValueError for
    a doc that was physically gone."""
    cfg, docs, queries = env
    import pathlib as _pl
    cat = IndexCatalog(str(_pl.Path(cfg.index_root) / "u1"))
    before = _rank(spark, cfg, queries)
    victims = sorted({r[1] for r in before})[:3]

    up = IndexUpdater("u1", spark, cfg)
    up.remove(victims)
    builder.coalesce_index(cat, cfg, up.avgdl)
    # doc_stats shrank with the postings
    live_pids = {r["pid"] for r in cat.read(spark, "doc_stats").collect()}
    assert not (live_pids & set(victims))

    up2 = IndexUpdater("u1", spark, cfg)
    up2.add(docs.filter(F.col("pid").isin(victims)))  # must not raise
    assert _rank(spark, cfg, queries) == before  # frozen stats ⇒ restored


def test_readd_path_avoids_driver_collect(spark, env, monkeypatch):
    """The re-add branch must not round-trip the tombstone table through
    the driver (remove()'s contract: tombstone tables can be large)."""
    cfg, docs, queries = env
    from pyspark.sql import DataFrame
    before = _rank(spark, cfg, queries)
    victims = sorted({r[1] for r in before})[:2]
    up = IndexUpdater("u1", spark, cfg)
    up.remove(victims)

    def _no_pandas(self):
        raise AssertionError("tombstones collected to the driver")

    monkeypatch.setattr(DataFrame, "toPandas", _no_pandas)
    IndexUpdater("u1", spark, cfg).add(docs.filter(F.col("pid").isin(victims)))
    monkeypatch.undo()
    assert _rank(spark, cfg, queries) == before


def test_large_tombstone_set_forces_scatter(spark, env, monkeypatch):
    """Past _TOMBSTONE_GATHER_MAX the exclusion set must stay a DataFrame
    (distributed anti-join) instead of riding the gather kernel's closure
    as a driver numpy array — and rankings must be identical."""
    cfg, docs, queries = env
    removed = list(range(100, 120))
    IndexUpdater("u1", spark, cfg).remove(removed)

    base = Searcher("u1", spark, cfg)
    assert base.tombstones is not None  # 20 < default threshold → numpy path
    expect = sorted(map(tuple,
                        base.search_all(queries, k=10, mode="gather")
                        .df.collect()))
    assert all(pid not in set(removed) for (_, pid, _, _) in expect)

    monkeypatch.setattr(Searcher, "_TOMBSTONE_GATHER_MAX", 5)
    s = Searcher("u1", spark, cfg)
    assert s.tombstones is None and s.tombstones_df is not None
    r = s.search_all(queries, k=10, mode="gather")
    assert r.provenance["mode"] == "scatter"  # guard overrode gather
    assert sorted(map(tuple, r.df.collect())) == expect


# -- epoch re-add + eager purge surgery (r5) ---------------------------------
# LSM epoch model: remove() = tombstone rows with an epoch bound; re-add =
# pure append in a fresh epoch (zero existing blocks/files touched — the
# O(batch) answer to the reference updater's patch-only-affected-chunks
# goal, colbert/index_updater.py:176-273). purge() = EAGER physical
# removal via block-targeted file surgery with the compaction-debt policy.


def _postings_files(cat):
    import pathlib
    return {
        str(p): (p.stat().st_size, p.stat().st_mtime_ns)
        for p in pathlib.Path(cat.path("postings")).rglob("part-*")
    }


def test_readd_is_pure_append_zero_files_touched(spark, env):
    """The headline property: a remove -> re-add cycle leaves EVERY
    pre-existing posting file byte-untouched (only new-epoch files
    appear) and restores rankings exactly — regardless of pid locality
    (these victims sit inside every block range)."""
    cfg, docs, queries = env
    import pathlib as _pl
    cat = IndexCatalog(str(_pl.Path(cfg.index_root) / "u1"))
    before = _rank(spark, cfg, queries)
    victims = sorted({r[1] for r in before})[:3]

    IndexUpdater("u1", spark, cfg).remove(victims)
    files_after_remove = _postings_files(cat)

    IndexUpdater("u1", spark, cfg).add(docs.filter(F.col("pid").isin(victims)))
    files_after_add = _postings_files(cat)
    for f, sig in files_after_remove.items():
        assert files_after_add.get(f) == sig, f"existing file {f} touched"
    assert len(files_after_add) > len(files_after_remove)  # new epoch files
    assert _rank(spark, cfg, queries) == before  # frozen stats => exact


def test_add_writes_at_most_one_file_per_bucket(spark, env):
    """Small-files guard: one append lands AT MOST index_partitions new
    posting files (each bucket co-located into one task before the
    partitionBy write, mirroring the build layout). The unaligned layout
    this regresses — hash-by-term_id tasks each spanning ~every mod-based
    bucket — wrote up to tasks×buckets tiny files per micro-batch
    (measured 655 for a 50-doc append at 32×32), which no object-store
    listing survives at streaming scale."""
    cfg, docs, queries = env
    import pathlib as _pl
    cat = IndexCatalog(str(_pl.Path(cfg.index_root) / "u1"))
    before = set(_postings_files(cat))

    # 40 docs over the full shared vocabulary → blocks in every bucket,
    # the worst case for write fan-out
    new_pdf = gen_docs_pdf(np.arange(40))
    new_pdf["pid"] = np.arange(5000, 5040)
    IndexUpdater("u1", spark, cfg).add(
        spark.createDataFrame(new_pdf[["pid", "text"]]))

    new_files = set(_postings_files(cat)) - before
    assert 0 < len(new_files) <= cfg.index_partitions, (
        f"append fanned out into {len(new_files)} files "
        f"(> index_partitions={cfg.index_partitions})")
    # and the appended docs are actually searchable through the new layout
    s = Searcher("u1", spark, cfg)
    pids, _, _ = s.search("t00000 t00004 t00007", k=50)
    assert any(p >= 5000 for p in pids)


def test_readd_then_remove_again_excludes_new_postings(spark, env):
    """Epoch bounds must refresh on re-removal: remove -> re-add ->
    remove again excludes BOTH generations of postings; coalesce folds
    them physically; a final re-add restores."""
    cfg, docs, queries = env
    before = _rank(spark, cfg, queries)
    victims = sorted({r[1] for r in before})[:2]
    readd = docs.filter(F.col("pid").isin(victims))

    IndexUpdater("u1", spark, cfg).remove(victims)
    after_remove = _rank(spark, cfg, queries)
    IndexUpdater("u1", spark, cfg).add(readd)
    assert _rank(spark, cfg, queries) == before
    IndexUpdater("u1", spark, cfg).remove(victims)
    assert _rank(spark, cfg, queries) == after_remove  # both epochs excluded

    up = IndexUpdater("u1", spark, cfg)
    builder.coalesce_index(up.catalog, up.config, up.avgdl)
    assert _rank(spark, cfg, queries) == after_remove  # fold preserves view
    IndexUpdater("u1", spark, cfg).add(readd)
    assert _rank(spark, cfg, queries) == before


def test_purge_pids_noop_when_absent(spark, env):
    cfg, docs, queries = env
    import pathlib as _pl
    cat = IndexCatalog(str(_pl.Path(cfg.index_root) / "u1"))
    up = IndexUpdater("u1", spark, cfg)
    before = _postings_files(cat)
    out = builder.purge_pids(cat, cfg, up.avgdl, [10_000_000])
    assert out["files_rewritten"] == 0
    assert _postings_files(cat) == before


def test_purge_bounded_file_subset(spark, env):
    """Eager purge of an appended-segment pid rewrites ONLY the appended
    files (pid 1000 lies outside every build-time block range)."""
    cfg, docs, queries = env
    import pathlib as _pl
    cat = IndexCatalog(str(_pl.Path(cfg.index_root) / "u1"))
    build_files = _postings_files(cat)

    new = spark.createDataFrame(
        [(1000, "zzseg one two t00003"), (1001, "zzseg three four")],
        "pid long, text string",
    )
    IndexUpdater("u1", spark, cfg).add(new)
    s = Searcher("u1", spark, cfg)
    assert set(s.search("zzseg", k=5)[0]) == {1000, 1001}

    up = IndexUpdater("u1", spark, cfg)
    out = up.purge([1000])
    assert out["fallback_recommended"] is False
    assert 1 <= out["files_rewritten"] < out["files_total"]
    after_files = _postings_files(cat)
    for f, sig in build_files.items():
        assert after_files.get(f) == sig, f"build file {f} was touched"
    assert Searcher("u1", spark, cfg).search("zzseg", k=5)[0] == [1001]
    # the swap must not strand local-fs .crc checksum siblings of the
    # deleted files: every remaining crc pairs with a live data file
    import pathlib
    post_dir = pathlib.Path(cat.path("postings"))
    for crc in post_dir.rglob(".*.crc"):
        paired = crc.parent / crc.name[1:-len(".crc")]
        assert paired.exists(), f"orphan checksum sidecar {crc}"


def test_purge_over_threshold_falls_back_to_coalesce(spark, env):
    cfg, docs, queries = env
    import dataclasses
    small = dataclasses.replace(cfg, max_purge_pids=1)
    before = _rank(spark, cfg, queries)
    victims = sorted({r[1] for r in before})[:3]
    up = IndexUpdater("u1", spark, small)
    out = up.purge(victims)
    assert out["fallback_recommended"] is True
    import pathlib
    assert not pathlib.Path(
        IndexCatalog(str(pathlib.Path(cfg.index_root) / "u1"))
        .path("tombstones")).exists()
    after = _rank(spark, cfg, queries)
    assert not ({r[1] for r in after} & set(victims))


def test_purge_scattered_pids_falls_back_to_full_fold(spark, env):
    """Range precision is data-dependent: purging pids that sit inside
    (nearly) every block range flags ~all files, and the policy takes the
    full coalesce (complete debt reset for the same write volume) instead
    of a whole-table no-shuffle rewrite."""
    cfg, docs, queries = env
    before = _rank(spark, cfg, queries)
    victims = sorted({r[1] for r in before})[:3]  # low pids in every range
    up = IndexUpdater("u1", spark, cfg)
    out = up.purge(victims)
    assert out["fallback_recommended"] is True
    assert out["files_rewritten"] == 0  # surgery never ran
    import pathlib
    assert not pathlib.Path(
        IndexCatalog(str(pathlib.Path(cfg.index_root) / "u1"))
        .path("tombstones")).exists()
    after = _rank(spark, cfg, queries)
    assert not ({r[1] for r in after} & set(victims))


def test_purge_crash_recovery_via_journal(spark, env, monkeypatch):
    """A crash between the journal write and the file moves/deletes leaves
    a redo journal; the next reader (Searcher) completes the surgery
    deterministically before serving queries."""
    import dataclasses
    cfg, docs, queries = env
    # scattered low pids flag every file -> the default policy would
    # coalesce; force the surgery so the journal machinery is exercised
    cfg = dataclasses.replace(cfg, purge_fallback_file_fraction=2.0)
    import pathlib as _pl
    cat = IndexCatalog(str(_pl.Path(cfg.index_root) / "u1"))
    before = _rank(spark, cfg, queries)
    victims = sorted({r[1] for r in before})[:2]
    IndexUpdater("u1", spark, cfg).remove(victims)
    after_remove = _rank(spark, cfg, queries)

    # crash simulation: staging + journal land, mutation step never runs
    real_redo = IndexCatalog._redo_rewrite
    monkeypatch.setattr(IndexCatalog, "_redo_rewrite",
                        lambda self, spark_: None)
    up = IndexUpdater("u1", spark, cfg)
    out = up.purge(victims)
    assert out["fallback_recommended"] is False
    monkeypatch.setattr(IndexCatalog, "_redo_rewrite", real_redo)
    assert cat.has_pending_rewrite()

    s = Searcher("u1", spark, cfg)  # recovery point
    assert not cat.has_pending_rewrite()
    # purged pids are physically gone == the tombstone-filtered view
    assert sorted(map(tuple, s.search_all(queries, k=10).df.collect())) \
        == after_remove


def test_segment_debt_and_maintain(spark, env):
    """Debt-driven compaction policy: metadata-only probe counts appended-
    namespace blocks + tombstones; maintain() coalesces past thresholds
    and is a no-op on a clean index."""
    cfg, docs, queries = env
    up = IndexUpdater("u1", spark, cfg)
    d0 = up.segment_debt()
    assert d0["appended_blocks"] == 0 and d0["tombstones"] == 0
    assert up.maintain() is False  # clean → no-op

    up.add(spark.createDataFrame(
        [(1000, "zzdebt alpha"), (1001, "zzdebt beta")],
        "pid long, text string"))
    up.remove([0, 1])
    up2 = IndexUpdater("u1", spark, cfg)
    d1 = up2.segment_debt()
    assert d1["appended_blocks"] >= 1 and d1["tombstones"] == 2
    assert 0 < d1["appended_fraction"] < 1
    before = _rank(spark, cfg, queries)

    # under-threshold → no-op; zero-threshold → compacts
    assert up2.maintain(max_appended_fraction=0.9,
                        max_tombstone_fraction=0.9) is False
    assert up2.maintain(max_appended_fraction=0.0) is True
    up3 = IndexUpdater("u1", spark, cfg)
    d2 = up3.segment_debt()
    assert d2["appended_blocks"] == 0 and d2["tombstones"] == 0
    assert _rank(spark, cfg, queries) == before  # fold preserves rankings


