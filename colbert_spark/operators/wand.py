"""Block-max BM25 top-k over posting blocks — the query-time engine.

Spark rebuild of IndexScorer.rank (colbert/search/index_storage.py:87-166):
the reference's prune-then-exact funnel (centroid-score threshold → approx
topk(ndocs) → exact MaxSim) becomes MaxScore-style pruning with block-max
metadata:

  1. terms processed in descending upper bound (UB_t = max block score of t
     — precomputed at build time, read without decoding any block);
  2. ESSENTIAL terms are fully decoded and accumulated; θ = current k-th
     accumulated score is a valid lower bound of the final k-th score
     (scores only grow);
  3. once the remaining terms' ΣUB < θ, no unseen doc can reach top-k →
     remaining terms switch to UPDATE-ONLY: a block is decoded only if its
     [first_pid, last_pid] range intersects the accumulator set (block-max
     metadata + range check = the skip). Every surviving accumulator ends
     with its EXACT BM25 score, so the final ranking is exact.

Two distributed layouts:
  - gather  (`topk_gather`): shuffle each query's candidate blocks to one
    group (groupBy qid → applyInPandas kernel). True skipping, lowest
    latency per query; right when queries ≪ corpus.
  - scatter (`topk_scatter`): score blocks in place where the index lives
    (mapInPandas over term-bucketed blocks, no postings shuffle), then
    groupBy(qid, pid).sum + window rank. No skipping but no block
    duplication per query; right for huge query batches (search_all at
    scale, where the same head term appears in thousands of queries).
Both return identical rankings (tested for equivalence).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from colbert_spark.functions.bm25 import B, K1, SCORE_DECIMALS
from colbert_spark.functions.codec import decode_pids_auto as decode_pids, \
    decode_tfs_auto as decode_tfs

RANKING_SCHEMA = "qid long, pid long, rank int, score double"


def _term_scores(tfs: np.ndarray, dls: np.ndarray, idf: float,
                 avgdl: float) -> np.ndarray:
    tf = tfs.astype(np.float64)
    dl = dls.astype(np.float64)
    return idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


def score_query_blocks(pdf: pd.DataFrame, k: int, avgdl: float,
                       excluded: "tuple[np.ndarray, np.ndarray] | None" = None,
                       after: "tuple[float, int] | None" = None,
                       ) -> tuple[np.ndarray, np.ndarray]:
    """MaxScore kernel for ONE query's blocks → (top pids, top scores).

    pdf columns: term_id, block_id, idf, first_pid, last_pid,
    max_block_score, pids, tfs, dls. Exact top-k; blocks of non-essential
    terms that cannot touch any accumulated candidate are never decoded.

    excluded: (sorted pid array, aligned before_epoch array) — epoch-aware
    tombstones. A pid is dropped only from blocks whose epoch
    (block_id >> 32) < its before_epoch, so a re-added pid's newer
    postings survive while its removed-era postings are excluded.

    after: (after_score, after_pid) keyset cursor — return the top-k
    strictly after it in (-score, pid) order (search_after pagination).
    A cursor DISABLES the MaxScore update-only skip: the skip's
    threshold comes from the k best accumulated candidates, but under a
    cursor a high partial score may belong to a doc the cursor will
    exclude, so that threshold can overestimate the true k-th ELIGIBLE
    score and wrongly prune page-2 docs. Paginated queries therefore
    score every candidate posting exactly (the filter applies to the
    final rounded scores, matching the round-6-then-rank contract).
    """
    # per-term upper bound = max over its blocks (no decode needed)
    by_term = pdf.groupby("term_id", sort=False)
    term_ids = np.array(list(by_term.groups.keys()))
    ubs = by_term["max_block_score"].max().to_numpy()
    order = np.argsort(-ubs, kind="stable")
    term_ids, ubs = term_ids[order], ubs[order]
    suffix_ub = np.concatenate([np.cumsum(ubs[::-1])[::-1], [0.0]])

    acc_pids = np.empty(0, dtype=np.int64)
    acc_scores = np.empty(0, dtype=np.float64)

    for i, tid in enumerate(term_ids):
        g = by_term.get_group(tid)
        idf = float(g["idf"].iloc[0])
        theta = (
            -np.inf if acc_pids.size < k
            else np.partition(acc_scores, acc_scores.size - k)[acc_scores.size - k]
        )
        essential = after is not None or suffix_ub[i] >= theta
        new_p, new_s = [acc_pids], [acc_scores]
        for fp, lp, bid, pb, tb, db in zip(
            g["first_pid"], g["last_pid"], g["block_id"], g["pids"],
            g["tfs"], g["dls"]
        ):
            if not essential:
                # update-only: skip blocks not overlapping the accumulator
                lo = np.searchsorted(acc_pids, fp, side="left")
                hi = np.searchsorted(acc_pids, lp, side="right")
                if hi == lo:
                    continue
            pids = decode_pids(bytes(pb))
            scores = _term_scores(decode_tfs(bytes(tb)), decode_tfs(bytes(db)),
                                  idf, avgdl)
            if excluded is not None:
                ex_pids, ex_before = excluded
                # only tombstones whose bound covers THIS block's epoch
                active = ex_pids[ex_before > (int(bid) >> 32)]
                if active.size:
                    keep = ~np.isin(pids, active, assume_unique=False)
                    pids, scores = pids[keep], scores[keep]
                    if pids.size == 0:
                        continue
            if not essential:
                mask = np.isin(pids, acc_pids, assume_unique=True)
                pids, scores = pids[mask], scores[mask]
                if pids.size == 0:
                    continue
            new_p.append(pids)
            new_s.append(scores)
        allp = np.concatenate(new_p)
        alls = np.concatenate(new_s)
        # merge duplicate pids (in update-only rounds only pre-existing
        # accumulators can appear; the merge handles both cases)
        acc_pids, inv = np.unique(allp, return_inverse=True)
        acc_scores = np.bincount(inv, weights=alls)

    if acc_pids.size == 0:
        return acc_pids, acc_scores
    rounded = np.round(acc_scores, SCORE_DECIMALS)
    if after is not None:
        a_s, a_p = after
        keep = (rounded < a_s) | ((rounded == a_s) & (acc_pids > a_p))
        acc_pids, rounded = acc_pids[keep], rounded[keep]
        if acc_pids.size == 0:
            return acc_pids, rounded
    kk = min(k, acc_pids.size)
    # total order (-score, pid), reference server.py:34
    top = np.lexsort((acc_pids, -rounded))[:kk]
    return acc_pids[top], rounded[top]


def topk_gather(query_blocks: DataFrame, k: int, avgdl: float,
                excluded: "tuple[np.ndarray, np.ndarray] | None" = None,
                after: "dict[int, tuple[float, int]] | None" = None,
                ) -> DataFrame:
    """query_blocks: (qid, term_id, block_id, idf, first_pid, last_pid,
    max_block_score, pids, tfs, dls) → ranking(qid, pid, rank, score).

    One applyInPandas group per qid; the kernel does the skipping.
    excluded: (sorted pids, aligned before_epochs) — epoch-aware
    tombstones dropped after decode (see score_query_blocks).
    after: {qid: (after_score, after_pid)} keyset cursors — a cursor-
    bearing qid returns its next page (see score_query_blocks; cursors
    are per-query-batch tiny, so the dict rides the task closure).
    """
    excluded = (
        None if excluded is None or excluded[0].size == 0 else excluded
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["qid"].iloc[0])
        pids, scores = score_query_blocks(
            pdf, k, avgdl, excluded=excluded,
            after=None if after is None else after.get(qid))
        return pd.DataFrame(
            {
                "qid": qid,
                "pid": pids,
                "rank": np.arange(1, pids.size + 1, dtype=np.int32),
                "score": scores,
            }
        )

    return query_blocks.groupBy("qid").applyInPandas(kernel, schema=RANKING_SCHEMA)


def topk_scatter(blocks: DataFrame, qterms: DataFrame, k: int,
                 avgdl: float, qid_to_pids: DataFrame | None = None,
                 tombstones: DataFrame | None = None,
                 allow_small: bool = False,
                 tombstones_small: bool = True,
                 after: DataFrame | None = None) -> DataFrame:
    """Score blocks in place (no per-query gather), then relational top-k.

    Each block is decoded ONCE regardless of how many queries share the
    term: idf factors out of the BM25 term score, so the kernel emits
    (term_id, pid, core) where core = tf(k1+1)/(tf + k1(1-b+b·dl/avgdl)),
    and a broadcast join with qterms(qid, term_id, idf) produces per-query
    partials s = idf·core. Catalyst's map-side combine collapses the
    (qid, pid) partial sums before the one shuffle; window rank caps at k.

    allow_small / tombstones_small: the caller's assertion that the
    allow-list / tombstone set fits a broadcast. When False the joins are
    left unhinted — an allow-list can be O(corpus) (e.g. a language
    filter), and a forced broadcast of it is a driver/executor OOM; AQE
    still converts to a runtime broadcast join when the set turns out
    small.
    """

    def _maybe_bcast(df: DataFrame, small: bool):
        return F.broadcast(df) if small else df

    with_epoch = tombstones is not None

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            tids, pids, cores, epochs = [], [], [], []
            for tid, bid, pb, tb, db in zip(
                pdf["term_id"], pdf["block_id"], pdf["pids"], pdf["tfs"],
                pdf["dls"]
            ):
                p = decode_pids(bytes(pb))
                c = _term_scores(decode_tfs(bytes(tb)), decode_tfs(bytes(db)),
                                 1.0, avgdl)
                tids.append(np.full(p.size, tid, dtype=np.int64))
                pids.append(p)
                cores.append(c)
                if with_epoch:
                    epochs.append(
                        np.full(p.size, int(bid) >> 32, dtype=np.int64)
                    )
            if tids:
                cols = {
                    "term_id": np.concatenate(tids),
                    "pid": np.concatenate(pids),
                    "core": np.concatenate(cores),
                }
                if with_epoch:
                    cols["epoch"] = np.concatenate(epochs)
                yield pd.DataFrame(cols)

    schema = "term_id long, pid long, core double" + (
        ", epoch long" if with_epoch else ""
    )
    partials = blocks.select("term_id", "block_id", "pids", "tfs", "dls") \
        .mapInPandas(kernel, schema=schema)
    if tombstones is not None:
        # epoch-bounded exclusion: drop (pid, epoch < before_epoch) rows —
        # a re-added pid's newer postings survive
        t = tombstones.select(
            F.col("pid").alias("t_pid"), "before_epoch"
        )
        partials = partials.join(
            _maybe_bcast(t, tombstones_small),
            (F.col("pid") == F.col("t_pid"))
            & (F.col("epoch") < F.col("before_epoch")),
            "left_anti",
        ).drop("epoch")
    scored = partials.join(F.broadcast(qterms), "term_id").select(
        "qid", "pid", (F.col("idf") * F.col("core")).alias("s")
    )
    if qid_to_pids is not None:
        # pid allow-list (F3, colbert/searcher.py:65-94): qids present in the
        # list are restricted to their pids; absent qids stay unrestricted.
        # Applied BEFORE the (qid, pid) aggregation so the one shuffle
        # carries only allowed pairs — ranking work scales with the
        # candidate set, not the corpus.
        allow = qid_to_pids.select("qid", "pid")
        # the distinct-qid side is bounded by the query batch — always tiny
        restricted_qids = F.broadcast(allow.select("qid").distinct())
        restricted = scored.join(
            restricted_qids, "qid", "left_semi"
        ).join(_maybe_bcast(allow, allow_small), ["qid", "pid"], "left_semi")
        unrestricted = scored.join(restricted_qids, "qid", "left_anti")
        scored = restricted.unionByName(unrestricted)
    agg = scored.groupBy("qid", "pid").agg(
        F.round(F.sum("s"), SCORE_DECIMALS).alias("score")
    )
    if after is not None:
        # keyset cursor (search_after): prune everything at or above the
        # cursor BEFORE the rank window — page cost O(page), not O(depth).
        # Exact rounded scores are already in hand here, so no pruning
        # soundness caveat applies (contrast the gather kernel).
        cur = after.select("qid", "after_score", "after_pid")
        agg = agg.join(F.broadcast(cur), "qid").filter(
            (F.col("score") < F.col("after_score"))
            | ((F.col("score") == F.col("after_score"))
               & (F.col("pid") > F.col("after_pid")))
        ).drop("after_score", "after_pid")
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("pid"))
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("qid", "pid", "rank", "score")
    )
