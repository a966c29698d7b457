"""Single-machine numpy/pandas oracle — the correctness pin for the
distributed pipeline (SURVEY.md section 5 item 2).

It shares the per-row *kernels* (hashing, decode, featurize — that is
what "identical shingle/signature config" means) but reimplements every
*distributed* step independently with plain dicts and loops: content
dedup to representatives, LSH bucketing with the band cap, exact
verification, containment, and union-find clustering.  Recall >= 0.99
(BASELINE.json) is measured pipeline-vs-oracle on unordered dup pairs
over cluster co-membership.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd

from file_dedup_rust_spark.config import DedupConfig
from file_dedup_rust_spark.functions import audio as A
from file_dedup_rust_spark.functions.udfs import signature_batch


def oracle_signatures(clips: pd.DataFrame, cfg: DedupConfig) -> pd.DataFrame:
    planes = A.simhash_planes(cfg)
    return signature_batch(clips, cfg, planes)


class _UnionFind:
    def __init__(self) -> None:
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = self.parent.setdefault(p, p)
            x = self.parent[x]
            p = self.parent.setdefault(x, x)
        return x

    def union(self, x: str, y: str) -> None:
        rx, ry = self.find(x), self.find(y)
        if rx == ry:
            return
        if ry < rx:  # min-id representative, matches the pipeline
            rx, ry = ry, rx
        self.parent[ry] = rx


def _bucket_pairs(buckets: dict, cap: int) -> set[tuple[str, str]]:
    pairs: set[tuple[str, str]] = set()
    for members in buckets.values():
        ms = sorted(set(members))
        if len(ms) < 2 or len(ms) > cap:
            continue
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pairs.add((ms[i], ms[j]))
    return pairs


def oracle_edges(sig: pd.DataFrame, cfg: DedupConfig) -> pd.DataFrame:
    """signatures -> verified dup edges (a, b, kind, sim), a < b."""
    edges: list[tuple[str, str, str, float]] = []

    # ---- exact content stars (sha256) ----
    by_sha: dict[str, list[str]] = defaultdict(list)
    for cid, sha in zip(sig["clip_id"], sig["sha256"]):
        by_sha[sha].append(cid)
    for members in by_sha.values():
        ms = sorted(members)
        for m in ms[1:]:
            edges.append((ms[0], m, "exact", 1.0))

    # ---- exact transcript stars (identical normalized text) ----
    by_t: dict[str, list[str]] = defaultdict(list)
    for cid, t in zip(sig["clip_id"], sig["t_norm"]):
        if t:
            by_t[t].append(cid)
    for members in by_t.values():
        ms = sorted(members)
        for m in ms[1:]:
            edges.append((ms[0], m, "transcript", 1.0))

    # ---- representatives: near-dup search runs on unique content ----
    audio_rep = {sha: sorted(ms)[0] for sha, ms in by_sha.items()}
    text_rep = {t: sorted(ms)[0] for t, ms in by_t.items()}
    arep_ids = set(audio_rep.values())
    trep_ids = set(text_rep.values())
    srep = sig[sig["clip_id"].isin(arep_ids | trep_ids)]
    row_of = {r.clip_id: r for r in srep.itertuples(index=False)}

    # ---- transcript MinHash LSH over text reps ----
    mh_buckets: dict[int, list[str]] = defaultdict(list)
    for r in srep.itertuples(index=False):
        if r.clip_id in trep_ids:
            for k in r.mh_bands:
                mh_buckets[k].append(r.clip_id)
    for a, b in _bucket_pairs(mh_buckets, cfg.band_cap):
        sa = np.asarray(row_of[a].minhash)
        sb = np.asarray(row_of[b].minhash)
        if sa[0] < 0 or sb[0] < 0:
            continue
        s = float(np.mean(sa == sb))
        if s >= cfg.jaccard_threshold and row_of[a].t_norm != row_of[b].t_norm:
            edges.append((a, b, "transcript", s))

    # ---- audio SimHash LSH over audio reps ----
    sh_buckets: dict[int, list[str]] = defaultdict(list)
    for r in srep.itertuples(index=False):
        if r.clip_id in arep_ids and r.decode_ok:
            for k in r.sim_keys:
                sh_buckets[k].append(r.clip_id)
    for a, b in _bucket_pairs(sh_buckets, cfg.band_cap):
        ra, rb = row_of[a], row_of[b]
        if ra.simhash is None or rb.simhash is None:
            continue
        d = A.hamming64(int(ra.simhash), int(rb.simhash))
        if d <= cfg.hamming_max and ra.sha256 != rb.sha256:
            edges.append((a, b, "audio", 1.0 - d / cfg.simhash_bits))

    # ---- containment over text reps (winnow buckets, substring scan) ----
    fp_buckets: dict[int, list[str]] = defaultdict(list)
    for r in srep.itertuples(index=False):
        if r.clip_id in trep_ids:
            for k in r.fps:
                fp_buckets[k].append(r.clip_id)
    seen: set[tuple[str, str]] = set()
    for a, b in _bucket_pairs(fp_buckets, cfg.band_cap):
        if (a, b) in seen:
            continue
        seen.add((a, b))
        ta, tb = row_of[a].t_norm, row_of[b].t_norm
        if len(ta) < cfg.min_containment_len and len(tb) < cfg.min_containment_len:
            continue
        short, long_, x, y = (ta, tb, a, b) if len(ta) <= len(tb) else (tb, ta, b, a)
        if len(short) >= cfg.min_containment_len and short != long_ and short in long_:
            p, q = sorted([x, y])
            edges.append((p, q, "containment", len(short) / len(long_)))

    df = pd.DataFrame(edges, columns=["a", "b", "kind", "sim"]).drop_duplicates(
        subset=["a", "b", "kind"]
    )
    return df.sort_values(["a", "b", "kind"]).reset_index(drop=True)


def oracle_assignments(edges: pd.DataFrame, all_ids: list[str]) -> pd.DataFrame:
    """Union-find connected components -> (clip_id, cluster_id=min id)."""
    uf = _UnionFind()
    for cid in all_ids:
        uf.find(cid)
    for a, b in zip(edges["a"], edges["b"]):
        uf.union(a, b)
    return pd.DataFrame(
        {"clip_id": all_ids, "cluster_id": [uf.find(c) for c in all_ids]}
    )


def co_membership_pairs(assignments: pd.DataFrame) -> set[tuple[str, str]]:
    """Unordered same-cluster pairs (the recall unit — FIXTURES.md 2)."""
    pairs: set[tuple[str, str]] = set()
    for _, grp in assignments.groupby("cluster_id"):
        ms = sorted(grp["clip_id"])
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pairs.add((ms[i], ms[j]))
    return pairs


def pair_recall(found: set[tuple[str, str]], truth: set[tuple[str, str]]) -> float:
    if not truth:
        return 1.0
    return len(found & truth) / len(truth)
