"""Decremental cluster repair (operators/maintenance.py): the repaired
assignments must equal a from-scratch connected-components solve of the
surviving graph — pinned on the hard shapes (bridge removal splits a
component, representative removal relabels survivors, whole-component
removal, empty removal) and on a random graph."""

from __future__ import annotations

import random

from file_dedup_rust_spark.operators.connected_components import (
    connected_components,
)
from file_dedup_rust_spark.operators.maintenance import repair_after_removal


def _solve(spark, edges, verts):
    e = spark.createDataFrame(edges or [("_x", "_x")], "a string, b string")
    if not edges:
        e = e.filter("a != a")
    v = spark.createDataFrame([(x,) for x in verts], "clip_id string")
    return connected_components(e, v), e, v


def _labels(df):
    return {r["clip_id"]: r["cluster_id"] for r in df.collect()}


def _check(spark, edges, verts, removed):
    assignments, e, _v = _solve(spark, edges, verts)
    rm = spark.createDataFrame(
        [(x,) for x in removed] or [("_none_",)], "clip_id string"
    )
    if not removed:
        rm = rm.filter("clip_id != clip_id")
    got = _labels(repair_after_removal(assignments, e, rm))

    surv = [x for x in verts if x not in removed]
    surv_edges = [
        (a, b) for a, b in edges if a not in removed and b not in removed
    ]
    want_df, _, _ = _solve(spark, surv_edges, surv)
    want = _labels(want_df)
    assert got == want
    return got


def test_bridge_removal_splits_component(spark):
    # path a - bridge - z: removing the bridge must split {a,b} / {y,z}
    edges = [("a", "b"), ("b", "bridge"), ("bridge", "y"), ("y", "z")]
    verts = ["a", "b", "bridge", "y", "z"]
    got = _check(spark, edges, verts, ["bridge"])
    assert got["a"] == got["b"] == "a"
    assert got["y"] == got["z"] == "y"
    assert got["a"] != got["y"]


def test_rep_removal_relabels_survivors(spark):
    # min-id member IS the removed clip -> survivors need a new rep
    edges = [("a01", "m5"), ("a01", "m7"), ("m5", "m7")]
    got = _check(spark, edges, ["a01", "m5", "m7"], ["a01"])
    assert got == {"m5": "m5", "m7": "m5"}


def test_whole_component_removal(spark):
    edges = [("p", "q"), ("x", "y")]
    got = _check(spark, edges, ["p", "q", "x", "y", "solo"], ["p", "q"])
    assert set(got) == {"x", "y", "solo"}


def test_empty_removal_is_identity(spark):
    edges = [("p", "q"), ("q", "r")]
    got = _check(spark, edges, ["p", "q", "r", "s"], [])
    assert got == {"p": "p", "q": "p", "r": "p", "s": "s"}


def test_untouched_components_pass_through_random_graph(spark):
    rng = random.Random(7)
    verts = [f"v{i:03d}" for i in range(120)]
    edges = [
        tuple(sorted(rng.sample(verts, 2)))
        for _ in range(150)
    ]
    removed = sorted(rng.sample(verts, 18))
    _check(spark, sorted(set(edges)), verts, removed)


def test_cli_remove_flag_end_to_end(spark, tmp_path):
    """`run_pipeline.py --remove ids.parquet` on an intact checkpoint:
    every pipeline stage resumes (the operation costs the repair, not
    a re-cluster), the maintenance summary is consistent, and the
    written assignments_after_remove are IDENTICAL to a full pipeline
    rerun on the filtered corpus — the repair == rebuild claim at the
    pipeline level, with the removal set deliberately including star
    hubs / representatives (the case pure edge surgery gets wrong)."""
    import json
    import os
    import subprocess
    import sys

    from pyspark.sql import functions as F

    from file_dedup_rust_spark import datagen

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(n_or_input, ck, out, extra=()):
        src = (
            ["--synthetic", str(n_or_input)]
            if isinstance(n_or_input, int)
            else ["--input", n_or_input]
        )
        r = subprocess.run(
            [sys.executable, os.path.join(repo, "run_pipeline.py"),
             *src, "--checkpoint", ck, "--output", out,
             "--master", "local[4]"] + list(extra),
            check=True, capture_output=True, text=True, timeout=600,
        )
        return json.loads(r.stdout.strip().splitlines()[-1])

    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")
    first = run(1000, ck, out)
    assert first["dup_clusters"] == 222 and first["dup_edges"] == 389

    # removal set: members of multi-member clusters INCLUDING their
    # min-id representatives (= star hubs) + singletons, deterministic
    asg = spark.read.parquet(f"{out}/assignments")
    sizes = asg.groupBy("cluster_id").agg(F.count("*").alias("n"))
    multi = (
        asg.join(sizes.filter("n > 1"), "cluster_id")
        .orderBy("clip_id").limit(30).select("clip_id")
    )
    solo = (
        asg.join(sizes.filter("n = 1"), "cluster_id")
        .orderBy("clip_id").limit(20).select("clip_id")
    )
    rm = multi.unionByName(solo)
    rm_path = str(tmp_path / "rm")
    rm.coalesce(1).write.mode("overwrite").parquet(rm_path)
    rm_ids = {r["clip_id"] for r in rm.collect()}

    second = run(1000, ck, out, ["--remove", rm_path])
    assert all(s["resumed"] for s in second["stages"])  # no recompute
    m = second["maintenance"]
    assert m["removed_requested"] == 50
    assert m["survivors"] == 1000 - 50
    got = _labels(
        spark.read.parquet(f"{out}/assignments_after_remove")
        .select("clip_id", "cluster_id")
    )

    # ground truth: a FULL pipeline rerun on the filtered corpus
    filt_path = str(tmp_path / "filtered")
    clips = datagen.generate_clips(spark, 1000)
    clips.filter(~F.col("clip_id").isin(list(rm_ids))).write.mode(
        "overwrite"
    ).parquet(filt_path)
    run(filt_path, str(tmp_path / "ck2"), str(tmp_path / "out2"))
    want = _labels(
        spark.read.parquet(f"{tmp_path}/out2/assignments")
        .select("clip_id", "cluster_id")
    )
    assert got == want


def test_cli_changed_input_invalidates_checkpoint(tmp_path):
    """Re-running the CLI against the SAME checkpoint dir with a
    DIFFERENT input must NOT silently resume the old corpus's stages
    (the input token folds into every stage fingerprint); the same
    input resumes as before."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ck = str(tmp_path / "ck")

    def run(n):
        r = subprocess.run(
            [sys.executable, os.path.join(repo, "run_pipeline.py"),
             "--synthetic", str(n), "--checkpoint", ck,
             "--master", "local[4]"],
            check=True, capture_output=True, text=True, timeout=600,
        )
        return json.loads(r.stdout.strip().splitlines()[-1])

    a = run(400)
    assert a["clips"] == 400 and not any(s["resumed"] for s in a["stages"])
    b = run(1000)  # different corpus, same checkpoint dir
    assert b["clips"] == 1000, "stale resume returned the old corpus"
    assert not any(s["resumed"] for s in b["stages"])
    c = run(1000)  # same corpus again -> full resume
    assert c["clips"] == 1000
    assert all(s["resumed"] for s in c["stages"])
