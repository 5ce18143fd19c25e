"""IVF-flat hardening (round-3 VERDICT #2): corpus-scaled K, measured
recall vs the brute-force oracle, the Arrow large-K assignment path, and
the physical cell-partitioned index layout with partition-pruned probes."""

from pyspark.sql import functions as F

from translator_ingests_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"


def _rows(df):
    return [(r["q_id"], r["rank"], r["c_id"], r["cosine"]) for r in df.collect()]


def test_ivf_k_scales_with_corpus():
    # static at every test scale (the DuckDB oracle encodes K=16)...
    for n in (100, 500, 2_000, 16_384):
        assert sim._ivf_k(n) == 16
    # ...and grows ~√n beyond, so per-cell candidate cost stays bounded
    assert sim._ivf_k(10**6) == 128
    assert sim._ivf_k(10**9) == 4096
    assert sim._ivf_k(10**9) > sim._ivf_k(10**6) > 16


def test_ivf_recall_at_5_meets_gate(spark):
    """The fixture is near-uniform on the sphere, so recall tracks coverage
    (nprobe/K) — the 0.7 gate holds at nprobe=6, and the knob must be
    monotone (more probes, more recall). See ivf_recall_at_k's docstring
    for the measured curve."""
    r2 = sim.ivf_recall_at_k(spark, SF, nprobe=2)
    r6 = sim.ivf_recall_at_k(spark, SF, nprobe=6)
    assert r6 >= 0.7, f"recall@5 {r6:.2f} at nprobe=6 below the 0.7 gate"
    assert r6 > r2 >= 0.2, (r2, r6)


def test_arrow_path_matches_literal_fold(spark):
    """The Arrow assignment/probe path (the default) must reduce to the
    same result as the pure-JVM literal-fold reference on identical
    centroids — same argmax tie-break, same candidate set."""
    assert _rows(sim.ann_ivf_flat(spark, SF)) == _rows(
        sim.ann_ivf_flat_fold(spark, SF)
    )


def test_indexed_layout_matches_and_prunes(spark, tmp_path):
    info = sim.build_ivf_index(spark, SF, str(tmp_path / "ivf"))
    assert info["k"] == 16

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < sim._N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    # nprobe pinned to the unindexed default: identical centroids +
    # identical probe rule ⇒ identical results (the bare default is the
    # CALIBRATED nprobe, covered by test_calibrated_default_meets_gate)
    res = sim.ann_ivf_flat_indexed(
        spark, str(tmp_path / "ivf"), queries, nprobe=sim._IVF_NPROBE
    )
    assert _rows(res) == _rows(sim.ann_ivf_flat(spark, SF))

    # the probe scan must carry a cell partition filter: parquet prunes to
    # the probed directories, reading ~nprobe·queries/K of the index
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert any("cell" in l and "IN" in l for l in pf_lines), pf_lines


def _indexed_recall(spark, root, nprobe=2, top_k=5):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < sim._N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    truth = {
        (r["q_id"], r["c_id"]) for r in sim.ann_cosine_topk(spark, SF).collect()
    }
    approx = {
        (r["q_id"], r["c_id"])
        for r in sim.ann_ivf_flat_indexed(
            spark, root, queries, nprobe=nprobe, top_k=top_k
        ).collect()
    }
    return len(truth & approx) / max(1, len(truth))


def test_kmeans_refinement_improves_recall(spark, tmp_path):
    """Deterministic spherical-Lloyd refinement (no randomness: evenly
    spaced init, fixed iteration count) must not hurt recall at the same
    probe budget — and on this fixture it measurably helps (the round-3
    review measured 0.34 → 0.46 at nprobe=2; exact values are byte-stable
    because every step is deterministic)."""
    sim.build_ivf_index(spark, SF, str(tmp_path / "flat"))
    sim.build_ivf_index(spark, SF, str(tmp_path / "ref"), refine_iters=3)
    base = _indexed_recall(spark, str(tmp_path / "flat"))
    refined = _indexed_recall(spark, str(tmp_path / "ref"))
    assert refined >= base, (base, refined)
    assert refined >= 0.4, refined


def test_calibrated_default_meets_gate(spark, tmp_path):
    """Round-4 VERDICT #2: a bare ann_ivf_flat_indexed call (no nprobe)
    must serve at the build-calibrated probe count and meet the 0.7
    recall@5 target — no silent 34%-recall default on spread-out corpora."""
    import json
    import os

    root = str(tmp_path / "ivf_cal")
    info = sim.build_ivf_index(spark, SF, root)
    meta = json.load(open(os.path.join(root, "centroids.json")))
    assert info["default_nprobe"] == meta["default_nprobe"]
    # the stored curve is monotone non-decreasing and spans 1..K
    curve = meta["recall_curve"]
    assert [c["nprobe"] for c in curve] == list(range(1, meta["k"] + 1))
    recalls = [c["recall"] for c in curve]
    assert all(a <= b for a, b in zip(recalls, recalls[1:]))
    assert recalls[-1] == 1.0  # probing every cell is exact
    # the chosen default is the SMALLEST probe count meeting the target
    d = meta["default_nprobe"]
    assert curve[d - 1]["recall"] >= 0.7
    assert d == 1 or curve[d - 2]["recall"] < 0.7

    # bare serve meets the gate against the brute-force oracle
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < sim._N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    truth = {
        (r["q_id"], r["c_id"]) for r in sim.ann_cosine_topk(spark, SF).collect()
    }
    approx = {
        (r["q_id"], r["c_id"])
        for r in sim.ann_ivf_flat_indexed(spark, root, queries).collect()
    }
    recall = len(truth & approx) / max(1, len(truth))
    assert recall >= 0.7, f"calibrated-default recall {recall:.2f} < 0.7"
    # ... and the stored curve PREDICTED that recall exactly (the curve is
    # derived, not simulated — within-cell search is exact)
    assert abs(curve[d - 1]["recall"] - recall) < 1e-9
