"""Stats assembler CI math (scripts/assemble_cascade_stats.py): Student-t
per arm, Welch-Satterthwaite gap — the round-4 correction of the original
z=1.96 normal approximation."""
import importlib.util
import math

spec = importlib.util.spec_from_file_location(
    "assemble_cascade_stats", "scripts/assemble_cascade_stats.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)


def test_tcrit_matches_scipy():
    from scipy.stats import t
    for df in (1, 4, 9, 30):
        assert math.isclose(mod._tcrit(df), float(t.ppf(0.975, df)))
    assert mod._tcrit(0.5) == mod._tcrit(1.0)   # df floor


def test_ci_uses_student_t():
    vals = [0.5, 0.6, 0.4, 0.55, 0.45]          # n=5 -> t(4)=2.776
    out = mod._ci(vals)
    import numpy as np
    sem = float(np.std(vals, ddof=1)) / math.sqrt(5)
    assert math.isclose(out["ci95"], round(2.7764451 * sem, 4),
                        abs_tol=2e-4)
    assert out["n"] == 5
    # n=2 gives the honest t(1)=12.7 blowup, not a tight 1.96 interval
    wide = mod._ci([0.4, 0.6])
    assert wide["ci95"] > 1.0


def test_n1_has_no_ci():
    assert mod._ci([0.5])["ci95"] is None


def _seed_doc(arm, seed, completion, score, **cfg_extra):
    cfg = dict(iterations=10, num_envs=4, steps_per_iter=8, camroute=True,
               seed=seed, resumed_from_iteration=None, **cfg_extra)
    return dict(config=cfg,
                eval=dict(episodes=20, error_histogram={"success": 20},
                          mean_completion=completion,
                          mean_driving_score=score))


def _assemble(tmp_path, docs):
    import json
    import sys
    import tempfile
    from pathlib import Path

    statsdir = Path(tempfile.mkdtemp(dir=tmp_path, prefix="stats"))
    for name, doc in docs.items():
        (statsdir / f"{name}.json").write_text(json.dumps(doc))
    out = tmp_path / "artifact.json"
    argv, sys.argv = sys.argv, ["x", "--statsdir", str(statsdir),
                                "--out", str(out)]
    try:
        mod.main()
    finally:
        sys.argv = argv
    return json.loads(out.read_text())


def test_artifact_records_per_seed_provenance(tmp_path):
    """ADVICE r4 medium: provenance must be IN the JSON — per-seed encoder
    path + sha + code rev, and a heterogeneity note when trained seeds
    ran against different encoder instances."""
    art = _assemble(tmp_path, {
        "trained_s0": _seed_doc(
            "trained", 0, 0.55, 42.0,
            encoder_provenance="pre-wipe encoder: 25-epoch original"),
        "trained_s1": _seed_doc(
            "trained", 1, 0.52, 40.0,
            encoder="/nonexistent/enc.msgpack",
            encoder_sha256="beef" * 16, code_rev="abc1234"),
        "random_s0": _seed_doc("random", 0, 0.40, 33.0),
        "random_s1": _seed_doc("random", 1, 0.42, 35.0),
    })
    rows = {r["seed"]: r["provenance"] for r in art["arms"]["trained"]["seeds"]}
    assert rows[0]["encoder_provenance"].startswith("pre-wipe encoder")
    assert rows[1]["encoder_sha256"] == "beef" * 16
    assert rows[1]["code_rev"] == "abc1234"
    het = art["encoder_heterogeneity"]
    assert het["distinct_encoder_instances"] == 2
    assert sorted(v for vs in het["seeds_by_instance"].values() for v in vs) \
        == [0, 1]
    # derived prose, not the old hardcoded 25-epoch string
    assert "2 distinct encoder instance" in art["encoder"]


def test_homogeneous_arm_has_no_heterogeneity_note(tmp_path):
    art = _assemble(tmp_path, {
        "trained_s0": _seed_doc("trained", 0, 0.55, 42.0,
                                encoder_sha256="aa" * 32),
        "trained_s1": _seed_doc("trained", 1, 0.52, 40.0,
                                encoder_sha256="aa" * 32),
        "random_s0": _seed_doc("random", 0, 0.40, 33.0),
        "random_s1": _seed_doc("random", 1, 0.42, 35.0),
    })
    assert art["encoder_heterogeneity"] is None


def test_prereg_grid_preserved_under_extension(tmp_path):
    """Post-hoc extension seeds (> prereg-max-seed) must not silently
    absorb the pre-registered analysis: the artifact carries BOTH the
    all-seeds (extended) gaps and the seeds-0..4 pre-registered gaps."""
    docs = {}
    for s, (c, d) in enumerate([(0.55, 42.0), (0.48, 35.0), (0.55, 42.0),
                                (0.45, 31.0), (0.56, 42.0), (0.70, 60.0)]):
        docs[f"trained_s{s}"] = _seed_doc("trained", s, c, d,
                                          encoder_sha256="aa" * 32)
    for s, (c, d) in enumerate([(0.40, 34.0), (0.42, 35.0), (0.38, 33.0),
                                (0.41, 36.0), (0.39, 33.0), (0.40, 34.0)]):
        docs[f"random_s{s}"] = _seed_doc("random", s, c, d)
    art = _assemble(tmp_path, docs)
    pre = art["preregistered"]
    assert pre is not None and "post-hoc extension" in pre["note"]
    assert pre["gaps"]["mean_completion"]["n_trained"] == 5
    assert art["gaps"]["mean_completion"]["n_trained"] == 6
    # prereg means exclude the (outlier) extension seed
    assert pre["trained"]["mean_completion"]["n"] == 5
    assert pre["trained"]["mean_completion"]["mean"] < \
        art["arms"]["trained"]["mean_completion"]["mean"]
    # no extension seeds -> no prereg block (the common case)
    art5 = _assemble(tmp_path, {k: v for k, v in docs.items()
                                if not k.endswith("s5")})
    assert art5["preregistered"] is None


def test_gap_uses_unrounded_values(tmp_path):
    """ADVICE r4: gap/CI from raw seed values, rounding only for display —
    values chosen so 4-decimal pre-rounding would move the gap."""
    t0, t1 = 0.500049, 0.510051     # round to .5000/.5101 -> mean .50505
    r0, r1 = 0.400049, 0.410051
    art = _assemble(tmp_path, {
        "trained_s0": _seed_doc("trained", 0, t0, 42.0),
        "trained_s1": _seed_doc("trained", 1, t1, 40.0),
        "random_s0": _seed_doc("random", 0, r0, 33.0),
        "random_s1": _seed_doc("random", 1, r1, 35.0),
    })
    gap = art["gaps"]["mean_completion"]["gap"]
    raw_gap = (t0 + t1) / 2 - (r0 + r1) / 2
    assert math.isclose(gap, round(raw_gap, 4), abs_tol=1e-9)
    # and the serialized artifact carries no _raw leakage
    assert "_raw" not in art["arms"]["trained"]["mean_completion"]
