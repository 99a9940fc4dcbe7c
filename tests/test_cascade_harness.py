"""Contract tests for the cascade-proof experiment harness.

The experiment (scripts/cascade_proof.py -> scripts/cascade_artifacts.py)
runs for hours across separate processes; these tests pin the interfaces it
spans so a refactor cannot silently break a phase that only fails at the
end of a long run: the VecEpisodeStats field names written to the per-arm
JSONL, the fields the report/collector read back, and the checkpoint-glob
sort used to pick the late-training ensemble.
"""
import importlib.util
import json
import os
import sys

import numpy as np


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_stats_fields_cover_collector_reads():
    """Every field read_curve/phase_report pull out of the JSONL must exist
    on VecEpisodeStats (they are produced via dataclasses.asdict)."""
    import dataclasses

    from cadre_tpu.rl.vec_train import VecEpisodeStats

    produced = {f.name for f in dataclasses.fields(VecEpisodeStats)}
    needed = {"mean_completion", "episodes_finished", "env_steps",
              "env_steps_per_sec", "mean_throttle_reward"}
    assert needed <= produced


def _write_jsonl(path, completions):
    with open(path, "w") as f:
        for i, c in enumerate(completions):
            f.write(json.dumps({
                "iteration": i, "value_loss": 0.1, "policy_loss": 0.1,
                "entropy_loss": 0.1, "env_steps": 1600,
                "env_steps_per_sec": 100.0, "mean_steer_reward": 0.0,
                "mean_throttle_reward": 0.5, "episodes_finished": 4,
                "mean_completion": c}) + "\n")


def test_collector_assembles_gap(tmp_path):
    art = _load("cascade_artifacts",
                os.path.join(ROOT, "scripts", "cascade_artifacts.py"))
    _write_jsonl(tmp_path / "trained.jsonl", [10.0, 40.0, 60.0])
    _write_jsonl(tmp_path / "random.jsonl", [10.0, 20.0, 30.0])
    with open(tmp_path / "driver.log", "w") as f:
        f.write('HOLDOUT {"seg_pixel_acc": 0.8}\n')
        f.write('ENSEMBLE {"arm": "trained", "episodes": 25, '
                '"mean_completion": 0.7, "mean_driving_score": 0.6}\n')
        f.write('ENSEMBLE {"arm": "random", "episodes": 25, '
                '"mean_completion": 0.4, "mean_driving_score": 0.3}\n')
    out = tmp_path / "out.json"
    sys.argv = ["cascade_artifacts", "--work-dir", str(tmp_path),
                "--out", str(out)]
    art.main()
    res = json.load(open(out))
    assert res["trained_arm"]["final_third_completion_mean"] == 60.0
    assert res["gap_final_third_completion"] == 30.0
    assert res["gap_ensemble_completion"] == 0.3
    assert res["pretrain_holdout"] == {"seg_pixel_acc": 0.8}


def test_checkpoint_sort_orders_numerically(tmp_path):
    """phase_eval sorts ppo_model_{it}.msgpack numerically, not lexically,
    so the [-8:] slice really is the LAST 8 checkpoints."""
    names = [f"ppo_model_{i}.msgpack" for i in (0, 5, 10, 15, 100, 95, 20)]
    key = lambda p: int("".join(c for c in os.path.basename(p)
                                if c.isdigit()))
    assert [key(n) for n in sorted(names, key=key)][-2:] == [95, 100]


def test_report_final_third(tmp_path):
    proof = _load("cascade_proof",
                  os.path.join(ROOT, "scripts", "cascade_proof.py"))
    _write_jsonl(tmp_path / "trained.jsonl", list(np.linspace(0, 90, 30)))
    _write_jsonl(tmp_path / "random.jsonl", list(np.linspace(0, 30, 30)))

    class A:
        work_dir = str(tmp_path)

    proof.phase_report(A)  # must not raise; prints the gap


def test_blind_route_sim_masks_policy_measurements():
    """--blind-route zeros (dis, theta) in the POLICY obs while the env's
    internal reward/termination geometry stays live."""
    proof = _load("cascade_proof",
                  os.path.join(ROOT, "scripts", "cascade_proof.py"))
    env = proof.make_sim_env(0, seed=5, blind_route=True)
    env.seq_length = 2
    tick = env.reset()
    for _ in range(3):
        tick, _, done, _ = env.step(np.array([0.0, 0.5, 0.0]))
        assert not done
    m = np.asarray(tick["measurements"][-1])
    assert m[1] == 0.0 and m[2] == 0.0        # masked in the obs
    assert m[0] > 0.0                          # speed survives
    base = proof.make_sim_env(1, seed=5, blind_route=False)
    base.seq_length = 2
    base.reset()
    for _ in range(3):
        t2, _, _, _ = base.step(np.array([0.0, 0.5, 0.0]))
    assert np.asarray(t2["measurements"][-1])[1] != 0.0


def test_geom_collector_compares_against_blind_baseline(tmp_path):
    art = _load("cascade_artifacts",
                os.path.join(ROOT, "scripts", "cascade_artifacts.py"))
    _write_jsonl(tmp_path / "trained.jsonl", [10.0, 40.0, 60.0])
    with open(tmp_path / "driver.log", "w") as f:
        f.write('HOLDOUT {"seg_pixel_acc": 0.9, "geom_r2_dis": 0.8}\n')
        f.write('ENSEMBLE {"arm": "trained", "episodes": 25, '
                '"mean_completion": 50.0, "mean_driving_score": 40.0}\n')
    baseline = {
        "trained_arm": {"final_third_completion_mean": 32.0},
        "random_arm": {"final_third_completion_mean": 33.0},
        "ensemble_eval": {
            "trained": {"mean_completion": 33.3, "mean_driving_score": 27.3},
            "random": {"mean_completion": 35.5, "mean_driving_score": 28.1}},
    }
    bpath = tmp_path / "baseline.json"
    json.dump(baseline, open(bpath, "w"))
    out = tmp_path / "out.json"
    sys.argv = ["cascade_artifacts", "--geom", "--work-dir", str(tmp_path),
                "--out", str(out), "--baseline", str(bpath)]
    art.main()
    res = json.load(open(out))
    assert res["geom_arm"]["final_third_completion_mean"] == 60.0
    assert res["gap_geom_vs_random_final_third"] == 27.0
    assert res["gap_geom_ensemble_completion_vs_random"] == 14.5
    assert res["pretrain_holdout"]["geom_r2_dis"] == 0.8
