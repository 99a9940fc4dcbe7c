"""Perf regression locks (VERDICT r4 item 6): the north-star thresholds
(BASELINE.md — 35.8k f/s, 5.17k device-train steps/s measured idle) are
guarded by bench.py::check_floors. Unit-test the checker here; the slow
test actually runs `bench.py --assert-floors` against the real chip when
one is reachable and idle, so a kernel/pipeline regression cannot ship
silently."""
import fcntl
import importlib.util
import os
import subprocess
import sys

import pytest

spec = importlib.util.spec_from_file_location("bench_mod", "bench.py")
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


def _row(**kw):
    base = dict(metric="danet_latent_frames_per_sec_per_chip",
                value=35000.0, device_train_env_steps_per_sec=5000.0)
    base.update(kw)
    return base


def test_floors_pass_at_current_idle_numbers():
    assert bench.check_floors(_row()) == []


def test_floors_catch_fps_regression():
    v = bench.check_floors(_row(value=20000.0))
    assert any("frames/s regression" in s for s in v)


def test_floors_catch_device_train_regression_and_absence():
    v = bench.check_floors(_row(device_train_env_steps_per_sec=3000.0))
    assert any("env-steps/s regression" in s for s in v)
    v = bench.check_floors(_row(device_train_env_steps_per_sec=None))
    assert any("no number" in s for s in v)


def test_contended_rows_are_not_judged():
    """A shared-chip measurement must not fail the lock — r3's contended
    capture would have read as a 3x regression."""
    row = _row(value=11000.0, device_train_env_steps_per_sec=1000.0,
               lock_timeout_contended=True)
    assert bench.check_floors(row) == []


def test_floors_leave_headroom_below_idle_measurements():
    """Floors must sit below the recorded idle numbers (else the lock
    fails on day one) but near them (else it guards nothing)."""
    f = bench.FLOORS
    assert 0.5 * 35790 <= f["danet_latent_frames_per_sec_per_chip"] < 35790
    assert 0.5 * 5171 <= f["device_train_env_steps_per_sec"] < 5171


@pytest.mark.slow
def test_bench_floors_on_real_chip():
    """End-to-end lock: run the actual bench against the real TPU and
    assert the floors. Skips when no chip is configured or a long
    experiment holds the scale lock (never disturb a training run —
    a concurrent chip client can wedge the tunnel)."""
    if not os.path.isdir(os.path.expanduser("~/.axon_site")) and \
            "axon" not in os.environ.get("JAX_PLATFORMS_REAL", "") and \
            not os.path.exists("/root/.tpu_init.py"):
        pytest.skip("no TPU tunnel on this host")
    lock = "/tmp/device_scale/.lock"
    os.makedirs("/tmp/device_scale", exist_ok=True)
    fd = os.open(lock, os.O_WRONLY | os.O_CREAT, 0o644)
    try:
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            pytest.skip("scale lock held by a training job; floors "
                        "cannot be judged on a shared chip")
        fcntl.flock(fd, fcntl.LOCK_UN)  # bench takes it itself
        env = {k: v for k, v in os.environ.items()
               if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
        env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
        out = subprocess.run(
            [sys.executable, "bench.py", "--assert-floors"],
            capture_output=True, text=True, timeout=900, env=env)
        if "RuntimeError: Unable to initialize backend" in out.stderr:
            pytest.skip("TPU backend not reachable")
        assert out.returncode == 0, \
            f"floors violated or bench failed:\n{out.stdout}\n{out.stderr[-2000:]}"
    finally:
        os.close(fd)
