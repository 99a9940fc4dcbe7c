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
