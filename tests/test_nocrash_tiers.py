"""NoCrash traffic-tier mapping (scripts/run_nocrash_eval.py): the
canonical empty/regular/dense town-wide amounts and their on-route
density mapping, calibrated so the reference's single eval config
(amount=[20,50], eval_agent_config.py:80) lands exactly on the r4
3-vehicle + 6-walker on-route density."""
import importlib.util

spec = importlib.util.spec_from_file_location(
    "run_nocrash_eval", "scripts/run_nocrash_eval.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)


def test_reference_eval_config_is_town01_regular():
    assert mod.NOCRASH_TIERS["Town01"]["regular"] == (20, 50)
    assert mod._onroute((20, 50)) == (3, 6)   # the r4 calibration point


def test_tiers_cover_the_nocrash_benchmark():
    for town, tiers in mod.NOCRASH_TIERS.items():
        assert set(tiers) == {"empty", "regular", "dense"}
        assert tiers["empty"] == (0, 0)
        assert tiers["dense"][0] > tiers["regular"][0] > 0


def test_onroute_mapping_is_proportional_and_zero_safe():
    assert mod._onroute((0, 0)) == (0, 0)
    v100, w250 = mod._onroute((100, 250))
    v20, w50 = mod._onroute((20, 50))
    assert v100 == 5 * v20 and w250 == 5 * w50
