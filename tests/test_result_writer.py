"""ResultOutputProvider + standalone scenario-runner CLI
(srunner result_writer.py:19-178; upstream scenario_runner CLI role)."""
import subprocess
import sys
import xml.etree.ElementTree as ET

import numpy as np

from cadre_tpu.envs.criteria import Criterion
from cadre_tpu.envs.result_writer import ResultOutputProvider


class _Crit(Criterion):
    def __init__(self, status, actual=0.0):
        super().__init__()
        self.test_status = status
        self.actual_value = actual

    def update(self, snap):
        pass


def test_report_success_and_failure(tmp_path):
    ok = ResultOutputProvider("s1", [_Crit("SUCCESS"), _Crit("INIT")],
                              duration_game=10.0, duration_system=1.0,
                              timeout=20.0)
    assert ok.result() == "SUCCESS"
    text = ok.create_output_text()
    assert "---- SUCCESS" in text and "Timeout (Req.)" in text
    # INIT (ran clean) renders as SUCCESS like a terminated reference
    # criterion
    assert "INIT" not in text

    bad = ResultOutputProvider("s2", [_Crit("FAILURE", 3.0)],
                               duration_game=25.0, duration_system=1.0,
                               timeout=20.0, timed_out=True)
    assert bad.result() == "FAILURE"
    junit = tmp_path / "out.xml"
    bad.write(stdout=False, filename=str(tmp_path / "out.txt"),
              junit=str(junit))
    suite = ET.parse(junit).getroot()
    assert suite.get("failures") == "1"
    cases = {c.get("name"): c for c in suite}
    assert cases["_Crit"].find("failure") is not None
    assert cases["Timeout"].find("failure") is not None
    assert "---- FAILURE" in (tmp_path / "out.txt").read_text()


def test_running_criterion_counts_as_failure():
    r = ResultOutputProvider("s3", [_Crit("RUNNING")], 5.0, 1.0)
    assert r.result() == "FAILURE"


def test_scenario_runner_cli(tmp_path):
    """The CLI drives a full expert episode and exits 0 with a SUCCESS
    report; --list prints the registry."""
    env = {"PALLAS_AXON_POOL_IPS": "", "PATH": "/usr/bin:/bin",
           "PYTHONPATH": "/root/repo", "HOME": "/root"}
    out = subprocess.run(
        [sys.executable, "scripts/run_scenario.py", "--list"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=120)
    assert out.returncode == 0
    assert "dynamic_object_crossing" in out.stdout

    junit = tmp_path / "run.xml"
    out = subprocess.run(
        [sys.executable, "scripts/run_scenario.py",
         "--scenario", "follow_leading_vehicle",
         "--junit", str(junit), "--output-file",
         str(tmp_path / "run.txt")],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Results of Scenario: follow_leading_vehicle" in out.stdout
    assert ET.parse(junit).getroot().get("failures") == "0"
