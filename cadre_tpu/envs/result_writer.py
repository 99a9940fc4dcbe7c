"""Scenario result report: the srunner ResultOutputProvider analog.

The reference gathers each scenario's criteria into a terminal/file/JUnit
report (scenario_runner/srunner/scenariomanager/result_writer.py:19-178:
scenario name + overall result, simulation timing table, per-criterion
rows with status and actual values, plus a timeout row). This module
renders the same report over our simulator-agnostic `envs.criteria`
state machines.

Differences by design: criteria carry no per-actor CARLA ids (the
synthetic env has one ego), and "expected value" is the criterion's
success threshold where one exists (`expected` attribute) else 0.
"""
from __future__ import annotations

import time
import xml.etree.ElementTree as ET
from typing import Optional, Sequence

from tabulate import tabulate

from cadre_tpu.envs.criteria import Criterion


class ResultOutputProvider:
    """Render one scenario run's criteria as terminal / file / JUnit output
    (result_writer.py:19-178)."""

    def __init__(self, scenario_name: str, criteria: Sequence[Criterion],
                 duration_game: float, duration_system: float,
                 timeout: Optional[float] = None,
                 timed_out: bool = False,
                 start_system_time: Optional[float] = None,
                 ego_name: str = "hero",
                 other_actors: Sequence[str] = ()):
        self.scenario_name = scenario_name
        self.criteria = list(criteria)
        self.duration_game = duration_game
        self.duration_system = duration_system
        self.timeout = timeout
        self.timed_out = timed_out
        self.ego_name = ego_name
        self.other_actors = list(other_actors)
        end = time.time()
        start = start_system_time if start_system_time is not None \
            else end - duration_system
        self._start_time = time.strftime("%Y-%m-%d %H:%M:%S",
                                         time.localtime(start))
        self._end_time = time.strftime("%Y-%m-%d %H:%M:%S",
                                       time.localtime(end))

    # -- status helpers -------------------------------------------------
    @staticmethod
    def _status(crit: Criterion) -> str:
        """Status mapping per the reference's conventions: RUNNING at
        report time counts as FAILURE (result_writer.py:110); INIT (the
        criterion ran the episode and never recorded a violation) renders
        as SUCCESS like a terminated reference criterion; ACCEPTABLE
        passes through."""
        status = getattr(crit, "test_status", "INIT")
        if status == "RUNNING":
            return "FAILURE"
        if status == "INIT":
            return "SUCCESS"
        return status

    def result(self) -> str:
        if self.timed_out:
            return "FAILURE"
        for crit in self.criteria:
            if self._status(crit) == "FAILURE":
                return "FAILURE"
        return "SUCCESS"

    # -- outputs --------------------------------------------------------
    def create_output_text(self) -> str:
        out = "\n"
        out += (f" ======= Results of Scenario: {self.scenario_name} "
                f"---- {self.result()} =======\n\n")
        out += f" > Ego vehicles:\n{self.ego_name};\n\n"
        out += " > Other actors:\n"
        out += "".join(f"{a}; " for a in self.other_actors) + "\n\n"
        out += " > Simulation Information\n"
        ratio = round(self.duration_game / self.duration_system, 3) \
            if self.duration_system else 0.0
        stats = [["Start Time", self._start_time],
                 ["End Time", self._end_time],
                 ["Duration (System Time)",
                  f"{round(self.duration_system, 2)}s"],
                 ["Duration (Game Time)", f"{round(self.duration_game, 2)}s"],
                 ["Ratio (Game Time / System Time)", f"{ratio}s"]]
        out += tabulate(stats, tablefmt="fancy_grid") + "\n\n"
        out += " > Criteria Information\n"
        rows = [["Actor", "Criterion", "Result", "Actual Value",
                 "Expected Value"]]
        for crit in self.criteria:
            rows.append([self.ego_name,
                         f"{type(crit).__name__} (Req.)",
                         self._status(crit),
                         getattr(crit, "actual_value", 0.0),
                         getattr(crit, "expected", 0)])
        if self.timeout is not None:
            rows.append(["", "Timeout (Req.)",
                         "FAILURE" if self.timed_out else "SUCCESS",
                         round(self.duration_game, 2),
                         round(self.timeout, 2)])
        out += tabulate(rows, headers="firstrow", tablefmt="fancy_grid")
        out += "\n"
        return out

    def _write_junit(self, path: str) -> None:
        suite = ET.Element(
            "testsuite", name=self.scenario_name,
            tests=str(len(self.criteria)),
            failures=str(sum(1 for c in self.criteria
                             if self._status(c) == "FAILURE")),
            time=str(round(self.duration_system, 2)))
        for crit in self.criteria:
            case = ET.SubElement(suite, "testcase",
                                 name=type(crit).__name__,
                                 classname=self.scenario_name)
            if self._status(crit) == "FAILURE":
                ET.SubElement(
                    case, "failure",
                    message=f"actual={getattr(crit, 'actual_value', 0.0)}")
        if self.timeout is not None:
            case = ET.SubElement(suite, "testcase", name="Timeout",
                                 classname=self.scenario_name)
            if self.timed_out:
                ET.SubElement(case, "failure",
                              message=f"game time {self.duration_game:.1f}s"
                                      f" > timeout {self.timeout:.1f}s")
        ET.ElementTree(suite).write(path, encoding="unicode",
                                    xml_declaration=True)

    def write(self, stdout: bool = True, filename: Optional[str] = None,
              junit: Optional[str] = None) -> str:
        text = self.create_output_text()
        if filename:
            with open(filename, "w") as f:
                f.write(text)
        if junit:
            self._write_junit(junit)
        if stdout:
            print(text)
        return text
