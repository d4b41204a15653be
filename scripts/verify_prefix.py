#!/usr/bin/env python
"""Pre-verify the driver's exact 50-id sampling prefix.

Runs driver_sim over ``driver_order()[:50]`` (what CORRECTNESS_r{N}
will sample) and prints the ids so the result can be pasted into
DRIVER_SIM_r{N}.log. Pair with
tests/test_scale_techniques.py::test_driver_prefix_matches_committed_log,
which pins the committed log's prefix against the live rotation —
the workflow is: add ids → run this → update the log → the guard
stays green.

Usage: python scripts/verify_prefix.py
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from flink_realtime_2024_spark.plans.registry import driver_order  # noqa: E402

prefix = list(driver_order())[:50]
print("## sampling prefix (%d ids)" % len(prefix), flush=True)
proc = subprocess.run(
    [sys.executable, os.path.join(HERE, "driver_sim.py"), *prefix],
    stderr=subprocess.DEVNULL,
)
sys.exit(proc.returncode)
