"""Driver-stack fuzz: mutated whole archives through open+extract.

Reduced-round version of tools/fuzz_mass.py (the PROTOS-C10 runner
discipline, reference test/cabd_c10); the long sweep is
`python tools/fuzz_mass.py 5000`.
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

import fuzz_mass


@pytest.mark.parametrize("kind", ["cab", "szdd", "kwaj", "chm", "oab"])
def test_driver_mutation_sweep(kind):
    arcs = fuzz_mass.build_archives()
    if kind not in arcs:
        pytest.skip(f"no {kind} sample")
    done, fails = fuzz_mass.sweep(kind, arcs[kind], rounds=120, seed=7,
                                  time_budget_s=30)
    assert not fails, fails[:3]
    assert done > 0
