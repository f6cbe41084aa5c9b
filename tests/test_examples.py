"""Run every runnable example end-to-end with a tiny sampling budget.

The examples are the de facto tutorials (the reference builds its example
notebooks into docs, reference docs/conf.py:44-59); running all of them in
the suite keeps them from rotting.  ``coal_disasters`` additionally checks
its statistical oracle at full budget in the slow lane.
"""

import importlib
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

EXAMPLES = [
    ("coal_disasters", ["main"]),
    ("friedman_regression", ["main"]),
    ("classification", ["binary", "categorical"]),
    ("heteroscedastic", ["main"]),
    ("high_dim_selection", ["main"]),
    ("out_of_sample", ["main"]),
]


@pytest.fixture
def tiny_budget(monkeypatch):
    """Clamp pmb.sample budgets so examples run in seconds on CPU."""
    import pymc_bart_tpu as pmb

    real_sample = pmb.sample

    def clamped(*args, **kwargs):
        kwargs["tune"] = min(int(kwargs.get("tune", 100)), 15)
        kwargs["draws"] = min(int(kwargs.get("draws", 100)), 15)
        kwargs["chains"] = min(int(kwargs.get("chains", 1)), 2)
        kwargs["progressbar"] = False
        return real_sample(*args, **kwargs)

    monkeypatch.setattr(pmb, "sample", clamped)
    # examples call pmb.sample inside a model context via the module
    # attribute, so patching the package attribute is sufficient
    yield


@pytest.mark.parametrize("module_name,entries", EXAMPLES,
                         ids=[m for m, _ in EXAMPLES])
def test_example_runs(module_name, entries, tiny_budget, monkeypatch):
    import matplotlib

    matplotlib.use("Agg")
    mod = importlib.import_module(module_name)
    importlib.reload(mod)  # pick up the patched pmb.sample
    for entry in entries:
        getattr(mod, entry)()


@pytest.mark.slow
def test_coal_rate_drop_full_budget():
    """Statistical oracle: the known sharp rate drop ~1890 is recovered."""
    import coal_disasters

    early, late = coal_disasters.main(n_bins=40)
    assert early > 1.5 * late, (early, late)
