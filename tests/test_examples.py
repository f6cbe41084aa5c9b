"""Run the coal-disasters parity example and check the known structural
change (sharp rate drop ~1890) is recovered."""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def test_coal_rate_drop():
    import coal_disasters

    early, late = coal_disasters.main(n_bins=40)
    assert early > 1.5 * late, (early, late)
