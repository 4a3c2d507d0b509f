"""The end-to-end demo (reference run_demo.sh analogue) must run
inside the suite and produce the expected split."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))


def test_demo_end_to_end(spark):
    from order_pipeline_demo import main

    counters = main(n_orders=20, spark=spark)
    assert counters["processed"] == 20        # all generated orders valid
    assert counters["sent_to_dlq"] == 2       # the two seeded invalids
    assert counters["offered"] == 22
