"""Regenerate tests/stream_state_ceilings.json: the per-stream-row
state-operator pins the structural streaming guard in
tests/test_stream_state.py enforces.

    PYTHONPATH=/root/repo python tools/pin_stream_state.py

Runs every registered stream_* row's bounded replay at the test SF
(sf0.001 — same constant the guard measures at) and records, per
StreamExecution handle, the state-operator NAME SET (exact pin: an
edit that adds/removes/swaps a stateful operator fails the guard) and
the peak total state rows across micro-batches (ceiling pin with a
1.25x guard band: state volume at a fixed SF is deterministic up to
micro-batch splitting, and a future edit that balloons state — e.g.
carrying whole rows through join state, or dropping an eviction path
— blows well past the band). Run it when a stream row's stateful
shape legitimately changes; the guard's failure message points here.
"""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

# the SAME constant the guard measures at (see pin_plan_ceilings.py)
from conftest import SF_SMOKE as SF  # noqa: E402

OUT = os.path.join(_REPO, "tests", "stream_state_ceilings.json")

#: ceiling = ceil(observed_peak * BAND) — wide enough for micro-batch
#: splitting jitter, far below any state-shape regression (which
#: multiplies rows by key cardinality, not percent)
BAND = 1.25


def main() -> int:
    import math

    from kcbdml9_big_data_processing_spark.queries import QUERIES
    from kcbdml9_big_data_processing_spark.session import get_spark
    from kcbdml9_big_data_processing_spark.streaming import telemetry

    spark = get_spark(app_name="pin_stream_state")
    out = {}
    for name, spec in sorted(QUERIES.items()):
        if not name.startswith("stream_"):
            continue
        telemetry.LAST_STATE.pop(name, None)
        spec.fn(spark, SF)
        row = telemetry.summarize_row(name)
        out[name] = {
            handle: {
                "operators": s["operators"],
                "rows_ceiling": int(math.ceil(s["peak_rows"] * BAND)),
            }
            for handle, s in row.items()
        }
        print(f"{name}: {out[name]}")
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT} ({len(out)} stream rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
