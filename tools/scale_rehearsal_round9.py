"""Round-9 rehearsal (VERDICT r8 item 5): dp33's quota path — the
`stratified_sample` window over cell assignments — at 10M vectors with
ONE corpus-dominating hot cell, measuring the `prefilter_hex4`
pre-thin knob.

The shape under test: `diversity_sample` ends in ONE shuffle keyed by
~n_cells values (`Window.partitionBy("cell")` + row_number).  With 16
cells that is a 16-key shuffle — and when embedding space is lumpy,
one cell can own most of the corpus, so the reducer that sorts that
cell's rows IS the job's critical path (same failure mode as round 8's
viral LSH bucket, different operator).  `prefilter_hex4` hash-thins
every stratum BEFORE the exchange with a narrow md5-prefix filter, so
the hot reducer ranks a bounded candidate set; because ranking is by
(md5(id), id) ascending, any threshold that keeps >= per_cell
survivors in every stratum leaves the selected sample BIT-IDENTICAL
(the kept rows are exactly the lowest hashes).

Honest-limits note (the round-8 salting lesson applied here): the
threshold is bounded BELOW by the SMALLEST stratum, not the hottest —
expected survivors per stratum are |stratum| * t/65536 and must exceed
the quota with margin, so a corpus with both a viral cell and tiny
cells cannot thin as aggressively as the hot cell alone would allow.
The rehearsal uses 0x0800/0x10000 = 1/32: hot cell 8M -> ~250k ranked
rows, cold cells ~133k -> ~4.2k (quota 1000, >4x margin).

Run: python tools/scale_rehearsal_round9.py   (local[32], ~2 min)
Results are recorded in SCALE.md ("Round-9 rehearsal").
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from transaq_clickhouse_exporter_spark.datapipe.sampling import (  # noqa: E402
    stratified_sample,
)
from transaq_clickhouse_exporter_spark.session import get_spark  # noqa: E402

N = 10_000_000
HOT_FRACTION = 0.8  # cell 0 owns 80% of the corpus
N_CELLS = 16
PER_CELL = 1_000
THRESH = "0800"  # 1/32 pre-thin: smallest stratum ~133k -> ~4.2k >= 4x quota


def main() -> None:
    spark = get_spark(app="tce-diversity-rehearsal")
    hot_n = int(N * HOT_FRACTION)
    # deterministic assignment: first 8M ids -> cell 0 (the viral
    # region), the rest round-robin cells 1..15
    asg = spark.range(N).select(
        F.col("id").cast("string").alias("vec_id"),
        F.when(F.col("id") < hot_n, F.lit(0))
        .otherwise((F.col("id") % (N_CELLS - 1) + 1))
        .cast("int")
        .alias("cell"),
    )
    asg.write.mode("overwrite").parquet("/tmp/tce_diversity_asg")
    asg = spark.read.parquet("/tmp/tce_diversity_asg")

    results = {}
    for label, pre in (("unthinned", None), (f"prefilter={THRESH}", THRESH)):
        t0 = time.perf_counter()
        n = stratified_sample(asg, ["cell"], PER_CELL, "vec_id", pre).count()
        dt = time.perf_counter() - t0
        assert n == N_CELLS * PER_CELL, (label, n)
        results[label] = dt
        print(f"{label:16s} kept={n:,} wall={dt:.1f}s", flush=True)

    # the pre-thin must not change the SELECTION (md5-ascending rank:
    # the per-cell winners all sit far below the threshold)
    a = stratified_sample(asg, ["cell"], PER_CELL, "vec_id", None)
    b = stratified_sample(asg, ["cell"], PER_CELL, "vec_id", THRESH)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    print("selection identical with and without pre-thin")
    print({k: round(v, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()
