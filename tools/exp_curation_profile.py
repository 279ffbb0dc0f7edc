"""Where does curation_run's wall time go? Times each curator stage
CUMULATIVELY (quality gate -> exact dedup -> near-dup pair join -> CC
loop -> full decision record) by materializing progressively longer
prefixes of the pipeline to a noop sink in one session, clearCache
between runs. The difference between consecutive rows is that stage's
marginal cost at the bench SF.

Usage: python tools/exp_curation_profile.py [--sf DIR] [--runs N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def _timed(spark, label: str, build, runs: int) -> None:
    build().write.mode("overwrite").format("noop").save()  # warm-up
    spark.catalog.clearCache()
    samples = []
    for _ in range(runs):
        t0 = time.time()
        build().write.mode("overwrite").format("noop").save()
        samples.append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
    med = sorted(samples)[len(samples) // 2]
    print(f"{label}: median={med} samples={samples}", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from kcbdml9_big_data_processing_spark.jobs.training_data import (
        TrainingDataCurator,
    )
    from kcbdml9_big_data_processing_spark.queries.curation import (
        _DROP,
        _EXACT_OFFSET,
        _PERTURB_OFFSET,
        _WS,
    )
    from kcbdml9_big_data_processing_spark.queries.dedup import (
        _exact_jaccard_pairs,
        connected_components,
        shingle_docs,
    )
    from kcbdml9_big_data_processing_spark.queries import QUERIES
    from kcbdml9_big_data_processing_spark.session import get_spark
    from kcbdml9_big_data_processing_spark.sources.parquet import read_table

    spark = get_spark(app_name="exp_curation_profile")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def corpus() -> DataFrame:
        docs = read_table(spark, args.sf, "documents").select("doc_id", "text")
        toks = F.split(F.trim(F.col("text")), _WS)
        perturbed_text = F.array_join(
            F.slice(toks, 1, F.greatest(F.size(toks) - _DROP, F.lit(1))), " "
        )
        return docs.unionAll(
            docs.select((F.col("doc_id") + _EXACT_OFFSET).alias("doc_id"), "text")
        ).unionAll(
            docs.select(
                (F.col("doc_id") + _PERTURB_OFFSET).alias("doc_id"),
                perturbed_text.alias("text"),
            )
        )

    cur = TrainingDataCurator()

    _timed(spark, "corpus_scan", corpus, args.runs)
    _timed(
        spark,
        "quality_gate",
        lambda: cur.quality_gate(corpus())[0],
        args.runs,
    )
    _timed(
        spark,
        "+exact_dedup",
        lambda: cur.exact_dedup(cur.quality_gate(corpus())[0])[0],
        args.runs,
    )

    def pairs() -> DataFrame:
        e_kept = cur.exact_dedup(cur.quality_gate(corpus())[0])[0]
        prepped = shingle_docs(e_kept)
        return _exact_jaccard_pairs(
            prepped, jaccard_min=cur.config.jaccard_min
        ).select("doc_a", "doc_b")

    _timed(spark, "+pair_join", pairs, args.runs)

    def cc() -> DataFrame:
        e_kept = cur.exact_dedup(cur.quality_gate(corpus())[0])[0]
        prepped = shingle_docs(e_kept).persist()
        prepped.count()
        p = _exact_jaccard_pairs(
            prepped, jaccard_min=cur.config.jaccard_min
        ).select("doc_a", "doc_b")
        labels = connected_components(
            e_kept.select("doc_id"), p,
            reliable_checkpoint=cur.config.reliable_checkpoint,
        )
        prepped.unpersist()
        return labels

    _timed(spark, "+cc_loop", cc, args.runs)
    _timed(
        spark,
        "full_curation_run",
        lambda: QUERIES["curation_run"].fn(spark, args.sf),
        args.runs,
    )
    spark.stop()


if __name__ == "__main__":
    main()
