"""Empirical scaling probe: measure how the heavy operators grow as
the corpus multiplies, turning SCALE.md's design arguments into
recorded curves.

Each probed operator runs over the sf0.1 documents corpus inflated
1x/2x/4x in LAYERS: layer k rewrites every token with a _k suffix
(vocabulary-disjoint from every other layer) and contributes its own
exact copy + last-2-tokens-dropped near-dup at disjoint id offsets.
So each layer carries the same internal duplicate structure as the
registry's curation scenario while layers share no shingles — the
duplicate RATE stays constant as the corpus grows, which is the
realistic regime (doubling a crawl doesn't make every old page a
near-dup of a new one). Inflating instead with mutually-similar
copies would grow Σ C(df,2) pair-join work quadratically in the
multiplier purely as a test artifact. Wall time is the median of N
noop-sink materializations, same methodology as bench.py. Output: one
JSON line + SCALE_PROBE.json with per-operator [{mult, sec}] series
and the fitted growth exponent log(t4/t1)/log(4) — ~1.0 means linear
in corpus size.

Usage: python tools/scale_probe.py [--runs 3] [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MULTS = [1, 2, 4]


def _inflate(docs, mult):
    """``mult`` vocabulary-disjoint layers, each with the registry
    curation scenario's duplicate structure: originals + an exact copy
    + a last-2-tokens-dropped near-dup, at disjoint id offsets."""
    from pyspark.sql import functions as F

    layers = []
    for k in range(mult):
        toks = F.split(F.trim(F.col("text")), r"\s+")
        if k > 0:
            # rewrite the vocabulary: every token gets a layer suffix,
            # so no shingle is shared across layers
            toks = F.transform(toks, lambda t: F.concat(t, F.lit(f"_{k}")))
        text = F.array_join(toks, " ")
        near = F.array_join(
            F.slice(toks, 1, F.greatest(F.size(toks) - 2, F.lit(1))), " "
        )
        base_off = 100_000_000 * k
        layers.append(
            docs.select(
                (F.col("doc_id") + base_off).alias("doc_id"), text.alias("text")
            )
            .unionAll(
                docs.select(
                    (F.col("doc_id") + base_off + 30_000_000).alias("doc_id"),
                    text.alias("text"),
                )
            )
            .unionAll(
                docs.select(
                    (F.col("doc_id") + base_off + 60_000_000).alias("doc_id"),
                    near.alias("text"),
                )
            )
        )
    out = layers[0]
    for layer in layers[1:]:
        out = out.unionAll(layer)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from kcbdml9_big_data_processing_spark.jobs.training_data import (
        TrainingDataCurator,
    )
    from kcbdml9_big_data_processing_spark.queries.dedup import (
        _exact_jaccard_pairs,
        connected_components,
        shingle_docs,
    )
    from kcbdml9_big_data_processing_spark.session import get_spark
    from kcbdml9_big_data_processing_spark.sources.parquet import read_table

    spark = get_spark(app_name="scale_probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def exact_dedup(corpus):
        norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
        return (
            corpus.withColumn("h", F.sha2(norm, 256))
            .groupBy("h")
            .agg(F.min("doc_id").alias("canonical_id"), F.count(F.lit(1)).alias("n"))
        )

    def ngram_pairs(corpus):
        prepped = shingle_docs(corpus).persist()
        prepped.count()
        cleanup = [prepped]
        try:
            return _exact_jaccard_pairs(prepped, cleanup=cleanup), cleanup
        except Exception:
            for f in cleanup:
                f.unpersist()
            raise

    def clusters(corpus):
        prepped = shingle_docs(corpus).persist()
        prepped.count()
        cleanup = [prepped]
        pairs = _exact_jaccard_pairs(prepped, cleanup=cleanup).select(
            "doc_a", "doc_b"
        )
        return (
            connected_components(corpus.select("doc_id"), pairs),
            cleanup,
        )

    def curator(corpus):
        cleanup: list = []
        _, decisions = TrainingDataCurator().run(corpus, cleanup=cleanup)
        return decisions, cleanup

    OPS = {
        "exact_dedup": lambda c: (exact_dedup(c), []),
        "ngram_jaccard_pairs": ngram_pairs,
        "dedup_clusters": clusters,
        "curation_run": curator,
    }

    base = read_table(spark, args.sf, "documents").select("doc_id", "text")
    results: dict[str, list[dict]] = {}
    for name, make in OPS.items():
        series = []
        for mult in MULTS:
            corpus = _inflate(base, mult).persist()
            n = corpus.count()
            samples = []
            for _ in range(args.runs):
                t0 = time.time()
                out, cleanup = make(corpus)
                out.write.mode("overwrite").format("noop").save()
                samples.append(round(time.time() - t0, 3))
                for f in cleanup:
                    f.unpersist()
            corpus.unpersist()
            spark.catalog.clearCache()
            med = sorted(samples)[len(samples) // 2]
            series.append({"mult": mult, "rows": n, "sec": med, "samples": samples})
            print(f"{name} x{mult}: {med}s {samples}", file=sys.stderr)
        t1, t4 = series[0]["sec"], series[-1]["sec"]
        exponent = round(math.log(t4 / t1) / math.log(MULTS[-1]), 3) if t1 > 0 else None
        results[name] = {"series": series, "growth_exponent": exponent}

    payload = {"sf": args.sf, "runs_per_point": args.runs, "operators": results}
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "SCALE_PROBE.json"), "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
