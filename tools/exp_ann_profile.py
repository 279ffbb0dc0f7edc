"""One-off profiler for the ann_index_suite regression (r9 item 1):
times plan-construction vs execution for each variant and the suite,
with and without the suite-level persist barrier.

Measurement asymmetry after the r9 plan cache (r9 ADVICE): the
'suite(as-is)' rows hit the _prepared_plan entry cached during the
warm-up run, while every 'suite(no-persist)' run rebuilds and
re-analyzes its plan from scratch — so the two series differ by plan
cache + barrier, not the barrier alone. To isolate the barrier cost
by itself, clear S._PREPARED_PLANS between 'as-is' runs (the r9
commit's numbers were taken pre-cache, where the comparison was
clean)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    from kcbdml9_big_data_processing_spark.queries import similarity as S
    from kcbdml9_big_data_processing_spark.queries import QUERIES
    from kcbdml9_big_data_processing_spark.session import get_spark
    from kcbdml9_big_data_processing_spark.sources.parquet import read_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ann_profile")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # warm: run suite once (builds indexes, codegen)
    QUERIES["ann_index_suite"].fn(spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    spark.catalog.clearCache()

    def t(label, fn, runs=3):
        samples = []
        for _ in range(runs):
            t0 = time.time()
            fn()
            samples.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        print(f"{label}: median={sorted(samples)[len(samples)//2]} {samples}")

    # full suite as registered
    t("suite(as-is)", lambda: QUERIES["ann_index_suite"].fn(spark, sf_dir)
      .write.mode("overwrite").format("noop").save())

    # suite without persist barrier
    def suite_nopersist():
        emb = read_table(spark, sf_dir, "embeddings")
        parts = [
            S.ann_lsh_cosine(spark, sf_dir, emb).select(
                F.lit("lsh").alias("variant"), "probe_id", "vec_id", "cosine", "rank"),
            S.ivf_ann_cosine(spark, sf_dir, emb).select(
                F.lit("ivf").alias("variant"), "probe_id", "vec_id", "cosine", "rank"),
            S.pq_ann_cosine(spark, sf_dir, emb).select(
                F.lit("pq").alias("variant"), "probe_id", "vec_id", "cosine", "rank"),
            S.ivfpq_ann_cosine(spark, sf_dir, emb).select(
                F.lit("ivfpq").alias("variant"), "probe_id", "vec_id", "cosine", "rank"),
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        out.write.mode("overwrite").format("noop").save()

    t("suite(no-persist)", suite_nopersist)

    # plan-construction only (no execution): how much is driver-side
    # python + analysis?
    def build_only():
        emb = read_table(spark, sf_dir, "embeddings").persist()
        emb.count()
        parts = [
            S.ann_lsh_cosine(spark, sf_dir, emb),
            S.ivf_ann_cosine(spark, sf_dir, emb),
            S.pq_ann_cosine(spark, sf_dir, emb),
            S.ivfpq_ann_cosine(spark, sf_dir, emb),
        ]
        for p in parts:
            p.schema  # force analysis
        emb.unpersist()

    t("plan+analyze only (with persist+count)", build_only)

    # each variant alone, steady-state
    for name, fn in [
        ("lsh", S.ann_lsh_cosine),
        ("ivf", S.ivf_ann_cosine),
        ("pq", S.pq_ann_cosine),
        ("ivfpq", S.ivfpq_ann_cosine),
    ]:
        t(f"variant {name}", lambda fn=fn: fn(spark, sf_dir)
          .write.mode("overwrite").format("noop").save())

    spark.stop()


if __name__ == "__main__":
    main()
