"""Batch job orchestration: one join, cached, four outputs."""

from __future__ import annotations

from pyspark.sql import DataFrame

from kcbdml9_big_data_processing_spark.jobs.batch import BatchJob, BatchJobConfig
from kcbdml9_big_data_processing_spark.queries import QUERIES
from kcbdml9_big_data_processing_spark.sources.parquet import read_table

SF = "/root/testdata/sf0.001"


def test_batch_job_fanout_matches_registry(spark):
    fact = read_table(spark, SF, "events")
    dim = read_table(spark, SF, "customer")
    job = BatchJob(
        BatchJobConfig(
            fact_key="user_id",
            dim_key="c_custkey",
            ts_col="ts",
            value_col="value",
            metrics=[
                ("event_type", "antenna_bytes_total"),
                ("c_name", "email_bytes_total"),
            ],
            quota_user_col="c_name",
            quota_col="c_acctbal",
        )
    )
    got: dict[str, list] = {}

    def write(name: str, df: DataFrame) -> None:
        got[name] = df.collect()  # materialize inside the writer

    job.run(fact, dim, write)

    assert set(got) == {"antenna_bytes_total", "email_bytes_total", "quota_violations"}
    # the email metric must equal the standalone registry query
    from kcbdml9_big_data_processing_spark.queries.parity import bytes_email_hourly

    want = bytes_email_hourly(spark, SF).collect()
    assert sorted(map(tuple, got["email_bytes_total"])) == sorted(map(tuple, want))
    # and the quota report must match the registry's too (modulo column names)
    want_q = QUERIES["quota_violations_hourly"].fn(spark, SF).collect()
    assert sorted((r[0], r[1], r[2], r[3]) for r in got["quota_violations"]) == sorted(
        map(tuple, want_q)
    )
