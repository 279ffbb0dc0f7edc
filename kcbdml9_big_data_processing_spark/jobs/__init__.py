"""Job orchestration layer — the reference's template-method run()
pipelines (batch/BatchJob.scala:28-47, streaming via
``streaming.job``) recomposed from the operator vocabulary with typed
config instead of positional arg arrays (M3/M4 in SURVEY.md §2.11).
"""

from .batch import BatchJob, BatchJobConfig  # noqa: F401
