"""Run-level crash-safe commit for the curate pipeline (r14 verdict
"what's wrong" #2 / next-round #1).

A curate run produces THREE artifacts whose lockstep is the
daily-incremental contract: the kept corpus (the next run's archive),
the decision record, and the near-dup index maintenance (built over
exactly that kept set, or extended by exactly this batch). The legacy
CLI path writes them as three separate parquet jobs — each one
committer-atomic, but a crash BETWEEN them tears the RUN: a kept set
without its decision record, or an archive ahead of its index, which
is precisely the state ``run_incremental``'s own preconditions
reject. (The reference has the same weakness one level down: its
batch job appends four tables with no transaction —
BatchJobImpl.scala:90-100; SURVEY.md §7.4 flagged it, and the index
family fixed it for indexes in r10/r11.)

This module lifts the index family's recipe (versioned dirs + a tiny
append-only meta table as the single atomicity point —
queries/similarity._gen_begin/_gen_commit) to the RUN level:

- every run stages ALL its outputs under ``{root}/runs/r{N:06d}``
  (kept, decisions, step markers);
- the index lives at ``{root}/index`` and keeps its own generation
  machinery (a full run's build commits a fresh generation; an
  incremental run's extend appends — bracketed by markers, below);
- the run goes live only at the single ``{root}/run_meta`` append.
  Readers (the next run, external consumers) resolve the current
  archive as the max-run_id row's ``{dir}/kept`` — an unpublished run
  dir is INVISIBLE.

Torn-run detection and idempotent retry: the next run_id is always
``latest committed + 1``, so a crashed attempt and its retry compute
the SAME run dir. Finding that dir already present means the prior
attempt tore somewhere before its meta append; the recovery depends
on how far it got, read off the staged markers:

- ``index_done`` present — every write finished, only the publish is
  missing: the retry APPENDS THE META ROW AND MOVES ON (auto-resume;
  the new batch then curates against the just-published archive as
  the next run). Nothing recomputes.
- ``index_started`` present without ``index_done``, on an INCREMENTAL
  intent — the extend may have appended partial postings/hashes to
  the index's current generation, and extend is not idempotent (a
  redo would double-append whatever landed). The retry REFUSES until
  ``repair_index=True`` rebuilds the index from the last COMMITTED
  archive (a fresh generation supersedes the poisoned one — the
  generation layer's whole point), clears the torn dir, and redoes
  the batch.
- anything earlier (including a full run's partial index BUILD, which
  stages into a generation dir and is safely redoable) — the torn dir
  is dead weight: ``retry_torn=True`` deletes it and redoes the run;
  without the flag the attempt refuses loudly (an operator must opt
  into discarding staged bytes).

Single writer per root assumed, exactly as for the index generations
(two concurrent curate runs would stage into the same run dir); the
opt-in index writer lock (similarity.enable_index_writer_locking)
covers the index legs, and a deployment needing run-level mutual
exclusion schedules one curate job per root — the same posture as
compact_dedup_index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..fs import delete_recursive as _delete
from ..fs import dir_has_parquet, exists as _exists

_RUN_META_SCHEMA = "run_id int, dir string, mode string"
_INTENT_SCHEMA = "mode string"
_MARK_SCHEMA = "ok boolean"


class TornRunError(RuntimeError):
    """A prior curate attempt on this root crashed before its meta
    commit; the message names the recovery (``retry_torn`` /
    ``repair_index``)."""


class RunUsageError(ValueError):
    """A mode/flag combination curate_run_root refuses BEFORE staging
    anything (r15 review: the intent marker must never be written on
    a pure usage error, or a typo'd flag escalates into a torn-run
    recovery intervention). The CLI maps this to exit 2; every other
    exception propagates loudly with its traceback."""


def _write_stage(df: DataFrame, path: str) -> None:
    """One staged artifact write (kept / decisions) — a seam the
    kill-between-writes tests monkeypatch to crash the run at exact
    points of the matrix."""
    df.write.mode("overwrite").parquet(path)


def _mark(spark: SparkSession, path: str) -> None:
    """Stage a step marker: a one-row parquet table (committer-atomic
    like every other write here — a crashed marker write is absent,
    which is the conservative reading for every marker below)."""
    spark.createDataFrame([(True,)], _MARK_SCHEMA).write.mode(
        "overwrite"
    ).parquet(path)


def _marked(spark: SparkSession, path: str) -> bool:
    return dir_has_parquet(spark, path)


def run_dir(root: str, run_id: int) -> str:
    return f"{root}/runs/r{run_id:06d}"


def index_root(root: str) -> str:
    return f"{root}/index"


def run_rows(spark: SparkSession, root: str) -> list[dict]:
    """Every COMMITTED run's meta row, ascending by run_id ([] on a
    fresh root). Absence decided by a driver-side FS check, not a
    caught read error (the _gen_meta_row posture: a transient failure
    must propagate, not misread as 'fresh root' and silently re-run a
    full curation). Bounded driver rows: one ~3-field row per
    PUBLISHED run — days, not data."""
    meta_dir = f"{root}/run_meta"
    if not _exists(spark, meta_dir):
        return []
    return [
        r.asDict()
        for r in (
            spark.read.schema(_RUN_META_SCHEMA)
            .parquet(meta_dir)
            .orderBy("run_id")
            .collect()
        )
    ]


def latest_run(spark: SparkSession, root: str) -> dict | None:
    """Newest committed run's meta row as a dict, or None."""
    rows = run_rows(spark, root)
    return rows[-1] if rows else None


def standing_archive(spark: SparkSession, root: str) -> DataFrame | None:
    """The standing curated corpus a new incremental batch must honor:
    the last FULL run's kept set unioned with every incremental kept
    set published since (a full run rebuilds the index over its own
    kept set, resetting the lineage). This is exactly the frame
    run_incremental's preconditions call ``archive`` — with a current
    index the plan never scans it (the stored hash map answers the
    exact stage; poison-UDF-pinned in tests/test_pipeline.py), so the
    union stays an unexecuted lazy plan, but the semantics must hold
    for the legacy fallback and the monotonic-id guard alike."""
    return _standing_from_rows(spark, run_rows(spark, root))


def _standing_from_rows(
    spark: SparkSession, rows: list[dict]
) -> DataFrame | None:
    """standing_archive over already-loaded meta rows — one run_meta
    read per invocation instead of one per consumer (r15 review)."""
    if not rows:
        return None
    start = max(
        (i for i, r in enumerate(rows) if r["mode"] == "full"), default=0
    )
    frames = [
        spark.read.parquet(f"{r['dir']}/kept") for r in rows[start:]
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def _commit(
    spark: SparkSession, root: str, run_id: int, rdir: str, mode: str
) -> None:
    """THE commit point: one append-only meta row flips the run live."""
    spark.createDataFrame(
        [(run_id, rdir, mode)], _RUN_META_SCHEMA
    ).write.mode("append").parquet(f"{root}/run_meta")


def _intent(spark: SparkSession, rdir: str) -> str | None:
    path = f"{rdir}/intent"
    if not _marked(spark, path):
        return None
    row = spark.read.schema(_INTENT_SCHEMA).parquet(path).first()
    return None if row is None else row["mode"]


def _torn_state(spark: SparkSession, rdir: str) -> tuple[str, str | None]:
    """Classify an existing-but-unpublished run dir:
    ``('complete'|'partial_extend'|'partial_stage', intent)`` — the
    one classification both the recovery path and the read-only
    status verb apply, so they can never disagree on what a torn dir
    needs."""
    intent = _intent(spark, rdir)
    if _marked(spark, f"{rdir}/index_done") and intent is not None:
        return "complete", intent
    if _marked(spark, f"{rdir}/index_started") and intent == "incremental":
        return "partial_extend", intent
    return "partial_stage", intent


def run_status(spark: SparkSession, root: str) -> dict:
    """Read-only root inspection: every published run plus the torn
    next-run attempt (if any) with the recovery it needs — an
    operator's first move after a crashed curate, side-effect-free."""
    rows = run_rows(spark, root)
    nxt = 1 if not rows else int(rows[-1]["run_id"]) + 1
    rdir = run_dir(root, nxt)
    torn = None
    if _exists(spark, rdir):
        state, intent = _torn_state(spark, rdir)
        recovery = {
            "complete": "re-run curate --run-root (publishes as-is,"
            " nothing recomputes)",
            "partial_extend": "--repair-index (index generation may"
            " hold partial postings)",
            "partial_stage": "--retry-torn (discard staged outputs,"
            " redo the batch)",
        }[state]
        torn = {
            "run_id": nxt,
            "dir": rdir,
            "state": state,
            "intent": intent,
            "recovery": recovery,
        }
    return {"runs": rows, "torn": torn}


def _resolve_torn(
    spark: SparkSession,
    root: str,
    prior: dict | None,
    run_id: int,
    rdir: str,
    retry_torn: bool,
    repair_index: bool,
) -> bool:
    """Handle an existing-but-unpublished run dir per the module
    docstring. Returns True when the torn run was PUBLISHED (caller
    advances to the next run_id), False when the dir was cleared for
    a redo; raises TornRunError when recovery needs an operator
    decision not yet granted."""
    import sys

    state, intent = _torn_state(spark, rdir)
    if state == "complete":
        print(
            f"curate: publishing torn-but-complete prior run r{run_id}"
            f" ({intent}) — every artifact was staged, only the meta"
            " commit was lost; nothing recomputes.",
            file=sys.stderr,
        )
        _commit(spark, root, run_id, rdir, intent)
        return True
    if state == "partial_extend":
        if not repair_index:
            raise TornRunError(
                f"torn curate run at {rdir}: its index extend started"
                " but never finished, so the index's current"
                " generation may hold PARTIAL postings for this batch"
                " (extend is not redo-safe). Re-run with"
                " repair_index=True (--repair-index) to rebuild the"
                " index over the last committed archive — a fresh"
                " generation supersedes the partial one — then the"
                " batch redoes cleanly."
            )
        if prior is None:  # can't happen: incremental implies a prior
            raise TornRunError(
                f"torn incremental run at {rdir} with no committed"
                " prior run — root metadata is inconsistent"
            )
        from ..queries.dedup import build_dedup_index

        print(
            f"curate: repairing index at {index_root(root)} — full"
            " rebuild over the committed STANDING archive (last full"
            f" run's kept set + increments through r{prior['run_id']});"
            " the partial generation is superseded and vacuumable.",
            file=sys.stderr,
        )
        archive = standing_archive(spark, root).select("doc_id", "text")
        build_dedup_index(archive, index_root(root))
        _delete(spark, rdir)
        return False
    if not retry_torn:
        raise TornRunError(
            f"torn curate run at {rdir}: a prior attempt crashed"
            " before its meta commit (the run is unpublished and"
            " invisible to readers). Re-run with retry_torn=True"
            " (--retry-torn) to discard the staged partial outputs"
            " and redo the batch."
        )
    print(
        f"curate: clearing torn prior attempt at {rdir} and redoing"
        " the batch.",
        file=sys.stderr,
    )
    _delete(spark, rdir)
    return False


def curate_run_root(
    spark: SparkSession,
    root: str,
    docs: DataFrame,
    cfg,
    benchmark: DataFrame | None = None,
    full: bool = False,
    retry_torn: bool = False,
    repair_index: bool = False,
    cleanup: list[DataFrame] | None = None,
) -> dict:
    """One crash-safe curate run against ``root``: full curation on a
    fresh root (or with ``full=True`` — the periodic re-freeze, which
    also REBUILDS the index), else the daily incremental batch against
    the CUMULATIVE standing archive (:func:`standing_archive`) and the
    standing index. All
    outputs stage under a versioned run dir and publish at one meta
    append; see the module docstring for the crash matrix. Returns
    ``{"run_id", "dir", "mode"}`` of the PUBLISHED run."""
    from ..queries.dedup import build_dedup_index, extend_dedup_index
    from .training_data import TrainingDataCurator

    rows = run_rows(spark, root)
    prior = rows[-1] if rows else None
    nxt = 1 if prior is None else int(prior["run_id"]) + 1
    rdir = run_dir(root, nxt)
    if _exists(spark, rdir):
        if _resolve_torn(
            spark, root, prior, nxt, rdir, retry_torn, repair_index
        ):
            rows = run_rows(spark, root)  # the publish just appended
            prior = rows[-1]
            nxt += 1
            rdir = run_dir(root, nxt)

    mode = "full" if (prior is None or full) else "incremental"
    # EVERY usage refusal must precede the intent write — staging
    # anything on a flag mistake turns it into a torn-run recovery
    # intervention (r15 review). That includes MODE-INDEPENDENT config
    # contradictions the curator itself would reject mid-pipeline
    # (second review pass: the full-run drop-vs-scrub exclusivity
    # raised AFTER the intent write, re-opening the exact hole).
    if (
        cfg.max_repeated_spans is not None
        and cfg.scrub_repeated_spans
    ):
        raise RunUsageError(
            "max_repeated_spans (drop policy) and scrub_repeated_spans"
            " (transform policy) are mutually exclusive — pick one"
        )
    if mode == "incremental":
        if benchmark is not None:
            raise RunUsageError(
                "--benchmark decontamination is a full-run stage; pass"
                " --full to re-freeze the corpus with it"
            )
        if (
            cfg.max_repeated_spans is not None
            or cfg.scrub_repeated_spans
            or cfg.min_rarity is not None
            or cfg.max_rarity is not None
        ):
            raise RunUsageError(
                "span/rarity policies are full-corpus-statistics"
                " stages; pass --full to apply them on a re-freeze"
            )
    spark.createDataFrame([(mode,)], _INTENT_SCHEMA).write.mode(
        "overwrite"
    ).parquet(f"{rdir}/intent")

    curator = TrainingDataCurator(cfg)
    if mode == "incremental":
        archive = _standing_from_rows(spark, rows)
        kept, dec = curator.run_incremental(
            docs, archive, index_root(root), cleanup=cleanup
        )
    else:
        kept, dec = curator.run(docs, benchmark, cleanup=cleanup)
    _write_stage(kept, f"{rdir}/kept")
    _write_stage(dec, f"{rdir}/decisions")
    # index maintenance consumes the WRITTEN kept set (same rows;
    # decouples the artifact step from the run's cached lineage)
    kept_stored = spark.read.parquet(f"{rdir}/kept").select(
        "doc_id", "text"
    )
    if mode == "full":
        # generation-committed and redo-safe on its own; no markers
        # needed — a torn build is invisible behind gen_meta
        build_dedup_index(kept_stored, index_root(root))
        _mark(spark, f"{rdir}/index_done")
    else:
        # bracket the ONE non-idempotent step so a torn retry knows
        # whether the index may hold this batch's partial postings
        _mark(spark, f"{rdir}/index_started")
        extend_dedup_index(kept_stored, index_root(root))
        _mark(spark, f"{rdir}/index_done")
    _commit(spark, root, nxt, rdir, mode)
    return {"run_id": nxt, "dir": rdir, "mode": mode}
