"""G5/S7 — bounded batch poll: collect up to batchSize earliest messages
and return the reference's JSON batch envelope.

Reference parity (src/route/handlers.go:151-185 + sse-broker.go:34-61):
- always earliest position (sse-broker.go:36)
- batchSize default 10 (handlers.go:163)
- returns {"limit": N, "size": n, "messages": [...]}
  (PulsarMessages, src/model/message.go:21-52); empty -> 204 ≙ None here.
- **ack-on-delivery**: the reference acks ONLY the messages it actually
  returned (sse-broker.go:48-57, ``consumer.Ack(msg)`` per received
  message inside the size loop), so a durable subscription's NEXT poll
  resumes at the first un-delivered message — overflow beyond batchSize
  stays in the backlog.

Spark shape: Trigger.AvailableNow bounded read. The durable-subscription
cursor is ROW-granular, not stream-checkpoint-granular: a Spark stream
checkpoint commits whole source offsets (every file AvailableNow read),
which would silently ack the undelivered overflow. Instead each resumable
poll re-reads the available backlog through a throwaway stream checkpoint,
filters ``(event_time, message_id) > cursor`` (a plain column predicate,
so parquet row-group min/max pruning skips already-delivered history),
and atomically persists the last DELIVERED row as the new cursor — the
exact analogue of per-message ack.

EVENT-TIME REGRESSIONS (ADVICE r07): the (event_time, message_id) order
key is only monotone for a live topic whose producers stamp arrival
wall-clock in one process. A message that lands LATER with an event_time
at or before the cursor (clock step-back, a second producer process, a
backfill writer) must not be classified as already-consumed. The cursor
therefore also records the FILE SET visible at each poll: a file that
appears after a poll whose parquet-footer min(event_time) does not beat
the cursor is a regression file, and its rows are delivered through an
id-set dedup boundary (delivered ids per regression file, bounded by
that file's row count) instead of the order-key predicate — the
late-arriving backlog drains in order, nothing redelivers, and the file
retires from the cursor once all its rows at or before the high-water
mark are delivered. Matches the reference's per-message ``consumer.Ack``
(sse-broker.go:48-57), which never relies on a time order at all.

COMPACTION (VERDICT r08 item 1): the cursor's file-set machinery assumes
files are immutable once written; without extra bookkeeping a compaction
that rewrites delivered rows into a new file whose footer min is at or
below the high-water mark would classify it as a regression file and
mass-redeliver history. The contract is the provenance manifest in
model/compaction.py: ``TopicDirStore.compact`` records output->sources
before the output becomes visible, and this poll (a) excludes outputs
whose sources are still on disk (unfinished compaction — the sources
stay authoritative), and (b) ADOPTS a completed output whose
constituents were all witnessed by this cursor, with delivered-id sets
of still-draining constituents migrating onto the output. Exactly-once
holds when compact() runs with a watermark at or below every
subscription's ``poll_low_water_mark``; a violated watermark degrades
to at-least-once (documented in the adoption branch), never loss.

Cursor size: ``seen_files`` is rewritten as the CURRENT directory
listing each poll (files deleted by topic retention drop out), so the
cursor is bounded by the live file count — the same O(#files) the file
listing itself costs — and each new file pays exactly one footer read
over its lifetime. ``regress`` holds ids only for still-draining
regression files, bounded by those files' row counts. message_id values
are assumed unique per (event_time, message_id) pair (the store mints
``{us}-{seq}``): a byte-identical duplicate of a delivered pair is
indistinguishable from its original and collapses with it.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model.compaction import (
    constituents_witnessed,
    incomplete_outputs,
    naive_utc_us,
    read_manifest,
    witnessed_incomplete_sources,
)
from ..model.message import MESSAGE_SCHEMA

_CURSOR = "CURSOR"


def _read_cursor(checkpoint_dir: str) -> dict | None:
    """Cursor state: high-water (event_time_us, message_id) + the file
    set visible at the last poll + per-regression-file delivered ids.
    ``seen_files``/``regress`` default for cursors written before the
    regression fix (the upgrade poll then treats all current files as
    seen — exactly the old semantics for pre-existing history)."""
    p = os.path.join(checkpoint_dir, _CURSOR)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        d = json.load(f)
    return {
        "event_time_us": int(d["event_time_us"]),
        "message_id": str(d["message_id"]),
        "seen_files": d.get("seen_files"),
        "regress": {k: list(v) for k, v in d.get("regress", {}).items()},
    }


def _write_cursor(checkpoint_dir: str, state: dict) -> None:
    # tmp + os.replace: a crash mid-write leaves the previous cursor
    # intact -> the batch redelivers (at-least-once, same as the
    # reference's unacked-redelivery behavior).
    tmp = os.path.join(checkpoint_dir, _CURSOR + ".tmp")
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, os.path.join(checkpoint_dir, _CURSOR))


def _footer_min_us(path: str) -> int | None:
    """min(event_time) in unix-micros from the parquet footer's row-group
    statistics — O(metadata), no row reads. None when any row group lacks
    stats (caller must treat the file conservatively)."""
    md = pq.ParquetFile(path).metadata
    idx = md.schema.to_arrow_schema().get_field_index("event_time")
    mins = []
    for rg in range(md.num_row_groups):
        stats = md.row_group(rg).column(idx).statistics
        if stats is None or not stats.has_min_max:
            return None
        mins.append(stats.min)
    if not mins:
        return None
    # naive-UTC stats -> micros, TZ-independent (ADVICE r09): a bare
    # .timestamp() reads the naive datetime in host LOCAL time, while
    # the cursor's event_time_us comes from Spark unix_micros under the
    # pinned-UTC session — the two must share one epoch
    return naive_utc_us(min(mins))


def _file_rows_le(path: str, hwm_us: int, hwm_id: str) -> int:
    """Rows in one (regression) file at or before the high-water mark —
    a two-column pyarrow read, bounded by that file's size."""
    t = pq.read_table(path, columns=["event_time", "message_id"])
    n = 0
    for et, mid in zip(t.column("event_time").to_pylist(),
                       t.column("message_id").to_pylist()):
        us = naive_utc_us(et)
        if (us, mid) <= (hwm_us, hwm_id):
            n += 1
    return n


def bounded_poll(
    spark: SparkSession,
    source_dir: str,
    batch_size: int = 10,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = None,
) -> dict | None:
    """One bounded poll: read what is available now, keep the earliest
    ``batch_size`` messages by (event_time, message_id), return the JSON
    envelope dict (None ≙ reference's 204 No Content).

    A non-None ``checkpoint_dir`` makes successive polls resume — the
    subscription-name semantics of G6 (resumable vs NonResumable*): only
    the DELIVERED rows advance the cursor, so overflow beyond
    ``batch_size`` is returned by the next poll, exactly like the
    reference's per-message ack (sse-broker.go:48-57). Messages appended
    later with an event_time at or before the cursor (clock step-back,
    cross-process/backfill producers) are still delivered: their files
    are detected as regressions via the footer min(event_time) of files
    not seen by a previous poll and drained through a per-file
    delivered-id set (module docstring).

    With ``checkpoint_dir=None`` the poll is stateless always-earliest —
    the reference's auto-named NonResumable subscription, which
    unsubscribes after each poll.
    """
    cursor = _read_cursor(checkpoint_dir) if checkpoint_dir else None

    # list BEFORE the stream snapshot: a file that lands between this
    # listing and the read may deliver rows this poll, but it is NOT
    # recorded as seen, so the next poll re-examines it (its delivered
    # rows are tracked in the regression id-set below — no redelivery,
    # no loss). The compaction manifest is read AFTER the listing: a
    # compaction finishing in between leaves either sources-without-entry
    # (their below-cursor rows deliver nothing anyway) or entry-without-
    # output-listed (irrelevant until the output is listed next poll) —
    # never an unexplained output.
    listing: list[str] = sorted(
        f for f in os.listdir(source_dir) if f.endswith(".parquet")
    ) if os.path.isdir(source_dir) else []
    manifest = read_manifest(source_dir) if os.path.isdir(source_dir) else {}
    # an unfinished compaction's output shares every row with its still-
    # present sources (crash windows 2/3, model/compaction.py): exclude
    # it from this poll entirely — the sources stay authoritative and
    # the output is NOT recorded as seen, so the poll after the deletes
    # finish runs the adoption check normally.
    incomplete = incomplete_outputs(manifest, set(listing))
    visible = [f for f in listing if f not in incomplete]

    regress: dict[str, list[str]] = {}
    hwm: tuple[int, str] | None = None
    retained: set[str] = set()
    if cursor is not None:
        hwm = (cursor["event_time_us"], cursor["message_id"])
        regress = cursor["regress"]
        # pre-fix cursor: no file set recorded — treat everything
        # currently visible as seen (the old semantics) and track from now
        seen = set(cursor["seen_files"]) if cursor["seen_files"] is not None else set(visible)
        # ADVICE r10 (same hazard the SSE scan had): an INCOMPLETE
        # output's already-deleted witnessed sources are not in the
        # listing; rewriting seen_files to the listing alone forgets
        # them, and the post-repair adoption check would then see
        # unwitnessed constituents and take the regression path — mass
        # redelivery where adoption was owed. Retain them in the cursor.
        retained = witnessed_incomplete_sources(
            manifest, incomplete, seen.__contains__)
        for f in visible:
            if f in seen:
                continue
            if f in manifest:
                # compaction output: if every constituent source was
                # already witnessed (seen, or draining with its delivered
                # ids migrated here), the cursor invariant — everything
                # at/below the mark in witnessed files is delivered —
                # transfers to the merged file, so adopt it WITHOUT the
                # regression redelivery the footer-min check below would
                # trigger. Draining constituents keep draining through
                # the migrated id boundary (with a non-compliant
                # compaction watermark this corner redelivers at most
                # the co-compacted already-delivered rows: at-least-once,
                # never loss). Unknown constituents (a file compacted
                # before this subscription ever listed it) fall through
                # to the conservative regression path, still carrying
                # the migrated ids.
                #
                # A file already in `regress` STILL runs adoption
                # (ADVICE r09): a compaction finishing between poll N's
                # os.listdir and the Spark stream's own listing delivers
                # rows from the unlisted OUTPUT, which poll N records in
                # regress under the output's name; skipping it here
                # would leave the output un-adopted forever and the next
                # poll would redeliver its whole history through the
                # empty id-boundary. Its own delivered ids (`prior`)
                # fold into the migration — and because those rows were
                # in poll N's batch, the high-water mark already
                # advanced past them, so clean adoption may drop them.
                prior = regress.pop(f, [])
                ok, ids, drained = constituents_witnessed(
                    f, manifest, seen, regress)
                for s in drained:
                    del regress[s]  # source deleted on disk; ids migrate
                if ok and not ids and not drained:
                    # `not drained` is load-bearing: a draining
                    # constituent with an EMPTY delivered-id list (a
                    # detected backfill nothing was delivered from yet,
                    # compacted under a non-compliant watermark) still
                    # holds undelivered rows at/below the mark —
                    # adopting as seen would LOSE them; the regress
                    # branch below keeps them deliverable instead.
                    seen.add(f)
                    continue
                if ok:
                    regress[f] = prior + ids
                    continue
                lo = _footer_min_us(os.path.join(source_dir, f))
                if prior or ids or lo is None or lo <= hwm[0]:
                    regress[f] = prior + ids
                continue
            if f in regress:
                continue
            lo = _footer_min_us(os.path.join(source_dir, f))
            if lo is None or lo <= hwm[0]:
                # late-arriving history (or statless footer, handled
                # conservatively): deliver through the id-set boundary
                regress[f] = []

    sink_rows: list[dict] = []

    def take_batch(df: DataFrame, _epoch: int) -> None:
        rows = (
            # input_file_name() is only defined at scan time — project it
            # BEFORE the sort, or the post-shuffle evaluation returns ''
            df.select(
                "message_id",
                "topic",
                "key",
                F.decode("payload", "UTF-8").alias("payload"),
                F.date_format("event_time", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").alias("event_time"),
                F.unix_micros("event_time").alias("_us"),
                F.element_at(F.split(F.input_file_name(), "/"), -1).alias("_file"),
            )
            .orderBy("_us", "message_id")
            .limit(batch_size)
            .collect()
        )
        sink_rows.extend(r.asDict() for r in rows)

    reader = spark.readStream.schema(MESSAGE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # a compliant compact() only deletes files every cursor has fully
    # consumed, so a source vanishing between the stream's own listing
    # and its read carries no undelivered rows — skip, don't abort
    reader = reader.option("ignoreMissingFiles", "true")
    stream = reader.parquet(source_dir)
    if incomplete:
        # crash windows 2/3: rows in these outputs still live in their
        # sources; reading both would duplicate (applies to stateless
        # polls too, hence outside the cursor branch)
        stream = stream.where(
            ~F.element_at(F.split(F.input_file_name(), "/"), -1)
            .isin(list(incomplete))
        )
    if hwm is not None:
        c_us, c_id = hwm
        c_ts = F.timestamp_micros(F.lit(c_us))
        # plain column comparison -> pushed to the parquet scan, so row
        # groups wholly before the cursor are skipped via footer min/max
        cond = (
            (F.col("event_time") > c_ts)
            | ((F.col("event_time") == c_ts) & (F.col("message_id") > F.lit(c_id)))
        )
        if regress:
            # regression files bypass the order-key predicate; their
            # already-delivered rows are excluded by id (globally unique)
            in_regress = F.element_at(
                F.split(F.input_file_name(), "/"), -1
            ).isin(list(regress))
            delivered = [i for ids in regress.values() for i in ids]
            if delivered:
                in_regress = in_regress & ~F.col("message_id").isin(delivered)
            cond = cond | in_regress
        stream = stream.where(cond)

    # The stream checkpoint is ALWAYS throwaway: it only fences this one
    # AvailableNow run. Durability lives in the row-granular CURSOR file —
    # reusing the stream checkpoint as the poll cursor would commit (ack)
    # the entire backlog while delivering only batch_size rows.
    stream_ckpt = tempfile.mkdtemp(prefix="pbs-poll-stream-")
    try:
        q = (
            stream.writeStream.foreachBatch(take_batch)
            .option("checkpointLocation", stream_ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(stream_ckpt, ignore_errors=True)

    # AvailableNow may split the backlog into several micro-batches (e.g.
    # maxFilesPerTrigger); each batch contributed its own earliest rows, so
    # re-sort the union before truncating to the globally earliest batch.
    sink_rows.sort(key=lambda r: (r["_us"], r["message_id"]))
    batch = sink_rows[:batch_size]
    if checkpoint_dir and (batch or cursor is not None):
        visible_set = set(visible)
        for r in batch:
            f = r["_file"]
            if f in regress or f not in visible_set:
                # regression row, or a row from a file that raced the
                # listing: both drain through the id-set boundary
                regress.setdefault(f, []).append(r["message_id"])
        # the high-water mark is MONOTONE: the batch is the globally
        # earliest undelivered rows, so everything at or below the new
        # mark in non-regression seen files is delivered by induction;
        # regression rows below the old mark must not drag it backwards
        new_hwm = hwm
        if batch:
            last = (batch[-1]["_us"], batch[-1]["message_id"])
            new_hwm = max(hwm, last) if hwm is not None else last
        # retire regression files whose rows at/below the mark are all
        # delivered — from then on the order-key predicate covers them.
        # ONLY files entering the persisted seen set may retire: a file
        # that raced the listing (delivered rows but absent from
        # ``visible``) must keep its id set until a poll actually lists
        # it, or the next poll would flag it as a fresh regression with
        # no delivered ids and REDELIVER everything at/below the mark.
        for f in list(regress):
            path = os.path.join(source_dir, f)
            if not os.path.exists(path):
                # gone from disk AND from the listing: deleted by
                # retention (its undelivered rows are gone by explicit
                # policy) or compacted away before this poll adopted it
                # (its ids migrated above). A file delivered under the
                # listing race still exists — keep it until a listing
                # actually sees it.
                if f not in visible_set:
                    del regress[f]
                continue
            try:
                if f in visible_set and len(
                    set(regress[f])
                ) >= _file_rows_le(path, new_hwm[0], new_hwm[1]):
                    del regress[f]
            except FileNotFoundError:
                # a concurrent compact() deleted the file between the
                # exists check and the read: keep the entry this poll —
                # the next poll resolves it through the manifest
                # adoption path (or drops it if retention took it)
                pass
        os.makedirs(checkpoint_dir, exist_ok=True)
        _write_cursor(checkpoint_dir, {
            "event_time_us": new_hwm[0], "message_id": new_hwm[1],
            "seen_files": sorted(set(visible) | retained), "regress": regress,
        })
    if not batch:
        return None
    for r in batch:
        del r["_us"]
        del r["_file"]
    return {"limit": batch_size, "size": len(batch), "messages": batch}


def poll_low_water_mark(checkpoint_dir: str, source_dir: str) -> int | None:
    """The SAFE COMPACTION WATERMARK for one resumable subscription, in
    unix-micros: ``TopicDirStore.compact(topic, watermark_us=...)`` may
    merge any file whose footer max(event_time) is strictly below it
    without redelivering or losing a row for this cursor. An operator
    compacting a topic with several live subscriptions passes the
    MINIMUM across their checkpoints.

    With no regression files in the cursor this is the high-water event
    time (rows AT that microsecond may still be undelivered via the
    message_id tie-break, which is why both sides are strict). Any
    UNRETIRED regression file pulls it back to that file's footer
    min(event_time) — below the file's DELIVERED rows too, not just its
    undelivered ones, deliberately: the adoption path tracks a merged
    regression constituent through its migrated delivered-id set, which
    cannot name the already-delivered rows of the OTHER (seen) files in
    the same merge, so compacting a seen file together with a
    still-draining one would redeliver the seen rows (round-9
    self-probe: a file delivered under the listing race stays in the
    regress map until the NEXT poll lists and retires it — compacting
    in that one-poll window hit the corner despite every row being
    delivered). Holding the watermark below unretired regression files
    defers that compaction by one poll and keeps the exactly-once
    guarantee unconditional under compliant watermarks. Metadata-only:
    one footer read per still-draining file.

    None = no cursor yet (nothing may be compacted for this
    subscription: it still expects the full history).
    """
    cursor = _read_cursor(checkpoint_dir)
    if cursor is None:
        return None
    lw = cursor["event_time_us"]
    for f in cursor["regress"]:
        path = os.path.join(source_dir, f)
        try:
            lo = _footer_min_us(path)
        except FileNotFoundError:
            continue  # deleted (retention / concurrent compact adoption)
        if lo is None:
            # stats-less footer: its bounds are unknowable — hold the
            # watermark at zero (nothing below it may compact) rather
            # than guess
            return 0
        lw = min(lw, lo)
    return lw


def poll_json(spark: SparkSession, source_dir: str, batch_size: int = 10) -> str | None:
    out = bounded_poll(spark, source_dir, batch_size)
    return None if out is None else json.dumps(out)
