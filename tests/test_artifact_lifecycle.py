"""VERDICT r11 item 5 — artifact lifecycle under compaction/retention.

The ingest artifacts are deterministic functions of a corpus; on a
LIVING topic the corpus changes under append (content grows — artifact
silently diverges) and under compact() (listing changes, content does
not — artifact still exact). model/artifacts.py classifies via the
compaction manifest's provenance chain; these goldens pin each verdict
transition AND the content claim behind it (a ``compacted`` artifact
really does equal a fresh re-encode of the rewritten topic).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pulsar_beam_spark.model.artifacts import (
    artifact_staleness,
    ensure_artifact,
    record_provenance,
)
from pulsar_beam_spark.server.store import TopicDirStore

TOPIC = "persistent://tenant/ns/artifact-topic"


def _encode(spark, topic_dir: str):
    """The stand-in index build: a deterministic per-message artifact
    row (message_id, payload length). The lifecycle contract does not
    care WHICH index; content-sensitivity is all the golden needs."""
    return (
        spark.read.parquet(os.path.join(topic_dir, "*.parquet"))
        .select("message_id", F.length("payload").cast("long").alias("n_bytes"))
    )


def _build(spark, topic_dir: str, artifact_dir: str) -> None:
    _encode(spark, topic_dir).write.mode("overwrite").parquet(
        os.path.join(artifact_dir, "rows"))


def _artifact_rows(spark, artifact_dir: str):
    return sorted(tuple(r) for r in spark.read.parquet(
        os.path.join(artifact_dir, "rows")).collect())


def _reencode_rows(spark, topic_dir: str):
    return sorted(tuple(r) for r in _encode(spark, topic_dir).collect())


def test_compact_then_query_lifecycle(spark, tmp_path):
    store = TopicDirStore(str(tmp_path / "store"), flush_interval_s=None)
    for i in range(6):
        store.append(TOPIC, f"payload-{i}-{'x' * i}".encode())
    d = store.topic_dir(TOPIC)
    art = str(tmp_path / "art")

    # build + stamp: fresh, and artifact == re-encode
    _build(spark, d, art)
    record_provenance(art, d)
    assert artifact_staleness(d, art) == "fresh"
    assert _artifact_rows(spark, art) == _reencode_rows(spark, d)

    # compact everything: listing changed, content did not -> the
    # artifact is still exact and NO rebuild is owed
    r = store.compact(TOPIC, watermark_us=2**62, min_files=2)
    assert r["merged"] == 6
    assert artifact_staleness(d, art) == "compacted"
    assert _artifact_rows(spark, art) == _reencode_rows(spark, d), (
        "the compacted verdict's content claim must actually hold")

    # append: the artifact now silently MISSES rows -> stale, and the
    # content divergence is real
    store.append(TOPIC, b"late-arrival")
    assert artifact_staleness(d, art) == "stale"
    assert _artifact_rows(spark, art) != _reencode_rows(spark, d)

    # maintenance hook: rebuild + restamp; verdict reports the PRE state
    verdict = ensure_artifact(
        d, art, lambda a: _build(spark, d, a))
    assert verdict == "stale"
    assert artifact_staleness(d, art) == "fresh"
    assert _artifact_rows(spark, art) == _reencode_rows(spark, d)

    # recompaction CHAIN: the new output's sources include the previous
    # output; transitive expansion through the manifest must resolve to
    # recorded names -> still just "compacted"
    store.append(TOPIC, b"tail-1")
    store.append(TOPIC, b"tail-2")
    ensure_artifact(d, art, lambda a: _build(spark, d, a))
    r = store.compact(TOPIC, watermark_us=2**62, min_files=2)
    assert r["merged"] >= 2
    assert artifact_staleness(d, art) == "compacted"
    assert _artifact_rows(spark, art) == _reencode_rows(spark, d)


def test_stale_verdicts_for_unexplained_listings(spark, tmp_path):
    store = TopicDirStore(str(tmp_path / "store"), flush_interval_s=None)
    for i in range(3):
        store.append(TOPIC, f"m{i}".encode())
    d = store.topic_dir(TOPIC)
    art = str(tmp_path / "art")
    _build(spark, d, art)
    record_provenance(art, d, recipe="v1")

    # recipe change must miss, same as the fixture cache's tag contract
    assert artifact_staleness(d, art, recipe="v1") == "fresh"
    assert artifact_staleness(d, art, recipe="v2") == "stale"

    # an unstamped artifact is stale by construction (crash between
    # content write and stamp)
    os.remove(os.path.join(art, "_artifact_provenance.json"))
    assert artifact_staleness(d, art, recipe="v1") == "stale"
    record_provenance(art, d, recipe="v1")

    # retention/GC: a recorded file vanishing WITHOUT a manifest chain
    # consuming it means recorded data is gone -> stale, never
    # misclassified as compaction
    victim = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))[0]
    os.unlink(os.path.join(d, victim))
    assert artifact_staleness(d, art, recipe="v1") == "stale"


def _sentinel(artifact_dir: str, sub: str) -> str:
    """A marker file INSIDE a Spark-written artifact subdir: any rebuild
    overwrites the subdir and deletes it, so its survival proves the
    compacted verdict really served the old artifact as-is."""
    p = os.path.join(artifact_dir, sub, "_rebuild_sentinel")
    open(p, "w").close()
    return p


def test_topic_bm25_lifecycle_compact_serves_append_rebuilds(spark, tmp_path):
    """VERDICT r12 task 3 — the lifecycle contract on the REAL query
    path: BM25 artifacts built from a living topic via
    queries.ensure_topic_bm25_index (ensure_artifact-routed). compact()
    must NOT rebuild and the indexed top-k must stay exactly equal
    against the compacted topic; append must force a rebuild that picks
    up the new rows."""
    import json  # noqa: F401  (symmetry with the vector golden)

    from pulsar_beam_spark.operators.text import bm25_topk, bm25_topk_indexed
    from pulsar_beam_spark.queries import ensure_topic_bm25_index, topic_docs_frame

    store = TopicDirStore(str(tmp_path / "store"), flush_interval_s=None)
    corpus = [
        "spark shuffles data across executors",
        "parquet scans prune row groups",
        "data data everywhere and shuffles too",
        "the broker compacts delivered files",
        "executors spill when partitions skew",
        "row groups carry min max stats",
    ]
    for t in corpus:
        store.append(TOPIC, t.encode())
    d = store.topic_dir(TOPIC)
    art = str(tmp_path / "bm25-art")
    terms = ["data", "shuffles"]

    def indexed_topk():
        return [tuple(r) for r in bm25_topk_indexed(
            spark.read.parquet(os.path.join(art, "postings")),
            spark.read.parquet(os.path.join(art, "dictionary")),
            spark.read.parquet(os.path.join(art, "stats")),
            terms, k=10).collect()]

    def recompute_topk():
        return [tuple(r) for r in bm25_topk(
            topic_docs_frame(spark, d), terms, k=10).collect()]

    # absent artifact -> stale -> built; index path == inline recompute
    assert ensure_topic_bm25_index(spark, d, art)[1] == "stale"
    q1 = indexed_topk()
    assert q1 == recompute_topk() and len(q1) > 0

    # compact: verdict 'compacted', artifact served AS-IS (sentinel
    # survives), and the indexed query is hash-equal against the
    # compacted topic
    sent = _sentinel(art, "postings")
    r = store.compact(TOPIC, watermark_us=2**62, min_files=2)
    assert r["merged"] == len(corpus)
    assert ensure_topic_bm25_index(spark, d, art)[1] == "compacted"
    assert os.path.exists(sent), "compacted verdict must not rebuild"
    assert indexed_topk() == q1
    assert recompute_topk() == q1, (
        "the content claim behind 'compacted': exact-once topic read "
        "over the compacted listing still matches the old artifact")

    # append: stale -> rebuilt (sentinel gone), new row scored
    store.append(TOPIC, b"late data about data and shuffles")
    assert ensure_topic_bm25_index(spark, d, art)[1] == "stale"
    assert not os.path.exists(sent), "append must force a rebuild"
    q3 = indexed_topk()
    assert q3 == recompute_topk()
    assert q3 != q1, "the appended doc must change the ranking"
    # idempotent second ensure: fresh, no rebuild
    sent2 = _sentinel(art, "postings")
    assert ensure_topic_bm25_index(spark, d, art)[1] == "fresh"
    assert os.path.exists(sent2)


def _emb_payload(i: int, dim: int = 8) -> bytes:
    import json

    v = [(((i + 1) * (j + 3)) % 13 - 6) / 6.5 for j in range(dim)]
    return json.dumps({"vec_id": i, "embedding": v}).encode()


_IVFPQ_KW = dict(n_cells=4, m=2, ksub=4, iters=2, sample_cap=64,
                 dim=8, scale=100_000, offset=1.0)


def test_topic_ivfpq_lifecycle_compact_serves_append_rebuilds(spark, tmp_path):
    """The same lifecycle golden for the composite vector index: IVFPQ
    artifacts (codes/centroids/books) built from JSON embedding
    payloads on a living topic, ADC scan served across compact(),
    rebuilt on append — index-path parity checked against an inline
    rebuild at every step."""
    from pulsar_beam_spark.operators.clustering import (
        ivfpq_adc_scan,
        ivfpq_build_artifacts,
        quantized_frame,
    )
    from pulsar_beam_spark.queries import (
        topic_emb_frame,
        ensure_topic_ivfpq_artifacts,
    )

    store = TopicDirStore(str(tmp_path / "store"), flush_interval_s=None)
    for i in range(24):
        store.append(TOPIC, _emb_payload(i))
    d = store.topic_dir(TOPIC)
    art = str(tmp_path / "ivfpq-art")

    def load_trained():
        cents = [[int(x) for x in r["v"]] for r in spark.read.parquet(
            os.path.join(art, "centroids")).orderBy("cell").collect()]
        brows = spark.read.parquet(
            os.path.join(art, "books")).orderBy("mi", "code").collect()
        books: list[list[list[int]]] = []
        for r in brows:
            while len(books) <= r["mi"]:
                books.append([])
            books[r["mi"]].append([int(x) for x in r["v"]])
        return cents, books

    def qv():
        row = quantized_frame(
            topic_emb_frame(spark, d), _IVFPQ_KW["dim"],
            _IVFPQ_KW["scale"], _IVFPQ_KW["offset"]
        ).filter(F.col("_kid") == 0).select("qv").head()
        return [int(x) for x in row["qv"]]

    def indexed_topk():
        cents, books = load_trained()
        return [tuple(r) for r in ivfpq_adc_scan(
            spark.read.parquet(os.path.join(art, "codes")), cents, books,
            qv(), nprobe=2, k=5).collect()]

    def inline_topk():
        codes, cents, books = ivfpq_build_artifacts(
            topic_emb_frame(spark, d), **_IVFPQ_KW)
        return [tuple(r) for r in ivfpq_adc_scan(
            codes, cents, books, qv(), nprobe=2, k=5).collect()]

    assert ensure_topic_ivfpq_artifacts(spark, d, art, **_IVFPQ_KW)[1] == "stale"
    q1 = indexed_topk()
    assert q1 == inline_topk() and len(q1) == 5

    sent = _sentinel(art, "codes")
    r = store.compact(TOPIC, watermark_us=2**62, min_files=2)
    assert r["merged"] == 24
    assert ensure_topic_ivfpq_artifacts(spark, d, art, **_IVFPQ_KW)[1] == "compacted"
    assert os.path.exists(sent), "compacted verdict must not rebuild"
    assert indexed_topk() == q1
    assert inline_topk() == q1

    store.append(TOPIC, _emb_payload(99))
    assert ensure_topic_ivfpq_artifacts(spark, d, art, **_IVFPQ_KW)[1] == "stale"
    assert not os.path.exists(sent), "append must force a rebuild"
    assert indexed_topk() == inline_topk()

    # hyperparameter change misses: a different recipe must classify
    # stale even with an unchanged topic (the fixture tag discipline)
    kw2 = dict(_IVFPQ_KW, n_cells=2)
    assert ensure_topic_ivfpq_artifacts(spark, d, art, **kw2)[1] == "stale"


def test_topic_frames_raise_on_empty_topic(spark, tmp_path):
    """Round-13 self-probe: a never-appended topic has nothing to
    index; the exact-once readers must raise a clear error instead of
    an opaque reader failure inside a rebuild."""
    import pytest

    from pulsar_beam_spark.queries import topic_docs_frame, topic_emb_frame

    d = tmp_path / "empty-topic"
    d.mkdir()
    with pytest.raises(ValueError, match="no parquet to index"):
        topic_docs_frame(spark, str(d))
    with pytest.raises(ValueError, match="no parquet to index"):
        topic_emb_frame(spark, str(d))


def test_topic_pq_and_ivf_lifecycle_verdicts(spark, tmp_path):
    """Verdict cycle (stale -> compacted -> stale) for the remaining
    two lifecycle-routed families, PQ codes and trained IVF cells —
    same machinery, sentinel-checked."""
    from pulsar_beam_spark.queries import (
        ensure_topic_ivf_cells,
        ensure_topic_pq_codes,
    )

    store = TopicDirStore(str(tmp_path / "store"), flush_interval_s=None)
    for i in range(12):
        store.append(TOPIC, _emb_payload(i))
    d = store.topic_dir(TOPIC)

    books = [[[0.0] * 4, [0.5] * 4], [[0.0] * 4, [-0.5] * 4]]
    pq_art = str(tmp_path / "pq-art")
    ivf_art = str(tmp_path / "ivf-art")
    ivf_kw = dict(n_cells=2, iters=1, dim=8, scale=100_000, offset=1.0)

    assert ensure_topic_pq_codes(spark, d, pq_art, books)[1] == "stale"
    assert ensure_topic_ivf_cells(spark, d, ivf_art, **ivf_kw)[1] == "stale"
    s_pq = _sentinel(pq_art, "codes")
    s_ivf = _sentinel(ivf_art, "cells")

    store.compact(TOPIC, watermark_us=2**62, min_files=2)
    assert ensure_topic_pq_codes(spark, d, pq_art, books)[1] == "compacted"
    assert ensure_topic_ivf_cells(spark, d, ivf_art, **ivf_kw)[1] == "compacted"
    assert os.path.exists(s_pq) and os.path.exists(s_ivf)

    store.append(TOPIC, _emb_payload(50))
    assert ensure_topic_pq_codes(spark, d, pq_art, books)[1] == "stale"
    assert ensure_topic_ivf_cells(spark, d, ivf_art, **ivf_kw)[1] == "stale"
    assert not os.path.exists(s_pq) and not os.path.exists(s_ivf)
    # changed codebooks on an unchanged topic -> recipe miss -> stale
    books2 = [[[0.1] * 4, [0.5] * 4], [[0.0] * 4, [-0.5] * 4]]
    assert ensure_topic_pq_codes(spark, d, pq_art, books2)[1] == "stale"


def test_lingering_sources_at_build_time_stay_compacted(tmp_path):
    """ADVICE r12 — the build-time listing may capture a compaction
    output AND its not-yet-deleted sources (stamp taken inside the
    crash window, before the repair pass). When a later repair deletes
    those sources, the content is unchanged — the live output carries
    every recorded row — so the verdict must be ``compacted``, not a
    spurious O(corpus) rebuild. Pure-listing construction: staleness
    reads names/sizes + manifest only."""
    from pulsar_beam_spark.model.compaction import write_manifest

    d = tmp_path / "topic"
    d.mkdir()
    for name in ("s1.parquet", "s2.parquet", "out.parquet"):
        (d / name).write_bytes(b"x" * len(name))
    write_manifest(str(d), {"out.parquet": ["s1.parquet", "s2.parquet"]})
    art = str(tmp_path / "art")
    # stamp taken with output + lingering sources all live
    record_provenance(art, str(d))
    assert artifact_staleness(str(d), art) == "fresh"

    # repair pass deletes the lingering sources: content unchanged
    (d / "s1.parquet").unlink()
    (d / "s2.parquet").unlink()
    assert artifact_staleness(str(d), art) == "compacted"

    # ... and one level deeper: a chain output folds the first output;
    # the stamp recorded the whole chain mid-crash-window
    (d / "s1.parquet").write_bytes(b"x" * len("s1.parquet"))
    (d / "s2.parquet").write_bytes(b"x" * len("s2.parquet"))
    (d / "out2.parquet").write_bytes(b"x" * len("out2.parquet"))
    write_manifest(str(d), {"out.parquet": ["s1.parquet", "s2.parquet"],
                            "out2.parquet": ["out.parquet"]})
    record_provenance(art, str(d))
    (d / "s1.parquet").unlink()
    (d / "s2.parquet").unlink()
    (d / "out.parquet").unlink()
    assert artifact_staleness(str(d), art) == "compacted"

    # genuine retention loss must STILL classify stale: a recorded file
    # consumed by no covered output vanishes
    (d / "orphan.parquet").write_bytes(b"x" * len("orphan.parquet"))
    record_provenance(art, str(d))
    (d / "orphan.parquet").unlink()
    assert artifact_staleness(str(d), art) == "stale"


def test_crash_mid_rebuild_never_leaves_fresh_stamp(spark, tmp_path):
    """Round-12 self-probe find: ensure_artifact rebuilds IN PLACE, so
    a crash inside rebuild() must not leave corrupt content under a
    still-valid stamp (the topic may not change again, and a stamp
    comparison alone would then say 'fresh' over garbage forever). The
    stamp is invalidated before rebuild begins: a crashed rebuild
    classifies stale and re-runs."""
    store = TopicDirStore(str(tmp_path / "store"), flush_interval_s=None)
    store.append(TOPIC, b"one")
    d = store.topic_dir(TOPIC)
    art = str(tmp_path / "art")
    _build(spark, d, art)
    record_provenance(art, d)
    store.append(TOPIC, b"two")  # make it stale so ensure() rebuilds
    assert artifact_staleness(d, art) == "stale"

    class Boom(RuntimeError):
        pass

    def crashing_rebuild(a):
        raise Boom()

    try:
        ensure_artifact(d, art, crashing_rebuild)
    except Boom:
        pass
    # the interrupted rebuild must classify STALE (unstamped), never
    # fall back to the pre-crash stamp
    assert artifact_staleness(d, art) == "stale"
    verdict = ensure_artifact(d, art, lambda a: _build(spark, d, a))
    assert verdict == "stale"
    assert artifact_staleness(d, art) == "fresh"
    assert _artifact_rows(spark, art) == _reencode_rows(spark, d)


def test_topic_quality_tree_lifecycle_compact_serves_append_retrains(
        spark, tmp_path):
    """r14 — the lifecycle contract on the CLASSIFIER artifact (5th
    family): the depth-2 quality tree trained from a living topic via
    queries.ensure_topic_quality_tree. compact() must NOT retrain and
    the artifact-served predictions must stay exactly equal against the
    compacted topic; append must force a retrain whose predictions
    match an inline refit and cover the new rows."""
    from pulsar_beam_spark.operators.tree import (fit_depth2, predict_expr,
                                                  quality_features)
    from pulsar_beam_spark.queries import (_tree_from_node_rows,
                                           ensure_topic_quality_tree,
                                           topic_docs_frame)

    store = TopicDirStore(str(tmp_path / "store"), flush_interval_s=None)
    good = ("the quick brown fox jumps over the lazy dog and runs on "
            "through the field with a pack of hounds in pursuit for "
            "quite a while longer than expected today")
    corpus = [good, "junk!!! ### $$$ %%%", "tiny", good + " again and again",
              "1234 5678 9012 3456 7890", good + " once more for luck",
              "short one", good.replace("fox", "cat"), "!!!"]
    for t in corpus:
        store.append(TOPIC, t.encode())
    d = store.topic_dir(TOPIC)
    art = str(tmp_path / "qtree-art")

    def artifact_preds():
        tree = _tree_from_node_rows(
            spark.read.parquet(os.path.join(art, "nodes")).collect())
        fx = quality_features(topic_docs_frame(spark, d))
        return sorted(
            (r["doc_id"], r["pred"]) for r in
            fx.withColumn("pred", predict_expr(tree))
            .select("doc_id", "pred").collect())

    def inline_preds():
        from pulsar_beam_spark.operators.sampling import stable_bucket
        from pulsar_beam_spark.operators.tree import leaf_label

        fx = quality_features(topic_docs_frame(spark, d))
        # mirror ensure_topic_quality_tree's degenerate-slice fallback:
        # message ids are wall-clock-stamped, so the md5 bucket can
        # intermittently catch <2 feature-distinct rows OR a
        # single-class slice on this tiny topic — both sides then train
        # on the whole topic
        tree = fit_depth2(fx.filter(stable_bucket(F.col("doc_id")) < 25))
        if tree is None or len({leaf_label(*v)
                                for v in tree.leaves.values()}) < 2:
            tree = fit_depth2(fx) or tree
        return sorted(
            (r["doc_id"], r["pred"]) for r in
            fx.withColumn("pred", predict_expr(tree))
            .select("doc_id", "pred").collect())

    # absent -> stale -> trained; artifact-served == inline refit
    assert ensure_topic_quality_tree(spark, d, art)[1] == "stale"
    q1 = artifact_preds()
    assert q1 == inline_preds() and len(q1) == len(corpus)
    assert {p for _, p in q1} == {0, 1}, "the tree must actually separate"

    # compact: 'compacted', served as-is (sentinel survives), equal
    sent = _sentinel(art, "nodes")
    r = store.compact(TOPIC, watermark_us=2**62, min_files=2)
    assert r["merged"] == len(corpus)
    assert ensure_topic_quality_tree(spark, d, art)[1] == "compacted"
    assert os.path.exists(sent), "compacted verdict must not retrain"
    assert artifact_preds() == q1
    assert inline_preds() == q1

    # append: stale -> retrained (sentinel gone), new rows covered
    store.append(TOPIC, (good + " with fresh late arriving text").encode())
    store.append(TOPIC, b"@@@ ###")
    assert ensure_topic_quality_tree(spark, d, art)[1] == "stale"
    assert not os.path.exists(sent), "append must force a retrain"
    q3 = artifact_preds()
    assert q3 == inline_preds()
    assert len(q3) == len(corpus) + 2
    # idempotent second ensure: fresh, no rebuild
    sent2 = _sentinel(art, "nodes")
    assert ensure_topic_quality_tree(spark, d, art)[1] == "fresh"
    assert os.path.exists(sent2)


def test_topic_quality_tree_degenerate_slice_falls_back_to_full_topic(
        spark, tmp_path, monkeypatch):
    """r14: the md5 training slice is wall-clock-dependent (message ids
    embed the append timestamp), so on a tiny topic it can catch <2
    feature-distinct rows and the artifact would persist ROOTLESS —
    intermittently, since the slice changes run to run. The builder
    must fall back to training on the whole topic. Forced
    deterministically here: stable_bucket is patched to put NOTHING in
    the slice; the artifact must still carry a root and its
    predictions must equal a full-topic refit."""
    from pulsar_beam_spark.operators import sampling
    from pulsar_beam_spark.operators.tree import (fit_depth2, predict_expr,
                                                  quality_features)
    from pulsar_beam_spark.queries import (_tree_from_node_rows,
                                           ensure_topic_quality_tree,
                                           topic_docs_frame)

    store = TopicDirStore(str(tmp_path / "store"), flush_interval_s=None)
    good = ("the quick brown fox jumps over the lazy dog and keeps "
            "going for quite a while longer than expected")
    for t in (good, "junk!!! ###", "tiny", good + " again", "12 34 56"):
        store.append(TOPIC, t.encode())
    d = store.topic_dir(TOPIC)
    art = str(tmp_path / "qtree-art")

    monkeypatch.setattr(sampling, "stable_bucket",
                        lambda col, n_buckets=100: F.lit(99))
    assert ensure_topic_quality_tree(spark, d, art)[1] == "stale"
    tree = _tree_from_node_rows(
        spark.read.parquet(os.path.join(art, "nodes")).collect())
    assert tree is not None, "fallback must have trained on the full topic"
    fx = quality_features(topic_docs_frame(spark, d))
    want = fit_depth2(fx)
    got = sorted((r["doc_id"], r["pred"]) for r in
                 fx.withColumn("pred", predict_expr(tree))
                 .select("doc_id", "pred").collect())
    exp = sorted((r["doc_id"], r["pred"]) for r in
                 fx.withColumn("pred", predict_expr(want))
                 .select("doc_id", "pred").collect())
    assert got == exp


def test_topic_quality_tree_single_class_slice_falls_back_to_full_topic(
        spark, tmp_path, monkeypatch):
    """r14 (resume): the OTHER degenerate slice mode — >= 2
    feature-distinct rows but a SINGLE label class, which trains a
    structurally valid tree whose every leaf votes the same way (found
    as the intermittent 'tree must actually separate' failure in the
    lifecycle golden; which rows land in the md5 slice is wall-clock-
    dependent). Forced deterministically: stable_bucket is patched so
    the slice holds exactly the junk documents; the builder must fall
    back to the whole topic and the served tree must separate."""
    from pulsar_beam_spark.operators import sampling
    from pulsar_beam_spark.operators.tree import (leaf_label, predict_expr,
                                                  quality_features)
    from pulsar_beam_spark.queries import (_tree_from_node_rows,
                                           ensure_topic_quality_tree,
                                           topic_docs_frame)

    store = TopicDirStore(str(tmp_path / "store"), flush_interval_s=None)
    good = ("the quick brown fox jumps over the lazy dog and runs on "
            "through the field with a pack of hounds in pursuit for "
            "quite a while longer than expected today")
    junk = ["junk!!! ### $$$ %%%", "1234 5678 9012 3456 7890", "!!! @@@"]
    for t in [good, good + " again and again", good + " once more"] + junk:
        store.append(TOPIC, t.encode())
    d = store.topic_dir(TOPIC)
    art = str(tmp_path / "qtree-art")

    junk_ids = [r["doc_id"] for r in
                topic_docs_frame(spark, d).select("doc_id", "text").collect()
                if r["text"] in junk]
    assert len(junk_ids) == len(junk)
    monkeypatch.setattr(
        sampling, "stable_bucket",
        lambda col, n_buckets=100: F.when(col.isin(junk_ids), F.lit(0))
        .otherwise(F.lit(99)))

    assert ensure_topic_quality_tree(spark, d, art)[1] == "stale"
    tree = _tree_from_node_rows(
        spark.read.parquet(os.path.join(art, "nodes")).collect())
    labels = {leaf_label(*v) for v in tree.leaves.values()}
    assert labels == {0, 1}, (
        "single-class slice must fall back to whole-topic training")
    fx = quality_features(topic_docs_frame(spark, d))
    preds = {r["pred"] for r in
             fx.withColumn("pred", predict_expr(tree))
             .select("pred").collect()}
    assert preds == {0, 1}
