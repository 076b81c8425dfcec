"""Adversarial-corpus differential gate: every text/dedup/pipeline entry
runs Spark-vs-DuckDB on a documents table the fixtures DON'T have —
empty text, whitespace-only, NULL text, unicode (combining marks, CJK),
punctuation soup, a 2000-token repetition, single-token docs.

The fixture corpora are well-behaved, so an entry and its oracle can
agree there while diverging on degenerate inputs (found in round 7:
t_sentence_stats returned NULL n_words on NULL text where the oracle
coalesces to 0). This suite pins the edge behavior for the whole
text-analysis family, not just the entry that happened to diverge.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pulsar_beam_spark.queries import REGISTRY

from .conftest import SF_SMOKE
from .oracle_harness import compare, duck_run

ADV_ROWS = [
    (0, "", "en", "s0", 0),
    (1, "   \t  \n ", "en", "s0", 8),
    (2, "one", "en", "s1", 3),
    (3, "héllo wörld ünïcode tęst ẞharp", "de", "s1", 30),
    (4, "a " * 2000, "en", "s2", 4000),
    (5, "!!! ??? ... ,,, ;;; :::", "en", "s2", 23),
    (6, None, "en", "s3", 0),
    (7, "the the the the the the", "en", "s3", 23),
    (8, "日本語 テキスト 処理 テスト", "ja", "s4", 14),
    (9, "word1 word2 word3 word1 word2 word1", "en", "s4", 35),
]

# the document-driven oracle entries: text analysis, dedup, doc pipelines
TARGETS = sorted(
    n
    for n, s in REGISTRY.items()
    if s.oracle is not None
    and (
        n.startswith("t_")
        or n.startswith("d_")
        or n.startswith("r3")
        or n in ("p_decontaminate", "p_span_dedup", "p_chunk_documents",
                 "r29_dedup_exact_latest")
    )
)


@pytest.fixture(scope="module")
def adv_sf_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("adv-corpus"))
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in ADV_ROWS], pa.int64()),
            "text": pa.array([r[1] for r in ADV_ROWS], pa.string()),
            "lang": pa.array([r[2] for r in ADV_ROWS], pa.string()),
            "source": pa.array([r[3] for r in ADV_ROWS], pa.string()),
            "n_chars": pa.array([r[4] for r in ADV_ROWS], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    # non-document tables come from the smallest fixture so joins resolve
    for f in os.listdir(SF_SMOKE):
        if f != "documents.parquet" and f.endswith(".parquet"):
            shutil.copy(os.path.join(SF_SMOKE, f), os.path.join(d, f))
    return d


@pytest.mark.parametrize("name", TARGETS)
def test_adversarial_corpus_parity(spark, adv_sf_dir, name):
    spec = REGISTRY[name]
    sdf = spec.spark(spark, adv_sf_dir).toPandas()
    ddf = duck_run(spec.oracle, adv_sf_dir)
    errs = compare(sdf, ddf)
    assert not errs, f"{name} diverges on the adversarial corpus: " + "; ".join(errs)
