"""Live-Chroma mirror sink: chromadb is not installed in this
container, so (a) the ImportError path must surface clearly, and
(b) the batching logic is exercised end-to-end by shipping a fake
chromadb module to the executors via addPyFile — the fake records
every add() batch to disk so the test can assert batch shapes."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
    HydrationConfig,
    build_hydration_input,
    mirror_to_chroma,
)

FAKE_CHROMADB = '''
"""Test double for chromadb: records add() batches as JSON files."""
import json, os, uuid


class _Collection:
    def __init__(self, root, name):
        self.dir = os.path.join(root, name)
        os.makedirs(self.dir, exist_ok=True)

    def add(self, ids, documents, embeddings, metadatas=None):
        assert len(ids) == len(documents) == len(embeddings)
        payload = {
            "n": len(ids),
            "ids": ids,
            "dim": len(embeddings[0]) if embeddings else 0,
        }
        path = os.path.join(self.dir, f"batch-{uuid.uuid4().hex}.json")
        with open(path, "w") as f:
            json.dump(payload, f)


class PersistentClient:
    def __init__(self, path):
        self.path = path

    def get_or_create_collection(self, name, metadata=None):
        return _Collection(self.path, name)
'''


def test_mirror_with_real_chromadb(spark, tmp_path):
    """Integration marker: when the environment gains a real chromadb
    install this test automatically upgrades the mirror coverage from
    the test double to the real client (skipped while absent — same
    skip-if-absent pattern as the protobuf-gated streaming variant).
    MUST run before the fake-module test: addPyFile ships the double
    to the executors for the rest of the session."""
    chromadb = pytest.importorskip("chromadb")

    df = spark.createDataFrame(
        [(i, f"doc {i}", [float(i), 0.5]) for i in range(25)],
        "uid int, body string, vec array<float>",
    )
    canon = build_hydration_input(
        df,
        HydrationConfig(
            collection_name="real", root=str(tmp_path), id_col="uid",
            text_col="body", embedding_col="vec",
        ),
    ).repartition(2)
    store = tmp_path / "real_chroma_store"
    mirror_to_chroma(canon, str(store), "real", batch_size=10)

    client = chromadb.PersistentClient(path=str(store))
    coll = client.get_or_create_collection("real")
    assert coll.count() == 25
    got = coll.get(ids=["3"])
    assert got["documents"] == ["doc 3"]


def test_mirror_with_fake_chromadb(spark, tmp_path):
    fake = tmp_path / "chromadb.py"
    fake.write_text(FAKE_CHROMADB)
    spark.sparkContext.addPyFile(str(fake))

    df = spark.createDataFrame(
        [(i, f"doc {i}", [float(i), 0.5]) for i in range(257)],
        "uid int, body string, vec array<float>",
    )
    canon = build_hydration_input(
        df,
        HydrationConfig(
            collection_name="m", root=str(tmp_path), id_col="uid",
            text_col="body", embedding_col="vec",
        ),
    ).repartition(2)

    store = tmp_path / "chroma_store"
    mirror_to_chroma(canon, str(store), "m", batch_size=100)

    batches = [json.load(open(p)) for p in glob.glob(str(store / "m" / "batch-*.json"))]
    assert sum(b["n"] for b in batches) == 257
    assert max(b["n"] for b in batches) <= 100  # batch bound respected
    assert all(b["dim"] == 2 for b in batches if b["n"])
    ids = [i for b in batches for i in b["ids"]]
    assert len(set(ids)) == 257
