"""The pluggable embedding-encoder seam (round-5 verdict item 7).

``assert_encoder_contract`` is the reusable gate any real-model drop-in
(MiniLM et al.) must pass before serving: dim, determinism, null safety,
L2 bound, batch/one consistency.  The remaining tests pin that the default
PseudoEncoder is bit-identical to the pre-seam ``pseudo_embedding`` path
everywhere the seam is wired (ladder query vectors + ``embed_texts``).
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from hybrid_sanctions_search_engine_spark.functions.encoder import (
    PseudoEncoder,
    embed_texts,
)
from hybrid_sanctions_search_engine_spark.functions.vectors import pseudo_embedding

TEXTS = [
    "spark query join window",
    "",
    None,
    "Пéтро Кравець — sanctions тест 𝔘nicode",
    "a" * 5000,
]


def assert_encoder_contract(enc, sample_texts=None):
    """The drop-in contract: any encoder implementation must pass this
    unchanged (run it against a real model before swapping it in)."""
    texts = list(sample_texts or TEXTS)
    s = pd.Series(texts, dtype=object)
    mat = enc.encode_batch(s)
    # shape + dtype
    assert mat.shape == (len(texts), enc.dim)
    assert mat.dtype == np.float64
    assert np.isfinite(mat).all()
    # determinism: bit-identical on re-encode
    assert (enc.encode_batch(s) == mat).all()
    # L2 bound (unit or sub-unit vectors)
    norms = np.sqrt((mat * mat).sum(axis=1))
    assert (norms <= 1.0 + 1e-9).all()
    # encode_one consistent with encode_batch
    for i, t in enumerate(texts):
        one = np.asarray(enc.encode_one(t if t is not None else ""))
        assert one.shape == (enc.dim,)
        assert (one == mat[i]).all()
    # empty batch
    assert enc.encode_batch(pd.Series([], dtype=object)).shape == (0, enc.dim)


@pytest.mark.parametrize("dim", [64, 384])
def test_pseudo_encoder_contract(dim):
    assert_encoder_contract(PseudoEncoder(dim))


def test_pseudo_encoder_bit_identical_to_legacy():
    """The seam must not change a single bit vs the direct
    pseudo_embedding path (the DuckDB 384-d oracle rebuilds THAT)."""
    enc = PseudoEncoder(384)
    for t in ["spark query", "", "Кравець 123"]:
        assert enc.encode_one(t) == pseudo_embedding(t, 384)


def test_embed_texts_plumbing(spark):
    """embed_texts: schema (all input cols + array<double>), values match
    the driver-side encoder, no shuffle (plan stays a single map stage)."""
    df = spark.createDataFrame(
        [(1, "spark query"), (2, ""), (3, "Кравець")],
        "doc_id long, text string",
    )
    enc = PseudoEncoder(64)
    out = embed_texts(df, enc)
    assert out.schema.simpleString() == (
        "struct<doc_id:bigint,text:string,embedding:array<double>>"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan  # partition-preserving: no shuffle
    rows = {r["doc_id"]: r for r in out.collect()}
    for did, text in [(1, "spark query"), (2, ""), (3, "Кравець")]:
        assert rows[did]["embedding"] == pseudo_embedding(text, 64)


def test_hybrid_plan_uses_encoder(spark):
    """The ladder's vector stage consumes the injected encoder: a custom
    encoder returning a recognizable vector changes the query vector the
    stage uses, and the default plan equals the pre-seam behavior."""
    from hybrid_sanctions_search_engine_spark.plans.hybrid import HybridSearchPlan

    docs = spark.createDataFrame(
        [(i, f"doc number {i} spark value") for i in range(20)],
        "doc_id long, text string",
    )
    emb = embed_texts(
        docs.select(F.col("doc_id").alias("vec_id"), "text"), PseudoEncoder(64)
    ).select("vec_id", "embedding")

    class RiggedEncoder(PseudoEncoder):
        """Always encodes to doc 7's vector, whatever the query says."""

        def encode_one(self, text):
            return pseudo_embedding("doc number 7 spark value", self.dim)

        def encode_batch(self, texts):
            return np.stack([np.asarray(self.encode_one(t)) for t in texts])

    plan = HybridSearchPlan(docs, embeddings=emb, embedding_dim=64)
    rigged = HybridSearchPlan(
        docs, embeddings=emb, embedding_dim=64, encoder=RiggedEncoder(64)
    )
    try:
        res = plan.vector_stage("doc number 3 spark value", k=3).collect()
        assert res and res[0]["doc_id"] == 3  # self-match tops exact kNN
        res_r = rigged.vector_stage("doc number 3 spark value", k=3).collect()
        assert res_r and res_r[0]["doc_id"] == 7  # injected encoder decides
    finally:
        plan.close()
        rigged.close()


# ---------------------------------------------------------------------------
# round-6 verdict item 5: a genuinely stateful, weights-file-backed encoder
# through the same seam — proves the model-state-per-worker path end to end
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def proj_encoder(tmp_path_factory):
    from hybrid_sanctions_search_engine_spark.functions.encoder import (
        ProjectionEncoder,
        save_projection_weights,
    )

    path = str(tmp_path_factory.mktemp("weights") / "proj.npy")
    save_projection_weights(path, feat_dim=128, out_dim=64, seed=7)
    return ProjectionEncoder(path, feat_dim=128, dim=64)


def test_projection_encoder_contract(proj_encoder):
    assert_encoder_contract(proj_encoder)


def test_projection_encoder_pickle_drops_weights(proj_encoder):
    """The closure shipped to executors must carry only the PATH — a real
    checkpoint is GBs; each worker loads it from storage, once."""
    import pickle

    proj_encoder.encode_one("warm the cache")  # force a driver-side load
    assert proj_encoder._w is not None
    clone = pickle.loads(pickle.dumps(proj_encoder))
    assert clone._w is None  # no matrix in the pickle
    assert clone.weights_path == proj_encoder.weights_path
    # …and the revived copy still encodes identically (lazy reload)
    assert clone.encode_one("abc") == proj_encoder.encode_one("abc")


def test_projection_encoder_worker_loading_e2e(spark, proj_encoder):
    """embed_texts with the stateful encoder: workers receive a weightless
    pickle (previous test), so matching vectors prove each worker loaded
    the checkpoint from disk — the per-worker lazy-init path, live."""
    df = spark.createDataFrame(
        [(i, f"stateful encoder doc {i} with spark text") for i in range(40)],
        "doc_id long, text string",
    ).repartition(8)  # several partitions → several worker-side loads
    rows = {r["doc_id"]: r["embedding"] for r in embed_texts(df, proj_encoder).collect()}
    assert len(rows) == 40
    for i in (0, 17, 39):
        assert rows[i] == proj_encoder.encode_one(
            f"stateful encoder doc {i} with spark text"
        )


def test_projection_encoder_ladder_and_index_e2e(spark, proj_encoder, tmp_path):
    """Non-pseudo end-to-end serving: docs embedded through the stateful
    encoder into an IVF index; the ladder (same encoder on the query side)
    escalates a gibberish-lexical query and finds the semantically identical
    doc at cosine 1.0."""
    from hybrid_sanctions_search_engine_spark.operators.similarity import (
        write_ivf_index,
    )
    from hybrid_sanctions_search_engine_spark.plans.hybrid import (
        HybridSearchPlan,
        SearchOpts,
    )

    docs = spark.createDataFrame(
        [(i, f"document {i} about topic number {i % 7}") for i in range(60)],
        "doc_id long, text string",
    )
    emb = embed_texts(
        docs.select(F.col("doc_id").alias("vec_id"), "text"), proj_encoder
    ).select("vec_id", "embedding")
    ann = str(tmp_path / "proj_ivf")
    write_ivf_index(emb, ann, n_centroids=4, iters=6)
    plan = HybridSearchPlan(
        docs, embedding_dim=64, ann_index_dir=ann, ann_kind="ivf",
        ann_n_probe=4, encoder=proj_encoder,
    )
    try:
        hits = plan.vector_stage(
            "document 13 about topic number 6", k=3, rerank=False
        ).collect()
        assert hits[0]["doc_id"] == 13
        assert hits[0]["cos_sim"] == pytest.approx(1.0, abs=1e-9)
        res, trace = plan.search("qqxxzzvv wwrrkk", SearchOpts(top_k=5))
        hybrid = next(t for t in trace if t.stage == "HYBRID")
        assert hybrid.meta["escalated"]
        assert res.count() > 0
    finally:
        plan.close()
