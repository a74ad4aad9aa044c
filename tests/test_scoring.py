"""Hashed-n-gram linear scorer gates: kernel edge cases + the
actor-pool path returning exactly what the local kernel computes."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _table(ids, texts) -> pa.Table:
    return pa.Table.from_pydict({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string())})


def test_zero_feature_docs_score_half():
    from tag_ray.stages.scoring import HashedLinearScorer

    s = HashedLinearScorer()
    out = s(_table([1, 2, 3], ["", "123 456", "!!!"])).to_pandas()
    assert out["n_features"].tolist() == [0, 0, 0]
    assert out["score"].tolist() == [0.5, 0.5, 0.5]


def test_zero_feature_doc_does_not_steal_neighbor_tail():
    """Regression: a degenerate reduceat span for an empty doc must not
    truncate the previous doc's feature sum."""
    from tag_ray.stages.scoring import HashedLinearScorer

    s = HashedLinearScorer()
    batch = s(_table([1, 2, 3],
                     ["alpha beta gamma", "", "delta epsilon"])).to_pandas()
    singles = pd.concat([
        s(_table([i], [t])).to_pandas()
        for i, t in [(1, "alpha beta gamma"), (2, ""), (3, "delta epsilon")]
    ], ignore_index=True)
    pd.testing.assert_frame_equal(batch, singles)


def test_deterministic_across_instances():
    from tag_ray.stages.scoring import HashedLinearScorer

    t = _table([1, 2], ["the quick brown fox", "jumps over the lazy dog"])
    a = HashedLinearScorer()(t).to_pandas()
    b = HashedLinearScorer()(t).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert (a["n_features"] == np.array([7, 9])).all()  # 4+3, 5+4 grams


def test_actor_pool_matches_local_kernel(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from tag_ray.pipelines.text import doc_quality_model_scores
    from tag_ray.stages.scoring import HashedLinearScorer

    texts = [f"doc number {i} with words repeated {'spam ' * (i % 5)}"
             for i in range(200)]
    t = _table(list(range(200)), texts)
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    got = doc_quality_model_scores(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = HashedLinearScorer(1234, 18)(t).to_pandas()
    pd.testing.assert_frame_equal(got, want)
